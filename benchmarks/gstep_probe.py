"""Feasibility probe: G queries per grid step with a fori(g) body,
double-buffered scratch selected by DYNAMIC row offset, dynamically
indexed DMA semaphores, and dynamic leading-index output writes.

If this compiles and validates, the mega-kernel can amortize its
~12 us/query per-step floor over G queries without duplicating the
kernel body G times.

Run on the TPU host: python benchmarks/gstep_probe.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = 512


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BLK = 128

    def kern(meta_ref, d_hbm, f_hbm, out, dbuf, fbuf, sems, *, G, rows):
        step = pl.program_id(0)

        def issue(g, buf):
            srow = meta_ref[step * G + g, 0] // BLK
            pltpu.make_async_copy(
                d_hbm.at[pl.ds(srow, rows)],
                dbuf.at[pl.ds(buf * rows, rows)], sems.at[buf, 0]).start()
            pltpu.make_async_copy(
                f_hbm.at[pl.ds(srow, rows)],
                fbuf.at[pl.ds(buf * rows, rows)], sems.at[buf, 1]).start()

        def wait(buf):
            pltpu.make_async_copy(
                d_hbm.at[pl.ds(0, rows)],
                dbuf.at[pl.ds(buf * rows, rows)], sems.at[buf, 0]).wait()
            pltpu.make_async_copy(
                f_hbm.at[pl.ds(0, rows)],
                fbuf.at[pl.ds(buf * rows, rows)], sems.at[buf, 1]).wait()

        issue(0, 0)

        def body(g, carry):
            buf = g % 2

            @pl.when(g + 1 < G)
            def _issue_next():
                issue(g + 1, (g + 1) % 2)
            wait(buf)
            base = pl.multiple_of(buf * rows, 8)
            dv = dbuf[pl.ds(base, rows), :]
            fv = fbuf[pl.ds(base, rows), :]
            r_off = meta_ref[step * G + g, 1]
            iota = (jax.lax.broadcasted_iota(jnp.int32, (rows, BLK), 0)
                    * BLK
                    + jax.lax.broadcasted_iota(jnp.int32, (rows, BLK), 1))
            live = iota >= r_off
            s = (jnp.sum(jnp.where(live, dv, 0))
                 + jnp.sum(jnp.where(live, fv, 0.0)).astype(jnp.int32))
            out[pl.ds(g, 1)] = jnp.full((1, 1, BLK), s, jnp.int32)
            return carry

        jax.lax.fori_loop(0, G, body, 0)

    @functools.partial(jax.jit, static_argnames=("G", "W"))
    def run(meta, d, f, G, W):
        rows = W // BLK
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B // G,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
            out_specs=[pl.BlockSpec((G, 1, BLK), lambda s, m: (s, 0, 0),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[
                pltpu.VMEM((2 * rows, BLK), jnp.int32),
                pltpu.VMEM((2 * rows, BLK), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2))])
        return pl.pallas_call(
            functools.partial(kern, G=G, rows=rows), grid_spec=gs,
            out_shape=[jax.ShapeDtypeStruct((B, 1, BLK), jnp.int32)],
        )(meta, d, f)

    rng = np.random.default_rng(0)
    W = 8192
    rows = W // BLK
    n_rows = 4096
    d = np.arange(n_rows * BLK, dtype=np.int32).reshape(n_rows, BLK) % 997
    f = rng.normal(size=(n_rows, BLK)).astype(np.float32)
    meta = np.zeros((B, 2), np.int32)
    meta[:, 0] = (rng.integers(0, n_rows - rows, B) // 8 * 8) * BLK
    meta[:, 1] = rng.integers(0, 64, B)
    dj, fj = jnp.asarray(d), jnp.asarray(f)
    mj = jnp.asarray(meta)

    for G in (1, 2, 4, 8):
        out = np.asarray(jax.block_until_ready(run(mj, dj, fj, G, W))[0])
        # validate against numpy
        bad = 0
        for b in range(B):
            srow = meta[b, 0] // BLK
            iota = np.arange(rows * BLK).reshape(rows, BLK)
            live = iota >= meta[b, 1]
            dv = d[srow:srow + rows]
            fv = f[srow:srow + rows]
            exp = (np.where(live, dv, 0).sum()
                   + np.int32(np.where(live, fv, 0.0).sum()))
            if abs(int(out[b, 0, 0]) - int(exp)) > 2:
                bad += 1
        metas = [jnp.asarray(np.roll(meta, i + 1, axis=0))
                 for i in range(16)]
        jax.block_until_ready(run(metas[0], dj, fj, G, W))
        best = float("inf")
        for r in range(2):
            t0 = time.perf_counter()
            outs = [run(metas[r * 8 + i], dj, fj, G, W) for i in range(8)]
            jax.device_get(outs[-1])
            best = min(best, time.perf_counter() - t0)
        print(f"G={G}: bad={bad}  {best / 8 / B * 1e6:6.2f} us/q")


if __name__ == "__main__":
    main()
