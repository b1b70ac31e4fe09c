"""Second feasibility probe for G-queries-per-grid-step:

  1. f32 values smuggled through the int32 scalar-prefetch arg and
     bitcast back per scalar in-kernel (kills the per-step fmeta block).
  2. Reads through a STACKED dynamic slice: a double-buffer view
     `ref.at[pl.ds(buf*rows, rows)]` indexed again with `pl.ds(prow, 8)`
     inside a fori — the member-pass addressing pattern under G>1.

Run on the TPU host: python benchmarks/gstep_probe2.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = 64
ROWS = 32
R = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BLK = 128

    def kern(meta_ref, d_hbm, out, dbuf, sems, *, G):
        step = pl.program_id(0)

        def issue(g, buf):
            srow = meta_ref[step * G + g, 0] // BLK
            pltpu.make_async_copy(
                d_hbm.at[pl.ds(srow, ROWS)],
                dbuf.at[pl.ds(buf * ROWS, ROWS)], sems.at[buf]).start()

        def wait(buf):
            pltpu.make_async_copy(
                d_hbm.at[pl.ds(0, ROWS)],
                dbuf.at[pl.ds(buf * ROWS, ROWS)], sems.at[buf]).wait()

        issue(0, 0)

        def body(g, carry):
            buf = g % 2

            @pl.when(g + 1 < G)
            def _issue_next():
                issue(g + 1, (g + 1) % 2)
            wait(buf)
            q = step * G + g
            w_bits = meta_ref[q, 1]
            mode = os.environ.get("P2_MODE", "vecbitcast")
            if mode == "vecbitcast":
                w = jax.lax.bitcast_convert_type(
                    jnp.full((1, BLK), w_bits, jnp.int32),
                    jnp.float32)[0, 0]
            else:
                w = jax.lax.bitcast_convert_type(w_bits, jnp.float32)
            base = pl.multiple_of(buf * ROWS, R)
            view = dbuf.at[pl.ds(base, ROWS)]
            acc = jnp.zeros((1, BLK), jnp.float32)
            n_pt = ROWS // R

            def tile(pt, a):
                prow = pl.multiple_of(pt * R, R)
                blk = view[pl.ds(prow, R), :]          # stacked dyn slice
                return a + jnp.sum(blk.astype(jnp.float32),
                                   axis=0, keepdims=True)

            acc = jax.lax.fori_loop(0, n_pt, tile, acc)
            out[pl.ds(g, 1)] = (acc * w)[None]
            return carry

        jax.lax.fori_loop(0, G, body, 0)

    @functools.partial(jax.jit, static_argnames=("G",))
    def run(meta, d, G):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B // G,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=[pl.BlockSpec((G, 1, BLK), lambda s, m: (s, 0, 0),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[pltpu.VMEM((2 * ROWS, BLK), jnp.int32),
                            pltpu.SemaphoreType.DMA((2,))])
        return pl.pallas_call(
            functools.partial(kern, G=G), grid_spec=gs,
            out_shape=[jax.ShapeDtypeStruct((B, 1, BLK), jnp.float32)],
        )(meta, d)

    rng = np.random.default_rng(0)
    n_rows = 2048
    d = rng.integers(0, 100, size=(n_rows, BLK)).astype(np.int32)
    meta = np.zeros((B, 2), np.int32)
    meta[:, 0] = (rng.integers(0, (n_rows - ROWS) // R, B) * R) * BLK
    ws = rng.uniform(0.5, 2.0, B).astype(np.float32)
    meta[:, 1] = ws.view(np.int32)

    for G in (1, 4):
        out = np.asarray(jax.block_until_ready(
            run(jnp.asarray(meta), jnp.asarray(d), G))[0])
        bad = 0
        for b in range(B):
            srow = meta[b, 0] // BLK
            exp = d[srow:srow + ROWS].astype(np.float64).sum(0) * ws[b]
            if not np.allclose(out[b, 0], exp, rtol=1e-5):
                bad += 1
        print(f"G={G}: bad={bad}")


if __name__ == "__main__":
    main()
