"""Pin down the mega-kernel's ~13 us/query fixed grid-step floor.

kernel_probe.py showed an EMPTY grid step (meta read + constant output
writes) costs ~13 us/query — the dominant cost of the common AND-2
bucket.  Variants here isolate the machinery:

  cur      current spec structure: scalar-prefetch meta + tiny fmeta
           in_spec block (1,1,3) + 3 tiny per-step output copies
  fused    ONE fused (1,3,128) int32 output block, no fmeta in_spec
  g8       fused + G=8 queries per grid step (block (G,3,128))
  g8dma    g8 + per-query double-buffered window DMAs (2 slots x
           Wp/Wm), start query g+1's copies before processing g

Run on the TPU host: python benchmarks/grid_floor_probe.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from redisearch_tpu.ops import intersect as IK

    assert IK._use_pallas(), "run on TPU"
    BLK = IK.BLK

    B = int(os.environ.get("PROBE_B", "512"))
    meta = jnp.asarray(
        np.random.default_rng(0).integers(0, 64, size=(B, 8), dtype=np.int32)
        * 1024)
    fmeta = jnp.ones((B, 1, 3), jnp.float32)
    n_rows = 2_100_000 // BLK
    d2 = jnp.zeros((n_rows, BLK), jnp.int32)
    f2 = jnp.zeros((n_rows, BLK), jnp.float32)

    # --- cur: mirrors the current intersect_batch spec structure
    def cur_kernel(meta_ref, fmeta_ref, out_d, out_s, out_c):
        q = pl.program_id(0)
        s = meta_ref[q, 0]
        out_d[0] = jnp.full((1, BLK), s, jnp.int32)
        out_s[0] = jnp.zeros((1, BLK), jnp.float32)
        out_c[0] = jnp.zeros((1, BLK), jnp.int32)

    @jax.jit
    def run_cur(meta, fmeta):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B,),
            in_specs=[pl.BlockSpec((1, 1, 3), lambda q, m: (q, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((1, 1, BLK), lambda q, m: (q, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, BLK), lambda q, m: (q, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, BLK), lambda q, m: (q, 0, 0),
                             memory_space=pltpu.VMEM)])
        return pl.pallas_call(
            cur_kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((B, 1, BLK), jnp.int32),
                       jax.ShapeDtypeStruct((B, 1, BLK), jnp.float32),
                       jax.ShapeDtypeStruct((B, 1, BLK), jnp.int32)],
        )(meta, fmeta)

    # --- fused: one output, no fmeta block
    def fused_kernel(meta_ref, out):
        q = pl.program_id(0)
        out[0] = jnp.full((3, BLK), meta_ref[q, 0], jnp.int32)

    @jax.jit
    def run_fused(meta):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B,), in_specs=[],
            out_specs=[pl.BlockSpec((1, 3, BLK), lambda q, m: (q, 0, 0),
                                    memory_space=pltpu.VMEM)])
        return pl.pallas_call(
            fused_kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((B, 3, BLK), jnp.int32)],
        )(meta)

    # --- g8: fused + G queries per step
    def g_kernel(meta_ref, out, G):
        step = pl.program_id(0)
        for g in range(G):
            out[g] = jnp.full((3, BLK),
                              meta_ref[step * G + g, 0], jnp.int32)

    @functools.partial(jax.jit, static_argnames=("G",))
    def run_g(meta, G):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B // G,), in_specs=[],
            out_specs=[pl.BlockSpec((G, 3, BLK),
                                    lambda s, m: (s, 0, 0),
                                    memory_space=pltpu.VMEM)])
        return pl.pallas_call(
            functools.partial(g_kernel, G=G), grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((B, 3, BLK), jnp.int32)],
        )(meta)

    # --- g8dma: G per step + double-buffered window DMAs (2 slots)
    def gdma_kernel(meta_ref, d_hbm, f_hbm, out, *scratch, G, rows):
        step = pl.program_id(0)
        sems = scratch[-1]
        bufs = scratch[:-1]   # 2 bufs x (docs, tf) x 2 slots = 8

        def issue(g, buf):
            srow0 = meta_ref[step * G + g, 0] // BLK
            srow1 = meta_ref[step * G + g, 1] // BLK
            cps = [
                pltpu.make_async_copy(
                    d_hbm.at[pl.ds(srow0, rows[0]), :], bufs[4 * buf + 0],
                    sems.at[buf, 0]),
                pltpu.make_async_copy(
                    f_hbm.at[pl.ds(srow0, rows[0]), :], bufs[4 * buf + 1],
                    sems.at[buf, 1]),
                pltpu.make_async_copy(
                    d_hbm.at[pl.ds(srow1, rows[1]), :], bufs[4 * buf + 2],
                    sems.at[buf, 2]),
                pltpu.make_async_copy(
                    f_hbm.at[pl.ds(srow1, rows[1]), :], bufs[4 * buf + 3],
                    sems.at[buf, 3]),
            ]
            for c in cps:
                c.start()

        def wait(buf):
            for i in range(4):
                src = d_hbm if i % 2 == 0 else f_hbm
                tgt = bufs[4 * buf + i]
                r = rows[0] if i < 2 else rows[1]
                pltpu.make_async_copy(
                    src.at[pl.ds(0, r), :], tgt, sems.at[buf, i]).wait()

        issue(0, 0)
        for g in range(G):
            if g + 1 < G:
                issue(g + 1, (g + 1) % 2)
            wait(g % 2)
            b = bufs[4 * (g % 2)]
            out[g] = (jnp.max(b[:], axis=0)
                      + jnp.max(bufs[4 * (g % 2) + 2][:], axis=0).astype(
                          jnp.int32))[None, :] * jnp.ones((3, BLK),
                                                          jnp.int32)

    @functools.partial(jax.jit, static_argnames=("G", "Wp", "Wm"))
    def run_gdma(meta, d2, f2, G, Wp, Wm):
        rows = (Wp // BLK + 8, Wm // BLK + 8)
        scratch = []
        for _buf in range(2):
            scratch.append(pltpu.VMEM((rows[0], BLK), jnp.int32))
            scratch.append(pltpu.VMEM((rows[0], BLK), jnp.float32))
            scratch.append(pltpu.VMEM((rows[1], BLK), jnp.int32))
            scratch.append(pltpu.VMEM((rows[1], BLK), jnp.float32))
        scratch.append(pltpu.SemaphoreType.DMA((2, 4)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B // G,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
            out_specs=[pl.BlockSpec((G, 3, BLK), lambda s, m: (s, 0, 0),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=scratch)
        return pl.pallas_call(
            functools.partial(gdma_kernel, G=G, rows=rows),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((B, 3, BLK), jnp.int32)],
        )(meta, d2, f2)

    def time_it(fn, iters=16):
        metas = [jnp.roll(meta, i + 1, axis=0) for i in range(3 * iters)]
        jax.block_until_ready(fn(metas[0]))
        best = float("inf")
        for r in range(3):
            outs = []
            t0 = time.perf_counter()
            for i in range(iters):
                outs.append(fn(metas[r * iters + i]))
            jax.device_get(outs[-1])
            best = min(best, time.perf_counter() - t0)
        return best / iters / B * 1e6

    # --- cur + ANY inputs + scratch (the real kernel's full spec shape)
    def curany_kernel(meta_ref, fmeta_ref, d_any, f_any, m_any, dl_any,
                      out_d, out_s, out_c, *scratch):
        q = pl.program_id(0)
        s = meta_ref[q, 0]
        out_d[0] = jnp.full((1, BLK), s, jnp.int32)
        out_s[0] = jnp.zeros((1, BLK), jnp.float32)
        out_c[0] = jnp.zeros((1, BLK), jnp.int32)

    @jax.jit
    def run_curany(meta, fmeta):
        rows = (2048 // BLK + 8, 8192 // BLK + 8)
        scratch = []
        for t in range(2):
            scratch.append(pltpu.VMEM((rows[t], BLK), jnp.int32))
            scratch.append(pltpu.VMEM((rows[t], BLK), jnp.float32))
            scratch.append(pltpu.VMEM((rows[t], BLK), jnp.int32))
            scratch.append(pltpu.VMEM((rows[t], BLK), jnp.float32))
        scratch.append(pltpu.SemaphoreType.DMA((8,)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B,),
            in_specs=[pl.BlockSpec((1, 1, 3), lambda q, m: (q, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
            out_specs=[
                pl.BlockSpec((1, 1, BLK), lambda q, m: (q, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, BLK), lambda q, m: (q, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, BLK), lambda q, m: (q, 0, 0),
                             memory_space=pltpu.VMEM)],
            scratch_shapes=scratch)
        return pl.pallas_call(
            curany_kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((B, 1, BLK), jnp.int32),
                       jax.ShapeDtypeStruct((B, 1, BLK), jnp.float32),
                       jax.ShapeDtypeStruct((B, 1, BLK), jnp.int32)],
        )(meta, fmeta, d2, f2, d2, f2)

    print(f"cur    : {time_it(lambda m: run_cur(m, fmeta)):8.2f} us/q")
    print(f"curany : {time_it(lambda m: run_curany(m, fmeta)):8.2f} us/q")
    print(f"fused  : {time_it(run_fused):8.2f} us/q")
    for G in (4, 8, 16):
        print(f"g{G:<2d}    : {time_it(lambda m: run_g(m, G)):8.2f} us/q")
    for (Wp, Wm) in ((2048, 8192), (8192, 32768)):
        for G in (4, 8):
            us = time_it(lambda m: run_gdma(m, d2, f2, G, Wp, Wm))
            print(f"g{G}dma Wp={Wp:5d} Wm={Wm:6d}: {us:8.2f} us/q")


if __name__ == "__main__":
    main()
