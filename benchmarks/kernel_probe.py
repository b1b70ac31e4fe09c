"""Decompose the per-grid-step cost of the intersection mega-kernel.

Variants (same grid/meta/out structure as ops/intersect.py _kernel):
  empty      grid step reads meta, writes constant outputs
  dma        + window DMAs (2 slots x 4 arrays) start+wait
  phase      + pivot-window mask/BM25 + in-VMEM top-k (no member pass)
  full       the real intersect_batch

Run on the TPU host: python benchmarks/kernel_probe.py
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
    BLK, R_EXTRA, TILE = IK.BLK, IK.R_EXTRA, IK.TILE
    NEG_INF = IK.NEG_INF
    rng = np.random.default_rng(0)
    n_docs = 1_000_000

    def make_windows(B, Wp, Wm, n_unique=16):
        rows_total = (n_unique * (Wp + Wm)) // BLK + 4 * n_unique
        doc_ids = np.full((rows_total, BLK), 2**31 - 1, np.int32)
        freqs = np.zeros((rows_total, BLK), np.float32)
        masks = np.zeros((rows_total, BLK), np.int32)
        dl = np.full((rows_total, BLK), 24.0, np.float32)
        meta = np.zeros((B, 6), np.int32)
        fmeta = np.zeros((B, 3), np.float32)
        at = 0
        pool = []
        for u in range(n_unique):
            entry = []
            for W in (Wp, Wm):
                docs = np.sort(rng.choice(n_docs, size=W, replace=False)
                               ).astype(np.int32)
                rows_w = W // BLK
                doc_ids[at:at + rows_w] = docs.reshape(rows_w, BLK)
                freqs[at:at + rows_w] = 1.0 + (u % 3)
                masks[at:at + rows_w] = 3
                entry.append((at * BLK, W))
                at += rows_w + 1
            pool.append(entry)
        for b in range(B):
            for t in (0, 1):
                meta[b, t] = pool[b % n_unique][t][0]
                meta[b, 2 + t] = pool[b % n_unique][t][1]
                meta[b, 4 + t] = 3
            fmeta[b] = (2.0, 1.5, 24.0)
        return (jnp.asarray(meta), jnp.asarray(fmeta),
                jnp.asarray(doc_ids), jnp.asarray(freqs),
                jnp.asarray(masks), jnp.asarray(dl))

    def variant_kernel(meta_ref, fmeta, doc_ids, freqs, masks, dl,
                       out_docs, out_scores, out_counts, *scratch,
                       T, Ws, k, mode):
        q = pl.program_id(0)
        refs = []
        at = 0
        for t in range(T):
            refs.append((scratch[at], scratch[at + 1], scratch[at + 2],
                         scratch[at + 3]))
            at += 4
        sems = scratch[at]
        rows = [Ws[t] // BLK + R_EXTRA for t in range(T)]

        def m(i):
            return meta_ref[q, i]

        starts = [m(t) for t in range(T)]
        lens = [m(T + t) for t in range(T)]
        qmasks = [m(2 * T + t) for t in range(T)]
        avgdl = fmeta[0, 0, T]
        srows = [starts[t] // BLK for t in range(T)]
        rr = [starts[t] % BLK for t in range(T)]

        KR = 1
        if mode in ("dma", "phase"):
            dmas = []
            for t in range(T):
                d, f, fm, dlr = refs[t]
                dmas.append(pltpu.make_async_copy(
                    doc_ids.at[pl.ds(srows[t], rows[t]), :], d,
                    sems.at[4 * t]))
                dmas.append(pltpu.make_async_copy(
                    freqs.at[pl.ds(srows[t], rows[t]), :], f,
                    sems.at[4 * t + 1]))
                dmas.append(pltpu.make_async_copy(
                    masks.at[pl.ds(srows[t], rows[t]), :], fm,
                    sems.at[4 * t + 2]))
                if t == 0:
                    dmas.append(pltpu.make_async_copy(
                        dl.at[pl.ds(srows[t], rows[t]), :], dlr,
                        sems.at[4 * t + 3]))
            for c in dmas:
                c.start()
            for c in dmas:
                c.wait()
        if mode == "phase":
            p = 0
            rows_p = rows[p]
            pdocs_ref, ptf_ref, pfm_ref, pdl_ref = refs[p]
            iota_w = IK._flat_iota(rows_p)
            pdocs = pdocs_ref[:]
            in_range = (iota_w >= rr[p]) & (iota_w < rr[p] + lens[p])
            pvalid = in_range & ((pfm_ref[:] & qmasks[p]) != 0)
            pdl = pdl_ref[:]
            norm = 1.2 * (1.0 - 0.75 + 0.75 * pdl
                          / jnp.maximum(avgdl, 1e-9))
            tf = ptf_ref[:]
            score = jnp.where(pvalid, 2.0 * tf * 2.2 / (tf + norm), 0.0)
            d_o = jnp.where(pvalid, pdocs, jnp.int32(2**31 - 1))
            s_o = jnp.where(pvalid, score, NEG_INF)
            INF32 = jnp.int32(2**31 - 1)
            oi = IK._flat_iota(KR)
            topd = jnp.full((KR, BLK), INF32)
            tops = jnp.full((KR, BLK), NEG_INF, jnp.float32)
            fiw = IK._flat_iota(rows_p)
            sc = s_o
            for i in range(k):
                mx = jnp.max(sc)
                sel = jnp.min(jnp.where(sc == mx, fiw, INF32))
                hit_lane = fiw == sel
                dv = jnp.min(jnp.where(hit_lane, d_o, INF32))
                opos = oi == i
                topd = jnp.where(opos, dv, topd)
                tops = jnp.where(opos, mx, tops)
                sc = jnp.where(hit_lane, NEG_INF, sc)
            out_docs[0] = topd
            out_scores[0] = tops
            out_counts[0] = jnp.zeros((1, BLK), jnp.int32)
        else:
            out_docs[0] = jnp.zeros((KR, BLK), jnp.int32)
            out_scores[0] = jnp.zeros((KR, BLK), jnp.float32)
            out_counts[0] = jnp.zeros((1, BLK), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("T", "Ws", "k", "mode"))
    def run_variant(meta, fmeta, doc_ids, freqs, masks, dl,
                    *, T, Ws, k, mode):
        B = meta.shape[0]
        rows = [Ws[t] // BLK + R_EXTRA for t in range(T)]
        KR = 1
        scratch = []
        for t in range(T):
            scratch.append(pltpu.VMEM((rows[t], BLK), jnp.int32))
            scratch.append(pltpu.VMEM((rows[t], BLK), jnp.float32))
            scratch.append(pltpu.VMEM((rows[t], BLK), jnp.int32))
            scratch.append(pltpu.VMEM(
                (rows[t] if t == 0 else 8, BLK), jnp.float32))
        scratch.append(pltpu.SemaphoreType.DMA((4 * T,)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, 1, T + 1),
                                   lambda q, meta: (q, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
            out_specs=[
                pl.BlockSpec((1, KR, BLK), lambda q, meta: (q, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, KR, BLK), lambda q, meta: (q, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, BLK), lambda q, meta: (q, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=scratch,
        )
        kern = functools.partial(variant_kernel, T=T, Ws=Ws, k=k,
                                 mode=mode)
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B, KR, BLK), jnp.int32),
                jax.ShapeDtypeStruct((B, KR, BLK), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, BLK), jnp.int32),
            ],
        )(meta, fmeta[:, None, :], doc_ids, freqs, masks, dl)

    def time_it(fn, meta, iters=8):
        metas = [jnp.roll(meta, i + 1, axis=0) for i in range(3 * iters)]
        jax.block_until_ready(fn(meta))
        best = float("inf")
        for r in range(3):
            outs = []
            t0 = time.perf_counter()
            for _i in range(iters):
                outs.append(fn(metas[r * iters + _i]))
            jax.device_get([o[2] for o in outs])
            best = min(best, time.perf_counter() - t0)
        return best

    B = 512
    for Wp, Wm in [(2048, 8192), (8192, 32768)]:
        meta, fmeta, d2, f2, m2, dl2 = make_windows(B, Wp, Wm)
        Ws = (Wp, Wm)
        for mode in ("empty", "dma", "phase"):
            fn = lambda mm: run_variant(mm, fmeta, d2, f2, m2, dl2,
                                        T=2, Ws=Ws, k=16, mode=mode)
            dt = time_it(fn, meta)
            print(f"Wp={Wp:6d} Wm={Wm:6d} {mode:6s}: "
                  f"{dt / 8 / B * 1e6:8.1f} us/query")
        flat = [a.reshape(-1) for a in (d2, f2, m2, dl2)]
        fnf = lambda mm: IK.intersect_batch(
            mm, fmeta, *flat, T=2, Ws=Ws, groups=((0, (0,)), (0, (1,))),
            pivot_g=0, k=16)
        dt = time_it(fnf, meta)
        print(f"Wp={Wp:6d} Wm={Wm:6d} full  : "
              f"{dt / 8 / B * 1e6:8.1f} us/query")


if __name__ == "__main__":
    main()
