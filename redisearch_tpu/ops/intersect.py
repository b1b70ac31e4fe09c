"""Pallas mega-kernel for term-intersection queries (the BM25 hot path).

Reference hot loop: the document-at-a-time intersection leapfrog
(src/redisearch_rs/rqe_iterators/src/intersection.rs) feeding the BM25
scorer and a result heap.  The XLA window path evaluates one query per
`lax.scan` step as ~6 small kernels; per-step launch overhead (~10 µs
per kernel) dominates at serving batch sizes (measured: AND-2 costs
~74 µs/query while its arithmetic is <1 µs).  This kernel executes ONE
GRID STEP PER QUERY: posting windows DMA from HBM into VMEM at dynamic
offsets, membership runs as a block-ranged sorted-merge entirely in
VMEM (no arbitrary-index gathers — the round-1 gather tax), BM25STD
scores assemble in-register, and the batch's masked score windows come
back as one [B, W] tensor for a single batched top-k outside.

Covered query family (everything else stays on the XLA path):
    AND of T<=4 single-slot term groups, each required / negated (-t) /
    optional (~t), BM25STD scoring, clean segment (no deletions, no
    TTL, uniform doc score), single-word field masks, windows <= 32768.

Membership: for each 128-wide pivot block, the candidate doc range
[min, max] locates the member-window block range by two compare-count
reductions (VPU), then a bounded `fori_loop` compares [128, 128] tiles
— O(overlapping blocks) work, zero gathers, exact at any skew.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128
TILE = 1024             # VMEM dynamic-load alignment granule (8x128)
R_TILE = TILE // BLK    # 8 rows per tile
R_EXTRA = 8             # one extra tile row-group: windows start at
                        # arbitrary offsets, so fetch one more tile
MAX_W = 32768           # per-slot window cap for the kernel path
NEG_INF = -3.4e38       # python floats: jnp scalars would be captured
K1 = 1.2                # consts inside the pallas kernel
B_ = 0.75

# slot flags
REQ, NOT, OPT = 0, 1, 2


def _kernel(meta_ref,                       # scalar prefetch [B, 3T]
            fmeta,                          # VMEM f32 [B, T+1]
            doc_ids, freqs, masks, dl,      # HBM (ANY) 1D arrays
            out_docs, out_scores,           # VMEM [1, 1, Wp] blocks
            *scratch, T, Ws, Wp, pivot_t, flags):
    """One query per grid step.

    Dynamic slicing inside the kernel must go through Refs (`pl.ds`), so
    candidate-state arrays (valid mask, per-slot hit/tf accumulators)
    live in VMEM scratch refs rather than loop-carried values."""
    q = pl.program_id(0)
    # scratch layout: per slot t: docs[W], tf[W], fm[W]; then pivot
    # dl[Wp]; valid[Wp] i32; hit[Wp] i32; tfacc[Wp] f32; DMA semaphores
    refs = []
    at = 0
    for t in range(T):
        refs.append((scratch[at], scratch[at + 1], scratch[at + 2]))
        at += 3
    dl_ref = scratch[at]
    valid_ref = scratch[at + 1]
    hit_ref = scratch[at + 2]
    tfa_ref = scratch[at + 3]
    sems = scratch[at + 4]

    def m(i):
        return meta_ref[q, i]

    starts = [m(t) for t in range(T)]
    lens = [m(T + t) for t in range(T)]
    qmasks = [m(2 * T + t) for t in range(T)]
    tws = [fmeta[0, 0, t] for t in range(T)]
    avgdl = fmeta[0, 0, T]

    # ---- DMA every slot's windows (docs/tf/fieldmask) + pivot doclens.
    # HBM arrays arrive as 2D [nnz/128, 128] views; a window starting at
    # arbitrary `s` fetches rows s//128 .. s//128 + W/128 (one extra row)
    # and the in-tile offset r = s % 128 is handled entirely by masks —
    # the window's live region is flat lanes [r, r + len).
    rows = [Ws[t] // BLK + R_EXTRA for t in range(T)]
    rows_p = Wp // BLK + R_EXTRA
    srows = [starts[t] // BLK for t in range(T)]
    rr = [starts[t] % BLK for t in range(T)]
    dmas = []
    for t in range(T):
        d, f, fm = refs[t]
        dmas.append(pltpu.make_async_copy(
            doc_ids.at[pl.ds(srows[t], rows[t]), :], d, sems.at[3 * t]))
        dmas.append(pltpu.make_async_copy(
            freqs.at[pl.ds(srows[t], rows[t]), :], f, sems.at[3 * t + 1]))
        dmas.append(pltpu.make_async_copy(
            masks.at[pl.ds(srows[t], rows[t]), :], fm,
            sems.at[3 * t + 2]))
    dmas.append(pltpu.make_async_copy(
        dl.at[pl.ds(srows[pivot_t], rows_p), :], dl_ref, sems.at[3 * T]))
    for c in dmas:
        c.start()
    for c in dmas:
        c.wait()

    # flat index per 2D lane: row * 128 + lane
    def flat_iota(rows):
        return (jax.lax.broadcasted_iota(jnp.int32, (rows, BLK), 0) * BLK
                + jax.lax.broadcasted_iota(jnp.int32, (rows, BLK), 1))

    iota_w = flat_iota(rows_p)
    r_p = rr[pivot_t]
    pdocs = refs[pivot_t][0][:]            # [rows_p, 128]
    ptf = refs[pivot_t][1][:]
    pfm = refs[pivot_t][2][:]
    in_range = (iota_w >= r_p) & (iota_w < r_p + lens[pivot_t])
    pvalid = in_range & ((pfm & qmasks[pivot_t]) != 0)
    pdl = dl_ref[:]

    def bm25(tf, w):
        norm = K1 * (1.0 - B_ + B_ * pdl / jnp.maximum(avgdl, 1e-9))
        return w * tf * (K1 + 1.0) / (tf + norm)

    score = jnp.where(pvalid, bm25(ptf, tws[pivot_t]), 0.0)
    valid_ref[:] = pvalid.astype(jnp.int32)

    # ---- membership of every other slot at the pivot candidates
    pdocs_ref = refs[pivot_t][0]
    for t in range(T):
        if t == pivot_t:
            continue
        mdocs_r, mtf_r, mfm_r = refs[t]
        Wm = Ws[t]
        r_m = rr[t]
        fi_m = flat_iota(Wm // BLK + R_EXTRA)
        m_inr = (fi_m >= r_m) & (fi_m < r_m + lens[t])
        mdocs_masked = jnp.where(m_inr, mdocs_r[:], jnp.int32(2**31 - 1))
        # tiles are (8, 128) row blocks: dynamic row offsets stay
        # multiples of 8 (the sublane granule), member sub-rows come from
        # STATIC indexing of loaded tiles, and per-row results accumulate
        # into the (8, 128) tile via row-selector masks — no reshapes,
        # no concatenates, no sub-granule dynamic addressing.
        n_pt = rows_p // R_TILE
        mt_max = (Wm // BLK + R_EXTRA) // R_TILE
        mlen = lens[t]
        qm_t = qmasks[t]
        R = R_TILE                            # 8 rows per tile

        def pivot_tile(pt, _c, _md=mdocs_masked, _mr=mdocs_r,
                       _mtr=mtf_r, _mfr=mfm_r, _mt_max=mt_max,
                       _mlen=mlen, _qm=qm_t, _rm=r_m):
            prow = pl.multiple_of(pt * R, R)
            pd = pdocs_ref[pl.ds(prow, R), :]          # [8, 128]
            pv = valid_ref[pl.ds(prow, R), :] != 0
            pmin = jnp.min(jnp.where(pv, pd, jnp.int32(2**31 - 1)))
            pmax = jnp.max(jnp.where(pv, pd, jnp.int32(-1)))
            # member tile range covering [pmin, pmax]: counts are
            # positions among the window's live docs, which start at
            # flat offset r_m in the fetched buffer
            lo_e = _rm + jnp.sum((_md < pmin).astype(jnp.int32))
            hi_e = _rm + jnp.sum((_md <= pmax).astype(jnp.int32))
            lo_t = lo_e // TILE
            hi_t = jnp.minimum((hi_e + TILE - 1) // TILE, _mt_max)

            rsel = jax.lax.broadcasted_iota(jnp.int32, (R, BLK), 0)

            def member_tile(mtile, inner):
                h, tfv = inner                          # [8, 128] each
                mrow = pl.multiple_of(mtile * R, R)
                md = _mr[pl.ds(mrow, R), :]
                mtf = _mtr[pl.ds(mrow, R), :]
                mf = _mfr[pl.ds(mrow, R), :]
                base = mtile * TILE
                fi = (base + rsel * BLK
                      + jax.lax.broadcasted_iota(
                          jnp.int32, (R, BLK), 1))
                mv = (fi >= _rm) & (fi < _rm + _mlen) \
                    & ((mf & _qm) != 0)
                for pi in range(R):
                    pd_i = pd[pi]                       # [128] static row
                    hi_ = jnp.zeros((BLK,), jnp.bool_)
                    ti_ = jnp.zeros((BLK,), jnp.float32)
                    for mi in range(R):
                        md_j = md[mi]
                        mv_j = mv[mi]
                        mt_j = mtf[mi]
                        eq = (pd_i[:, None] == md_j[None, :]) \
                            & mv_j[None, :]
                        hi_ = hi_ | jnp.any(eq, axis=1)
                        ti_ = ti_ + jnp.sum(
                            jnp.where(eq, mt_j[None, :], 0.0), axis=1)
                    # fold the [128] row result into the [8, 128] tile
                    # through a row-selector mask (no stack/concat);
                    # the hit carry is int32 — i1 vector loop carries
                    # fail to legalize in mosaic
                    row_is_pi = rsel == pi
                    h = jnp.maximum(
                        h, jnp.where(row_is_pi & hi_[None, :], 1, 0))
                    tfv = tfv + jnp.where(row_is_pi, ti_[None, :], 0.0)
                return h, tfv

            h0 = jnp.zeros((R, BLK), jnp.int32)
            t0 = jnp.zeros((R, BLK), jnp.float32)
            h, tfv = jax.lax.fori_loop(lo_t, hi_t, member_tile,
                                       (h0, t0))
            hit_ref[pl.ds(prow, R), :] = h
            tfa_ref[pl.ds(prow, R), :] = tfv
            return _c

        jax.lax.fori_loop(0, n_pt, pivot_tile, 0)

        hit_acc = hit_ref[:] != 0
        tf_acc = tfa_ref[:]
        valid = valid_ref[:] != 0
        fl = flags[t]
        if fl == REQ:
            valid = valid & hit_acc
            score = score + jnp.where(hit_acc, bm25(tf_acc, tws[t]), 0.0)
        elif fl == NOT:
            valid = valid & ~hit_acc
        else:  # OPT
            score = score + jnp.where(hit_acc, bm25(tf_acc, tws[t]), 0.0)
        valid_ref[:] = valid.astype(jnp.int32)

    valid = valid_ref[:] != 0
    out_docs[0] = jnp.where(valid, pdocs, jnp.int32(2**31 - 1))
    out_scores[0] = jnp.where(valid, score, NEG_INF)


def _xla_impl(meta, fmeta, doc_ids, freqs, masks, posting_dl,
              *, T, Ws, Wp, pivot_t, flags):
    """Pure-XLA reference implementation of the kernel semantics — the
    CPU fallback and the cross-check oracle for the Pallas lowering
    (pallas interpret mode cannot discharge the reshaped-ref DMAs)."""
    INF = jnp.int32(2**31 - 1)

    def one(mrow, frow):
        starts = mrow[:T]
        lens = mrow[T:2 * T]
        qm = mrow[2 * T:3 * T]
        tws = frow[:T]
        avgdl = frow[T]

        def win(t, W):
            st = starts[t]
            d = jax.lax.dynamic_slice(doc_ids, (st,), (W,))
            f = jax.lax.dynamic_slice(freqs, (st,), (W,))
            mk = jax.lax.dynamic_slice(masks, (st,), (W,))
            i = jnp.arange(W)
            inr = i < lens[t]
            v = inr & ((mk & qm[t]) != 0)
            return jnp.where(inr, d, INF), f, v

        pd, pf, pvalid = win(pivot_t, Wp)
        pdl = jax.lax.dynamic_slice(posting_dl, (starts[pivot_t],),
                                    (Wp,))

        def bm25(tf, w):
            norm = K1 * (1.0 - B_ + B_ * pdl / jnp.maximum(avgdl, 1e-9))
            return w * tf * (K1 + 1.0) / (tf + norm)

        score = jnp.where(pvalid, bm25(pf, tws[pivot_t]), 0.0)
        valid = pvalid
        for t in range(T):
            if t == pivot_t:
                continue
            md, mf_, mv = win(t, Ws[t])
            idx = jnp.clip(jnp.searchsorted(md, pd), 0, Ws[t] - 1)
            hit = (md[idx] == pd) & mv[idx] & (pd != INF)
            tf_m = jnp.where(hit, mf_[idx], 0.0)
            fl = flags[t]
            if fl == REQ:
                valid = valid & hit
                score = score + jnp.where(hit, bm25(tf_m, tws[t]), 0.0)
            elif fl == NOT:
                valid = valid & ~hit
            else:
                score = score + jnp.where(hit, bm25(tf_m, tws[t]), 0.0)
        return (jnp.where(valid, pd, INF),
                jnp.where(valid, score, jnp.float32(NEG_INF)))

    return jax.vmap(one)(meta, fmeta)


def iter_topk(scores, docs, k: int):
    """Exact batched top-k by iterative max extraction.

    `lax.top_k` on a [B, ~9k] tensor lowers to a per-row sort (~26 ms a
    batch on v5e); k iterations of (max, argmax, mask) are exact and run
    as a handful of [B, N] elementwise/reduce kernels (~1 ms)."""
    B, N = scores.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    s = scores
    vals = []
    sels = []
    for _ in range(k):
        m = jnp.max(s, axis=1)
        is_m = s == m[:, None]
        idx = jnp.min(jnp.where(is_m, iota, jnp.int32(2**31 - 1)),
                      axis=1)
        idx = jnp.minimum(idx, N - 1)
        vals.append(m)
        sels.append(idx)
        s = jnp.where(iota == idx[:, None], jnp.float32(NEG_INF), s)
    sel = jnp.stack(sels, axis=1)
    return jnp.stack(vals, axis=1), sel


def _use_pallas() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")


@functools.partial(
    jax.jit, static_argnames=("T", "Ws", "Wp", "pivot_t", "flags"))
def intersect_batch(meta, fmeta, doc_ids, freqs, masks, posting_dl,
                    *, T: int, Ws: tuple, Wp: int, pivot_t: int,
                    flags: tuple):
    """Run the intersection kernel over a batch.

    meta: int32 [B, 3T] — per slot starts, lens, qmasks.
    fmeta: f32 [B, T+1] — per slot tweights (idf*weight), then avgdl.
    Returns (docs [B, Wp], scores [B, Wp]) with INT32_MAX / -inf at
    invalid lanes."""
    if not _use_pallas():
        d, sc = _xla_impl(meta, fmeta, doc_ids, freqs, masks,
                          posting_dl, T=T, Ws=Ws, Wp=Wp,
                          pivot_t=pivot_t, flags=flags)
        # match the pallas output width (windows carry one extra tile)
        pad = R_EXTRA * BLK
        d = jnp.pad(d, ((0, 0), (0, pad)),
                    constant_values=2**31 - 1)
        sc = jnp.pad(sc, ((0, 0), (0, pad)),
                     constant_values=NEG_INF)
        return d, sc
    B = meta.shape[0]
    rows = [Ws[t] // BLK + R_EXTRA for t in range(T)]
    rows_p = Wp // BLK + R_EXTRA
    scratch = []
    for t in range(T):
        scratch.append(pltpu.VMEM((rows[t], BLK), jnp.int32))
        scratch.append(pltpu.VMEM((rows[t], BLK), jnp.float32))
        scratch.append(pltpu.VMEM((rows[t], BLK), jnp.int32))
    scratch.append(pltpu.VMEM((rows_p, BLK), jnp.float32))  # pivot dl
    scratch.append(pltpu.VMEM((rows_p, BLK), jnp.int32))    # valid
    scratch.append(pltpu.VMEM((rows_p, BLK), jnp.int32))    # hit
    scratch.append(pltpu.VMEM((rows_p, BLK), jnp.float32))  # tf acc
    scratch.append(pltpu.SemaphoreType.DMA((3 * T + 1,)))

    # HBM arrays as 2D row views: DMA fetches whole 128-lane rows and
    # the kernel masks the (start % 128) in-tile offset
    n2 = doc_ids.shape[0] // BLK
    d2 = doc_ids.reshape(n2, BLK)
    f2 = freqs.reshape(n2, BLK)
    m2 = masks.reshape(n2, BLK)
    dl2 = posting_dl.reshape(n2, BLK)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 1, T + 1),
                               lambda q, meta: (q, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=[
            pl.BlockSpec((1, rows_p, BLK), lambda q, meta: (q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_p, BLK), lambda q, meta: (q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )
    kern = functools.partial(_kernel, T=T, Ws=Ws, Wp=Wp,
                             pivot_t=pivot_t, flags=flags)
    docs, scores = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, rows_p, BLK), jnp.int32),
            jax.ShapeDtypeStruct((B, rows_p, BLK), jnp.float32),
        ],
    )(meta, fmeta[:, None, :], d2, f2, m2, dl2)
    return docs.reshape(B, rows_p * BLK), scores.reshape(B, rows_p * BLK)
