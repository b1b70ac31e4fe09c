"""Pallas mega-kernels for term queries (the BM25 serving hot path).

Reference hot loops: the document-at-a-time intersection leapfrog and
union heap (src/redisearch_rs/rqe_iterators/src/{intersection,union}.rs)
feeding the BM25 scorer and a result heap.  The XLA window path evaluates
one query per `lax.scan` step as ~6 small kernels; per-step launch
overhead (~10 µs per kernel) dominates at serving batch sizes (measured:
AND-2 costs ~74 µs/query while its arithmetic is <1 µs).  These kernels
execute ONE GRID STEP PER QUERY: posting windows DMA from HBM into VMEM
at dynamic offsets, membership runs as a block-ranged sorted-merge
entirely in VMEM (no arbitrary-index gathers — the round-1 gather tax),
BM25STD scores assemble in-register, and the per-phase top-k is
extracted IN VMEM (k max-extractions, ties by window position) so each
query's whole result leaves the kernel as <=2 output rows + a count —
no [B, W] HBM round trip.

Covered query families (everything else stays on the XLA path):
  * mode="and": intersection of T<=4 single-slot term groups, each
    required / negated (-t) / optional (~t);
  * mode="or": union of T<=4 term slots (explicit `a|b` queries AND the
    stem-expanded token groups the default english pipeline produces) —
    per-slot candidate phases with cross-slot score folding and
    first-owner dedup, matching ops/window.py union_windows semantics;
  * dense predicates: single-valued TAG filters ride posting-ALIGNED
    code columns (Segment.tag_pcodes) — one window DMA + vector compare
    per pivot phase instead of a member-window membership pass.

Membership (the hot loop): since both windows are doc-sorted, the
[128, 128] all-pairs compares run per (pivot row, member row) PAIR,
predicated by hoisted scalar row ranges — ~W/128 truly overlapping
pairs do work instead of all 8x8 row pairs per tile pair (measured
~2-4x on the serving shapes).  Pair results accumulate into (8, 128)
statically-addressed scratch rows, folded into the hit/tf buffers once
per pivot tile.
Common constraints: BM25STD scoring, clean segment (no deletions, TTL,
non-uniform doc scores), single-word field masks, pivot-group windows
<= 32768 (they bound the [B, W] output); member windows may reach
131072 — they only occupy VMEM, so a rare pivot can intersect against
an ultra-common term without falling back to the XLA path.

Mosaic constraints shaping the code: dynamic VMEM vector loads need
(8, 128)-tile alignment — so scratch is 2D (rows, 128), windows fetch
whole 128-lane rows (one extra tile; the start%128 offset is handled by
masks), member sub-rows come from STATIC indexing of loaded (8, 128)
tiles, per-row results fold into tiles via row-selector masks, and loop
carries are int32/f32 (i1 vectors fail to legalize).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128
TILE = 1024             # VMEM dynamic-load alignment granule (8x128)
R_TILE = TILE // BLK    # 8 rows per tile
R_EXTRA = 8             # one extra tile: windows start at arbitrary offs
MAX_W_PIVOT = 32768     # pivot windows bound the [B, W] output size
MAX_W_MEMBER = 131072   # member windows only occupy VMEM (~2 MB each)
MAX_W = MAX_W_PIVOT     # back-compat alias
NEG_INF = -3.4e38       # python floats: jnp scalars would be captured
K1 = 1.2
B_ = 0.75

# slot flags (mode="and")
REQ, NOT, OPT = 0, 1, 2


def _flat_iota(rows):
    return (jax.lax.broadcasted_iota(jnp.int32, (rows, BLK), 0) * BLK
            + jax.lax.broadcasted_iota(jnp.int32, (rows, BLK), 1))


def _extract_pass(sc, d_o):
    """One max-extraction from a [rows, BLK] masked score block.

    Returns (mx, dv, sc'): the max score, its doc (ties by lowest doc
    id), and the block with that element invalidated.  Posting windows
    are doc-sorted, so lowest-doc tie-break is IDENTICAL to the XLA
    twins' lowest-flat-window-index extraction — which lets the pass
    run as only TWO full-block-to-scalar tree reductions (max score,
    min doc among maxima) instead of three.  Those ~70-cycle serial
    reductions dominate extraction (the vector work is a handful of
    [8,128] ops), so dropping the flat-index reduction is a direct
    ~1/3 cut of the per-query top-k cost at k=16.

    Docs are unique within a window, so (is_mx & d_o == dv) names one
    element.  Extraction invalidates BOTH the score (-> -inf) and the
    doc (-> INT32_MAX): once the block is exhausted mx = -inf and is_mx
    covers every lane, so dv must reduce to the INT32_MAX filler, not
    to a previously-extracted real doc id.
    """
    INF32 = jnp.int32(2**31 - 1)
    mx = jnp.max(sc)                                       # scalar
    is_mx = sc == mx
    dv = jnp.min(jnp.where(is_mx, d_o, INF32))             # scalar
    hit = is_mx & (d_o == dv)
    sc = jnp.where(hit, NEG_INF, sc)
    d_o = jnp.where(hit, INF32, d_o)
    return mx, dv, sc, d_o


def _rel_cmp(pd_i, mdm_i, rel, rel_stride):
    """[128, 128] pivot-lane x member-lane hit matrix: equality by
    default; rel != (0, 0) tests member in [pivot+lo, pivot+hi] with
    doc-boundary clamps (see _member_pass docstring)."""
    if rel == (0, 0):
        return pd_i[:, None] == mdm_i[None, :]
    pos = pd_i & jnp.int32(rel_stride - 1)
    lo = pd_i + jnp.where(pos == 0, 0, jnp.int32(rel[0]))
    hi = pd_i + jnp.where(pos == jnp.int32(rel_stride - 1), 0,
                          jnp.int32(rel[1]))
    m = mdm_i[None, :]
    return (m >= lo[:, None]) & (m <= hi[:, None])


def _member_pass(pdocs_ref, valid_ref, hit_ref, tfa_ref, acc_h, acc_t,
                 mdocs_r, mtf_r, mfm_r, r_m, mlen, qm_t,
                 rows_p, rows_m, p_end, check_mask: bool = True,
                 want_tf: bool = True, rel=(0, 0), rel_stride: int = 0):
    """hit/tf of the member window at the pivot candidates.

    Writes hit_ref/tfa_ref over the first rows_p rows.  valid_ref narrows
    the per-tile doc range (pmin/pmax) — candidates already invalidated
    don't widen the member search.  Work scales with the REAL window
    lengths, not the pow-4 buckets: the pivot-tile loop stops at `p_end`
    (the pivot's live row count; rows past it keep stale hit/tf, which
    only ever lands in lanes the phase has already invalidated).

    The [128, 128] all-pairs compares run per (pivot row, member row)
    PAIR, predicated by hoisted scalar row ranges — since both windows
    are doc-sorted, only ~W/128 row pairs truly overlap, vs 8x8 per tile
    pair.  Results accumulate in (8, 128) scratch rows (static sublane
    addressing — dynamic single-row VMEM writes would be misaligned) and
    fold into hit_ref/tfa_ref once per pivot tile.

    check_mask=False skips the field-mask validity test — for member
    windows without masks (tag postings; key->doc folds use an explicit
    0/1 validity buffer with qm == 1 instead).  want_tf=False skips the
    tf accumulation entirely for members whose tf the caller never reads
    (tag postings, phrase key->doc folds).

    rel=(lo, hi) != (0, 0) switches the hit test from equality to RANGE
    membership: member in [pivot + lo, pivot + hi] — the 2-term exact
    phrase probe (position keys: member key in {k0, k0+1}).  rel_stride
    (pow2) guards the doc boundary: a pivot key at in-doc position 0
    clamps lo to 0, one at position stride-1 clamps hi to 0, so the
    range never crosses into a neighboring doc's key block."""
    fi_m = _flat_iota(rows_m)
    m_inr = (fi_m >= r_m) & (fi_m < r_m + mlen)
    mdocs_masked = jnp.where(m_inr, mdocs_r[:rows_m, :],
                             jnp.int32(2**31 - 1))
    n_pt = rows_p // R_TILE
    mt_max = rows_m // R_TILE
    R = R_TILE
    INF = jnp.int32(2**31 - 1)

    def pivot_tile(pt, _c):
        prow = pl.multiple_of(pt * R, R)
        pd = pdocs_ref[pl.ds(prow, R), :]          # [8, 128]
        pv = valid_ref[pl.ds(prow, R), :] != 0
        pdm_lo = jnp.where(pv, pd, INF)
        pdm_hi = jnp.where(pv, pd, jnp.int32(-1))
        pmin = jnp.min(pdm_lo)
        pmax = jnp.max(pdm_hi)
        # per-row doc ranges for the overlap predicate ([8, 1] keepdims:
        # 1D vectors are fragile under Mosaic legalization); scalars are
        # hoisted once per tile so pair predicates are scalar-ALU only
        rmin = jnp.min(pdm_lo, axis=1, keepdims=True) + rel[0]  # [8, 1]
        rmax = jnp.max(pdm_hi, axis=1, keepdims=True) + rel[1]
        s_rmin = [rmin[pi, 0] for pi in range(R)]
        s_rmax = [rmax[pi, 0] for pi in range(R)]
        # member tile range covering [pmin, pmax] (rel-widened): counts
        # are positions among the window's live docs (flat offset r_m)
        lo_e = r_m + jnp.sum((mdocs_masked < pmin + rel[0])
                             .astype(jnp.int32))
        hi_e = r_m + jnp.sum((mdocs_masked <= pmax + rel[1])
                             .astype(jnp.int32))
        lo_t = lo_e // TILE
        hi_t = jnp.minimum((hi_e + TILE - 1) // TILE, mt_max)

        rsel = jax.lax.broadcasted_iota(jnp.int32, (R, BLK), 0)
        if want_tf:
            acc_t[:] = jnp.zeros((R, BLK), jnp.float32)
        else:
            acc_h[:] = jnp.zeros((R, BLK), jnp.int32)

        def member_tile(mtile, _i):
            mrow = pl.multiple_of(mtile * R, R)
            md = mdocs_r[pl.ds(mrow, R), :]
            base = mtile * TILE
            fi = (base + rsel * BLK
                  + jax.lax.broadcasted_iota(jnp.int32, (R, BLK), 1))
            mv = (fi >= r_m) & (fi < r_m + mlen)
            if check_mask:
                mf = mfm_r[pl.ds(mrow, R), :]
                mv = mv & ((mf & qm_t) != 0)
            # invalid member lanes become INF: they can only "match"
            # INT32_MAX pivot padding lanes, which the phase has already
            # invalidated (their score/valid is masked downstream)
            mdm = jnp.where(mv, md, INF)
            if want_tf:
                mtfm = jnp.where(mv, mtf_r[pl.ds(mrow, R), :], 0.0)
            mrow_lo = jnp.min(mdm, axis=1, keepdims=True)      # [8, 1]
            mrow_hi = jnp.max(jnp.where(mv, md, jnp.int32(-1)),
                              axis=1, keepdims=True)
            # want_tf (text members): term frequencies are >= 1 by
            # construction (a posting exists only for tf >= 1; invalid
            # lanes are zeroed), so hit == (tf accumulation > 0) and the
            # pair body runs ONE lane reduction (the tf sum) instead of
            # two — hit_ref derives from tfa_ref after the tile loop.
            if rows_m <= 2 * rows_p:
                # comparable densities: ~1 member row overlaps each
                # pivot row — per-PAIR predication skips most of the
                # 8x8 compares (measured 63 -> 47 us/q at (8k, 8k))
                s_mlo = [mrow_lo[mi, 0] for mi in range(R)]
                s_mhi = [mrow_hi[mi, 0] for mi in range(R)]
                for pi in range(R):
                    pd_i = pd[pi]                   # [128] static row
                    for mi in range(R):
                        @pl.when((s_mhi[mi] >= s_rmin[pi])
                                 & (s_mlo[mi] <= s_rmax[pi]))
                        def _pair(pi=pi, mi=mi, pd_i=pd_i):
                            eq = _rel_cmp(pd_i, mdm[mi], rel,
                                          rel_stride)
                            if want_tf:
                                acc_t[pi:pi + 1, :] = \
                                    acc_t[pi:pi + 1, :] + jnp.sum(
                                        jnp.where(eq, mtfm[mi][None, :],
                                                  0.0), axis=1)[None, :]
                            else:
                                acc_h[pi:pi + 1, :] = jnp.maximum(
                                    acc_h[pi:pi + 1, :],
                                    jnp.any(eq, axis=1
                                            ).astype(jnp.int32)[None, :])
            else:
                # member much denser than pivot: most pairs in a visited
                # tile DO overlap — per-pair predication/RMW only adds
                # overhead (measured 198 -> 313 us/q at (8k, 131k)).
                # Register-fold the mi loop per pivot row instead, with
                # one tile-level guard.
                mt_lo = jnp.min(mdm)
                mt_hi = jnp.max(jnp.where(mv, md, jnp.int32(-1)))
                for pi in range(R):
                    @pl.when((mt_hi >= s_rmin[pi]) & (mt_lo <= s_rmax[pi]))
                    def _row(pi=pi):
                        pd_i = pd[pi]               # [128] static row
                        hi_ = jnp.zeros((BLK,), jnp.bool_)
                        ti_ = jnp.zeros((BLK,), jnp.float32)
                        for mi in range(R):
                            eq = _rel_cmp(pd_i, mdm[mi], rel,
                                          rel_stride)
                            if want_tf:
                                ti_ = ti_ + jnp.sum(jnp.where(
                                    eq, mtfm[mi][None, :], 0.0), axis=1)
                            else:
                                hi_ = hi_ | jnp.any(eq, axis=1)
                        if want_tf:
                            acc_t[pi:pi + 1, :] = acc_t[pi:pi + 1, :] \
                                + ti_[None, :]
                        else:
                            acc_h[pi:pi + 1, :] = jnp.maximum(
                                acc_h[pi:pi + 1, :],
                                hi_.astype(jnp.int32)[None, :])
            return _i

        jax.lax.fori_loop(lo_t, hi_t, member_tile, 0)
        if want_tf:
            hit_ref[pl.ds(prow, R), :] = (acc_t[:] > 0.0
                                          ).astype(jnp.int32)
            tfa_ref[pl.ds(prow, R), :] = acc_t[:]
        else:
            hit_ref[pl.ds(prow, R), :] = acc_h[:]
        return _c

    jax.lax.fori_loop(0, jnp.minimum(p_end, n_pt), pivot_tile, 0)


def _slot_srcs(T: int, groups) -> list:
    """Per-slot source index from the (flag, slots, src) groups:
    -1 = text postings, >= 0 = aux doc-window array (tag postings)."""
    src = [-1] * T
    for g in groups:
        s = g[2] if len(g) > 2 else -1
        for t in g[1]:
            src[t] = s
    return src


def _kernel(meta_ref, doc_ids, freqs, masks, dl,
            *rest, T, Ws, groups, pivot_g, k, n_aux, dense=(), G=1,
            raw=False):
    """G queries per grid step (see module docstring).

    Within a step, queries execute serially under a fori loop while the
    NEXT query's posting windows DMA into the other half of a double-
    buffered scratch (selected by a dynamic, tile-aligned row offset),
    amortizing the per-step machinery and hiding DMA issue latency.
    Float metadata (tweights, avgdl, dense consts) rides the int32
    scalar-prefetch buffer as bit patterns, bitcast back through a
    [1, BLK] vector (scalar tpu.bitcast does not lower) — so the kernel
    needs NO per-step input block at all.

    `dense`: ((flag, aux_src, n_vals), ...) — dense posting-aligned code
    predicates (single-valued TAG fields).  aux[aux_src] is an int32
    column PARALLEL to the text postings (code of the posting's doc);
    the predicate DMAs the column rows at each PIVOT slot's window
    offsets and compares against the query's value ids — one vector
    compare instead of a posting-window membership pass.  Applied before
    the member passes so dead candidates narrow their doc ranges."""
    aux = rest[:n_aux]
    if raw:
        # raw mode emits the masked (doc, score) pivot windows and no
        # counts — top-k and counting happen in batched XLA outside
        out_docs, out_scores = rest[n_aux:n_aux + 2]
        out_counts = None
        scratch = rest[n_aux + 2:]
    else:
        out_docs, out_scores, out_counts = rest[n_aux:n_aux + 3]
        scratch = rest[n_aux + 3:]
    step = pl.program_id(0)
    srcs = _slot_srcs(T, groups)
    pivots = list(groups[pivot_g][1])
    nbuf = 2 if G > 1 else 1
    bufrefs = []
    at = 0
    for t in range(T):
        if srcs[t] < 0:
            bufrefs.append((scratch[at], scratch[at + 1],
                            scratch[at + 2], scratch[at + 3]))
            at += 4
        else:
            bufrefs.append((scratch[at], scratch[at + 1]))
            at += 2
    dbufs = []                       # dense code windows [d][pivot_j]
    for _d in dense:
        row = []
        for _p in pivots:
            row.append(scratch[at])
            at += 1
        dbufs.append(row)
    valid_ref = scratch[at]
    hit_ref = scratch[at + 1]
    tfa_ref = scratch[at + 2]
    acc_h = scratch[at + 3]
    acc_t = scratch[at + 4]
    sems = scratch[at + 5]

    dense_off = []
    _off = 3 * T
    for (_fl, _src, nv) in dense:
        dense_off.append(_off)
        _off += nv
    F0 = _off                        # f32 metadata bit columns start
    rows = [Ws[t] // BLK + R_EXTRA for t in range(T)]
    n_dma = 4 * T + len(dense) * len(pivots)

    def _copies(g, buf):
        """The DMA set for query step*G+g into buffer half `buf` —
        built identically for start() and wait()."""
        q = step * G + g
        starts = [meta_ref[q, t] for t in range(T)]
        srows = [starts[t] // BLK for t in range(T)]

        def dst(r, t):
            return r.at[pl.ds(pl.multiple_of(buf * rows[t], R_TILE),
                              rows[t])]
        cps = []
        for t in range(T):
            if srcs[t] < 0:
                d, f, fm, dlr = bufrefs[t]
                cps.append(pltpu.make_async_copy(
                    doc_ids.at[pl.ds(srows[t], rows[t]), :], dst(d, t),
                    sems.at[buf, 4 * t]))
                cps.append(pltpu.make_async_copy(
                    freqs.at[pl.ds(srows[t], rows[t]), :], dst(f, t),
                    sems.at[buf, 4 * t + 1]))
                cps.append(pltpu.make_async_copy(
                    masks.at[pl.ds(srows[t], rows[t]), :], dst(fm, t),
                    sems.at[buf, 4 * t + 2]))
                if t in pivots:
                    cps.append(pltpu.make_async_copy(
                        dl.at[pl.ds(srows[t], rows[t]), :], dst(dlr, t),
                        sems.at[buf, 4 * t + 3]))
            else:
                d, _ = bufrefs[t]
                cps.append(pltpu.make_async_copy(
                    aux[srcs[t]].at[pl.ds(srows[t], rows[t]), :],
                    dst(d, t), sems.at[buf, 4 * t]))
        for di, (_fl, dsrc, _nv) in enumerate(dense):
            for pj, p in enumerate(pivots):
                cps.append(pltpu.make_async_copy(
                    aux[dsrc].at[pl.ds(srows[p], rows[p]), :],
                    dst(dbufs[di][pj], p),
                    sems.at[buf, 4 * T + di * len(pivots) + pj]))
        return cps

    for c in _copies(0, 0):
        c.start()

    def body(g, carry):
        buf = g % nbuf
        q = step * G + g

        @pl.when(g + 1 < G)
        def _issue_next():
            for c in _copies(g + 1, (g + 1) % nbuf):
                c.start()
        for c in _copies(g, buf):
            c.wait()

        def m(i):
            return meta_ref[q, i]

        def fval(col):
            """f32 metadata as a [1, BLK] broadcastable vector."""
            return jax.lax.bitcast_convert_type(
                jnp.full((1, BLK), m(F0 + col), jnp.int32), jnp.float32)

        starts = [m(t) for t in range(T)]
        lens = [m(T + t) for t in range(T)]
        qmasks = [m(2 * T + t) for t in range(T)]
        tws = [fval(t) for t in range(T)]
        avgdl = fval(T)
        srows = [starts[t] // BLK for t in range(T)]
        rr = [starts[t] % BLK for t in range(T)]

        def view(t):
            base = pl.multiple_of(buf * rows[t], R_TILE)
            return tuple(r.at[pl.ds(base, rows[t])] for r in bufrefs[t])
        refs = [view(t) for t in range(T)]
        drefs = [[dbufs[di][pj].at[pl.ds(
            pl.multiple_of(buf * rows[p], R_TILE), rows[p])]
            for pj, p in enumerate(pivots)]
            for di in range(len(dense))]

        return _kernel_query(
            m, fval, refs, drefs, valid_ref, hit_ref, tfa_ref, acc_h,
            acc_t, out_docs, out_scores, out_counts, g, carry,
            T=T, Ws=Ws, groups=groups, pivot_g=pivot_g, k=k,
            dense=dense, dense_off=dense_off, srcs=srcs, pivots=pivots,
            rows=rows, starts=starts, lens=lens, qmasks=qmasks,
            tws=tws, avgdl=avgdl, rr=rr, raw=raw)

    jax.lax.fori_loop(0, G, body, 0)


def _kernel_query(m, fval, refs, drefs, valid_ref, hit_ref, tfa_ref,
                  acc_h, acc_t, out_docs, out_scores, out_counts, g,
                  carry, *, T, Ws, groups, pivot_g, k, dense, dense_off,
                  srcs, pivots, rows, starts, lens, qmasks, tws, avgdl,
                  rr, raw=False):
    """One query's phases + in-VMEM top-k (the per-g body).

    raw=True skips the in-VMEM extraction entirely: each phase's masked
    (doc, score) window rows stream straight to the output blocks and a
    batched XLA iter_topk finishes outside the kernel.  The k serial
    max-extractions are scalar-reduction-LATENCY bound (~0.35 us each);
    for small pivot windows the [B, W] vector merge outside runs at
    full VPU throughput instead (~0.3-0.7 us/query total)."""

    def run_phase(p, pj, others):
        """Candidates = slot p's window.  `others` entries are either
        ("slot", u, kind) pivot-group siblings (kind "fold" /
        "dedup+fold") or ("group", flag, slot_tuple) non-pivot groups
        (hit = OR over the group's slots, score = sum of slot
        contributions, validity by the group's REQ/NOT/OPT flag).
        Dense code predicates apply FIRST — they're one compare each and
        dead candidates narrow the member passes' doc ranges."""
        rows_p = rows[p]
        r_p = rr[p]
        pdocs_ref, ptf_ref, pfm_ref, pdl_ref = refs[p]
        iota_w = _flat_iota(rows_p)
        pdocs = pdocs_ref[:]
        in_range = (iota_w >= r_p) & (iota_w < r_p + lens[p])
        pvalid = in_range & ((pfm_ref[:] & qmasks[p]) != 0)
        pdl = pdl_ref[:]

        def bm25(tf, w):
            norm = K1 * (1.0 - B_ + B_ * pdl
                         / jnp.maximum(avgdl, 1e-9))
            return w * tf * (K1 + 1.0) / (tf + norm)

        score = jnp.where(pvalid, bm25(ptf_ref[:], tws[p]), 0.0)
        for di, (fl, _src, nv) in enumerate(dense):
            cw = drefs[di][pj][:rows_p, :]
            hitd = cw == m(dense_off[di])
            for v in range(1, nv):
                hitd = hitd | (cw == m(dense_off[di] + v))
            dconst = fval(T + 1 + di)
            if fl == REQ:
                pvalid = pvalid & hitd
                score = score + jnp.where(hitd, dconst, 0.0)
            elif fl == NOT:
                pvalid = pvalid & ~hitd
            else:
                score = score + jnp.where(hitd, dconst, 0.0)
        valid_ref[:rows_p, :] = pvalid.astype(jnp.int32)

        # pivot tiles past the REAL window length hold only invalid
        # lanes — the member passes stop there instead of walking the
        # pow-4 bucket padding (typically a 2-4x work cut)
        p_end = (r_p + lens[p] + TILE - 1) // TILE

        def slot_member(u):
            if srcs[u] < 0:
                mdocs_r, mtf_r, mfm_r, _ = refs[u]
                _member_pass(pdocs_ref, valid_ref, hit_ref, tfa_ref,
                             acc_h, acc_t,
                             mdocs_r, mtf_r, mfm_r, rr[u], lens[u],
                             qmasks[u], rows_p, rows[u], p_end)
            else:
                mdocs_r, mdum_r = refs[u]
                _member_pass(pdocs_ref, valid_ref, hit_ref, tfa_ref,
                             acc_h, acc_t,
                             mdocs_r, mdum_r, mdum_r, rr[u], lens[u],
                             jnp.int32(0), rows_p, rows[u], p_end,
                             check_mask=False, want_tf=False)
            return hit_ref[:rows_p, :] != 0, tfa_ref[:rows_p, :]

        for item in others:
            valid = valid_ref[:rows_p, :] != 0
            if item[0] == "slot":
                _tag, u, kind = item
                hit, tf_u = slot_member(u)
                score = score + jnp.where(hit, bm25(tf_u, tws[u]), 0.0)
                if kind == "dedup+fold":
                    # an earlier sibling owns docs it also matched
                    valid = valid & ~hit
            else:
                _tag, fl, slots_g, gsrc = item
                ghit = jnp.zeros((rows_p, BLK), jnp.bool_)
                gadd = jnp.zeros((rows_p, BLK), jnp.float32)
                for u in slots_g:
                    hit, tf_u = slot_member(u)
                    ghit = ghit | hit
                    if gsrc < 0:
                        gadd = gadd + jnp.where(hit, bm25(tf_u, tws[u]),
                                                0.0)
                if gsrc >= 0:
                    # doc-window groups (tags) score their leaf constant
                    # ONCE per doc (engine pred_leaf LTag: const)
                    gadd = jnp.where(ghit, tws[slots_g[0]], 0.0)
                if fl == REQ:
                    valid = valid & ghit
                    score = score + gadd
                elif fl == NOT:
                    valid = valid & ~ghit
                else:  # OPT
                    score = score + gadd
            valid_ref[:rows_p, :] = valid.astype(jnp.int32)

        valid = valid_ref[:rows_p, :] != 0
        return (jnp.where(valid, pdocs, jnp.int32(2**31 - 1)),
                jnp.where(valid, score, NEG_INF))

    # In-VMEM top-k per phase: k max-extractions over the masked score
    # window (each = 4 small reductions), recorded into [P*k] output
    # lanes via static-position selects.  Replaces [B, W]-wide HBM
    # outputs + a batched 16-pass iter_topk outside — the whole result
    # of a query leaves the kernel as <=2 output rows.  Ties break by
    # lowest flat window index, exactly like iter_topk.
    INF32 = jnp.int32(2**31 - 1)
    P_n = len(pivots)
    if raw:
        off = 0
        for pi, p in enumerate(pivots):
            others = [("slot", u, "dedup+fold") for u in pivots[:pi]]
            others += [("slot", u, "fold") for u in pivots[pi + 1:]]
            for gi, grp in enumerate(groups):
                if gi == pivot_g:
                    continue
                others.append(("group", grp[0], grp[1],
                               grp[2] if len(grp) > 2 else -1))
            d_o, s_o = run_phase(p, pi, others)
            out_docs[pl.ds(g, 1), pl.ds(off, rows[p])] = d_o[None]
            out_scores[pl.ds(g, 1), pl.ds(off, rows[p])] = s_o[None]
            off += rows[p]
        return carry
    KR = max(-(-(P_n * k) // BLK), 1)
    oi = _flat_iota(KR)
    topd = jnp.full((KR, BLK), INF32)
    tops = jnp.full((KR, BLK), NEG_INF, jnp.float32)
    cnts = jnp.zeros((1, BLK), jnp.int32)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
    for pi, p in enumerate(pivots):
        others = [("slot", u, "dedup+fold") for u in pivots[:pi]]
        others += [("slot", u, "fold") for u in pivots[pi + 1:]]
        for gi, grp in enumerate(groups):
            if gi == pivot_g:
                continue
            others.append(("group", grp[0], grp[1],
                           grp[2] if len(grp) > 2 else -1))
        d_o, s_o = run_phase(p, pi, others)
        cnts = jnp.where(ci == pi,
                         jnp.sum((d_o != INF32).astype(jnp.int32)), cnts)
        sc = s_o
        for i in range(k):
            mx, dv, sc, d_o = _extract_pass(sc, d_o)
            opos = oi == (pi * k + i)
            topd = jnp.where(opos, dv, topd)
            tops = jnp.where(opos, mx, tops)
    out_docs[pl.ds(g, 1)] = topd[None]
    out_scores[pl.ds(g, 1)] = tops[None]
    out_counts[pl.ds(g, 1)] = cnts[None]
    return carry


def _xla_impl(meta, fmeta, doc_ids, freqs, masks, posting_dl,
              *aux, T, Ws, groups, pivot_g, k, dense=()):
    """Pure-XLA twin of the kernel semantics — the CPU fallback and the
    cross-check oracle for the Pallas lowering (interpret mode cannot
    discharge the kernels' DMAs)."""
    INF = jnp.int32(2**31 - 1)
    srcs = _slot_srcs(T, groups)
    dense_off = []
    _off = 3 * T
    for (_fl, _src, nv) in dense:
        dense_off.append(_off)
        _off += nv

    def one(mrow, frow):
        starts = mrow[:T]
        lens = mrow[T:2 * T]
        qm = mrow[2 * T:3 * T]
        tws = frow[:T]
        avgdl = frow[T]

        def win(t):
            W = Ws[t]
            st = starts[t]
            if srcs[t] >= 0:
                d = jax.lax.dynamic_slice(aux[srcs[t]], (st,), (W,))
                i = jnp.arange(W)
                inr = i < lens[t]
                return (jnp.where(inr, d, INF),
                        jnp.zeros((W,), jnp.float32), inr,
                        jnp.zeros((W,), jnp.float32))
            d = jax.lax.dynamic_slice(doc_ids, (st,), (W,))
            f = jax.lax.dynamic_slice(freqs, (st,), (W,))
            mk = jax.lax.dynamic_slice(masks, (st,), (W,))
            dlw = jax.lax.dynamic_slice(posting_dl, (st,), (W,))
            i = jnp.arange(W)
            inr = i < lens[t]
            v = inr & ((mk & qm[t]) != 0)
            return jnp.where(inr, d, INF), f, v, dlw

        def member(t, pd):
            md, mf_, mv, _ = win(t)
            idx = jnp.clip(jnp.searchsorted(md, pd), 0, Ws[t] - 1)
            hit = (md[idx] == pd) & mv[idx] & (pd != INF)
            return hit, jnp.where(hit, mf_[idx], 0.0)

        def phase(p, others):
            pd, pf, pvalid, pdl = win(p)

            def bm25(tf, w):
                norm = K1 * (1.0 - B_ + B_ * pdl
                             / jnp.maximum(avgdl, 1e-9))
                return w * tf * (K1 + 1.0) / (tf + norm)

            score = jnp.where(pvalid, bm25(pf, tws[p]), 0.0)
            valid = pvalid
            for di, (fl, dsrc, nv) in enumerate(dense):
                cw = jax.lax.dynamic_slice(aux[dsrc], (starts[p],),
                                           (Ws[p],))
                hitd = cw == mrow[dense_off[di]]
                for v in range(1, nv):
                    hitd = hitd | (cw == mrow[dense_off[di] + v])
                dconst = frow[T + 1 + di]
                if fl == REQ:
                    valid = valid & hitd
                    score = score + jnp.where(hitd, dconst, 0.0)
                elif fl == NOT:
                    valid = valid & ~hitd
                else:
                    score = score + jnp.where(hitd, dconst, 0.0)
            for item in others:
                if item[0] == "slot":
                    _tag, u, kind = item
                    hit, tf_m = member(u, pd)
                    score = score + jnp.where(hit, bm25(tf_m, tws[u]),
                                              0.0)
                    if kind == "dedup+fold":
                        valid = valid & ~hit
                else:
                    _tag, fl, slots_g, gsrc = item
                    ghit = jnp.zeros_like(pvalid)
                    gadd = jnp.zeros_like(score)
                    for u in slots_g:
                        hit, tf_m = member(u, pd)
                        ghit = ghit | hit
                        if gsrc < 0:
                            gadd = gadd + jnp.where(
                                hit, bm25(tf_m, tws[u]), 0.0)
                    if gsrc >= 0:
                        gadd = jnp.where(ghit, tws[slots_g[0]], 0.0)
                    if fl == REQ:
                        valid = valid & ghit
                        score = score + gadd
                    elif fl == NOT:
                        valid = valid & ~ghit
                    else:
                        score = score + gadd
            return (jnp.where(valid, pd, INF),
                    jnp.where(valid, score, jnp.float32(NEG_INF)))

        pivots = list(groups[pivot_g][1])
        P_n = len(pivots)
        KR = max(-(-(P_n * k) // BLK), 1)
        oi = jnp.arange(KR * BLK)
        topd = jnp.full((KR * BLK,), INF)
        tops = jnp.full((KR * BLK,), NEG_INF, jnp.float32)
        cnts = jnp.zeros((BLK,), jnp.int32)
        ci = jnp.arange(BLK)
        for pi, p in enumerate(pivots):
            others = [("slot", u, "dedup+fold") for u in pivots[:pi]]
            others += [("slot", u, "fold") for u in pivots[pi + 1:]]
            for gi, g in enumerate(groups):
                if gi == pivot_g:
                    continue
                others.append(("group", g[0], g[1],
                               g[2] if len(g) > 2 else -1))
            d, sc = phase(p, others)
            fiw = jnp.arange(d.shape[0])
            cnts = jnp.where(ci == pi,
                             jnp.sum((d != INF).astype(jnp.int32)), cnts)
            # identical extraction loop to the kernel (incl. the
            # exhausted-phase quirk: mx = NEG_INF picks lane 0's doc
            # with a NEG_INF score, which every consumer filters out)
            for i in range(k):
                mx = jnp.max(sc)
                sel = jnp.min(jnp.where(sc == mx, fiw, INF))
                hit_lane = fiw == sel
                dv = jnp.min(jnp.where(hit_lane, d, INF))
                opos = oi == (pi * k + i)
                topd = jnp.where(opos, dv, topd)
                tops = jnp.where(opos, mx, tops)
                sc = jnp.where(hit_lane, NEG_INF, sc)
        return topd, tops, cnts

    docs, scores, cnts = jax.vmap(one)(meta, fmeta)
    P_n = len(groups[pivot_g][1])
    return docs, scores, jnp.sum(cnts[:, :P_n], axis=1)


def _member_min_ge(anch_ref, ok_ref, found_ref, acc_f, mkeys_r, r_m, mlen,
                   rows_p, rows_m, p_end):
    """Per pivot lane: the smallest member key >= anchor (INT32_MAX if
    none) — the greedy probe of the in-order proximity chain
    (engine._phrase_chain_pivot probe_ge).  Same pair-predicated tile
    strategy as _member_pass: member tiles are range-bounded per pivot
    tile, plus ONE tile past the range (the first key beyond the pivot's
    max anchor may live there).  A member ROW qualifies for pivot row pi
    when it has keys >= rmin[pi] and either overlaps [rmin, rmax] or is
    the first row strictly above rmax (its predecessor row still starts
    at or below rmax); row 0 of a visited tile always qualifies — the
    predecessor lives in the previous tile, out of scalar reach."""
    fi_m = _flat_iota(rows_m)
    m_inr = (fi_m >= r_m) & (fi_m < r_m + mlen)
    mkeys_masked = jnp.where(m_inr, mkeys_r[:rows_m, :],
                             jnp.int32(2**31 - 1))
    n_pt = rows_p // R_TILE
    mt_max = rows_m // R_TILE
    R = R_TILE
    INF = jnp.int32(2**31 - 1)

    def pivot_tile(pt, _c):
        prow = pl.multiple_of(pt * R, R)
        pa = anch_ref[pl.ds(prow, R), :]           # [8, 128] anchors
        pv = ok_ref[pl.ds(prow, R), :] != 0
        pam_lo = jnp.where(pv, pa, INF)
        pam_hi = jnp.where(pv, pa, jnp.int32(-1))
        pmin = jnp.min(pam_lo)
        pmax = jnp.max(pam_hi)
        rmin = jnp.min(pam_lo, axis=1, keepdims=True)     # [8, 1]
        rmax = jnp.max(pam_hi, axis=1, keepdims=True)
        s_rmin = [rmin[pi, 0] for pi in range(R)]
        s_rmax = [rmax[pi, 0] for pi in range(R)]
        lo_e = r_m + jnp.sum((mkeys_masked < pmin).astype(jnp.int32))
        hi_e = r_m + jnp.sum((mkeys_masked <= pmax).astype(jnp.int32))
        lo_t = lo_e // TILE
        # +1 tile: the smallest key > pmax can sit past the counted range
        hi_t = jnp.minimum((hi_e + TILE - 1) // TILE + 1, mt_max)

        acc_f[:] = jnp.full((R, BLK), INF)

        def member_tile(mtile, _i):
            mrow = pl.multiple_of(mtile * R, R)
            mk = mkeys_r[pl.ds(mrow, R), :]
            base = mtile * TILE
            rsel = jax.lax.broadcasted_iota(jnp.int32, (R, BLK), 0)
            fi = (base + rsel * BLK
                  + jax.lax.broadcasted_iota(jnp.int32, (R, BLK), 1))
            mv = (fi >= r_m) & (fi < r_m + mlen)
            mkm = jnp.where(mv, mk, INF)
            mrow_lo = jnp.min(mkm, axis=1, keepdims=True)      # [8, 1]
            mrow_hi = jnp.max(jnp.where(mv, mk, jnp.int32(-1)),
                              axis=1, keepdims=True)
            if rows_m <= 2 * rows_p:
                s_mlo = [mrow_lo[mi, 0] for mi in range(R)]
                s_mhi = [mrow_hi[mi, 0] for mi in range(R)]
                for pi in range(R):
                    pa_i = pa[pi]                   # [128] static row
                    for mi in range(R):
                        cond = s_mhi[mi] >= s_rmin[pi]
                        if mi > 0:
                            # not past the first row strictly above
                            # rmax; an INF predecessor is an empty/out-
                            # of-window row (e.g. before the window
                            # start), not a real row above rmax — stay
                            # conservative there
                            cond = cond & ((s_mlo[mi - 1] <= s_rmax[pi])
                                           | (s_mlo[mi - 1] == INF))

                        @pl.when(cond)
                        def _pair(pi=pi, mi=mi, pa_i=pa_i):
                            ge = mkm[mi][None, :] >= pa_i[:, None]
                            cand = jnp.where(ge, mkm[mi][None, :], INF)
                            acc_f[pi:pi + 1, :] = jnp.minimum(
                                acc_f[pi:pi + 1, :],
                                jnp.min(cand, axis=1)[None, :])
            else:
                # dense member: register-fold mi per pivot row (see
                # _member_pass for the ratio rationale)
                mt_lo = jnp.min(mkm)
                mt_hi = jnp.max(jnp.where(mv, mk, jnp.int32(-1)))
                for pi in range(R):
                    @pl.when((mt_hi >= s_rmin[pi]) & (mt_lo != INF))
                    def _row(pi=pi):
                        pa_i = pa[pi]               # [128] static row
                        best = jnp.full((BLK,), INF)
                        for mi in range(R):
                            ge = mkm[mi][None, :] >= pa_i[:, None]
                            cand = jnp.where(ge, mkm[mi][None, :], INF)
                            best = jnp.minimum(best,
                                               jnp.min(cand, axis=1))
                        acc_f[pi:pi + 1, :] = jnp.minimum(
                            acc_f[pi:pi + 1, :], best[None, :])
            return _i

        jax.lax.fori_loop(lo_t, hi_t, member_tile, 0)
        found_ref[pl.ds(prow, R), :] = acc_f[:]
        return _c

    jax.lax.fori_loop(0, jnp.minimum(p_end, n_pt), pivot_tile, 0)


def _phrase_kernel(meta_ref, fmeta, doc_ids, freqs, masks, dl, poskeys,
                   *rest, T, Ws, PWs, stride, slop, k, raw=False,
                   eq_pivot=-1):
    """Exact / in-order-slop phrase, one query per grid step.

    Chain semantics mirror engine._phrase_chain_pivot (in-order branch):
    candidates are TERM 0's position keys; each later term greedily
    advances to its smallest key >= anchor; the running span
    sum(pos_i - pos_{i-1} - 1) must stay <= slop at every step and every
    key must stay in the candidate's doc.  Valid keys then fold to doc
    hits on term 0's posting window (key // stride == doc), and scoring
    adds each slot's BM25 contribution where the doc sits mask-valid in
    that slot's postings (engine gen_phrase).

    raw=True (same contract as _kernel): emit the full masked
    (doc, score) window of term 0 and no counts — the k-pass in-VMEM
    extraction (scalar-latency-bound) is replaced by one batched
    iter_topk outside at full VPU throughput.

    eq_pivot >= 0 (2-term exact phrases, slop == 0): the greedy anchor
    chain collapses to ONE range-membership pass — term-1 key in
    [k0, k0 + 1] (equal allowed, same chain semantics) — pivoted on
    the smaller position window via _member_pass(rel=...).  The
    chain's _member_min_ge probe measured up to 13x an and2 pass at
    imbalanced windows."""
    if raw:
        out_docs, out_scores = rest[:2]
        out_counts = None
        scratch = rest[2:]
    else:
        out_docs, out_scores, out_counts = rest[:3]
        scratch = rest[3:]
    q = pl.program_id(0)
    at = 0
    refs = []
    for t in range(T):
        refs.append((scratch[at], scratch[at + 1], scratch[at + 2],
                     scratch[at + 3]))          # docs, tf, fm, dl
        at += 4
    pkrefs = []
    for t in range(T):
        pkrefs.append(scratch[at])
        at += 1
    anch_ref = scratch[at]
    ok_ref = scratch[at + 1]
    span_ref = scratch[at + 2]
    found_ref = scratch[at + 3]
    kd_ref = scratch[at + 4]        # key -> doc (int), all lanes
    kdum_ref = scratch[at + 5]      # dummy f32 member-tf for the fold
    valid_ref = scratch[at + 6]
    hit_ref = scratch[at + 7]
    tfa_ref = scratch[at + 8]
    acc_h = scratch[at + 9]
    acc_t = scratch[at + 10]
    sems = scratch[at + 11]

    def m(i):
        return meta_ref[q, i]

    starts = [m(t) for t in range(T)]
    lens = [m(T + t) for t in range(T)]
    qmasks = [m(2 * T + t) for t in range(T)]
    pstarts = [m(3 * T + t) for t in range(T)]
    plens = [m(4 * T + t) for t in range(T)]
    tws = [fmeta[0, 0, t] for t in range(T)]
    avgdl = fmeta[0, 0, T]

    rows = [Ws[t] // BLK + R_EXTRA for t in range(T)]
    pkrows = [PWs[t] // BLK + R_EXTRA for t in range(T)]
    srows = [starts[t] // BLK for t in range(T)]
    rr = [starts[t] % BLK for t in range(T)]
    psrows = [pstarts[t] // BLK for t in range(T)]
    prr = [pstarts[t] % BLK for t in range(T)]

    dmas = []
    for t in range(T):
        d, f, fm, dlr = refs[t]
        dmas.append(pltpu.make_async_copy(
            doc_ids.at[pl.ds(srows[t], rows[t]), :], d, sems.at[5 * t]))
        dmas.append(pltpu.make_async_copy(
            freqs.at[pl.ds(srows[t], rows[t]), :], f, sems.at[5 * t + 1]))
        dmas.append(pltpu.make_async_copy(
            masks.at[pl.ds(srows[t], rows[t]), :], fm,
            sems.at[5 * t + 2]))
        if t == 0:
            dmas.append(pltpu.make_async_copy(
                dl.at[pl.ds(srows[t], rows[t]), :], dlr,
                sems.at[5 * t + 3]))
        dmas.append(pltpu.make_async_copy(
            poskeys.at[pl.ds(psrows[t], pkrows[t]), :], pkrefs[t],
            sems.at[5 * t + 4]))
    for c in dmas:
        c.start()
    for c in dmas:
        c.wait()

    INF = jnp.int32(2**31 - 1)
    piv = eq_pivot if eq_pivot >= 0 else 0
    rows_pk = pkrows[piv]
    pk_end = (prr[piv] + plens[piv] + TILE - 1) // TILE
    if eq_pivot >= 0:
        # --- 2-term exact phrase as ONE range-membership pass ---
        # chain semantics for slop 0 (engine._phrase_chain_pivot /
        # proximity.rs within_range_in_order): term-1 position in
        # {p0, p0 + 1} (equal allowed — overlapping synonym positions)
        # <=> term-1 key in [k0, k0 + 1], doc-boundary-guarded.  The
        # chain's _member_min_ge probe measured up to 13x an and2 pass
        # at imbalanced windows; this reuses the pair-predicated
        # _member_pass, pivoted on the SMALLER position window.
        other = 1 - piv
        rel = (0, 1) if piv == 0 else (-1, 0)
        fi_p = _flat_iota(rows_pk)
        inr_p = (fi_p >= prr[piv]) & (fi_p < prr[piv] + plens[piv])
        cand = jnp.where(inr_p, pkrefs[piv][:rows_pk, :], INF)
        ok_ref[:rows_pk, :] = inr_p.astype(jnp.int32)
        kd_ref[:rows_pk, :] = jnp.where(inr_p, cand // stride, INF)
        _member_pass(pkrefs[piv], ok_ref, found_ref, kdum_ref,
                     acc_h, acc_t, pkrefs[other], kdum_ref,
                     pkrefs[other], prr[other], plens[other],
                     jnp.int32(1), rows_pk, pkrows[other], pk_end,
                     check_mask=False, want_tf=False, rel=rel,
                     rel_stride=stride)
        ok_ref[:rows_pk, :] = jnp.where(
            (ok_ref[:rows_pk, :] != 0)
            & (found_ref[:rows_pk, :] != 0), 1, 0)
    else:
        fi0 = _flat_iota(rows_pk)
        in_r0 = (fi0 >= prr[0]) & (fi0 < prr[0] + plens[0])
        cand = jnp.where(in_r0, pkrefs[0][:rows_pk, :], INF)
        anch_ref[:rows_pk, :] = cand
        ok_ref[:rows_pk, :] = in_r0.astype(jnp.int32)
        span_ref[:rows_pk, :] = jnp.zeros((rows_pk, BLK), jnp.int32)
        doc0 = jnp.where(in_r0, cand // stride, INF)
        kd_ref[:rows_pk, :] = doc0
        # kdum's contents are never consumed (the fold reads hit only
        # and every _member_pass re-zeroes tfa per pivot tile) — it
        # just has to be a safely readable f32 buffer of the member's
        # row count

        for j in range(1, T):
            _member_min_ge(anch_ref, ok_ref, found_ref, acc_h,
                           pkrefs[j], prr[j], plens[j], rows_pk,
                           pkrows[j], pk_end)
            anchor = anch_ref[:rows_pk, :]
            ok = ok_ref[:rows_pk, :] != 0
            span = span_ref[:rows_pk, :]
            found = found_ref[:rows_pk, :]
            ok = (ok & (found >= anchor) & (found != INF)
                  & ((found // stride) == doc0))
            span = jnp.where(ok, span + (found - anchor - 1), span)
            ok = ok & (span <= max(slop, 0))
            anchor = jnp.where(ok, found, anchor)
            anch_ref[:rows_pk, :] = anchor
            ok_ref[:rows_pk, :] = ok.astype(jnp.int32)
            span_ref[:rows_pk, :] = span

    # fold valid keys to doc hits on term 0's posting window: kd holds
    # key//stride for EVERY lane (monotone, so _member_pass range
    # counting stays sound); lane validity rides ok_ref as the "field
    # mask" with qm == 1
    rows_p = rows[0]
    pdocs_ref, ptf_ref, pfm_ref, pdl_ref = refs[0]
    iota_w = _flat_iota(rows_p)
    in_range = (iota_w >= rr[0]) & (iota_w < rr[0] + lens[0])
    valid_ref[:rows_p, :] = in_range.astype(jnp.int32)
    p_end = (rr[0] + lens[0] + TILE - 1) // TILE
    _member_pass(pdocs_ref, valid_ref, hit_ref, tfa_ref, acc_h, acc_t,
                 kd_ref, kdum_ref, ok_ref, prr[piv], plens[piv],
                 jnp.int32(1), rows_p, rows_pk, p_end, want_tf=False)
    anylen = lens[0] > 0
    for t in range(1, T):
        anylen = anylen & (lens[t] > 0)
    dochit = (hit_ref[:rows_p, :] != 0) & in_range & anylen
    valid_ref[:rows_p, :] = dochit.astype(jnp.int32)

    pdl = pdl_ref[:]

    def bm25(tf, w):
        norm = K1 * (1.0 - B_ + B_ * pdl / jnp.maximum(avgdl, 1e-9))
        return w * tf * (K1 + 1.0) / (tf + norm)

    # slot 0 contributes where its own posting is mask-valid (scores are
    # per-slot gated by mask; phrase VALIDITY is positions-only,
    # engine gen_phrase: valid = chain docs, score = sum of member hits)
    hit0 = dochit & ((pfm_ref[:rows_p, :] & qmasks[0]) != 0)
    score = jnp.where(hit0, bm25(ptf_ref[:rows_p, :], tws[0]), 0.0)
    pdocs = pdocs_ref[:rows_p, :]
    for u in range(1, T):
        mdocs_r, mtf_r, mfm_r, _ = refs[u]
        _member_pass(pdocs_ref, valid_ref, hit_ref, tfa_ref, acc_h, acc_t,
                     mdocs_r, mtf_r, mfm_r, rr[u], lens[u],
                     qmasks[u], rows_p, rows[u], p_end)
        hit_u = (hit_ref[:rows_p, :] != 0) & dochit
        score = score + jnp.where(
            hit_u, bm25(tfa_ref[:rows_p, :], tws[u]), 0.0)

    d_o = jnp.where(dochit, pdocs, INF)
    s_o = jnp.where(dochit, score, NEG_INF)

    if raw:
        out_docs[0] = d_o
        out_scores[0] = s_o
        return

    # top-k extraction + count (single phase)
    KR = max(-(-k // BLK), 1)
    oi = _flat_iota(KR)
    topd = jnp.full((KR, BLK), INF)
    tops = jnp.full((KR, BLK), NEG_INF, jnp.float32)
    cnts = jnp.zeros((1, BLK), jnp.int32)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
    cnts = jnp.where(ci == 0,
                     jnp.sum((d_o != INF).astype(jnp.int32)), cnts)
    sc = s_o
    for i in range(k):
        mx, dv, sc, d_o = _extract_pass(sc, d_o)
        opos = oi == i
        topd = jnp.where(opos, dv, topd)
        tops = jnp.where(opos, mx, tops)
    out_docs[0] = topd
    out_scores[0] = tops
    out_counts[0] = cnts


def _xla_phrase_impl(meta, fmeta, doc_ids, freqs, masks, posting_dl,
                     poskeys, *, T, Ws, PWs, stride, slop, k):
    """Pure-XLA twin of _phrase_kernel — CPU fallback + lowering oracle.
    Semantics are the kernel's (which mirror engine._phrase_chain_pivot
    in-order + gen_phrase scoring)."""
    INF = jnp.int32(2**31 - 1)
    pk_flat = poskeys

    def one(mrow, frow):
        tstarts = mrow[:T]
        tlens = mrow[T:2 * T]
        qm = mrow[2 * T:3 * T]
        pstarts = mrow[3 * T:4 * T]
        plens = mrow[4 * T:5 * T]
        tws = frow[:T]
        avgdl = frow[T]

        def pwin(t):
            ks = jax.lax.dynamic_slice(pk_flat, (pstarts[t],), (PWs[t],))
            i = jnp.arange(PWs[t])
            return jnp.where(i < plens[t], ks, INF)

        cand = pwin(0)
        alive = cand != INF
        doc0 = jnp.where(alive, cand // stride, INF)
        anchor = cand
        ok = alive
        span = jnp.zeros(cand.shape, jnp.int32)
        for j in range(1, T):
            kj = pwin(j)
            idx = jnp.clip(jnp.searchsorted(kj, anchor), 0, PWs[j] - 1)
            found = jnp.where(jnp.searchsorted(kj, anchor) < PWs[j],
                              kj[idx], INF)
            ok = (ok & (found >= anchor) & (found != INF)
                  & ((found // stride) == doc0))
            span = jnp.where(ok, span + (found - anchor - 1), span)
            ok = ok & (span <= max(slop, 0))
            anchor = jnp.where(ok, found, anchor)

        def win(t):
            W = Ws[t]
            st = tstarts[t]
            d = jax.lax.dynamic_slice(doc_ids, (st,), (W,))
            f = jax.lax.dynamic_slice(freqs, (st,), (W,))
            mk = jax.lax.dynamic_slice(masks, (st,), (W,))
            dlw = jax.lax.dynamic_slice(posting_dl, (st,), (W,))
            i = jnp.arange(W)
            inr = i < tlens[t]
            mv = inr & ((mk & qm[t]) != 0)
            return jnp.where(inr, d, INF), f, mv, inr, dlw

        pd, pf, pmv, pinr, pdl = win(0)
        # fold: cumulative count of valid keys below each doc boundary
        okc = jnp.cumsum(ok.astype(jnp.int32))
        lo = jnp.searchsorted(cand, pd * stride)
        hi = jnp.searchsorted(cand, (pd + 1) * stride)
        c_at = lambda i: jnp.where(i > 0, okc[jnp.maximum(i - 1, 0)], 0)
        anylen = jnp.all(tlens > 0)
        dochit = pinr & (c_at(hi) - c_at(lo) > 0) & anylen

        def bm25(tf, w):
            norm = K1 * (1.0 - B_ + B_ * pdl / jnp.maximum(avgdl, 1e-9))
            return w * tf * (K1 + 1.0) / (tf + norm)

        score = jnp.where(dochit & pmv, bm25(pf, tws[0]), 0.0)
        for u in range(1, T):
            md, mf_, mmv, _minr, _mdl = win(u)
            idx = jnp.clip(jnp.searchsorted(md, pd), 0, Ws[u] - 1)
            hit = (md[idx] == pd) & mmv[idx] & dochit
            score = score + jnp.where(hit, bm25(mf_[idx], tws[u]), 0.0)

        d_o = jnp.where(dochit, pd, INF)
        s_o = jnp.where(dochit, score, jnp.float32(NEG_INF))
        KR = max(-(-k // BLK), 1)
        oi = jnp.arange(KR * BLK)
        topd = jnp.full((KR * BLK,), INF)
        tops = jnp.full((KR * BLK,), NEG_INF, jnp.float32)
        cnt = jnp.sum((d_o != INF).astype(jnp.int32))
        fiw = jnp.arange(d_o.shape[0])
        sc = s_o
        for i in range(k):
            mx = jnp.max(sc)
            sel = jnp.min(jnp.where(sc == mx, fiw, INF))
            hit_lane = fiw == sel
            dv = jnp.min(jnp.where(hit_lane, d_o, INF))
            opos = oi == i
            topd = jnp.where(opos, dv, topd)
            tops = jnp.where(opos, mx, tops)
            sc = jnp.where(hit_lane, NEG_INF, sc)
        return topd, tops, cnt

    docs, scores, cnts = jax.vmap(one)(meta, fmeta)
    return docs, scores, cnts


@functools.partial(
    jax.jit,
    static_argnames=("T", "Ws", "PWs", "stride", "slop", "k", "raw",
                     "eq_join"))
def phrase_batch(meta, fmeta, doc_ids, freqs, masks, posting_dl, poskeys,
                 *, T: int, Ws: tuple, PWs: tuple, stride: int,
                 slop: int = 0, k: int = 16, raw: bool = False,
                 eq_join: bool | None = None):
    """Exact / in-order phrase kernel over a batch.

    meta: int32 [B, 5T] — per slot posting starts, lens, qmasks, then
    poskey-window starts and lens (flat offsets into `poskeys`).
    fmeta: f32 [B, T+1] — slot tweights then avgdl.  Returns
    (docs [B, >=k], scores, counts [B]) — top-k score desc, doc asc ties.

    raw=True (small term-0 windows; same trick as intersect_batch):
    emit the full masked (doc, score) window instead of the in-VMEM
    k-pass extraction; callers finish with one batched iter_topk.  The
    CPU/XLA fallback ignores `raw` (its outputs are already top-k; the
    engine's merge is a no-op on them).

    eq_join: 2-term exact phrases (slop == 0) run as one
    range-membership pass pivoted on the smallest position window (see
    _phrase_kernel).  Default (None) enables it for T == 2, slop == 0
    and pow2 stride; pass False when the segment clamped positions at
    stride - 1 (builder pos_clamped — clamped keys would be judged
    differently by the two formulations)."""
    if not _use_pallas():
        return _xla_phrase_impl(meta, fmeta, doc_ids, freqs, masks,
                                posting_dl, poskeys, T=T, Ws=Ws, PWs=PWs,
                                stride=stride, slop=slop, k=k)
    B = meta.shape[0]
    rows = [Ws[t] // BLK + R_EXTRA for t in range(T)]
    pkrows = [PWs[t] // BLK + R_EXTRA for t in range(T)]
    eq_pivot = -1
    if (T == 2 and slop == 0 and stride & (stride - 1) == 0
            and (eq_join is None or eq_join)):
        eq_pivot = int(np.argmin(PWs))
    KR = rows[0] if raw else max(-(-k // BLK), 1)
    scratch = []
    for t in range(T):
        scratch.append(pltpu.VMEM((rows[t], BLK), jnp.int32))
        scratch.append(pltpu.VMEM((rows[t], BLK), jnp.float32))
        scratch.append(pltpu.VMEM((rows[t], BLK), jnp.int32))
        scratch.append(pltpu.VMEM(
            (rows[t] if t == 0 else R_TILE, BLK), jnp.float32))
    for t in range(T):
        scratch.append(pltpu.VMEM((pkrows[t], BLK), jnp.int32))
    rows_pk = pkrows[eq_pivot if eq_pivot >= 0 else 0]
    scratch.append(pltpu.VMEM((rows_pk, BLK), jnp.int32))    # anchor
    scratch.append(pltpu.VMEM((rows_pk, BLK), jnp.int32))    # ok
    scratch.append(pltpu.VMEM((rows_pk, BLK), jnp.int32))    # span
    scratch.append(pltpu.VMEM((rows_pk, BLK), jnp.int32))    # found
    scratch.append(pltpu.VMEM((rows_pk, BLK), jnp.int32))    # key->doc
    scratch.append(pltpu.VMEM((rows_pk, BLK), jnp.float32))  # dummy tf
    scratch.append(pltpu.VMEM((rows[0], BLK), jnp.int32))    # valid
    scratch.append(pltpu.VMEM((rows[0], BLK), jnp.int32))    # hit
    scratch.append(pltpu.VMEM((rows[0], BLK), jnp.float32))  # tfacc
    scratch.append(pltpu.VMEM((R_TILE, BLK), jnp.int32))     # acc_h/f
    scratch.append(pltpu.VMEM((R_TILE, BLK), jnp.float32))   # acc_t
    scratch.append(pltpu.SemaphoreType.DMA((5 * T,)))

    n2 = doc_ids.shape[0] // BLK
    d2 = doc_ids.reshape(n2, BLK)
    f2 = freqs.reshape(n2, BLK)
    m2 = masks.reshape(n2, BLK)
    dl2 = posting_dl.reshape(n2, BLK)
    pk2 = poskeys.reshape(poskeys.shape[0] // BLK, BLK)

    out_specs = [
        pl.BlockSpec((1, KR, BLK), lambda q, meta: (q, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, KR, BLK), lambda q, meta: (q, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, KR, BLK), jnp.int32),
        jax.ShapeDtypeStruct((B, KR, BLK), jnp.float32),
    ]
    if not raw:
        out_specs.append(pl.BlockSpec((1, 1, BLK),
                                      lambda q, meta: (q, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, 1, BLK), jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 1, T + 1),
                               lambda q, meta: (q, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * 5,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kern = functools.partial(_phrase_kernel, T=T, Ws=Ws, PWs=PWs,
                             stride=stride, slop=slop, k=k, raw=raw,
                             eq_pivot=eq_pivot)
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_INTERPRET,
    )(meta, fmeta[:, None, :], d2, f2, m2, dl2, pk2)
    if raw:
        docs, scores = outs
        docs = docs.reshape(B, KR * BLK)
        return (docs, scores.reshape(B, KR * BLK),
                jnp.sum((docs != jnp.int32(2**31 - 1)).astype(jnp.int32),
                        axis=1))
    docs, scores, counts = outs
    return (docs.reshape(B, KR * BLK),
            scores.reshape(B, KR * BLK),
            counts.reshape(B, BLK)[:, 0])


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


#: test hook — when True the Pallas kernels run under interpret mode
#: (CPU CI coverage of the Mosaic lowerings; see tests/test_pallas_interpret)
_INTERPRET = False


def _use_pallas() -> bool:
    if _INTERPRET:
        return True
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")


@functools.partial(
    jax.jit, static_argnames=("T", "Ws", "groups", "pivot_g", "k",
                              "dense", "raw"))
def intersect_batch(meta, fmeta, doc_ids, freqs, masks, posting_dl,
                    *aux, T: int, Ws: tuple, groups: tuple,
                    pivot_g: int = 0, k: int = 16, dense: tuple = (),
                    raw: bool = False):
    """Run the term-query kernel over a batch.

    meta: int32 [B, 3T + sum(nv)] — per slot starts, lens, qmasks, then
    the dense predicates' query value ids (nv each).
    fmeta: f32 [B, T+1+D] — per slot tweights (idf*weight), avgdl, then
    one leaf constant per dense predicate.
    groups: ((flag, (slot_idx, ...)[, src]), ...) — REQ/NOT/OPT groups
    over the T slots.  src (default -1) selects the slot's array: -1 =
    text postings, >= 0 = the positional `aux` doc-window array at that
    index (tag postings: hit-only members scoring their leaf constant
    once per doc).  `dense`: ((flag, aux_src, n_vals), ...) — predicates
    over posting-ALIGNED int32 code columns in `aux` (see _kernel),
    evaluated at pivot candidates as vector compares.  `pivot_g` names
    the TEXT REQ group whose slots generate the candidate phases.
    Returns (docs [B, >=P*k], scores, counts [B]): per phase the top-k
    (score desc, window position asc) with INT32_MAX / -inf filler —
    merge phases with iter_topk — plus the total match count.

    raw=True (small pivot windows): the kernel emits the full masked
    (doc, score) pivot windows ([B, sum(pivot rows) * 128]) and counts
    come from an XLA reduction — callers merge with iter_topk exactly
    as in the multi-phase case.  The CPU/XLA fallback ignores `raw`
    (its extraction is already vectorized), so final merged top-k
    results are identical either way.
    """
    if not _use_pallas():
        return _xla_impl(meta, fmeta, doc_ids, freqs, masks, posting_dl,
                         *aux, T=T, Ws=Ws, groups=groups,
                         pivot_g=pivot_g, k=k, dense=dense)
    B = meta.shape[0]
    srcs = _slot_srcs(T, groups)
    rows = [Ws[t] // BLK + R_EXTRA for t in range(T)]
    pivots = set(groups[pivot_g][1])
    pivots_l = list(groups[pivot_g][1])
    P_n = len(groups[pivot_g][1])
    KR = (sum(rows[p] for p in pivots_l) if raw
          else max(-(-(P_n * k) // BLK), 1))
    rows_scratch = max(rows[p] for p in pivots)
    # G queries per grid step with double-buffered window scratch: pick
    # the largest G dividing B whose 2x scratch stays within VMEM
    win_rows = sum((4 if (srcs[t] < 0 and t in pivots)
                    else 3 if srcs[t] < 0 else 2) * rows[t]
                   for t in range(T))
    win_rows += len(dense) * sum(rows[p] for p in pivots_l)
    win_bytes = win_rows * BLK * 4
    G = 1
    out_row_bytes = (2 * KR * BLK * 4) if raw else 0
    if 2 * win_bytes < 10 * 1024 * 1024:
        for cand in (16, 8, 4, 2):
            if B % cand == 0 and (2 * win_bytes + cand * out_row_bytes
                                  < 10 * 1024 * 1024):
                G = cand
                break
    nbuf = 2 if G > 1 else 1
    scratch = []
    for t in range(T):
        if srcs[t] < 0:
            scratch.append(pltpu.VMEM((nbuf * rows[t], BLK), jnp.int32))
            scratch.append(pltpu.VMEM((nbuf * rows[t], BLK),
                                      jnp.float32))
            scratch.append(pltpu.VMEM((nbuf * rows[t], BLK), jnp.int32))
            # posting doclens are only read at pivot candidates; member
            # slots get a dummy tile so the scratch layout stays uniform
            scratch.append(pltpu.VMEM(
                (nbuf * rows[t] if t in pivots else R_TILE, BLK),
                jnp.float32))
        else:
            scratch.append(pltpu.VMEM((nbuf * rows[t], BLK), jnp.int32))
            scratch.append(pltpu.VMEM((nbuf * rows[t], BLK),
                                      jnp.float32))
    for _d in dense:
        for p in pivots_l:
            scratch.append(pltpu.VMEM((nbuf * rows[p], BLK), jnp.int32))
    scratch.append(pltpu.VMEM((rows_scratch, BLK), jnp.int32))    # valid
    scratch.append(pltpu.VMEM((rows_scratch, BLK), jnp.int32))    # hit
    scratch.append(pltpu.VMEM((rows_scratch, BLK), jnp.float32))  # tfacc
    scratch.append(pltpu.VMEM((R_TILE, BLK), jnp.int32))          # acc_h
    scratch.append(pltpu.VMEM((R_TILE, BLK), jnp.float32))        # acc_t
    scratch.append(pltpu.SemaphoreType.DMA(
        (nbuf, 4 * T + len(dense) * P_n)))

    # f32 metadata rides the scalar-prefetch buffer as bit patterns
    meta_full = jnp.concatenate(
        [meta.astype(jnp.int32),
         jax.lax.bitcast_convert_type(fmeta.astype(jnp.float32),
                                      jnp.int32)], axis=1)

    # HBM arrays as 2D row views: DMA fetches whole 128-lane rows and
    # the kernel masks the (start % 128) in-tile offset
    n2 = doc_ids.shape[0] // BLK
    d2 = doc_ids.reshape(n2, BLK)
    f2 = freqs.reshape(n2, BLK)
    m2 = masks.reshape(n2, BLK)
    dl2 = posting_dl.reshape(n2, BLK)
    aux2 = tuple(a.reshape(a.shape[0] // BLK, BLK) for a in aux)

    out_specs = [
        pl.BlockSpec((G, KR, BLK), lambda s, meta: (s, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, KR, BLK), lambda s, meta: (s, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, KR, BLK), jnp.int32),
        jax.ShapeDtypeStruct((B, KR, BLK), jnp.float32),
    ]
    if not raw:
        out_specs.append(pl.BlockSpec((G, 1, BLK),
                                      lambda s, meta: (s, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, 1, BLK), jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * (4 + len(aux)),
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kern = functools.partial(_kernel, T=T, Ws=Ws, groups=groups,
                             pivot_g=pivot_g, k=k, n_aux=len(aux),
                             dense=dense, G=G, raw=raw)
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_INTERPRET,
    )(meta_full, d2, f2, m2, dl2, *aux2)
    if raw:
        docs, scores = outs
        docs = docs.reshape(B, KR * BLK)
        return (docs, scores.reshape(B, KR * BLK),
                jnp.sum((docs != jnp.int32(2**31 - 1)).astype(jnp.int32),
                        axis=1))
    docs, scores, counts = outs
    return (docs.reshape(B, KR * BLK),
            scores.reshape(B, KR * BLK),
            jnp.sum(counts.reshape(B, BLK)[:, :P_n], axis=1))
