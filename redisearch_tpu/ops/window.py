"""Windowed sorted-set algebra: the query evaluation core.

This is the faithful TPU translation of the reference's document-ordered
iterator tree (SURVEY.md §7.1 "vectorized sorted-merge / galloping
intersection ... batch-at-a-time, not doc-at-a-time"):

  * a *window* is a posting run loaded to a static power-of-two length:
    (docs int32[W], score f32[W], valid bool[W]); pads use INT32_MAX;
    posting windows are ascending (the CSR order), but *generator outputs*
    (union/intersection results) need no order — nothing ever searches
    into them;
  * MEMBERSHIP (the SkipTo analog) avoids binary search entirely: TPU
    arbitrary-index gathers run at ~30M/s, so log2(W) search rounds cost
    tens of ms.  Instead: block ids come from a compare-count against the
    128-stride block heads (a VPU-rate [Q, W/128] reduction), one row
    gather fetches each candidate's 128-entry block (contiguous 512 B DMAs),
    and an in-row compare finds the hit — measured ~8x faster than
    jnp.searchsorted at 524k windows and scaling with compute, not latency;
  * UNION is sort-free: children windows concatenate; duplicates are
    suppressed by pairwise membership (keep the first owner, fold later
    children's scores onto it) — TPU sorts have a ~3 ms floor and hit 30 ms
    at 512k, so the reference's union heap maps to member ops instead;
  * NOT/OPTIONAL/structured filters are gather predicates on candidates.

Work scales with posting-list length, not corpus size, and every memory
access is either a contiguous dynamic_slice or a 512 B-row DMA.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

INVALID = jnp.int32(2**31 - 1)
BLOCK = 128  # row width for block membership (one TPU lane row)


def _iota(n: int) -> jnp.ndarray:
    return jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)


def _slice(arr: jnp.ndarray, start, W: int) -> jnp.ndarray:
    """Contiguous window read as a dynamic_slice (a DMA at HBM line rate,
    not an arbitrary-index gather).  Device posting arrays carry a
    `cap`-sized tail pad (segment.py SLICE guarantee) so this never
    clamps."""
    return jax.lax.dynamic_slice(arr, (start,), (W,))


# ---------------------------------------------------------------------------
# Window constructors
# ---------------------------------------------------------------------------

def slot_window(doc_ids: jnp.ndarray, freqs: jnp.ndarray,
                field_masks: jnp.ndarray, start, length, qmask, W: int,
                emask=None):
    """One term slot's postings as a window (docs ascending).

    Entries filtered by the query field mask stay in place (docs remain
    sorted) but are invalid.  `emask` (optional int32[n_pad] or
    [n_pad, K]) carries each doc's expired-TEXT-field bitmask
    (field-level TTL — reference: ttl_table + expiration_checker
    iterator): postings surviving only in expired fields are invalid.

    `field_masks` is int32[nnz] for <=32 TEXT fields or int32[nnz, K]
    multi-word masks beyond (reference t_fieldMask is 128-bit); `qmask`
    is a scalar or a [K] word row accordingly."""
    lane = _iota(W)
    in_range = lane < length
    docs = jnp.where(in_range, _slice(doc_ids, start, W), INVALID)
    wide = field_masks.ndim == 2
    if wide:
        K = field_masks.shape[1]
        fm = jax.lax.dynamic_slice(field_masks, (start, 0), (W, K))
    else:
        fm = _slice(field_masks, start, W)
    live_mask = qmask
    if emask is not None:
        n = emask.shape[0]
        live_mask = qmask & ~emask[jnp.minimum(docs, n - 1)]
    hit = fm & live_mask
    valid = in_range & (jnp.any(hit != 0, axis=-1) if wide else (hit != 0))
    tf = jnp.where(valid, _slice(freqs, start, W), 0.0)
    return docs, tf, valid


def expired_field_mask(fexp: jnp.ndarray, now) -> jnp.ndarray:
    """Per-doc expired-TEXT-field bitmask from [n_pad, F] expiry times.
    Returns int32[n_pad] for F <= 32, else int32[n_pad, K] words."""
    F = fexp.shape[1]
    expired = (fexp > 0) & (fexp <= now)
    if F <= 32:
        bits = jnp.left_shift(jnp.int32(1), jnp.arange(F, dtype=jnp.int32))
        return jnp.sum(jnp.where(expired, bits[None, :], 0),
                       axis=1).astype(jnp.int32)
    K = (F + 31) // 32
    words = []
    for k in range(K):
        f0, f1 = 32 * k, min(32 * (k + 1), F)
        bits = jnp.left_shift(jnp.int32(1),
                              jnp.arange(f1 - f0, dtype=jnp.int32))
        words.append(jnp.sum(
            jnp.where(expired[:, f0:f1], bits[None, :], 0),
            axis=1).astype(jnp.int32))
    return jnp.stack(words, axis=-1)


def tag_window(doc_ids: jnp.ndarray, start, length, W: int):
    """One tag value's doc postings as a window (no tf; docs ascending)."""
    lane = _iota(W)
    in_range = lane < length
    docs = jnp.where(in_range, _slice(doc_ids, start, W), INVALID)
    return docs, in_range


def numeric_window(sorted_docs: jnp.ndarray, start, length, W: int):
    """A numeric range as a window: the value-sorted run (docs UNORDERED —
    generator outputs are never searched into)."""
    lane = _iota(W)
    in_range = lane < length
    docs = jnp.where(in_range, _slice(sorted_docs, start, W), INVALID)
    return docs, in_range & (docs != INVALID)


def dedup_window(docs: jnp.ndarray, valid: jnp.ndarray):
    """Drop duplicate doc ids from a window (multi-value numeric ranges
    yield one entry per in-range value).  Sort + neighbor-compare: the
    output stays a valid window (generator outputs are never searched
    into, so reordering is fine)."""
    d = jnp.where(valid, docs, INVALID)
    d = jnp.sort(d)
    dup = jnp.concatenate(
        [jnp.zeros((1,), jnp.bool_), d[1:] == d[:-1]])
    v = (d != INVALID) & ~dup
    return jnp.where(v, d, INVALID), v


def iota_window(n_pad: int):
    """All-docs generator (reference: wildcard iterator)."""
    docs = _iota(n_pad)
    return docs, jnp.ones((n_pad,), jnp.bool_)


# ---------------------------------------------------------------------------
# Membership (the SkipTo analog) — block compare, no binary search
# ---------------------------------------------------------------------------

def _block_ids(heads: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Index of the block whose range contains each q (heads ascending).

    One [Q, R] compare-count on the VPU — beats log-round binary search
    because it has no serialized gather dependency chain."""
    R = heads.shape[0]
    cnt = jnp.sum((q[:, None] >= heads[None, :]).astype(jnp.int32), axis=1)
    return jnp.clip(cnt - 1, 0, R - 1)


def member(docs_w: jnp.ndarray, valid_w: jnp.ndarray,
           score_w, q_docs: jnp.ndarray):
    """For each candidate doc (any order), is it a valid entry of the
    ASCENDING window — and with what score."""
    Wb = docs_w.shape[0]
    qi = q_docs
    if Wb <= 2 * BLOCK:
        eq = (docs_w[None, :] == qi[:, None]) & valid_w[None, :]
        hit = jnp.any(eq, axis=1) & (qi != INVALID)
        if score_w is None:
            return hit, None
        s = jnp.sum(jnp.where(eq, score_w[None, :], 0.0), axis=1)
        return hit, jnp.where(hit, s, 0.0)
    R = Wb // BLOCK
    d2 = docs_w.reshape(R, BLOCK)
    bid = _block_ids(d2[:, 0], qi)
    rows = d2[bid]                                  # [Q, 128] row DMAs
    eq = (rows == qi[:, None]) & valid_w.reshape(R, BLOCK)[bid]
    hit = jnp.any(eq, axis=1) & (qi != INVALID)
    if score_w is None:
        return hit, None
    srows = score_w.reshape(R, BLOCK)[bid]
    s = jnp.sum(jnp.where(eq, srows, 0.0), axis=1)
    return hit, jnp.where(hit, s, 0.0)


def block_searchsorted(arr: jnp.ndarray, q: jnp.ndarray,
                       side: str = "left") -> jnp.ndarray:
    """Exact searchsorted over an ASCENDING array via block compare-count
    (drop-in for jnp.searchsorted, ~4-8x faster on TPU at >=64k)."""
    n = arr.shape[0]
    if n <= 2 * BLOCK:
        if side == "left":
            return jnp.sum((arr[None, :] < q[:, None]).astype(jnp.int32), 1)
        return jnp.sum((arr[None, :] <= q[:, None]).astype(jnp.int32), 1)
    R = n // BLOCK
    a2 = arr.reshape(R, BLOCK)
    heads = a2[:, 0]
    if side == "left":
        c = jnp.sum((q[:, None] > heads[None, :]).astype(jnp.int32), 1)
        bid = jnp.clip(c - 1, 0, R - 1)
        rows = a2[bid]
        within = jnp.sum((rows < q[:, None]).astype(jnp.int32), 1)
    else:
        c = jnp.sum((q[:, None] >= heads[None, :]).astype(jnp.int32), 1)
        bid = jnp.clip(c - 1, 0, R - 1)
        rows = a2[bid]
        within = jnp.sum((rows <= q[:, None]).astype(jnp.int32), 1)
    return bid * BLOCK + within


# ---------------------------------------------------------------------------
# Union (sort-free: concat + pairwise membership dedup)
# ---------------------------------------------------------------------------

def union_windows(windows: list, dismax: bool = False,
                  extra: Optional[list] = None):
    """Merge windows into one candidate window of unique docs.

    windows: list of (docs, score or None, valid).  Children may be in
    ANY order — term windows are doc-ascending, but numeric/geo windows
    are value-sorted and nested unions emit merged output — so the merge
    STABLE-sorts the concatenation by doc id and folds each duplicate
    run's scores (sum, or max for DISMAX; the reference's union-heap
    semantics).  The first entry of a run (earliest window, stable sort)
    survives; output docs are ASCENDING so parents can dedup adjacently.

    extra: optional list of per-window arrays (or None) to carry through
    the same permutation (e.g. the aligned norm operands); returns them
    merged as a 4th result when given.
    """
    docs = jnp.concatenate([jnp.where(v, d, INVALID)
                            for d, _, v in windows])
    score = jnp.concatenate([
        jnp.where(v, s, 0.0) if s is not None
        else jnp.zeros(d.shape, jnp.float32)
        for d, s, v in windows])
    # multi-operand sort: payloads ride the sort network instead of
    # paying permutation gathers afterwards.  Stability keeps the
    # earliest window's entry first in each duplicate run.
    ext = None
    if extra is not None and not any(e is None for e in extra):
        ext = jnp.concatenate(extra)
    ops = (docs, score) + ((ext,) if ext is not None else ())
    sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=True)
    d, s = sorted_ops[0], sorted_ops[1]
    first = jnp.concatenate([jnp.ones((1,), jnp.bool_), d[1:] != d[:-1]])
    # fold each duplicate run's scores.  Every child is itself deduped,
    # so runs are at most len(windows) long: fold with static shifted
    # adds — a segment_sum would lower to scatter-add, which runs at
    # TPU random-access speed (~7 ns/element) and dominates big unions.
    folded = s
    for j in range(1, len(windows)):
        d_sh = jnp.concatenate([d[j:], jnp.full((j,), -1, d.dtype)])
        s_sh = jnp.concatenate([s[j:], jnp.zeros((j,), s.dtype)])
        same = d_sh == d     # sorted: equal at distance j => one run
        folded = (jnp.maximum(folded, jnp.where(same, s_sh, folded))
                  if dismax else folded + jnp.where(same, s_sh, 0.0))
    v = first & (d != INVALID)
    out = (jnp.where(v, d, INVALID), jnp.where(v, folded, 0.0), v)
    if extra is None:
        return out
    return out + (sorted_ops[2] if ext is not None else None,)


def dedup_adjacent(docs: jnp.ndarray, valid: jnp.ndarray):
    """Deduplicate an ASCENDING doc array in place: keeps the first
    VALID entry of each doc, invalidates the rest.  No sort.

    Duplicates need not be adjacent lanes: an invalidated candidate can
    sit between two valid entries of the same doc (e.g. a phrase pivot
    with three positions where only the outer two match).  The running
    max of previous valid docs — exact because valid docs ascend —
    detects those too; a plain neighbor-compare would not."""
    d = jnp.where(valid, docs, INVALID)
    run = jax.lax.cummax(jnp.where(valid, docs, jnp.int32(-1)))
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), run[:-1]])
    first = d != prev
    v = valid & first & (d != INVALID)
    return jnp.where(v, d, INVALID), v
