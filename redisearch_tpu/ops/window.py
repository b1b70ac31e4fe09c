"""Windowed sorted-set algebra: the query evaluation core.

This is the faithful TPU translation of the reference's document-ordered
iterator tree (SURVEY.md §7.1 "vectorized sorted-merge / galloping
intersection ... batch-at-a-time, not doc-at-a-time"):

  * a *window* is a posting run gathered to a static power-of-two length:
    (docs int32[W] ascending, score f32[W], valid bool[W]); pads and
    field-mask-filtered entries keep their sorted position but are invalid
    (pads use INT32_MAX so binary search stays correct);
  * INTERSECTION picks the smallest child window as the pivot and probes
    the others with `searchsorted` membership — work is O(min list * log
    other), the leapfrog/galloping property of the reference's
    intersection iterator (rqe_iterators intersection.rs) without
    doc-at-a-time state;
  * UNION concatenates child windows, sorts, and merges duplicate docs with
    a segmented scan (sum for scoring unions, max for DISMAX) — replacing
    the reference's union heap (union.rs/union_heap.rs);
  * NOT/OPTIONAL become negated/neutral membership predicates.

Dense scatter into an [N] accumulator (the v1 design) is avoided entirely:
XLA scatters serialize on TPU, while gather/sort/searchsorted/top_k all
vectorize.  Work scales with posting-list length, not corpus size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INVALID = jnp.int32(2**31 - 1)


def _iota(n: int) -> jnp.ndarray:
    return jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)


# ---------------------------------------------------------------------------
# Window constructors
# ---------------------------------------------------------------------------

def _slice(arr: jnp.ndarray, start, W: int) -> jnp.ndarray:
    """Contiguous window read as a dynamic_slice (a DMA at HBM line rate,
    not an arbitrary-index gather — the difference between ~100 GB/s and
    ~100 M elem/s on TPU).  Device posting arrays carry a `cap`-sized tail
    pad (segment.py SLICE guarantee) so the slice never clamps."""
    return jax.lax.dynamic_slice(arr, (start,), (W,))


def slot_window(doc_ids: jnp.ndarray, freqs: jnp.ndarray,
                field_masks: jnp.ndarray, start, length, qmask, W: int):
    """One term slot's postings as a window.

    Returns (docs[W], tf[W], valid[W]).  Entries filtered by the query
    field mask stay in place (docs remain sorted) but are invalid.
    """
    lane = _iota(W)
    in_range = lane < length
    docs = jnp.where(in_range, _slice(doc_ids, start, W), INVALID)
    fm = _slice(field_masks, start, W)
    valid = in_range & ((fm & qmask) != 0)
    tf = jnp.where(valid, _slice(freqs, start, W), 0.0)
    return docs, tf, valid


def tag_window(doc_ids: jnp.ndarray, start, length, W: int):
    """One tag value's doc postings as a window (no tf)."""
    lane = _iota(W)
    in_range = lane < length
    docs = jnp.where(in_range, _slice(doc_ids, start, W), INVALID)
    return docs, in_range


def numeric_window(sorted_docs: jnp.ndarray, start, length, W: int):
    """A numeric range as a window: slice the value-sorted run, then sort
    by doc id (reference analog: a range-tree leaf's inverted index)."""
    lane = _iota(W)
    in_range = lane < length
    docs = jnp.where(in_range, _slice(sorted_docs, start, W), INVALID)
    docs = jnp.sort(docs)
    return docs, docs != INVALID


def iota_window(n_pad: int):
    """All-docs generator (reference: wildcard iterator)."""
    docs = _iota(n_pad)
    return docs, jnp.ones((n_pad,), jnp.bool_)


# ---------------------------------------------------------------------------
# Membership (the SkipTo analog)
# ---------------------------------------------------------------------------

def member(docs_w: jnp.ndarray, valid_w: jnp.ndarray,
           score_w, q_docs: jnp.ndarray):
    """For each candidate doc, is it a valid entry of the window — and with
    what score.  O(|q| log W) binary search."""
    W = docs_w.shape[0]
    pos = jnp.clip(jnp.searchsorted(docs_w, q_docs), 0, W - 1)
    hit = (docs_w[pos] == q_docs) & valid_w[pos] & (q_docs != INVALID)
    if score_w is None:
        return hit, None
    return hit, jnp.where(hit, score_w[pos], 0.0)


# ---------------------------------------------------------------------------
# Union (segmented-scan merge)
# ---------------------------------------------------------------------------

def _segmented_sum(vals: jnp.ndarray, starts: jnp.ndarray) -> jnp.ndarray:
    """Inclusive segmented sum: resets where starts is True."""
    def op(a, b):
        s1, f1 = a
        s2, f2 = b
        return jnp.where(f2, s2, s1 + s2), f1 | f2
    out, _ = jax.lax.associative_scan(op, (vals, starts))
    return out


def _segmented_max(vals: jnp.ndarray, starts: jnp.ndarray) -> jnp.ndarray:
    def op(a, b):
        s1, f1 = a
        s2, f2 = b
        return jnp.where(f2, s2, jnp.maximum(s1, s2)), f1 | f2
    out, _ = jax.lax.associative_scan(op, (vals, starts))
    return out


def union_windows(windows: list, dismax: bool = False):
    """Merge sorted windows into one sorted window of unique docs.

    windows: list of (docs, score or None, valid).  Duplicate docs combine
    scores by sum (or max for DISMAX).  Cost: one argsort + one scan + one
    final sort over W_total = sum of child widths.
    """
    docs_all = jnp.concatenate([
        jnp.where(v, d, INVALID) for d, _, v in windows])
    score_all = jnp.concatenate([
        (jnp.where(v, s, 0.0) if s is not None
         else jnp.zeros(d.shape, jnp.float32))
        for d, s, v in windows])
    order = jnp.argsort(docs_all)
    d = docs_all[order]
    s = score_all[order]
    first = jnp.concatenate([jnp.ones((1,), jnp.bool_), d[1:] != d[:-1]])
    seg = (_segmented_max if dismax else _segmented_sum)(s, first)
    last = jnp.concatenate([d[1:] != d[:-1], jnp.ones((1,), jnp.bool_)])
    keep = last & (d != INVALID)
    d_out = jnp.where(keep, d, INVALID)
    s_out = jnp.where(keep, seg, 0.0)
    order2 = jnp.argsort(d_out)
    d_out = d_out[order2]
    return d_out, s_out[order2], d_out != INVALID


def dedup_sorted(docs: jnp.ndarray, valid: jnp.ndarray):
    """Deduplicate an ascending doc array (keep one entry per doc)."""
    d = jnp.where(valid, docs, INVALID)
    d = jnp.sort(d)
    first = jnp.concatenate([jnp.ones((1,), jnp.bool_), d[1:] != d[:-1]])
    d = jnp.where(first, d, INVALID)
    d = jnp.sort(d)
    return d, d != INVALID
