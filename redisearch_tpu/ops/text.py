"""Device-side text search primitives: dense-accumulator scoring.

This replaces the reference's document-at-a-time QueryIterator tree
(src/iterators/iterator_api.h:41-114, src/redisearch_rs/rqe_iterators) with
batch-at-a-time vectorized set algebra (SURVEY.md §7.1):

  * a TERM leaf gathers its posting window from the segment CSR and
    scatter-adds (match, tf) into dense per-doc accumulators of shape
    [n_pad] — the whole posting list in one XLA scatter, no Read/SkipTo;
  * AND/OR/NOT combine dense boolean masks (`&`, `|`, `&~`) — the
    intersection leapfrog, union heap, and NOT complement iterators all
    collapse into elementwise VPU ops;
  * phrase/slop matching intersects sorted `doc*stride+pos` key arrays with
    `searchsorted` (replacing offset-vector slop checks in
    src/aggregate/..., index_result offsets);
  * scoring (BM25STD/TFIDF/...) is a per-term dense transform of the tf
    accumulator (reference: src/ext/default.c:142-475), summed up the tree.

Everything here is shape-static and jit-compatible; window sizes L (postings)
and P (positions) are power-of-two buckets chosen by the plan compiler, so
repeated query *shapes* reuse compiled executables.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

# BM25 constants (reference: src/ext/default.c BM25STD k1=1.2, b=0.75).
BM25_K1 = 1.2
BM25_B = 0.75


def _iota(n: int) -> jnp.ndarray:
    # TPU needs >=2D iota; build 2D then squeeze.
    return jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)


# ---------------------------------------------------------------------------
# Term leaf: postings gather + scatter into dense accumulators
# ---------------------------------------------------------------------------

def gather_postings(doc_ids: jnp.ndarray, freqs: jnp.ndarray,
                    field_masks: jnp.ndarray, start: jnp.ndarray,
                    length: jnp.ndarray, qmask: jnp.ndarray, L: int):
    """Gather one term's postings into a fixed window of size L.

    Returns (docs[L], tf[L], ok[L]) where ok masks valid entries that match
    the query field mask (reference: FilterMaskReader,
    inverted_index/src/reader/).
    """
    lane = _iota(L)
    valid = lane < length
    idx = jnp.minimum(start + lane, doc_ids.shape[0] - 1)
    docs = doc_ids[idx]
    tf = freqs[idx]
    fm = field_masks[idx]
    ok = valid & ((fm & qmask) != 0)
    return docs, jnp.where(ok, tf, 0.0), ok


def terms_tf_dense(doc_ids: jnp.ndarray, freqs: jnp.ndarray,
                   field_masks: jnp.ndarray, starts: jnp.ndarray,
                   lengths: jnp.ndarray, qmasks: jnp.ndarray,
                   n_pad: int, L: int):
    """Dense per-doc tf for a batch of T terms in one scatter.

    starts/lengths/qmasks: int32[T].  Returns tf[T, n_pad] float32.
    One fused gather + one scatter-add per call regardless of T.
    """
    T = starts.shape[0]
    lane = _iota(L)[None, :]                    # [1, L]
    valid = lane < lengths[:, None]             # [T, L]
    idx = jnp.minimum(starts[:, None] + lane, doc_ids.shape[0] - 1)
    docs = doc_ids[idx]                         # [T, L]
    tf = freqs[idx]
    fm = field_masks[idx]
    ok = valid & ((fm & qmasks[:, None]) != 0)
    tf = jnp.where(ok, tf, 0.0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, L), 0)
    out = jnp.zeros((T, n_pad), jnp.float32)
    out = out.at[rows, docs].add(tf, mode="drop")
    return out


# ---------------------------------------------------------------------------
# Scoring transforms (applied to dense tf accumulators)
# ---------------------------------------------------------------------------

def bm25_transform(tf: jnp.ndarray, idf: jnp.ndarray, doclen: jnp.ndarray,
                   avgdl: jnp.ndarray, k1: float = BM25_K1,
                   b: float = BM25_B) -> jnp.ndarray:
    """BM25STD per-term contribution (reference: ext/default.c:241-296).

    tf: [T, n_pad] or [n_pad]; idf broadcastable ([T,1] or scalar).
    """
    norm = k1 * (1.0 - b + b * doclen / jnp.maximum(avgdl, 1e-9))
    return idf * tf * (k1 + 1.0) / (tf + norm)


def tfidf_transform(tf: jnp.ndarray, idf: jnp.ndarray,
                    max_freq: jnp.ndarray) -> jnp.ndarray:
    """TFIDF: normalized tf (tf/maxFreq) * idf (ext/default.c:142)."""
    return idf * tf / jnp.maximum(max_freq, 1.0)


def tfidf_docnorm_transform(tf: jnp.ndarray, idf: jnp.ndarray,
                            doclen: jnp.ndarray) -> jnp.ndarray:
    """TFIDF.DOCNORM: tf normalized by doc length (ext/default.c:214)."""
    return idf * tf / jnp.maximum(doclen, 1.0)


# ---------------------------------------------------------------------------
# Phrase / slop matching over sorted position keys
# ---------------------------------------------------------------------------

def gather_poskeys(poskeys: jnp.ndarray, pos_offsets: jnp.ndarray,
                   start: jnp.ndarray, length: jnp.ndarray, P: int):
    """Window of one term's sorted position keys.

    A term's postings are contiguous in the CSR, so its position keys are the
    contiguous sorted range poskeys[pos_offsets[start] :
    pos_offsets[start+length]].  Invalid lanes are filled with INT32_MAX so
    searchsorted treats them as +inf.
    """
    kstart = pos_offsets[start]
    kend = pos_offsets[start + length]
    klen = kend - kstart
    lane = _iota(P)
    keys = jax.lax.dynamic_slice(poskeys, (kstart,), (P,))
    keys = jnp.where(lane < klen, keys, jnp.int32(2**31 - 1))
    return keys, klen


def phrase_match_dense(poskeys: jnp.ndarray, pos_offsets: jnp.ndarray,
                       starts: jnp.ndarray, lengths: jnp.ndarray,
                       pos_stride: int, slop: int, inorder: bool,
                       n_pad: int, P: int) -> jnp.ndarray:
    """Dense bool[n_pad] of docs containing the phrase starts[0..T).

    Greedy chain over sorted (doc*stride+pos) keys: candidates start at every
    occurrence of term 0; for each next term we searchsorted the nearest
    admissible key (exact next position for a phrase; within +-slop window
    for sloppy match).  Greedy-earliest is optimal for in-order windows.
    Replaces the offset-iterator slop check of the reference (doc-at-a-time)
    with one vectorized pass per query term.
    """
    T = starts.shape[0]
    cand, _ = gather_poskeys(poskeys, pos_offsets, starts[0], lengths[0], P)
    alive_c = cand != 2**31 - 1

    for j in range(1, T):
        keys_j, _ = gather_poskeys(poskeys, pos_offsets, starts[j],
                                   lengths[j], P)
        if inorder or slop == 0:
            lo_target = cand + 1
            hi_target = cand + 2 + slop
        else:
            lo_target = cand - slop
            hi_target = cand + 2 + slop
        lo = jnp.searchsorted(keys_j, lo_target, side="left")
        lo = jnp.minimum(lo, P - 1)
        found_key = keys_j[lo]
        same_doc = (found_key // pos_stride) == (cand // pos_stride)
        # found_key >= lo_target guards the index clip above: when
        # searchsorted returns P (nothing >= target) the clipped gather
        # would otherwise pick a key below the window
        ok = (alive_c & (found_key >= lo_target)
              & (found_key < hi_target) & same_doc)
        if not inorder and slop > 0:
            # non-inorder: the found key may equal cand's own position of a
            # previous term; accept any distinct position in the window.
            ok = ok & (found_key != cand)
        cand = jnp.where(ok, jnp.maximum(found_key, cand), cand)
        alive_c = ok

    docs = jnp.where(alive_c, cand // pos_stride, 0)
    out = jnp.zeros((n_pad,), jnp.bool_)
    out = out.at[docs].max(alive_c, mode="drop")
    return out


# ---------------------------------------------------------------------------
# Tag postings (doc-ids only)
# ---------------------------------------------------------------------------

def tags_match_dense(doc_ids: jnp.ndarray, starts: jnp.ndarray,
                     lengths: jnp.ndarray, n_pad: int, L: int) -> jnp.ndarray:
    """Dense bool[n_pad]: docs holding any of the T tag values.

    Reference: TagIndex posting union (src/tag_index.c) — one scatter here.
    """
    T = starts.shape[0]
    lane = _iota(L)[None, :]
    valid = lane < lengths[:, None]
    idx = jnp.minimum(starts[:, None] + lane, doc_ids.shape[0] - 1)
    docs = doc_ids[idx]
    out = jnp.zeros((n_pad,), jnp.bool_)
    out = out.at[docs.reshape(-1)].max(valid.reshape(-1), mode="drop")
    return out


# ---------------------------------------------------------------------------
# Structured filters over dense columns
# ---------------------------------------------------------------------------

def numeric_range_mask(values: jnp.ndarray, present: jnp.ndarray,
                       lo: jnp.ndarray, hi: jnp.ndarray,
                       lo_excl: bool, hi_excl: bool) -> jnp.ndarray:
    """NUMERIC [lo hi] filter (replaces the numeric range tree iterators)."""
    ge = values > lo if lo_excl else values >= lo
    le = values < hi if hi_excl else values <= hi
    return present & ge & le


EARTH_RADIUS_M = 6372797.560856  # matches redis geo.c constant


def geo_radius_mask(lon: jnp.ndarray, lat: jnp.ndarray, present: jnp.ndarray,
                    qlon: jnp.ndarray, qlat: jnp.ndarray,
                    radius_m: jnp.ndarray) -> jnp.ndarray:
    """GEO radius filter via exact haversine over the dense column.

    The reference approximates with 9 geohash cell ranges then exact-filters
    (src/geo_index.c:28); a vectorized exact haversine over all docs is both
    simpler and faster on TPU.  Inputs are radians.
    """
    dlat = lat - qlat
    dlon = lon - qlon
    a = (jnp.sin(dlat * 0.5) ** 2
         + jnp.cos(lat) * jnp.cos(qlat) * jnp.sin(dlon * 0.5) ** 2)
    # asin(sqrt(a)) form is accurate for small distances
    dist = 2.0 * EARTH_RADIUS_M * jnp.arcsin(jnp.sqrt(jnp.clip(a, 0.0, 1.0)))
    return present & (dist <= radius_m)


# ---------------------------------------------------------------------------
# Top-k
# ---------------------------------------------------------------------------

# Windows below this use exact lax.top_k; above it, the TPU-optimized
# approx_max_k (recall ~0.95 per its paper; our recall target raises it).
# The reference's sorter heap is exact; large-window approximation trades
# bottom-of-page ties for a ~10x top-k speedup at 1M-doc scale.
EXACT_TOPK_LIMIT = 65536


def fast_top_k(x: jnp.ndarray, k: int):
    """Top-k values of x along the last axis: exact for small inputs,
    approx_max_k (TPU MIPS hardware path) for large ones."""
    n = x.shape[-1]
    if n <= EXACT_TOPK_LIMIT or k >= n:
        return jax.lax.top_k(x, k)
    return jax.lax.approx_max_k(x, k, recall_target=0.99)


def topk_scores(scores: jnp.ndarray, k: int):
    """Top-k by score, ties broken toward lower doc id (like the reference's
    sorter which orders by (score desc, docid asc))."""
    n = scores.shape[0]
    # Tie-break: subtract a tiny monotone-in-docid epsilon.
    eps = jnp.arange(n, dtype=jnp.float32) * 1e-12
    vals, idx = jax.lax.top_k(scores - eps, k)
    return scores[idx], idx


def topk_by_key(keys: jnp.ndarray, valid: jnp.ndarray, k: int,
                ascending: bool):
    """Top-k doc indices ordered by an arbitrary f32 sort key (SORTBY)."""
    big = jnp.float32(3.4e38)
    k_ = jnp.where(valid, keys, big if ascending else -big)
    vals, idx = fast_top_k(-k_ if ascending else k_, k)
    # return the *masked* keys so invalid filler rows surface as +-big and
    # can be dropped by the merger
    return k_[idx], idx
