"""Vector similarity kernels: brute-force (FLAT) distance scans + top-k.

TPU-native replacement for VecSim's FLAT index (reference:
deps/VectorSimilarity via src/vector_index.c) — a distance computation over
the whole [N, d] matrix is a single MXU matmul at bf16/f32, which is exactly
what the systolic array is for.  Distance conventions match VecSim:

    L2     -> squared euclidean distance (lower = closer)
    IP     -> 1 - <a, b>                  (lower = closer)
    COSINE -> 1 - cos(a, b)               (lower = closer)

Filtered KNN ("hybrid" queries in the reference, src/iterators/
hybrid_reader.c) fuses the prefilter bitmap into the scan mask — there is no
BATCHES/ADHOC_BF switch because the full scan is one matmul either way; the
reference's heuristic exists only because graph walks degrade under filters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = jnp.float32(3.4e38)


def _fast_top_k(x, k):
    from .text import fast_top_k
    return fast_top_k(x, k)


def _scores(vecs: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """<vecs, q> along d.  vecs [n, d], q [d] or [B, d].

    Uses the MXU's native low-precision paths when storage allows:
    int8 x int8 accumulating in int32 (4x the f32 MACs/cycle),
    bf16 x bf16 accumulating in f32; f16/f32 run in f32."""
    if vecs.dtype in (jnp.int8, jnp.uint8) and q.dtype == vecs.dtype:
        if q.ndim == 1:
            return jnp.dot(vecs, q,
                           preferred_element_type=jnp.int32
                           ).astype(jnp.float32)
        return jnp.dot(q, vecs.T,
                       preferred_element_type=jnp.int32).astype(jnp.float32)
    if vecs.dtype == jnp.bfloat16:
        qb = q.astype(jnp.bfloat16)
        if q.ndim == 1:
            return jnp.dot(vecs, qb, preferred_element_type=jnp.float32)
        return jnp.dot(qb, vecs.T, preferred_element_type=jnp.float32)
    # f32 storage = exact distances (reference parity: VecSim computes
    # full-precision f32).  DEFAULT matmul precision on TPU is one-pass
    # bf16 on the MXU — ~0.4% relative error that flips near-tie ranks
    # and differs between the matvec and batched-matmul lowerings.
    # Low-precision speed is an explicit storage choice (bf16/int8).
    if q.ndim == 1:
        return jnp.dot(vecs.astype(jnp.float32), q.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    return jnp.dot(q.astype(jnp.float32), vecs.astype(jnp.float32).T,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def distances_to(vecs: jnp.ndarray, sq_norms: jnp.ndarray, q: jnp.ndarray,
                 metric: str) -> jnp.ndarray:
    """Distance of every row of `vecs` to query `q` ([n] or [B, n])."""
    dots = _scores(vecs, q)
    if metric == "L2":
        qsq = jnp.sum(q.astype(jnp.float32) ** 2, axis=-1)
        if q.ndim == 1:
            return sq_norms - 2.0 * dots + qsq
        return sq_norms[None, :] - 2.0 * dots + qsq[:, None]
    if metric == "IP":
        return 1.0 - dots
    if metric == "COSINE":
        qn = jnp.sqrt(jnp.sum(q.astype(jnp.float32) ** 2, axis=-1))
        vn = jnp.sqrt(jnp.maximum(sq_norms, 1e-30))
        if q.ndim == 1:
            return 1.0 - dots / (vn * jnp.maximum(qn, 1e-30))
        return 1.0 - dots / (vn[None, :] * jnp.maximum(qn[:, None], 1e-30))
    raise ValueError(f"bad metric {metric}")


def knn(vecs: jnp.ndarray, sq_norms: jnp.ndarray, present: jnp.ndarray,
        q: jnp.ndarray, k: int, metric: str,
        mask: jnp.ndarray | None = None):
    """Exact top-k nearest: returns (dists [k], idx [k])."""
    d = distances_to(vecs, sq_norms, q, metric)
    valid = present if mask is None else (present & mask)
    dm = jnp.where(valid, d, BIG)
    vals, idx = _fast_top_k(-dm, k)
    return -vals, idx


def knn_batch(vecs: jnp.ndarray, sq_norms: jnp.ndarray,
              present: jnp.ndarray, Q: jnp.ndarray, k: int, metric: str,
              mask: jnp.ndarray | None = None):
    """Batched exact KNN: Q [B, d] -> (dists [B, k], idx [B, k]).

    One [B, d] x [d, N] MXU matmul — the throughput path for benchmarks and
    the serving layer (amortizes HBM reads of the vector matrix over B).
    """
    d = distances_to(vecs, sq_norms, Q, metric)        # [B, n]
    valid = present if mask is None else (present & mask)
    dm = jnp.where(valid[None, :], d, BIG)
    vals, idx = _fast_top_k(-dm, k)
    return -vals, idx


def knn_scan_batches(vecs: jnp.ndarray, sq_norms: jnp.ndarray,
                     present: jnp.ndarray, Qc: jnp.ndarray, k: int,
                     metric: str, mask: jnp.ndarray | None = None):
    """Chunked batched KNN: Qc [it, B, d] -> (dists [it, B, k], idx).

    One XLA dispatch scans the chunk axis, so per-dispatch overhead
    (host->device latency, program launch) amortizes over it*B queries —
    the serving layer's deep-queue shape.  Each chunk is one MXU matmul;
    the fp32 scan is HBM-bandwidth-bound and the top-k fuses with the
    matmul's output reduction."""
    def body(_, q):
        return None, knn_batch(vecs, sq_norms, present, q, k, metric,
                               mask=mask)
    return jax.lax.scan(body, None, Qc)[1]


def range_query(vecs: jnp.ndarray, sq_norms: jnp.ndarray,
                present: jnp.ndarray, q: jnp.ndarray, radius: float,
                metric: str):
    """VecSimIndex_RangeQuery analog: bool mask + distances."""
    d = distances_to(vecs, sq_norms, q, metric)
    return present & (d <= radius), d
