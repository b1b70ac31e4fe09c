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


def _scores(vecs: jnp.ndarray, q: jnp.ndarray,
            approx: bool = False) -> jnp.ndarray:
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
    # Precision.HIGHEST is exact but ~4x slower at scan shapes, so the
    # top-k paths below use it only to RESCORE a bf16 candidate set
    # (`approx=True` here is that candidate pass).
    prec = (jax.lax.Precision.DEFAULT if approx
            else jax.lax.Precision.HIGHEST)
    if q.ndim == 1:
        return jnp.dot(vecs.astype(jnp.float32), q.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=prec)
    return jnp.dot(q.astype(jnp.float32), vecs.astype(jnp.float32).T,
                   preferred_element_type=jnp.float32,
                   precision=prec)


def distances_to(vecs: jnp.ndarray, sq_norms: jnp.ndarray, q: jnp.ndarray,
                 metric: str, approx: bool = False) -> jnp.ndarray:
    """Distance of every row of `vecs` to query `q` ([n] or [B, n])."""
    dots = _scores(vecs, q, approx=approx)
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


def _rescore(vecs, sq_norms, q, idx, metric):
    """Exact f32 distances at gathered candidate rows.

    The bf16 candidate scan covers the whole matrix; this recomputes
    only [B, C] (or [C]) distances at Precision.HIGHEST, so f32 storage
    keeps VecSim's exact-distance semantics at bf16 scan speed."""
    g = jnp.take(vecs, idx, axis=0).astype(jnp.float32)   # [..., C, d]
    qf = q.astype(jnp.float32)
    if q.ndim == 1:
        dots = jnp.einsum("cd,d->c", g, qf,
                          precision=jax.lax.Precision.HIGHEST)
    else:
        dots = jnp.einsum("bcd,bd->bc", g, qf,
                          precision=jax.lax.Precision.HIGHEST)
    if metric == "L2":
        qsq = jnp.sum(qf ** 2, axis=-1)
        return (jnp.take(sq_norms, idx, axis=0) - 2.0 * dots
                + (qsq if q.ndim == 1 else qsq[:, None]))
    if metric == "IP":
        return 1.0 - dots
    qn = jnp.maximum(jnp.sqrt(jnp.sum(qf ** 2, axis=-1)), 1e-30)
    vn = jnp.sqrt(jnp.maximum(jnp.take(sq_norms, idx, axis=0), 1e-30))
    return 1.0 - dots / (vn * (qn if q.ndim == 1 else qn[:, None]))


def _cand_k(n: int, k: int) -> int:
    """Candidate-set size for the two-phase f32 path."""
    return min(n, max(4 * k, k + 16))


def _cand_top(dm: jnp.ndarray, C: int):
    """Candidate top-C extraction for the two-phase path.

    The candidate values only gate WHICH rows get rescored — their
    precision is already bf16-level (the scan matmul runs one-pass bf16
    on the MXU) — so the extraction itself runs on a bf16 view of the
    distance matrix: approx_max_k streams half the HBM bytes (measured
    ~2x faster at [512, 524k] on v5e).  Masked lanes (-BIG) become -inf
    in bf16, which approx_max_k orders identically."""
    if dm.ndim > 1 and dm.shape[-1] > 4096:
        vals, idx = _fast_top_k(dm.astype(jnp.bfloat16), C)
        return vals.astype(jnp.float32), idx
    return _fast_top_k(dm, C)


def knn(vecs: jnp.ndarray, sq_norms: jnp.ndarray, present: jnp.ndarray,
        q: jnp.ndarray, k: int, metric: str,
        mask: jnp.ndarray | None = None,
        scan_vecs: jnp.ndarray | None = None):
    """Top-k nearest: returns (dists [k], idx [k]).

    For f32 storage this is two-phase: a bf16 MXU candidate scan picks
    C = max(4k, k+16) candidates, then an exact f32 rescore ranks them —
    returned DISTANCES are exact, and top-k MEMBERSHIP is exact unless a
    true neighbor's bf16 distance (~0.4% rel err) falls outside the
    C-candidate margin (recall >= 0.99 measured on clustered corpora;
    tests/test_units.py::test_two_phase_knn_clustered pins near-tie
    behavior).  Other dtypes rank the full scan directly.

    scan_vecs: optional bf16 copy of `vecs` for the candidate scan —
    halves the scan's HBM reads; the values it produces are the same
    bf16-precision dots the MXU computes from f32 inputs at DEFAULT
    precision, and the f32 rescore path always reads `vecs`."""
    valid = present if mask is None else (present & mask)
    two_phase = vecs.dtype == jnp.float32 and _cand_k(
        vecs.shape[0], k) < vecs.shape[0]
    sv = scan_vecs if (two_phase and scan_vecs is not None) else vecs
    d = distances_to(sv, sq_norms, q, metric, approx=two_phase)
    dm = jnp.where(valid, d, BIG)
    if not two_phase:
        vals, idx = _fast_top_k(-dm, k)
        return -vals, idx
    C = _cand_k(vecs.shape[0], k)
    avals, aidx = _cand_top(-dm, C)
    dr = jnp.where(-avals >= BIG * 0.5, BIG,
                   _rescore(vecs, sq_norms, q, aidx, metric))
    vals, sel = jax.lax.top_k(-dr, k)
    return -vals, jnp.take(aidx, sel, axis=0)


def knn_batch(vecs: jnp.ndarray, sq_norms: jnp.ndarray,
              present: jnp.ndarray, Q: jnp.ndarray, k: int, metric: str,
              mask: jnp.ndarray | None = None,
              scan_vecs: jnp.ndarray | None = None):
    """Batched exact KNN: Q [B, d] -> (dists [B, k], idx [B, k]).

    One [B, d] x [d, N] MXU matmul — the throughput path for benchmarks and
    the serving layer (amortizes HBM reads of the vector matrix over B).
    f32 storage scans at bf16 (one-pass MXU) and rescores a C-candidate
    set per query at f32, keeping exact distance semantics ~4x faster
    than a Precision.HIGHEST scan.  scan_vecs: see knn()."""
    valid = present if mask is None else (present & mask)
    two_phase = vecs.dtype == jnp.float32 and _cand_k(
        vecs.shape[0], k) < vecs.shape[0]
    sv = scan_vecs if (two_phase and scan_vecs is not None) else vecs
    d = distances_to(sv, sq_norms, Q, metric, approx=two_phase)
    dm = jnp.where(valid[None, :], d, BIG)
    if not two_phase:
        vals, idx = _fast_top_k(-dm, k)
        return -vals, idx
    C = _cand_k(vecs.shape[0], k)
    avals, aidx = _cand_top(-dm, C)                    # [B, C]
    dr = jnp.where(-avals >= BIG * 0.5, BIG,
                   _rescore(vecs, sq_norms, Q, aidx, metric))
    vals, sel = jax.lax.top_k(-dr, k)
    return -vals, jnp.take_along_axis(aidx, sel, axis=1)


def knn_batch_masked(vecs: jnp.ndarray, sq_norms: jnp.ndarray,
                     valid2d: jnp.ndarray, Q: jnp.ndarray, k: int,
                     metric: str,
                     scan_vecs: jnp.ndarray | None = None):
    """Batched filtered KNN: per-query validity mask [B, N] fused as an
    epilogue on the shared distance matmul (the reference's filtered
    "hybrid" query, src/iterators/hybrid_reader.c:16-59 — here there is
    no BATCHES/ADHOC_BF switch because the scan is one MXU matmul either
    way; the filter costs one select).

    Q [B, d], valid2d bool[B, N] -> (dists [B, k], idx [B, k]).  Same
    precision contract as knn_batch: f32 storage scans at bf16 and
    rescores the candidate set at f32.  scan_vecs: see knn()."""
    two_phase = vecs.dtype == jnp.float32 and _cand_k(
        vecs.shape[0], k) < vecs.shape[0]
    sv = scan_vecs if (two_phase and scan_vecs is not None) else vecs
    d = distances_to(sv, sq_norms, Q, metric, approx=two_phase)
    dm = jnp.where(valid2d, d, BIG)
    if not two_phase:
        vals, idx = _fast_top_k(-dm, k)
        return -vals, idx
    C = _cand_k(vecs.shape[0], k)
    avals, aidx = _cand_top(-dm, C)                    # [B, C]
    dr = jnp.where(-avals >= BIG * 0.5, BIG,
                   _rescore(vecs, sq_norms, Q, aidx, metric))
    vals, sel = jax.lax.top_k(-dr, k)
    return -vals, jnp.take_along_axis(aidx, sel, axis=1)


def knn_scan_batches(vecs: jnp.ndarray, sq_norms: jnp.ndarray,
                     present: jnp.ndarray, Qc: jnp.ndarray, k: int,
                     metric: str, mask: jnp.ndarray | None = None,
                     scan_vecs: jnp.ndarray | None = None):
    """Chunked batched KNN: Qc [it, B, d] -> (dists [it, B, k], idx).

    One XLA dispatch scans the chunk axis, so per-dispatch overhead
    (host->device latency, program launch) amortizes over it*B queries —
    the serving layer's deep-queue shape.  Each chunk is one MXU matmul;
    the fp32 scan is HBM-bandwidth-bound and the top-k fuses with the
    matmul's output reduction."""
    def body(_, q):
        return None, knn_batch(vecs, sq_norms, present, q, k, metric,
                               mask=mask, scan_vecs=scan_vecs)
    return jax.lax.scan(body, None, Qc)[1]


def range_query(vecs: jnp.ndarray, sq_norms: jnp.ndarray,
                present: jnp.ndarray, q: jnp.ndarray, radius: float,
                metric: str):
    """VecSimIndex_RangeQuery analog: bool mask + distances."""
    d = distances_to(vecs, sq_norms, q, metric)
    return present & (d <= radius), d
