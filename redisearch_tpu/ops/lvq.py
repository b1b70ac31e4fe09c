"""LVQ-style compressed vector storage for the beyond-HBM host tier.

The reference's SVS backend offers LVQ/LeanVec compressed vectors
(reference: src/vector_index.h:17-71 — SVS-VAMANA with LVQ8 et al.) so
that large indexes hold ~4x more vectors at equal memory.  The TPU-
native analog is per-vector scalar quantization of the host tier:

  * encode  — each vector stores uint8 codes plus a per-vector
    (offset, scale) pair: ``recon = offset + scale * code``.  Per-
    vector ("locally adaptive", the LVQ in SVS-LVQ) ranges keep the
    quantization error proportional to each vector's own spread, and
    make slicing/compaction exact (no global retrain on resharding).
  * scan    — distances are computed against the reconstruction with
    ONE f32 matmul on the gathered u8 slab:
        dot(q, recon) = offset * sum(q) + scale * dot(q, codes)
    with ||recon||^2 precomputed, so L2/IP/COSINE reuse the exact same
    ||a||^2 - 2ab + ||b||^2 forms as the uncompressed scan
    (ops/ivf.py _scan_tiles).  The only recall loss is the u8
    quantization itself (<=1% recall@10 on 1M-scale corpora — pinned
    in tests/test_lvq.py).

Capacity: codes cost D + 8 bytes/vector vs 4D for fp32 — ~3.9x at
D=128+, and the host->device page-in per probed list shrinks by the
same factor (the host tier is PCIe-bound, so this is also a speedup).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

BIG = jnp.float32(3.4e38)


def lvq_encode(vecs: np.ndarray) -> tuple:
    """Encode rows to (codes u8[..., D], off f32[...], scl f32[...]).

    Works on any leading shape ([N, D] columns or [nlist, L, D] bucket
    slabs).  Constant rows encode with scale 0 and reconstruct exactly.
    """
    v = np.asarray(vecs, np.float32)
    mn = v.min(axis=-1)
    mx = v.max(axis=-1)
    scl = (mx - mn) / 255.0
    safe = np.where(scl > 0, scl, 1.0)
    codes = np.clip(
        np.rint((v - mn[..., None]) / safe[..., None]), 0, 255
    ).astype(np.uint8)
    codes = np.where((scl > 0)[..., None], codes, 0)
    return codes, mn.astype(np.float32), scl.astype(np.float32)


def lvq_decode(codes: np.ndarray, off: np.ndarray,
               scl: np.ndarray) -> np.ndarray:
    """Reconstruct f32 rows (host-side; used for slab rebuild/tests)."""
    return (off[..., None]
            + scl[..., None] * codes.astype(np.float32))


def lvq_sq_norms(codes: np.ndarray, off: np.ndarray, scl: np.ndarray,
                 chunk: int = 65536) -> np.ndarray:
    """||recon||^2 per row without materializing the full decode.

    sum((off + scl*c)^2) = D*off^2 + 2*off*scl*sum(c) + scl^2*sum(c^2)
    """
    flat = codes.reshape(-1, codes.shape[-1])
    o = off.reshape(-1).astype(np.float64)
    s = scl.reshape(-1).astype(np.float64)
    D = flat.shape[-1]
    out = np.empty(flat.shape[0], np.float64)
    for i in range(0, flat.shape[0], chunk):
        c = flat[i:i + chunk].astype(np.float64)
        s1 = c.sum(axis=1)
        s2 = (c * c).sum(axis=1)
        out[i:i + chunk] = (D * o[i:i + chunk] ** 2
                            + 2.0 * o[i:i + chunk] * s[i:i + chunk] * s1
                            + s[i:i + chunk] ** 2 * s2)
    return out.reshape(codes.shape[:-1]).astype(np.float32)


def scan_tiles_lvq(tiles, toff, tscl, tsq, tids, qf, k: int, metric: str,
                   cand_docs=None, cand_valid=None, doc_ok=None):
    """Exact-against-reconstruction distances + top-k over gathered u8
    list tiles — the compressed twin of ops/ivf.py _scan_tiles.
    tiles u8[P, L, d], toff/tscl/tsq/tids [P, L]; qf pre-normalized for
    COSINE."""
    dots_c = jnp.einsum("pld,d->pl", tiles.astype(jnp.float32), qf,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    dots = toff * jnp.sum(qf) + tscl * dots_c        # dot(q, recon)
    if metric == "L2":
        d = tsq - 2.0 * dots + jnp.sum(qf * qf)
    elif metric == "IP":
        d = 1.0 - dots
    else:  # COSINE — stored unnormalized; normalize via ||recon||
        d = 1.0 - dots / jnp.maximum(jnp.sqrt(tsq), 1e-30)
    valid = tids >= 0
    if doc_ok is not None:
        cid = jnp.clip(tids, 0, doc_ok.shape[0] - 1)
        valid = valid & doc_ok[cid]
    if cand_docs is not None:
        Wc = cand_docs.shape[0]
        flat = tids.reshape(-1)
        pos = jnp.clip(jnp.searchsorted(cand_docs, flat), 0, Wc - 1)
        hit = (cand_docs[pos] == flat)
        if cand_valid is not None:
            hit = hit & cand_valid[pos]
        valid = valid & hit.reshape(tids.shape)
    d = jnp.where(valid, d, BIG)
    flat_d = d.reshape(-1)
    flat_i = tids.reshape(-1)
    kk = min(k, flat_d.shape[0])
    vals, sel = jax.lax.top_k(-flat_d, kk)
    return -vals, flat_i[sel]


@partial(jax.jit,
         static_argnames=("k", "metric", "has_cand", "has_ok"))
def scan_slab_lvq(slab_c, slab_off, slab_scl, slab_sq, slab_ids, rowmap,
                  Q, k: int, metric: str, cand_docs, cand_valid, doc_ok,
                  has_cand: bool, has_ok: bool):
    """Device phase-3 scan over a gathered COMPRESSED slab (the LVQ twin
    of ops/ivf.py _scan_slab; same lax.map shape discipline)."""
    Qf = Q.astype(jnp.float32)
    if metric == "COSINE":
        Qf = Qf / jnp.maximum(
            jnp.linalg.norm(Qf, axis=1, keepdims=True), 1e-30)

    def one(args):
        rm, qf, cd, cv = args
        return scan_tiles_lvq(slab_c[rm], slab_off[rm], slab_scl[rm],
                              slab_sq[rm], slab_ids[rm], qf, k, metric,
                              cd if has_cand else None,
                              cv if has_cand else None,
                              doc_ok if has_ok else None)

    return jax.lax.map(one, (rowmap, Qf, cand_docs, cand_valid))
