"""IVF partitioned vector index: the TPU-native HNSW replacement.

The reference's ANN is VecSim HNSW/SVS (graph walks — pointer chasing that a
vector machine cannot pipeline).  SURVEY.md §7.1 maps this to a partitioned
(IVF) index: k-means centroids route each query to `nprobe` lists; lists are
stored bucket-major as dense [nlist, list_pad, d] tiles so a probe is a
batched MXU matmul over gathered tiles.  Recall@k is tuned by nprobe
(the EF_RUNTIME analog); `ef_runtime` maps to nprobe in the API layer.

Training (k-means) is itself the framework's "training step": data-parallel
over the doc axis under shard_map with psum-merged centroid statistics —
see `kmeans_step_sharded`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

BIG = jnp.float32(3.4e38)


# ---------------------------------------------------------------------------
# k-means training
# ---------------------------------------------------------------------------

@partial(jax.jit, donate_argnums=())
def kmeans_step(x: jnp.ndarray, cents: jnp.ndarray):
    """One Lloyd iteration.  x [n, d] f32, cents [c, d] f32.

    Returns (new_cents, assignment, shift).  Assignment via one MXU matmul
    (argmin ||x-c||^2 = argmax 2xc - ||c||^2).
    """
    csq = jnp.sum(cents * cents, axis=1)
    scores = 2.0 * (x @ cents.T) - csq[None, :]
    assign = jnp.argmax(scores, axis=1)
    c = cents.shape[0]
    sums = jax.ops.segment_sum(x, assign, num_segments=c)
    counts = jax.ops.segment_sum(jnp.ones((x.shape[0],), jnp.float32),
                                 assign, num_segments=c)
    new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)
                    [:, None], cents)
    shift = jnp.sqrt(jnp.sum((new - cents) ** 2, axis=1)).max()
    return new, assign, shift


def kmeans_step_sharded(mesh, x_sharded: jnp.ndarray, cents: jnp.ndarray):
    """Data-parallel Lloyd step: x sharded on the doc axis, centroid
    statistics psum-merged over ICI.  This is the multi-chip training step
    (the coordinator-era analog would be a MapReduce over shards)."""
    from jax.sharding import PartitionSpec as P

    def body(xs, c):
        csq = jnp.sum(c * c, axis=1)
        scores = 2.0 * (xs @ c.T) - csq[None, :]
        assign = jnp.argmax(scores, axis=1)
        k = c.shape[0]
        sums = jax.ops.segment_sum(xs, assign, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones((xs.shape[0],), jnp.float32),
                                     assign, num_segments=k)
        sums = jax.lax.psum(sums, "shards")
        counts = jax.lax.psum(counts, "shards")
        return jnp.where(counts[:, None] > 0,
                         sums / jnp.maximum(counts, 1.0)[:, None], c)

    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P("shards"), P()), out_specs=P()))(
            x_sharded, cents)


def train_kmeans(x: np.ndarray, nlist: int, iters: int = 10,
                 seed: int = 0, sample: int = 262144) -> np.ndarray:
    """Host driver: subsample + iterate jitted Lloyd steps."""
    rng = np.random.default_rng(seed)
    n = x.shape[0]
    if n > sample:
        idx = rng.choice(n, sample, replace=False)
        xs = x[idx]
    else:
        xs = x
    init = xs[rng.choice(xs.shape[0], nlist, replace=xs.shape[0] < nlist)]
    cents = jnp.asarray(init, jnp.float32)
    xd = jnp.asarray(xs, jnp.float32)
    for _ in range(iters):
        cents, _, shift = kmeans_step(xd, cents)
        if float(shift) < 1e-4:
            break
    return np.asarray(cents)


# ---------------------------------------------------------------------------
# IVF index
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class IVFIndex:
    """Bucket-major IVF storage for one vector field of one segment."""

    centroids: Any        # f32[nlist, d]
    cent_sq: Any          # f32[nlist]
    bucket_vecs: Any      # f32/bf16[nlist, list_pad, d]
    bucket_sq: Any        # f32[nlist, list_pad]
    bucket_ids: Any       # int32[nlist, list_pad]  local doc id, -1 pad
    nlist: int
    list_pad: int
    dim: int
    metric: str

    @classmethod
    def build(cls, vecs: np.ndarray, present: np.ndarray, metric: str,
              nlist: int = 0, iters: int = 10,
              dtype=jnp.float32) -> "IVFIndex":
        sel = np.nonzero(np.asarray(present))[0]
        x = np.asarray(vecs, np.float32)[sel]
        n, d = x.shape
        if nlist <= 0:
            nlist = max(int(np.sqrt(max(n, 1))), 1)
        xn = x
        if metric == "COSINE":
            xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                                1e-30)
        cents = train_kmeans(xn, nlist, iters)
        # assign all vectors
        csq = np.sum(cents * cents, axis=1)
        assign = np.argmax(2.0 * (xn @ cents.T) - csq[None, :], axis=1)
        counts = np.bincount(assign, minlength=nlist)
        list_pad = max(int(counts.max()), 1)
        list_pad = ((list_pad + 127) // 128) * 128
        bv = np.zeros((nlist, list_pad, d), np.float32)
        bi = np.full((nlist, list_pad), -1, np.int32)
        fill = np.zeros(nlist, np.int64)
        for row, c in enumerate(assign):
            j = fill[c]
            bv[c, j] = x[row]
            bi[c, j] = sel[row]
            fill[c] += 1
        bsq = np.sum(bv * bv, axis=2)
        return cls(
            centroids=jnp.asarray(cents),
            cent_sq=jnp.asarray(csq.astype(np.float32)),
            bucket_vecs=jnp.asarray(bv, dtype=dtype),
            bucket_sq=jnp.asarray(bsq),
            bucket_ids=jnp.asarray(bi),
            nlist=nlist, list_pad=list_pad, dim=d, metric=metric,
        )

    def memory_bytes(self) -> int:
        return (self.bucket_vecs.nbytes + self.bucket_sq.nbytes
                + self.bucket_ids.nbytes + self.centroids.nbytes)


def ivf_probe_arrays(centroids, cent_sq, bucket_vecs, bucket_sq, bucket_ids,
                     metric: str, q: jnp.ndarray, k: int, nprobe: int,
                     cand_docs: Optional[jnp.ndarray] = None,
                     cand_valid: Optional[jnp.ndarray] = None):
    """KNN via centroid routing over raw arrays (jit-friendly form).

    Returns (dists [k], local_ids [k]).  Filtered KNN: `cand_docs` is a
    sorted candidate window (engine window representation) and membership
    of probed ids is tested with searchsorted — the BATCHES-mode analog of
    the reference's hybrid iterator (src/iterators/hybrid_reader.c).
    """
    qf = q.astype(jnp.float32)
    if metric == "COSINE":
        qf = qf / jnp.maximum(jnp.linalg.norm(qf), 1e-30)
    cd = cent_sq - 2.0 * (centroids @ qf)
    _, lists = jax.lax.top_k(-cd, min(nprobe, centroids.shape[0]))
    tiles = bucket_vecs[lists]               # [nprobe, list_pad, d]
    tsq = bucket_sq[lists]
    tids = bucket_ids[lists]
    dots = jnp.einsum("pld,d->pl", tiles.astype(jnp.float32), qf,
                      preferred_element_type=jnp.float32)
    if metric == "L2":
        d = tsq - 2.0 * dots + jnp.sum(qf * qf)
    elif metric == "IP":
        d = 1.0 - dots
    else:  # COSINE (vectors stored unnormalized; normalize via tsq)
        d = 1.0 - dots / jnp.maximum(jnp.sqrt(tsq), 1e-30)
    valid = tids >= 0
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


def ivf_probe(ivf: IVFIndex, q: jnp.ndarray, k: int, nprobe: int,
              cand: Optional[tuple] = None):
    """Convenience wrapper over ivf_probe_arrays for an IVFIndex."""
    cd, cv = cand if cand is not None else (None, None)
    return ivf_probe_arrays(ivf.centroids, ivf.cent_sq, ivf.bucket_vecs,
                            ivf.bucket_sq, ivf.bucket_ids, ivf.metric,
                            q, k, nprobe, cd, cv)


def ivf_probe_batch(ivf: IVFIndex, Q: jnp.ndarray, k: int, nprobe: int):
    """Batched probe via lax.map: sequential per query so the gathered
    [nprobe, list_pad, d] tiles stay bounded (vmap would materialize them
    for the whole batch — OOM at 1M-scale indexes)."""
    fn = lambda q: ivf_probe(ivf, q, k, nprobe)
    return jax.lax.map(fn, Q)
