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

def _build_buckets(vecs: np.ndarray, present: np.ndarray, metric: str,
                   nlist: int = 0, iters: int = 10,
                   centroids: Optional[np.ndarray] = None):
    """Shared bucket construction: train (or reuse) centroids, assign
    every present vector, lay lists out bucket-major with 128-aligned
    padding.  Returns host numpy (cents, csq, bv, bsq, bi, nlist,
    list_pad, d)."""
    sel = np.nonzero(np.asarray(present))[0]
    x = np.asarray(vecs, np.float32)[sel]
    n, d = x.shape
    xn = x
    if metric == "COSINE":
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                            1e-30)
    if centroids is None:
        if nlist <= 0:
            nlist = max(int(np.sqrt(max(n, 1))), 1)
        cents = train_kmeans(xn, nlist, iters)
    else:
        cents = np.asarray(centroids, np.float32)
        nlist = cents.shape[0]
    csq = np.sum(cents * cents, axis=1)
    if n:
        assign = np.argmax(2.0 * (xn @ cents.T) - csq[None, :], axis=1)
    else:
        assign = np.zeros(0, np.int64)
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
    return (cents, csq.astype(np.float32), bv, bsq.astype(np.float32),
            bi, nlist, list_pad, d)


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
              nlist: int = 0, iters: int = 10, dtype=jnp.float32,
              centroids: Optional[np.ndarray] = None) -> "IVFIndex":
        (cents, csq, bv, bsq, bi, nlist, list_pad, d) = _build_buckets(
            vecs, present, metric, nlist, iters, centroids=centroids)
        return cls(
            centroids=jnp.asarray(cents),
            cent_sq=jnp.asarray(csq),
            bucket_vecs=jnp.asarray(bv, dtype=dtype),
            bucket_sq=jnp.asarray(bsq),
            bucket_ids=jnp.asarray(bi),
            nlist=nlist, list_pad=list_pad, dim=d, metric=metric,
        )

    def memory_bytes(self) -> int:
        return (self.bucket_vecs.nbytes + self.bucket_sq.nbytes
                + self.bucket_ids.nbytes + self.centroids.nbytes)


@dataclasses.dataclass
class HostIVF:
    """Beyond-HBM vector tier: IVF bucket slabs resident in HOST memory;
    the device holds only the centroid table.

    The reference scales vector capacity past device memory with its
    pluggable disk tier (src/search_disk_api.h:41-55) and tiered VecSim
    (src/vector_index.c:89); the TPU analog keeps vectors one level down
    the memory hierarchy (host RAM vs ~16 GB HBM) and pages on demand:

        probe   (device)  centroid top-nprobe per query   [tiny]
        gather  (host)    ONE np.take of the probed lists' slabs
        scan    (device)  exact distances over the gathered slab + top-k

    Per-batch upload cost = unique-probed-lists x list_pad x d floats;
    queries in a batch share list uploads.  Recall == device IVF at equal
    nprobe (same centroids, same math) — only the residency differs.
    """

    centroids: Any           # DEVICE f32[nlist, d]
    cent_sq: Any             # DEVICE f32[nlist]
    bucket_vecs: np.ndarray  # HOST f32[nlist, list_pad, d] (u8 if LVQ8)
    bucket_sq: np.ndarray    # HOST f32[nlist, list_pad]
    bucket_ids: np.ndarray   # HOST int32[nlist, list_pad]
    nlist: int
    list_pad: int
    dim: int
    metric: str
    # LVQ8 compressed slabs (reference: SVS LVQ, src/vector_index.h:
    # 17-71; ops/lvq.py): bucket_vecs holds uint8 codes and these hold
    # the per-vector dequant pair; bucket_sq = ||reconstruction||^2.
    compression: str = ""
    bucket_off: Optional[np.ndarray] = None   # HOST f32[nlist, list_pad]
    bucket_scl: Optional[np.ndarray] = None   # HOST f32[nlist, list_pad]

    @classmethod
    def build(cls, vecs: np.ndarray, present: np.ndarray, metric: str,
              nlist: int = 0, iters: int = 10,
              centroids: Optional[np.ndarray] = None) -> "HostIVF":
        (cents, csq, bv, bsq, bi, nlist, list_pad, d) = _build_buckets(
            vecs, present, metric, nlist, iters, centroids=centroids)
        return cls(centroids=jnp.asarray(cents), cent_sq=jnp.asarray(csq),
                   bucket_vecs=bv, bucket_sq=bsq, bucket_ids=bi,
                   nlist=nlist, list_pad=list_pad, dim=d, metric=metric)

    @classmethod
    def build_lvq(cls, codes: np.ndarray, off: np.ndarray,
                  scl: np.ndarray, present: np.ndarray, metric: str,
                  nlist: int = 0, iters: int = 10,
                  centroids: Optional[np.ndarray] = None) -> "HostIVF":
        """Bucket layout over LVQ8-compressed vectors (ops/lvq.py).
        Centroids train/assign on the reconstructions (decoded in
        bounded chunks — build-time transient), the slabs store the
        uint8 codes; scan-time distances are exact against the
        reconstruction, so recall matches an uncompressed index built
        on the reconstructed vectors at equal nprobe."""
        from .lvq import lvq_decode, lvq_sq_norms

        sel = np.nonzero(np.asarray(present))[0]
        c_all = np.asarray(codes)[sel]
        o_all = np.asarray(off, np.float32)[sel]
        s_all = np.asarray(scl, np.float32)[sel]
        n, d = c_all.shape
        if centroids is None:
            if nlist <= 0:
                nlist = max(int(np.sqrt(max(n, 1))), 1)
            x = lvq_decode(c_all, o_all, s_all)
            if metric == "COSINE":
                x /= np.maximum(
                    np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
            cents = train_kmeans(x, nlist, iters)
            del x
        else:
            cents = np.asarray(centroids, np.float32)
            nlist = cents.shape[0]
        csq = np.sum(cents * cents, axis=1).astype(np.float32)
        assign = np.zeros(n, np.int64)
        CH = 65536
        for i in range(0, n, CH):
            x = lvq_decode(c_all[i:i + CH], o_all[i:i + CH],
                           s_all[i:i + CH])
            if metric == "COSINE":
                x /= np.maximum(
                    np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
            assign[i:i + CH] = np.argmax(
                2.0 * (x @ cents.T) - csq[None, :], axis=1)
        counts = np.bincount(assign, minlength=nlist)
        list_pad = max(int(counts.max()), 1)
        list_pad = ((list_pad + 127) // 128) * 128
        bc = np.zeros((nlist, list_pad, d), np.uint8)
        bo = np.zeros((nlist, list_pad), np.float32)
        bs = np.zeros((nlist, list_pad), np.float32)
        bi = np.full((nlist, list_pad), -1, np.int32)
        fill = np.zeros(nlist, np.int64)
        for row, cl in enumerate(assign):
            j = fill[cl]
            bc[cl, j] = c_all[row]
            bo[cl, j] = o_all[row]
            bs[cl, j] = s_all[row]
            bi[cl, j] = sel[row]
            fill[cl] += 1
        bsq = lvq_sq_norms(bc, bo, bs)
        return cls(centroids=jnp.asarray(cents),
                   cent_sq=jnp.asarray(csq),
                   bucket_vecs=bc, bucket_sq=bsq, bucket_ids=bi,
                   nlist=nlist, list_pad=list_pad, dim=d, metric=metric,
                   compression="LVQ8", bucket_off=bo, bucket_scl=bs)

    def device_bytes(self) -> int:
        return self.centroids.nbytes + self.cent_sq.nbytes

    def host_bytes(self) -> int:
        extra = ((self.bucket_off.nbytes + self.bucket_scl.nbytes)
                 if self.compression else 0)
        return (self.bucket_vecs.nbytes + self.bucket_sq.nbytes
                + self.bucket_ids.nbytes + extra)


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
    return _scan_tiles(tiles, tsq, tids, qf, k, metric,
                       cand_docs, cand_valid)


def _scan_tiles(tiles, tsq, tids, qf, k: int, metric: str,
                cand_docs=None, cand_valid=None, doc_ok=None):
    """Exact distances + top-k over gathered list tiles — the shared tail
    of the device probe and the host-tier slab scan.  tiles [P, L, d],
    tsq/tids [P, L]; qf is pre-normalized for COSINE."""
    dots = jnp.einsum("pld,d->pl", tiles.astype(jnp.float32), qf,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    if metric == "L2":
        d = tsq - 2.0 * dots + jnp.sum(qf * qf)
    elif metric == "IP":
        d = 1.0 - dots
    else:  # COSINE (vectors stored unnormalized; normalize via tsq)
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


def ivf_probe(ivf: IVFIndex, q: jnp.ndarray, k: int, nprobe: int,
              cand: Optional[tuple] = None):
    """Convenience wrapper over ivf_probe_arrays for an IVFIndex."""
    cd, cv = cand if cand is not None else (None, None)
    return ivf_probe_arrays(ivf.centroids, ivf.cent_sq, ivf.bucket_vecs,
                            ivf.bucket_sq, ivf.bucket_ids, ivf.metric,
                            q, k, nprobe, cd, cv)


def ivf_probe_batch(ivf: IVFIndex, Q: jnp.ndarray, k: int, nprobe: int):
    """Batched probe: vmap over chunks sized so the gathered
    [C, nprobe, list_pad, d] tiles stay within a ~256 MB budget (a full
    vmap would materialize them for the whole batch — OOM at 1M-scale
    indexes; fully sequential lax.map left the VPU idle at ~200 QPS)."""
    B, d = Q.shape
    per = nprobe * ivf.list_pad * d * 4
    C = int(max(1, min(B, (1 << 28) // max(per, 1))))
    fn = jax.vmap(lambda q: ivf_probe(ivf, q, k, nprobe))
    if C >= B:
        return fn(Q)
    n_pad = -(-B // C) * C
    Qp = jnp.concatenate(
        [Q, jnp.zeros((n_pad - B, d), Q.dtype)]) if n_pad > B else Q
    dists, ids = jax.lax.map(fn, Qp.reshape(n_pad // C, C, d))
    return (dists.reshape(n_pad, -1)[:B], ids.reshape(n_pad, -1)[:B])


# ---------------------------------------------------------------------------
# Host-tier (beyond-HBM) query path
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("nprobe", "metric"))
def _probe_lists(centroids, cent_sq, Q, nprobe: int, metric: str):
    """Phase 1 (device): per-query top-nprobe list ids.  Only the
    centroid table lives in HBM, so this is a tiny [B, nlist] matmul."""
    Qf = Q.astype(jnp.float32)
    if metric == "COSINE":
        Qf = Qf / jnp.maximum(
            jnp.linalg.norm(Qf, axis=1, keepdims=True), 1e-30)
    cd = cent_sq[None, :] - 2.0 * (Qf @ centroids.T)
    _, lists = jax.lax.top_k(-cd, nprobe)
    return lists                              # int32[B, nprobe]


@partial(jax.jit,
         static_argnames=("k", "metric", "has_cand", "has_ok"))
def _scan_slab(slab_v, slab_sq, slab_ids, rowmap, Q, k: int, metric: str,
               cand_docs, cand_valid, doc_ok, has_cand: bool,
               has_ok: bool):
    """Phase 3 (device): exact scan over the gathered slab.  rowmap
    [B, nprobe] indexes each query's lists within the slab; lax.map keeps
    the per-query tile gather bounded (same rationale as
    ivf_probe_batch)."""
    Qf = Q.astype(jnp.float32)
    if metric == "COSINE":
        Qf = Qf / jnp.maximum(
            jnp.linalg.norm(Qf, axis=1, keepdims=True), 1e-30)

    def one(args):
        rm, qf, cd, cv = args
        return _scan_tiles(slab_v[rm], slab_sq[rm], slab_ids[rm], qf, k,
                           metric,
                           cd if has_cand else None,
                           cv if has_cand else None,
                           doc_ok if has_ok else None)

    return jax.lax.map(one, (rowmap, Qf, cand_docs, cand_valid))


def host_ivf_knn(hivf: HostIVF, Q: np.ndarray, k: int, nprobe: int,
                 doc_ok=None, cand_docs=None, cand_valid=None):
    """Beyond-HBM KNN driver: probe on device, gather the probed lists'
    slabs host-side (one np.take over the bucket-major arrays), scan the
    slab on device.  Returns host (dists [B, k], local_ids [B, k]).

    doc_ok: optional DEVICE bool[n_pad] liveness mask (deletes/TTL).
    cand_docs/cand_valid: optional host [B, Wc] sorted candidate windows
    for filtered KNN (the BATCHES analog, src/iterators/hybrid_reader.c).
    """
    from ..index.segment import next_pow2

    B_real, d = Q.shape
    nprobe = max(1, min(nprobe, hivf.nlist))
    k = max(1, min(k, hivf.nlist * hivf.list_pad))
    B = int(next_pow2(B_real))
    Qp = Q.astype(np.float32)
    if B != B_real:
        Qp = np.concatenate([Qp, np.repeat(Qp[-1:], B - B_real, axis=0)])
    lists = np.asarray(jax.device_get(_probe_lists(
        hivf.centroids, hivf.cent_sq, jnp.asarray(Qp), nprobe,
        hivf.metric)))
    uniq, inv = np.unique(lists, return_inverse=True)
    U = len(uniq)
    U_pad = int(next_pow2(U))                 # bounded executable set
    slab_v = np.zeros((U_pad, hivf.list_pad, d), hivf.bucket_vecs.dtype)
    slab_v[:U] = hivf.bucket_vecs[uniq]
    slab_sq = np.zeros((U_pad, hivf.list_pad), np.float32)
    slab_sq[:U] = hivf.bucket_sq[uniq]
    slab_ids = np.full((U_pad, hivf.list_pad), -1, np.int32)
    slab_ids[:U] = hivf.bucket_ids[uniq]
    if hivf.compression:
        slab_off = np.zeros((U_pad, hivf.list_pad), np.float32)
        slab_off[:U] = hivf.bucket_off[uniq]
        slab_scl = np.zeros((U_pad, hivf.list_pad), np.float32)
        slab_scl[:U] = hivf.bucket_scl[uniq]
    rowmap = inv.reshape(B, nprobe).astype(np.int32)

    has_cand = cand_docs is not None
    if has_cand:
        cd = np.asarray(cand_docs)
        cv = (np.asarray(cand_valid) if cand_valid is not None
              else np.ones(cd.shape, bool))
        if cd.shape[0] != B:                  # pad batch rows
            pad = np.repeat(cd[-1:], B - cd.shape[0], axis=0)
            cd = np.concatenate([cd, pad])
            cv = np.concatenate(
                [cv, np.zeros((B - cv.shape[0], cv.shape[1]), bool)])
    else:                                     # uniform pytree for lax.map
        cd = np.zeros((B, 1), np.int32)
        cv = np.zeros((B, 1), bool)
    ok = doc_ok if doc_ok is not None else jnp.ones(1, bool)
    if hivf.compression:
        from .lvq import scan_slab_lvq
        dists, ids = scan_slab_lvq(
            jnp.asarray(slab_v), jnp.asarray(slab_off),
            jnp.asarray(slab_scl), jnp.asarray(slab_sq),
            jnp.asarray(slab_ids), jnp.asarray(rowmap), jnp.asarray(Qp),
            k, hivf.metric, jnp.asarray(cd), jnp.asarray(cv), ok,
            has_cand, doc_ok is not None)
    else:
        dists, ids = _scan_slab(
            jnp.asarray(slab_v), jnp.asarray(slab_sq),
            jnp.asarray(slab_ids), jnp.asarray(rowmap),
            jnp.asarray(Qp), k, hivf.metric,
            jnp.asarray(cd), jnp.asarray(cv), ok, has_cand,
            doc_ok is not None)
    dists, ids = jax.device_get((dists, ids))
    return np.asarray(dists)[:B_real], np.asarray(ids)[:B_real]
