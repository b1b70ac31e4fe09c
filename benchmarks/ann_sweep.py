"""ANN recall@10 vs QPS sweep (BASELINE.md config: "HNSW-class ANN: KNN +
range on glove-100 / deep-1M, recall@10 vs QPS sweep at equal memory").

Synthetic glove-100-shaped data (clustered cosine embeddings).  Reports:

  * the exact MXU scan (recall 1.0) at serving batch — the TPU-first
    primary path.  At "equal memory" it holds an edge by construction:
    FLAT stores only the raw vectors, while reference HNSW adds its graph
    (~1.6x raw for M=16 on 100-d), so any recall<1 HNSW operating point
    must also beat these QPS numbers to win.
  * the IVF nprobe sweep (EF_RUNTIME analog) — the recall/QPS tradeoff
    curve used for single-chip beyond-HBM paging and low-latency small
    batches, where the batched exact scan cannot amortize its HBM reads.
  * scale points at several corpus sizes, with the capacity math for the
    sharded mesh path (capacity and QPS scale linearly with chips; the
    in-graph top-k merge is exact, so recall stays 1.0 — dist-vs-local
    parity is pinned by tests/test_dist.py on the 8-device CPU mesh).

Tunnel-attach methodology (see PERF_NOTES.md): every timed dispatch uses
a distinct query slab (the attach memoizes identical dispatches) and the
clock stops on a device_get collect (block_until_ready does not force a
round trip here).

Run on the TPU host: `python benchmarks/ann_sweep.py [n_docs]`.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


def make_corpus(rng, n, d, n_queries, n_centers=256):
    """Clustered directions — ANN-favorable like real embeddings."""
    centers = rng.normal(size=(n_centers, d)).astype(np.float32)
    assign = rng.integers(0, n_centers, size=n)
    vecs = (centers[assign] + 0.3 * rng.normal(size=(n, d))
            ).astype(np.float32)
    queries = (centers[rng.integers(0, n_centers, size=n_queries)]
               + 0.3 * rng.normal(size=(n_queries, d))
               ).astype(np.float32)
    return vecs, queries


def main(n: int = 1_000_000, d: int = 100, k: int = 10, nlist: int = 1024):
    import jax
    import jax.numpy as jnp

    import redisearch_tpu as rs
    rs.enable_compilation_cache()
    from redisearch_tpu.ops.ivf import IVFIndex, ivf_probe_batch
    from redisearch_tpu.ops.vector import knn_scan_batches

    rng = np.random.default_rng(0)
    n_queries = 256
    reps = 4
    vecs, queries = make_corpus(rng, n, d, n_queries * reps)

    dv = jnp.asarray(vecs)
    sq = jnp.sum(dv * dv, axis=1)
    present = jnp.ones((n,), bool)
    Q = jnp.asarray(queries).reshape(reps, n_queries, d)

    # ground truth (host, exact) for the first slab
    qn = queries[:n_queries]
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True),
                           1e-30)
    sims = vn @ qn.T                           # [n, n_queries]
    truth = [set(np.argpartition(-sims[:, i], k)[:k].tolist())
             for i in range(n_queries)]

    from functools import partial

    @partial(jax.jit, static_argnames=("kk",))
    def flat(vs, sqs, pres, Qc, kk):
        return knn_scan_batches(vs, sqs, pres, Qc, kk, "COSINE")

    # warm + recall check on slab 0 (knn_scan_batches takes [it, B, d])
    _, idx0 = flat(dv, sq, present, Q[:1], k)
    got0 = jax.device_get(idx0)[0]
    flat_recall = np.mean([
        len(set(got0[i].tolist()) & truth[i]) / k
        for i in range(n_queries)])
    # timed: distinct slab per dispatch, one collect at the end
    t0 = time.perf_counter()
    outs = [flat(dv, sq, present, Q[r:r + 1], k)[1]
            for r in range(1, reps)]
    jax.device_get(outs)
    flat_qps = (reps - 1) * n_queries / (time.perf_counter() - t0)
    print(f"FLAT exact (batch {n_queries}): {flat_qps:.0f} QPS, "
          f"recall@{k}={flat_recall:.4f}, memory {vecs.nbytes/1e6:.0f} MB "
          f"(HNSW M=16 graph would add ~{n*16*2*4/1e6:.0f} MB)")

    t0 = time.perf_counter()
    ivf = IVFIndex.build(vecs, np.ones(n, bool), "COSINE", nlist=nlist)
    print(f"IVF build (nlist={nlist}): {time.perf_counter()-t0:.1f}s, "
          f"memory {ivf.memory_bytes()/1e6:.0f} MB "
          f"(list_pad {ivf.list_pad})")

    points = []
    for nprobe in (4, 8, 16, 32, 64, 128):
        _, ids = ivf_probe_batch(ivf, Q[0], k, nprobe)
        got = jax.device_get(ids)
        recall = np.mean([len(set(got[i].tolist()) & truth[i]) / k
                          for i in range(n_queries)])
        t0 = time.perf_counter()
        outs = [ivf_probe_batch(ivf, Q[r], k, nprobe)[1]
                for r in range(1, reps)]
        jax.device_get(outs)
        qps = (reps - 1) * n_queries / (time.perf_counter() - t0)
        points.append({"nprobe": nprobe,
                       "recall@10": round(float(recall), 4),
                       "qps": round(qps, 1)})
        print(f"IVF nprobe={nprobe:4d}: recall@{k}={recall:.4f}  "
              f"{qps:.0f} QPS")

    # beyond-HBM host tier (ops/ivf.py HostIVF): vectors in host RAM,
    # device keeps centroids; probed lists page per batch.  This is the
    # configuration for corpora that do NOT fit HBM — QPS here bounds
    # what a beyond-HBM corpus serves at (PCIe/tunnel paging cost).
    from redisearch_tpu.ops.ivf import HostIVF, host_ivf_knn
    hivf = HostIVF.build(vecs, np.ones(n, bool), "COSINE",
                         centroids=np.asarray(ivf.centroids))
    host_points = []
    for nprobe in (8, 32):
        got = host_ivf_knn(hivf, queries[:n_queries], k, nprobe)[1]
        recall = np.mean([len(set(got[i].tolist()) & truth[i]) / k
                          for i in range(n_queries)])
        t0 = time.perf_counter()
        for r in range(1, reps):
            host_ivf_knn(hivf, queries[r * n_queries:(r + 1) * n_queries],
                         k, nprobe)
        qps = (reps - 1) * n_queries / (time.perf_counter() - t0)
        host_points.append({"nprobe": nprobe,
                            "recall@10": round(float(recall), 4),
                            "qps": round(qps, 1)})
        print(f"HOST-TIER nprobe={nprobe:4d}: recall@{k}={recall:.4f}  "
              f"{qps:.0f} QPS (device holds {hivf.device_bytes()/1e6:.1f} "
              f"MB of {hivf.host_bytes()/1e6:.0f} MB)")

    # capacity math for the sharded path (tests pin dist == local ids)
    hbm = 16e9
    per_doc = d * 4 + 8
    print(f"capacity: one v5e chip holds ~{hbm/per_doc/1e6:.0f}M "
          f"{d}-d f32 vectors in HBM; an 8-chip mesh ~"
          f"{8*hbm/per_doc/1e6:.0f}M at the same per-chip QPS "
          f"(doc-sharded scan + in-graph exact top-k merge, recall 1.0); "
          f"the host tier extends a single chip to host-RAM capacity at "
          f"the paging QPS above")
    print(json.dumps({"n": n, "d": d,
                      "flat_qps": round(flat_qps, 1),
                      "flat_recall": round(float(flat_recall), 4),
                      "sweep": points, "host_tier": host_points}))


if __name__ == "__main__":
    main(n=int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
