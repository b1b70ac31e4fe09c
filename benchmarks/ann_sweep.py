"""ANN recall@10 vs QPS sweep (BASELINE.md config: "HNSW-class ANN: KNN +
range on glove-100 / deep-1M, recall@10 vs QPS sweep at equal memory").

Synthetic glove-100-shaped data (1M x 100 f32, cosine).  Sweeps IVF nprobe
(the EF_RUNTIME analog) and reports recall@10 + QPS per point, plus the
exact FLAT scan as the recall=1.0 reference point.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


def main(n: int = 1_000_000, d: int = 100, n_queries: int = 256,
         k: int = 10, nlist: int = 1024):
    import jax
    import jax.numpy as jnp

    from redisearch_tpu.ops.ivf import IVFIndex, ivf_probe_batch
    from redisearch_tpu.ops.vector import knn_batch

    rng = np.random.default_rng(0)
    # glove-like: clustered directions (ANN-favorable like real embeddings)
    centers = rng.normal(size=(256, d)).astype(np.float32)
    assign = rng.integers(0, 256, size=n)
    vecs = (centers[assign] + 0.3 * rng.normal(size=(n, d))
            ).astype(np.float32)
    queries = (centers[rng.integers(0, 256, size=n_queries)]
               + 0.3 * rng.normal(size=(n_queries, d))).astype(np.float32)

    dv = jnp.asarray(vecs)
    sq = jnp.sum(dv * dv, axis=1)
    present = jnp.ones((n,), bool)
    Q = jnp.asarray(queries)

    # ground truth + FLAT QPS
    t0 = time.perf_counter()
    _, truth_idx = knn_batch(dv, sq, present, Q, k, "COSINE")
    jax.block_until_ready(truth_idx)
    compile_pad = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        _, ti = knn_batch(dv, sq, present, Q, k, "COSINE")
    jax.block_until_ready(ti)
    flat_qps = 5 * n_queries / (time.perf_counter() - t0)
    truth = [set(r) for r in np.asarray(truth_idx).tolist()]
    print(f"FLAT exact: {flat_qps:.0f} QPS, recall 1.0 "
          f"(first compile {compile_pad:.1f}s)")

    t0 = time.perf_counter()
    ivf = IVFIndex.build(vecs, np.ones(n, bool), "COSINE", nlist=nlist)
    print(f"IVF build (nlist={nlist}): {time.perf_counter()-t0:.1f}s, "
          f"memory {ivf.memory_bytes()/1e6:.0f} MB vs flat "
          f"{vecs.nbytes/1e6:.0f} MB")

    points = []
    for nprobe in (4, 8, 16, 32, 64, 128):
        dists, ids = ivf_probe_batch(ivf, Q, k, nprobe)
        jax.block_until_ready(ids)
        t0 = time.perf_counter()
        for _ in range(5):
            dists, ids = ivf_probe_batch(ivf, Q, k, nprobe)
        jax.block_until_ready(ids)
        qps = 5 * n_queries / (time.perf_counter() - t0)
        got = np.asarray(ids)
        recall = np.mean([len(set(got[i].tolist()) & truth[i]) / k
                          for i in range(n_queries)])
        points.append({"nprobe": nprobe, "recall@10": round(float(recall), 4),
                       "qps": round(qps, 1)})
        print(f"nprobe={nprobe:4d}: recall@10={recall:.4f}  {qps:.0f} QPS")
    print(json.dumps({"flat_qps": round(flat_qps, 1), "sweep": points}))


if __name__ == "__main__":
    main()
