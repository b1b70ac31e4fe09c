"""Headline benchmark: FLAT KNN top-10 QPS on SIFT1M-shaped data.

Matches BASELINE.md config "FLAT vector index: KNN top-10, FP32 L2, SIFT1M
128-d (single shard)".  vs_baseline compares against the 16-core host
roofline for redisearch brute-force FLAT scans: a per-query scan of the
512 MB fp32 matrix at ~100 GB/s aggregate memory bandwidth → ~195 QPS
(BASELINE.md publishes no absolute numbers; this is the documented
memory-bandwidth bound the reference cannot exceed on that host).

Methodology: queries are staged on device, then ONE dispatch scans
chunk-by-chunk (redisearch_tpu.ops.vector.knn_scan_batches) and the
results come back in one collect — the deep-queue serving shape.  This
measures device throughput without per-dispatch link latency, which on a
tunneled dev attach would otherwise dominate (~30 ms per round trip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

N, D, K = 1_000_000, 128, 10
B, ITERS = 2048, 48
BASELINE_QPS = 195.0  # 16-core redisearch FLAT roofline (see module doc)


def main():
    import jax
    import jax.numpy as jnp

    from functools import partial

    import redisearch_tpu as rs
    rs.enable_compilation_cache()
    from redisearch_tpu.ops.vector import knn_batch, knn_scan_batches

    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(N, D)).astype(np.float32)
    queries = rng.normal(size=(ITERS, B, D)).astype(np.float32)

    dev_vecs = jnp.asarray(vecs)
    sq = jnp.sum(dev_vecs * dev_vecs, axis=1)
    present = jnp.ones((N,), bool)

    @partial(jax.jit, static_argnames=("k",))
    def run(vs, sqs, pres, Qc, k):
        return knn_scan_batches(vs, sqs, pres, Qc, k, "L2")

    # correctness spot-check on a small slab (exact argmin parity)
    ref = np.argmin(((vecs[:10000] - queries[0, 0][None, :]) ** 2).sum(1))
    got = np.asarray(
        knn_batch(dev_vecs[:10000], sq[:10000], present[:10000],
                  jnp.asarray(queries[0, :1]), 1, "L2")[1])[0, 0]
    assert got == ref, f"KNN mismatch: {got} vs {ref}"

    dq = jnp.asarray(queries)
    jax.block_until_ready((dev_vecs, sq, present, dq))

    # warmup / compile
    d, i = run(dev_vecs, sq, present, dq[:2], K)
    jax.block_until_ready((d, i))

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        d, i = run(dev_vecs, sq, present, dq, K)
        i_host = jax.device_get(i)          # one collect, forces completion
        best = min(best, time.perf_counter() - t0)
    qps = ITERS * B / best

    # recall sanity on the first chunk vs exact host top-K
    q0 = queries[0][:64]
    dots = vecs @ q0.T
    dist = (vecs ** 2).sum(1)[:, None] - 2 * dots + (q0 ** 2).sum(1)[None, :]
    gt = np.argsort(dist, axis=0)[:K].T
    rec = np.mean([len(set(i_host[0][b]) & set(gt[b])) / K
                   for b in range(64)])
    assert rec >= 0.97, f"recall too low: {rec}"

    print(json.dumps({
        "metric": "FLAT KNN top-10 QPS (SIFT1M-shape 1M x 128 fp32, L2)",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 2),
    }))


if __name__ == "__main__":
    main()
