"""Headline benchmark: FLAT KNN top-10 QPS on SIFT1M-shaped data.

Matches BASELINE.md config "FLAT vector index: KNN top-10, FP32 L2, SIFT1M
128-d (single shard)".  vs_baseline compares against the 16-core host
roofline for redisearch brute-force FLAT scans: a per-query scan of the
512 MB fp32 matrix at ~100 GB/s aggregate memory bandwidth → ~195 QPS
(BASELINE.md publishes no absolute numbers; this is the documented
memory-bandwidth bound the reference cannot exceed on that host).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

N, D, K, BATCH = 1_000_000, 128, 10, 256
BASELINE_QPS = 195.0  # 16-core redisearch FLAT roofline (see module doc)


def main():
    import jax
    import jax.numpy as jnp

    from redisearch_tpu.ops.vector import knn_batch

    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(N, D)).astype(np.float32)
    queries = rng.normal(size=(4096, D)).astype(np.float32)

    dev_vecs = jnp.asarray(vecs)
    sq = jnp.sum(dev_vecs * dev_vecs, axis=1)
    present = jnp.ones((N,), bool)

    from functools import partial

    @partial(jax.jit, static_argnames=("k",))
    def step_impl(vs, sqs, pres, q, k):
        return knn_batch(vs, sqs, pres, q, k, "L2")

    def step(q):
        return step_impl(dev_vecs, sq, present, q, K)

    # warmup / compile
    d, i = step(jnp.asarray(queries[:BATCH]))
    jax.block_until_ready((d, i))

    # correctness spot-check on a small slab
    ref = np.argmin(((vecs[:10000] - queries[0][None, :]) ** 2).sum(1))
    got = np.asarray(
        knn_batch(dev_vecs[:10000], sq[:10000], present[:10000],
                  jnp.asarray(queries[:1]), 1, "L2")[1])[0, 0]
    assert got == ref, f"KNN mismatch: {got} vs {ref}"

    # pre-stage query batches on device: measure compute, not PCIe/tunnel
    iters = 40
    batches = [jnp.asarray(queries[(it * BATCH) % 3840:
                                   (it * BATCH) % 3840 + BATCH])
               for it in range(iters)]
    jax.block_until_ready(batches)
    t0 = time.perf_counter()
    for qb in batches:
        d, i = step(qb)
    jax.block_until_ready((d, i))
    dt = time.perf_counter() - t0
    qps = iters * BATCH / dt

    print(json.dumps({
        "metric": "FLAT KNN top-10 QPS (SIFT1M-shape 1M x 128 fp32, L2)",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 2),
    }))


if __name__ == "__main__":
    main()
