"""FT.AGGREGATE GROUPBY benchmark (BASELINE.md config: "FT.AGGREGATE
groupby/reduce + SORTBY with sharded fan-out and ICI top-k merge").

1M docs, 1000 tag groups, GROUPBY + COUNT/SUM/AVG + SORTBY.  Exercises the
device one-hot-MXU aggregation path (ops/groupby.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


def main(n_docs: int = 1_000_000, n_groups: int = 1000, iters: int = 20):
    import redisearch_tpu as rs
    rs.enable_compilation_cache()
    from redisearch_tpu.agg.pipeline import DESC, AggregateRequest

    rng = np.random.default_rng(0)
    cats = np.array([f"cat{i:04d}" for i in range(n_groups)])
    cat_of = rng.integers(0, n_groups, n_docs)
    price = rng.integers(1, 10_000, n_docs)
    docs = [(f"d{i}", {"t": f"w{i % 97} w{i % 31}",
                       "cat": cats[cat_of[i]],
                       "price": float(price[i])})
            for i in range(n_docs)]
    ix = rs.SearchIndex(rs.Schema(name="agg", fields=[
        rs.Field("t", rs.FieldType.TEXT),
        rs.Field("cat", rs.FieldType.TAG, sortable=True),
        rs.Field("price", rs.FieldType.NUMERIC, sortable=True)]))
    t0 = time.perf_counter()
    ix.add_documents(docs)
    print(f"indexed {n_docs} in {time.perf_counter()-t0:.0f}s")

    def run(q):
        return ix.aggregate(
            AggregateRequest(q)
            .group_by("@cat", ("COUNT", [], "n"), ("SUM", ["@price"], "s"),
                      ("AVG", ["@price"], "a"))
            .sort_by(("@s", DESC)).limit(0, 10))

    res = run("*")  # warm/compile
    assert len(res.rows) == 10
    # correctness spot check
    g = res.rows[0]["cat"]
    mask = cats[cat_of] == g
    assert abs(res.rows[0]["s"] - price[mask].sum()) < 1.0

    t0 = time.perf_counter()
    for i in range(iters):
        run("*" if i % 2 else f"w{i % 31}")
    dt = time.perf_counter() - t0
    qps = iters / dt
    print(f"sequential: {qps:.1f} QPS ({dt/iters*1e3:.1f} ms/agg)")

    # batched concurrency (the reference measures under memtier
    # concurrency; run_aggregate_many overlaps device dispatches and
    # collects once — a sequential loop pays a full link round trip per
    # aggregation on a tunneled attach)
    from redisearch_tpu.agg.pipeline import run_aggregate_many
    B = 32

    def mk(i):
        return (AggregateRequest("*" if i % 2 else f"w{i % 31}")
                .group_by("@cat", ("COUNT", [], "n"),
                          ("SUM", ["@price"], "s"),
                          ("AVG", ["@price"], "a"))
                .sort_by(("@s", DESC)).limit(0, 10))
    run_aggregate_many(ix, [mk(i) for i in range(B)])   # warm
    t0 = time.perf_counter()
    rounds = max(2, iters // 4)
    for r in range(rounds):
        run_aggregate_many(ix, [mk(r * B + i) for i in range(B)])
    dtb = time.perf_counter() - t0
    qps_b = rounds * B / dtb
    print(f"batched x{B}: {qps_b:.1f} QPS ({dtb/(rounds*B)*1e3:.1f} "
          f"ms/agg)")
    print(json.dumps({
        "metric": "FT.AGGREGATE groupby(1000)+3 reducers+sortby over 1M docs",
        "value": round(qps_b, 2), "unit": "qps",
        "sequential_qps": round(qps, 2),
        "ms_per_query_batched": round(dtb / (rounds * B) * 1000, 1)}))


if __name__ == "__main__":
    main()
