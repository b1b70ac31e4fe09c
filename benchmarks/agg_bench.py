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
    print(json.dumps({
        "metric": "FT.AGGREGATE groupby(1000)+3 reducers+sortby over 1M docs",
        "value": round(qps, 2), "unit": "qps",
        "ms_per_query": round(dt / iters * 1000, 1)}))


if __name__ == "__main__":
    main()
