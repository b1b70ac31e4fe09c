"""TPU/CPU parity smoke: run the same query mix on the current backend
and print a canonical digest of every result.

Usage:
    python benchmarks/tpu_smoke.py          # whatever backend is default
    python benchmarks/tpu_smoke.py cpu      # force CPU

Run once with `cpu` and once without, diff the outputs: any divergence is
a hardware-specific numerics/layout bug (e.g. the TPU denormal flush that
zeroed bitcast int32 outputs in the packed transport buffer).  CPU tests
alone cannot catch that class.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from redisearch_tpu.agg.pipeline import AggregateRequest
    from redisearch_tpu.api import Client
    from redisearch_tpu.schema import Field, FieldType, VectorParams

    c = Client()
    c.ft_create("smoke", [
        Field("title", FieldType.TEXT, weight=2.0),
        Field("body", FieldType.TEXT),
        Field("tag", FieldType.TAG),
        Field("price", FieldType.NUMERIC, sortable=True),
        Field("loc", FieldType.GEO),
        Field("v", FieldType.VECTOR, vector=VectorParams(dim=8,
                                                         metric="L2")),
    ])
    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "omega", "search",
             "engine", "vector", "query", "shard"]
    vecs = rng.normal(size=(64, 8)).astype(np.float32)
    for i in range(64):
        c.hset(f"d{i}", {
            "title": " ".join(rng.choice(words, 3)),
            "body": " ".join(rng.choice(words, 8)),
            "tag": ["red", "green", "blue"][i % 3],
            "price": float(i % 20),
            "loc": f"{-122.4 + (i % 10) * 0.01},{37.7 + (i // 10) * 0.01}",
            "v": vecs[i],
        })

    out = {}

    def dig(name, res):
        out[name] = {"total": res.total,
                     "hits": [(h.key, round(float(h.score), 4))
                              for h in res.hits]}

    dig("and2", c.ft_search("smoke", "alpha beta", no_content=True))
    dig("or2", c.ft_search("smoke", "alpha|omega", no_content=True))
    dig("not", c.ft_search("smoke", "search -vector", no_content=True))
    dig("phrase", c.ft_search("smoke", '"vector query"', no_content=True))
    dig("field", c.ft_search("smoke", "@title:engine", no_content=True))
    dig("prefix", c.ft_search("smoke", "gam*", no_content=True))
    dig("tag", c.ft_search("smoke", "@tag:{red}", no_content=True))
    dig("num", c.ft_search("smoke", "@price:[5 9]", no_content=True))
    # mixed-order union: numeric windows are value-sorted, tag/term
    # windows doc-sorted — exercises the sort-based union dedup
    dig("mixed_union", c.ft_search(
        "smoke", "(alpha | @price:[3 7] | @tag:{red})", no_content=True,
        num=50))
    dig("geo", c.ft_search("smoke",
                           "@loc:[-122.38 37.72 3 km]", no_content=True))
    dig("sort", c.ft_search("smoke", "*", sort_by="price",
                            no_content=True))
    dig("knn", c.ft_search("smoke", "*=>[KNN 5 @v $q]",
                           params={"q": vecs[17]}, no_content=True))
    dig("batchesknn", c.ft_search(
        "smoke", "(@tag:{blue})=>[KNN 5 @v $q HYBRID_POLICY BATCHES]",
        params={"q": vecs[17]}, no_content=True))
    dig("hybridknn", c.ft_search("smoke", "(@tag:{blue})=>[KNN 5 @v $q]",
                                 params={"q": vecs[17]}, no_content=True))

    req = (AggregateRequest("*")
           .group_by(["@tag"], ("COUNT", [], "n"),
                     ("AVG", ["@price"], "avg"))
           .sort_by("@tag"))
    rows = c.ft_aggregate("smoke", req).rows
    out["agg"] = [{k: (round(float(v), 4)
                       if isinstance(v, (int, float)) else v)
                   for k, v in r.items()} for r in rows]

    print(json.dumps(out, sort_keys=True, indent=1))


if __name__ == "__main__":
    main()
