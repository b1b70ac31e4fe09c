"""Phase profile of batched filtered KNN serving: prepare / bind+pack /
device+link, per filter family, at several batch depths.

Usage: python benchmarks/fknn_profile.py [n_docs] [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_docs=500_000, B=2048, iters=4):
    import jax
    import redisearch_tpu as rs
    rs.enable_compilation_cache()
    from redisearch_tpu.query import engine as E
    from redisearch_tpu.query.engine import QueryOptions, execute_batch

    rng = np.random.default_rng(0)
    dim = 384
    words = np.array(["algebra", "graph", "neural", "quantum", "protein",
                      "market", "vision", "speech", "logic", "random"])
    vecs = rng.normal(size=(n_docs, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    docs = [(f"p{i}", {
        "title": " ".join(words[rng.integers(0, 10, 3)]),
        "year": int(1990 + (i % 35)),
        "cat": f"c{i % 20}",
        "emb": vecs[i]}) for i in range(n_docs)]
    schema = rs.Schema(name="arxivb", fields=[
        rs.Field("title", rs.FieldType.TEXT),
        rs.Field("year", rs.FieldType.NUMERIC, sortable=True),
        rs.Field("cat", rs.FieldType.TAG),
        rs.Field("emb", rs.FieldType.VECTOR,
                 vector=rs.VectorParams(dim=dim,
                                        metric=rs.VectorMetric.COSINE))])
    ix = rs.SearchIndex(schema)
    t0 = time.perf_counter()
    ix.add_documents(docs)
    print(f"built {n_docs} in {time.perf_counter()-t0:.0f}s", flush=True)
    seg = ix.segments[0]
    qvecs = rng.normal(size=(512, dim)).astype(np.float32)

    fams = {
        "fulltext": lambda i: f"(@title:{words[i % 10]})"
                              "=>[KNN 25 @emb $b EF_RUNTIME 64]",
        "numeric": lambda i: f"(@year:[{1990 + i % 30} {1995 + i % 30}])"
                             "=>[KNN 25 @emb $b EF_RUNTIME 64]",
        "tag": lambda i: f"(@cat:{{c{i % 20}}})"
                         "=>[KNN 25 @emb $b EF_RUNTIME 64]",
        "pure": lambda i: "*=>[KNN 25 @emb $b EF_RUNTIME 64]",
    }
    for name, qfn in fams.items():
        def make(it):
            return [ix.prepare(qfn(it * B + i),
                               {"b": qvecs[(it * B + i) % 512]},
                               QueryOptions(k=25), 2) for i in range(B)]
        E.QUERY_PATH_STATS.clear()
        for it in range(2):
            r = execute_batch(make(it), seg, 25)
        print(f"{name}: paths={dict(E.QUERY_PATH_STATS)}", flush=True)
        # phase timing (sequential, not pipelined)
        tp = tb = td = 0.0
        n_under = 0
        for it in range(iters):
            t0 = time.perf_counter()
            cqs = make(it + 2)
            t1 = time.perf_counter()
            h = execute_batch(cqs, seg, 25, async_=True)
            t2 = time.perf_counter()
            res = h.result()
            t3 = time.perf_counter()
            tp += t1 - t0
            tb += t2 - t1
            td += t3 - t2
        tot = tp + tb + td
        print(f"{name}: B={B} prepare={tp/iters*1e3:.1f}ms "
              f"bind+submit={tb/iters*1e3:.1f}ms "
              f"device+collect={td/iters*1e3:.1f}ms "
              f"-> {iters*B/tot:.0f} qps (seq)", flush=True)
        # pipelined
        best = None
        for _rep in range(2):
            t0 = time.perf_counter()
            pending = None
            nxt = make(0)
            for it in range(iters):
                h = execute_batch(nxt, seg, 25, async_=True)
                if it + 1 < iters:
                    nxt = make(it + 1)
                if pending is not None:
                    pending.result()
                pending = h
            pending.result()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name}: pipelined {iters*B/best:.0f} qps", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 500_000, int(a[1]) if len(a) > 1 else 2048)
