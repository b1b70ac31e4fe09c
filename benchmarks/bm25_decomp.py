"""Decompose the 1M-doc BM25 serving pipeline: host (prepare+bind+pack)
vs device+link (submit..collect) vs full pipelined loop.

Run on the TPU host: python benchmarks/bm25_decomp.py [n_docs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_docs=1_000_000, B=4096, iters=8):
    import redisearch_tpu as rs
    rs.enable_compilation_cache()
    from redisearch_tpu.query.engine import QueryOptions, execute_batch

    rng = np.random.default_rng(0)
    vocab = 200_000
    words = np.array(["w%06d" % i for i in range(vocab)])
    zipf = np.clip(rng.zipf(1.25, size=(n_docs, 24)) - 1, 0, vocab - 1)
    cats = np.array(["cat%02d" % i for i in range(16)])
    docs = [(f"d{i}", {"title": " ".join(words[zipf[i, :4]]),
                       "body": " ".join(words[zipf[i, 4:]]),
                       "cat": cats[i % 16]}) for i in range(n_docs)]
    ix = rs.SearchIndex(rs.Schema(name="bm25", fields=[
        rs.Field("title", rs.FieldType.TEXT, weight=2.0),
        rs.Field("body", rs.FieldType.TEXT),
        rs.Field("cat", rs.FieldType.TAG)]))
    t0 = time.perf_counter()
    ix.add_documents(docs)
    print(f"build: {n_docs / (time.perf_counter() - t0):.0f} docs/s")
    seg = ix.segments[0]
    qt = ["w%06d" % i for i in rng.integers(20, 5000, size=512)]
    OPTS = QueryOptions(k=10)

    def qfn(i, it):
        return f"{qt[(2*i+it) % 500]} {qt[(2*i+it+1) % 500]}"

    def make(it):
        return [ix.prepare(qfn(i, it), None, OPTS, 2) for i in range(B)]

    for it in range(iters):
        execute_batch(make(it), seg, 10)

    # (a) host-only: make()
    best = 9e9
    for r in range(3):
        t0 = time.perf_counter()
        for it in range(iters):
            make(it)
        best = min(best, time.perf_counter() - t0)
    print(f"host make-only      : {best/iters/B*1e6:6.1f} us/q")

    # (b) device+link: pre-made cqs, submit+collect serially
    pre = [make(it) for it in range(iters)]
    best = 9e9
    for r in range(3):
        t0 = time.perf_counter()
        for it in range(iters):
            execute_batch(pre[it], seg, 10)
        best = min(best, time.perf_counter() - t0)
    print(f"premade submit+coll : {best/iters/B*1e6:6.1f} us/q "
          f"({iters*B/best:.0f} QPS)")

    # (b2) premade, pipelined (collect i-1 after submit i)
    best = 9e9
    for r in range(3):
        t0 = time.perf_counter()
        pending = None
        for it in range(iters):
            h = execute_batch(pre[it], seg, 10, async_=True)
            if pending is not None:
                pending.result()
            pending = h
        pending.result()
        best = min(best, time.perf_counter() - t0)
    print(f"premade pipelined   : {best/iters/B*1e6:6.1f} us/q "
          f"({iters*B/best:.0f} QPS)")

    # (c) full pipelined loop (bench.py shape)
    best = 9e9
    for r in range(3):
        t0 = time.perf_counter()
        pending = None
        nxt = make(0)
        for it in range(iters):
            h = execute_batch(nxt, seg, 10, async_=True)
            if it + 1 < iters:
                nxt = make(it + 1)
            if pending is not None:
                pending.result()
            pending = h
        pending.result()
        best = min(best, time.perf_counter() - t0)
    print(f"full pipelined      : {best/iters/B*1e6:6.1f} us/q "
          f"({iters*B/best:.0f} QPS)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
