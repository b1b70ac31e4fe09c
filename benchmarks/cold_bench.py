"""Cold-segment paging cost: BM25 QPS on a beyond-HBM text index.

Builds the same zipf corpus twice — hot (device CSR) and cold
(Schema(storage="host"): postings in host RAM, per-query window slabs
paged up) — and measures AND-2 and exact-phrase throughput on both.
The delta is the paging tax; the cold index's device footprint is just
the dense per-doc columns.

Run on the TPU host: `python benchmarks/cold_bench.py [n_docs]`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import numpy as np


def build(storage, n_docs, rng):
    import redisearch_tpu as rs
    vocab = 100_000
    words = np.array(["w%06d" % i for i in range(vocab)])
    zipf = np.clip(rng.zipf(1.25, size=(n_docs, 16)) - 1, 0, vocab - 1)
    ix = rs.SearchIndex(rs.Schema(name=f"cb_{storage}", fields=[
        rs.Field("t", rs.FieldType.TEXT)], storage=storage))
    docs = [(f"d{i}", {"t": " ".join(words[zipf[i]])})
            for i in range(n_docs)]
    t0 = time.perf_counter()
    ix.add_documents(docs)
    return ix, time.perf_counter() - t0


def measure(ix, queries, iters=4):
    # warm
    for q in queries[:32]:
        ix.search(q)
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        res = ix.search_many(queries, k=10)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    total = sum(r.total for r in res)
    return len(queries) / best, total


def main(n_docs=500_000):
    import redisearch_tpu as rs
    rs.enable_compilation_cache()
    rng = np.random.default_rng(7)
    qt = ["w%06d" % i for i in rng.integers(20, 3000, size=256)]
    and2 = [f"{qt[2*i % 250]} {qt[(2*i+1) % 250]}" for i in range(128)]
    phrase = [f'"{qt[2*i % 250]} {qt[(2*i+1) % 250]}"'
              for i in range(128)]
    out = {}
    totals = {}
    for storage in ("hbm", "host"):
        ix, build_s = build(storage, n_docs, np.random.default_rng(0))
        q1, t1 = measure(ix, and2)
        q2, t2 = measure(ix, phrase)
        seg = ix.segments[0]
        csr = (seg.text.doc_ids.nbytes + seg.text.freqs.nbytes
               + seg.text.field_masks.nbytes + seg.text.doclens.nbytes
               + seg.text.poskeys.nbytes)
        out[storage] = {"and2_qps": round(q1, 1),
                        "phrase_qps": round(q2, 1),
                        "csr_mb": round(csr / 1e6, 1),
                        "build_s": round(build_s, 1)}
        totals[storage] = (t1, t2)
        print(f"{storage:4s}: AND-2 {q1:8.1f} QPS  phrase {q2:8.1f} QPS  "
              f"CSR {csr/1e6:7.1f} MB "
              f"({'host RAM' if storage == 'host' else 'HBM'}), "
              f"totals {t1}/{t2}")
    assert totals["hbm"] == totals["host"], "cold != hot results!"
    out["paging_tax_and2"] = round(
        out["hbm"]["and2_qps"] / max(out["host"]["and2_qps"], 1e-9), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500_000)
