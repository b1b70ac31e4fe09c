"""Phase profile of run_aggregate_many: prepare / bind / submit /
device / finish, on the bench.py workload shape (2-term match ->
GROUPBY(1000) + COUNT/SUM/AVG + SORTBY + LIMIT 10).

Usage: python benchmarks/agg_profile.py [n_docs] [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_docs=200_000, B=256):
    import jax
    import redisearch_tpu as rs
    rs.enable_compilation_cache()
    from redisearch_tpu.agg import pipeline as P
    from redisearch_tpu.agg.pipeline import DESC, AggregateRequest
    from redisearch_tpu.query.engine import QueryOptions

    rng = np.random.default_rng(0)
    vocab = 200_000
    words = np.array(["w%06d" % i for i in range(vocab)])
    zipf = np.clip(rng.zipf(1.25, size=(n_docs, 24)) - 1, 0, vocab - 1)
    cat2 = np.array(["g%04d" % i for i in range(1000)])
    price = rng.integers(1, 10_000, n_docs)
    docs = [(f"d{i}", {"title": " ".join(words[zipf[i, :4]]),
                       "body": " ".join(words[zipf[i, 4:]]),
                       "grp": cat2[i % 1000],
                       "price": float(price[i])})
            for i in range(n_docs)]
    schema = rs.Schema(name="bm25", fields=[
        rs.Field("title", rs.FieldType.TEXT, weight=2.0),
        rs.Field("body", rs.FieldType.TEXT),
        rs.Field("grp", rs.FieldType.TAG, sortable=True),
        rs.Field("price", rs.FieldType.NUMERIC, sortable=True)])
    ix = rs.SearchIndex(schema)
    t0 = time.perf_counter()
    ix.add_documents(docs)
    print(f"built {n_docs} in {time.perf_counter()-t0:.0f}s", flush=True)

    qt = ["w%06d" % i for i in rng.integers(20, 2000, size=256)]

    def mk(i):
        q = f"{qt[(2 * i) % 256]} {qt[(2 * i + 1) % 256]}"
        return (AggregateRequest(q)
                .group_by("@grp", ("COUNT", [], "n"),
                          ("SUM", ["@price"], "s"),
                          ("AVG", ["@price"], "a"))
                .sort_by(("@s", DESC)).limit(0, 10))

    for w in range(2):
        P.run_aggregate_many(ix, [mk(w * B + i) for i in range(B)])

    # phase timings: replicate run_aggregate_many's body with clocks
    for rep in range(3):
        reqs = [mk((rep + 2) * B + i) for i in range(B)]
        t0 = time.perf_counter()
        ix.commit()
        prepared = []
        groups = {}
        for req in reqs:
            opts = (QueryOptions(scorer=req.scorer, verbatim=req.verbatim)
                    if req.now is None else
                    QueryOptions(scorer=req.scorer, verbatim=req.verbatim,
                                 now=req.now))
            cq = ix.prepare(req.query, req.params, opts, req.dialect)
            plan = P._plan_device_group(ix, req, cq)
            prepared.append((req, cq, plan))
            if plan is None:
                continue
            (group, _tail, operands, want_minmax, _pre, _in_fields,
             pre_sig) = plan
            segsig = []
            for seg in ix.segments:
                ent = cq.bind_row(seg)[1]
                segsig.append((ent[6], ent[7]))
            segsig = tuple(segsig)
            key = (tuple(group.by), tuple(operands), want_minmax, pre_sig,
                   segsig)
            groups.setdefault(key, []).append(len(prepared) - 1)
        t1 = time.perf_counter()
        handles = {}
        bufs = []
        buf_ids = {}
        for idxs in groups.values():
            items = [prepared[i] for i in idxs]
            hs = P._device_group_submit_batch(ix, items)
            if hs is None:
                continue
            for i, h in zip(idxs, hs):
                handles[i] = h
                for _ki, _e, (entry, flat, _j) in h[5]:
                    if id(flat) not in buf_ids:
                        buf_ids[id(flat)] = len(bufs)
                        bufs.append(flat)
        t2 = time.perf_counter()
        fetched = jax.device_get(bufs) if bufs else []
        t3 = time.perf_counter()
        unpacked = {}
        out = []
        n_fallback = 0
        for i, (req, cq, plan) in enumerate(prepared):
            h = handles.get(i)
            if h is None:
                n_fallback += 1
                out.append(P.run_aggregate(ix, req))
                continue
            group, tail, op_list, mm, _u, parts = h
            fparts = []
            for ki, e, (entry, flat, j) in parts:
                full = unpacked.get(id(flat))
                if full is None:
                    full = entry._unpack_out(
                        np.asarray(fetched[buf_ids[id(flat)]]))
                    unpacked[id(flat)] = full
                fparts.append((ki, e, {k: v[j] for k, v in full.items()}))
            out.append(P._device_group_finish(
                ix, (group, tail, op_list, mm, _u, fparts)))
        t4 = time.perf_counter()
        print(f"rep{rep}: total={1e3*(t4-t0):.1f}ms "
              f"prepare+plan={1e3*(t1-t0):.1f} submit={1e3*(t2-t1):.1f} "
              f"device_get={1e3*(t3-t2):.1f} finish={1e3*(t4-t3):.1f} "
              f"groups={len(groups)} fallback={n_fallback} "
              f"qps={B/(t4-t0):.0f}", flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    main(n, b)
