"""Headline benchmark: BM25 top-10 QPS at 1M-doc scale, plus FLAT KNN.

The driver records ONE JSON line.  The headline metric is deliberately the
*weakest* north-star config — BM25 AND-2 top-10 at deep batch over a 1M-doc
zipf corpus shaped like enwiki abstracts (BASELINE.md row "BM25 top-10:
AND/OR/NOT + exact phrase over ~1M Wikipedia abstracts") — with exact
phrase and the already-won FLAT KNN number carried as extra fields.

vs_baseline math (BASELINE.md publishes no absolute reference numbers, so
these are documented estimates, not cherry-picks):
  * BM25: reference FT.SEARCH 2-term intersection top-10 on 1M FTSB
    enwiki-abstract docs on a 16-core host with WORKERS=6 is estimated at
    ~10,000 QPS (tests/benchmarks/search-asm-ftsb-1M-*.yml workload; CI
    `oss-standalone-threads-6` setup).  vs_baseline = our_qps / 10_000 —
    the ≥10x north star means this must reach ≥10.0.
  * FLAT KNN: per-query scan of the 512 MB fp32 SIFT1M matrix at ~100 GB/s
    host memory bandwidth → ~195 QPS roofline on the same 16-core host.

Methodology: queries are pre-parsed (prepared-query cache — the reference's
memtier loops a fixed query set too), then a pipelined serving loop overlaps
next-batch host work with device execution; KNN stages all queries on device
and scans chunk-by-chunk in ONE dispatch.  Both avoid per-dispatch tunnel
latency dominating the measurement (~30 ms/round trip on a tunneled attach).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Capture resilience (round-4 lesson — BENCH_r04 was rc=1 because ONE
"Unable to initialize backend 'axon'" killed the whole run): the parent
process NEVER initializes JAX.  Each bench section runs in a clean
re-exec'd subprocess (same recipe as __graft_entry__.dryrun_multichip)
that appends every completed sub-result to a progress file; a crashed or
flaky section is retried with backoff in a FRESH process, resuming past
sub-results already captured.  The final JSON line is assembled from
whatever completed, with per-section `error` fields instead of a
process-wide rc=1.
"""

import json
import os
import sys
import time

import numpy as np

BM25_BASELINE_QPS = 10_000.0   # documented 16-core WORKERS=6 estimate
KNN_BASELINE_QPS = 195.0       # 16-core FLAT scan memory-bandwidth roofline
# FT.AGGREGATE 2-term match (~10-50k docs) -> GROUPBY(1000)+COUNT/SUM/AVG
# +SORTBY: reference streams matched docs through RLookup+hash-groupby at
# ~2-5M rows/s/core -> ~5-10 ms/query/core, WORKERS=6 concurrency on 16
# cores => ~600-1200 QPS.  Documented estimate (BASELINE.md publishes no
# absolute numbers): 1,000 QPS.
AGG_BASELINE_QPS = 1_000.0
# Match-all ('*') GROUPBY(1000) over ALL 1M rows: the reference streams
# the full table through RLookup+hash-groupby at ~2-5M rows/s/core ->
# 0.2-0.5 s/query/core; WORKERS=6 on 16 cores => ~12-30 QPS.  Documented
# estimate: 20 QPS.
AGG_STAR_BASELINE_QPS = 20.0
# Filtered KNN25 EF_RUNTIME=64 over 500k x 384 angular (HNSW M16):
# reference CI workload (vecsim-arxiv-titles-384-angular-filters-*) at 32
# memtier conns; HNSW filtered search ~0.5-1.5 ms/query/core => 16-core
# estimate ~4,000 QPS.  Documented estimate.
FKNN_BASELINE_QPS = 4_000.0
# FT.HYBRID RRF (SEARCH BM25 + VSIM KNN, WINDOW 20) on the same arxiv-
# shaped corpus: reference hybrid-arxiv-titles workloads run two branches
# (text ~0.3-1 ms + HNSW KNN ~0.3-1 ms) plus an RRF merge per query;
# 16-core WORKERS=6 estimate ~2,000 QPS.  Documented estimate.
HYBRID_BASELINE_QPS = 2_000.0

N_DOCS = 1_000_000
KNN_N, KNN_D, KNN_K = 1_000_000, 128, 10
KNN_B, KNN_ITERS = 2048, 48

# BENCH_SMOKE=1: tiny shapes for validating the capture harness itself
# (CPU-friendly); numbers produced under smoke are meaningless.
_SMOKE = bool(os.environ.get("BENCH_SMOKE"))
if _SMOKE:
    N_DOCS = 20_000
    KNN_N, KNN_B, KNN_ITERS = 100_000, 256, 4


def bench_bm25(emit, done, n_docs: int = N_DOCS, B: int = 8192,
               iters: int = 8):
    import redisearch_tpu as rs
    from redisearch_tpu.query import engine as E
    from redisearch_tpu.query.engine import QueryOptions, execute_batch

    rng = np.random.default_rng(0)
    vocab = 200_000
    words = np.array(["w%06d" % i for i in range(vocab)])
    zipf = np.clip(rng.zipf(1.25, size=(n_docs, 24)) - 1, 0, vocab - 1)
    cats = np.array(["cat%02d" % i for i in range(16)])
    cat2 = np.array(["g%04d" % i for i in range(1000)])
    price = rng.integers(1, 10_000, n_docs)
    docs = [(f"d{i}", {"title": " ".join(words[zipf[i, :4]]),
                       "body": " ".join(words[zipf[i, 4:]]),
                       "cat": cats[i % 16],
                       "grp": cat2[i % 1000],
                       "price": float(price[i])})
            for i in range(n_docs)]
    schema = rs.Schema(name="bm25", fields=[
        rs.Field("title", rs.FieldType.TEXT, weight=2.0),
        rs.Field("body", rs.FieldType.TEXT),
        rs.Field("cat", rs.FieldType.TAG),
        rs.Field("grp", rs.FieldType.TAG, sortable=True),
        rs.Field("price", rs.FieldType.NUMERIC, sortable=True)])
    ix = rs.SearchIndex(schema)
    t0 = time.perf_counter()
    ix.add_documents(docs)
    build_s = time.perf_counter() - t0
    seg = ix.segments[0]

    qt = ["w%06d" % i for i in rng.integers(20, 5000, size=512)]
    # FTSB-like mix: besides the 3 headline families, exercise 3-term
    # intersections, unions, NOT, optional terms and multi-field scopes
    # (reference workloads tests/benchmarks/search-ftsb-*.yml are 1-4
    # term AND/OR/NOT over enwiki abstracts).  Stemming expanders stay
    # on (QueryOptions default); the synthetic vocab simply has no
    # inflected forms to expand.
    cases = {
        "and2": lambda i, it: f"{qt[(2*i+it) % 500]} {qt[(2*i+it+1) % 500]}",
        "phrase": lambda i, it:
            f'"{qt[(2*i+it) % 500]} {qt[(2*i+it+1) % 500]}"',
        "and2_tag": lambda i, it:
            f"{qt[(2*i+it) % 500]} {qt[(2*i+it+1) % 500]} "
            f"@cat:{{cat{(i + it) % 16:02d}}}",
        "and3": lambda i, it:
            f"{qt[(3*i+it) % 500]} {qt[(3*i+it+1) % 500]} "
            f"{qt[(3*i+it+2) % 500]}",
        "or2": lambda i, it:
            f"{qt[(2*i+it) % 500]}|{qt[(2*i+it+1) % 500]}",
        "not2": lambda i, it:
            f"{qt[(2*i+it) % 500]} -{qt[(2*i+it+1) % 500]}",
        "opt2": lambda i, it:
            f"{qt[(2*i+it) % 500]} ~{qt[(2*i+it+1) % 500]}",
        "fields2": lambda i, it:
            f"@title:{qt[(2*i+it) % 500]} @body:{qt[(2*i+it+1) % 500]}",
    }
    emit("bm25_build_docs_per_s", round(n_docs / build_s, 0))
    E.QUERY_PATH_STATS.clear()
    OPTS = QueryOptions(k=10)
    headline = ("and2", "phrase", "and2_tag")
    errored = False
    ran_any = False
    for name, qfn in cases.items():
        key = "bm25__" + name
        if key in done:
            continue
        ci = iters if name in headline else max(iters // 2, 2)
        reps = 3 if name in headline else 2

        def make(it, qfn=qfn):
            return [ix.prepare(qfn(i, it), None, OPTS, 2)
                    for i in range(B)]
        try:
            for it in range(ci):   # warm every bucket-shape combo
                execute_batch(make(it), seg, 10)
            # pipelined serving loop: next batch's host work (prepare/
            # bind/pack) overlaps the device executing the current batch
            # — build the NEXT batch after submitting the current one,
            # before collecting.  The tunnel's bandwidth fluctuates >2x
            # minute-to-minute; keep the fastest of `reps` repeats
            # (device work is constant, the link interference is not).
            best = None
            for _rep in range(reps):
                t0 = time.perf_counter()
                pending = []     # depth-2: hide the link round trip
                nxt = make(0)
                for it in range(ci):
                    pending.append(execute_batch(nxt, seg, 10,
                                                 async_=True))
                    if it + 1 < ci:
                        nxt = make(it + 1)
                    if len(pending) > 2:
                        pending.pop(0).result()
                for h in pending:
                    h.result()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            emit(key, round(ci * B / best, 1))
            ran_any = True
        except Exception as e:
            import traceback
            traceback.print_exc()
            emit(key + "_error", repr(e)[:160])
            errored = True
    if ran_any and "kernel_hit_pct" not in done:
        stats = dict(E.QUERY_PATH_STATS)
        hit = stats.get("kernel", 0) + stats.get("phrase-kernel", 0)
        tot = max(sum(stats.values()), 1)
        emit("kernel_hit_pct", round(100.0 * hit / tot, 1))
    return ix, errored


def bench_agg(ix, iters: int = 6, B: int = 1024):
    """FT.AGGREGATE (BASELINE config 5): 2-term text match -> GROUPBY
    grp(1000) + COUNT/SUM/AVG(price) + SORTBY sum DESC + LIMIT 10, on
    the same 1M-doc corpus, batched via run_aggregate_many.

    The workload matches the documented AGG_BASELINE_QPS assumption
    (every query a 2-term ~10-50k-doc match).  Match-all ("*") GROUPBY
    over the full 1M rows is a different cost class on both engines and
    is measured separately (bench_agg_star / AGG_STAR_BASELINE_QPS)."""
    from redisearch_tpu.agg.pipeline import (DESC, AggregateRequest,
                                             run_aggregate_many)
    rng = np.random.default_rng(3)
    qt = ["w%06d" % i for i in rng.integers(20, 2000, size=256)]

    def mk(i):
        q = f"{qt[(2 * i) % 256]} {qt[(2 * i + 1) % 256]}"
        return (AggregateRequest(q)
                .group_by("@grp", ("COUNT", [], "n"),
                          ("SUM", ["@price"], "s"),
                          ("AVG", ["@price"], "a"))
                .sort_by(("@s", DESC)).limit(0, 10))

    for w in range(2):                                  # warm
        run_aggregate_many(ix, [mk(w * B + i) for i in range(B)])
    rounds = max(iters // 2, 2)
    best = None
    for _rep in range(2):
        # pipelined: round r+1's prepare/plan/pack overlaps round r's
        # device work + d2h (copy_to_host_async started at submit)
        t0 = time.perf_counter()
        pending = []
        for r in range(rounds):
            pending.append(run_aggregate_many(
                ix, [mk(r * B + i) for i in range(B)], async_=True))
            if len(pending) > 2:
                pending.pop(0).result()
        for h in pending:
            h.result()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(rounds * B / best, 1)


def bench_agg_star(ix, iters: int = 4, B: int = 64):
    """Match-all GROUPBY: '*' -> GROUPBY grp(1000) over ALL 1M rows per
    query.  Separate bench case (the reference pays a full-table scan
    here too: ~1M rows / 2-5M rows/s/core -> 0.2-0.5 s/query/core)."""
    from redisearch_tpu.agg.pipeline import (DESC, AggregateRequest,
                                             run_aggregate_many)

    base_now = int(time.time())

    def mk(i):
        # vary the TTL clock per query: identical '*' plans would
        # otherwise produce bit-identical device dispatches, which the
        # tunneled attach memoizes (PERF_NOTES: vary inputs per iter)
        return (AggregateRequest("*", now=base_now + i)
                .group_by("@grp", ("COUNT", [], "n"),
                          ("SUM", ["@price"], "s"))
                .sort_by(("@s", DESC)).limit(0, 10))

    run_aggregate_many(ix, [mk(i) for i in range(B)])   # warm
    rounds = max(iters // 2, 2)
    t0 = time.perf_counter()
    pending = []
    for r in range(rounds):
        pending.append(run_aggregate_many(
            ix, [mk(r * B + i) for i in range(B)], async_=True))
        if len(pending) > 2:
            pending.pop(0).result()
    for h in pending:
        h.result()
    return round(rounds * B / (time.perf_counter() - t0), 1)


def bench_filtered_knn(emit, done, n_docs: int = 500_000, dim: int = 384,
                       B: int = 2048, iters: int = 6):
    """Filtered KNN (BASELINE config 4): KNN 25 cosine behind fulltext /
    numeric / tag prefilters on an arxiv-shaped 500k x 384 corpus."""
    import redisearch_tpu as rs
    from redisearch_tpu.query.engine import QueryOptions, execute_batch

    rng = np.random.default_rng(0)
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
    ix.add_documents(docs)
    seg = ix.segments[0]
    qvecs = rng.normal(size=(512, dim)).astype(np.float32)
    errored = False
    for name, qfn in {
        "fulltext": lambda i: f"(@title:{words[i % 10]})"
                              "=>[KNN 25 @emb $b EF_RUNTIME 64]",
        "numeric": lambda i: f"(@year:[{1990 + i % 30} "
                             f"{1995 + i % 30}])"
                             "=>[KNN 25 @emb $b EF_RUNTIME 64]",
        "tag": lambda i: f"(@cat:{{c{i % 20}}})"
                         "=>[KNN 25 @emb $b EF_RUNTIME 64]",
    }.items():
        key = "fknn__" + name
        if key in done:
            continue

        def make(it, qfn=qfn):
            return [ix.prepare(qfn(it * B + i),
                               {"b": qvecs[(it * B + i) % 512]},
                               QueryOptions(k=25), 2) for i in range(B)]
        try:
            for it in range(2):
                execute_batch(make(it), seg, 25)
            # deep-queue serving: R rounds of B queries ride ONE device
            # dispatch (execute_batch_rounds lax.scan) — the tunneled
            # attach costs ~100 ms of link overhead PER DISPATCH, so
            # amortizing it over R*B queries is the throughput lever;
            # the next dispatch's host prepare overlaps the device.
            from redisearch_tpu.query.engine import execute_batch_rounds
            execute_batch_rounds([make(it) for it in range(iters)],
                                 seg, 25)   # compile the R-round scan
            reps = 4
            best = None
            for _ in range(2):
                pending = []     # depth-2: host prep of round r+1 and
                nxt = [make(it) for it in range(iters)]
                t0 = time.perf_counter()
                for rep in range(reps):     # collect of r-1 both overlap
                    pending.append(execute_batch_rounds(
                        nxt, seg, 25, async_=True))
                    if rep + 1 < reps:
                        nxt = [make((rep + 1) * iters + it)
                               for it in range(iters)]
                    if len(pending) > 2:
                        pending.pop(0).result()
                for h in pending:
                    h.result()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            emit(key, round(reps * iters * B / best, 1))
        except Exception as e:
            import traceback
            traceback.print_exc()
            emit(key + "_error", repr(e)[:160])
            errored = True
    return ix, errored


def bench_hybrid(ix, emit, done, B: int = 1024, iters: int = 4):
    """FT.HYBRID RRF/LINEAR batched serving over the arxiv-shaped corpus
    (reference hybrid-arxiv-*.yml family): both branches of all B
    queries ride one grouped search_many round; the serving loop
    overlaps round i's fusion with round i+1's device work."""
    import redisearch_tpu as rs
    from redisearch_tpu.aux.hybrid import run_hybrid_many, \
        run_hybrid_rounds

    rng = np.random.default_rng(5)
    words = ["algebra", "graph", "neural", "quantum", "protein",
             "market", "vision", "speech", "logic", "random"]
    qvecs = rng.normal(size=(512, 384)).astype(np.float32)
    errored = False
    for name, cmb in (("rrf", "RRF"), ("linear", "LINEAR")):
        key = "hybrid__" + name
        if key in done:
            continue

        def mk(it, cmb=cmb):
            return [rs.HybridQuery(
                search=words[(it * B + i) % 10], vsim_field="emb",
                vsim_vector=qvecs[(it * B + i) % 512], combine=cmb,
                window=20, limit=10) for i in range(B)]
        try:
            run_hybrid_many(ix, mk(0))    # warm branch executables
            run_hybrid_rounds(ix, [mk(it) for it in range(iters)])
            reps = 4
            best = None
            for r in range(2):
                pending = []
                nxt = [mk(it) for it in range(iters)]
                t0 = time.perf_counter()
                for rep in range(reps):
                    pending.append(run_hybrid_rounds(ix, nxt,
                                                     async_=True))
                    if rep + 1 < reps:
                        nxt = [mk((rep + 1) * iters + it)
                               for it in range(iters)]
                    if len(pending) > 2:
                        pending.pop(0).result()
                for h in pending:
                    h.result()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            emit(key, round(reps * iters * B / best, 1))
        except Exception as e:
            import traceback
            traceback.print_exc()
            emit(key + "_error", repr(e)[:160])
            errored = True
    return errored


def bench_ann(emit, done, n: int = 1_000_000, d: int = 100, k: int = 10,
              nlist: int = 1024):
    """ANN recall@10-vs-QPS operating points on a clustered (ANN-
    favorable, glove-100-shaped) cosine corpus — BASELINE config 3.

    Emits the full sweep plus `ann_qps_at_r95`: the best QPS among
    operating points whose measured recall@10 >= 0.95.  Operating
    points: the exact FLAT MXU scan (recall 1.0 — at equal memory it
    stores no graph, where reference HNSW M=16 adds ~1.6x on 100-d) and
    the IVF nprobe ladder (the EF_RUNTIME analog used for beyond-HBM
    and low-latency configs).  Reference workload family:
    tests/benchmarks/vecsim-glove-100/deep-1M sweeps."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from redisearch_tpu.ops.ivf import IVFIndex, ivf_probe_batch
    from redisearch_tpu.ops.vector import knn_scan_batches

    if "ann_qps_at_r95" in done:
        return False
    rng = np.random.default_rng(7)
    n_queries, reps = 256, 4
    centers = rng.normal(size=(256, d)).astype(np.float32)
    vecs = (centers[rng.integers(0, 256, size=n)]
            + 0.3 * rng.normal(size=(n, d))).astype(np.float32)
    queries = (centers[rng.integers(0, 256, size=n_queries * reps)]
               + 0.3 * rng.normal(size=(n_queries * reps, d))
               ).astype(np.float32)

    dv = jnp.asarray(vecs)
    sq = jnp.sum(dv * dv, axis=1)
    present = jnp.ones((n,), bool)
    Q = jnp.asarray(queries).reshape(reps, n_queries, d)

    qn = queries[:n_queries]
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True),
                           1e-30)
    sims = vn @ qn.T
    truth = [set(np.argpartition(-sims[:, i], k)[:k].tolist())
             for i in range(n_queries)]

    def recall_of(got):
        return float(np.mean([len(set(got[i].tolist()) & truth[i]) / k
                              for i in range(n_queries)]))

    points = []

    @partial(jax.jit, static_argnames=("kk",))
    def flat(vs, sqs, pres, Qc, kk):
        return knn_scan_batches(vs, sqs, pres, Qc, kk, "COSINE")

    _, idx0 = flat(dv, sq, present, Q[:1], k)
    flat_rec = recall_of(jax.device_get(idx0)[0])
    t0 = time.perf_counter()
    outs = [flat(dv, sq, present, Q[r:r + 1], k)[1]
            for r in range(1, reps)]
    jax.device_get(outs)
    flat_qps = (reps - 1) * n_queries / (time.perf_counter() - t0)
    points.append({"op": "flat", "recall": round(flat_rec, 4),
                   "qps": round(flat_qps, 1)})

    try:
        ivf = IVFIndex.build(vecs, np.ones(n, bool), "COSINE",
                             nlist=nlist)
        for nprobe in (8, 32, 128):
            _, ids = ivf_probe_batch(ivf, Q[0], k, nprobe)
            rec = recall_of(jax.device_get(ids))
            t0 = time.perf_counter()
            outs = [ivf_probe_batch(ivf, Q[r], k, nprobe)[1]
                    for r in range(1, reps)]
            jax.device_get(outs)
            qps = (reps - 1) * n_queries / (time.perf_counter() - t0)
            points.append({"op": f"ivf{nprobe}", "recall": round(rec, 4),
                           "qps": round(qps, 1)})
    except Exception as e:
        import traceback
        traceback.print_exc()
        emit("ann_ivf_error", repr(e)[:160])
    emit("ann_sweep", points)
    ok = [pt["qps"] for pt in points if pt["recall"] >= 0.95]
    emit("ann_qps_at_r95", max(ok) if ok else 0.0)
    return False


def bench_knn():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from redisearch_tpu.ops.vector import knn_batch, knn_scan_batches

    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(KNN_N, KNN_D)).astype(np.float32)
    queries = rng.normal(size=(KNN_ITERS, KNN_B, KNN_D)).astype(np.float32)

    dev_vecs = jnp.asarray(vecs)
    scan = dev_vecs.astype(jnp.bfloat16)   # candidate-scan copy
    sq = jnp.sum(dev_vecs * dev_vecs, axis=1)
    present = jnp.ones((KNN_N,), bool)

    @partial(jax.jit, static_argnames=("k",))
    def run(vs, sqs, pres, Qc, k, sc=None):
        return knn_scan_batches(vs, sqs, pres, Qc, k, "L2",
                                scan_vecs=sc)

    # correctness spot-check on a small slab (exact argmin parity)
    ref = np.argmin(((vecs[:10000] - queries[0, 0][None, :]) ** 2).sum(1))
    got = np.asarray(
        knn_batch(dev_vecs[:10000], sq[:10000], present[:10000],
                  jnp.asarray(queries[0, :1]), 1, "L2")[1])[0, 0]
    assert got == ref, f"KNN mismatch: {got} vs {ref}"

    dq = jnp.asarray(queries)
    jax.block_until_ready((dev_vecs, sq, present, dq))
    d, i = run(dev_vecs, sq, present, dq[:2], KNN_K, scan)  # warm/compile
    jax.block_until_ready((d, i))

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        d, i = run(dev_vecs, sq, present, dq, KNN_K, scan)
        i_host = jax.device_get(i)          # one collect, forces completion
        best = min(best, time.perf_counter() - t0)
    qps = KNN_ITERS * KNN_B / best

    # recall sanity on the first chunk vs exact host top-K
    q0 = queries[0][:64]
    dots = vecs @ q0.T
    dist = (vecs ** 2).sum(1)[:, None] - 2 * dots + (q0 ** 2).sum(1)[None, :]
    gt = np.argsort(dist, axis=0)[:KNN_K].T
    rec = np.mean([len(set(i_host[0][b]) & set(gt[b])) / KNN_K
                   for b in range(64)])
    assert rec >= 0.97, f"recall too low: {rec}"
    return round(qps, 1), round(float(rec), 4)


# ---------------------------------------------------------------------------
# Orchestration: parent never touches JAX; each section is a clean
# re-exec'd subprocess appending to a progress file it can resume from.
# ---------------------------------------------------------------------------

RC_BACKEND = 17    # backend init failed fast — parent backs off + retries
RC_PARTIAL = 18    # some sub-benches errored in-process — parent retries

# (name, per-attempt timeout seconds)
SECTIONS = (("text", 2700), ("fknn", 1500), ("knn", 900), ("ann", 900))


def _load_progress(path):
    out = {}
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        out.update(json.loads(line))
                    except ValueError:
                        pass   # torn tail line from a killed child
    except OSError:
        pass
    return out


def _make_emitter(path):
    f = open(path, "a")

    def emit(key, val):
        f.write(json.dumps({key: val}) + "\n")
        f.flush()
        os.fsync(f.fileno())
    return emit


def _probe_backend():
    """Fail fast (RC_BACKEND) if the TPU backend won't come up, so the
    parent retries in a fresh process instead of burning the section
    timeout — JAX caches a failed backend for the process lifetime.

    The env var JAX_PLATFORMS alone does NOT stop other registered
    plugins from initializing (observed: a CPU-pinned child still hung
    in axon/TPU init); `jax.config.update('jax_platforms', ...)` is the
    effective pin (same recipe as tests/conftest.py)."""
    try:
        import jax
        plat = os.environ.get("JAX_PLATFORMS")
        if plat:
            jax.config.update("jax_platforms", plat)
        import jax.numpy as jnp
        jax.devices()
        jnp.ones((8,), jnp.float32).sum().block_until_ready()
    except Exception as e:
        print("BACKEND_INIT_FAILED: " + repr(e)[:300], file=sys.stderr)
        sys.exit(RC_BACKEND)


def _child(section, progress_path):
    _probe_backend()
    import redisearch_tpu as rs
    rs.enable_compilation_cache()
    done = _load_progress(progress_path)
    emit = _make_emitter(progress_path)
    errored = False
    if section == "text":
        ix, errored = bench_bm25(
            emit, done, B=512 if _SMOKE else 8192,
            iters=2 if _SMOKE else 8)
        # deep batch: the aggregate executor chunks >1024-query batches
        # into <=1024-query kernel calls INSIDE one program, so B=4096
        # still costs ONE dispatch — amortizing the ~100 ms per-dispatch
        # link overhead that capped the B=1024 run at ~9k QPS
        aggB = 64 if _SMOKE else 4096
        starB = 8 if _SMOKE else 64
        for key, fn, tag in (
                ("agg_groupby_qps",
                 lambda ix: bench_agg(ix, B=aggB), "agg"),
                ("agg_star_qps",
                 lambda ix: bench_agg_star(ix, B=starB), "agg_star")):
            if key in done:
                continue
            try:
                emit(key, fn(ix))
            except Exception as e:
                import traceback
                traceback.print_exc()
                emit(tag + "_error", repr(e)[:160])
                errored = True
    elif section == "fknn":
        ix, errored = bench_filtered_knn(
            emit, done, n_docs=20_000 if _SMOKE else 500_000,
            B=64 if _SMOKE else 512, iters=2 if _SMOKE else 6)
        errored |= bench_hybrid(ix, emit, done,
                                B=64 if _SMOKE else 1024,
                                iters=2 if _SMOKE else 4)
    elif section == "ann":
        try:
            errored = bench_ann(
                emit, done, n=100_000 if _SMOKE else 1_000_000)
        except Exception as e:
            import traceback
            traceback.print_exc()
            emit("ann_error", repr(e)[:160])
            errored = True
    elif section == "knn":
        if "flat_knn_qps" not in done:
            try:
                qps, rec = bench_knn()
                emit("flat_knn_qps", qps)
                emit("flat_knn_recall", rec)
            except Exception as e:
                import traceback
                traceback.print_exc()
                emit("knn_error", repr(e)[:160])
                errored = True
    else:
        raise SystemExit(f"unknown section {section!r}")
    sys.exit(RC_PARTIAL if errored else 0)


def _run_section(name, progress_path, timeout_s):
    import subprocess
    cmd = [sys.executable, os.path.abspath(__file__),
           "--section", name, "--progress", progress_path]
    try:
        r = subprocess.run(cmd, timeout=timeout_s)
        return r.returncode
    except subprocess.TimeoutExpired:
        return "timeout"


def _wait_for_backend(deadline):
    """Cheap parent-level gate: a tiny child that only inits the backend.
    A hung TPU tunnel otherwise burns a whole section timeout per
    attempt; this probe costs at most ~360 s per try and backs off
    until either the backend answers or ~half the budget is gone."""
    import subprocess
    code = ("import bench, sys; bench._probe_backend(); sys.exit(0)")
    attempt = 0
    while True:
        attempt += 1
        left = deadline - time.time()
        if left < 120:
            return False
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                timeout=min(360, left / 2))
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"backend probe attempt {attempt} failed; backing off",
              file=sys.stderr)
        time.sleep(min(30 * attempt, 120))


def main():
    t_start = time.time()
    deadline = t_start + float(os.environ.get("BENCH_DEADLINE_S", 4800))
    run_id = os.environ.get("BENCH_PROGRESS_TAG", str(os.getpid()))
    section_rc = {}
    progress = {}
    backend_ok = _wait_for_backend(deadline)
    if not backend_ok:
        print("backend never came up; emitting empty scoreboard",
              file=sys.stderr)
        _assemble({}, {"backend": "unavailable"})
        return
    for name, tmo in SECTIONS:
        ppath = f"/tmp/rsbench_{run_id}_{name}.progress"
        rc = None
        for attempt in range(4):
            left = deadline - time.time()
            if left < 60:
                rc = "deadline" if rc is None else rc
                break
            rc = _run_section(name, ppath, min(tmo, left))
            if rc == 0:
                break
            # flaky backend / crash / partial: back off, fresh process,
            # resume past the sub-results already in the progress file
            time.sleep(min(20 * (attempt + 1),
                           30 if rc == RC_PARTIAL else 120))
        section_rc[name] = rc
        progress.update(_load_progress(ppath))
    _assemble(progress, section_rc)


def _assemble(p, section_rc):
    extra = {}

    def put(dst, src):
        if src in p:
            extra[dst] = p[src]
        elif src + "_error" in p:
            extra[dst + "_error"] = p[src + "_error"]

    put("bm25_phrase_qps", "bm25__phrase")
    put("bm25_and2_tag_qps", "bm25__and2_tag")
    extra["bm25_mix_qps"] = {k: p["bm25__" + k] for k in
                             ("and3", "or2", "not2", "opt2", "fields2")
                             if "bm25__" + k in p}
    put("bm25_build_docs_per_s", "bm25_build_docs_per_s")
    put("kernel_hit_pct", "kernel_hit_pct")
    if "agg_groupby_qps" in p:
        extra["agg_groupby_qps"] = p["agg_groupby_qps"]
        extra["agg_vs_baseline"] = round(
            p["agg_groupby_qps"] / AGG_BASELINE_QPS, 2)
    elif "agg_error" in p:
        extra["agg_error"] = p["agg_error"]
    if "agg_star_qps" in p:
        extra["agg_star_qps"] = p["agg_star_qps"]
        extra["agg_star_vs_baseline"] = round(
            p["agg_star_qps"] / AGG_STAR_BASELINE_QPS, 2)
    elif "agg_star_error" in p:
        extra["agg_star_error"] = p["agg_star_error"]
    if "flat_knn_qps" in p:
        extra["flat_knn_qps"] = p["flat_knn_qps"]
        extra["flat_knn_vs_baseline"] = round(
            p["flat_knn_qps"] / KNN_BASELINE_QPS, 2)
        if "flat_knn_recall" in p:
            extra["flat_knn_recall"] = p["flat_knn_recall"]
    elif "knn_error" in p:
        extra["knn_error"] = p["knn_error"]
    fk = {k: p["fknn__" + k] for k in ("fulltext", "numeric", "tag")
          if "fknn__" + k in p}
    if fk:
        extra["filtered_knn_qps"] = fk
        extra["filtered_knn_vs_baseline"] = {
            k: round(v / FKNN_BASELINE_QPS, 2) for k, v in fk.items()}
    put("ann_qps_at_r95", "ann_qps_at_r95")
    put("ann_sweep", "ann_sweep")
    put("ann_error", "ann_error")
    hy = {k: p["hybrid__" + k] for k in ("rrf", "linear")
          if "hybrid__" + k in p}
    if hy:
        extra["hybrid_qps"] = hy
        extra["hybrid_vs_baseline"] = {
            k: round(v / HYBRID_BASELINE_QPS, 2) for k, v in hy.items()}
    for k, v in p.items():   # surface any leftover sub-bench errors
        if k.endswith("_error") and k not in extra \
                and not k.startswith(("bm25__", "fknn__", "hybrid__")):
            extra[k] = v
    bad = {k: v for k, v in section_rc.items() if v != 0}
    if bad:
        extra["section_rc"] = bad

    and2 = p.get("bm25__and2")
    print(json.dumps({
        "metric": "BM25 AND-2 top-10 QPS (1M zipf docs, batch 8192)",
        "value": and2 if and2 is not None else 0.0,
        "unit": "qps",
        "vs_baseline": round((and2 or 0.0) / BM25_BASELINE_QPS, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    if "--section" in sys.argv:
        i = sys.argv.index("--section")
        sec = sys.argv[i + 1]
        j = sys.argv.index("--progress")
        _child(sec, sys.argv[j + 1])
    else:
        main()
