"""Pallas intersection mega-kernel (ops/intersect.py): eligibility,
exact parity with the scan path, and the XLA fallback semantics.

On CPU the kernel routes to its pure-XLA implementation; the Pallas
lowering itself is cross-checked against that implementation on TPU
(0 mismatches / 1024 random windows at build time)."""

import numpy as np
import pytest

import redisearch_tpu as rs
from redisearch_tpu.query.engine import (QueryOptions, _kernel_plan,
                                         execute, execute_batch)


@pytest.fixture(scope="module")
def idx():
    rng = np.random.default_rng(17)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "omega"]
    ix = rs.SearchIndex(rs.Schema(name="ik", fields=[
        rs.Field("a", rs.FieldType.TEXT, weight=2.0),
        rs.Field("b", rs.FieldType.TEXT)]))
    for i in range(800):
        ix.add_document(f"d{i}", {
            "a": " ".join(rng.choice(words, 4)),
            "b": " ".join(rng.choice(words, 7))})
    ix.commit()
    return ix


def _plan_for(ix, q, verbatim=True):
    cq = ix.prepare(q, None, QueryOptions(k=10, verbatim=verbatim), 2)
    seg = ix.segments[0]
    binding, P = cq.bind(seg)
    bk = binding.dyn.get("_buckets") or {}
    from redisearch_tpu.index.segment import next_pow2
    return _kernel_plan(cq, seg, bk, 16)


def test_kernel_plan_eligibility(idx):
    # verbatim single-slot terms -> eligible
    assert _plan_for(idx, "alpha beta", True) is not None
    assert _plan_for(idx, "alpha -beta", True) is not None
    assert _plan_for(idx, "alpha ~beta", True) is not None
    assert _plan_for(idx, "alpha", True) is not None
    # unions are eligible too (single multi-slot group)
    pl_or = _plan_for(idx, "alpha | beta", True)
    assert pl_or is not None
    _slots, _ws, groups, _pg, _aux, _dense, _dmeta = pl_or
    assert len(groups) == 1 and len(groups[0][1]) == 2
    # phrase / other scorers -> not eligible
    assert _plan_for(idx, '"alpha beta"', True) is None
    cq = idx.prepare("alpha beta", None,
                     QueryOptions(k=10, scorer="TFIDF", verbatim=True), 2)
    seg = idx.segments[0]
    b, _ = cq.bind(seg)
    assert _kernel_plan(cq, seg, b.dyn["_buckets"], 16) is None


QUERIES = ["alpha beta", "alpha -beta", "alpha ~beta", "alpha",
           "gamma delta eps", "omega -alpha", "zeta beta",
           "alpha | beta", "gamma | delta | eps", "omega | omega"]


def test_kernel_matches_scan_path(idx, monkeypatch):
    seg = idx.segments[0]
    cqs = [idx.prepare(q, None, QueryOptions(k=10, verbatim=True), 2)
           for q in QUERIES for _ in range(3)]
    got = execute_batch(cqs, seg, 10)
    for cq, g in zip(cqs, got):
        want = execute(cq, seg, 10)   # single-query scan path
        assert g.count == want.count, cq
        gd = [(int(d), round(float(s), 4))
              for d, s in zip(g.local_idx, g.scores) if s > -3.3e38]
        wd = [(int(d), round(float(s), 4))
              for d, s in zip(want.local_idx, want.scores)
              if s > -3.3e38]
        assert gd == wd[:len(gd)] and len(gd) >= min(
            want.count, 10), (gd[:3], wd[:3])


def test_kernel_disabled_env(idx, monkeypatch):
    monkeypatch.setenv("RS_TPU_NO_INTERSECT_KERNEL", "1")
    assert _plan_for(idx, "alpha beta", True) is None


def test_kernel_with_stemmed_queries_matches(idx):
    """Non-verbatim english queries: stem expansion produces multi-slot
    groups when stems exist; for these synthetic words stems equal the
    token so groups stay single-slot — whatever the plan decides, the
    results must match the scan path."""
    seg = idx.segments[0]
    cqs = [idx.prepare(q, None, QueryOptions(k=10), 2)
           for q in ["alpha beta", "omega -zeta"]]
    got = execute_batch(cqs, seg, 10)
    for cq, g in zip(cqs, got):
        want = execute(cq, seg, 10)
        assert g.count == want.count
        assert list(g.local_idx) == \
            list(want.local_idx)[:len(g.local_idx)]


def test_filtered_knn_batched_underfill_refires_exact():
    """Batched filtered KNN skips the in-graph exact fallback; queries
    whose filter survivors miss the dense top-M are re-run exactly on
    the host. A highly selective filter over a big corpus forces it."""
    rng = np.random.default_rng(5)
    ix = rs.SearchIndex(rs.Schema(name="uf", fields=[
        rs.Field("t", rs.FieldType.TEXT),
        rs.Field("v", rs.FieldType.VECTOR,
                 vector=rs.VectorParams(dim=8,
                                        metric=rs.VectorMetric.L2))]))
    docs = []
    for i in range(16500):
        tok = "needle" if i % 3300 == 0 else f"hay{i % 97}"
        docs.append((f"d{i}", {"t": f"{tok} filler",
                               "v": rng.normal(size=8).astype(np.float32)}))
    ix.add_documents(docs)
    seg = ix.segments[0]
    q = "(needle)=>[KNN 10 @v $b]"
    cqs = [ix.prepare(q, {"b": rng.normal(size=8).astype(np.float32)},
                      QueryOptions(k=10), 2) for _ in range(4)]
    got = execute_batch(cqs, seg, 10)
    for cq, g in zip(cqs, got):
        want = execute(cq, seg, 10)
        gd = [(int(d), round(float(x), 4))
              for d, x in zip(g.local_idx, g.knn_dists) if x < 3.3e38]
        wd = [(int(d), round(float(x), 4))
              for d, x in zip(want.local_idx, want.knn_dists)
              if x < 3.3e38]
        assert gd == wd[:len(gd)] and len(gd) >= min(
            want.count, 10)
        assert len(gd) == 5   # 5 needle docs


def test_kernel_big_member_window():
    """A rare pivot term may intersect against an ultra-common member
    whose window exceeds MAX_W_PIVOT (it only occupies VMEM); a query
    whose only REQ group is itself ultra-common must fall back."""
    from redisearch_tpu.ops import intersect as IK
    rng = np.random.default_rng(41)
    ix = rs.SearchIndex(rs.Schema(name="bigm", fields=[
        rs.Field("t", rs.FieldType.TEXT)]))
    docs = []
    for i in range(40000):
        toks = ["common"]
        if rng.random() < 0.004:
            toks.append("rare")
        toks.append(f"hay{i % 53}")
        docs.append((f"d{i}", {"t": " ".join(toks)}))
    ix.add_documents(docs)
    seg = ix.segments[0]

    def plan(q):
        cq = ix.prepare(q, None, QueryOptions(k=10, verbatim=True), 2)
        b, _ = cq.bind(seg)
        return cq, _kernel_plan(cq, seg, b.dyn["_buckets"], 16)

    cq_rc, pl = plan("rare common")
    assert pl is not None
    slots, ws, groups, pivot_g, _aux, _dense, _dmeta = pl
    assert max(ws) > IK.MAX_W_PIVOT          # the common member window
    assert all(ws[j] <= IK.MAX_W_PIVOT for j in groups[pivot_g][1])
    # ultra-common term as the only REQ group -> no eligible pivot
    _, pl_c = plan("common")
    assert pl_c is None
    _, pl_cn = plan("common -rare")
    assert pl_cn is None
    # results must match the scan path exactly
    cqs = [ix.prepare("rare common", None,
                      QueryOptions(k=10, verbatim=True), 2)
           for _ in range(2)]
    got = execute_batch(cqs, seg, 10)
    for cq, g in zip(cqs, got):
        want = execute(cq, seg, 10)
        assert g.count == want.count
        gd = [(int(d), round(float(s), 4))
              for d, s in zip(g.local_idx, g.scores) if s > -3.3e38]
        wd = [(int(d), round(float(s), 4))
              for d, s in zip(want.local_idx, want.scores)
              if s > -3.3e38]
        assert gd == wd[:len(gd)] and len(gd) >= min(
            want.count, 10)


def test_kernel_multislot_stem_groups():
    """Natural-language AND queries: each token group carries (token,
    +stem, stem) slots; the kernel handles multi-slot groups with
    OR-within-group semantics, matching the scan path exactly."""
    rng = np.random.default_rng(23)
    ix = rs.SearchIndex(rs.Schema(name="stg", fields=[
        rs.Field("t", rs.FieldType.TEXT)]))
    vocab = ["running", "runs", "jumped", "jumping", "quickly",
             "quicker", "walker", "walking", "talked", "talking"]
    for i in range(600):
        ix.add_document(f"d{i}", {
            "t": " ".join(rng.choice(vocab, 5))})
    ix.commit()
    seg = ix.segments[0]
    queries = ["running jumping", "walking -talking", "runs ~quickly",
               "jumped", "running | walking", "talked quicker"]
    cqs = [ix.prepare(q, None, QueryOptions(k=10), 2)
           for q in queries for _ in range(2)]
    # at least one of these must take the kernel plan (multi-slot groups)
    from redisearch_tpu.index.segment import next_pow2
    planned = 0
    for q in queries:
        cq = ix.prepare(q, None, QueryOptions(k=10), 2)
        b, _ = cq.bind(seg)
        if _kernel_plan(cq, seg, b.dyn["_buckets"], 16) is not None:
            planned += 1
    assert planned >= 4, planned
    got = execute_batch(cqs, seg, 10)
    for cq, g in zip(cqs, got):
        want = execute(cq, seg, 10)
        assert g.count == want.count, cq
        gd = [(int(d), round(float(s), 4))
              for d, s in zip(g.local_idx, g.scores) if s > -3.3e38]
        wd = [(int(d), round(float(s), 4))
              for d, s in zip(want.local_idx, want.scores)
              if s > -3.3e38]
        assert gd == wd[:len(gd)] and len(gd) >= min(
            want.count, 10), (gd[:3], wd[:3])


@pytest.fixture(scope="module")
def tag_idx():
    rng = np.random.default_rng(23)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "omega"]
    ix = rs.SearchIndex(rs.Schema(name="iktag", fields=[
        rs.Field("a", rs.FieldType.TEXT),
        rs.Field("color", rs.FieldType.TAG),
        rs.Field("labels", rs.FieldType.TAG)]))
    for i in range(1500):
        ix.add_document(f"d{i}", {
            "a": " ".join(rng.choice(words, 6)),
            "color": "rgb"[i % 3],
            "labels": ",".join({"xy"[i % 2], "yz"[(i * 3 + 1) % 2]})})
    ix.commit()
    return ix


TAG_QUERIES = [
    "alpha beta @color:{r}",
    "alpha @color:{r|g}",
    "alpha beta -@color:{b}",
    "alpha @color:{r} @labels:{x}",      # two tag fields (two aux arrays)
    "alpha @color:{nosuchvalue}",        # empty tag window
    "alpha ~@color:{g}",                 # optional tag
]


def test_kernel_plan_tag_groups(tag_idx):
    """Intersections with TAG leaves are kernel-eligible: single-valued
    fields become DENSE posting-aligned code predicates, multi-valued
    fields keep the member-window (aux doc-window) path; tag-only or
    union trees stay on the XLA path."""
    pl = _plan_for(tag_idx, "alpha beta @color:{r}", True)
    assert pl is not None
    _descs, _ws, groups, _pg, aux, dense, _dm = pl
    assert dense and aux and aux[0].endswith("_pcodes")
    # multi-valued labels field -> member-window group
    pl2 = _plan_for(tag_idx, "alpha beta @labels:{x}", True)
    assert pl2 is not None
    _d2, _w2, groups2, _pg2, aux2, dense2, _dm2 = pl2
    assert not dense2 and aux2 and aux2[0].endswith("_docs")
    assert any(len(g) > 2 and g[2] >= 0 for g in groups2)
    # a tag cannot pivot: tag-only query is ineligible
    assert _plan_for(tag_idx, "@color:{r}", True) is None


def test_kernel_tag_groups_match_scan_path(tag_idx, monkeypatch):
    """Batched (kernel XLA twin) == single-query scan path for text+tag
    intersections: docs, scores, counts."""
    ix = tag_idx
    seg = ix.segments[0]
    cqs = [ix.prepare(q, None, QueryOptions(k=10, verbatim=True), 2)
           for q in TAG_QUERIES]
    batch = execute_batch(cqs, seg, 10)
    for q, cq, bres in zip(TAG_QUERIES, cqs, batch):
        sres = execute(cq, seg, 10)
        bdocs = [int(d) for d, s in zip(bres.local_idx, bres.scores)
                 if d != 2**31 - 1 and s > -3e38][:10]
        sdocs = [int(d) for d, s in zip(sres.local_idx, sres.scores)
                 if d != 2**31 - 1 and s > -3e38][:len(bdocs)]
        assert bdocs == sdocs, q
        assert bres.count == sres.count, q
        bs = [s for s in bres.scores if s > -3e38][:len(bdocs)]
        ss = [s for s in sres.scores if s > -3e38][:len(bdocs)]
        np.testing.assert_allclose(bs, ss, rtol=1e-5, err_msg=q)


def test_dense_tag_predicate_matches_scan_path():
    """Single-valued TAG filters ride the posting-aligned dense code
    column inside the kernel plan (one window compare per pivot phase);
    results must match the scan path exactly, including NOT and
    multi-value {a|b} forms."""
    rng = np.random.default_rng(23)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    ix = rs.SearchIndex(rs.Schema(name="dtag", fields=[
        rs.Field("t", rs.FieldType.TEXT),
        rs.Field("cat", rs.FieldType.TAG)]))
    for i in range(600):
        ix.add_document(f"d{i}", {
            "t": " ".join(rng.choice(words, 5)),
            "cat": f"c{i % 7}"})
    ix.commit()
    seg = ix.segments[0]
    assert seg.tag_pcodes("cat") is not None

    def plan(q):
        cq = ix.prepare(q, None, QueryOptions(k=10, verbatim=True), 2)
        b, _ = cq.bind(seg)
        return _kernel_plan(cq, seg, b.dyn["_buckets"], 16)

    pl = plan("alpha beta @cat:{c3}")
    assert pl is not None
    _s, _w, _g, _pg, aux_keys, dense, dmeta = pl
    assert dense and aux_keys[-1].endswith("_pcodes")

    queries = ["alpha @cat:{c3}", "alpha beta @cat:{c1}",
               "alpha -@cat:{c2}", "alpha @cat:{c0|c4}",
               "alpha @cat:{missingvalue}", "alpha ~@cat:{c5}"]
    cqs = [ix.prepare(q, None, QueryOptions(k=10, verbatim=True), 2)
           for q in queries for _ in range(2)]
    got = execute_batch(cqs, seg, 10)
    for cq, g in zip(cqs, got):
        want = execute(cq, seg, 10)
        assert g.count == want.count, cq
        gd = [(int(d), round(float(s), 4))
              for d, s in zip(g.local_idx, g.scores) if s > -3.3e38]
        wd = [(int(d), round(float(s), 4))
              for d, s in zip(want.local_idx, want.scores)
              if s > -3.3e38]
        assert gd == wd[:len(gd)] and len(gd) >= min(
            want.count, 10)


def test_dense_tag_multivalue_field_falls_back():
    """A multi-valued TAG field has no dense codes column; the plan
    must keep the member-window path (or stay eligible without dense)."""
    ix = rs.SearchIndex(rs.Schema(name="mvtag", fields=[
        rs.Field("t", rs.FieldType.TEXT),
        rs.Field("cat", rs.FieldType.TAG)]))
    for i in range(300):
        ix.add_document(f"d{i}", {"t": "alpha beta",
                                  "cat": f"c{i % 5},c{(i + 1) % 5}"})
    ix.commit()
    seg = ix.segments[0]
    assert seg.tag_pcodes("cat") is None
    cq = ix.prepare("alpha beta @cat:{c3}", None,
                    QueryOptions(k=10, verbatim=True), 2)
    b, _ = cq.bind(seg)
    pl = _kernel_plan(cq, seg, b.dyn["_buckets"], 16)
    if pl is not None:
        assert not pl[5]   # no dense predicates
    got = execute_batch([cq], seg, 10)[0]
    want = execute(cq, seg, 10)
    assert got.count == want.count
    assert list(got.local_idx)[:min(got.count, 10)] == \
        list(want.local_idx)[:min(want.count, 10)]


def test_weight_zero_field_still_matches():
    """A posting in a WEIGHT 0 TEXT field carries ~0 weighted tf; the
    Pallas member pass derives hits from (tf sum > 0), so the builder
    clamps non-positive weights to an epsilon (builder._add_text).
    Docs matching a term ONLY via the weight-0 field must still satisfy
    REQ slots and trigger NOT exclusions on the kernel path (forced via
    interpret mode), identically to the scan path."""
    from redisearch_tpu.ops import intersect as IK
    import jax

    ix = rs.SearchIndex(rs.Schema(name="w0", fields=[
        rs.Field("a", rs.FieldType.TEXT, weight=0.0),
        rs.Field("b", rs.FieldType.TEXT)]))
    # d0..d39: "alpha" only in the weight-0 field a; beta in b.
    # d40..d79: both terms in b (normal weight).
    # d80..d119: beta only (control: must NOT match "alpha beta").
    for i in range(40):
        ix.add_document(f"z{i}", {"a": "alpha", "b": "beta filler"})
    for i in range(40, 80):
        ix.add_document(f"z{i}", {"b": "alpha beta filler"})
    for i in range(80, 120):
        ix.add_document(f"z{i}", {"b": "beta filler"})
    ix.commit()
    seg = ix.segments[0]

    IK._INTERPRET = True
    jax.clear_caches()
    try:
        for q, want_count in [("alpha beta", 80), ("beta -alpha", 40),
                              ("alpha", 80)]:
            cqs = [ix.prepare(q, None, QueryOptions(k=120, verbatim=True),
                              2) for _ in range(2)]
            got = execute_batch(cqs, seg, 120)
            for cq, g in zip(cqs, got):
                want = execute(cq, seg, 120)
                assert g.count == want.count == want_count, (
                    q, g.count, want.count, want_count)
                gd = sorted(int(d) for d, s in zip(g.local_idx, g.scores)
                            if s > -3.3e38)
                wd = sorted(int(d) for d, s in
                            zip(want.local_idx, want.scores)
                            if s > -3.3e38)
                assert gd == wd, q
    finally:
        IK._INTERPRET = False
        jax.clear_caches()


def test_kernel_tail_window_no_dma_overrun():
    """Windows near the END of the posting arrays: the kernel DMAs
    whole 128-lane rows (W//128 + R_EXTRA of them), which used to
    overrun the XLA SLICE pad — the clamped copy silently SHIFTED the
    member window and dropped matches (fixed by segment.posting_pad).
    Dense small corpus puts the last term's window within R_EXTRA rows
    of the array tail."""
    import jax
    from redisearch_tpu.ops import intersect as IK

    rng = np.random.default_rng(23)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    ix = rs.SearchIndex(rs.Schema(name="tw", fields=[
        rs.Field("t", rs.FieldType.TEXT)]))
    for i in range(900):
        ix.add_document(f"d{i}", {"t": " ".join(rng.choice(words, 3))})
    ix.commit()
    seg = ix.segments[0]
    IK._INTERPRET = True
    jax.clear_caches()
    try:
        # every ordered word pair: member windows land at every offset
        for a in words:
            for b in words:
                if a == b:
                    continue
                cqs = [ix.prepare(f"{a} {b}", None,
                                  QueryOptions(k=16, verbatim=True), 2)
                       for _ in range(2)]
                got = execute_batch(cqs, seg, 16)
                want = execute(cqs[0], seg, 16)
                assert got[0].count == want.count, (a, b)
    finally:
        IK._INTERPRET = False
        jax.clear_caches()
