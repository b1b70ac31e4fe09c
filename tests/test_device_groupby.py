"""Device GROUPBY fast path: parity with the host pipeline."""

import numpy as np
import pytest

import redisearch_tpu as rs
from redisearch_tpu.agg.pipeline import (DESC, AggregateRequest,
                                         _try_device_group)
from redisearch_tpu.query.engine import QueryOptions


@pytest.fixture(scope="module")
def idx():
    ix = rs.SearchIndex(rs.Schema(name="dg", fields=[
        rs.Field("t", rs.FieldType.TEXT),
        rs.Field("cat", rs.FieldType.TAG, sortable=True),
        rs.Field("x", rs.FieldType.NUMERIC, sortable=True),
        rs.Field("y", rs.FieldType.NUMERIC)]))
    rng = np.random.default_rng(11)
    cats = [f"c{i}" for i in range(17)]
    for i in range(3000):
        ix.add_document(f"d{i}", {
            "t": "odd" if i % 2 else "even",
            "cat": cats[int(rng.integers(17))],
            "x": float(rng.integers(0, 1000)),
            "y": float(rng.integers(0, 50))})
    ix.commit()
    return ix


def _host_rows(ix, req):
    """Force the host pipeline by bypassing the fast path."""
    from redisearch_tpu.agg import pipeline as P
    orig = P._try_device_group
    P._try_device_group = lambda *a, **k: None
    try:
        return ix.aggregate(req).rows
    finally:
        P._try_device_group = orig


def _bykey(rows):
    return {r["cat"]: {k: v for k, v in r.items() if k != "cat"}
            for r in rows}


def test_device_path_taken(idx):
    req = AggregateRequest("*").group_by("@cat", ("COUNT", [], "n"))
    cq = idx.compile(idx.parse_query("*"), QueryOptions())
    assert _try_device_group(idx, req, cq) is not None


def test_device_matches_host_all_reducers(idx):
    def mk():
        return AggregateRequest("*").group_by(
            "@cat",
            ("COUNT", [], "n"),
            ("SUM", ["@x"], "sx"),
            ("AVG", ["@x"], "ax"),
            ("MIN", ["@x"], "mnx"),
            ("MAX", ["@x"], "mxx"),
            ("STDDEV", ["@x"], "sdx"),
            ("SUM", ["@y"], "sy"))
    dev = _bykey(idx.aggregate(mk()).rows)
    host = _bykey(_host_rows(idx, mk()))
    assert dev.keys() == host.keys()
    for cat in host:
        for k in host[cat]:
            assert abs(dev[cat][k] - host[cat][k]) < 1e-3 * max(
                1.0, abs(host[cat][k])), (cat, k, dev[cat][k], host[cat][k])


def test_device_path_with_query_filter(idx):
    def mk():
        return (AggregateRequest("even")
                .group_by("@cat", ("COUNT", [], "n"),
                          ("AVG", ["@x"], "a"))
                .sort_by(("@n", DESC)).limit(0, 5))
    dev = idx.aggregate(mk()).rows
    host = _host_rows(idx, mk())
    assert [r["cat"] for r in dev] == [r["cat"] for r in host]
    for d, h in zip(dev, host):
        assert d["n"] == h["n"]
        assert abs(d["a"] - h["a"]) < 1e-3


def test_fallback_for_unsupported_shapes(idx):
    # TOLIST is not algebraic -> host path (still correct)
    req = AggregateRequest("*").group_by("@cat", ("TOLIST", ["@x"], "l"))
    cq = idx.compile(idx.parse_query("*"), QueryOptions())
    assert _try_device_group(idx, req, cq) is None
    rows = idx.aggregate(req).rows
    assert len(rows) == 17


# ---------------------------------------------------------------------------
# Round-2 extensions: multi-key groups, numeric group keys, and compiled
# APPLY/FILTER pre-steps (VERDICT r1 item 7)
# ---------------------------------------------------------------------------


def _cmp_rows(dev, host, keys):
    dk = {tuple(r.get(k) for k in keys): r for r in dev}
    hk = {tuple(r.get(k) for k in keys): r for r in host}
    assert dk.keys() == hk.keys(), (
        sorted(dk.keys() - hk.keys())[:3], sorted(hk.keys() - dk.keys())[:3])
    for key, hr in hk.items():
        dr = dk[key]
        for k, v in hr.items():
            if isinstance(v, float):
                assert abs(dr[k] - v) < 1e-3 * max(1.0, abs(v)), \
                    (key, k, dr[k], v)
            else:
                assert dr[k] == v, (key, k)


def test_multikey_device_group(idx):
    def mk():
        return AggregateRequest("*").group_by(
            ["@cat", "@y"], ("COUNT", [], "n"), ("SUM", ["@x"], "sx"))
    cq = idx.compile(idx.parse_query("*"), QueryOptions())
    from redisearch_tpu.agg.pipeline import _device_group_submit
    assert _device_group_submit(idx, mk(), cq) is not None
    dev = idx.aggregate(mk()).rows
    host = _host_rows(idx, mk())
    _cmp_rows(dev, host, ["cat", "y"])


def test_multikey_requires_sortable_text(idx):
    # "@t" is TEXT but NOT sortable -> host fallback, still correct
    req = AggregateRequest("*").group_by(
        ["@cat", "@t"], ("COUNT", [], "n"))
    cq = idx.compile(idx.parse_query("*"), QueryOptions())
    from redisearch_tpu.agg.pipeline import _device_group_submit
    # just verify result parity whichever path ran
    dev = idx.aggregate(req).rows
    host = _host_rows(idx, AggregateRequest("*").group_by(
        ["@cat", "@t"], ("COUNT", [], "n")))
    _cmp_rows(dev, host, ["cat", "t"])


def test_numeric_key_device_group(idx):
    def mk():
        return AggregateRequest("*").group_by(
            ["@y"], ("COUNT", [], "n"), ("AVG", ["@x"], "ax"))
    cq = idx.compile(idx.parse_query("*"), QueryOptions())
    from redisearch_tpu.agg.pipeline import _device_group_submit
    assert _device_group_submit(idx, mk(), cq) is not None
    dev = idx.aggregate(mk()).rows
    host = _host_rows(idx, mk())
    _cmp_rows(dev, host, ["y"])


def test_apply_filter_compiled_pre_steps(idx):
    def mk():
        return (AggregateRequest("*")
                .apply("@x * 2 + @y", "z")
                .filter("@x >= 100 && @y < 40")
                .group_by("@cat", ("COUNT", [], "n"),
                          ("SUM", ["@z"], "sz"),
                          ("MAX", ["@z"], "mz"))
                .sort_by(("@sz", DESC)))
    cq = idx.compile(idx.parse_query("*"), QueryOptions())
    from redisearch_tpu.agg.pipeline import _device_group_submit
    assert _device_group_submit(idx, mk(), cq) is not None
    dev = idx.aggregate(mk()).rows
    host = _host_rows(idx, mk())
    _cmp_rows(dev, host, ["cat"])


def test_apply_math_functions_device(idx):
    def mk():
        return (AggregateRequest("*")
                .apply("floor(sqrt(@x))", "r")
                .group_by("@cat", ("SUM", ["@r"], "sr"),
                          ("AVG", ["@r"], "ar")))
    cq = idx.compile(idx.parse_query("*"), QueryOptions())
    from redisearch_tpu.agg.pipeline import _device_group_submit
    assert _device_group_submit(idx, mk(), cq) is not None
    dev = idx.aggregate(mk()).rows
    host = _host_rows(idx, mk())
    _cmp_rows(dev, host, ["cat"])


def test_filter_division_null_semantics(idx):
    # x / (y - y) -> division by zero -> NULL -> filtered rows keep
    # host semantics (NULL is not truthy)
    def mk():
        return (AggregateRequest("*")
                .filter("@x / (@y - @y) || @x > 500")
                .group_by("@cat", ("COUNT", [], "n")))
    dev = idx.aggregate(mk()).rows
    host = _host_rows(idx, mk())
    _cmp_rows(dev, host, ["cat"])


def test_string_apply_falls_back(idx):
    req = (AggregateRequest("*")
           .apply("upper(@cat)", "u")
           .group_by("@cat", ("COUNT", [], "n")))
    cq = idx.compile(idx.parse_query("*"), QueryOptions())
    from redisearch_tpu.agg.pipeline import _device_group_submit
    assert _device_group_submit(idx, req, cq) is None
    host = _host_rows(idx, req)
    dev = idx.aggregate((AggregateRequest("*")
                         .apply("upper(@cat)", "u")
                         .group_by("@cat", ("COUNT", [], "n")))).rows
    _cmp_rows(dev, host, ["cat"])


# ---------------------------------------------------------------------------
# Round-3: batched aggregate serving (run_aggregate_many lax.scan path)
# ---------------------------------------------------------------------------

def test_run_aggregate_many_matches_single(idx):
    """Batched same-shape GROUPBYs (one scanned program per segment)
    must return exactly what sequential run_aggregate does."""
    from redisearch_tpu.agg.pipeline import run_aggregate, \
        run_aggregate_many

    def mk(q):
        return (AggregateRequest(q)
                .group_by("@cat", ("COUNT", [], "n"),
                          ("SUM", ["@x"], "sx"),
                          ("MIN", ["@x"], "mn"),
                          ("MAX", ["@x"], "mx"))
                .sort_by(("@cat", DESC)))
    reqs = [mk("even"), mk("odd"), mk("even"), mk("odd"), mk("even")]
    batched = run_aggregate_many(idx, reqs)
    singles = [run_aggregate(idx, mk(q))
               for q in ("even", "odd", "even", "odd", "even")]
    for b, s in zip(batched, singles):
        assert b.total == s.total
        assert len(b.rows) == len(s.rows)
        for rb, rs_ in zip(b.rows, s.rows):
            assert rb.keys() == rs_.keys()
            for k in rb:
                va, vb = rb[k], rs_[k]
                if isinstance(va, float):
                    assert abs(va - vb) < 1e-3 * max(1.0, abs(vb))
                else:
                    assert va == vb


def test_run_aggregate_many_mixed_shapes(idx):
    """A batch mixing device-eligible, differently-shaped, and host-only
    plans must split into groups + fallbacks and stay correct."""
    from redisearch_tpu.agg.pipeline import run_aggregate, \
        run_aggregate_many

    reqs = [
        AggregateRequest("*").group_by("@cat", ("COUNT", [], "n")),
        AggregateRequest("even").group_by(
            "@cat", ("AVG", ["@x"], "a")).limit(0, 3),
        AggregateRequest("*").group_by("@cat", ("TOLIST", ["@x"], "l")),
        AggregateRequest("*").group_by("@cat", ("COUNT", [], "n")),
    ]
    batched = run_aggregate_many(idx, reqs)
    singles = [run_aggregate(idx, r) for r in reqs]
    for b, s in zip(batched, singles):
        assert b.total == s.total
        bk = sorted(map(str, ({str(k): (round(v, 3) if isinstance(
            v, float) else str(sorted(v)) if isinstance(v, list) else v)
            for k, v in r.items()} for r in b.rows)), key=str)
        sk = sorted(map(str, ({str(k): (round(v, 3) if isinstance(
            v, float) else str(sorted(v)) if isinstance(v, list) else v)
            for k, v in r.items()} for r in s.rows)), key=str)
        assert bk == sk


def test_device_groupby_not_stale_after_delete():
    """A device GROUPBY program compiled on a clean segment must NOT be
    reused after delete_document marks docs deleted (regression: the
    compile-cache key omitted deletion state and counted deleted docs)."""
    from redisearch_tpu.agg.pipeline import run_aggregate, \
        run_aggregate_many

    ix = rs.SearchIndex(rs.Schema(name="dgs", fields=[
        rs.Field("t", rs.FieldType.TEXT),
        rs.Field("cat", rs.FieldType.TAG, sortable=True),
        rs.Field("x", rs.FieldType.NUMERIC, sortable=True)]))
    for i in range(300):
        ix.add_document(f"d{i}", {"t": "w", "cat": f"c{i % 5}",
                                  "x": float(i)})
    ix.commit()

    def mk():
        return AggregateRequest("*").group_by(
            "@cat", ("COUNT", [], "n"), ("SUM", ["@x"], "s"))
    # compile + run both the single and batched executors pre-delete
    pre_b = run_aggregate_many(ix, [mk(), mk()])
    pre_s = run_aggregate(ix, mk())
    assert pre_s.total == pre_b[0].total == 300
    ix.delete_document("d0")
    ix.delete_document("d5")
    ix.commit()
    post_b = run_aggregate_many(ix, [mk(), mk()])
    post_s = run_aggregate(ix, mk())
    assert post_s.total == 298
    assert post_b[0].total == 298 and post_b[1].total == 298
    n_c0 = {r["cat"]: r["n"] for r in post_b[0].rows}["c0"]
    assert n_c0 == 58.0    # 60 - the two deleted c0 docs


def test_kernel_groupby_interpret_matches_host():
    """The kernel-raw GROUPBY path (Pallas intersection raw windows +
    posting-aligned column slices + batched one-hot aggregation) must
    match the host pipeline exactly.  Forced via interpret mode — on
    plain CPU the path is gated off (_use_pallas) and the lax.scan
    window path runs instead."""
    import jax
    from redisearch_tpu.ops import groupby as GB
    from redisearch_tpu.ops import intersect as IK
    from redisearch_tpu.agg.pipeline import (run_aggregate,
                                             run_aggregate_many)

    rng = np.random.default_rng(23)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    ix = rs.SearchIndex(rs.Schema(name="kgb", fields=[
        rs.Field("t", rs.FieldType.TEXT),
        rs.Field("cat", rs.FieldType.TAG, sortable=True),
        rs.Field("x", rs.FieldType.NUMERIC, sortable=True)]))
    for i in range(900):
        ix.add_document(f"d{i}", {
            "t": " ".join(rng.choice(words, 3)),
            "cat": f"c{i % 7}",
            "x": float(rng.normal(50, 20))})
    ix.commit()

    def mk(q):
        return (AggregateRequest(q)
                .group_by("@cat", ("COUNT", [], "n"),
                          ("SUM", ["@x"], "sx"), ("AVG", ["@x"], "ax"),
                          ("STDDEV", ["@x"], "dx"))
                .sort_by(("@cat", DESC)))

    queries = ["alpha beta", "beta gamma", "alpha -beta", "alpha beta",
               "gamma delta", "alpha ~eps"]
    singles = [run_aggregate(ix, mk(q)) for q in queries]

    IK._INTERPRET = True
    GB._INTERPRET = True
    jax.clear_caches()
    try:
        batched = run_aggregate_many(ix, [mk(q) for q in queries])
    finally:
        IK._INTERPRET = False
        GB._INTERPRET = False
        jax.clear_caches()
    for q, b, s in zip(queries, batched, singles):
        assert b.total == s.total, (q, b.total, s.total)
        assert len(b.rows) == len(s.rows), q
        for rb, rs_ in zip(b.rows, s.rows):
            assert rb.keys() == rs_.keys()
            for k in rb:
                va, vb = rb[k], rs_[k]
                if isinstance(va, float):
                    assert abs(va - vb) <= 2e-3 * max(1.0, abs(vb)), (
                        q, k, va, vb)
                else:
                    assert va == vb, (q, k, va, vb)


def test_apply_alias_group_key_on_device(idx):
    """Computed (APPLY-alias) group keys run on the device path and
    match the host pipeline (reference: group_by.c hashes computed
    RSValues per row; here the expression column is dict-encoded once
    per segment, _alias_key_encoding)."""
    def mk():
        return (AggregateRequest("*")
                .apply("floor(@x / 100)", "bucket")
                .group_by("@bucket", ("COUNT", [], "n"),
                          ("SUM", ["@y"], "sy"))
                .sort_by(("@sy", DESC)).limit(0, 5))

    cq = idx.compile(idx.parse_query("*"), QueryOptions())
    assert _try_device_group(idx, mk(), cq) is not None  # device-eligible
    dev = idx.aggregate(mk()).rows
    host = _host_rows(idx, mk())
    assert len(dev) == len(host) == 5
    for d, h in zip(dev, host):
        assert float(d["bucket"]) == float(h["bucket"])
        assert d["n"] == h["n"]
        assert abs(d["sy"] - h["sy"]) < 1e-3 * max(1.0, abs(h["sy"]))


def test_apply_alias_key_chained_and_filtered(idx):
    """Alias-of-alias keys + FILTER pre-steps stay device-eligible."""
    def mk():
        return (AggregateRequest("odd")
                .apply("@x / 10", "a")
                .apply("floor(@a / 10)", "bucket")
                .filter("@y < 40")
                .group_by("@bucket", ("COUNT", [], "n"),
                          ("AVG", ["@x"], "ax"))
                .sort_by(("@n", DESC)).limit(0, 8))

    cq = idx.compile(idx.parse_query("odd"), QueryOptions())
    assert _try_device_group(idx, mk(), cq) is not None
    dev = idx.aggregate(mk()).rows
    host = _host_rows(idx, mk())
    assert [r["bucket"] for r in dev] == [r["bucket"] for r in host]
    for d, h in zip(dev, host):
        assert d["n"] == h["n"]
        assert abs(d["ax"] - h["ax"]) < 1e-3 * max(1.0, abs(h["ax"]))


def test_agg_path_stats_counter(idx):
    from redisearch_tpu.agg import pipeline as P
    from redisearch_tpu.agg.pipeline import run_aggregate_many

    P.AGG_PATH_STATS.clear()
    reqs = [AggregateRequest("*")
            .group_by("@cat", ("COUNT", [], "n"))
            .sort_by(("@n", DESC)).limit(0, 3) for _ in range(4)]
    run_aggregate_many(idx, reqs)
    # TOLIST is not algebraic -> host
    run_aggregate_many(idx, [
        AggregateRequest("*").group_by("@cat", ("TOLIST", ["@x"], "l"))])
    stats = dict(P.AGG_PATH_STATS)
    dev = stats.get("device", 0) + stats.get("device-tail", 0)
    assert dev == 4, stats
    assert stats.get("host", 0) == 1, stats
