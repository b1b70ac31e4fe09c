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
