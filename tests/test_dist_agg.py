"""Distributed aggregation: plan-split parity with single-node results
(reference: dist_plan.cpp reducer rewrites, test_cluster aggregate flows)."""

import numpy as np
import pytest

import redisearch_tpu as rs
from redisearch_tpu.agg.pipeline import DESC, AggregateRequest
from redisearch_tpu.parallel.dist import ShardedIndex, make_mesh


@pytest.fixture(scope="module")
def setup(eight_devices):
    schema = rs.Schema(name="da", fields=[
        rs.Field("name", rs.FieldType.TEXT),
        rs.Field("brand", rs.FieldType.TAG, sortable=True),
        rs.Field("price", rs.FieldType.NUMERIC, sortable=True),
    ])
    ix = rs.SearchIndex(schema)
    rng = np.random.default_rng(7)
    brands = ["alpha", "beta", "gamma", "delta"]
    for i in range(120):
        ix.add_document(f"p{i}", {
            "name": f"product {i} model{'x' if i % 2 else 'y'}",
            "brand": brands[i % 4],
            "price": float(rng.integers(1, 1000))})
    sharded = ShardedIndex.build(ix, make_mesh(8))
    return ix, sharded


def _rowmap(rows, key="brand"):
    return {r[key]: {k: v for k, v in r.items() if k != key} for r in rows}


def _approx_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return abs(a - b) < 1e-6 * max(1.0, abs(a), abs(b))
    if isinstance(a, list) and isinstance(b, list):
        return set(map(str, a)) == set(map(str, b))
    return a == b


@pytest.mark.parametrize("reducer", [
    ("COUNT", [], "r"),
    ("SUM", ["@price"], "r"),
    ("MIN", ["@price"], "r"),
    ("MAX", ["@price"], "r"),
    ("AVG", ["@price"], "r"),
    ("STDDEV", ["@price"], "r"),
    ("COUNT_DISTINCT", ["@price"], "r"),
    ("QUANTILE", ["@price", "0.5"], "r"),
    ("TOLIST", ["@price"], "r"),
])
def test_dist_reducer_parity(setup, reducer):
    ix, sharded = setup
    req_local = AggregateRequest("*").group_by("@brand", reducer)
    req_dist = AggregateRequest("*").group_by("@brand", reducer)
    local = _rowmap(ix.aggregate(req_local).rows)
    dist = _rowmap(sharded.aggregate(req_dist).rows)
    assert local.keys() == dist.keys()
    for brand in local:
        for k in local[brand]:
            assert _approx_eq(local[brand][k], dist[brand][k]), (
                reducer[0], brand, local[brand][k], dist[brand][k])


def test_dist_countdistinctish(setup):
    ix, sharded = setup
    req = AggregateRequest("*").group_by(
        "@brand", ("COUNT_DISTINCTISH", ["@price"], "c"))
    local = _rowmap(ix.aggregate(
        AggregateRequest("*").group_by(
            "@brand", ("COUNT_DISTINCT", ["@price"], "c"))).rows)
    dist = _rowmap(sharded.aggregate(req).rows)
    for brand in local:
        exact = local[brand]["c"]
        est = dist[brand]["c"]
        assert abs(est - exact) <= max(2, exact * 0.1)


def test_dist_agg_with_filter_and_tail(setup):
    ix, sharded = setup
    def mk():
        return (AggregateRequest("@brand:{alpha|beta}")
                .group_by("@brand", ("AVG", ["@price"], "avg"))
                .apply("floor(@avg)", "avg_floor")
                .sort_by(("@avg_floor", DESC)))
    local = ix.aggregate(mk())
    dist = sharded.aggregate(mk())
    assert [r["brand"] for r in local.rows] == [r["brand"]
                                                for r in dist.rows]
    assert [r["avg_floor"] for r in local.rows] == [
        r["avg_floor"] for r in dist.rows]


def test_dist_agg_no_groupby(setup):
    ix, sharded = setup
    def mk():
        return (AggregateRequest("*").load("price")
                .sort_by(("@price", DESC)).limit(0, 5))
    local = ix.aggregate(mk())
    dist = sharded.aggregate(mk())
    assert [r["price"] for r in local.rows] == [r["price"]
                                                for r in dist.rows]
