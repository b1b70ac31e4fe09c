"""Distributed-vs-local differential fuzz.

Random queries over a random corpus must return the SAME result set
from the sharded SPMD path (in-graph ICI merges over the 8-device CPU
mesh) as from the local single-index path.  Scores must agree too once
global stats are used (the distributed path injects global N/avgdl the
way the reference coordinator shares index-wide stats).
"""

import numpy as np
import pytest

import redisearch_tpu as rs
from redisearch_tpu.parallel.dist import ShardedIndex, make_mesh

WORDS = ["ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen",
         "ibis", "jay"]


@pytest.fixture(scope="module")
def pair(eight_devices):
    rng = np.random.default_rng(11)
    schema = rs.Schema(name="fz", fields=[
        rs.Field("t", rs.FieldType.TEXT),
        rs.Field("g", rs.FieldType.TAG, sortable=True),
        rs.Field("n", rs.FieldType.NUMERIC, sortable=True),
        rs.Field("v", rs.FieldType.VECTOR,
                 vector=rs.VectorParams(dim=8,
                                        metric=rs.VectorMetric.L2))])
    ix = rs.SearchIndex(schema)
    vecs = rng.standard_normal((120, 8)).astype(np.float32)
    for i in range(120):
        ix.add_document(f"d{i}", {
            "t": " ".join(WORDS[j] for j in rng.integers(0, 10, 4)),
            "g": "pq"[i % 2], "n": float(i % 50), "v": vecs[i]})
    ix.commit()
    return ix, ShardedIndex.build(ix, make_mesh(8)), vecs


QUERIES = [
    "ant", "ant bee", "ant | bee", "cat -dog", "ant ~bee",
    '"ant bee"', "@g:{p}", "@n:[10 30]", "@g:{q} @n:[5 45]",
    "(ant | cat) @g:{p}", "ib*", "%bea%", "*",
]


@pytest.mark.parametrize("q", QUERIES)
def test_dist_matches_local(pair, q):
    ix, sh, _ = pair
    loc = ix.search(q, num=120)
    dst = sh.search(q, num=120)
    assert {h.key for h in dst.hits} == {h.key for h in loc.hits}, q
    assert dst.total == loc.total, q


@pytest.mark.parametrize("seed", range(6))
def test_dist_knn_matches_local(pair, seed):
    ix, sh, vecs = pair
    rng = np.random.default_rng(6000 + seed)
    qv = rng.standard_normal(8).astype(np.float32)
    loc = ix.search("*=>[KNN 7 @v $b]", params={"b": qv}, num=7)
    dst = sh.search("*=>[KNN 7 @v $b]", params={"b": qv}, num=7)
    assert [h.key for h in dst.hits] == [h.key for h in loc.hits]
    for a, b in zip(loc.hits, dst.hits):
        assert a.vector_distance == pytest.approx(b.vector_distance,
                                                  rel=1e-4)


@pytest.mark.parametrize("seed", range(4))
def test_dist_filtered_knn_matches_local(pair, seed):
    ix, sh, vecs = pair
    rng = np.random.default_rng(7000 + seed)
    qv = rng.standard_normal(8).astype(np.float32)
    q = "(@g:{p})=>[KNN 5 @v $b]"
    loc = ix.search(q, params={"b": qv}, num=5)
    dst = sh.search(q, params={"b": qv}, num=5)
    assert [h.key for h in dst.hits] == [h.key for h in loc.hits], seed


def test_dist_sortby_matches_local(pair):
    ix, sh, _ = pair
    for asc in (True, False):
        loc = ix.search("ant", sort_by="n", sort_asc=asc, num=120)
        dst = sh.search("ant", sort_by="n", sort_asc=asc, num=120)
        assert [h.sortkey for h in loc.hits] == \
            [h.sortkey for h in dst.hits], asc
        assert {h.key for h in loc.hits} == {h.key for h in dst.hits}
