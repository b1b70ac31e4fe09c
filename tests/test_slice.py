"""Segment slicing (index/slice.py): sliced sub-segments must behave
exactly like segments rebuilt from the same doc subset."""

import numpy as np
import pytest

import redisearch_tpu as rs
from redisearch_tpu.index.slice import live_locals, slice_segment


@pytest.fixture(scope="module")
def built():
    ix = rs.SearchIndex(rs.Schema(name="slsrc", fields=[
        rs.Field("t", rs.FieldType.TEXT),
        rs.Field("cat", rs.FieldType.TAG, sortable=True),
        rs.Field("x", rs.FieldType.NUMERIC, sortable=True),
        rs.Field("g", rs.FieldType.GEO),
        rs.Field("v", rs.FieldType.VECTOR,
                 vector=rs.VectorParams(dim=8,
                                        metric=rs.VectorMetric.L2)),
    ]))
    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = []
    for i in range(300):
        f = {
            "t": " ".join(rng.choice(words, 6)),
            "cat": f"c{i % 7}",
            "x": float(i % 50),
            "g": f"{rng.uniform(-10,10):.4f},{rng.uniform(-10,10):.4f}",
            "v": rng.normal(size=8).astype(np.float32),
        }
        docs.append((f"d{i}", f))
        ix.add_document(f"d{i}", f)
    ix.commit()
    return ix, docs


QUERIES = [
    ("alpha beta", {}),
    ('"alpha beta"', {}),
    ("@t:gamma -delta", {}),
    ("@cat:{c1|c3} @x:[5 30]", {}),
    ("ze*", {}),
    ("@g:[0 0 2000 km]", {}),
    ("*=>[KNN 7 @v $b]", {"b": np.zeros(8, np.float32)}),
]


def _results(ix, q, p):
    r = ix.search(q, params=p or None, num=50)
    return sorted((h.key, round(h.score, 4)) for h in r.hits), r.total


def _keyset(ix, q, p):
    """(match set, rank order) — scores use doctable-global corpus stats
    (N, avgdl), which differ between a shared-doctable view and a
    standalone rebuild, so absolute scores are compared only via rank."""
    r = ix.search(q, params=p or None, num=50)
    return sorted(h.key for h in r.hits), [h.key for h in r.hits], r.total


def test_slice_matches_rebuild(built):
    ix, docs = built
    src = ix.segments[0]
    sel = np.arange(0, 300, 3)   # every 3rd doc
    sliced = slice_segment(src, sel)

    sub = rs.SearchIndex(ix.schema)
    sub.doctable = ix.doctable
    sub.segments = [sliced]

    ref = rs.SearchIndex(rs.Schema(name="slref",
                                   fields=list(ix.schema.fields)))
    for j in sel:
        k, f = docs[j]
        ref.add_document(k, f)
    ref.commit()

    for q, p in QUERIES:
        gset, gorder, gtotal = _keyset(sub, q, p)
        wset, worder, wtotal = _keyset(ref, q, p)
        assert (gset, gtotal) == (wset, wtotal), (q, gset[:3], wset[:3])
        if "KNN" in q:   # distances are corpus-stat independent
            assert gorder == worder, q


def test_compact_uses_slice_and_matches(built):
    ix, docs = built
    ix2 = rs.SearchIndex(rs.Schema(name="slcmp",
                                   fields=list(ix.schema.fields)))
    for k, f in docs:
        ix2.add_document(k, f)
    ix2.commit()
    for i in range(0, 300, 2):
        ix2.delete_document(f"d{i}")
    ix2.compact()
    assert len(ix2.segments) == 1
    assert ix2.segments[0].n_docs == 150
    assert ix2.segments[0].n_deleted == 0

    ref = rs.SearchIndex(rs.Schema(name="slcmpr",
                                   fields=list(ix.schema.fields)))
    for i in range(1, 300, 2):
        ref.add_document(*docs[i])
    ref.commit()
    for q, p in QUERIES:
        got = _results(ix2, q, p)
        want = _results(ref, q, p)
        assert got == want, q


def test_sharded_build_uses_slice(built):
    ix, docs = built
    from redisearch_tpu.parallel.dist import ShardedIndex, make_mesh
    mesh = make_mesh(4)
    sh = ShardedIndex.build(ix, mesh)
    assert len(sh.shards) == 4
    assert sum(s.n_docs for s in sh.shards) == 300
    for q, p in QUERIES:
        if "KNN" in q:
            continue   # dist KNN covered by test_dist
        local = ix.search(q, params=p or None, num=50)
        dist = sh.search(q, params=p or None, num=50)
        assert dist.total == local.total, q
        lk = [h.key for h in local.hits]
        dk = [h.key for h in dist.hits]
        assert set(dk) <= set(lk) or len(dk) == len(lk), q
