"""Scorer behaviors: TFIDF/BM25/DISMAX/DOCSCORE/HAMMING + EXPLAINSCORE +
profile counters (reference: tests over src/ext/default.c scorers)."""

import numpy as np
import pytest

import redisearch_tpu as rs


@pytest.fixture()
def idx():
    ix = rs.SearchIndex(rs.Schema(name="sc", fields=[
        rs.Field("t", rs.FieldType.TEXT)]))
    ix.add_document("short", {"t": "apple banana"}, score=1.0)
    ix.add_document("long", {"t": "apple " + "filler " * 50}, score=1.0)
    ix.add_document("boosted", {"t": "apple pie"}, score=2.0)
    ix.add_document("multi", {"t": "apple apple apple banana"}, score=1.0)
    ix.commit()
    return ix


def test_bm25_length_normalization(idx):
    res = idx.search("apple", scorer="BM25STD")
    keys = [h.key for h in res]
    # doc score 2.0 boost wins; long doc is penalized by length norm
    assert keys[0] == "boosted"
    assert keys.index("multi") < keys.index("long")


def test_tfidf(idx):
    res = idx.search("apple banana", scorer="TFIDF")
    assert res.hits[0].score > 0


def test_bm25_tanh_normalized(idx):
    res = idx.search("apple", scorer="BM25STD.TANH")
    assert all(0.0 <= h.score <= 1.0 for h in res)


def test_docscore(idx):
    res = idx.search("apple", scorer="DOCSCORE")
    assert res.hits[0].key == "boosted"
    assert res.hits[0].score == 2.0


def test_dismax(idx):
    res = idx.search("apple | banana", scorer="DISMAX")
    assert res.total == 4


def test_hamming():
    ix = rs.SearchIndex(rs.Schema(name="h", fields=[
        rs.Field("t", rs.FieldType.TEXT)]))
    ix.add_document("a", {"t": "x"}, payload=bytes([0b1111]))
    ix.add_document("b", {"t": "x"}, payload=bytes([0b1110]))
    ix.add_document("c", {"t": "x"}, payload=bytes([0b0000]))
    res = ix.search("x", scorer="HAMMING", payload=bytes([0b1111]))
    assert [h.key for h in res] == ["a", "b", "c"]
    assert res.hits[0].score == 1.0
    assert res.hits[1].score == 0.5


def test_explainscore():
    c = rs.Client()
    c.ft_create("e", [rs.Field("t", rs.FieldType.TEXT)])
    c.hset("d1", {"t": "apple banana cherry"})
    c.hset("d2", {"t": "apple apple"})
    exp = c.ft_explainscore("e", "apple banana", "d1")
    assert exp["value"] > 0
    assert exp["children"], "needs an explanation tree"
    # the tree's computed value matches the search score
    res = c.ft_search("e", "apple banana")
    d1_score = next(h.score for h in res if h.key == "d1")
    assert abs(exp["value"] - d1_score) < 1e-4


def test_profile_iterators():
    c = rs.Client()
    c.ft_create("p", [rs.Field("t", rs.FieldType.TEXT),
                      rs.Field("n", rs.FieldType.NUMERIC)])
    for i in range(30):
        c.hset(f"d{i}", {"t": "alpha" if i % 2 else "beta", "n": i})
    res, prof = c.ft_profile("p", "SEARCH", "alpha @n:[0 9]")
    it = prof["iterators"]
    assert it["type"] == "Intersect"
    counts = {k.get("term", k["type"]): k["counter"]
              for k in it["children"]}
    assert counts["alpha"] == 15
    assert counts["Numeric"] == 10
    assert it["counter"] == 5


def test_extension_api():
    import redisearch_tpu.ext as ext

    @ext.scorer("BOOSTER")
    def booster(key, fields, base):
        return base * float(fields.get("boost", 1))

    @ext.expander("REVEXP")
    def revexp(token):
        return [token, token[::-1]]

    ix = rs.SearchIndex(rs.Schema(name="ext", fields=[
        rs.Field("t", rs.FieldType.TEXT),
        rs.Field("boost", rs.FieldType.NUMERIC)]))
    ix.add_document("plain", {"t": "target word", "boost": 1})
    ix.add_document("boosted", {"t": "target word", "boost": 50})
    ix.add_document("rev", {"t": "tegrat only"})
    ix.commit()
    res = ix.search("target", scorer="BOOSTER")
    assert res.hits[0].key == "boosted"
    # custom expander matches the reversed form too
    from redisearch_tpu.query.engine import QueryOptions
    from redisearch_tpu.query.engine import execute
    cq = ix.compile(ix.parse_query("target"),
                    QueryOptions(expander="REVEXP"))
    r = execute(cq, ix.segments[0], 10)
    import numpy as np
    keys = {ix.doctable.get(int(ix.segments[0].gids_host[i])).key
            for i, s in zip(r.local_idx, r.scores) if s > -3.3e38}
    assert keys == {"plain", "boosted", "rev"}
