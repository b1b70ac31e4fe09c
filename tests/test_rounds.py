"""execute_batch_rounds / run_hybrid_rounds: the deep-queue serving
shape (R rounds in one dispatch) must return exactly what R sequential
execute_batch calls return, including mixed groups, padding rows and
the fallback path when round shapes diverge."""

import numpy as np
import pytest

import redisearch_tpu as rs
from redisearch_tpu.aux.hybrid import run_hybrid_many, run_hybrid_rounds
from redisearch_tpu.query.engine import (QueryOptions, execute_batch,
                                         execute_batch_rounds)


@pytest.fixture(scope="module")
def ix():
    rng = np.random.default_rng(7)
    n, dim = 3000, 16
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    words = ["alpha", "beta", "gamma", "delta"]
    docs = [(f"d{i}", {
        "title": f"{words[i % 4]} {words[(i + 1) % 4]}",
        "cat": f"c{i % 5}",
        "emb": vecs[i]}) for i in range(n)]
    ix = rs.SearchIndex(rs.Schema(name="rounds", fields=[
        rs.Field("title", rs.FieldType.TEXT),
        rs.Field("cat", rs.FieldType.TAG),
        rs.Field("emb", rs.FieldType.VECTOR,
                 vector=rs.VectorParams(
                     dim=dim, metric=rs.VectorMetric.COSINE))]))
    ix.add_documents(docs)
    ix.commit()
    ix._test_vecs = vecs
    return ix


def _mk_knn(ix, r, i, B):
    vecs = ix._test_vecs
    return ix.prepare(f"(@cat:{{c{(r * B + i) % 5}}})=>[KNN 4 @emb $b]",
                      {"b": vecs[(r * B + i) % 100]},
                      QueryOptions(k=4), 2)


def _res_tuple(sr):
    return (tuple(np.asarray(sr.local_idx).tolist()),
            tuple(np.round(np.asarray(sr.scores), 4).tolist()),
            sr.count,
            None if sr.knn_dists is None
            else tuple(np.round(np.asarray(sr.knn_dists), 4).tolist()))


def test_rounds_match_sequential_knn(ix):
    seg = ix.segments[0]
    B, R = 16, 3
    rounds = [[_mk_knn(ix, r, i, B) for i in range(B)]
              for r in range(R)]
    for cqs in rounds:                       # warm entries
        execute_batch(cqs, seg, 4)
    got = execute_batch_rounds(rounds, seg, 4)
    assert len(got) == R
    for r, cqs in enumerate(rounds):
        want = execute_batch(cqs, seg, 4)
        assert [_res_tuple(a) for a in got[r]] == \
            [_res_tuple(b) for b in want]


def test_rounds_match_sequential_text(ix):
    seg = ix.segments[0]
    B, R = 8, 2
    rounds = [[ix.prepare(["alpha", "beta gamma", "alpha | delta",
                           "-beta alpha"][(r + i) % 4], None,
                          QueryOptions(k=5), 2) for i in range(B)]
              for r in range(R)]
    for cqs in rounds:
        execute_batch(cqs, seg, 5)
    got = execute_batch_rounds(rounds, seg, 5)
    for r, cqs in enumerate(rounds):
        want = execute_batch(cqs, seg, 5)
        assert [_res_tuple(a) for a in got[r]] == \
            [_res_tuple(b) for b in want]


def test_rounds_fallback_on_shape_mismatch(ix):
    seg = ix.segments[0]
    r0 = [ix.prepare("alpha", None, QueryOptions(k=5), 2)
          for _ in range(4)]
    r1 = [ix.prepare("beta gamma", None, QueryOptions(k=5), 2)
          for _ in range(8)]                 # different B -> fallback
    for cqs in (r0, r1):
        execute_batch(cqs, seg, 5)
    got = execute_batch_rounds([r0, r1], seg, 5)
    assert [_res_tuple(a) for a in got[0]] == \
        [_res_tuple(b) for b in execute_batch(r0, seg, 5)]
    assert [_res_tuple(a) for a in got[1]] == \
        [_res_tuple(b) for b in execute_batch(r1, seg, 5)]


def test_hybrid_rounds_match(ix):
    vecs = ix._test_vecs
    B, R = 8, 2
    mk = lambda r: [rs.HybridQuery(
        search=["alpha", "beta"][(r + i) % 2], vsim_field="emb",
        vsim_vector=vecs[(r * B + i) % 50], combine="RRF",
        window=6, limit=4) for i in range(B)]
    rounds = [mk(r) for r in range(R)]
    run_hybrid_many(ix, rounds[0])           # warm
    got = run_hybrid_rounds(ix, rounds)
    for r in range(R):
        want = run_hybrid_many(ix, rounds[r])
        assert got[r] == want
