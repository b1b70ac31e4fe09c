"""Vectorized FT.HYBRID fusion (aux/hybrid.py) vs the per-query
hit-list fusion path: identical rows on corpora engineered for
cross-branch duplicates, exact RRF score ties (gid tiebreak), mixed
RRF/LINEAR batches, per-query windows/limits, tails and
yield_score_as.  The hit-list path (_run_hybrid_hits) is the adapter
path distributed indexes take, so this parity also pins local ==
coordinator fusion semantics (reference src/hybrid/hybrid_scoring.h)."""

import numpy as np
import pytest

import redisearch_tpu as rs
from redisearch_tpu.aux import hybrid as H


@pytest.fixture(scope="module")
def ix():
    rng = np.random.default_rng(11)
    n, dim = 3000, 16
    # half the docs share one of 4 tokens (text branch), vectors
    # clustered so knn lists overlap text lists heavily (duplicates)
    words = ["alpha", "beta", "gamma", "delta"]
    centers = rng.normal(size=(4, dim)).astype(np.float32)
    vecs = (centers[np.arange(n) % 4]
            + 0.3 * rng.normal(size=(n, dim)).astype(np.float32))
    ixx = rs.SearchIndex(rs.Schema(name="hf", fields=[
        rs.Field("txt", rs.FieldType.TEXT),
        rs.Field("year", rs.FieldType.NUMERIC, sortable=True),
        rs.Field("v", rs.FieldType.VECTOR,
                 vector=rs.VectorParams(dim=dim,
                                        metric=rs.VectorMetric.L2))]))
    ixx.add_documents([
        (f"d{i}", {"txt": f"{words[i % 4]} common w{i % 7}",
                   "year": float(1990 + i % 30), "v": vecs[i]})
        for i in range(n)])
    ixx.commit()
    ixx._centers = centers
    return ixx


def _norm(rows):
    return [{k: (round(v, 6) if isinstance(v, float) else v)
             for k, v in r.items() if k != "__meta"} for r in rows]


@pytest.mark.parametrize("combine", ["RRF", "LINEAR"])
def test_fusion_matches_hitlist_path(ix, combine):
    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "common"]
    hqs = [rs.HybridQuery(
        search=words[i % 5], vsim_field="v",
        vsim_vector=(ix._centers[i % 4]
                     + 0.1 * rng.normal(size=16).astype(np.float32)),
        combine=combine, window=10 + (i % 3) * 5, limit=5 + i % 4,
        alpha=0.3, beta=0.7, rrf_constant=60 if i % 2 else 10)
        for i in range(12)]
    fast = H.run_hybrid_many(ix, hqs)
    slow = H._run_hybrid_hits(ix, hqs, None)
    for i, (f, s) in enumerate(zip(fast, slow)):
        assert _norm(f) == _norm(s), (i, f[:2], s[:2])


def test_fusion_rrf_tie_breaks_by_gid(ix):
    """Two docs appearing at the same rank in different branches score
    identically under RRF; the lower doc id must win in both paths."""
    hq = rs.HybridQuery(search="common", vsim_field="v",
                        vsim_vector=ix._centers[0], combine="RRF",
                        window=20, limit=20)
    fast = H.run_hybrid_many(ix, [hq])[0]
    slow = H._run_hybrid_hits(ix, [hq], None)[0]
    assert _norm(fast) == _norm(slow)
    scores = [r["__score"] for r in fast]
    assert scores == sorted(scores, reverse=True)


def test_fusion_with_tail_and_yield(ix):
    from redisearch_tpu.agg.pipeline import AggregateRequest
    hq = rs.HybridQuery(search="alpha", vsim_field="v",
                        vsim_vector=ix._centers[0], combine="LINEAR",
                        window=15, limit=10, yield_score_as="fscore")
    tail = (AggregateRequest("*").load("year")
            .filter("@year >= 2000").limit(0, 6))
    tail2 = (AggregateRequest("*").load("year")
             .filter("@year >= 2000").limit(0, 6))
    fast = H.run_hybrid_many(ix, [hq], [tail])[0]
    slow = H._run_hybrid_hits(ix, [hq], [tail2])[0]
    assert len(fast) <= 6
    assert _norm(fast) == _norm(slow)
    assert all("fscore" in r for r in fast)


def test_fusion_after_delete(ix):
    """Deleted docs must not appear (device alive mask + meta check)."""
    hq = rs.HybridQuery(search="beta", vsim_field="v",
                        vsim_vector=ix._centers[1], combine="RRF",
                        window=10, limit=10)
    before = H.run_hybrid_many(ix, [hq])[0]
    victim = before[0]["__key"]
    ix.delete_document(victim)
    try:
        after = H.run_hybrid_many(ix, [hq])[0]
        assert victim not in [r["__key"] for r in after]
        slow = H._run_hybrid_hits(ix, [hq], None)[0]
        assert _norm(after) == _norm(slow)
    finally:
        # restore for other tests (module fixture)
        gid = before[0].get("__gid")
        ix.add_document(victim, dict(
            txt="beta common w0", year=1990.0,
            v=np.asarray(ix._centers[1], np.float32)))
        ix.commit()
