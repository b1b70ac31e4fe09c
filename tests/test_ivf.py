"""IVF partitioned vector index: recall and integration tests
(reference analog: VecSim HNSW tests, tests/pytests/test_vecsim.py)."""

import numpy as np
import pytest

import redisearch_tpu as rs
from redisearch_tpu.ops.ivf import IVFIndex, ivf_probe, train_kmeans


def _brute_topk(vecs, q, k, metric="L2"):
    if metric == "L2":
        d = ((vecs - q[None, :]) ** 2).sum(1)
    elif metric == "IP":
        d = 1.0 - vecs @ q
    else:
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True),
                               1e-30)
        d = 1.0 - vn @ (q / max(np.linalg.norm(q), 1e-30))
    return set(np.argsort(d, kind="stable")[:k])


def test_kmeans_converges():
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(4, 8)) * 10
    x = np.concatenate([c + rng.normal(size=(100, 8)) for c in centers])
    cents = train_kmeans(x.astype(np.float32), 4, iters=20)
    # every true center has a learned centroid nearby
    for c in centers:
        assert np.min(((cents - c) ** 2).sum(1)) < 4.0


@pytest.mark.parametrize("metric", ["L2", "IP", "COSINE"])
def test_ivf_recall(metric):
    rng = np.random.default_rng(1)
    n, d, k = 4000, 32, 10
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    present = np.ones(n, bool)
    ivf = IVFIndex.build(vecs, present, metric, nlist=64)
    recalls = []
    for qi in range(20):
        q = rng.normal(size=d).astype(np.float32)
        import jax.numpy as jnp
        # gaussian data has no cluster structure (the ANN worst case);
        # nprobe=32/64 is the regime where IVF still holds 0.9+ recall
        dists, ids = ivf_probe(ivf, jnp.asarray(q), k, nprobe=32)
        got = set(np.asarray(ids).tolist())
        truth = _brute_topk(vecs, q, k, metric)
        recalls.append(len(got & truth) / k)
    assert np.mean(recalls) >= 0.9, f"recall {np.mean(recalls)} too low"


def test_ivf_index_integration():
    """KNN through the search API uses the IVF structure when built."""
    rng = np.random.default_rng(2)
    n, d = 2000, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    schema = rs.Schema(name="iv", fields=[
        rs.Field("t", rs.FieldType.TEXT),
        rs.Field("v", rs.FieldType.VECTOR,
                 vector=rs.VectorParams(dim=d, algo="HNSW",
                                        metric=rs.VectorMetric.L2,
                                        nlist=32, nprobe=8,
                                        flat_buffer_limit=100)),
    ])
    ix = rs.SearchIndex(schema)
    ix.add_documents([(f"d{i}", {"t": f"tok{i % 5}", "v": vecs[i]})
                      for i in range(n)])
    assert ix.segments[0].vectors["v"].ivf is not None
    hits = 0
    for qi in range(10):
        q = vecs[rng.integers(n)] + 0.001
        res = ix.search("*=>[KNN 10 @v $q EF_RUNTIME 16]", params={"q": q})
        truth = _brute_topk(vecs, q, 10)
        hits += len({int(h.key[1:]) for h in res} & truth)
    assert hits / 100 >= 0.9


def test_ivf_filtered_knn():
    rng = np.random.default_rng(3)
    n, d = 2000, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    schema = rs.Schema(name="ivf2", fields=[
        rs.Field("t", rs.FieldType.TEXT),
        rs.Field("v", rs.FieldType.VECTOR,
                 vector=rs.VectorParams(dim=d, algo="IVF", nlist=32,
                                        metric=rs.VectorMetric.L2,
                                        flat_buffer_limit=100)),
    ])
    ix = rs.SearchIndex(schema)
    ix.add_documents([(f"d{i}", {"t": f"tok{i % 5}", "v": vecs[i]})
                      for i in range(n)])
    q = vecs[7]  # d7 has t=tok2
    res = ix.search("(@t:tok2)=>[KNN 5 @v $q]", params={"q": q})
    assert res.hits[0].key == "d7"
    assert all(int(h.key[1:]) % 5 == 2 for h in res)
    # forcing BATCHES policy goes through the IVF-probe membership path
    res2 = ix.search("(@t:tok2)=>[KNN 5 @v $q HYBRID_POLICY BATCHES]",
                     params={"q": q})
    assert res2.hits[0].key == "d7"


def test_tiered_small_segment_stays_flat():
    rng = np.random.default_rng(4)
    schema = rs.Schema(name="tier", fields=[
        rs.Field("v", rs.FieldType.VECTOR,
                 vector=rs.VectorParams(dim=8, algo="TIERED",
                                        metric=rs.VectorMetric.L2,
                                        flat_buffer_limit=1000)),
    ])
    ix = rs.SearchIndex(schema)
    for i in range(50):  # below the flush threshold
        ix.add_document(f"d{i}", {"v": rng.normal(size=8)
                                  .astype(np.float32)})
    ix.commit()
    assert ix.segments[0].vectors["v"].ivf is None  # exact front buffer
    q = np.zeros(8, np.float32)
    res = ix.search("*=>[KNN 3 @v $q]", params={"q": q})
    assert len(res.hits) == 3


def test_int8_vectors_device_dtype():
    rng = np.random.default_rng(5)
    vecs = rng.integers(-127, 127, size=(50, 8)).astype(np.int8)
    schema = rs.Schema(name="i8", fields=[
        rs.Field("v", rs.FieldType.VECTOR,
                 vector=rs.VectorParams(dim=8, dtype="INT8",
                                        metric=rs.VectorMetric.L2))])
    ix = rs.SearchIndex(schema)
    for i in range(50):
        ix.add_document(f"d{i}", {"v": vecs[i]})
    ix.commit()
    col = ix.segments[0].vectors["v"]
    assert str(col.vecs.dtype) == "int8"
    q = vecs[13].astype(np.float32)
    res = ix.search("*=>[KNN 3 @v $q]", params={"q": q})
    assert res.hits[0].key == "d13"


def test_auto_compaction():
    ix = rs.SearchIndex(rs.Schema(name="cmp", fields=[
        rs.Field("t", rs.FieldType.TEXT)]))
    for i in range(40):
        ix.add_document(f"d{i}", {"t": f"tok{i % 4}"})
    ix.commit()
    for i in range(20):  # delete half -> above the 25% dead threshold
        ix.delete_document(f"d{i}")
    ix.add_document("fresh", {"t": "tok1"})
    ix.commit()   # triggers maybe_compact
    assert sum(s.n_deleted for s in ix.segments) == 0
    assert ix.search("tok1").total == 6  # 5 survivors + fresh
