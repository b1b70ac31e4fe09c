"""Beyond-HBM host-tier vector fields (VectorParams.storage="host").

Vectors stay in host RAM; the device holds only IVF centroids and pages
probed lists per query batch (reference analog: the pluggable disk tier,
src/search_disk_api.h:41-55, and tiered VecSim, src/vector_index.c:89).
"""

import numpy as np
import pytest

import redisearch_tpu as rs


def _mk_index(n=600, dim=16, storage="host", metric=rs.VectorMetric.L2,
              nlist=16, seed=3):
    schema = rs.Schema(name=f"ht_{storage}_{metric.value}", fields=[
        rs.Field("t", rs.FieldType.TEXT),
        rs.Field("price", rs.FieldType.NUMERIC),
        rs.Field("v", rs.FieldType.VECTOR,
                 vector=rs.VectorParams(dim=dim, metric=metric,
                                        algo=rs.VectorAlgo.IVF,
                                        nlist=nlist, nprobe=nlist,
                                        flat_buffer_limit=1,
                                        storage=storage)),
    ])
    ix = rs.SearchIndex(schema)
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    for i in range(n):
        ix.add_document(f"d{i}", {"t": "even" if i % 2 == 0 else "odd",
                                  "price": float(i), "v": vecs[i]})
    ix.commit()
    return ix, vecs


def test_host_tier_builds_host_resident():
    ix, _ = _mk_index()
    col = ix.segments[0].vectors["v"]
    assert col.host
    assert isinstance(col.vecs, np.ndarray)          # NOT a device array
    assert col.host_ivf is not None
    assert isinstance(col.host_ivf.bucket_vecs, np.ndarray)
    # FT.INFO accounts for the tier
    assert ix.info()["vector_index_sz_mb"] >= 0


def test_host_tier_pure_knn_matches_hbm_ivf():
    """At nprobe == nlist the probe covers every list, so host-tier KNN
    must return the exact brute-force neighbors."""
    ix, vecs = _mk_index()
    q = vecs[7] + 0.01
    res = ix.search("*=>[KNN 10 @v $b]",
                    params={"b": q.astype(np.float32).tobytes()})
    got = [h.key for h in res.hits]
    d = ((vecs - q[None, :]) ** 2).sum(1)
    expect = [f"d{i}" for i in np.argsort(d)[:10]]
    assert got == expect


def test_host_tier_partial_probe_subsets_exact():
    """nprobe < nlist: results are a subset of the corpus ranked by true
    distance (approximate recall, never wrong distances)."""
    ix, vecs = _mk_index(nlist=16)
    q = vecs[11] + 0.01
    res = ix.search("*=>[KNN 5 @v $b EF_RUNTIME 4]",
                    params={"b": q.astype(np.float32).tobytes()})
    d = ((vecs - q[None, :]) ** 2).sum(1)
    for h in res.hits:
        i = int(h.key[1:])
        assert abs(h.vector_distance - d[i]) < 1e-2
    # the true nearest neighbor lives in the top probed list
    assert res.hits[0].key == f"d{np.argsort(d)[0]}"


def test_host_tier_filtered_knn():
    ix, vecs = _mk_index()
    q = vecs[20] + 0.01
    res = ix.search("(even)=>[KNN 8 @v $b]",
                    params={"b": q.astype(np.float32).tobytes()})
    got = [h.key for h in res.hits]
    d = ((vecs - q[None, :]) ** 2).sum(1)
    expect = [f"d{i}" for i in np.argsort(d) if i % 2 == 0][:8]
    assert got == expect
    # numeric filter
    res = ix.search("@price:[100 199]=>[KNN 8 @v $b]",
                    params={"b": q.astype(np.float32).tobytes()})
    got = [h.key for h in res.hits]
    expect = [f"d{i}" for i in np.argsort(d) if 100 <= i <= 199][:8]
    assert got == expect


def test_host_tier_deletes_and_compact():
    ix, vecs = _mk_index()
    q = vecs[30] + 0.01
    d = ((vecs - q[None, :]) ** 2).sum(1)
    order = np.argsort(d)
    # delete the two nearest docs: they must vanish from results
    for i in order[:2]:
        ix.delete_document(f"d{i}")
    res = ix.search("*=>[KNN 5 @v $b]",
                    params={"b": q.astype(np.float32).tobytes()})
    got = [h.key for h in res.hits]
    expect = [f"d{i}" for i in order[2:7]]
    assert got == expect
    # compaction slices the host arrays and rebuilds the slabs around the
    # kept centroids
    ix.compact()
    col = ix.segments[0].vectors["v"]
    assert col.host and col.host_ivf is not None
    res = ix.search("*=>[KNN 5 @v $b]",
                    params={"b": q.astype(np.float32).tobytes()})
    assert [h.key for h in res.hits] == expect


def test_host_tier_checkpoint_roundtrip(tmp_path):
    from redisearch_tpu.aux import checkpoint
    ix, vecs = _mk_index(n=300)
    q = vecs[5] + 0.01
    blob = q.astype(np.float32).tobytes()
    before = [h.key for h in ix.search("*=>[KNN 6 @v $b]",
                                       params={"b": blob}).hits]
    checkpoint.save(ix, str(tmp_path / "ck"))
    ix2 = checkpoint.load(str(tmp_path / "ck"))
    col = ix2.segments[0].vectors["v"]
    assert col.host and col.host_ivf is not None
    after = [h.key for h in ix2.search("*=>[KNN 6 @v $b]",
                                       params={"b": blob}).hits]
    assert after == before


def test_host_tier_batch_matches_single():
    from redisearch_tpu.query.engine import QueryOptions, execute_batch
    ix, vecs = _mk_index(n=400)
    seg = ix.segments[0]
    rng = np.random.default_rng(0)
    qs = rng.normal(size=(9, 16)).astype(np.float32)
    cqs = [ix.prepare("*=>[KNN 6 @v $b]", {"b": qs[i].tobytes()},
                      QueryOptions(k=6), 2) for i in range(9)]
    batch = execute_batch(cqs, seg, 6)
    for i, cq in enumerate(cqs):
        single = ix.search("*=>[KNN 6 @v $b]",
                           params={"b": qs[i].tobytes()})
        got = [ix.doctable.get(int(seg.gids_host[j])).key
               for j in batch[i].local_idx[:len(single.hits)]]
        exp = [h.key for h in single.hits]
        assert got == exp


def test_host_tier_rejects_vector_range_and_aggregation():
    from redisearch_tpu.utils.errors import RSError
    ix, vecs = _mk_index(n=200)
    with pytest.raises(RSError):
        ix.search("@v:[VECTOR_RANGE 0.5 $b]",
                  params={"b": vecs[0].tobytes()})


def test_host_tier_rejects_multivalue():
    schema = rs.Schema(name="ht_mv", fields=[
        rs.Field("v", rs.FieldType.VECTOR,
                 vector=rs.VectorParams(dim=4, multi=True,
                                        storage="host"))])
    ix = rs.SearchIndex(schema)
    ix.add_document("a", {"v": [np.ones(4, np.float32),
                                np.zeros(4, np.float32)]})
    with pytest.raises(ValueError):
        ix.commit()


def test_host_tier_filtered_knn_stemmed_union_window():
    """Stem-expanded text filters produce union windows with duplicate
    doc entries (one valid owner per doc) — the host-tier candidate
    compaction must dedup them or probed ids miss the searchsorted
    membership test (regression: '(apple)=>[KNN ...]' returned 1 hit)."""
    schema = rs.Schema(name="ht_stem", fields=[
        rs.Field("t", rs.FieldType.TEXT),
        rs.Field("v", rs.FieldType.VECTOR,
                 vector=rs.VectorParams(dim=8, metric=rs.VectorMetric.L2,
                                        algo=rs.VectorAlgo.IVF, nlist=4,
                                        nprobe=4, storage="host"))])
    ix = rs.SearchIndex(schema)
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(200, 8)).astype(np.float32)
    for i in range(200):
        ix.add_document(f"d{i}", {"t": "apples taste great" if i % 3
                                  else "bananas rule", "v": vecs[i]})
    ix.commit()
    q = vecs[10] + 0.01
    res = ix.search("(apple)=>[KNN 6 @v $b]",
                    params={"b": q.astype(np.float32).tobytes()})
    d = ((vecs - q[None, :]) ** 2).sum(1)
    expect = [f"d{i}" for i in np.argsort(d) if i % 3][:6]
    assert [h.key for h in res.hits] == expect


def test_host_tier_aggregation_over_knn():
    """FT.AGGREGATE over a host-tier KNN source (the agg pipeline pulls
    KNN sources through topk mode, so the host tier serves it)."""
    from redisearch_tpu.agg.pipeline import AggregateRequest
    ix, vecs = _mk_index(n=200, nlist=4)
    q = vecs[3].tobytes()
    req = (AggregateRequest("*=>[KNN 20 @v $b]", params={"b": q})
           .group_by("@t", ("COUNT", [], "cnt")))
    res = ix.aggregate(req)
    assert sum(int(r["cnt"]) for r in res.rows) == 20
    d = ((vecs - np.frombuffer(q, np.float32)[None, :]) ** 2).sum(1)
    top = np.argsort(d)[:20]
    even = int((top % 2 == 0).sum())
    got = {r["t"]: int(r["cnt"]) for r in res.rows}
    assert got.get("even", 0) == even


def test_host_tier_wire_create(loop=None):
    """STORAGE HOST reaches the schema through FT.CREATE's VECTOR args."""
    import asyncio
    from redisearch_tpu.server import Server

    async def flow():
        srv = Server(port=0)
        server = await srv.serve()
        try:
            srv.dispatch(["FT.CREATE", "hw", "SCHEMA", "v", "VECTOR",
                          "HNSW", "10", "TYPE", "FLOAT32", "DIM", "8",
                          "DISTANCE_METRIC", "L2", "NLIST", "4",
                          "STORAGE", "HOST"])
            ix = srv.client._indexes["hw"]
            assert ix.schema.field("v").vector.storage == "host"
            rng = np.random.default_rng(0)
            for i in range(100):
                srv.client.hset(f"d{i}",
                                {"v": rng.normal(size=8)
                                 .astype(np.float32)})
            ix.commit()
            assert ix.segments[0].vectors["v"].host
            assert ix.segments[0].vectors["v"].host_ivf is not None
        finally:
            server.close()
            await server.wait_closed()
            await srv.aclose()
    asyncio.new_event_loop().run_until_complete(flow())
