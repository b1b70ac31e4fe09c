"""LVQ8 compressed host-tier vector storage (ops/lvq.py).

Reference capability: SVS LVQ/LeanVec compressed vectors
(src/vector_index.h:17-71) — ~4x capacity at equal memory with ~zero
recall loss.  Pins: encode/decode round trip, exact-against-
reconstruction distances, recall parity vs the uncompressed host tier,
memory ratio, slicing/checkpoint round trips, and the end-to-end KNN
query path through the public API.
"""

import numpy as np
import pytest

import redisearch_tpu as rs
from redisearch_tpu.ops.lvq import (lvq_decode, lvq_encode,
                                    lvq_sq_norms)


def test_encode_decode_error_bound():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(256, 64)).astype(np.float32)
    codes, off, scl = lvq_encode(v)
    assert codes.dtype == np.uint8
    recon = lvq_decode(codes, off, scl)
    # max error is half a quantization step per component
    step = scl[:, None]
    assert np.all(np.abs(recon - v) <= step / 2 + 1e-6)
    # constant rows reconstruct exactly
    const = np.full((3, 16), 2.5, np.float32)
    c2, o2, s2 = lvq_encode(const)
    assert np.allclose(lvq_decode(c2, o2, s2), const)


def test_sq_norms_match_reconstruction():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(100, 48)).astype(np.float32)
    codes, off, scl = lvq_encode(v)
    recon = lvq_decode(codes, off, scl)
    got = lvq_sq_norms(codes, off, scl)
    want = (recon.astype(np.float64) ** 2).sum(1).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _host_ivf_pair(metric, n=4000, d=32, seed=2):
    """Build an uncompressed and an LVQ8 HostIVF over the same data and
    the same trained centroids."""
    from redisearch_tpu.ops.ivf import HostIVF

    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, d)).astype(np.float32)
    pres = np.ones(n, bool)
    base = HostIVF.build(v, pres, metric, nlist=32)
    codes, off, scl = lvq_encode(v)
    comp = HostIVF.build_lvq(codes, off, scl, pres, metric,
                             centroids=np.asarray(base.centroids))
    return v, base, comp


@pytest.mark.parametrize("metric", ["L2", "COSINE", "IP"])
def test_host_ivf_lvq_recall_parity(metric):
    from redisearch_tpu.ops.ivf import host_ivf_knn

    v, base, comp = _host_ivf_pair(metric)
    assert comp.compression == "LVQ8"
    rng = np.random.default_rng(3)
    Q = rng.normal(size=(16, v.shape[1])).astype(np.float32)
    k = 10
    _, ids_b = host_ivf_knn(base, Q, k, nprobe=8)
    _, ids_c = host_ivf_knn(comp, Q, k, nprobe=8)
    rec = np.mean([len(set(ids_b[i]) & set(ids_c[i])) / k
                   for i in range(len(Q))])
    assert rec >= 0.97, f"LVQ8 recall vs uncompressed: {rec}"


def test_host_ivf_lvq_distances_exact_vs_recon():
    """Compressed scan distances equal brute-force distances computed
    against the reconstructed vectors (not merely close to f32)."""
    from redisearch_tpu.ops.ivf import host_ivf_knn

    v, base, comp = _host_ivf_pair("L2", n=1000, d=16, seed=4)
    codes, off, scl = lvq_encode(v)
    recon = lvq_decode(codes, off, scl)
    rng = np.random.default_rng(5)
    Q = rng.normal(size=(4, 16)).astype(np.float32)
    d_c, ids_c = host_ivf_knn(comp, Q, 5, nprobe=comp.nlist)  # all lists
    for i in range(len(Q)):
        brute = ((recon - Q[i]) ** 2).sum(1)
        order = np.argsort(brute, kind="stable")[:5]
        np.testing.assert_allclose(np.sort(d_c[i]),
                                   np.sort(brute[order]), rtol=2e-4,
                                   atol=2e-4)


def test_memory_ratio():
    _, base, comp = _host_ivf_pair("L2", n=2000, d=128)
    ratio = base.host_bytes() / comp.host_bytes()
    assert ratio >= 2.0, f"capacity ratio {ratio:.2f} < 2x"


def _mk_index(compression):
    rng = np.random.default_rng(6)
    d = 24
    vecs = rng.normal(size=(600, d)).astype(np.float32)
    schema = rs.Schema(name="lvq", fields=[
        rs.Field("tag", rs.FieldType.TAG),
        rs.Field("emb", rs.FieldType.VECTOR,
                 vector=rs.VectorParams(dim=d, metric=rs.VectorMetric.L2,
                                        storage="host", nlist=8,
                                        compression=compression))])
    ix = rs.SearchIndex(schema)
    for i in range(600):
        ix.add_document(f"d{i}", {"tag": f"t{i % 3}", "emb": vecs[i]})
    ix.commit()
    return ix, vecs


def test_end_to_end_knn_compressed():
    ix, vecs = _mk_index("LVQ8")
    col = ix.segments[0].vectors["emb"]
    assert col.compression == "LVQ8" and col.vecs.dtype == np.uint8
    q = vecs[17] + 0.01
    r = ix.search("*=>[KNN 5 @emb $b EF_RUNTIME 8]", params={"b": q})
    keys = [h.key for h in r.hits]
    assert "d17" in keys, keys
    # filtered KNN through the compressed tier
    r = ix.search("(@tag:{t2})=>[KNN 5 @emb $b EF_RUNTIME 8]",
                  params={"b": q})
    assert all(int(h.key[1:]) % 3 == 2 for h in r.hits)
    assert len(r.hits) == 5


def test_compressed_aliases_and_validation():
    p = rs.VectorParams(dim=8, storage="host", compression="LeanVec4x8")
    assert p.compression == "LVQ8"
    with pytest.raises(Exception):
        rs.VectorParams(dim=8, storage="hbm", compression="LVQ8")
    with pytest.raises(Exception):
        rs.VectorParams(dim=8, storage="host", compression="ZSTD")


def test_compressed_checkpoint_roundtrip(tmp_path):
    from redisearch_tpu.aux import checkpoint as ckpt

    ix, vecs = _mk_index("LVQ8")
    q = vecs[42] - 0.01
    before = [h.key for h in ix.search(
        "*=>[KNN 5 @emb $b EF_RUNTIME 8]", params={"b": q}).hits]
    path = str(tmp_path / "ck")
    ckpt.save(ix, path)
    ix2 = ckpt.load(path)
    col = ix2.segments[0].vectors["emb"]
    assert col.compression == "LVQ8" and col.vecs.dtype == np.uint8
    after = [h.key for h in ix2.search(
        "*=>[KNN 5 @emb $b EF_RUNTIME 8]", params={"b": q}).hits]
    assert before == after


def test_compressed_compaction_slices_exactly():
    ix, vecs = _mk_index("LVQ8")
    codes_before = np.asarray(ix.segments[0].vectors["emb"].vecs).copy()
    ids_before = {f"d{i}": codes_before[
        ix.segments[0].doc_local(f"d{i}")] for i in (5, 99, 512)
        if ix.segments[0].doc_local(f"d{i}") is not None} \
        if hasattr(ix.segments[0], "doc_local") else None
    for i in range(0, 600, 2):
        ix.delete_document(f"d{i}")
    ix.maybe_compact(dead_ratio=0.0)
    ix.commit()
    col = ix.segments[0].vectors["emb"]
    assert col.compression == "LVQ8"
    q = vecs[17] + 0.01       # d17 odd -> survives
    r = ix.search("*=>[KNN 5 @emb $b EF_RUNTIME 8]", params={"b": q})
    keys = [h.key for h in r.hits]
    assert "d17" in keys, keys
    assert all(int(k[1:]) % 2 == 1 for k in keys)
