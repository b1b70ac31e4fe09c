"""Cold (beyond-HBM) text segments: Schema(storage="host") keeps the
posting/position/tag CSR arrays in host RAM; each query pages only its
term windows to the device (engine._execute_cold).  Results must be
IDENTICAL to a hot index over the same corpus — same program, different
array residency."""

import numpy as np
import pytest

import redisearch_tpu as rs


def _corpus(n=1200, seed=9):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i:02d}" for i in range(40)]
    docs = []
    for i in range(n):
        docs.append((f"d{i}", {
            "a": " ".join(rng.choice(vocab, 8)),
            "b": " ".join(rng.choice(vocab, 5)),
            "tagf": "xyz"[i % 3],
            "num": float(i % 100)}))
    return docs


def _build(storage):
    ix = rs.SearchIndex(rs.Schema(name=f"cold_{storage}", fields=[
        rs.Field("a", rs.FieldType.TEXT, weight=2.0),
        rs.Field("b", rs.FieldType.TEXT),
        rs.Field("tagf", rs.FieldType.TAG),
        rs.Field("num", rs.FieldType.NUMERIC, sortable=True)],
        storage=storage))
    for k, f in _corpus():
        ix.add_document(k, f)
    ix.commit()
    return ix


@pytest.fixture(scope="module")
def pair():
    return _build("host"), _build("hbm")


QUERIES = [
    "w00 w01",
    "w02 | w03",
    "w04 -w05",
    "w06 ~w07",
    '"w00 w01"',
    '@a:"w02 w03"',
    "@tagf:{x} w08",
    "@num:[10 60] w09",
    "w10 @tagf:{x|y}",
    "*",
]


def test_cold_segment_is_host_resident(pair):
    cold, hot = pair
    cseg = cold.segments[0]
    assert cseg.cold
    assert isinstance(cseg.text.doc_ids, np.ndarray)
    assert isinstance(cseg.text.poskeys, np.ndarray)
    assert isinstance(cseg.tags["tagf"].doc_ids, np.ndarray)
    assert not hot.segments[0].cold


def test_cold_matches_hot(pair):
    cold, hot = pair
    for q in QUERIES:
        rc = cold.search(q, num=25)
        rh = hot.search(q, num=25)
        assert rc.total == rh.total, q
        assert [h.key for h in rc.hits] == [h.key for h in rh.hits], q
        np.testing.assert_allclose(
            [h.score for h in rc.hits], [h.score for h in rh.hits],
            rtol=1e-6, err_msg=q)


def test_cold_sort_and_scorers(pair):
    cold, hot = pair
    rc = cold.search("w00", num=20, sort_by="num", sort_asc=False)
    rh = hot.search("w00", num=20, sort_by="num", sort_asc=False)
    assert [h.key for h in rc.hits] == [h.key for h in rh.hits]
    for scorer in ("TFIDF", "BM25", "DISMAX"):
        rc = cold.search("w01 w02", num=15, scorer=scorer)
        rh = hot.search("w01 w02", num=15, scorer=scorer)
        assert [h.key for h in rc.hits] == [h.key for h in rh.hits], scorer
        np.testing.assert_allclose(
            [h.score for h in rc.hits], [h.score for h in rh.hits],
            rtol=1e-6, err_msg=scorer)


def test_cold_slop_and_inorder(pair):
    cold, hot = pair
    for slop, inorder in ((0, True), (2, True), (1, False)):
        rc = cold.search("w00 w03", num=20, slop=slop, inorder=inorder)
        rh = hot.search("w00 w03", num=20, slop=slop, inorder=inorder)
        assert rc.total == rh.total, (slop, inorder)
        assert ([h.key for h in rc.hits]
                == [h.key for h in rh.hits]), (slop, inorder)


def test_cold_batched_and_aggregate(pair):
    cold, hot = pair
    many_c = cold.search_many(["w00 w01", "w02 w03"], k=10)
    many_h = hot.search_many(["w00 w01", "w02 w03"], k=10)
    for mc, mh in zip(many_c, many_h):
        assert [h.key for h in mc.hits] == [h.key for h in mh.hits]
    from redisearch_tpu.agg.pipeline import AggregateRequest
    req = (AggregateRequest("w00")
           .group_by("@tagf", ("COUNT", [], "cnt")))
    rc = cold.aggregate(req)
    req2 = (AggregateRequest("w00")
            .group_by("@tagf", ("COUNT", [], "cnt")))
    rh = hot.aggregate(req2)
    assert sorted((r["tagf"], int(r["cnt"])) for r in rc.rows) \
        == sorted((r["tagf"], int(r["cnt"])) for r in rh.rows)


def test_cold_mutations(pair):
    cold, hot = pair
    cold2 = _build("host")
    hot2 = _build("hbm")
    for i in range(0, 1200, 7):
        cold2.delete_document(f"d{i}")
        hot2.delete_document(f"d{i}")
    for q in ["w00 w01", '"w02 w03"']:
        rc = cold2.search(q, num=25)
        rh = hot2.search(q, num=25)
        assert rc.total == rh.total, q
        assert [h.key for h in rc.hits] == [h.key for h in rh.hits], q
    # second segment
    cold2.add_document("extra", {"a": "w00 w01 w00", "tagf": "x",
                                 "num": 1})
    hot2.add_document("extra", {"a": "w00 w01 w00", "tagf": "x",
                               "num": 1})
    cold2.commit()
    hot2.commit()
    assert cold2.segments[1].cold
    rc = cold2.search("w00 w01", num=25)
    rh = hot2.search("w00 w01", num=25)
    assert [h.key for h in rc.hits] == [h.key for h in rh.hits]


def test_cold_memory_stays_host():
    """The whole point: device bytes for a cold index exclude the CSR
    arrays."""
    cold = _build("host")
    seg = cold.segments[0]
    csr_bytes = (seg.text.doc_ids.nbytes + seg.text.freqs.nbytes
                 + seg.text.poskeys.nbytes)
    assert csr_bytes > 0
    # jax arrays would have a device buffer; numpy ones don't
    import jax
    assert not isinstance(seg.text.doc_ids, jax.Array)


def test_cold_compact_and_checkpoint(tmp_path):
    from redisearch_tpu.aux import checkpoint
    cold = _build("host")
    for i in range(0, 1200, 5):
        cold.delete_document(f"d{i}")
    cold.compact()
    seg = cold.segments[0]
    assert seg.cold and isinstance(seg.text.doc_ids, np.ndarray)
    before = [h.key for h in cold.search("w00 w01", num=25).hits]
    checkpoint.save(cold, str(tmp_path / "ck"))
    cold2 = checkpoint.load(str(tmp_path / "ck"))
    seg2 = cold2.segments[0]
    assert seg2.cold and isinstance(seg2.text.doc_ids, np.ndarray)
    after = [h.key for h in cold2.search("w00 w01", num=25).hits]
    assert after == before
