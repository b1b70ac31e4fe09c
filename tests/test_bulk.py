"""Native bulk indexer: parity with the Python builder."""

import numpy as np
import pytest

import redisearch_tpu as rs
from redisearch_tpu import native


def _mk_schema(name):
    return rs.Schema(name=name, fields=[
        rs.Field("title", rs.FieldType.TEXT, weight=2.0),
        rs.Field("body", rs.FieldType.TEXT),
        rs.Field("tagf", rs.FieldType.TAG, sortable=True),
        rs.Field("num", rs.FieldType.NUMERIC, sortable=True),
    ])


DOCS = [
    ("a", {"title": "Hello World", "body": "the quick brown foxes jumping",
           "tagf": "x,y", "num": 1}),
    ("b", {"title": "hello again", "body": "running runs runner",
           "tagf": "y", "num": 2}),
    ("c", {"title": "Escaped\\-token here", "body": "brown fox",
           "tagf": "z", "num": 3}),
    ("d", {"title": "", "body": "punctuation, galore!!! (parens) [brackets]",
           "num": 4}),
]


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_matches_python_builder():
    ix_py = rs.SearchIndex(_mk_schema("py"))
    for k, f in DOCS:
        ix_py.add_document(k, f)
    ix_py.commit()
    ix_nat = rs.SearchIndex(_mk_schema("nat"))
    n = ix_nat.add_documents(DOCS)
    assert n == 4
    seg_py, seg_nat = ix_py.segments[0], ix_nat.segments[0]
    # identical term dictionaries (as sets; insertion order may differ)
    assert set(seg_py.terms.terms) == set(seg_nat.terms.terms)
    # identical per-term postings
    import numpy as np
    for term in seg_py.terms.terms:
        a, b = seg_py.terms.lookup(term), seg_nat.terms.lookup(term)
        oa, ob = seg_py.text.term_offsets_np, seg_nat.text.term_offsets_np
        docs_a = np.asarray(seg_py.text.doc_ids)[oa[a]:oa[a + 1]]
        docs_b = np.asarray(seg_nat.text.doc_ids)[ob[b]:ob[b + 1]]
        assert list(docs_a) == list(docs_b), term
        fa = np.asarray(seg_py.text.freqs)[oa[a]:oa[a + 1]]
        fb = np.asarray(seg_nat.text.freqs)[ob[b]:ob[b + 1]]
        assert np.allclose(fa, fb), term
    # identical doclens
    assert np.allclose(np.asarray(seg_py.doclen)[:4],
                       np.asarray(seg_nat.doclen)[:4])


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_search_equivalence():
    ix_py = rs.SearchIndex(_mk_schema("py2"))
    for k, f in DOCS:
        ix_py.add_document(k, f)
    ix_nat = rs.SearchIndex(_mk_schema("nat2"))
    ix_nat.add_documents(DOCS)
    for q in ["hello", "hello world", '"brown fox"', "run", "@tagf:{y}",
              "@num:[2 3]", "brow*", "hello -again"]:
        a = ix_py.search(q)
        b = ix_nat.search(q)
        assert {h.key for h in a} == {h.key for h in b}, q
        assert a.total == b.total, q


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_bulk_phrase_positions():
    ix = rs.SearchIndex(_mk_schema("ph"))
    ix.add_documents([("p1", {"title": "one two three", "body": "x"}),
                      ("p2", {"title": "three two one", "body": "x"})])
    res = ix.search('"one two"')
    assert {h.key for h in res} == {"p1"}
    res = ix.search('"two one"')
    assert {h.key for h in res} == {"p2"}


def test_execute_batch_vmap_matches_single():
    """Chunked-vmap batched execution returns exactly the same results
    as per-query execute() across query shapes."""
    import numpy as np
    import redisearch_tpu as rs
    from redisearch_tpu.query.engine import (QueryOptions, execute,
                                             execute_batch)
    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    ix = rs.SearchIndex(rs.Schema(name="vb", fields=[
        rs.Field("t", rs.FieldType.TEXT),
        rs.Field("x", rs.FieldType.NUMERIC)]))
    for i in range(400):
        ix.add_document(f"d{i}", {
            "t": " ".join(rng.choice(words, 5)), "x": float(i)})
    ix.commit()
    seg = ix.segments[0]
    queries = []
    for i in range(32):
        a, b = rng.choice(words, 2, replace=False)
        q = [f"{a} {b}", f"{a} | {b}", f'"{a} {b}"',
             f"{a} @x:[{i} {i+200}]"][i % 4]
        queries.append(q)
    cqs = [ix.prepare(q, None, QueryOptions(k=10), 2) for q in queries]
    batch = execute_batch(cqs, seg, 10)
    for cq, got in zip(cqs, batch):
        want = execute(cq, seg, 10)
        assert got.count == want.count, cq
        # batch paths return exactly k lanes; the single path keeps
        # the pow2-padded k — compare the top-k prefix
        n = len(got.local_idx)
        assert list(got.local_idx) == list(want.local_idx)[:n]
        assert np.allclose(got.scores, want.scores[:n], rtol=1e-5)
