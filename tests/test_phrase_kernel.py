"""Pallas phrase-kernel path (ops/intersect.py phrase_batch).

On CPU the batched executor routes eligible phrase queries through the
kernel's pure-XLA twin — these tests pin the twin against the engine's
window-algebra phrase path (single-query execute), which itself is
fuzz-pinned to the reference proximity model
(tests/test_fuzz_proximity.py).  The Pallas lowering is cross-checked
against the same twin on TPU (benchmarks/intersect_crosscheck.py).
"""

import numpy as np
import pytest

import redisearch_tpu as rs
from redisearch_tpu.query.engine import (QueryOptions, execute,
                                         execute_batch,
                                         _kernel_plan_phrase)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    vocab = [f"w{i:03d}" for i in range(60)]
    probs = (1.0 / np.arange(1, 61)) ** 1.1
    probs /= probs.sum()
    ix = rs.SearchIndex(rs.Schema(name="phk", fields=[
        rs.Field("a", rs.FieldType.TEXT),
        rs.Field("b", rs.FieldType.TEXT)]))
    docs = []
    for i in range(3000):
        words_a = rng.choice(vocab, size=10, p=probs)
        words_b = rng.choice(vocab, size=6, p=probs)
        docs.append((f"d{i}", {"a": " ".join(words_a),
                               "b": " ".join(words_b)}))
    ix.add_documents(docs)
    return ix


def _cases():
    return [
        '"w000 w001"',
        '"w001 w000"',
        '"w003 w004 w005"',
        '@a:"w000 w002"',
        '@b:"w001 w003"',
        '"w000 w000"',            # repeated term
        '"w000 w059"',            # rare second term
        '"w058 w059"',            # both rare
    ]


def test_phrase_kernel_path_is_eligible(corpus):
    ix = corpus
    seg = ix.segments[0]
    cq = ix.prepare('"w000 w001"', None, QueryOptions(k=10), 2)
    binding, P = cq.bind(seg)
    bk = binding.dyn["_buckets"]
    assert _kernel_plan_phrase(cq, seg, bk, 16) is not None


def test_phrase_batch_matches_single(corpus):
    ix = corpus
    seg = ix.segments[0]
    cases = _cases()
    cqs = [ix.prepare(q, None, QueryOptions(k=10), 2) for q in cases]
    batch = execute_batch(cqs, seg, 10)
    for q, cq, bres in zip(cases, cqs, batch):
        sres = execute(cq, seg, 10)
        bdocs = [int(d) for d, s in zip(bres.local_idx, bres.scores)
                 if d != 2**31 - 1 and s > -3e38][:10]
        sdocs = [int(d) for d, s in zip(sres.local_idx, sres.scores)
                 if d != 2**31 - 1 and s > -3e38][:len(bdocs)]
        assert bdocs == sdocs, q
        assert bres.count == sres.count, q
        bs = [s for s in bres.scores if s > -3e38][:len(bdocs)]
        ss = [s for s in sres.scores if s > -3e38][:len(bdocs)]
        np.testing.assert_allclose(bs, ss, rtol=1e-5, err_msg=q)


def test_phrase_batch_slop_inorder_matches_single(corpus):
    ix = corpus
    seg = ix.segments[0]
    cases = ["w000 w002", "w001 w004", "w000 w001 w003"]
    for slop in (0, 1, 3):
        cqs = [ix.prepare(q, None,
                          QueryOptions(k=10, slop=slop, inorder=True), 2)
               for q in cases]
        batch = execute_batch(cqs, seg, 10)
        for q, cq, bres in zip(cases, cqs, batch):
            sres = execute(cq, seg, 10)
            bdocs = [int(d) for d in bres.local_idx
                     if d != 2**31 - 1][:10]
            sdocs = [int(d) for d, s in zip(sres.local_idx, sres.scores)
                     if d != 2**31 - 1 and s > -3e38][:len(bdocs)]
            assert bdocs == sdocs, (q, slop)
            assert bres.count == sres.count, (q, slop)


def test_phrase_public_api_batch(corpus):
    ix = corpus
    res_many = ix.search_many(['"w000 w001"', '"w002 w003"'], k=10)
    for q, rm in zip(['"w000 w001"', '"w002 w003"'], res_many):
        rs_ = ix.search(q)
        assert [h.key for h in rm.hits] == [h.key for h in rs_.hits], q
        assert rm.total == rs_.total


def test_phrase_missing_term_empty(corpus):
    ix = corpus
    cqs = [ix.prepare('"w000 zzznope"', None, QueryOptions(k=10), 2)]
    batch = execute_batch(cqs, ix.segments[0], 10)
    assert batch[0].count == 0
