"""Stateful mutation fuzz: random add/update/delete/compact sequences
checked against a model dict after every batch of operations.

The segment design (immutable sealed segments + staging tail + delete
bitmaps + compaction) has cross-segment invariants — a re-added doc must
mask its older copy in earlier segments, deletes must hide docs from
every query type, compaction must preserve exactly the live set — that
single-shot tests rarely stress.  Reference analog: the expire/gc flow
tests (tests/pytests/test_expire.py, test_gc.py).
"""

import numpy as np
import pytest

import redisearch_tpu as rs
from redisearch_tpu import Field, FieldType

WORDS = ["ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen"]


@pytest.mark.parametrize("seed", range(6))
def test_random_mutation_sequence(seed):
    rng = np.random.default_rng(5000 + seed)
    c = rs.Client()
    c.ft_create("mu", [Field("t", FieldType.TEXT),
                       Field("g", FieldType.TAG),
                       Field("n", FieldType.NUMERIC, sortable=True)])
    model: dict[str, dict] = {}

    def random_doc():
        return {"t": " ".join(WORDS[j] for j in rng.integers(0, 8, 3)),
                "g": "ab"[int(rng.integers(0, 2))],
                "n": float(rng.integers(0, 100))}

    def check():
        # term queries
        for w in (WORDS[int(rng.integers(0, 8))],
                  WORDS[int(rng.integers(0, 8))]):
            want = {k for k, d in model.items() if w in d["t"].split()}
            got = {h.key for h in
                   c.ft_search("mu", w, num=200, verbatim=True).hits}
            assert got == want, (w, sorted(got ^ want)[:6])
        # tag + numeric
        want = {k for k, d in model.items()
                if d["g"] == "a" and 20 <= d["n"] <= 70}
        got = {h.key for h in
               c.ft_search("mu", "@g:{a} @n:[20 70]", num=200).hits}
        assert got == want, sorted(got ^ want)[:6]
        # sortby must surface every live doc exactly once
        res = c.ft_search("mu", "*", sort_by="n", num=200)
        keys = [h.key for h in res.hits]
        assert sorted(keys) == sorted(model), (
            len(keys), len(model), set(keys) ^ set(model))
        assert res.total == len(model)

    for step in range(12):
        op_count = int(rng.integers(5, 25))
        for _ in range(op_count):
            op = rng.integers(0, 10)
            key = f"k{int(rng.integers(0, 40))}"
            if op < 5:          # add / overwrite
                doc = random_doc()
                c.hset(key, doc)
                model[key] = doc
            elif op < 8:        # delete
                if model:
                    key = list(model)[int(rng.integers(0, len(model)))]
                    c.ft_del("mu", key, delete_document=True)
                    model.pop(key)
            else:               # update a field (full re-add)
                if model:
                    key = list(model)[int(rng.integers(0, len(model)))]
                    doc = dict(model[key], n=float(rng.integers(0, 100)))
                    c.hset(key, doc)
                    model[key] = doc
        if step % 4 == 3:
            c._index("mu").compact()
        check()
