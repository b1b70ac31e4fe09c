"""Multi-value field tests (JSON arrays).

Reference behaviors: multi-value numeric fields index every array element
into the range tree (a doc matches if ANY value is in range); multi-value
vector fields score a doc by its BEST vector (VecSim multi-value support,
src/vector_index.h).  SORTBY uses the first value.
"""

import os
import tempfile

import numpy as np
import pytest

from redisearch_tpu.api import Client
from redisearch_tpu.aux import checkpoint
from redisearch_tpu.schema import Field, FieldType, VectorParams


@pytest.fixture()
def nclient():
    c = Client()
    c.ft_create("j", [Field("$.nums", FieldType.NUMERIC, alias="nums"),
                      Field("$.name", FieldType.TEXT, alias="name")],
                on_json=True)
    c.hset("d1", {"name": "alpha", "nums": [5, 100, 250]})
    c.hset("d2", {"name": "beta", "nums": [7]})
    c.hset("d3", {"name": "gamma", "nums": [300, 400]})
    c.hset("d4", {"name": "delta"})
    return c


class TestMultiNumeric:
    def test_any_value_matches_predicate(self, nclient):
        r = nclient.ft_search("j", "alpha @nums:[90 110]", no_content=True)
        assert r.total == 1 and r.hits[0].key == "d1"

    def test_generator_path_and_dedup(self, nclient):
        # pure range query drives the window generator; a doc with two
        # in-range values must appear exactly once
        r = nclient.ft_search("j", "@nums:[0 1000]", no_content=True)
        assert r.total == 3
        assert sorted(h.key for h in r.hits) == ["d1", "d2", "d3"]

    def test_range_touching_later_values(self, nclient):
        r = nclient.ft_search("j", "@nums:[240 260]", no_content=True)
        assert [h.key for h in r.hits] == ["d1"]
        r = nclient.ft_search("j", "@nums:[390 500]", no_content=True)
        assert [h.key for h in r.hits] == ["d3"]

    def test_sortby_uses_first_value(self, nclient):
        r = nclient.ft_search("j", "*", sort_by="nums", no_content=True)
        assert [h.key for h in r.hits] == ["d1", "d2", "d3"]


@pytest.fixture()
def vclient():
    c = Client()
    c.ft_create("mv", [
        Field("$.name", FieldType.TEXT, alias="name"),
        Field("$.vecs", FieldType.VECTOR, alias="vecs",
              vector=VectorParams(dim=4, algo="FLAT", metric="L2")),
    ], on_json=True)
    c.hset("d1", {"name": "alpha",
                  "vecs": [[0.1, 0, 0, 0], [10, 10, 10, 10]]})
    c.hset("d2", {"name": "beta", "vecs": [[5, 5, 5, 5]]})
    c.hset("d3", {"name": "gamma",
                  "vecs": [[0.2, 0, 0, 0], [0.3, 0, 0, 0]]})
    return c


Q = np.zeros(4, np.float32)


class TestMultiVector:
    def test_knn_best_vector_wins(self, vclient):
        r = vclient.ft_search("mv", "*=>[KNN 3 @vecs $b]",
                              params={"b": Q}, no_content=True, dialect=2)
        assert [h.key for h in r.hits] == ["d1", "d3", "d2"]
        assert r.hits[0].vector_distance < 0.02

    def test_filtered_knn_exact_gather(self, vclient):
        r = vclient.ft_search("mv", "(alpha|beta)=>[KNN 2 @vecs $b]",
                              params={"b": Q}, no_content=True, dialect=2)
        assert [h.key for h in r.hits] == ["d1", "d2"]

    def test_vector_range_any_vector(self, vclient):
        r = vclient.ft_search("mv", "@vecs:[VECTOR_RANGE 0.2 $b]",
                              params={"b": Q}, no_content=True, dialect=2)
        assert sorted(h.key for h in r.hits) == ["d1", "d3"]

    def test_no_duplicate_docs(self, vclient):
        r = vclient.ft_search("mv", "*=>[KNN 10 @vecs $b]",
                              params={"b": Q}, no_content=True, dialect=2)
        assert sorted(h.key for h in r.hits) == ["d1", "d2", "d3"]

    def test_checkpoint_roundtrip(self, vclient):
        ix = vclient._index("mv")
        ix.commit()
        with tempfile.TemporaryDirectory() as td:
            pth = os.path.join(td, "ck")
            checkpoint.save(ix, pth)
            ix2 = checkpoint.load(pth)
            r = ix2.search("*=>[KNN 3 @vecs $b]", params={"b": Q},
                           no_content=True)
            assert [h.key for h in r.hits] == ["d1", "d3", "d2"]
