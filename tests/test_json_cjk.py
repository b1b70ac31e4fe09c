"""JSON-path indexes (ON JSON analog) + CJK bigram tokenization
(reference: src/json.c JSONPath fields; src/tokenize_cn.c friso)."""

import pytest

import redisearch_tpu as rs


def test_json_paths():
    c = rs.Client()
    c.ft_create("j", [
        rs.Field("$.title", rs.FieldType.TEXT, alias="title"),
        rs.Field("$.meta.price", rs.FieldType.NUMERIC, alias="price",
                 sortable=True),
        rs.Field("$.tags[*]", rs.FieldType.TAG, alias="tags"),
    ], on_json=True)
    c.hset("doc1", {"title": "nested json document",
                    "meta": {"price": 42},
                    "tags": ["red", "blue"]})
    c.hset("doc2", {"title": "another entry",
                    "meta": {"price": 7},
                    "tags": ["green"]})
    res = c.ft_search("j", "nested")
    assert [h.key for h in res] == ["doc1"]
    res = c.ft_search("j", "@price:[10 100]")
    assert [h.key for h in res] == ["doc1"]
    res = c.ft_search("j", "@tags:{blue}")
    assert [h.key for h in res] == ["doc1"]
    res = c.ft_search("j", "@tags:{green}")
    assert [h.key for h in res] == ["doc2"]


def test_json_array_index():
    from redisearch_tpu.utils.jsonpath import resolve
    doc = {"a": [{"b": 1}, {"b": 2}], "c": {"d": "x"}}
    assert resolve(doc, "$.a[0].b") == 1
    assert resolve(doc, "$.a[1].b") == 2
    assert resolve(doc, "$.c.d") == "x"
    assert resolve(doc, "$.missing") is None
    assert resolve(doc, "$.a[*].b") == [1, 2]


def test_cjk_dictionary_search():
    """Dictionary (MMSEG) segmentation: queries match when they segment
    to the same words as the document (reference: friso complex mode —
    a sub-word of a longer lexicon word does NOT match, same as the
    reference's Chinese search semantics)."""
    ix = rs.SearchIndex(rs.Schema(name="cn", fields=[
        rs.Field("t", rs.FieldType.TEXT)]))
    ix.add_document("d1", {"t": "我爱北京天安门"})
    ix.add_document("d2", {"t": "上海浦东机场"})
    ix.commit()
    res = ix.search("北京")
    assert [h.key for h in res] == ["d1"]
    res = ix.search("天安门")
    assert [h.key for h in res] == ["d1"]
    res = ix.search("浦东机场")      # the lexicon word the doc indexed
    assert [h.key for h in res] == ["d2"]
    res = ix.search("上海")
    assert [h.key for h in res] == ["d2"]
    assert ix.search("广州").total == 0


def test_cjk_mmseg_ambiguity():
    """The classic MMSEG disambiguation cases (rule order: length, avg,
    variance, degree of morphemic freedom)."""
    from redisearch_tpu.analysis.cjk import dict_available, mmseg
    assert dict_available()
    assert mmseg("研究生命起源") == ["研究", "生命", "起源"]
    assert mmseg("中华人民共和国") == ["中华人民共和国"]
    assert mmseg("主要研究生物学") == ["主要", "研究", "生物学"]
    assert mmseg("世界卫生组织成立了") == ["世界卫生组织", "成立", "了"]


def test_cjk_mixed_latin():
    ix = rs.SearchIndex(rs.Schema(name="mix", fields=[
        rs.Field("t", rs.FieldType.TEXT)]))
    ix.add_document("d", {"t": "TPU 加速器 hardware"})
    ix.commit()
    assert ix.search("加速器").total == 1
    assert ix.search("hardware").total == 1
    assert ix.search("tpu").total == 1


# ---------------------------------------------------------------------------
# Full JSONPath: filters / recursive descent / slices / unions / negative
# indices (reference: ReJSON JSONPath consumed via src/json.c)
# ---------------------------------------------------------------------------


def test_jsonpath_full_grammar():
    from redisearch_tpu.utils.jsonpath import resolve
    doc = {"store": {"book": [
        {"title": "A", "price": 5, "tags": ["x", "y"]},
        {"title": "B", "price": 15},
        {"title": "C", "price": 8, "sale": True}],
        "bike": {"price": 20}}, "n": 3}
    assert resolve(doc, "$.store.book[0].title") == "A"
    assert resolve(doc, "$.store.book[*].title") == ["A", "B", "C"]
    assert resolve(doc, "$..price") == [5, 15, 8, 20]
    assert resolve(doc, "$.store.book[1:3].title") == ["B", "C"]
    assert resolve(doc, "$.store.book[::2].title") == ["A", "C"]
    assert resolve(doc, "$.store.book[-1].title") == "C"
    assert resolve(doc, "$.store.book[0,2].title") == ["A", "C"]
    assert resolve(doc, "$['store']['bike']['price']") == 20
    assert resolve(doc, "$.store.book[?(@.price < 10)].title") == \
        ["A", "C"]
    assert resolve(doc, "$.store.book[?(@.price < 10 && @.sale == true)]"
                   ".title") == ["C"]
    assert resolve(doc, "$.store.book[?(@.title == 'B' || @.price == 5)]"
                   ".title") == ["A", "B"]
    assert resolve(doc, "$.store.book[?(@.sale)].title") == ["C"]
    assert resolve(doc, "$.store.book[?(!@.sale)].title") == ["A", "B"]
    assert resolve(doc, "$..book[?(@.tags[0] == 'x')].title") == ["A"]
    assert resolve(doc, "$.store.book[?(@.title =~ '^[AB]$')].title") == \
        ["A", "B"]
    assert resolve(doc, "$.nope") is None
    assert resolve(doc, "$.store.book[9]") is None


def test_jsonpath_indexing_with_filters_and_descent():
    import redisearch_tpu as rs
    c = rs.Client()
    c.ft_create("jfull", [
        rs.Field("$.items[?(@.active == true)].name", rs.FieldType.TAG,
                 alias="active_names"),
        rs.Field("$..price", rs.FieldType.NUMERIC, alias="prices"),
    ], on_json=True, prefixes=["j:"])
    c.hset("j:1", {"items": [
        {"name": "red", "active": True},
        {"name": "blue", "active": False}],
        "top": {"price": 9}})
    c.hset("j:2", {"items": [{"name": "green", "active": True}],
                       "deep": {"nest": {"price": 50}}})
    r = c.ft_search("jfull", "@active_names:{red}")
    assert [h.key for h in r.hits] == ["j:1"]
    r = c.ft_search("jfull", "@active_names:{blue}")
    assert r.total == 0
    r = c.ft_search("jfull", "@prices:[40 60]")
    assert [h.key for h in r.hits] == ["j:2"]
    r = c.ft_search("jfull", "@prices:[5 10]")
    assert [h.key for h in r.hits] == ["j:1"]
