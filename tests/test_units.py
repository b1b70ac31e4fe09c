"""Unit tests for host-side components (reference analog: Rust in-crate
unit tests + tests/ctests data-structure tests, SURVEY.md §4.1-4.2)."""

import numpy as np
import pytest

from redisearch_tpu.analysis.porter import porter_stem
from redisearch_tpu.analysis.stemmer import Stemmer, is_supported_language
from redisearch_tpu.analysis.stopwords import StopWordList
from redisearch_tpu.analysis.tokenizer import Tokenizer
from redisearch_tpu.analysis.phonetics import dm_code
from redisearch_tpu.analysis.synonyms import SynonymMap
from redisearch_tpu.agg import expr as E
from redisearch_tpu.utils import wkt
from redisearch_tpu.utils.hll import HLL
from redisearch_tpu.utils.jsonpath import resolve
from redisearch_tpu.query.parser import QueryParser
from redisearch_tpu.query import ast


# -- porter ---------------------------------------------------------------
@pytest.mark.parametrize("word,stem", [
    ("caresses", "caress"), ("ponies", "poni"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("motoring", "motor"), ("sing", "sing"), ("conflated", "conflat"),
    ("troubling", "troubl"), ("sized", "size"), ("hopping", "hop"),
    ("falling", "fall"), ("hissing", "hiss"), ("fizzed", "fizz"),
    ("failing", "fail"), ("filing", "file"), ("happy", "happi"),
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("valenci", "valenc"), ("digitizer", "digit"),
    ("operator", "oper"), ("feudalism", "feudal"),
    ("decisiveness", "decis"), ("hopefulness", "hope"),
    ("formaliti", "formal"), ("formative", "form"),
    ("formalize", "formal"), ("electriciti", "electr"),
    ("electrical", "electr"), ("hopeful", "hope"), ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("adjustable", "adjust"),
    ("defensible", "defens"), ("irritant", "irrit"),
    ("replacement", "replac"), ("adjustment", "adjust"),
    ("dependent", "depend"), ("adoption", "adopt"), ("communism", "commun"),
    ("activate", "activ"), ("angulariti", "angular"),
    ("homologous", "homolog"), ("effective", "effect"), ("bowdlerize",
                                                         "bowdler"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
])
def test_porter_published_vectors(word, stem):
    assert porter_stem(word) == stem


def test_stemmer_languages():
    assert is_supported_language("FRENCH")
    assert not is_supported_language("klingon")
    assert Stemmer("french").stem("chanteuses") is not None
    assert Stemmer("none").stem("running") is None


# -- tokenizer --------------------------------------------------------------
def test_tokenizer_positions_and_offsets():
    toks = list(Tokenizer().tokenize("Hello, the World!"))
    assert [t.tok for t in toks] == ["hello", "the", "world"]
    assert [t.pos for t in toks] == [1, 2, 3]
    assert toks[1].is_stopword
    text = "Hello, the World!"
    t0 = toks[0]
    assert text.encode()[t0.start_byte:t0.end_byte] == b"Hello"


def test_tokenizer_escapes():
    toks = list(Tokenizer().tokenize(r"hello\-world foo"))
    assert [t.tok for t in toks] == ["hello-world", "foo"]


def test_tokenizer_unicode():
    toks = list(Tokenizer().tokenize("Straße CAFÉ"))
    assert [t.tok for t in toks] == ["strasse", "café"]


# -- phonetics ---------------------------------------------------------------
def test_double_metaphone_sounds_alike():
    assert dm_code("smith") == dm_code("smyth")
    assert dm_code("phone") == dm_code("fone")
    assert dm_code("night") == dm_code("nite")
    assert dm_code("cat") != dm_code("dog")


# -- synonyms ----------------------------------------------------------------
def test_synonym_groups():
    sm = SynonymMap()
    sm.update("1", ["car", "automobile"])
    sm.update("2", ["car", "vehicle"])
    assert sm.group_ids("car") == {"1", "2"}
    assert sm.group_terms("automobile") == ["~1"]
    assert sm.dump()["car"] == ["1", "2"]


# -- expression engine ---------------------------------------------------------
@pytest.mark.parametrize("expr,row,expected", [
    ("1 + 2 * 3", {}, 7.0),
    ("(1 + 2) * 3", {}, 9.0),
    ("2 ^ 10", {}, 1024.0),
    ("@x % 3", {"x": 10}, 1.0),
    ("@a > 5 && @b < 2", {"a": 6, "b": 1}, 1.0),
    ("!exists(@nope)", {}, 1.0),
    ("upper(@s)", {"s": "abc"}, "ABC"),
    ("substr(@s, 1, 2)", {"s": "abcdef"}, "bc"),
    ("strlen(@s)", {"s": "hello"}, 5.0),
    ("contains(@s, 'l')", {"s": "hello"}, 2.0),
    ("startswith(@s, 'he')", {"s": "hello"}, 1.0),
    ("to_number(@s) + 1", {"s": "41"}, 42.0),
    ("case(@x > 0, 'pos', 'neg')", {"x": 1}, "pos"),
    ("floor(log2(@x))", {"x": 1000}, 9.0),
    ("sqrt(@x)", {"x": 144}, 12.0),
    ("abs(0 - @x)", {"x": 5}, 5.0),
    ("format('%s-%d', @s, @n)", {"s": "a", "n": 3}, "a-3"),
    ("hour(@t)", {"t": 3600 * 5 + 60}, 5.0),
    ("year(@t)", {"t": 0}, 1970.0),
])
def test_expressions(expr, row, expected):
    out = E.evaluate(E.parse(expr), row)
    if isinstance(expected, float):
        assert float(out) == pytest.approx(expected)
    else:
        assert out == expected


def test_expr_null_propagation():
    assert E.evaluate(E.parse("@missing + 1"), {}) is None
    assert E.evaluate(E.parse("exists(@missing)"), {}) == 0.0


def test_geodistance():
    # Paris -> London ~ 344 km
    d = E.evaluate(E.parse('geodistance(@a, @b)'),
                   {"a": "2.3522,48.8566", "b": "-0.1276,51.5072"})
    assert 330_000 < d < 360_000


# -- WKT ------------------------------------------------------------------------
def test_wkt_parse_and_predicates():
    sq = wkt.parse("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    inner = wkt.parse("POLYGON((1 1, 2 1, 2 2, 1 2, 1 1))")
    pt = wkt.parse("POINT(3 3)")
    far = wkt.parse("POINT(10 10)")
    assert wkt.within(inner, sq)
    assert not wkt.within(sq, inner)
    assert wkt.contains(sq, pt)
    assert wkt.intersects(inner, sq)
    assert wkt.disjoint(far, sq)


def test_wkt_polygon_with_hole():
    donut = wkt.parse(
        "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    assert wkt.contains(donut, wkt.parse("POINT(1 1)"))
    assert not wkt.contains(donut, wkt.parse("POINT(5 5)"))  # in the hole
    # polygon fully inside the hole: neither within nor intersecting
    in_hole = wkt.parse("POLYGON((4.5 4.5, 5.5 4.5, 5.5 5.5, 4.5 5.5, "
                        "4.5 4.5))")
    assert not wkt.within(in_hole, donut)
    assert not wkt.intersects(in_hole, donut)
    assert wkt.disjoint(in_hole, donut)
    # polygon straddling the hole boundary: intersects but not within
    straddle = wkt.parse("POLYGON((3 3, 5 3, 5 5, 3 5, 3 3))")
    assert wkt.intersects(straddle, donut)
    assert not wkt.within(straddle, donut)
    # polygon surrounding the hole entirely: not within (hole carves it)
    around = wkt.parse("POLYGON((2 2, 8 2, 8 8, 2 8, 2 2))")
    assert not wkt.within(around, donut)
    assert wkt.intersects(around, donut)
    # polygon in the solid ring area: within
    solid = wkt.parse("POLYGON((1 1, 3 1, 3 3, 1 3, 1 1))")
    assert wkt.within(solid, donut)


# -- HLL --------------------------------------------------------------------------
def test_hll_accuracy():
    h = HLL()
    for i in range(50_000):
        h.add(f"item-{i}")
    est = h.count()
    assert abs(est - 50_000) / 50_000 < 0.05
    # merge
    h2 = HLL()
    for i in range(25_000, 75_000):
        h2.add(f"item-{i}")
    h.merge(h2)
    est = h.count()
    assert abs(est - 75_000) / 75_000 < 0.05


# -- jsonpath ----------------------------------------------------------------------
def test_jsonpath_edge_cases():
    assert resolve({"a": 1}, "$.a") == 1
    assert resolve({"a": {"b": [10, 20]}}, "$.a.b[1]") == 20
    assert resolve([], "$.x") is None
    assert resolve({"a": [1, 2, 3]}, "$.a[*]") == [1, 2, 3]


# -- query parser -------------------------------------------------------------------
def _parse(q, **kw):
    return QueryParser(**kw).parse(q)


def test_parser_tree_shapes():
    t = _parse("aa bb | cc")
    assert isinstance(t, ast.UnionNode)
    assert isinstance(t.kids[0], ast.IntersectNode)
    t = _parse("-bad ~maybe good")
    kinds = [type(k).__name__ for k in t.kids]
    assert kinds == ["NotNode", "OptionalNode", "TokenNode"]


def test_parser_field_scoping():
    t = _parse("@title:(hello world)")
    assert all(n.fieldmask_attrs == ["title"]
               for n in ast.walk(t) if isinstance(n, ast.TokenNode))
    t = _parse("@a|b:term")
    tok = next(n for n in ast.walk(t) if isinstance(n, ast.TokenNode))
    assert tok.fieldmask_attrs == ["a", "b"]


def test_parser_numeric_operators():
    t = _parse("@price>=100")
    assert isinstance(t, ast.NumericNode) and t.lo == 100
    t = _parse("@price!=5")
    assert isinstance(t, ast.NotNode)
    t = _parse("@price:[(10 (20]")
    assert t.lo_excl and t.hi_excl


def test_parser_params():
    t = _parse("@n:[$lo $hi]", params={"lo": 1, "hi": 9})
    assert t.lo == 1 and t.hi == 9
    t = _parse("$term", params={"term": "hello"})
    assert isinstance(t, ast.TokenNode) and t.term == "hello"


def test_parser_vector_syntax():
    t = _parse("(@cat:{x})=>[KNN $k @v $b EF_RUNTIME 64 AS dist]",
               params={"k": 7, "b": np.zeros(4, np.float32)})
    assert isinstance(t, ast.VectorNode)
    assert t.k == 7 and t.ef_runtime == 64 and t.score_alias == "dist"
    assert isinstance(t.child, ast.TagNode)
    t = _parse("@v:[VECTOR_RANGE 0.5 $b]", params={"b": [0, 0]})
    assert t.mode == "RANGE" and t.radius == 0.5


def test_parser_attributes():
    t = _parse('"big apple"=>{$slop: 2; $inorder: true;}')
    assert isinstance(t, ast.PhraseNode)
    assert t.slop == 2 and t.inorder


def test_parser_affixes_fuzzy_wildcard():
    assert isinstance(_parse("hel*"), ast.AffixNode)
    t = _parse("*llo")
    assert t.suffix and not t.prefix
    t = _parse("%%hxllo%%")
    assert isinstance(t, ast.FuzzyNode) and t.max_dist == 2
    t = _parse("w'he?lo*'")
    assert isinstance(t, ast.WildcardQueryNode)


def test_parser_errors():
    from redisearch_tpu.utils.errors import ParamError, QuerySyntaxError
    with pytest.raises(QuerySyntaxError):
        _parse("(unclosed")
    with pytest.raises(QuerySyntaxError):
        _parse("@f:[1 2 3]")
    with pytest.raises(ParamError):
        _parse("$nope")


def test_stopword_only_query():
    t = _parse("the an is")
    assert isinstance(t, ast.EmptyNode)


def test_snowball_languages_exact():
    """True Snowball algorithms (via nltk's generated Snowball code) for
    the languages the reference bundles from deps/snowball."""
    cases = {
        "french": [("continuellement", "continuel"),
                   ("majestueusement", "majestu")],
        "german": [("aufeinanderfolgenden", "aufeinanderfolg")],
        "spanish": [("torturadores", "tortur")],
        "portuguese": [("quilométricas", "quilométr")],
        "italian": [("abbandonata", "abbandon")],
        "russian": [("непосредственными", "непосредствен")],
        "dutch": [("lichamelijkheden", "licham")],
        "swedish": [("klokheten", "klok")],
    }
    for lang, pairs in cases.items():
        st = Stemmer(lang)
        for word, want in pairs:
            assert (st.stem(word) or word) == want, (lang, word)


def test_snowball_ext_languages():
    """Ported Snowball algorithms (snowball_ext.py) for the languages
    nltk lacks — reference bundles all ~30 (src/language.c:22-52).
    Pins conflation of inflected forms onto one stem per language."""
    conflate = {
        "turkish": ["kitaplarından", "kitapları", "kitap"],
        "greek": ["υπολογιστές", "υπολογιστής"],
        "catalan": ["cantaven", "cantar"],
        "basque": ["etxearen", "etxea", "etxe"],
        "lithuanian": ["namuose", "namas"],
        "serbian": ["кућама", "kućama", "kuća"],  # cyrillic == latin
        "tamil": ["புத்தகங்கள்", "புத்தகம்"],
        "yiddish": ["געזאגט", "זאגן"],   # ge- participle ~ infinitive
    }
    for lang, words in conflate.items():
        st = Stemmer(lang)
        stems = {st.stem(w) or w for w in words}
        assert len(stems) == 1, (lang, {w: st.stem(w) for w in words})
    # every reference language resolves to a non-identity stemmer
    from redisearch_tpu.analysis.snowball_ext import SNOWBALL_EXT
    for lang in ("tagalog", "indonesian", "malay", "hindi", "nepali",
                 "irish", "turkish", "greek", "catalan", "basque",
                 "armenian", "lithuanian", "serbian", "tamil",
                 "yiddish"):
        assert lang in SNOWBALL_EXT, lang


def test_native_resp_parser():
    """Native RESP codec (native/resp_codec.cpp): streaming parse of
    arrays-of-bulk-strings, partial feeds, pipelining, inline commands."""
    import pytest as _pytest
    from redisearch_tpu import native_resp
    if not native_resp.available():
        _pytest.skip("no native toolchain")
    p = native_resp.RespParser()
    # pipelined commands in one feed
    p.feed(b"*2\r\n$4\r\nPING\r\n$3\r\nfoo\r\n*1\r\n$4\r\nPING\r\n")
    assert p.next() == ["PING", "foo"]
    assert p.next() == ["PING"]
    assert p.next() is None
    # byte-at-a-time partial feed
    msg = b"*3\r\n$3\r\nSET\r\n$1\r\nk\r\n$5\r\nhello\r\n"
    for i in range(len(msg)):
        assert p.next() is None or True
        p.feed(msg[i:i + 1])
    assert p.next() == ["SET", "k", "hello"]
    # inline command
    p.feed(b"PING inline arg\r\n")
    assert p.next() == ["PING", "inline", "arg"]
    # binary-safe payload (vector blob bytes)
    blob = bytes(range(256))
    p.feed(b"*2\r\n$3\r\nGET\r\n$256\r\n" + blob + b"\r\n")
    out = p.next()
    assert out[0] == "GET"
    assert out[1].encode("utf-8", "surrogateescape") == blob
    # protocol error
    p.feed(b"*x\r\n")
    import pytest as _p2
    with _p2.raises(ValueError):
        while p.next() is not None:
            pass


def test_double_metaphone_reference_vectors():
    """Primary+secondary codes pinned to the reference implementation's
    outputs (deps/phonetics double_metaphone.c, verified by compiling it
    as an oracle and fuzzing 30k words — 0 mismatches)."""
    from redisearch_tpu.analysis.phonetics import dm_codes
    vectors = {
        "smith": ("SM0", "XMT"),
        "schmidt": ("XMT", "SMT"),
        "thomas": ("TMS", "TMS"),
        "jose": ("HS", "HS"),
        "xavier": ("SF", "SFR"),
        "michael": ("MKL", "MXL"),
        "catherine": ("K0RN", "KTRN"),
        "knight": ("NT", "NT"),
        "ghiradelli": ("JRTL", "JRTL"),
        "czerny": ("SRN", "XRN"),
        "focaccia": ("FKX", "FKX"),
        "bellocchio": ("PLX", "PLX"),
        "edge": ("AJ", "AJ"),
        "rough": ("RF", "RF"),
        "filipowicz": ("FLPT", "FLPF"),
        "wasserman": ("ASRM", "FSRM"),
        "island": ("ALNT", "ALNT"),
        "sugar": ("XKR", "SKR"),
    }
    for w, (p, q) in vectors.items():
        assert dm_codes(w) == (p, q), w


def test_dump_phonetic_hash_debug():
    import redisearch_tpu as rs
    c = rs.Client()
    assert c.ft_debug("DUMP_PHONETIC_HASH", "smith") == ["SM0", "XMT"]


def test_dedup_adjacent_handles_invalid_gaps():
    """dedup_adjacent must catch duplicates separated by invalidated
    lanes (phrase pivots with a failed middle candidate), not just
    adjacent ones."""
    import jax.numpy as jnp
    from redisearch_tpu.ops import window as W

    docs = jnp.array([3, 3, 3, 7, 9, 9], jnp.int32)
    valid = jnp.array([True, False, True, True, False, True])
    d, v = W.dedup_adjacent(docs, valid)
    out = [int(x) for x in d[v]]
    assert out == [3, 7, 9]


def test_wkt_spherical_edges_are_geodesics():
    """SPHERICAL mode must treat polygon edges as great circles
    (reference: boost::geometry geographic cs, rtree.hpp:56).  The
    southern edge of a quad between (0,60) and (90,60) bulges to
    ~67.8N at lon 45 — a point at (45,61) is inside the planar
    lon/lat quad but OUTSIDE the geodesic one."""
    from redisearch_tpu.utils import wkt as wk

    quad = wk.parse("POLYGON((0 60, 90 60, 90 80, 0 80, 0 60))")
    below_arc = wk.parse("POINT(45 61)")
    inside = wk.parse("POINT(45 70)")
    assert wk.within(below_arc, quad, spherical=False)       # planar: in
    assert not wk.within(below_arc, quad, spherical=True)    # geodesic: out
    assert wk.within(inside, quad, spherical=True)
    assert wk.contains(quad, inside, spherical=True)
    assert not wk.contains(quad, below_arc, spherical=True)
    assert wk.disjoint(below_arc, quad, spherical=True)
    assert wk.intersects(inside, quad, spherical=True)
    # antimeridian wrap still works under the projection: a polygon
    # straddling 180E matches a point given with negative longitude
    am = wk.parse("POLYGON((179 -1, 181 -1, 181 1, 179 1, 179 -1))")
    p = wk.parse("POINT(-179.5 0)")
    assert wk.within(p, am, spherical=True)
    assert not wk.within(p, am, spherical=False)


def test_two_phase_knn_clustered():
    """Two-phase f32 KNN (bf16 candidate scan + exact f32 rescore,
    ops/vector.py): the quality contract on adversarially CLUSTERED
    vectors (ADVICE r3 item 2).  When distance deltas sit below the
    candidate pass's resolution (bf16 matmul + approx top-C), top-k
    MEMBERSHIP among near-ties is not guaranteed — but (a) returned
    distances are the exact f32 values, and (b) every returned distance
    is within the scan's relative error band of the oracle's k-th
    distance, i.e. the answer is quality-equivalent.  On separated
    clusters membership must be exact."""
    import jax.numpy as jnp

    from redisearch_tpu.ops.vector import knn_batch

    rng = np.random.default_rng(11)
    n, d, k, Bq = 4096, 64, 10, 16
    center = rng.normal(size=(d,)).astype(np.float32)
    # (1) near-tie cluster: deltas ~1e-3 of magnitude
    vecs = (center[None, :]
            + 1e-3 * rng.normal(size=(n, d))).astype(np.float32)
    Q = (center[None, :]
         + 1e-3 * rng.normal(size=(Bq, d))).astype(np.float32)
    sq = np.sum(vecs.astype(np.float64) ** 2, 1).astype(np.float32)
    present = np.ones(n, bool)
    dists, idx = map(np.asarray, knn_batch(
        jnp.asarray(vecs), jnp.asarray(sq), jnp.asarray(present),
        jnp.asarray(Q), k, "L2"))
    # f64 oracle WITHOUT the sq-2dot+qsq cancellation (at tie scale
    # ~6e-5 the f32 formula itself carries ~1e-5 of rounding noise)
    d64 = ((vecs.astype(np.float64)[None, :, :]
            - Q.astype(np.float64)[:, None, :]) ** 2).sum(2)
    true_at_idx = np.take_along_axis(d64, idx, axis=1)
    # (a) returned values match the true distances up to f32 formula
    # noise (measured max ~1.1e-5 here)
    np.testing.assert_allclose(dists, true_at_idx,
                               rtol=1e-3, atol=3e-5)
    # (b) quality band: every returned row's TRUE distance is within a
    # hair of the oracle's k-th (measured max excess ~7e-6)
    kth = np.sort(d64, axis=1)[:, k - 1]
    assert np.all(true_at_idx <= kth[:, None] + 3e-5), (
        float((true_at_idx - kth[:, None]).max()))
    # (2) separated clusters: membership must be exact
    far = vecs + rng.normal(size=(n, d)).astype(np.float32) * 2.0
    far[:64] = center[None, :] + 1e-2 * rng.normal(
        size=(64, d)).astype(np.float32)
    sqf = np.sum(far.astype(np.float64) ** 2, 1).astype(np.float32)
    d2, i2 = map(np.asarray, knn_batch(
        jnp.asarray(far), jnp.asarray(sqf), jnp.asarray(present),
        jnp.asarray(Q), k, "L2"))
    df2 = (sqf[None, :] - 2.0 * (Q.astype(np.float32) @ far.T)
           + np.sum(Q ** 2, 1)[:, None])
    oracle2 = np.argsort(df2, axis=1)[:, :k]
    rec = np.mean([len(set(i2[b]) & set(oracle2[b])) / k
                   for b in range(Bq)])
    assert rec >= 0.99, rec
