"""Oracle diff-fuzz of the tagalog stemmer port against the reference's
vendored Snowball source, executed directly by tests/snowball_oracle.py.

The reference vendors exactly ONE compilable Snowball algorithm in this
checkout (deps/stemmers/algorithms/tagalog.sbl; the deps/snowball
submodule is empty, so the other ~30 languages' .sbl sources are not
present and cannot be oracle-diffed offline — their ports are pinned by
spec vectors in test_units.py instead).  This test holds the tagalog
port to the same standard as phonetics (analysis/phonetics.py was
diff-verified 0/30k against the reference dep): 0 mismatches over a
seeded 60k-word fuzz corpus.
"""

import os
import random

import pytest

from redisearch_tpu.analysis.snowball_ext import stem_tagalog

SBL = "/root/reference/deps/stemmers/algorithms/tagalog.sbl"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SBL),
    reason="reference tagalog.sbl not available on this machine")


@pytest.fixture(scope="module")
def oracle():
    from tests.snowball_oracle import SnowballMachine
    with open(SBL) as f:
        return SnowballMachine(f.read())


def test_oracle_known_words(oracle):
    # sanity: the interpreter itself behaves like Snowball tagalog
    assert oracle.stem("araw-araw") == "araw"
    assert oracle.stem("kanyang") == "kanya"
    assert oracle.stem("kapangyarihan") == "kapangyarihan"  # exception1
    assert oracle.stem("kumain") == "kain"
    assert oracle.stem("binili") == "bili"
    assert oracle.stem("pinakamaganda") == "ganda"
    assert oracle.stem("gugustuhin") == "gusto"
    assert oracle.stem("nakikipaglaro") == "laro"
    # prefix-class fallthrough: 'magpa' among fails on 2-char remainder,
    # the or-chain then lets 'mag' fire
    assert oracle.stem("magpaza") == "paza"


def _morph_corpus(n, seed):
    random.seed(seed)
    cons, vow = "bkdglmnprstwyhcfjqvxz", "aeiou"
    prefixes = ["", "ma", "na", "ni", "pa", "ka", "mag", "nag", "pag",
                "pam", "pan", "ipa", "mai", "man", "may", "nam", "tag",
                "mapa", "taga", "ipag", "tiga", "pala", "pina", "pang",
                "naka", "nang", "mang", "sing", "magpa", "pagka",
                "pinag", "mapag", "pakiki", "napaka", "pinaka",
                "ipinag", "makapag", "nakapag", "tagapag", "makipag",
                "nakipag", "pagpapa", "pinagka", "pinakama", "panganga",
                "nakikipag", "pakikipag"]
    suffixes = ["", "an", "in", "han", "hin", "ng", "g", "yong", "iong",
                "tong", "ang", "ing"]

    def syll():
        s = random.choice(cons) + random.choice(vow)
        if random.random() < 0.3:
            s += random.choice(cons)
        return s

    words = set()
    while len(words) < n:
        r = "".join(syll() for _ in range(random.randint(1, 3)))
        ifx = random.choice(["", "um", "in"])
        if ifx and r[0] not in vow:
            r = r[0] + ifx + r[1:]
        if random.random() < 0.2:
            k = random.choice([1, 2, 3])
            r = r[:k] + r
        words.add(random.choice(prefixes) + r + random.choice(suffixes))
    return words


def _random_corpus(n, seed):
    random.seed(seed)
    alpha = "abcdefghijklmnopqrstuvwxyz-"
    words = set()
    while len(words) < n:
        words.add("".join(random.choice(alpha)
                          for _ in range(random.randint(1, 14))))
    # the .sbl's din+iya/ita 'not(...)' guard is unsatisfiable under
    # Snowball semantics — pin that family explicitly
    for base in ("iya", "ita", "iyan", "itan", "aniya", "anita"):
        for pre in ("d", "din", "dini", "dinid", "gin", "bin", "sin"):
            for suf in ("", "n", "ng", "han", "an", "in", "u", "r", "h"):
                words.add(pre + base + suf)
    return words


def test_tagalog_fuzz_morphological(oracle):
    words = _morph_corpus(40_000, seed=42)
    bad = [(w, oracle.stem(w), stem_tagalog(w))
           for w in words if oracle.stem(w) != stem_tagalog(w)]
    assert not bad, f"{len(bad)} mismatches, first 10: {bad[:10]}"


def test_tagalog_fuzz_random(oracle):
    words = _random_corpus(20_000, seed=7)
    bad = [(w, oracle.stem(w), stem_tagalog(w))
           for w in words if oracle.stem(w) != stem_tagalog(w)]
    assert not bad, f"{len(bad)} mismatches, first 10: {bad[:10]}"
