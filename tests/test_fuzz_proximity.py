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
