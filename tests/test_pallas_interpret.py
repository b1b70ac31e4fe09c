"""CPU CI coverage of the Pallas (Mosaic) kernel lowerings.

The TPU serving path routes kernel-eligible queries to the Pallas
mega-kernels in ops/intersect.py and ops/groupby.py; off-TPU the same
calls take the pure-XLA twins, so a Mosaic regression would ship
silently (VERDICT r2 weak #5).  These tests force `interpret=True`
via the modules' `_INTERPRET` hook and pin the interpreted kernels
against their XLA oracles on random window layouts — the same
cross-check `benchmarks/intersect_crosscheck.py` runs on real TPU.

Window layouts mirror the engine's packing (engine._pack_windows):
flat int32/f32 arrays of whole 128-lane rows, windows starting at
arbitrary (start % 128) offsets, INT32_MAX padding past the live
length.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from redisearch_tpu.ops import groupby as GB
from redisearch_tpu.ops import intersect as IK

BLK = IK.BLK
N_DOCS = 100_000


@pytest.fixture
def interpret_mode():
    """Force the Pallas lowerings (interpret mode) on CPU.

    intersect_batch/phrase_batch are jitted with the path decision
    taken at trace time, so the jit caches must be dropped on both
    toggles."""
    IK._INTERPRET = True
    GB._INTERPRET = True
    jax.clear_caches()
    yield
    IK._INTERPRET = False
    GB._INTERPRET = False
    jax.clear_caches()


def _make_windows(rng, B, Ws, overlap=0.5):
    """Random sorted posting windows sharing a doc pool (so slots
    genuinely intersect), at arbitrary in-row offsets."""
    T = len(Ws)
    rows_total = (B * sum(Ws)) // BLK + 4 * B * T
    doc_ids = np.full((rows_total, BLK), 2**31 - 1, np.int32)
    freqs = np.zeros((rows_total, BLK), np.float32)
    masks = np.zeros((rows_total, BLK), np.int32)
    dl = np.abs(rng.normal(24.0, 6.0, (rows_total, BLK))
                ).astype(np.float32) + 1.0
    meta = np.zeros((B, 3 * T), np.int32)
    fmeta = np.zeros((B, T + 1), np.float32)
    at = 0
    for b in range(B):
        pool = np.sort(rng.choice(N_DOCS, size=max(Ws) * 2,
                                  replace=False))
        for t, W in enumerate(Ws):
            live = int(rng.integers(max(1, W // 2), W + 1))
            take = rng.random(len(pool)) < overlap
            shared = pool[take][:live]
            extra = rng.choice(N_DOCS, size=live - len(shared),
                               replace=False)
            docs = np.unique(np.concatenate(
                [shared, extra]))[:live].astype(np.int32)
            live = len(docs)
            off = int(rng.integers(0, BLK))
            flat = at * BLK + off
            rows_w = (off + W + BLK - 1) // BLK
            fd = doc_ids[at:at + rows_w].reshape(-1)
            ff = freqs[at:at + rows_w].reshape(-1)
            fm = masks[at:at + rows_w].reshape(-1)
            fd[off:off + live] = docs
            ff[off:off + live] = rng.integers(1, 8, live
                                              ).astype(np.float32)
            fm[off:off + live] = np.where(rng.random(live) < 0.9, 3, 4)
            doc_ids[at:at + rows_w] = fd.reshape(rows_w, BLK)
            freqs[at:at + rows_w] = ff.reshape(rows_w, BLK)
            masks[at:at + rows_w] = fm.reshape(rows_w, BLK)
            meta[b, t] = flat
            meta[b, T + t] = live
            meta[b, 2 * T + t] = 3
            at += rows_w + 1
        fmeta[b, :T] = rng.uniform(0.5, 4.0, T)
        fmeta[b, T] = 24.0
    return (jnp.asarray(meta), jnp.asarray(fmeta),
            jnp.asarray(doc_ids.reshape(-1)),
            jnp.asarray(freqs.reshape(-1)),
            jnp.asarray(masks.reshape(-1)),
            jnp.asarray(dl.reshape(-1)))


def _check_intersect(args, *, T, Ws, groups, pivot_g=0, k=16,
                     dense=()):
    assert IK._use_pallas(), "interpret hook not active"
    kd, ks, kc = jax.device_get(IK.intersect_batch(
        *args, T=T, Ws=Ws, groups=groups, pivot_g=pivot_g, k=k,
        dense=dense))
    xd, xs, xc = jax.device_get(IK._xla_impl(
        *args, T=T, Ws=Ws, groups=groups, pivot_g=pivot_g, k=k,
        dense=dense))
    P_n = len(groups[pivot_g][1])
    kd, ks = kd[:, :P_n * k], ks[:, :P_n * k]
    xd, xs = xd[:, :P_n * k], xs[:, :P_n * k]
    np.testing.assert_array_equal(kd, xd)
    np.testing.assert_allclose(ks, xs, rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(kc, xc)


CASES = [
    ((1024, 2048), ((IK.REQ, (0,)), (IK.REQ, (1,))), 16, "and2"),
    ((1024, 2048), ((IK.REQ, (0,)), (IK.NOT, (1,))), 16, "not"),
    ((1024, 2048), ((IK.REQ, (0,)), (IK.OPT, (1,))), 16, "opt"),
    ((1024, 1024), ((IK.REQ, (0, 1)),), 16, "or2"),
    ((1024, 2048, 2048),
     ((IK.REQ, (0,)), (IK.REQ, (1,)), (IK.NOT, (2,))), 16, "and2not"),
    ((1024, 2048), ((IK.REQ, (0,)), (IK.REQ, (1,))), 1, "k1"),
]


@pytest.mark.parametrize("Ws,groups,k,label", CASES,
                         ids=[c[3] for c in CASES])
def test_intersect_kernel_interpret(interpret_mode, Ws, groups, k,
                                    label):
    rng = np.random.default_rng(hash(label) % 2**31)
    args = _make_windows(rng, 8, Ws)
    _check_intersect(args, T=len(Ws), Ws=Ws, groups=groups, k=k)


def test_intersect_kernel_interpret_tag_aux(interpret_mode):
    """TAG member slots streamed from an aux doc-window array."""
    rng = np.random.default_rng(11)
    Ws = (1024, 2048)
    meta, fmeta, d, f, m, dl = _make_windows(rng, 8, Ws)
    meta = np.asarray(meta).copy()
    T = len(Ws)
    B = 8
    rows_aux = (B * Ws[1]) // BLK + 4 * B
    aux = np.full((rows_aux, BLK), 2**31 - 1, np.int32)
    at = 0
    for b in range(B):
        W = Ws[1]
        live = int(rng.integers(W // 2, W + 1))
        docs = np.sort(rng.choice(N_DOCS, size=live,
                                  replace=False)).astype(np.int32)
        off = int(rng.integers(0, BLK))
        rows_w = (off + W + BLK - 1) // BLK
        fa = aux[at:at + rows_w].reshape(-1)
        fa[off:off + live] = docs
        aux[at:at + rows_w] = fa.reshape(rows_w, BLK)
        meta[b, 1] = at * BLK + off
        meta[b, T + 1] = live
        at += rows_w + 1
    args = (jnp.asarray(meta), fmeta, d, f, m, dl,
            jnp.asarray(aux.reshape(-1)))
    groups = ((IK.REQ, (0,), -1), (IK.REQ, (1,), 0))
    _check_intersect(args, T=T, Ws=Ws, groups=groups)


def test_intersect_kernel_interpret_dense_tag(interpret_mode):
    """Dense posting-aligned code-column predicate."""
    rng = np.random.default_rng(12)
    Ws = (1024, 2048)
    meta, fmeta, d, f, m, dl = _make_windows(rng, 8, Ws)
    meta = np.asarray(meta).copy()
    fmeta = np.asarray(fmeta).copy()
    codes = rng.integers(0, 8, size=d.shape[0]).astype(np.int32)
    q = rng.integers(-1, 10, size=(8, 2)).astype(np.int32)
    q[rng.random(8) < 0.3, 1] = -2          # unbound value slots
    meta = np.concatenate([meta, q], axis=1)
    fmeta = np.concatenate(
        [fmeta, rng.uniform(0.5, 4.0, (8, 1)).astype(np.float32)],
        axis=1)
    args = (jnp.asarray(meta), jnp.asarray(fmeta), d, f, m, dl,
            jnp.asarray(codes))
    groups = ((IK.REQ, (0,), -1), (IK.REQ, (1,), -1))
    _check_intersect(args, T=2, Ws=Ws, groups=groups,
                     dense=((IK.REQ, 0, 2),))


@pytest.mark.parametrize("Ws,groups", [
    ((1024, 2048), ((IK.REQ, (0,)), (IK.REQ, (1,)))),
    ((1024, 1024), ((IK.REQ, (0, 1)),)),
], ids=["and2", "or2"])
def test_intersect_kernel_interpret_raw(interpret_mode, Ws, groups):
    """raw=True emits masked (doc, score) windows; merged top-k must
    equal the XLA twin's extracted top-k."""
    rng = np.random.default_rng(41)
    args = _make_windows(rng, 8, Ws)
    k = 16
    kd, ks, kc = IK.intersect_batch(
        *args, T=len(Ws), Ws=Ws, groups=groups, pivot_g=0, k=k,
        raw=True)
    vals, sel = IK.iter_topk(ks, kd, k)
    kdocs = np.array(jnp.take_along_axis(kd, sel, axis=1))
    kvals = np.asarray(vals)
    kdocs[kvals <= -3e38] = 2**31 - 1   # exhausted-lane filler
    xd, xs, xc = IK._xla_impl(
        *args, T=len(Ws), Ws=Ws, groups=groups, pivot_g=0, k=k)
    xvals, xsel = IK.iter_topk(np.asarray(xs), np.asarray(xd), k)
    xdocs = np.array(jnp.take_along_axis(
        jnp.asarray(xd), xsel, axis=1))
    xdocs[np.asarray(xvals) <= -3e38] = 2**31 - 1
    np.testing.assert_array_equal(kdocs, xdocs)
    np.testing.assert_allclose(kvals, np.asarray(xvals),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(kc), np.asarray(xc))


def _make_phrase(rng, B, Ws, PWs, stride=64):
    """Phrase inputs: per-slot posting windows + sorted poskey windows
    (doc * stride + position), with genuine in-order matches seeded."""
    T = len(Ws)
    meta, fmeta, d, f, m, dl = _make_windows(rng, B, Ws)
    meta = np.asarray(meta).copy()
    d_host = np.asarray(d)
    meta5 = np.zeros((B, 5 * T), np.int32)
    meta5[:, :3 * T] = meta
    pk_rows = (B * sum(PWs)) // BLK + 4 * B * T
    pk = np.full((pk_rows, BLK), 2**31 - 1, np.int32)
    at = 0
    for b in range(B):
        # docs shared by every slot of this query get adjacent positions
        slot_docs = [
            d_host[meta[b, t]:meta[b, t] + meta[b, T + t]]
            for t in range(T)]
        common = slot_docs[0]
        for t in range(1, T):
            common = np.intersect1d(common, slot_docs[t])
        for t in range(T):
            docs = slot_docs[t]
            pos = rng.integers(0, stride - T - 1, size=len(docs))
            # seed exact in-order adjacency on half the common docs
            seed = np.isin(docs, common) & (rng.random(len(docs)) < .5)
            pos = np.where(seed, 3 + t, pos)
            keys = np.sort(docs.astype(np.int64) * stride + pos
                           ).astype(np.int32)
            live = len(keys)
            W = PWs[t]
            off = int(rng.integers(0, BLK))
            rows_w = (off + W + BLK - 1) // BLK
            fp = pk[at:at + rows_w].reshape(-1)
            fp[off:off + live] = keys[:W]
            pk[at:at + rows_w] = fp.reshape(rows_w, BLK)
            meta5[b, 3 * T + t] = at * BLK + off
            meta5[b, 4 * T + t] = min(live, W)
            at += rows_w + 1
    return (jnp.asarray(meta5), fmeta, d, f, m, dl,
            jnp.asarray(pk.reshape(-1)))


@pytest.mark.parametrize("slop,eq", [(0, None), (0, False), (2, None)],
                         ids=["exact-eqjoin", "exact-chain", "slop2"])
def test_phrase_kernel_interpret(interpret_mode, slop, eq):
    """Both slop-0 formulations (equality join on normalized keys, and
    the anchor chain kept for clamped-position segments) must match the
    XLA chain oracle."""
    rng = np.random.default_rng(21 + slop)
    Ws, PWs, stride = (1024, 1024), (1024, 1024), 64
    args = _make_phrase(rng, 8, Ws, PWs, stride)
    kd, ks, kc = jax.device_get(IK.phrase_batch(
        *args, T=2, Ws=Ws, PWs=PWs, stride=stride, slop=slop, k=16,
        eq_join=eq))
    xd, xs, xc = jax.device_get(IK._xla_phrase_impl(
        *args, T=2, Ws=Ws, PWs=PWs, stride=stride, slop=slop, k=16))
    np.testing.assert_array_equal(kd[:, :16], xd[:, :16])
    np.testing.assert_allclose(ks[:, :16], xs[:, :16],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(kc, xc)
    assert int(np.asarray(kc).sum()) > 0, "no phrase matches generated"


def test_phrase_kernel_interpret_eq_imbalanced(interpret_mode):
    """Equality-join pivots on the SMALLEST position window; imbalanced
    windows (the chain's pathological case) must still match the
    oracle, including position-0 alias-guard lanes."""
    rng = np.random.default_rng(29)
    Ws, PWs, stride = (1024, 2048), (1024, 4096), 64
    args = _make_phrase(rng, 8, Ws, PWs, stride)
    kd, ks, kc = jax.device_get(IK.phrase_batch(
        *args, T=2, Ws=Ws, PWs=PWs, stride=stride, slop=0, k=16))
    xd, xs, xc = jax.device_get(IK._xla_phrase_impl(
        *args, T=2, Ws=Ws, PWs=PWs, stride=stride, slop=0, k=16))
    np.testing.assert_array_equal(kd[:, :16], xd[:, :16])
    np.testing.assert_allclose(ks[:, :16], xs[:, :16],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(kc, xc)
    assert int(np.asarray(kc).sum()) > 0


def test_phrase_kernel_interpret_raw(interpret_mode):
    """raw=True emits the masked (doc, score) term-0 window; the merged
    top-k must equal the extracted top-k of the XLA twin."""
    rng = np.random.default_rng(23)
    Ws, PWs, stride = (1024, 1024), (1024, 1024), 64
    args = _make_phrase(rng, 8, Ws, PWs, stride)
    k = 16
    kd, ks, kc = IK.phrase_batch(
        *args, T=2, Ws=Ws, PWs=PWs, stride=stride, slop=0, k=k,
        raw=True)
    vals, sel = IK.iter_topk(ks, kd, k)
    kdocs = np.array(jnp.take_along_axis(kd, sel, axis=1))
    kvals = np.asarray(vals)
    kdocs[kvals <= -3e38] = 2**31 - 1   # exhausted-lane filler
    xd, xs, xc = IK._xla_phrase_impl(
        *args, T=2, Ws=Ws, PWs=PWs, stride=stride, slop=0, k=k)
    xvals, xsel = IK.iter_topk(np.asarray(xs), np.asarray(xd), k)
    xdocs = np.array(jnp.take_along_axis(jnp.asarray(xd), xsel, axis=1))
    xdocs[np.asarray(xvals) <= -3e38] = 2**31 - 1
    np.testing.assert_array_equal(kdocs, xdocs)
    np.testing.assert_allclose(kvals, np.asarray(xvals),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(kc), np.asarray(xc))
    assert int(np.asarray(kc).sum()) > 0, "no phrase matches generated"


@pytest.mark.parametrize("n_ops,want_sumsq", [(0, False), (1, False),
                                              (2, True)],
                         ids=["count-only", "one-op", "two-op-sumsq"])
def test_groupby_batch_kernel_interpret(interpret_mode, n_ops,
                                        want_sumsq):
    """The whole-batch GROUPBY kernel (one grid step per query) must
    match a per-query numpy oracle for every (slot, stat) column."""
    rng = np.random.default_rng(47)
    B, n, G = 6, 8_000, 300
    S = 1 + n_ops
    gslots = rng.integers(-1, G, size=(B, S, n)).astype(np.int32)
    # sprinkle extra -1 masking so per-slot masks genuinely differ
    gslots[rng.random((B, S, n)) < 0.3] = -1
    vals = rng.normal(5.0, 2.0, (B, max(n_ops, 0), n)).astype(np.float32)
    got = {k: np.asarray(v) for k, v in GB.groupby_aggregate_batch(
        jnp.asarray(gslots), jnp.asarray(vals), G,
        want_sumsq=want_sumsq).items()}
    for b in range(B):
        g0 = gslots[b, 0]
        ok0 = g0 >= 0
        exp = np.bincount(g0[ok0], minlength=G)[:G].astype(np.float32)
        np.testing.assert_allclose(got["g.None.count"][b], exp,
                                   rtol=1e-6)
        for j in range(n_ops):
            gj = gslots[b, 1 + j]
            okj = gj >= 0
            v = vals[b, j]
            np.testing.assert_allclose(
                got[f"g.{j}.count"][b],
                np.bincount(gj[okj], minlength=G)[:G], rtol=1e-6)
            np.testing.assert_allclose(
                got[f"g.{j}.sum"][b],
                np.bincount(gj[okj], weights=v[okj], minlength=G)[:G],
                rtol=1e-4, atol=1e-2)
            if want_sumsq:
                np.testing.assert_allclose(
                    got[f"g.{j}.sumsq"][b],
                    np.bincount(gj[okj], weights=(v * v)[okj],
                                minlength=G)[:G], rtol=1e-4, atol=0.5)


@pytest.mark.parametrize("want_minmax", [True, False],
                         ids=["minmax", "sums"])
def test_groupby_kernel_interpret(interpret_mode, want_minmax):
    rng = np.random.default_rng(31)
    n, G = 20_000, 300
    gids = jnp.asarray(rng.integers(-1, G, size=n).astype(np.int32))
    valid = jnp.asarray(rng.random(n) < 0.8)
    vals = jnp.asarray(rng.normal(5.0, 2.0, n).astype(np.float32))
    got = {k: np.asarray(v) for k, v in GB.groupby_aggregate(
        gids, valid, vals, G, want_minmax=want_minmax).items()}
    # numpy oracle
    g = np.asarray(gids)
    ok = np.asarray(valid) & (g >= 0) & (g < G)
    v = np.asarray(vals)
    exp_cnt = np.bincount(g[ok], minlength=G)[:G].astype(np.float32)
    exp_sum = np.bincount(g[ok], weights=v[ok], minlength=G)[:G]
    np.testing.assert_allclose(got["count"], exp_cnt, rtol=1e-6)
    np.testing.assert_allclose(got["sum"], exp_sum, rtol=1e-4,
                               atol=1e-2)
    if want_minmax:
        exp_min = np.full(G, np.float32(GB.BIG))
        exp_max = np.full(G, -np.float32(GB.BIG))
        np.minimum.at(exp_min, g[ok], v[ok])
        np.maximum.at(exp_max, g[ok], v[ok])
        np.testing.assert_allclose(got["min"], exp_min, rtol=1e-5)
        np.testing.assert_allclose(got["max"], exp_max, rtol=1e-5)


def test_weight_zero_field_kernel_gate(interpret_mode):
    """A WEIGHT 0 TEXT field stores tf == 0.0 postings, which would
    break the kernel's tf-derived member hit (REQ matches dropped, NOT
    exclusions missed).  _kernel_seg_ok must route such schemas to the
    XLA twin (membership-based hit).  ADVICE r3 item 1."""
    import redisearch_tpu as rs
    from redisearch_tpu.query import engine as E

    ix = rs.SearchIndex(rs.Schema(name="w0", fields=[
        rs.Field("title", rs.FieldType.TEXT, weight=1.0),
        rs.Field("note", rs.FieldType.TEXT, weight=0.0)]))
    docs = []
    for i in range(512):
        docs.append((f"d{i}", {
            "title": "common term" + (" zebra" if i % 4 == 0 else ""),
            "note": "zebra" if i % 2 == 0 else "filler"}))
    ix.add_documents(docs)
    has_zebra = {f"d{i}" for i in range(512) if i % 4 == 0 or i % 2 == 0}

    E.QUERY_PATH_STATS.clear()
    r = ix.search("common zebra", num=50)
    got = {h.key for h in r.hits}
    assert got and got <= has_zebra, sorted(got - has_zebra)[:5]

    r2 = ix.search("common -zebra", num=512)
    got2 = {h.key for h in r2.hits}
    assert len(got2) == 256 and got2.isdisjoint(has_zebra)
    # the mega-kernel must NOT have served these queries
    assert E.QUERY_PATH_STATS.get("kernel", 0) == 0
