"""Device-side GROUPBY for dictionary-encoded columns.

Reference: the GroupBy engine + reducers (src/aggregate/group_by.c,
reducers/) hash rows into per-group accumulators.  On TPU, when the group
key is a dictionary-encoded column (TAG sortable / numeric) and the
reducers are algebraic (COUNT/SUM/AVG/MIN/MAX/SUMSQ→STDDEV), the whole
aggregation is a chunked one-hot contraction:

    onehot[c, g] = (gid[c] == g)          # compare, bf16
    counts  = ones @ onehot                # MXU matmul
    sums    = vals @ onehot                # MXU matmul
    mins    = min over masked chunk        # VPU

Work is O(N * G) on the MXU at ~100+ TFLOP/s — for 1M docs x 1k groups
that's ~2 GFLOP, microseconds of compute — replacing a host-side Python
hash loop (~seconds).  Non-algebraic reducers or computed keys fall back
to the host pipeline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

CHUNK = 65536
BIG = jnp.float32(3.4e38)


@partial(jax.jit, static_argnames=("n_groups", "want_minmax"))
def groupby_aggregate(gids: jnp.ndarray, valid: jnp.ndarray,
                      values: jnp.ndarray, n_groups: int,
                      want_minmax: bool = True):
    """Per-group COUNT/SUM/SUMSQ (and MIN/MAX) in one pass.

    gids: int32[n] group id per row (-1 / >= n_groups = ignore)
    valid: bool[n] row mask (query match x key present)
    values: float32[n] the reduced operand (zeros if only COUNT needed)

    Returns dict of f32[n_groups]: count, sum, sumsq (, min, max).
    """
    n = gids.shape[0]
    n_pad = ((n + CHUNK - 1) // CHUNK) * CHUNK
    pad = n_pad - n
    g = jnp.pad(gids, (0, pad), constant_values=-1)
    v = jnp.pad(values, (0, pad))
    ok = jnp.pad(valid, (0, pad))
    g = jnp.where(ok & (g >= 0) & (g < n_groups), g, -1)

    gid_chunks = g.reshape(-1, CHUNK)
    val_chunks = v.reshape(-1, CHUNK)
    group_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_groups), 1)

    def body(carry, chunk):
        cnt, sm, sq, mn, mx = carry
        gc, vc = chunk
        onehot = (gc[:, None] == group_iota).astype(jnp.bfloat16)
        ones = jnp.ones((CHUNK,), jnp.bfloat16)
        cnt = cnt + jnp.dot(ones, onehot,
                            preferred_element_type=jnp.float32)
        vb = vc.astype(jnp.float32)
        sm = sm + jnp.dot(vb, onehot.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
        sq = sq + jnp.dot(vb * vb, onehot.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
        if want_minmax:
            hot = gc[:, None] == group_iota
            mn = jnp.minimum(mn, jnp.min(
                jnp.where(hot, vc[:, None], BIG), axis=0))
            mx = jnp.maximum(mx, jnp.max(
                jnp.where(hot, vc[:, None], -BIG), axis=0))
        return (cnt, sm, sq, mn, mx), None

    init = (jnp.zeros(n_groups, jnp.float32),
            jnp.zeros(n_groups, jnp.float32),
            jnp.zeros(n_groups, jnp.float32),
            jnp.full(n_groups, BIG),
            jnp.full(n_groups, -BIG))
    (cnt, sm, sq, mn, mx), _ = jax.lax.scan(
        body, init, (gid_chunks, val_chunks))
    out = {"count": cnt, "sum": sm, "sumsq": sq}
    if want_minmax:
        out["min"] = mn
        out["max"] = mx
    return out


#: reducers the device path can serve (others fall back to the host loop)
DEVICE_REDUCERS = {"COUNT", "SUM", "AVG", "MIN", "MAX", "STDDEV"}
