"""Pallas GROUPBY kernel correctness (TPU only — skipped on the CPU test
mesh, where groupby_aggregate uses the XLA segment fallback; the CPU
fallback itself is covered by test_device_groupby.py)."""

import numpy as np
import pytest


def _tpu_available():
    import jax
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


@pytest.mark.skipif(not _tpu_available(), reason="needs a TPU backend")
def test_pallas_groupby_matches_numpy():
    import jax
    import jax.numpy as jnp

    from redisearch_tpu.ops.groupby import groupby_aggregate

    rng = np.random.default_rng(0)
    for n, G in [(100_000, 1000), (50_000, 77), (10_000, 128)]:
        gids = jnp.asarray(rng.integers(-1, G, n, dtype=np.int32))
        vals = jnp.asarray(rng.normal(size=n).astype(np.float32))
        valid = jnp.asarray(rng.random(n) < 0.9)
        for mm in (True, False):
            r = {k: np.asarray(v) for k, v in groupby_aggregate(
                gids, valid, vals, G, want_minmax=mm).items()}
            gn, vn, on = (np.asarray(gids), np.asarray(vals),
                          np.asarray(valid))
            ok = on & (gn >= 0)
            assert np.allclose(r["count"],
                               np.bincount(gn[ok], minlength=G))
            assert np.allclose(
                r["sum"], np.bincount(gn[ok], weights=vn[ok], minlength=G),
                atol=2e-3)
            assert np.allclose(
                r["sumsq"],
                np.bincount(gn[ok], weights=vn[ok] ** 2, minlength=G),
                rtol=1e-4, atol=2e-3)
            if mm:
                mn = np.full(G, 3.4e38)
                mx = np.full(G, -3.4e38)
                np.minimum.at(mn, gn[ok], vn[ok])
                np.maximum.at(mx, gn[ok], vn[ok])
                assert np.allclose(r["min"], mn)
                assert np.allclose(r["max"], mx)
