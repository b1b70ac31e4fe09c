"""Link-noise-immune timing of the intersection mega-kernel.

The tunneled attach's bandwidth swings >2x minute-to-minute, and a
per-dispatch fixed cost (~2-4 ms) pollutes per-call timings at B=512.
Here N_ITER kernel invocations run inside ONE lax.scan dispatch (scan
bodies execute serially on device), so wall time / (N_ITER * B) is the
true per-query device cost to within ~0.5 us.

Usage: python benchmarks/kernel_ab.py  (on the TPU host)
A/B a member-pass change: run, `git stash push redisearch_tpu/ops/...`,
run again, `git stash pop`.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ITER = 16
B = 512


def main():
    import jax
    import jax.numpy as jnp

    from redisearch_tpu.ops import intersect as IK

    assert IK._use_pallas(), "run on TPU"
    BLK = IK.BLK
    rng = np.random.default_rng(0)
    n_docs = 1_000_000

    def make_windows(Wp, Wm, n_unique=24, overlap=0.4, fill=1.0):
        rows_total = (n_unique * (Wp + Wm)) // BLK + 4 * n_unique
        doc_ids = np.full((rows_total, BLK), 2**31 - 1, np.int32)
        freqs = np.zeros((rows_total, BLK), np.float32)
        masks = np.zeros((rows_total, BLK), np.int32)
        dl = np.full((rows_total, BLK), 24.0, np.float32)
        at = 0
        pool = []
        for u in range(n_unique):
            base = np.sort(rng.choice(n_docs, size=Wp + Wm,
                                      replace=False))
            entry = []
            for W in (Wp, Wm):
                lo = max(1, int(W * fill * 3) // 4)
                live = int(rng.integers(lo, max(int(W * fill), lo) + 1))
                docs = np.sort(rng.choice(base, size=live, replace=False)
                               ).astype(np.int32)
                rows_w = W // BLK
                fd = doc_ids[at:at + rows_w].reshape(-1)
                fd[:live] = docs
                doc_ids[at:at + rows_w] = fd.reshape(rows_w, BLK)
                freqs[at:at + rows_w] = 1.0 + (u % 3)
                masks[at:at + rows_w] = 3
                entry.append((at * BLK, live))
                at += rows_w + 1
            pool.append(entry)
        metas = np.zeros((N_ITER * 3, B, 6), np.int32)
        fmeta = np.zeros((B, 3), np.float32)
        for r in range(N_ITER * 3):
            for b in range(B):
                u = (r * B + b) % n_unique
                for t in (0, 1):
                    metas[r, b, t] = pool[u][t][0]
                    metas[r, b, 2 + t] = pool[u][t][1]
                    metas[r, b, 4 + t] = 3
        fmeta[:] = (2.0, 1.5, 24.0)
        return (jnp.asarray(metas), jnp.asarray(fmeta),
                jnp.asarray(doc_ids.reshape(-1)),
                jnp.asarray(freqs.reshape(-1)),
                jnp.asarray(masks.reshape(-1)),
                jnp.asarray(dl.reshape(-1)))

    @functools.partial(jax.jit, static_argnames=("Ws", "k", "groups",
                                                 "T"))
    def run_n(metas, fmeta, d, f, m, dl, Ws, k, groups, T):
        def body(_, meta_i):
            docs, scores, counts = IK.intersect_batch(
                meta_i, fmeta, d, f, m, dl, T=T, Ws=Ws,
                groups=groups, pivot_g=0, k=k)
            return None, counts.sum()
        _, sums = jax.lax.scan(body, None, metas)
        return sums

    import itertools
    fills = [float(x) for x in os.environ.get(
        "AB_FILLS", "1.0").split(",")]
    for (Wp, Wm), fill in itertools.product(
            ((2048, 8192), (8192, 8192), (8192, 32768),
             (8192, 131072)), fills):
        metas, fmeta, d, f, m, dl = make_windows(Wp, Wm, fill=fill)
        variants = [("and2 k16", (Wp, Wm),
                     ((0, (0,)), (0, (1,))), 2, 16)]
        if os.environ.get("AB_DECOMP"):
            variants += [
                ("and2 k1 ", (Wp, Wm), ((0, (0,)), (0, (1,))), 2, 1),
                ("1slot k16", (Wp,), ((0, (0,)),), 1, 16),
                ("1slot k1 ", (Wp,), ((0, (0,)),), 1, 1),
            ]
        for name, Ws, groups, T, k in variants:
            mm = metas if T == 2 else metas[:, :, [0, 2, 4]]
            fm = fmeta if T == 2 else fmeta[:, [0, 2]]
            out = run_n(mm[:N_ITER], fm, d, f, m, dl, Ws, k, groups, T)
            jax.block_until_ready(out)
            best = float("inf")
            for r in range(3):
                t0 = time.perf_counter()
                out = run_n(mm[r * N_ITER:(r + 1) * N_ITER],
                            fm, d, f, m, dl, Ws, k, groups, T)
                jax.device_get(out)
                best = min(best, time.perf_counter() - t0)
            us = best / (N_ITER * B) * 1e6
            print(f"Wp={Wp:6d} Wm={Wm:6d} fill={fill:5.3f} {name}: "
                  f"{us:8.2f} us/q ({N_ITER * B / best:9.0f} QPS)")


if __name__ == "__main__":
    main()
