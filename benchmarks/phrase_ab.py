"""Link-noise-immune phrase-kernel decomposition (same methodology as
kernel_ab.py: N_ITER invocations inside ONE lax.scan dispatch).

Measures phrase_batch vs intersect_batch (and2) at matched window
shapes, and the phrase cost across position-window widths — decides
where the phrase gap (serving ~15k QPS vs and2 ~76k) actually lives.

Usage: python benchmarks/phrase_ab.py  (on the TPU host)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ITER = 8
B = 512


def main():
    import jax
    import jax.numpy as jnp

    from redisearch_tpu.ops import intersect as IK

    assert IK._use_pallas(), "run on TPU"
    BLK = IK.BLK
    rng = np.random.default_rng(0)
    n_docs = 1_000_000
    stride = 64

    def build(Wp, Wm, fill, tfm):
        """Two-term windows + poskey windows (PW = W * tfm)."""
        PWp, PWm = Wp * tfm, Wm * tfm
        rows_total = ((Wp + Wm) // BLK + 8)
        pk_total = ((PWp + PWm) // BLK + 8)
        doc_ids = np.full((rows_total * BLK,), 2**31 - 1, np.int32)
        freqs = np.zeros((rows_total * BLK,), np.float32)
        masks = np.zeros((rows_total * BLK,), np.int32)
        dl = np.full((rows_total * BLK,), 24.0, np.float32)
        poskeys = np.full((pk_total * BLK,), 2**31 - 1, np.int32)
        at = pat = 0
        metas = []
        for W, PW in ((Wp, PWp), (Wm, PWm)):
            live = max(int(W * fill), 8)
            docs = np.sort(rng.choice(n_docs, size=live,
                                      replace=False)).astype(np.int32)
            doc_ids[at:at + live] = docs
            freqs[at:at + live] = 1.0
            masks[at:at + live] = 3
            plive = live * tfm
            pos = (np.repeat(docs.astype(np.int64) * stride, tfm)
                   + np.tile(np.arange(tfm), live))
            poskeys[pat:pat + plive] = np.sort(pos).astype(np.int32)
            metas.append((at, live, 3, pat, plive))
            at += W
            pat += PW
        meta = np.zeros((B, 10), np.int32)
        for b in range(B):
            for t, (s, l, qm, ps, pl_) in enumerate(metas):
                meta[b, t] = s
                meta[b, 2 + t] = l
                meta[b, 4 + t] = qm
                meta[b, 6 + t] = ps
                meta[b, 8 + t] = pl_
        fmeta = np.full((B, 3), 1.0, np.float32)
        fmeta[:, 2] = 24.0
        return (jnp.asarray(meta), jnp.asarray(fmeta),
                jnp.asarray(doc_ids), jnp.asarray(freqs),
                jnp.asarray(masks), jnp.asarray(dl),
                jnp.asarray(poskeys), (Wp, Wm), (PWp, PWm))

    def timed(fn, meta, *args):
        # meta varies PER SCAN STEP (XLA hoists loop-invariant bodies)
        # and the fmeta tweights vary PER TIMED DISPATCH (the tunneled
        # attach memoizes bit-identical dispatches).
        @jax.jit
        def loop(ms, a):
            def body(c, m):
                out = fn(m, *a)
                s = sum(jnp.sum(o) for o in out)
                return c + s.astype(jnp.float32), None
            return jax.lax.scan(body, jnp.float32(0), ms)[0]

        fm = args[0]
        metas0 = jnp.stack([jnp.roll(meta, it, axis=0)
                            for it in range(N_ITER)])
        jax.device_get(loop(metas0, (fm,) + args[1:]))  # compile+warm
        best = 9e9
        for rep in range(3):
            fmr = fm * (1.0 + 0.001 * (rep + 1))
            t0 = time.perf_counter()
            jax.device_get(loop(metas0, (fmr,) + args[1:]))
            best = min(best, time.perf_counter() - t0)
        return best / (N_ITER * B) * 1e6

    for Wp, Wm, fill, tfm in ((2048, 2048, 0.5, 2),
                              (2048, 8192, 0.5, 2),
                              (8192, 8192, 0.25, 2),
                              (2048, 2048, 0.5, 4)):
        meta, fmeta, d, f, m, dl, pk, Ws, PWs = build(Wp, Wm, fill, tfm)
        # phrase meta layout: starts[T], lens[T], qmasks[T], pstarts[T],
        # plens[T]  (T=2)
        pmeta = jnp.concatenate([meta[:, 0:2], meta[:, 2:4],
                                 meta[:, 4:6], meta[:, 6:8],
                                 meta[:, 8:10]], axis=1)
        us_p = timed(
            lambda M, FM, D, F, MK, DL, PK: IK.phrase_batch(
                M, FM, D, F, MK, DL, PK, T=2, Ws=Ws, PWs=PWs,
                stride=stride, slop=0, k=16),
            pmeta, fmeta, d, f, m, dl, pk)
        us_pr = timed(
            lambda M, FM, D, F, MK, DL, PK: IK.phrase_batch(
                M, FM, D, F, MK, DL, PK, T=2, Ws=Ws, PWs=PWs,
                stride=stride, slop=0, k=16, raw=True),
            pmeta, fmeta, d, f, m, dl, pk)
        # matched and2 (doc windows only)
        imeta = jnp.concatenate([meta[:, 0:2], meta[:, 2:4],
                                 meta[:, 4:6]], axis=1)
        us_i = timed(
            lambda M, FM, D, F, MK, DL: IK.intersect_batch(
                M, FM, D, F, MK, DL, T=2, Ws=Ws,
                groups=((IK.REQ, (0,)), (IK.REQ, (1,))), pivot_g=0,
                k=16),
            imeta, fmeta, d, f, m, dl)
        print(f"W=({Wp},{Wm}) fill={fill} tf={tfm}: "
              f"phrase {us_p:.1f} (raw {us_pr:.1f}) us/q  "
              f"and2 {us_i:.1f} us/q  "
              f"ratio {us_p / max(us_i, 1e-9):.1f}x", flush=True)


if __name__ == "__main__":
    main()
