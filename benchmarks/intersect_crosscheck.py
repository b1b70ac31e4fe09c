"""Cross-check the Pallas intersection kernel against its pure-XLA twin.

Runs ON TPU: `intersect_batch` takes the Pallas lowering there while
`_xla_impl` is the executable specification (the same function the CPU
test suite pins against the engine's scan path).  Any mismatch in docs,
scores, or counts across random window layouts is a kernel lowering bug.

Covers the shapes the engine can route to the kernel: 1-4 slots,
REQ/NOT/OPT groups, union groups, oversized member windows, arbitrary
(start % 128) offsets, duplicate docs across windows, and k in {1, 16}.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from redisearch_tpu.ops import intersect as IK

    if "--cpu-smoke" not in sys.argv:
        assert IK._use_pallas(), "run on TPU"
    BLK = IK.BLK
    rng = np.random.default_rng(7)
    n_docs = 500_000

    def make(B, Ws, overlap=0.3):
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
            # shared pool so windows genuinely intersect
            pool = np.sort(rng.choice(
                n_docs, size=max(Ws) * 2, replace=False))
            for t, W in enumerate(Ws):
                live = rng.integers(max(1, W // 2), W + 1)
                take = rng.random(len(pool)) < overlap
                shared = pool[take][:live]
                extra = rng.choice(n_docs, size=live - len(shared),
                                   replace=False)
                docs = np.unique(np.concatenate(
                    [shared, extra]))[:live].astype(np.int32)
                live = len(docs)
                # arbitrary start % 128 offset
                off = int(rng.integers(0, BLK))
                flat = at * BLK + off
                rows_w = (off + W + BLK - 1) // BLK
                fd = doc_ids[at:at + rows_w].reshape(-1)
                ff = freqs[at:at + rows_w].reshape(-1)
                fm = masks[at:at + rows_w].reshape(-1)
                fd[off:off + live] = docs
                ff[off:off + live] = rng.integers(
                    1, 8, live).astype(np.float32)
                # some postings fail the field mask
                fm[off:off + live] = np.where(
                    rng.random(live) < 0.9, 3, 4)
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

    CASES = [
        # (Ws, groups, pivot_g, k, label)
        ((2048, 8192), ((IK.REQ, (0,)), (IK.REQ, (1,))), 0, 16, "and2"),
        ((2048, 8192), ((IK.REQ, (0,)), (IK.NOT, (1,))), 0, 16, "not"),
        ((2048, 8192), ((IK.REQ, (0,)), (IK.OPT, (1,))), 0, 16, "opt"),
        ((2048, 2048), ((IK.REQ, (0, 1)),), 0, 16, "or2"),
        ((2048, 8192, 8192), ((IK.REQ, (0,)), (IK.REQ, (1,)),
                              (IK.NOT, (2,))), 0, 16, "and2-not"),
        ((2048, 2048, 8192), ((IK.REQ, (0, 1)), (IK.REQ, (2,))),
         0, 16, "or2-and"),
        ((8192, 131072), ((IK.REQ, (0,)), (IK.REQ, (1,))), 0, 16,
         "big-member"),
        ((2048, 8192), ((IK.REQ, (0,)), (IK.REQ, (1,))), 0, 1, "k1"),
    ]
    bad = 0
    for Ws, groups, pivot_g, k, label in CASES:
        args = make(64, Ws)
        kd, ks, kc = jax.device_get(IK.intersect_batch(
            *args, T=len(Ws), Ws=Ws, groups=groups,
            pivot_g=pivot_g, k=k))
        xd, xs, xc = jax.device_get(IK._xla_impl(
            *args, T=len(Ws), Ws=Ws, groups=groups,
            pivot_g=pivot_g, k=k))
        P_n = len(groups[pivot_g][1])
        kd, ks = kd[:, :P_n * k], ks[:, :P_n * k]
        xd, xs = xd[:, :P_n * k], xs[:, :P_n * k]
        m_doc = int((kd != xd).sum())
        m_sc = int((np.abs(ks - xs) > 1e-3 * np.maximum(
            1.0, np.abs(xs))).sum())
        m_cnt = int((kc != xc).sum())
        status = "OK " if (m_doc + m_sc + m_cnt) == 0 else "FAIL"
        bad += m_doc + m_sc + m_cnt
        print(f"{status} {label:10s} Ws={Ws} docs={m_doc} "
              f"scores={m_sc} counts={m_cnt}")
    # ---- tag (aux doc-window) groups ---------------------------------
    def make_with_aux(B, Ws, aux_slots):
        """Like make(), but slots in `aux_slots` draw from a separate
        doc-window array (tag postings: no tf/mask, const scoring)."""
        meta, fmeta, d, f, m, dl = make(B, Ws)
        meta = np.asarray(meta).copy()
        T = len(Ws)
        rows_aux = (B * sum(Ws[t] for t in aux_slots)) // BLK \
            + 4 * B * len(aux_slots)
        aux = np.full((rows_aux, BLK), 2**31 - 1, np.int32)
        at = 0
        for b in range(B):
            for t in aux_slots:
                W = Ws[t]
                live = int(rng.integers(max(1, W // 2), W + 1))
                docs = np.sort(rng.choice(n_docs, size=live,
                                          replace=False)).astype(np.int32)
                off = int(rng.integers(0, BLK))
                flat = at * BLK + off
                rows_w = (off + W + BLK - 1) // BLK
                fa = aux[at:at + rows_w].reshape(-1)
                fa[off:off + live] = docs
                aux[at:at + rows_w] = fa.reshape(rows_w, BLK)
                meta[b, t] = flat
                meta[b, T + t] = live
                at += rows_w + 1
        return (jnp.asarray(meta), fmeta, d, f, m, dl,
                jnp.asarray(aux.reshape(-1)))

    AUX_CASES = [
        (((IK.REQ, (0,), -1), (IK.REQ, (1,), 0)), (2048, 8192), (1,),
         "and+tag"),
        (((IK.REQ, (0,), -1), (IK.NOT, (1,), 0)), (2048, 8192), (1,),
         "and-nottag"),
        (((IK.REQ, (0,), -1), (IK.REQ, (1, 2), 0)), (2048, 4096, 4096),
         (1, 2), "and+tagor"),
        (((IK.REQ, (0,), -1), (IK.REQ, (1,), -1), (IK.OPT, (2,), 0)),
         (2048, 8192, 8192), (2,), "and2+opttag"),
    ]
    for groups, Ws, aux_slots, label in AUX_CASES:
        args = make_with_aux(64, Ws, aux_slots)
        kd, ks, kc = jax.device_get(IK.intersect_batch(
            *args, T=len(Ws), Ws=Ws, groups=groups, pivot_g=0, k=16))
        xd, xs, xc = jax.device_get(IK._xla_impl(
            *args, T=len(Ws), Ws=Ws, groups=groups, pivot_g=0, k=16))
        kd, ks = kd[:, :16], ks[:, :16]
        xd, xs = xd[:, :16], xs[:, :16]
        m_doc = int((kd != xd).sum())
        m_sc = int((np.abs(ks - xs) > 1e-3 * np.maximum(
            1.0, np.abs(xs))).sum())
        m_cnt = int((kc != xc).sum())
        status = "OK " if (m_doc + m_sc + m_cnt) == 0 else "FAIL"
        bad += m_doc + m_sc + m_cnt
        print(f"{status} {label:10s} Ws={Ws} docs={m_doc} "
              f"scores={m_sc} counts={m_cnt}")

    # ---- dense (posting-aligned code) predicates ----------------------
    def make_with_dense(B, Ws, dense):
        """Standard make() args plus one posting-ALIGNED int32 code
        column per dense predicate (random codes 0..7) and the extra
        meta qcode / fmeta const columns."""
        meta, fmeta, d, f, m, dl = make(B, Ws)
        meta = np.asarray(meta).copy()
        fmeta = np.asarray(fmeta).copy()
        T = len(Ws)
        cols = []
        qparts = [meta]
        fparts = [fmeta]
        for (_fl, _src, nv) in dense:
            cols.append(jnp.asarray(rng.integers(
                0, 8, size=d.shape[0]).astype(np.int32)))
            q = rng.integers(-1, 10, size=(B, nv)).astype(np.int32)
            if nv > 1:   # some unbound (-2) value slots
                q[rng.random(B) < 0.3, nv - 1] = -2
            qparts.append(q)
            fparts.append(rng.uniform(0.5, 4.0, (B, 1)
                                      ).astype(np.float32))
        return (jnp.asarray(np.concatenate(qparts, axis=1)),
                jnp.asarray(np.concatenate(fparts, axis=1)),
                d, f, m, dl, *cols)

    DENSE_CASES = [
        (((IK.REQ, (0,)), (IK.REQ, (1,))), (2048, 8192),
         ((IK.REQ, 0, 1),), "and2+dense"),
        (((IK.REQ, (0,)), (IK.REQ, (1,))), (2048, 8192),
         ((IK.NOT, 0, 1),), "and2-ndense"),
        (((IK.REQ, (0,)), (IK.REQ, (1,))), (2048, 8192),
         ((IK.REQ, 0, 3),), "and2+dor3"),
        (((IK.REQ, (0, 1)),), (2048, 2048),
         ((IK.REQ, 0, 1),), "or2+dense"),
        (((IK.REQ, (0,)), (IK.OPT, (1,))), (2048, 8192),
         ((IK.REQ, 0, 1), (IK.NOT, 1, 1)), "opt+2dense"),
    ]
    for groups, Ws, dense, label in DENSE_CASES:
        args = make_with_dense(64, Ws, dense)
        kd, ks, kc = jax.device_get(IK.intersect_batch(
            *args, T=len(Ws), Ws=Ws, groups=groups, pivot_g=0, k=16,
            dense=dense))
        xd, xs, xc = jax.device_get(IK._xla_impl(
            *args, T=len(Ws), Ws=Ws, groups=groups, pivot_g=0, k=16,
            dense=dense))
        P_n = len(groups[0][1])
        kd, ks = kd[:, :P_n * 16], ks[:, :P_n * 16]
        xd, xs = xd[:, :P_n * 16], xs[:, :P_n * 16]
        m_doc = int((kd != xd).sum())
        m_sc = int((np.abs(ks - xs) > 1e-3 * np.maximum(
            1.0, np.abs(xs))).sum())
        m_cnt = int((kc != xc).sum())
        status = "OK " if (m_doc + m_sc + m_cnt) == 0 else "FAIL"
        bad += m_doc + m_sc + m_cnt
        print(f"{status} {label:10s} Ws={Ws} docs={m_doc} "
              f"scores={m_sc} counts={m_cnt}")

    # ---- phrase kernel (chain over position keys) --------------------
    stride = 64

    def make_phrase(B, Ws, PWs, plant=0.3):
        T = len(Ws)
        rows_total = (B * sum(Ws)) // BLK + 4 * B * T
        pk_rows_total = (B * sum(PWs)) // BLK + 4 * B * T
        doc_ids = np.full((rows_total, BLK), 2**31 - 1, np.int32)
        freqs = np.zeros((rows_total, BLK), np.float32)
        masks = np.zeros((rows_total, BLK), np.int32)
        dl = np.abs(rng.normal(24.0, 6.0, (rows_total, BLK))
                    ).astype(np.float32) + 1.0
        poskeys = np.full((pk_rows_total, BLK), 2**31 - 1, np.int32)
        meta = np.zeros((B, 5 * T), np.int32)
        fmeta = np.zeros((B, T + 1), np.float32)
        at = 0
        pk_at = 0
        for b in range(B):
            pool = np.sort(rng.choice(20000, size=max(Ws) * 2,
                                      replace=False))
            term_docs = []
            positions = []           # per term: dict doc -> [pos]
            for t, W in enumerate(Ws):
                live = int(rng.integers(max(1, W // 2), W + 1))
                take = rng.random(len(pool)) < 0.5
                docs = np.unique(pool[take][:live]).astype(np.int32)
                term_docs.append(docs)
                pos = {}
                for d in docs:
                    cnt = int(rng.integers(1, 3))
                    pos[int(d)] = sorted(
                        rng.integers(0, stride - T - 1, cnt).tolist())
                positions.append(pos)
            # plant aligned runs on some docs shared by every term
            shared = term_docs[0]
            for t in range(1, T):
                shared = np.intersect1d(shared, term_docs[t])
            for d in shared[rng.random(len(shared)) < plant]:
                p0 = int(rng.integers(0, stride - T - 1))
                for t in range(T):
                    positions[t][int(d)] = sorted(
                        set(positions[t][int(d)] + [p0 + t]))
            for t, W in enumerate(Ws):
                docs = term_docs[t]
                live = len(docs)
                off = int(rng.integers(0, BLK))
                flat = at * BLK + off
                rows_w = (off + W + BLK - 1) // BLK
                fd = doc_ids[at:at + rows_w].reshape(-1)
                ff = freqs[at:at + rows_w].reshape(-1)
                fm = masks[at:at + rows_w].reshape(-1)
                fd[off:off + live] = docs
                ff[off:off + live] = [len(positions[t][int(d)])
                                      for d in docs]
                fm[off:off + live] = np.where(
                    rng.random(live) < 0.9, 3, 4)
                doc_ids[at:at + rows_w] = fd.reshape(rows_w, BLK)
                freqs[at:at + rows_w] = ff.reshape(rows_w, BLK)
                masks[at:at + rows_w] = fm.reshape(rows_w, BLK)
                meta[b, t] = flat
                meta[b, T + t] = live
                meta[b, 2 * T + t] = 3
                at += rows_w + 1
                # position keys for this term window
                keys = np.sort(np.array(
                    [int(d) * stride + p for d in docs
                     for p in positions[t][int(d)]], np.int64)
                    ).astype(np.int32)
                keys = keys[:PWs[t]]
                poff = int(rng.integers(0, BLK))
                pflat = pk_at * BLK + poff
                pk_rows_w = (poff + PWs[t] + BLK - 1) // BLK
                fk = poskeys[pk_at:pk_at + pk_rows_w].reshape(-1)
                fk[poff:poff + len(keys)] = keys
                poskeys[pk_at:pk_at + pk_rows_w] = fk.reshape(
                    pk_rows_w, BLK)
                meta[b, 3 * T + t] = pflat
                meta[b, 4 * T + t] = len(keys)
                pk_at += pk_rows_w + 1
            fmeta[b, :T] = rng.uniform(0.5, 4.0, T)
            fmeta[b, T] = 24.0
        return (jnp.asarray(meta), jnp.asarray(fmeta),
                jnp.asarray(doc_ids.reshape(-1)),
                jnp.asarray(freqs.reshape(-1)),
                jnp.asarray(masks.reshape(-1)),
                jnp.asarray(dl.reshape(-1)),
                jnp.asarray(poskeys.reshape(-1)))

    PH_CASES = [
        # (Ws, PWs, slop, k, label)
        ((2048, 2048), (4096, 4096), 0, 16, "ph2-exact"),
        ((2048, 8192), (4096, 16384), 0, 16, "ph2-asym"),
        ((2048, 2048, 2048), (4096, 4096, 4096), 0, 16, "ph3-exact"),
        ((2048, 2048), (4096, 4096), 2, 16, "ph2-slop2"),
        ((2048, 2048, 2048), (4096, 4096, 4096), 1, 16, "ph3-slop1"),
        ((2048, 2048), (4096, 131072), 0, 16, "ph2-bigpos"),
        ((2048, 2048), (4096, 4096), 0, 1, "ph-k1"),
    ]
    for Ws, PWs, slop, k, label in PH_CASES:
        args = make_phrase(64, Ws, PWs)
        kd, ks, kc = jax.device_get(IK.phrase_batch(
            *args, T=len(Ws), Ws=Ws, PWs=PWs, stride=stride,
            slop=slop, k=k))
        xd, xs, xc = jax.device_get(IK._xla_phrase_impl(
            *args, T=len(Ws), Ws=Ws, PWs=PWs, stride=stride,
            slop=slop, k=k))
        kd, ks = kd[:, :k], ks[:, :k]
        xd, xs = xd[:, :k], xs[:, :k]
        m_doc = int((kd != xd).sum())
        m_sc = int((np.abs(ks - xs) > 1e-3 * np.maximum(
            1.0, np.abs(xs))).sum())
        m_cnt = int((kc != xc).sum())
        status = "OK " if (m_doc + m_sc + m_cnt) == 0 else "FAIL"
        bad += m_doc + m_sc + m_cnt
        print(f"{status} {label:10s} Ws={Ws} PWs={PWs} docs={m_doc} "
              f"scores={m_sc} counts={m_cnt}")

    if bad:
        print(f"CROSSCHECK FAILED: {bad} mismatches")
        sys.exit(1)
    print("crosscheck: 0 mismatches")


if __name__ == "__main__":
    main()
