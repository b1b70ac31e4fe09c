"""SPMD distributed query execution over a device mesh.

TPU-native replacement for the reference's cluster coordinator + RMR
MapReduce engine (SURVEY.md §2.5/§2.6: src/coord/rmr/, dist_aggregate.c,
module.c searchResultReducer).  The mapping:

    hash-slot document partitioning  -> doc-axis sharding over mesh axis
                                        "shards" (each device owns a
                                        sub-segment of the corpus)
    MR_Fanout + reducer callbacks    -> one shard_map program: every device
                                        runs the *same* compiled query on its
                                        local sub-segment
    sorted-merge of shard replies    -> all_gather of per-shard top-k inside
                                        the program (rides ICI), final k-merge
    KNN shard-window ratio           -> per-shard top-ceil(k*ratio) before
                                        the gather (shard_k_ratio arg)

There is no RPC layer: the "network" is XLA collectives over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.builder import SegmentBuilder
from ..index.segment import Segment, next_pow2
from ..query.engine import (_COMPILE_CACHE, CompiledQuery, _build_fn,
                            _segment_args)

AXIS = "shards"
DCN_AXIS = "dcn"


class _BatchFallback(Exception):
    """Internal: batch shape unsupported — run queries one by one."""


def make_mesh(n_shards: Optional[int] = None,
              n_dcn: int = 1) -> Mesh:
    """Device mesh for doc-axis sharding.

    n_dcn > 1 builds a 2D ("dcn", "shards") mesh modeling a multi-slice
    deployment: the outer axis is the slow DCN (cross-slice) network,
    the inner axis the fast ICI ring.  The query merge then runs
    hierarchically — per-slice top-k rides ICI, and only k candidates
    per slice cross the DCN (SURVEY §5.8 / §2.6 mapping).  On a single
    host the axes are virtual but produce exactly the collective
    structure a real multi-slice mesh would."""
    devs = jax.devices()
    n = n_shards or len(devs)
    if n_dcn > 1:
        assert n % n_dcn == 0, (n, n_dcn)
        arr = np.asarray(devs[:n]).reshape(n_dcn, n // n_dcn)
        return Mesh(arr, (DCN_AXIS, AXIS))
    return Mesh(np.asarray(devs[:n]), (AXIS,))


def _shard_spec(mesh: Mesh):
    """PartitionSpec sharding axis 0 across every mesh axis."""
    if DCN_AXIS in mesh.axis_names:
        return P((DCN_AXIS, AXIS))
    return P(AXIS)


def _stack_pad(arrays: list, fill=0):
    """Stack per-shard arrays along a new axis 0, padding to max shape."""
    arrays = [np.asarray(a) for a in arrays]
    if arrays[0].ndim == 0:
        return np.stack(arrays)
    shape = tuple(max(a.shape[i] for a in arrays)
                  for i in range(arrays[0].ndim))
    out = np.full((len(arrays),) + shape, fill, dtype=arrays[0].dtype)
    for i, a in enumerate(arrays):
        out[i][tuple(slice(0, s) for s in a.shape)] = a
    return out


@dataclasses.dataclass
class ShardedIndex:
    """Doc-partitioned index: one sub-segment per device."""

    mesh: Mesh
    shards: list          # per-shard Segment (host handles for metadata)
    index: Any            # the owning SearchIndex (doc table, schema)

    @classmethod
    def build(cls, index, mesh: Optional[Mesh] = None) -> "ShardedIndex":
        """Partition an index's live docs round-robin across the mesh.

        Round-robin by insertion order is the analog of hash-slot
        partitioning (reference: src/slot_ranges.c) — uniform load without
        a hash ring, since we control placement.
        """
        index.commit()
        mesh = mesh or make_mesh()
        n = mesh.devices.size
        if len(index.segments) == 1:
            # fast reshard: slice the sealed segment's CSR arrays per
            # shard — no re-tokenization (index/slice.py; VERDICT r1
            # weak #7 flagged the O(corpus) rebuild)
            from ..index.slice import live_locals, slice_segment
            src = index.segments[0]
            live = live_locals(src, index.doctable)
            if live.size < n:
                raise ValueError("empty shard; need >= n_shards docs")
            shards = [slice_segment(src, live[i::n]) for i in range(n)]
            return cls(mesh=mesh, shards=shards, index=index)
        builders = [SegmentBuilder(index.schema, index.stopwords,
                                   index.synonyms) for _ in range(n)]
        i = 0
        for seg in index.segments:
            alive = np.asarray(seg.alive)
            gids = np.asarray(seg.gids)
            for j in range(seg.n_docs):
                if not alive[j]:
                    continue
                meta = index.doctable.get(int(gids[j]))
                if meta is None or meta.deleted:
                    continue
                builders[i % n].add(meta)
                i += 1
        shards = []
        for b in builders:
            seg = b.seal()
            if seg is None:
                raise ValueError("empty shard; need >= n_shards docs")
            shards.append(seg)
        return cls(mesh=mesh, shards=shards, index=index)

    # -- distributed execution --------------------------------------------
    def execute(self, cq: CompiledQuery, k: int,
                shard_k_ratio: float = 1.0, merge: bool = True):
        """Run a compiled query SPMD across all shards; returns merged
        (gids, scores, knn_dists, sortkeys, total).  With merge=False the
        per-shard top-k arrays come back unmerged ([S, k_local]) — used
        for string sort keys, whose per-shard dictionary ranks are merged
        host-side after string resolution (the reference coordinator
        merges WITHSORTKEYS string values host-side too, module.c:2453)."""
        n = len(self.shards)
        bindings = []
        P_ = 1
        buckets: dict[int, tuple] = {}
        for seg in self.shards:
            b, p = cq.bind(seg)
            b.dyn.pop("_tagL", None)
            bk = b.dyn.pop("_buckets")
            for idx, t in bk.items():
                cur = buckets.get(idx)
                buckets[idx] = (t if cur is None else
                                tuple(max(a, c) for a, c in zip(t, cur)))
            bindings.append(b)
            P_ = max(P_, p)
        P_ = next_pow2(P_)
        # per-shard k (KNN shard window ratio, shard_window_ratio.h:25-40)
        k_local = int(min(next_pow2(max(int(np.ceil(k * shard_k_ratio)), 1)),
                          max(s.n_pad for s in self.shards)))

        seg_stack = _tree_stack([_segment_args(cq, s) for s in self.shards])
        dyn_stack = _tree_stack([b.dyn for b in bindings])

        key = cq.signature(
            f"dist|n={max(s.n_pad for s in self.shards)}"
            f"|stride={self.shards[0].text.pos_stride}"
            f"|S={n}|m={merge}|mesh={tuple(self.mesh.shape.items())}",
            buckets, P_, k_local)
        fn = _COMPILE_CACHE.get(key)
        if fn is None:
            fn = self._build_dist_fn(cq, buckets, P_, k_local, merge)
            _COMPILE_CACHE[key] = fn
        sharding = NamedSharding(self.mesh, _shard_spec(self.mesh))
        seg_dev = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), sharding), seg_stack)
        dyn_dev = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), sharding), dyn_stack)
        out = fn(seg_dev, dyn_dev)
        return {kk: np.asarray(v) for kk, v in out.items()}

    def _build_dist_fn(self, cq: CompiledQuery, buckets: dict, P_: int,
                       k_local: int, merge: bool = True):
        proto = self.shards[0]
        run = _build_fn(cq, proto, buckets, P_, k_local, has_extra=False,
                        mode="topk", jit=False)
        mesh = self.mesh

        def shard_body(seg, dyn):
            seg = jax.tree.map(lambda x: x[0], seg)   # drop shard axis
            dyn = jax.tree.map(lambda x: x[0], dyn)
            out = run(seg, dyn)
            # translate local idx -> global doc id on-device
            gid = seg["gids"][out["idx"]]
            res = {"gids": gid[None], "scores": out["scores"][None],
                   "count": out["count"][None]}
            if "knn" in out:
                res["knn"] = out["knn"][None]
            if "sortkeys" in out:
                res["sortkeys"] = out["sortkeys"][None]
            return res

        spec = _shard_spec(mesh)
        dcn = DCN_AXIS in mesh.axis_names
        n_dcn = mesh.shape[DCN_AXIS] if dcn else 1

        @jax.jit
        def dist(seg, dyn):
            specs_in = (jax.tree.map(lambda _: spec, seg),
                        jax.tree.map(lambda _: spec, dyn))
            out = jax.shard_map(
                shard_body, mesh=mesh, in_specs=specs_in,
                out_specs=spec)(seg, dyn)
            # out leaves: [S, k_local] (counts [S]); final merge is a tiny
            # top-k over S*k_local candidates — the "coordinator" reduce
            if not merge:
                out["shard_counts"] = out["count"]
                out["count"] = jnp.sum(out["count"])
                return out
            merged = {"count": jnp.sum(out["count"]),
                      "shard_counts": out["count"]}
            kk = min(k_local, out["scores"].size)

            def merge2(primary, gids, payloads, k_out):
                """k-merge with the single-index tie-break: ascending
                primary key, then ascending gid (index.py sorts merged
                candidates by (rank, gid) — lax.top_k alone would break
                ties by shard order and diverge from the local path).
                Works batched over a leading axis (per-slice merges)."""
                ops = (primary, gids) + tuple(payloads)
                sorted_ops = jax.lax.sort(ops, num_keys=2,
                                          dimension=-1)
                return tuple(o[..., :k_out] for o in sorted_ops)

            def hierarchical(primary, payloads):
                """Per-DCN-slice merge first (candidates ride ICI), then
                the cross-slice merge moves only k per slice over DCN —
                the RPNet/coordinator analog of SURVEY §5.8."""
                gids = out["gids"]
                if dcn:
                    p1 = primary.reshape(n_dcn, -1)
                    g1 = gids.reshape(n_dcn, -1)
                    pl1 = tuple(p.reshape(n_dcn, -1) for p in payloads)
                    k1 = min(kk, p1.shape[1])
                    outs = merge2(p1, g1, pl1, k1)
                    outs = tuple(o.reshape(-1) for o in outs)
                else:
                    outs = (primary.reshape(-1), gids.reshape(-1)) + \
                        tuple(p.reshape(-1) for p in payloads)
                return merge2(outs[0], outs[1], outs[2:], kk)

            if "knn" in out:
                dm, g, s = hierarchical(out["knn"], (out["scores"],))
                merged["knn"] = dm
                merged["gids"] = g
                merged["scores"] = s
            elif "sortkeys" in out:
                sk = out["sortkeys"]
                asc = cq.opts.sort_asc
                key, g, s, sk_o = hierarchical(
                    sk if asc else -sk, (out["scores"], sk))
                merged["sortkeys"] = sk_o
                merged["gids"] = g
                merged["scores"] = s
            else:
                neg, g = hierarchical(-out["scores"], ())
                merged["scores"] = -neg
                merged["gids"] = g
            return merged

        return dist

    # -- batched SPMD execution (deep-queue serving on meshes) ------------
    def execute_batch(self, cqs: list, k: int,
                      shard_k_ratio: float = 1.0) -> dict:
        """Run a batch of SAME-STRUCTURE queries SPMD: transport rows
        stack to [S, B, total], ONE shard_map program scans the batch on
        every shard (engine._rows_executor's shape, fanned out), and the
        per-query hierarchical top-k merge stays in-graph.  This is the
        mesh analog of engine.execute_batch — per-dispatch overhead and
        collective latency amortize over the whole batch instead of
        being paid per query (the reference amortizes with WORKERS
        threads + pipelined RMR fanouts).

        Returns stacked host arrays: gids/scores [B, k'], counts [B]
        (+ knn/sortkeys when present)."""
        from ..query.engine import _device_unpack_rows

        n = len(self.shards)
        B_real = len(cqs)
        B = int(next_pow2(B_real))
        padded = list(cqs) + [cqs[-1]] * (B - B_real)
        rows = None
        common_bk: dict = {}
        P2 = 1
        lfp = None
        layout = total = None
        for qi, cq in enumerate(padded):
            for si, seg in enumerate(self.shards):
                row, ent = cq.bind_row(seg)
                if rows is None:
                    layout, total = ent[2], ent[3]
                    rows = np.zeros((n, B, total), np.int32)
                if ent[7] != (lfp := lfp or ent[7]):
                    raise ValueError("mixed query structures in batch")
                rows[si, qi] = row
                for idx, t in ent[4].items():
                    cur = common_bk.get(idx)
                    common_bk[idx] = (t if cur is None else tuple(
                        max(a, c) for a, c in zip(t, cur)))
                P2 = max(P2, ent[5])
        k_local = int(min(
            next_pow2(max(int(np.ceil(k * shard_k_ratio)), 1)),
            max(s.n_pad for s in self.shards)))
        cq0 = cqs[0]
        key = cq0.signature(
            f"distbatch|S={n}|B={B}|lfp={lfp}"
            f"|n={max(s.n_pad for s in self.shards)}"
            f"|mesh={tuple(self.mesh.shape.items())}",
            common_bk, int(next_pow2(P2)), k_local)
        fn = _COMPILE_CACHE.get(key)
        if fn is None:
            fn = self._build_dist_batch_fn(cq0, layout, common_bk,
                                           int(next_pow2(P2)), k_local)
            _COMPILE_CACHE[key] = fn
        seg_stack = _tree_stack([_segment_args(cq0, s)
                                 for s in self.shards])
        sharding = NamedSharding(self.mesh, _shard_spec(self.mesh))
        seg_dev = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), sharding), seg_stack)
        rows_dev = jax.device_put(jnp.asarray(rows), sharding)
        out = fn(seg_dev, rows_dev)
        out = {kk: np.asarray(v) for kk, v in out.items()}
        return {kk: v[:B_real] if v.ndim and v.shape[0] == B else v
                for kk, v in out.items()}

    def _build_dist_batch_fn(self, cq: CompiledQuery, layout,
                             buckets: dict, P_: int, k_local: int):
        from ..query.engine import _device_unpack_rows

        proto = self.shards[0]
        run = _build_fn(cq, proto, buckets, P_, k_local,
                        has_extra=False, mode="topk", jit=False)
        mesh = self.mesh
        spec = _shard_spec(mesh)
        dcn = DCN_AXIS in mesh.axis_names
        n_dcn = mesh.shape[DCN_AXIS] if dcn else 1
        asc_sort = cq.opts.sort_asc

        def shard_body(seg, rows_s):
            seg = jax.tree.map(lambda x: x[0], seg)
            stacked = _device_unpack_rows(layout, rows_s[0])

            def body(_, dyn_i):
                return None, run(seg, dyn_i)
            _, outs = jax.lax.scan(body, None, stacked)
            gid = seg["gids"][outs["idx"]]            # [B, kl]
            res = {"gids": gid[None], "scores": outs["scores"][None],
                   "count": outs["count"][None]}
            if "knn" in outs:
                res["knn"] = outs["knn"][None]
            if "sortkeys" in outs:
                res["sortkeys"] = outs["sortkeys"][None]
            return res

        @jax.jit
        def dist(seg, rows):
            specs_in = (jax.tree.map(lambda _: spec, seg), spec)
            out = jax.shard_map(
                shard_body, mesh=mesh, in_specs=specs_in,
                out_specs=spec)(seg, rows)
            # leaves [S, B, kl] (counts [S, B]); per-query merges are
            # batched over B — same (primary, gid) two-key sort as the
            # single-query path, so tie orderings match the local engine
            merged = {"count": jnp.sum(out["count"], axis=0),
                      "shard_counts": out["count"]}
            S = out["gids"].shape[0]
            kl = out["gids"].shape[2]
            kk = min(k_local, S * kl)

            def merge2(primary, gids, payloads, k_out):
                ops = (primary, gids) + tuple(payloads)
                sorted_ops = jax.lax.sort(ops, num_keys=2, dimension=-1)
                return tuple(o[..., :k_out] for o in sorted_ops)

            def hierarchical(primary, payloads):
                gids = out["gids"]

                def to_b(x, lead):
                    # [S, B, kl] -> [lead, B, (S/lead)*kl]
                    return (x.reshape(lead, S // lead, -1, kl)
                            .transpose(0, 2, 1, 3)
                            .reshape(lead, x.shape[1], -1))
                if dcn:
                    p1 = to_b(primary, n_dcn)
                    g1 = to_b(gids, n_dcn)
                    pl1 = tuple(to_b(p, n_dcn) for p in payloads)
                    k1 = min(kk, p1.shape[-1])
                    outs = merge2(p1, g1, pl1, k1)
                    outs = tuple(o.transpose(1, 0, 2)
                                 .reshape(o.shape[1], -1) for o in outs)
                else:
                    outs = tuple(to_b(x, 1)[0] for x in
                                 (primary, gids) + tuple(payloads))
                return merge2(outs[0], outs[1], outs[2:], kk)

            if "knn" in out:
                dm, g, s = hierarchical(out["knn"], (out["scores"],))
                merged["knn"] = dm
                merged["gids"] = g
                merged["scores"] = s
            elif "sortkeys" in out:
                sk = out["sortkeys"]
                key_, g, s, sk_o = hierarchical(
                    sk if asc_sort else -sk, (out["scores"], sk))
                merged["sortkeys"] = sk_o
                merged["gids"] = g
                merged["scores"] = s
            else:
                neg, g = hierarchical(-out["scores"], ())
                merged["scores"] = -neg
                merged["gids"] = g
            return merged

        return dist

    def _search_string_sort(self, query, params, offset, num, scorer,
                            sort_by, sort_asc, shard_k_ratio):
        """SPMD search sorted by a string column: per-shard top-k by
        dictionary rank in-graph (merge=False), string resolution +
        S-way merge host-side."""
        from ..index.index import Hit, SearchResult
        from ..query.engine import QueryOptions
        k = offset + num
        root = self.index.parse_query(query, params)
        opts = QueryOptions(scorer=scorer, k=k, sort_field=sort_by,
                            sort_asc=sort_asc)
        cq = self.index.compile(root, opts)
        out = self.execute(cq, k, shard_k_ratio, merge=False)
        f = self.index.schema.field(sort_by)
        entries = []
        S, kl = out["gids"].shape
        for si in range(S):
            seg = self.shards[si]
            sc_col = seg.strcols.get(f.attribute)
            for j in range(kl):
                skey = float(out["sortkeys"][si, j])
                if abs(skey) >= 3.3e38:
                    continue     # invalid filler
                gid = int(out["gids"][si, j])
                score = float(out["scores"][si, j])
                if abs(skey) >= 2.9e38:
                    # missing sort value ranks last in either direction
                    rank = (1, "")
                    resolved = None
                else:
                    resolved = (sc_col.table[int(skey)]
                                if sc_col is not None
                                and 0 <= int(skey) < len(sc_col.table)
                                else str(skey))
                    rank = (0, resolved if sort_asc
                            else tuple(-ord(c) for c in resolved))
                entries.append((rank, gid, score, resolved))
        entries.sort(key=lambda e: (e[0], e[1]))
        hits = []
        for rank, gid, score, resolved in entries[offset:offset + num]:
            meta = self.index.doctable.get(gid)
            if meta is None or meta.deleted:
                continue
            hits.append(Hit(meta.key, score, fields=dict(meta.fields),
                            sortkey=resolved, gid=gid))
        res = SearchResult(total=int(out["count"]), hits=hits)
        res.shard_counts = [int(c) for c in out["shard_counts"]]
        return res

    def _search_host_merge(self, query, params, offset, num, scorer,
                           sort_by, sort_asc):
        """Host-merged sharded search (string sort keys, odd shapes): a
        temporary multi-segment index view over the shard segments reuses
        SearchIndex.search's merge semantics exactly."""
        from ..index.index import SearchIndex
        view = SearchIndex(self.index.schema)
        view.doctable = self.index.doctable
        view.synonyms = self.index.synonyms
        view.segments = list(self.shards)
        return view.search(query, params=params, offset=offset, num=num,
                           scorer=scorer, sort_by=sort_by,
                           sort_asc=sort_asc)

    # -- adapter surface so aux pipelines (hybrid, agg tails) can treat a
    # ShardedIndex like a SearchIndex -------------------------------------
    def commit(self) -> None:
        self.index.commit()

    @property
    def doctable(self):
        return self.index.doctable

    @property
    def schema(self):
        return self.index.schema

    def search_many(self, queries, params=None, k: int = 10,
                    opts_list=None, **_kw):
        """Run several queries SPMD across the shards.  Same-structure
        batches share ONE shard_map dispatch (execute_batch — the
        deep-queue serving shape); mixed structures fall back to
        per-query execution.  Used directly and by FT.HYBRID's branches
        (the reference drains branch cursor sets per shard,
        coord/hybrid/dist_hybrid.c)."""
        from ..query.engine import QueryOptions
        params = params or [None] * len(queries)
        opts_list = opts_list or [None] * len(queries)
        try:
            cqs = []
            ks = []
            for q, prm, opts in zip(queries, params, opts_list):
                scorer = opts.scorer if opts is not None else "BM25STD"
                kk = max(k, opts.k if opts is not None else k)
                root = self.index.parse_query(q, prm)
                cq = self.index.compile(
                    root, QueryOptions(scorer=scorer, k=kk))
                if cq.opts.sort_field or cq.host_nodes:
                    raise _BatchFallback
                cqs.append(cq)
                ks.append(kk)
            kmax = max(ks)
            try:
                out = self.execute_batch(cqs, kmax)
            except ValueError:
                raise _BatchFallback            # mixed structures
            res = []
            for i, (cq, kk) in enumerate(zip(cqs, ks)):
                row = {key: v[i] for key, v in out.items()
                       if key != "shard_counts"}
                r = self._assemble(cq, row, num=kk)
                r.shard_counts = [int(c)
                                  for c in out["shard_counts"][:, i]]
                res.append(r)
            return res
        except _BatchFallback:
            pass
        out = []
        for q, prm, opts in zip(queries, params, opts_list):
            scorer = opts.scorer if opts is not None else "BM25STD"
            kk = max(k, opts.k if opts is not None else k)
            out.append(self.search(q, params=prm, num=kk, scorer=scorer))
        return out

    def _assemble(self, cq, out: dict, offset: int = 0, num: int = 10):
        """Merged device outputs -> SearchResult (shared by search and
        the batched path; mirrors the single-index reply layout)."""
        from ..index.index import Hit, SearchResult
        hits = []
        for j in range(len(out["gids"])):
            gid = int(out["gids"][j])
            sc = float(out["scores"][j])
            dist = float(out["knn"][j]) if "knn" in out else None
            skey = (float(out["sortkeys"][j])
                    if "sortkeys" in out else None)
            if dist is not None and dist >= 3.3e38:
                continue
            if skey is not None and abs(skey) >= 3.3e38:
                continue
            if dist is None and skey is None and sc <= -3.3e38:
                continue
            meta = self.index.doctable.get(gid)
            if meta is None or meta.deleted:
                continue
            hits.append(Hit(meta.key, sc, fields=dict(meta.fields),
                            sortkey=skey, vector_distance=dist, gid=gid))
        total = int(out["count"])
        if cq.knn is not None:
            hits = hits[:cq.knn.k]
            total = min(total, cq.knn.k)
        return SearchResult(total=total, hits=hits[offset:offset + num])

    def hybrid(self, hq, tail=None):
        """Distributed FT.HYBRID: both branches fan out over the shards
        through the SPMD execute path (reference:
        coord/hybrid/dist_hybrid.c runs branch cursor sets); fusion
        happens on the merged per-branch rankings."""
        from ..aux.hybrid import run_hybrid
        return run_hybrid(self, hq, tail)

    def aggregate(self, req):
        """Distributed FT.AGGREGATE with DISTRIBUTE-step plan splitting
        (see parallel/dist_agg.py)."""
        from .dist_agg import dist_aggregate
        return dist_aggregate(self, req)

    # -- user-facing search (mirrors SearchIndex.search semantics) --------
    def profile(self, query: str, params=None, num: int = 10,
                iterators: bool = True, **kw) -> tuple:
        """Distributed FT.PROFILE analog (reference: coord/dist_profile.c
        — a Shards section per shard plus a Coordinator section).  Each
        shard section carries measured per-node iterator counters/timings
        from executing the query tree against that shard's segment
        (reference: Profile_AddIters per shard)."""
        import time as _time
        t0 = _time.perf_counter()
        root = self.index.parse_query(query, params)
        parse_ms = (_time.perf_counter() - t0) * 1e3
        t1 = _time.perf_counter()
        res = self.search(query, params=params, num=num, **kw)
        total_ms = (_time.perf_counter() - t0) * 1e3
        from ..query import ast as A
        counts = list(getattr(res, "shard_counts", []) or [])
        shard_iters: list = [None] * max(len(counts), len(self.shards))
        if iterators:
            from ..aux.explain import profile_query
            for i, seg in enumerate(self.shards):
                view = _shard_index_view(self, seg)
                try:
                    shard_iters[i] = profile_query(view, query, params)
                except Exception:
                    shard_iters[i] = None
        prof = {
            "shards": [
                {"shard": i, "results_count": int(c),
                 "query_tree": A.dump(root),
                 "iterators": shard_iters[i] if i < len(shard_iters)
                 else None}
                for i, c in enumerate(counts)
            ],
            "coordinator": {
                "merge": ("knn" if "KNN" in query.upper()
                          else "score-top-k"),
                "parsing_time_ms": parse_ms,
                "total_time_ms": total_ms,
                "execution_time_ms": (_time.perf_counter() - t1) * 1e3,
                "results_count": res.total,
                "n_shards": len(self.shards),
            },
        }
        return res, prof

    def search(self, query: str, params=None, offset: int = 0, num: int = 10,
               scorer: str = "BM25STD", sort_by=None, sort_asc=True,
               shard_k_ratio: float = 1.0, **kw):
        from ..query.engine import QueryOptions
        from ..schema import FieldType
        if sort_by is not None:
            f = self.index.schema.field(sort_by)
            if f.type != FieldType.NUMERIC:
                # string sort keys are per-shard dictionary ranks — the
                # in-graph merge can't compare them.  Run the SAME SPMD
                # program but skip the cross-shard merge: each shard's
                # top-k BY LOCAL RANK is its top-k by string (the rank
                # map is monotone), then resolve strings host-side and
                # merge (reference: the coordinator merges WITHSORTKEYS
                # string values host-side too, module.c:2453)
                return self._search_string_sort(
                    query, params, offset, num, scorer, sort_by,
                    sort_asc, shard_k_ratio)
        root = self.index.parse_query(query, params)
        opts = QueryOptions(scorer=scorer, k=offset + num,
                            sort_field=sort_by, sort_asc=sort_asc)
        cq = self.index.compile(root, opts)
        out = self.execute(cq, offset + num, shard_k_ratio)
        res = self._assemble(cq, out, offset=offset, num=num)
        if "shard_counts" in out:
            res.shard_counts = [int(c) for c in out["shard_counts"]]
        return res


def _shard_index_view(sharded, seg):
    from ..index.index import SearchIndex
    ix = SearchIndex(sharded.index.schema)
    ix.doctable = sharded.index.doctable
    ix.synonyms = sharded.index.synonyms
    ix.segments = [seg]
    return ix


def _tree_stack(dicts: list[dict]) -> dict:
    keys = dicts[0].keys()
    return {k: _stack_pad([d[k] for d in dicts]) for k in keys}
