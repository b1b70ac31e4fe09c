"""FT.AGGREGATE request model + execution pipeline.

Reference: AREQ + AGGPlan + result processors (src/aggregate/
aggregate_request.c, aggregate_plan.h:28-38 — steps ROOT, GROUP, FILTER,
APPLY, ARRANGE(sort+limit), LOAD; executed by the RP chain in
aggregate_exec.c).

Execution model here: the query engine produces dense match masks per
segment (one jitted array program — see query/engine.py); the pipeline then
runs the plan over the matched rows.  A device fast path (ops/groupby.py)
handles GROUPBY on dictionary-encoded columns with algebraic reducers via
segment reductions; the general path materializes host rows, matching the
reference's semantics exactly.
"""

from __future__ import annotations

import dataclasses
import itertools
import time
from typing import Any, Optional, Sequence

import numpy as np

from ..query.engine import QueryOptions, execute
from ..schema import FieldType
from ..utils.errors import QuerySyntaxError
from . import expr as E
from .reducers import Reducer, make_reducer

ASC = True
DESC = False


# -- plan steps (reference: PLN_*Step, aggregate_plan.h) --------------------

@dataclasses.dataclass
class LoadStep:
    fields: Optional[list[str]]  # None = LOAD *


@dataclasses.dataclass
class ApplyStep:
    expression: str
    alias: str
    parsed: E.Expr = None

    def __post_init__(self):
        self.parsed = E.parse(self.expression)


@dataclasses.dataclass
class FilterStep:
    expression: str
    parsed: E.Expr = None

    def __post_init__(self):
        self.parsed = E.parse(self.expression)


@dataclasses.dataclass
class GroupStep:
    by: list[str]
    reducers: list[tuple[str, list[str], Optional[str]]]  # (name, args, alias)


@dataclasses.dataclass
class SortStep:
    keys: list[tuple[str, bool]]  # (prop, ascending)
    max: int = 0


@dataclasses.dataclass
class LimitStep:
    offset: int
    num: int


class AggregateRequest:
    """Builder for an aggregation plan (FT.AGGREGATE argv analog)."""

    def __init__(self, query: str = "*", params: Optional[dict] = None,
                 dialect: int = 2, verbatim: bool = False,
                 scorer: str = "BM25STD", add_scores: bool = False,
                 now: Optional[int] = None):
        self.query = query
        self.params = params
        self.dialect = dialect
        self.verbatim = verbatim
        self.scorer = scorer
        self.add_scores = add_scores
        # TTL-clock override (epoch seconds); None = wall clock.  The
        # reference's analog is the FT.DEBUG TTL clock control.
        self.now = now
        self.steps: list[Any] = []
        self._cursor_count = 0
        self.with_cursor = False

    def load(self, *fields: str) -> "AggregateRequest":
        self.steps.append(LoadStep([f.lstrip("@") for f in fields] or None))
        return self

    def load_all(self) -> "AggregateRequest":
        self.steps.append(LoadStep(None))
        return self

    def apply(self, expression: str, alias: str) -> "AggregateRequest":
        self.steps.append(ApplyStep(expression, alias))
        return self

    def filter(self, expression: str) -> "AggregateRequest":
        self.steps.append(FilterStep(expression))
        return self

    def group_by(self, by, *reducers) -> "AggregateRequest":
        """group_by("@field" | ["@f1", "@f2"], ("COUNT", [], "cnt"), ...)"""
        by = [by] if isinstance(by, str) else list(by)
        rs = []
        for r in reducers:
            if isinstance(r, tuple) and len(r) == 3:
                rs.append((r[0], list(r[1]), r[2]))
            elif isinstance(r, tuple) and len(r) == 2:
                rs.append((r[0], list(r[1]), None))
            else:
                raise QuerySyntaxError(f"bad reducer spec {r!r}")
        self.steps.append(GroupStep([b.lstrip("@") for b in by], rs))
        return self

    def sort_by(self, *keys, max: int = 0) -> "AggregateRequest":
        """sort_by("@price", ("@name", DESC), max=10)"""
        parsed = []
        for k in keys:
            if isinstance(k, tuple):
                parsed.append((k[0].lstrip("@"), bool(k[1])))
            else:
                parsed.append((k.lstrip("@"), ASC))
        self.steps.append(SortStep(parsed, max))
        return self

    def limit(self, offset: int, num: int) -> "AggregateRequest":
        self.steps.append(LimitStep(offset, num))
        return self

    def cursor(self, count: int = 1000) -> "AggregateRequest":
        self.with_cursor = True
        self._cursor_count = count
        return self


@dataclasses.dataclass
class AggregateResult:
    total: int
    rows: list[dict]
    cursor_id: int = 0
    warnings: list = dataclasses.field(default_factory=list)


# ---------------------------------------------------------------------------
# Execution
# ---------------------------------------------------------------------------

#: Served-path counters for aggregations (the aggregate analog of
#: engine.QUERY_PATH_STATS): "device-tail" = fused GROUPBY with in-graph
#: SORT/LIMIT head, "device" = fused GROUPBY with host finish, "host" =
#: full host pipeline.  Benchmarks report the device hit rate from this.
AGG_PATH_STATS: dict = {}


def _count_path(path: str, n: int = 1) -> None:
    AGG_PATH_STATS[path] = AGG_PATH_STATS.get(path, 0) + n


def run_aggregate(index, req: AggregateRequest,
                  profile: Optional[dict] = None) -> AggregateResult:
    """Execute an aggregation against a SearchIndex.  When `profile` is
    given, measured per-stage timings land in profile["result_processors"]
    (reference: per-RP profile sections, result_processor.h)."""
    import time as _t

    index.commit()
    opts = (QueryOptions(scorer=req.scorer, verbatim=req.verbatim)
            if req.now is None else
            QueryOptions(scorer=req.scorer, verbatim=req.verbatim,
                         now=req.now))
    # prepared-query cache: repeated aggregations (cursor reads, dashboards)
    # skip parse+lower and reuse the per-segment bind memo
    cq = index.prepare(req.query, req.params, opts, req.dialect)

    t_start = _t.perf_counter()
    fast = _try_device_group(index, req, cq)
    if fast is not None:
        _count_path("device")
        if profile is not None:
            profile["result_processors"] = [
                {"name": "RP_INDEX+DeviceGroupBy(fused)",
                 "time_ms": round((_t.perf_counter() - t_start) * 1e3, 3),
                 "rows": len(fast.rows)}]
        return fast

    rows: list[dict] = []
    total = 0
    t_index0 = _t.perf_counter()
    for seg in index.segments:
        if cq.knn is not None:
            res = execute(cq, seg, cq.knn.k, mode="topk")
            keep = res.knn_dists < 3.3e38
            sel = res.local_idx[keep]
            scores = res.scores[keep]
            total += res.count
        else:
            res = execute(cq, seg, 1, mode="window")
            sel = res.local_idx[res.valid]   # window docs, valid only
            scores = res.scores[res.valid]
            total += res.count
        gids = seg.gids_host
        for j, li in enumerate(sel):
            gid = int(gids[li])
            meta = index.doctable.get(gid)
            if meta is None or meta.deleted:
                continue
            row = {"__key": meta.key, "__score": float(scores[j]),
                   "__gid": gid, "__meta": meta}
            rows.append(row)

    _count_path("host")
    if profile is not None:
        timings: list = [{"name": "RP_INDEX", "rows": len(rows),
                          "time_ms": round(
                              (time.perf_counter() - t_index0) * 1e3, 3)}]
        rows = _run_steps(index, req, rows, timings=timings)
        profile["result_processors"] = timings
    else:
        rows = _run_steps(index, req, rows)
    return AggregateResult(total=total, rows=rows)


class _AggBatchHandle:
    """In-flight run_aggregate_many round: device dispatches submitted,
    result() collects + finishes — lets a serving loop overlap the next
    round's host work (prepare/plan/pack) with the device."""

    def __init__(self, fin):
        self._fin = fin

    def result(self) -> list:
        return self._fin()


def run_aggregate_many(index, reqs: list, async_: bool = False):
    """Execute a batch of aggregations in few device dispatches: device-
    eligible GROUPBYs with the same plan shape + transport-row structure
    run as ONE lax.scan'd program per segment (the aggregate analog of
    search's execute_batch — a B=64 dashboard batch that paid 64
    sequential dispatch round trips now pays ~1), and every group's
    output buffer is collected in a single device_get.  Non-eligible
    plans fall back to the sequential host pipeline.  With async_=True
    returns an _AggBatchHandle immediately; .result() collects."""
    import jax

    index.commit()
    prepared = []
    groups: dict = {}
    for req in reqs:
        opts = (QueryOptions(scorer=req.scorer, verbatim=req.verbatim)
            if req.now is None else
            QueryOptions(scorer=req.scorer, verbatim=req.verbatim,
                         now=req.now))
        cq = index.prepare(req.query, req.params, opts, req.dialect)
        plan = _plan_device_group_cached(index, req, cq)
        prepared.append((req, cq, plan))
        if plan is None:
            continue
        # batchable = equal plan (the memoized plan object pins step
        # shape, reducers and the device-tail head) AND equal per-
        # segment row structure (gsig + layout fingerprint — same
        # contract as engine.execute_batch grouping)
        segsig = []
        for seg in index.segments:
            ent = cq.bind_row(seg)[1]
            segsig.append((ent[6], ent[7]))
        key = (id(plan), tuple(segsig))
        groups.setdefault(key, []).append(len(prepared) - 1)

    handles: dict = {}          # query index -> batched handle
    bufs: list = []             # unique device output buffers
    buf_ids: dict = {}
    for idxs in groups.values():
        items = [prepared[i] for i in idxs]
        hs = _device_group_submit_batch(index, items)
        if hs is None:
            continue
        for i, h in zip(idxs, hs):
            handles[i] = h
            for _ki, _e, (entry, flat, _j) in h[5]:
                if id(flat) not in buf_ids:
                    buf_ids[id(flat)] = len(bufs)
                    bufs.append(flat)
    for b in bufs:               # overlap d2h with the caller's host work
        for leaf in jax.tree_util.tree_leaves(b):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()

    def fin():
        fetched = jax.device_get(bufs) if bufs else []
        unpacked: dict = {}      # buffer id -> dict of [Bp, ...] arrays
        out = []
        for i, (req, cq, plan) in enumerate(prepared):
            h = handles.get(i)
            if h is None:
                out.append(run_aggregate(index, req))
                continue
            group, tail, op_list, mm, rspec, parts = h
            fparts = []
            for ki, e, (entry, flat, j) in parts:
                full = unpacked.get(id(flat))
                if full is None:
                    full = entry._unpack_out(
                        np.asarray(fetched[buf_ids[id(flat)]]))
                    unpacked[id(flat)] = full
                fparts.append((ki, e,
                               {k: v[j] for k, v in full.items()}))
            fin_ = (_device_tail_finish if rspec is not None
                    else _device_group_finish)
            _count_path("device-tail" if rspec is not None else "device")
            out.append(fin_(index, (group, tail, op_list, mm, rspec,
                                    fparts)))
        return out

    return _AggBatchHandle(fin) if async_ else fin()


def _try_device_group(index, req: AggregateRequest, cq) -> \
        "Optional[AggregateResult]":
    """Device GROUPBY fast path (ops/groupby.py): single dictionary-encoded
    group key + algebraic reducers compute as one-hot MXU contractions;
    any other shape returns None and the host pipeline runs."""
    h = _device_group_submit(index, req, cq)
    if h is None:
        return None
    return _device_group_finish(index, h)


def _key_encoding(index, seg, keyname):
    """Dictionary encoding of a group key column for one segment:
    (value_ids int32[n_pad] with -1 missing, table list).  TAG/TEXT
    sortable columns are already dict-encoded; NUMERIC columns encode
    their unique present values (cached per segment — segments are
    immutable after seal)."""
    f = index.schema.try_field(keyname)
    if f is None:
        return None
    if f.sortable and f.type in (FieldType.TAG, FieldType.TEXT):
        sc = seg.strcols.get(f.attribute)
        if sc is None:
            return None
        return (sc.value_ids, list(sc.table))
    if f.type == FieldType.NUMERIC:
        col = seg.numerics.get(f.attribute)
        if col is None or col.multi:
            return None
        cache = getattr(seg, "_numdict_cache", None)
        if cache is None:
            cache = {}
            seg._numdict_cache = cache
        ent = cache.get(f.attribute)
        if ent is None:
            import jax.numpy as jnp
            vals_np = np.asarray(col.values)
            pres_np = np.asarray(col.present)
            uniq = np.unique(vals_np[pres_np])
            ids = np.searchsorted(uniq, vals_np).astype(np.int32)
            ids = np.where(pres_np, np.minimum(ids, max(len(uniq) - 1, 0)),
                           -1).astype(np.int32)
            ent = (jnp.asarray(ids), [float(u) for u in uniq])
            cache[f.attribute] = ent
        return ent
    return None


_MAX_DEVICE_GROUPS = 65536

_PLAN_CACHE: dict = {}


def _plan_sig(req: AggregateRequest):
    """Query-independent signature of the step list (the device-GROUPBY
    plan depends only on step structure + schema, not on the query
    string): serving re-plans identical dashboards thousands of times
    per second, and _plan_device_group costs ~40 us of host Python."""
    parts = []
    for s in req.steps:
        if isinstance(s, GroupStep):
            parts.append(("g", tuple(s.by),
                          tuple((n, tuple(a), al)
                                for n, a, al in s.reducers)))
        elif isinstance(s, SortStep):
            parts.append(("s", tuple(s.keys), s.max))
        elif isinstance(s, LimitStep):
            parts.append(("l", s.offset, s.num))
        elif isinstance(s, ApplyStep):
            parts.append(("a", s.expression, s.alias))
        elif isinstance(s, FilterStep):
            parts.append(("f", s.expression))
        else:
            return None                 # LOAD etc: not device-eligible
    return tuple(parts)


def _plan_device_group_cached(index, req: AggregateRequest, cq):
    """Memoized _plan_device_group (see _plan_sig).  KNN plans bail
    before the cache — eligibility also depends on cq.knn."""
    if cq.knn is not None or not req.steps:
        return None
    sig = _plan_sig(req)
    if sig is None:
        return None
    # field count catches in-place FT.ALTER field additions
    key = (id(index.schema), len(index.schema.fields), sig)
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        return hit[0]
    plan = _plan_device_group(index, req, cq)
    if len(_PLAN_CACHE) > 4096:
        _PLAN_CACHE.clear()
    _PLAN_CACHE[key] = (plan,)
    return plan


def _plan_device_group(index, req: AggregateRequest, cq):
    """Segment-independent half of the device-GROUPBY eligibility:
    validates the step shape and compiles the pre-expressions.  Returns
    (group, tail, operands, want_minmax, compiled_pre, in_fields,
    pre_sig) or None.

    Eligible plans: [numeric APPLY/FILTER]* -> GROUPBY(1..3 dict-
    encodable keys) with algebraic reducers -> [SORTBY/LIMIT]*.  APPLY/
    FILTER expressions compile into the program (agg/device_expr.py);
    reducer operands may be numeric fields or compiled APPLY aliases."""
    from ..ops.groupby import DEVICE_REDUCERS
    from .device_expr import compile_device_expr

    if cq.knn is not None or not req.steps:
        return None
    steps = req.steps
    i = 0
    pre: list = []
    while i < len(steps) and isinstance(steps[i],
                                        (ApplyStep, FilterStep)):
        pre.append(steps[i])
        i += 1
    if i >= len(steps) or not isinstance(steps[i], GroupStep):
        return None
    group = steps[i]
    tail = steps[i + 1:]
    if not all(isinstance(s, (SortStep, LimitStep)) for s in tail):
        return None
    if not 1 <= len(group.by) <= 3:
        return None

    num_fields = {f.attribute for f in index.schema.fields
                  if f.type == FieldType.NUMERIC}
    avail = set(num_fields)
    compiled_pre: list = []      # ("apply", alias, fn) | ("filter", fn)
    apply_aliases: set[str] = set()
    for s in pre:
        fn = compile_device_expr(s.parsed, avail)
        if fn is None:
            return None
        if isinstance(s, ApplyStep):
            compiled_pre.append(("apply", s.alias, fn))
            avail.add(s.alias)
            apply_aliases.add(s.alias)
        else:
            compiled_pre.append(("filter", None, fn))

    # computed (APPLY-alias) group keys: the expression column is a pure
    # function of segment numeric columns, so it can be evaluated ONCE
    # per (segment, plan) and dictionary-encoded like any numeric key
    # (_alias_key_encoding) — the per-query program then gathers its ids
    # exactly like a raw key.  Reference hot path: group_by.c:63-158
    # hashes computed RSValues per row instead.
    key_aliases = frozenset(b for b in group.by if b in apply_aliases)

    operands: list[str] = []     # reducer operand columns, order-stable
    for name, args, _alias in group.reducers:
        nm = name.upper()
        if nm not in DEVICE_REDUCERS:
            return None
        if nm != "COUNT":
            if len(args) != 1:
                return None
            op = args[0].lstrip("@")
            if op not in apply_aliases and op not in num_fields:
                return None
            if op not in operands:
                operands.append(op)
    want_minmax = any(n.upper() in ("MIN", "MAX")
                      for n, _a, _al in group.reducers)

    # numeric field columns the program needs: expr inputs + operands
    in_fields: list[str] = []
    for s in pre:
        for prop in E.properties(s.parsed):
            if prop in num_fields and prop not in in_fields:
                in_fields.append(prop)
    for op in operands:
        if op in num_fields and op not in in_fields:
            in_fields.append(op)

    pre_sig = ";".join(
        f"{k}:{getattr(s, 'alias', '')}:{s.expression}"
        for (k, _a, _f), s in zip(compiled_pre, pre))
    return (group, tail, operands, want_minmax, compiled_pre,
            in_fields, pre_sig, key_aliases)


def _make_fused(cq, raw, G, sizes, in_fields, compiled_pre, operands,
                want_minmax):
    """The per-query fused device program: window eval -> compiled pre
    steps -> key/operand gathers -> one-hot aggregation.  Shared by the
    single-query executor and the batched (lax.scan) executor."""
    import jax.numpy as jnp
    from ..ops.groupby import groupby_aggregate
    from ..query.engine import LAll

    # match-all roots emit the iota window: every column is already
    # doc-aligned, so the [n_pad] random gathers (key ids, per-op
    # values/presence — ~7 ns/element on TPU, they dominated this
    # path) collapse to the columns themselves
    iota_root = (cq.tree[0] == "leaf"
                 and isinstance(cq.tree[1], LAll))

    def fused(seg_args_, dyn_args, _raw=raw, _G=G,
              _sizes=tuple(sizes), _iota=iota_root,
              _in_fields=tuple(in_fields),
              _pre=tuple(compiled_pre),
              _ops=tuple(operands)):
        out = _raw(seg_args_, dyn_args)
        docs, valid = out["docs"], out["valid"]
        n_pad_ = seg_args_["gb_keys"].shape[1]
        cd = (None if _iota
              else jnp.minimum(docs, n_pad_ - 1))
        cols = {}
        for j, nm_ in enumerate(_in_fields):
            v = seg_args_["gb_num_vals"][j]
            p = seg_args_["gb_num_pres"][j]
            cols[nm_] = (v, p) if _iota else (v[cd], p[cd])
        for kind, alias, fn_ in _pre:
            if kind == "apply":
                cols[alias] = fn_(cols)
            else:
                fv, fp = fn_(cols)
                valid = valid & fp & (fv != 0.0)
        gid = jnp.zeros(docs.shape, jnp.int32)
        for k_, sz_ in enumerate(_sizes):
            idk = seg_args_["gb_keys"][k_]
            if not _iota:
                idk = idk[cd]
            idk = jnp.where(idk < 0, sz_ - 1, idk)
            gid = gid * sz_ + idk
        # flat keys: one packed output buffer -> ONE d2h
        res = {"count": out["count"]}
        base = groupby_aggregate(
            gid, valid, jnp.zeros(docs.shape, jnp.float32),
            _G, want_minmax=False)
        for stat, arr in base.items():
            res[f"g.None.{stat}"] = arr
        for j, op_ in enumerate(_ops):
            vals, pres = cols[op_]
            vals = jnp.broadcast_to(vals, docs.shape)
            pres = jnp.broadcast_to(pres, docs.shape)
            gr = groupby_aggregate(gid, valid & pres, vals, _G,
                                   want_minmax=want_minmax)
            for stat, arr in gr.items():
                res[f"g.{j}.{stat}"] = arr
        return res

    return fused


def _make_fused_cols(cq, raw, sizes, in_fields, compiled_pre, operands):
    """Window half of the batched device program: per query, emit the
    pre-masked gid slots + op value columns over the query's candidate
    window.  The lax.scan over queries stacks these into [B, S, Wc] /
    [B, n_ops, Wc]; ONE groupby_aggregate_batch kernel then aggregates
    the whole batch (grid step per query) instead of paying the ~150 us
    per-call Pallas floor per query inside the scan."""
    import jax.numpy as jnp

    def fused(seg_args_, dyn_args, _raw=raw,
              _sizes=tuple(sizes),
              _in_fields=tuple(in_fields),
              _pre=tuple(compiled_pre),
              _ops=tuple(operands)):
        out = _raw(seg_args_, dyn_args)
        docs, valid = out["docs"], out["valid"]
        n_pad_ = seg_args_["gb_keys"].shape[1]
        cd = jnp.minimum(docs, n_pad_ - 1)
        cols = {}
        for j, nm_ in enumerate(_in_fields):
            cols[nm_] = (seg_args_["gb_num_vals"][j][cd],
                         seg_args_["gb_num_pres"][j][cd])
        for kind, alias, fn_ in _pre:
            if kind == "apply":
                cols[alias] = fn_(cols)
            else:
                fv, fp = fn_(cols)
                valid = valid & fp & (fv != 0.0)
        gid = jnp.zeros(docs.shape, jnp.int32)
        for k_, sz_ in enumerate(_sizes):
            idk = seg_args_["gb_keys"][k_][cd]
            idk = jnp.where(idk < 0, sz_ - 1, idk)
            gid = gid * sz_ + idk
        slots = [jnp.where(valid, gid, -1)]
        vlist = []
        for op_ in _ops:
            v, p = cols[op_]
            v = jnp.broadcast_to(v, docs.shape)
            p = jnp.broadcast_to(p, docs.shape)
            slots.append(jnp.where(valid & p, gid, -1))
            vlist.append(v)
        return {"count": out["count"],
                "gslots": jnp.stack(slots),
                "vals": (jnp.stack(vlist) if vlist
                         else jnp.zeros((0,) + docs.shape, jnp.float32))}

    return fused


#: cap on B x S x Wc elements staged for the batched groupby kernel
#: (HBM scratch for the scan outputs; 64M int32 = 256 MB)
_MAX_BATCH_STAGE = 64_000_000


def _seg_posting_cols(index, seg, cq, group, in_fields, sizes,
                      compiled_pre=(), pre_sig="",
                      key_aliases=frozenset()):
    """Posting-ALIGNED device columns for the kernel-raw GROUPBY path:
    the composite group id, and each input numeric field's (value,
    present), all gathered once to align with seg.text's posting arrays
    (reshaped [rows, 128] to match the kernel's whole-row DMA view).
    The intersection kernel's raw windows are pivot-posting-row-aligned,
    so per query these columns SLICE (contiguous DMA) instead of
    gathering [W] random doc ids — the gathers were ~40% of the fused
    window program.  Cached per (by-keys, in_fields): segments are
    immutable after seal.  ~4 bytes/posting/column of HBM."""
    import jax.numpy as jnp

    cache = getattr(seg, "_gbpcols_cache", None)
    if cache is None:
        cache = seg._gbpcols_cache = {}
    ckey = (tuple(group.by), tuple(in_fields),
            pre_sig if key_aliases else "")
    ent = cache.get(ckey)
    if ent is not None:
        return ent
    ga = _seg_group_args(index, seg, cq, group, in_fields,
                         compiled_pre, pre_sig, key_aliases)
    key_infos, _sizes, _G, seg_args = ga
    n_pad = seg.n_pad
    cd = jnp.minimum(seg.text.doc_ids, n_pad - 1)
    gid = jnp.zeros((n_pad,), jnp.int32)
    for k_, sz_ in enumerate(sizes):
        idk = seg_args["gb_keys"][k_]
        idk = jnp.where(idk < 0, sz_ - 1, idk)
        gid = gid * sz_ + idk
    n2 = seg.text.doc_ids.shape[0] // 128
    cols = {"pgb_gid": gid[cd].reshape(n2, 128)}
    for j, nm in enumerate(in_fields):
        cols[f"pgb_v{j}"] = seg_args["gb_num_vals"][j][cd].reshape(
            n2, 128)
        cols[f"pgb_p{j}"] = seg_args["gb_num_pres"][j][cd].reshape(
            n2, 128)
    if len(cache) > 4:
        cache.clear()
    cache[ckey] = cols
    return cols


def _make_kernel_groupby(kplan, layout, sizes, in_fields, compiled_pre,
                         operands, G, want_sumsq):
    """Fused batched GROUPBY over the Pallas intersection mega-kernel:
    raw-mode masked pivot windows (one grid step per query — replaces
    the per-query XLA window set algebra, which measured ~400 us/query
    at 2k-wide windows vs the kernel's ~3-10 us) + contiguous slices of
    posting-aligned (gid, value, present) columns + ONE batched one-hot
    aggregation kernel.  Returns the fused fn and the raw lane width."""
    import jax
    import jax.numpy as jnp
    from ..ops import intersect as IK
    from ..ops.groupby import groupby_aggregate_batch
    from ..query.engine import (_device_unpack_rows,
                                _kernel_batched_inputs)

    (slot_descs, Ws, kgroups, pivot_g, aux_keys, kdense, dmeta) = kplan
    pivots = list(kgroups[pivot_g][1])
    rowsk = [Ws[t] // IK.BLK + IK.R_EXTRA for t in range(len(slot_descs))]
    W_raw = sum(rowsk[p] for p in pivots) * IK.BLK
    INF = jnp.int32(2**31 - 1)

    def fused(seg_args_, dyn, _descs=slot_descs, _Ws=Ws,
              _groups=kgroups, _pg=pivot_g, _aux=aux_keys,
              _dense=kdense, _dmeta=dmeta,
              _in_fields=tuple(in_fields), _pre=tuple(compiled_pre),
              _ops=tuple(operands)):
        stacked = _device_unpack_rows(layout, dyn["rows"])
        meta, fmeta, aux_arrs = _kernel_batched_inputs(
            stacked, seg_args_, _descs, _aux, _dmeta)
        docs, _scores, count = IK.intersect_batch(
            meta, fmeta, seg_args_["doc_ids"], seg_args_["freqs"],
            seg_args_["field_masks"], seg_args_["posting_dl"],
            *aux_arrs, T=len(_descs), Ws=_Ws, groups=_groups,
            pivot_g=_pg, k=16, dense=_dense, raw=True)   # [B, W_raw]
        # contiguous per-query slices of the posting-aligned columns at
        # the pivot slots' window rows (same offsets the kernel DMA'd)
        srows = jnp.stack(
            [stacked["tstarts"][:, _descs[p][1]] // IK.BLK
             for p in pivots], axis=1).astype(jnp.int32)   # [B, P_n]
        names = (["pgb_gid"]
                 + [x for j in range(len(_in_fields))
                    for x in (f"pgb_v{j}", f"pgb_p{j}")])

        def body(c, st):
            out = {}
            for nm in names:
                arr = seg_args_[nm]
                parts = [jax.lax.dynamic_slice(
                    arr, (st[i], 0), (rowsk[p], IK.BLK))
                    for i, p in enumerate(pivots)]
                out[nm] = (parts[0] if len(parts) == 1
                           else jnp.concatenate(parts)).reshape(-1)
            return c, out

        _c, lane = jax.lax.scan(body, None, srows)   # each [B, W_raw]
        valid = docs != INF
        cols = {}
        for j, nm in enumerate(_in_fields):
            cols[nm] = (lane[f"pgb_v{j}"], lane[f"pgb_p{j}"])
        for kind, alias, fn_ in _pre:
            if kind == "apply":
                cols[alias] = fn_(cols)
            else:
                fv, fp = fn_(cols)
                valid = valid & fp & (fv != 0.0)
        gid = lane["pgb_gid"]
        slots = [jnp.where(valid, gid, -1)]
        vlist = []
        for op_ in _ops:
            v, p = cols[op_]
            v = jnp.broadcast_to(v, docs.shape)
            p = jnp.broadcast_to(p, docs.shape)
            slots.append(jnp.where(valid & p, gid, -1))
            vlist.append(v)
        gs = jnp.stack(slots, axis=1)
        vs = (jnp.stack(vlist, axis=1) if vlist
              else jnp.zeros((docs.shape[0], 0) + docs.shape[1:],
                             jnp.float32))
        res = {"count": count}
        res.update(groupby_aggregate_batch(gs, vs, G,
                                           want_sumsq=want_sumsq))
        return res

    return fused, W_raw


#: device-tail head size cap: SORT/LIMIT tails needing more rows than
#: this transfer the full [G] stat arrays instead (cursor-style reads)
_TAIL_CAP = 256


def _plan_device_tail(group, tail):
    """Decide whether the SORTBY/LIMIT tail can run in-graph so only the
    surviving rows cross the link.  The full [B, G] stat arrays are
    ~4-16 KB/query at dashboard G — on a ~20 MB/s attach that transfer
    alone capped batched aggregation near 1k QPS; the compact head is
    ~0.3 KB/query.

    Eligible tails: an optional single-key SORTBY over a reducer alias,
    followed by LIMITs, with a bounded head (max/offset+num <= cap).
    Returns (K_needed, sort_alias | None, ascending) or None.  The
    host replays the LIMIT arithmetic over the sorted head (reference
    semantics: ARRANGE steps apply in plan order,
    src/aggregate/aggregate_plan.h:28-38)."""
    if not tail:
        return None              # unbounded output: need every group
    steps = list(tail)
    sort = None
    if isinstance(steps[0], SortStep):
        sort = steps[0]
        if len(sort.keys) != 1:
            return None          # multi-key lexsort stays host-side
        steps = steps[1:]
    if not all(isinstance(s, LimitStep) for s in steps):
        return None              # LIMIT-then-SORT picks by id order
    need = []
    if sort is not None and sort.max:
        need.append(int(sort.max))
    need.extend(int(s.offset + s.num) for s in steps)
    if not need:
        return None
    K = min(need)
    if K <= 0 or K > _TAIL_CAP:
        return None
    sort_alias, asc = None, True
    if sort is not None:
        prop, asc = sort.keys[0]
        aliases = {al or make_reducer(nm, list(args)).default_alias()
                   for nm, args, al in group.reducers}
        if prop not in aliases:
            return None          # group-key / unknown sorts stay host
        sort_alias = prop
    return (K, sort_alias, asc)


def _device_red_specs(group, operands):
    """Reducer output columns in row order: [(alias, NAME, op_index)],
    op_index = position in `operands` (None for COUNT).  Mirrors the
    host column builder in _device_group_finish."""
    specs = []
    for name, args, alias in group.reducers:
        nm = name.upper()
        alias = alias or make_reducer(name, list(args)).default_alias()
        opj = (None if nm == "COUNT"
               else operands.index(str(args[0]).lstrip("@")))
        specs.append((alias, nm, opj))
    return specs


def _make_device_tail(G, dtail, red_specs):
    """In-graph SORT/LIMIT head: [B, G] stats -> top-K rows.  Returns a
    fn mapping the fused stat dict to the compact output dict:
    {"count": [B], "t.sel": [B, K] group ids, "t.ok": [B, K] live flags,
    "t.{i}.val"/"t.{i}.null": [B, K] per reducer row i}.

    Ordering contract matches the host finish exactly: absent groups
    (count 0) drop, NULL reducer values rank last regardless of
    direction, ties keep ascending group id (lax.top_k is stable by
    index, np.lexsort is stable)."""
    import jax
    import jax.numpy as jnp

    K, sort_alias, asc = dtail
    Ke = int(min(K, G))

    def tailfn(res):
        base_cnt = res["g.None.count"]              # [B, G]
        present = base_cnt > 0

        cols = {}
        for alias, nm, opj in red_specs:
            if alias in cols:
                continue
            tag = "None" if opj is None else str(opj)
            c = res[f"g.{tag}.count"]
            if nm == "COUNT":
                vals, nulls = base_cnt, ~present
            elif nm == "SUM":
                vals, nulls = res[f"g.{tag}.sum"], ~present
            elif nm == "AVG":
                vals = jnp.where(c > 0,
                                 res[f"g.{tag}.sum"] / jnp.maximum(c, 1.0),
                                 0.0)
                nulls = c == 0
            elif nm == "MIN":
                vals, nulls = res.get(f"g.{tag}.min", c), c == 0
            elif nm == "MAX":
                vals, nulls = res.get(f"g.{tag}.max", c), c == 0
            else:  # STDDEV
                var = ((res[f"g.{tag}.sumsq"]
                        - res[f"g.{tag}.sum"] ** 2 / jnp.maximum(c, 1.0))
                       / jnp.maximum(c - 1.0, 1.0))
                vals = jnp.where(c >= 2.0,
                                 jnp.sqrt(jnp.maximum(var, 0.0)), 0.0)
                nulls = c == 0
            cols[alias] = (vals, nulls)

        if sort_alias is None:
            # LIMIT only: first present groups in ascending id order
            score = -jnp.broadcast_to(
                jnp.arange(G, dtype=jnp.float32), base_cnt.shape)
        else:
            v, nl = cols[sort_alias]
            score = jnp.where(nl, jnp.float32(-1e37),
                              v if not asc else -v)
        score = jnp.where(present, score, jnp.float32(-3.4e38))
        _sv, sel = jax.lax.top_k(score, Ke)         # [B, Ke]
        out = {"count": res["count"], "t.sel": sel,
               "t.ok": jnp.take_along_axis(present, sel, axis=1)}
        for i, (alias, _nm, _opj) in enumerate(red_specs):
            v, nl = cols[alias]
            out[f"t.{i}.val"] = jnp.take_along_axis(v, sel, axis=1)
            out[f"t.{i}.null"] = jnp.take_along_axis(nl, sel, axis=1)
        return out

    return tailfn


_TARR_CACHE: dict = {}


def _tail_decode_arrays(key_infos):
    """Cached per-key object decode arrays + composite-id geometry for
    the compact tail finish (building the 1k-entry object array cost
    ~40 us/query at dashboard G)."""
    ck = tuple(id(t) for _ids, t in key_infos)
    ent = _TARR_CACHE.get(ck)
    if ent is None:
        tables = [list(t) for _ids, t in key_infos]
        gsizes = [len(t) + 1 for t in tables]
        tarrs = [np.array(t + [None], dtype=object) for t in tables]
        divs = []
        for d in range(len(gsizes)):
            div = 1
            for dd in range(d + 1, len(gsizes)):
                div *= gsizes[dd]
            divs.append(div)
        if len(_TARR_CACHE) > 64:
            _TARR_CACHE.clear()
        ent = (gsizes, tarrs, divs)
        _TARR_CACHE[ck] = ent
    return ent


def _device_tail_finish(index, h) -> "AggregateResult":
    """Materialize an AggregateResult from the compact device-tail
    output: decode the K surviving group ids' key values, replay the
    LIMIT arithmetic over the already-sorted head."""
    group, tail, _op_list, _mm, red_specs, parts = h
    (key_infos, _sizes), entry, flat = parts[0]
    out = (flat if isinstance(flat, dict)
           else entry._unpack_out(flat) if isinstance(flat, np.ndarray)
           else entry.finish(flat))
    total = int(out["count"])
    gsizes, tarrs, divs = _tail_decode_arrays(key_infos)
    ok = np.asarray(out["t.ok"], bool)
    n_ok = int(ok.sum())                        # ok rows form a prefix
    sel = np.asarray(out["t.sel"], np.int64)[:n_ok]

    key_vals = [tarrs[d][(sel // divs[d]) % gsizes[d]]
                for d in range(len(gsizes))]
    by_names = list(group.by)
    rows = []
    for i in range(len(sel)):
        row = {b: key_vals[d][i] for d, b in enumerate(by_names)}
        for j, (alias, _nm, _opj) in enumerate(red_specs):
            row[alias] = (E.NULL if out[f"t.{j}.null"][i]
                          else float(out[f"t.{j}.val"][i]))
        rows.append(row)
    for step in tail:
        if isinstance(step, SortStep):
            if step.max:
                rows = rows[:step.max]
        else:
            rows = rows[step.offset:step.offset + step.num]
    return AggregateResult(total=total, rows=rows)


def _gb_seg_state(cq, seg) -> str:
    """Segment-state part of the device-GROUPBY compile-cache key.
    Must carry everything _build_fn's program STRUCTURE depends on —
    notably deletions/TTL (a program compiled on a clean segment skips
    the deleted-mask pass and would keep counting deleted docs after a
    delete_document; engine executor sigs carry the same fields)."""
    from ..query.engine import _tag_codes_ords
    return (f"stride={seg.text.pos_stride}"
            f"|tc={_tag_codes_ords(cq, seg)}"
            f"|d={seg.n_deleted > 0}|t={seg.has_ttl}"
            f"|u={seg.uniform_docscore}"
            f"|ft={seg.text_fexp is not None}:{sorted(seg.field_fexp)}")


def _alias_key_encoding(seg, compiled_pre, in_fields, aliases):
    """Dictionary encoding of computed (APPLY-alias) group-key columns
    for one segment: evaluate the compiled pre-chain over the segment's
    numeric columns in ONE jitted program, then dict-encode each needed
    alias column exactly like a numeric key (_key_encoding).  One-time
    per (segment, plan) — cached by the _gbcols_cache around it."""
    import jax
    import jax.numpy as jnp

    def compute(cols):
        env = dict(cols)
        outs = {}
        for kind, alias, fn in compiled_pre:
            if kind != "apply":
                continue
            va, pa = fn(env)
            va = jnp.broadcast_to(va, (seg.n_pad,)).astype(jnp.float32)
            pa = jnp.broadcast_to(pa, (seg.n_pad,))
            env[alias] = (va, pa)
            if alias in aliases:
                outs[alias] = (va, pa)
        return outs

    cols = {f: (seg.numerics[f].values, seg.numerics[f].present)
            for f in in_fields if f in seg.numerics}
    outs = jax.device_get(jax.jit(compute)(cols))
    encs = {}
    for alias, (va, pa) in outs.items():
        va = np.asarray(va)
        pa = np.asarray(pa)
        uniq = np.unique(va[pa])
        ids = np.searchsorted(uniq, va).astype(np.int32)
        ids = np.where(pa, np.minimum(ids, max(len(uniq) - 1, 0)),
                       -1).astype(np.int32)
        encs[alias] = (jnp.asarray(ids), [float(u) for u in uniq])
    return encs


def _seg_group_args(index, seg, cq, group, in_fields,
                    compiled_pre=(), pre_sig="",
                    key_aliases=frozenset()):
    """Per-segment GROUPBY eligibility + device args: returns
    (key_infos, sizes, G, seg_args) or None (unencodable key / too many
    groups).  The stacked device columns are cached per (segment,
    by-keys, in_fields, pre-chain) — segments are immutable after seal,
    and restacking them per dispatch both re-executes device work and
    breaks executor-arg identity."""
    import jax.numpy as jnp
    from ..query.engine import _segment_args

    cache = getattr(seg, "_gbcols_cache", None)
    if cache is None:
        cache = seg._gbcols_cache = {}
    ckey = (tuple(group.by), tuple(in_fields),
            pre_sig if key_aliases else "")
    ent = cache.get(ckey)
    if ent is None:
        alias_encs = (_alias_key_encoding(seg, compiled_pre, in_fields,
                                          key_aliases)
                      if key_aliases else {})
        key_infos = []
        for b in group.by:
            enc = (alias_encs.get(b) if b in key_aliases
                   else _key_encoding(index, seg, b))
            if enc is None:
                return None
            key_infos.append(enc)
        sizes = tuple(len(t) + 1 for _ids, t in key_infos)  # +1 missing
        G = 1
        for s_ in sizes:
            G *= s_
        if G > _MAX_DEVICE_GROUPS:
            return None
        num_vals = (jnp.stack([seg.numerics[o].values for o in in_fields])
                    if in_fields
                    else jnp.zeros((0, seg.n_pad), jnp.float32))
        num_pres = (jnp.stack([seg.numerics[o].present
                               for o in in_fields])
                    if in_fields else jnp.zeros((0, seg.n_pad), bool))
        gb_keys = jnp.stack([ids for ids, _t in key_infos])
        ent = (key_infos, sizes, G, gb_keys, num_vals, num_pres)
        if len(cache) > 32:
            cache.clear()
        cache[ckey] = ent
    key_infos, sizes, G, gb_keys, num_vals, num_pres = ent
    seg_args = dict(_segment_args(cq, seg))
    seg_args["gb_keys"] = gb_keys
    seg_args["gb_num_vals"] = num_vals
    seg_args["gb_num_pres"] = num_pres
    return key_infos, sizes, G, seg_args


def _device_group_submit_batch(index, items):
    """Batched dispatch of same-shape device GROUPBYs: every query in
    `items` (equal plan shape + equal transport-row structure) runs as
    one lax.scan'd program per segment — ONE dispatch amortizes the
    per-program link/dispatch latency across the batch exactly like
    search's execute_batch (a tunneled attach pays ~ms per dispatch;
    B=64 sequential submits were the whole cost of the aggregate
    serving path).  Returns one handle per query whose parts reference
    the shared [B, ...] output (flat = (entry, device_buf, j)), or None
    when a segment is ineligible."""
    import numpy as _np
    import jax
    from ..query.engine import (_COMPILE_CACHE, _build_fn,
                                _PackedExecutor, _device_unpack_rows,
                                next_pow2)

    req0, cq0, plan0 = items[0]
    (group0, _tail0, operands, want_minmax, compiled_pre, in_fields,
     pre_sig, key_aliases) = plan0
    want_sumsq = any(n.upper() == "STDDEV"
                     for n, _a, _al in group0.reducers)
    # in-graph SORT/LIMIT head: only the surviving rows cross the link
    # (single-segment only — the tail must see the cross-segment merge)
    dtail = (_plan_device_tail(group0, _tail0)
             if len(index.segments) == 1 else None)
    red_specs = (_device_red_specs(group0, list(operands))
                 if dtail is not None else None)
    B = len(items)
    Bp = int(next_pow2(B))
    # >1024-query batches scan <=1024-query chunks INSIDE one program:
    # the intersection kernel's scalar-prefetched meta rows live in SMEM
    # (1 MB — B=2048 overflows it), and per-chunk staging bounds HBM
    # scratch.  Same chunking contract as search's _rows_executor.
    Cp = min(Bp, 1024)
    seg_parts = []
    for seg in index.segments:
        ga = _seg_group_args(index, seg, cq0, group0, in_fields,
                             compiled_pre, pre_sig, key_aliases)
        if ga is None:
            return None
        key_infos, sizes, G, seg_args = ga
        rows = [cq.bind_row(seg)[0] for _r, cq, _p in items]
        rows += [rows[-1]] * (Bp - B)     # pad: executables per pow2
        ent = cq0.bind_row(seg)[1]
        _static, _patches, layout, total, buckets, P, _gsig, lfp = ent
        # kernel-raw fast path eligibility (see _make_kernel_groupby).
        # _use_pallas gates it off plain-CPU runs: the XLA twin of the
        # intersection kernel has no raw mode (interpret-mode CI covers
        # the kernel lowering instead).
        from ..ops import intersect as IK
        from ..query.engine import _kernel_plan
        kplan = (None if want_minmax or not IK._use_pallas()
                 else _kernel_plan(cq0, seg, buckets, 16))
        if kplan is not None:
            pivots_k = list(kplan[2][kplan[3]][1])
            if not all(kplan[0][p][0] == "t" for p in pivots_k):
                kplan = None
            else:
                Wr = sum(kplan[1][p] // IK.BLK + IK.R_EXTRA
                         for p in pivots_k) * IK.BLK
                n_ops = len(operands)
                if Cp * Wr * (2 + 3 * n_ops
                              + 2 * len(in_fields)) > _MAX_BATCH_STAGE:
                    kplan = None
        tailfn = (None if dtail is None
                  else _make_device_tail(G, dtail, red_specs))
        sig = ("devgroupB2|" + cq0.signature(
            f"n={seg.n_pad}|G={G}|sz={sizes}|ops={operands}"
            f"|mm={want_minmax}|ws={want_sumsq}|by={tuple(group0.by)}"
            f"|pre={pre_sig}|kp={kplan is not None}"
            f"|dt={dtail}|rs={red_specs}"
            f"|B={Bp}|{_gb_seg_state(cq0, seg)}", buckets, P, 1)
            + f"|rows[{lfp}]")
        if kplan is not None:
            seg_args.update(_seg_posting_cols(
                index, seg, cq0, group0, in_fields, sizes,
                compiled_pre, pre_sig, key_aliases))
        def _chunked(fused_fn, _Bp=Bp, _Cp=Cp, _total=total):
            """Scan <=Cp-query chunks of the [Bp, total] rows inside one
            program (SMEM scalar-prefetch + HBM staging bounds)."""
            if _Bp <= _Cp:
                return fused_fn
            import jax as _jax

            def chunked(sa, dyn, _f=fused_fn):
                rows_all = dyn["rows"].reshape(_Bp // _Cp, _Cp, _total)

                def body(c, r):
                    return c, _f(sa, {"rows": r})

                _c, res = _jax.lax.scan(body, None, rows_all)
                return {k: v.reshape((_Bp,) + v.shape[2:])
                        for k, v in res.items()}
            return chunked

        entry = _COMPILE_CACHE.get(sig)
        if entry is None and kplan is not None:
            fused_k, _Wr = _make_kernel_groupby(
                kplan, layout, sizes, in_fields, compiled_pre,
                operands, G, want_sumsq)
            if tailfn is not None:
                fused_raw_k = fused_k

                def fused_k(sa, dyn, _f=fused_raw_k, _t=tailfn):
                    return _t(_f(sa, dyn))
            entry = _PackedExecutor(
                _chunked(fused_k),
                {"rows": _np.zeros((Bp, total), _np.int32)},
                seg_args)
            _COMPILE_CACHE[sig] = entry
        if entry is None:
            from ..ops.groupby import groupby_aggregate_batch
            from ..query.engine import _device_unpack
            raw = _build_fn(cq0, seg, buckets, P, 1, has_extra=False,
                            mode="window", jit=False)
            # window width (static): decides whether the whole batch can
            # stage its (gid, value) windows for the ONE-dispatch batched
            # groupby kernel, or must fall back to the per-query scan of
            # fused aggregations (match-all roots at 1M rows would stage
            # B x S x n_pad — too much HBM scratch; MIN/MAX reducers only
            # have the per-query kernel today)
            fused_cols = _make_fused_cols(cq0, raw, sizes, in_fields,
                                          compiled_pre, operands)
            dyn_proto = _device_unpack(layout,
                                       _np.zeros(total, _np.int32))
            shp = jax.eval_shape(lambda sa, d: fused_cols(sa, d),
                                 seg_args, dyn_proto)
            Wc = shp["gslots"].shape[1]
            S = shp["gslots"].shape[0]
            use_batch_kernel = (
                not want_minmax
                and Cp * Wc * (S + max(S - 1, 1)) <= _MAX_BATCH_STAGE)
            if use_batch_kernel:
                def fused_batch(seg_args_, dyn, _fc=fused_cols,
                                _layout=layout, _G=G, _ws=want_sumsq,
                                _t=tailfn):
                    stacked = _device_unpack_rows(_layout, dyn["rows"])

                    def body(c, row_dyn):
                        return c, _fc(seg_args_, row_dyn)

                    _c, res = jax.lax.scan(body, None, stacked)
                    gs = res.pop("gslots")
                    vs = res.pop("vals")
                    res.update(groupby_aggregate_batch(
                        gs, vs, _G, want_sumsq=_ws))
                    return res if _t is None else _t(res)
            else:
                fused1 = _make_fused(cq0, raw, G, sizes, in_fields,
                                     compiled_pre, operands, want_minmax)

                def fused_batch(seg_args_, dyn, _f=fused1,
                                _layout=layout, _t=tailfn):
                    stacked = _device_unpack_rows(_layout, dyn["rows"])

                    def body(c, row_dyn):
                        return c, _f(seg_args_, row_dyn)

                    _c, res = jax.lax.scan(body, None, stacked)
                    return res if _t is None else _t(res)

            entry = _PackedExecutor(
                _chunked(fused_batch),
                {"rows": _np.zeros((Bp, total), _np.int32)},
                seg_args)
            _COMPILE_CACHE[sig] = entry
        flat = entry.submit(seg_args, {"rows": _np.stack(rows)})
        seg_parts.append(((key_infos, sizes), entry, flat))
    handles = []
    for j, (req, cq, plan) in enumerate(items):
        parts = [((ki, sz), entry, (entry, flat, j))
                 for (ki, sz), entry, flat in seg_parts]
        handles.append((plan[0], plan[1], operands, want_minmax,
                        red_specs if dtail is not None else None,
                        parts))
    return handles


def _device_group_submit(index, req: AggregateRequest, cq):
    """Dispatch phase of the device GROUPBY: submits every segment's
    fused program asynchronously and returns a handle (or None when the
    plan isn't device-eligible).  run_aggregate_many batches same-shape
    aggregations into scanned programs instead (one dispatch per group);
    this single-query path serves run_aggregate/_try_device_group."""
    import jax.numpy as jnp

    plan = _plan_device_group_cached(index, req, cq)
    if plan is None:
        return None
    (group, tail, operands, want_minmax, compiled_pre, in_fields,
     pre_sig, key_aliases) = plan

    from ..query.engine import _COMPILE_CACHE, _build_fn
    parts = []
    for seg in index.segments:
        ga = _seg_group_args(index, seg, cq, group, in_fields,
                             compiled_pre, pre_sig, key_aliases)
        if ga is None:
            return None
        key_infos, sizes, G, seg_args = ga

        # ONE fused jitted program per (query shape, segment, G, ops):
        # window eval -> compiled pre steps -> key/operand gathers ->
        # one-hot aggregation.  Eager composition costs a device round
        # trip per op on a remote link; fused it's one dispatch, one
        # h2d, one d2h.
        binding, P = cq.bind(seg)
        dyn = binding.dyn
        dyn.pop("_tagL", None)
        buckets = dyn.pop("_buckets")
        sig = ("devgroup|" + cq.signature(
            f"n={seg.n_pad}|G={G}|sz={sizes}|ops={operands}"
            f"|mm={want_minmax}|by={tuple(group.by)}|pre={pre_sig}"
            f"|{_gb_seg_state(cq, seg)}", buckets, P, 1))
        entry = _COMPILE_CACHE.get(sig)
        if entry is None:
            raw = _build_fn(cq, seg, buckets, P, 1, has_extra=False,
                            mode="window", jit=False)
            fused = _make_fused(cq, raw, G, sizes, in_fields,
                                compiled_pre, operands, want_minmax)
            from ..query.engine import _PackedExecutor
            entry = _PackedExecutor(fused, dyn, seg_args)
            _COMPILE_CACHE[sig] = entry
        flat = entry.submit(seg_args, dyn)   # async device dispatch
        parts.append(((key_infos, sizes), entry, flat))
    return (group, tail, operands, want_minmax, None, parts)


def _device_group_finish(index, h) -> "AggregateResult":
    """Collect phase: drain every segment's packed output, merge the
    per-group [G] stat arrays with numpy scatter-reductions, run the
    SORT/LIMIT tail over arrays (np.lexsort), and decode group keys only
    for the rows that survive the tail.  The previous per-group Python
    loop (~1k dict updates per query) capped batched aggregate serving
    at ~175 QPS; everything here is O(G) numpy + O(limit) Python."""
    group, tail, op_list, want_minmax, _unused, parts = h
    total = 0
    outs = []
    for (key_infos, sizes), entry, flat in parts:
        if isinstance(flat, dict):          # pre-unpacked batched slice
            out = flat
        elif isinstance(flat, np.ndarray):
            out = entry._unpack_out(flat)
        else:
            out = entry.finish(flat)
        total += int(out["count"])
        outs.append((key_infos, sizes, out))

    stat_names = ("count", "sum", "sumsq") + (
        ("min", "max") if want_minmax else ())
    ops: list = [None] + list(op_list)

    def _seg_stats(out):
        st = {}
        for j, op in enumerate(ops):
            tag = "None" if op is None else str(j - 1)
            st[op] = {s: np.asarray(out[f"g.{tag}.{s}"], np.float64)
                      for s in stat_names if f"g.{tag}.{s}" in out}
        return st

    if len(outs) == 1:
        key_infos0, _sizes0, out0 = outs[0]
        tables = [list(t) for _ids, t in key_infos0]
        stats = _seg_stats(out0)
    else:
        # cross-segment merge: per-key global tables = union of the
        # per-segment dictionaries; remap each segment's composite group
        # ids into the global id space, then scatter-reduce its arrays.
        K = len(outs[0][1])
        tables = [np.unique(np.concatenate(
            [np.asarray(ki[d][1]) for ki, _s, _o in outs])).tolist()
            for d in range(K)]
        gsizes = [len(t) + 1 for t in tables]
        G = int(np.prod(gsizes))
        stats = {op: {} for op in ops}
        for op in ops:
            for s in stat_names:
                if op is None and s in ("min", "max"):
                    continue       # base COUNT op carries no min/max
                stats[op][s] = (np.full(G, 3.4e38) if s == "min" else
                                np.full(G, -3.4e38) if s == "max" else
                                np.zeros(G))
        for key_infos, sizes, out in outs:
            sst = _seg_stats(out)
            nz = np.nonzero(sst[None]["count"] > 0)[0]
            if nz.size == 0:
                continue
            g = nz.copy()
            dims = []
            for d in range(K - 1, -1, -1):
                g, r = np.divmod(g, sizes[d])
                loc = list(key_infos[d][1])
                if loc:
                    remap = np.searchsorted(np.asarray(tables[d]),
                                            np.asarray(loc))
                    gr = np.where(r < len(loc),
                                  remap[np.minimum(r, len(loc) - 1)],
                                  len(tables[d]))
                else:
                    gr = np.full(nz.shape, len(tables[d]), np.int64)
                dims.append(gr)
            dims.reverse()
            ggid = np.zeros(nz.shape, np.int64)
            for d in range(K):
                ggid = ggid * gsizes[d] + dims[d]
            for op in ops:
                for s, arr in sst[op].items():
                    if s not in stats[op]:
                        continue
                    v = arr[nz]
                    if s == "min":
                        np.minimum.at(stats[op][s], ggid, v)
                    elif s == "max":
                        np.maximum.at(stats[op][s], ggid, v)
                    else:
                        np.add.at(stats[op][s], ggid, v)

    gsizes = [len(t) + 1 for t in tables]
    base_cnt = stats[None]["count"]
    present = base_cnt > 0

    # reducer output columns over the full [G] group space
    red_cols: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    red_order: list[str] = []
    with np.errstate(divide="ignore", invalid="ignore"):
        for name, args, alias in group.reducers:
            nm = name.upper()
            alias = alias or make_reducer(name, list(args)).default_alias()
            op = None if nm == "COUNT" else str(args[0].lstrip("@"))
            st = stats.get(op) or stats[None]
            c = st["count"]
            if nm == "COUNT":
                vals, nulls = c, ~present
            elif nm == "SUM":
                vals, nulls = st["sum"], ~present
            elif nm == "AVG":
                vals = np.where(c > 0, st["sum"] / np.maximum(c, 1.0), 0.0)
                nulls = c == 0
            elif nm == "MIN":
                vals, nulls = st.get("min", c), c == 0
            elif nm == "MAX":
                vals, nulls = st.get("max", c), c == 0
            else:  # STDDEV
                var = ((st["sumsq"] - st["sum"] ** 2 / np.maximum(c, 1.0))
                       / np.maximum(c - 1.0, 1.0))
                vals = np.where(c >= 2, np.sqrt(np.maximum(var, 0.0)), 0.0)
                nulls = c == 0
            red_cols[alias] = (vals, nulls)
            if alias not in red_order:
                red_order.append(alias)

    def key_col(d: int, idxs: np.ndarray):
        """Decoded group-key column d at `idxs` as an object array
        (None = missing, matching E.NULL)."""
        div = 1
        for dd in range(d + 1, len(gsizes)):
            div *= gsizes[dd]
        r = (idxs // div) % gsizes[d]
        tarr = np.array(list(tables[d]) + [None], dtype=object)
        return tarr[r], r == len(tables[d])

    def key_rank(d: int):
        """Per-local-id sort rank for key column d (tables aren't
        necessarily sorted; rank via argsort once per column)."""
        tbl = tables[d]
        rank = np.zeros(len(tbl) + 1, np.float64)
        if tbl:
            order = np.argsort(np.asarray(tbl), kind="stable")
            rank[order] = np.arange(len(tbl), dtype=np.float64)
        return rank

    sel = np.nonzero(present)[0]
    by_names = list(group.by)
    for step in tail:
        if isinstance(step, LimitStep):
            sel = sel[step.offset:step.offset + step.num]
            continue
        # SortStep: np.lexsort uses the LAST column as primary — emit
        # (value, null-tier) pairs from the least-significant key up.
        # NULLs rank last regardless of direction (reference:
        # value/src/comparison.rs cmp_fields), hence the un-negated tier.
        lex = []
        for prop, asc in reversed(step.keys):
            if prop in red_cols:
                vals, nulls = red_cols[prop]
                v, nl = vals[sel].astype(np.float64), nulls[sel]
            elif prop in by_names:
                d = by_names.index(prop)
                div = 1
                for dd in range(d + 1, len(gsizes)):
                    div *= gsizes[dd]
                r = (sel // div) % gsizes[d]
                v, nl = key_rank(d)[r], r == len(tables[d])
            else:   # unknown property: NULL everywhere, stable order
                v = np.zeros(sel.shape, np.float64)
                nl = np.ones(sel.shape, bool)
            lex.append(np.where(nl, 0.0, v if asc else -v))
            lex.append(nl)
        if lex:
            sel = sel[np.lexsort(lex)]
        if step.max:
            sel = sel[:step.max]

    key_vals = [key_col(d, sel)[0] for d in range(len(by_names))]
    red_sel = [(alias, red_cols[alias][0][sel], red_cols[alias][1][sel])
               for alias in red_order]
    rows = []
    for i in range(len(sel)):
        row = {b: key_vals[d][i] for d, b in enumerate(by_names)}
        for alias, va, nu in red_sel:
            row[alias] = E.NULL if nu[i] else float(va[i])
        rows.append(row)
    return AggregateResult(total=total, rows=rows)


# ---------------------------------------------------------------------------
# Streaming execution (WITHCURSOR): the input side yields row-dict chunks
# lazily and APPLY/FILTER/GROUP consume them incrementally — the analog of
# the reference coordinator's RPNet pulling shard cursor chunks into the
# local pipeline (src/coord/rpnet.c:268-420).  Aggregations no longer
# materialize every matching row before the first step runs; SORT (and
# group finalization) are the only barriers.
# ---------------------------------------------------------------------------

_STREAM_CHUNK = 4096


def run_aggregate_streaming(index, req: AggregateRequest):
    """Returns (chunk_iterator, total) for cursor-driven plans.

    Device-eligible GROUPBYs and KNN plans produce small outputs and run
    materialized; everything else streams: the device window pass runs
    per segment up front (total comes from its counts), but row-dict
    construction and the host steps pull chunk by chunk — a LIMIT that
    fills early never touches the remaining rows."""
    index.commit()
    opts = (QueryOptions(scorer=req.scorer, verbatim=req.verbatim)
            if req.now is None else
            QueryOptions(scorer=req.scorer, verbatim=req.verbatim,
                         now=req.now))
    cq = index.prepare(req.query, req.params, opts, req.dialect)

    fast = _try_device_group(index, req, cq)
    if fast is not None:
        return iter([fast.rows]), fast.total
    if cq.knn is not None:
        res = run_aggregate(index, req)
        return iter([res.rows]), res.total

    seg_results = [(seg, execute(cq, seg, 1, mode="window"))
                   for seg in index.segments]
    total = sum(int(r.count) for _, r in seg_results)

    def input_chunks():
        for seg, res in seg_results:
            sel = res.local_idx[res.valid]
            scores = res.scores[res.valid]
            gids = seg.gids_host
            for start in range(0, len(sel), _STREAM_CHUNK):
                rows = []
                for j in range(start, min(start + _STREAM_CHUNK,
                                          len(sel))):
                    gid = int(gids[int(sel[j])])
                    meta = index.doctable.get(gid)
                    if meta is None or meta.deleted:
                        continue
                    rows.append({"__key": meta.key,
                                 "__score": float(scores[j]),
                                 "__gid": gid, "__meta": meta})
                if rows:
                    yield rows

    return _steps_streaming(index, req, input_chunks()), total


def _steps_streaming(index, req: AggregateRequest, chunks):
    """Compose the step chain as chunk generators (same semantics as
    _run_steps, including implicit field materialization)."""
    produced: set[str] = set()
    for step in req.steps:
        needed = _step_props(step) - produced
        if needed:
            chunks = _gen_materialize(index, chunks, needed)
        if isinstance(step, LoadStep):
            chunks = _gen_materialize(index, chunks, step.fields)
            if step.fields:
                produced |= set(step.fields)
        elif isinstance(step, ApplyStep):
            chunks = _gen_apply(chunks, step)
            produced.add(step.alias)
        elif isinstance(step, FilterStep):
            chunks = _gen_filter(chunks, step)
        elif isinstance(step, GroupStep):
            chunks = _gen_group(chunks, step)
            produced = set(step.by)
            for name, args, alias in step.reducers:
                produced.add(alias or make_reducer(name, args)
                             .default_alias())
        elif isinstance(step, SortStep):
            chunks = _gen_sort(chunks, step)
        elif isinstance(step, LimitStep):
            chunks = _gen_limit(chunks, step)
    return _gen_scrub(chunks, req)


def _gen_materialize(index, chunks, fields):
    for rows in chunks:
        _materialize(index, rows, fields)
        yield rows


def _gen_apply(chunks, step):
    for rows in chunks:
        for row in rows:
            row[step.alias] = E.evaluate(step.parsed, row)
        yield rows


def _gen_filter(chunks, step):
    for rows in chunks:
        out = [r for r in rows
               if E._truthy(E.evaluate(step.parsed, r))]
        if out:
            yield out


def _gen_group(chunks, step):
    """Incremental grouping: accumulators update per chunk; finalized
    group rows stream out once the input drains (the reference Grouper
    also yields groups only at upstream EOF, group_by.c:158)."""
    groups: dict[tuple, tuple[dict, list]] = {}
    specs = [(name, args, alias) for name, args, alias in step.reducers]
    for rows in chunks:
        for row in rows:
            keyvals = []
            for b in step.by:
                v = row.get(b, E.NULL)
                keyvals.append(tuple(v) if isinstance(v, list) else v)
            key = tuple(keyvals)
            ent = groups.get(key)
            if ent is None:
                grow = {b: row.get(b, E.NULL) for b in step.by}
                reds = [make_reducer(n, a) for n, a, _ in specs]
                ent = (grow, reds)
                groups[key] = ent
            for red in ent[1]:
                red.add(row)
    out = []
    for grow, reds in groups.values():
        for (name, args, alias), red in zip(specs, reds):
            grow[alias or red.default_alias()] = red.finalize()
        out.append(grow)
        if len(out) >= _STREAM_CHUNK:
            yield out
            out = []
    if out:
        yield out


def _gen_sort(chunks, step):
    rows: list[dict] = []
    for c in chunks:
        rows.extend(c)
    rows = _sort(rows, step)
    for start in range(0, len(rows), _STREAM_CHUNK):
        yield rows[start:start + _STREAM_CHUNK]


def _gen_limit(chunks, step):
    """Early-terminating LIMIT: once offset+num rows have streamed out,
    the upstream generators are never pulled again."""
    skip = step.offset
    want = step.num
    for rows in chunks:
        if want <= 0:
            return
        if skip >= len(rows):
            skip -= len(rows)
            continue
        rows = rows[skip:]
        skip = 0
        if len(rows) > want:
            rows = rows[:want]
        want -= len(rows)
        yield rows
        if want <= 0:
            return


def _gen_scrub(chunks, req):
    for rows in chunks:
        for row in rows:
            row.pop("__meta", None)
            row.pop("__gid", None)
            if not req.add_scores:
                row.pop("__score", None)
        yield rows


def _run_steps(index, req: AggregateRequest, rows: list[dict],
               timings: Optional[list] = None) -> list[dict]:
    # implicit behavior: fields referenced anywhere auto-load from stored
    # docs unless produced by an earlier APPLY/GROUPBY (the reference
    # resolves via RLookup: sorting vector, loaded doc, or computed key)
    produced: set[str] = set()
    for step in req.steps:
        t_step = time.perf_counter() if timings is not None else 0.0
        needed = _step_props(step) - produced
        if needed:
            _materialize(index, rows, needed)
        if isinstance(step, LoadStep):
            _materialize(index, rows, step.fields)
            if step.fields:
                produced |= set(step.fields)
        elif isinstance(step, ApplyStep):
            for row in rows:
                row[step.alias] = E.evaluate(step.parsed, row)
            produced.add(step.alias)
        elif isinstance(step, FilterStep):
            rows = [r for r in rows if E._truthy(E.evaluate(step.parsed, r))]
        elif isinstance(step, GroupStep):
            rows = _group(rows, step)
            produced = set(step.by)
            for name, args, alias in step.reducers:
                produced.add(alias or make_reducer(name, args)
                             .default_alias())
        elif isinstance(step, SortStep):
            rows = _sort(rows, step)
        elif isinstance(step, LimitStep):
            rows = rows[step.offset:step.offset + step.num]
        if timings is not None:
            timings.append({
                "name": type(step).__name__.replace("Step", "").upper(),
                "time_ms": round((time.perf_counter() - t_step) * 1e3, 3),
                "rows": len(rows)})
    # scrub internals
    for row in rows:
        row.pop("__meta", None)
        row.pop("__gid", None)
        if not req.add_scores:
            row.pop("__score", None)
    return rows


def _step_props(step) -> set[str]:
    if isinstance(step, ApplyStep):
        return E.properties(step.parsed)
    if isinstance(step, FilterStep):
        return E.properties(step.parsed)
    if isinstance(step, GroupStep):
        out = set(step.by)
        for name, args, _ in step.reducers:
            out |= {a.lstrip("@") for a in args
                    if isinstance(a, str) and a.startswith("@")}
            if args and not args[0].startswith("@"):
                out.add(args[0].lstrip("@"))
        return out
    if isinstance(step, SortStep):
        return {k for k, _ in step.keys}
    return set()


def _materialize(index, rows: list[dict], fields: Optional[Sequence[str]]):
    """Pull stored field values into rows (reference: RP_LOADER)."""
    for row in rows:
        meta = row.get("__meta")
        if meta is None:
            continue
        if fields is None:
            for k, v in meta.fields.items():
                row.setdefault(k, v)
        else:
            for f in fields:
                if f in ("__key", "__score") or f in row:
                    continue
                if f == "key" and f not in meta.fields:
                    row[f] = meta.key
                    continue
                if f in meta.fields:
                    row[f] = _coerce(index, f, meta.fields[f])


def _coerce(index, field: str, value):
    f = index.schema.try_field(field)
    if f is not None and f.type == FieldType.NUMERIC:
        try:
            return float(value)
        except (TypeError, ValueError):
            return E.NULL
    return value


def _group(rows: list[dict], step: GroupStep) -> list[dict]:
    """Reference: Grouper (src/aggregate/group_by.c:63-158)."""
    groups: dict[tuple, tuple[dict, list[Reducer]]] = {}
    specs = [(name, args, alias) for name, args, alias in step.reducers]
    for row in rows:
        keyvals = []
        for b in step.by:
            v = row.get(b, E.NULL)
            keyvals.append(tuple(v) if isinstance(v, list) else v)
        key = tuple(keyvals)
        ent = groups.get(key)
        if ent is None:
            grow = {b: row.get(b, E.NULL) for b in step.by}
            reds = [make_reducer(n, a) for n, a, _ in specs]
            ent = (grow, reds)
            groups[key] = ent
        for red in ent[1]:
            red.add(row)
    out = []
    for grow, reds in groups.values():
        for (name, args, alias), red in zip(specs, reds):
            grow[alias or red.default_alias()] = red.finalize()
        out.append(grow)
    return out


def _sort(rows: list[dict], step: SortStep) -> list[dict]:
    # handle mixed asc/desc on strings with a stable multi-pass sort
    out = rows
    for prop, asc in reversed(step.keys):
        def single(row, p=prop, a=asc):
            v = row.get(p, E.NULL)
            if v is E.NULL:
                # a missing value ranks LAST regardless of direction
                # (reference: value/src/comparison.rs cmp_fields); pick
                # the tier so the pass's `reverse` lands it at the end
                return (2, 0.0, "") if a else (-1, 0.0, "")
            n = E._num(v)
            if n is not None:
                return (0, n, "")
            return (1, 0.0, str(v))
        out = sorted(out, key=single, reverse=not asc)
    if step.max:
        out = out[:step.max]
    return out
