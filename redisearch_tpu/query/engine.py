"""Query plan compiler + jitted executor.

This is the TPU-native replacement for the reference's eval + pipeline pair:
Query_EvalNode building a QueryIterator tree (src/query.c:1194,
src/redisearch_rs/query_eval) and the result-processor chain
(AREQ_BuildPipeline, src/pipeline/pipeline_construction.c).  Instead of a
doc-at-a-time iterator tree pulled by a processor chain, a query compiles to
a single jitted array program over a segment:

    postings gather -> dense (match, tf) accumulators per term slot
    -> boolean tree combine (masks) + scorer transform (dense math)
    -> structured filters (dense column compares)
    -> masked top-k (by score or by sort key)

The compiler separates *static structure* (tree shape, bucket sizes, scorer,
k) from *dynamic values* (term slot offsets, idf, numeric bounds, geo params,
vector blobs), so repeated query shapes reuse the XLA executable — the
analog of the reference's cached parsed programs, but at the compiled-kernel
level (SURVEY.md §7.3 "plan compiler with bucketed static shapes").
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..analysis.stemmer import Stemmer
from ..index.segment import Segment, next_pow2
from ..schema import FieldType, Schema
from ..utils import wkt
from ..utils.errors import FieldNotFound, QuerySyntaxError, WrongFieldType
from ..ops import text as T
from ..ops import vector as V
from . import ast, expand

# ---------------------------------------------------------------------------
# IR (static structure — everything here keys the compile cache)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LTerms:
    """Union of term slots [lo, hi): a token + its expansions, or an
    affix/fuzzy/wildcard expansion group."""
    lo: int
    hi: int


@dataclasses.dataclass(frozen=True)
class LPhrase:
    slots: tuple[int, ...]     # one slot per phrase position
    slop: int
    inorder: bool
    score_lo: int              # slots contributing to the score
    score_hi: int


@dataclasses.dataclass(frozen=True)
class LTag:
    field: str
    ord: int                   # tag leaf ordinal (keys dynamic arrays)
    n_slots: int               # padded value-slot count (pow2)


@dataclasses.dataclass(frozen=True)
class LNumeric:
    ord: int
    field: str
    lo_excl: bool
    hi_excl: bool


@dataclasses.dataclass(frozen=True)
class LGeo:
    ord: int
    field: str


@dataclasses.dataclass(frozen=True)
class LVecRange:
    ord: int
    field: str
    metric: str


@dataclasses.dataclass(frozen=True)
class LHostMask:
    """Geometry predicates / explicit id lists: host-computed bool mask."""
    ord: int


@dataclasses.dataclass(frozen=True)
class LMissing:
    field: str


@dataclasses.dataclass(frozen=True)
class LAll:
    pass


@dataclasses.dataclass(frozen=True)
class LNone:
    pass


# tree nodes: ("and"|"or"|"dismax", (kids...)) | ("not"|"opt", kid)
# | ("leaf", leaf_obj, leaf_index)


# ---------------------------------------------------------------------------
# Compiled query
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class QueryOptions:
    scorer: str = "BM25STD"        # BM25STD|BM25STD.TANH|TFIDF|TFIDF.DOCNORM
    #                                |DISMAX|DOCSCORE
    k: int = 10                    # offset+num results wanted
    sort_field: Optional[str] = None
    sort_asc: bool = True
    slop: int = -1                 # global SLOP request arg
    inorder: bool = False
    now: int = 0                   # epoch seconds for TTL filtering
    max_expansions: int = expand.DEFAULT_MAX_EXPANSIONS
    min_prefix: int = expand.DEFAULT_MIN_PREFIX
    language: str = "english"
    verbatim: bool = False         # disable stemming expansion
    with_vector_scores: bool = True


@dataclasses.dataclass
class SegmentBinding:
    """Dynamic argument pack for one segment."""
    seg: Segment
    dyn: dict[str, Any]


class CompiledQuery:
    """Static structure + per-segment dynamic bindings."""

    def __init__(self, schema: Schema, root: ast.Node, opts: QueryOptions,
                 synonyms=None):
        self.schema = schema
        self.opts = opts
        self._syn = synonyms
        # slot tables filled during lowering
        self.term_strings: list[str] = []     # slot -> index term
        self.term_qmasks: list[int] = []      # slot -> field bitmask
        self.term_weights: list[float] = []   # slot -> query weight
        self.tag_leaves: list[tuple[str, list[str], float]] = []
        #   (field attr, value patterns..., weight) resolved at bind
        self.tag_nodes: list[ast.TagNode] = []
        self.num_bounds: list[tuple[float, float]] = []
        self.geo_params: list[tuple[float, float, float]] = []
        self.vec_blobs: list[np.ndarray] = []
        self.vec_radii: list[float] = []
        self.host_nodes: list[ast.Node] = []  # geometry/ids nodes
        self.leaf_consts: list[float] = []    # per-leaf constant score
        self._n_leaves = 0
        # KNN (top-level only)
        self.knn: Optional[ast.VectorNode] = None

        self._stemmer = None if opts.verbatim else Stemmer(opts.language)
        # Index-level stats (set by the Index layer for multi-segment
        # correctness; falls back to per-segment stats).
        self.global_N: Optional[int] = None
        self.global_avgdl: Optional[float] = None
        root = self._unwrap_knn(root)
        self.tree = self._lower(root)

    # -- lowering ---------------------------------------------------------
    def _unwrap_knn(self, node: ast.Node) -> ast.Node:
        if isinstance(node, ast.VectorNode) and node.mode == "KNN":
            self.knn = node
            return node.child if node.child is not None else ast.WildcardNode()
        return node

    def _leaf(self, leaf, const: float = 0.0):
        idx = self._n_leaves
        self._n_leaves += 1
        self.leaf_consts.append(const)
        return ("leaf", leaf, idx)

    def _qmask(self, node: ast.Node) -> int:
        return self.schema.text_field_mask(node.fieldmask_attrs)

    def _add_term_slot(self, term: str, qmask: int, weight: float) -> int:
        self.term_strings.append(term)
        self.term_qmasks.append(qmask)
        self.term_weights.append(weight)
        return len(self.term_strings) - 1

    def _lower(self, node: ast.Node):
        w = node.weight
        if isinstance(node, ast.TokenNode):
            qmask = self._qmask(node)
            phonetic = any(
                self.schema.field(a).phonetic
                for a in (node.fieldmask_attrs or [])
                if self.schema.try_field(a)
            ) if node.fieldmask_attrs else any(
                f.phonetic for f in self.schema.text_fields())
            terms = expand.expand_token(
                node.term, node.verbatim or self.opts.verbatim,
                self._stemmer, self._syn, phonetic)
            lo = len(self.term_strings)
            for t in terms:
                self._add_term_slot(t, qmask, w)
            return self._leaf(LTerms(lo, len(self.term_strings)))
        if isinstance(node, (ast.AffixNode, ast.FuzzyNode,
                             ast.WildcardQueryNode)):
            qmask = self._qmask(node)
            lo = len(self.term_strings)
            # slots are reserved now; actual terms resolved at bind time
            # (per segment dict).  Reserve a pow2 bucket of slots.
            n = next_pow2(min(self.opts.max_expansions, 256))
            for _ in range(n):
                self._add_term_slot("", qmask, w)
            self._expansion_nodes = getattr(self, "_expansion_nodes", {})
            self._expansion_nodes[lo] = node
            return self._leaf(LTerms(lo, len(self.term_strings)))
        if isinstance(node, ast.PhraseNode):
            qmask = self._qmask(node)
            slots = []
            lo = len(self.term_strings)
            for t in node.terms:
                if not isinstance(t, ast.TokenNode):
                    raise QuerySyntaxError(
                        "phrase members must be plain terms")
                slots.append(self._add_term_slot(t.term, qmask, w))
            slop = node.slop if not node.exact else 0
            inorder = node.inorder or node.exact
            return self._leaf(LPhrase(tuple(slots), slop, inorder, lo,
                                      len(self.term_strings)))
        if isinstance(node, ast.IntersectNode):
            if self.opts.slop >= 0:
                # global SLOP: token-only intersections become phrases
                toks = [k for k in node.kids if isinstance(k, ast.TokenNode)]
                if len(toks) == len(node.kids) and len(toks) > 1:
                    ph = ast.PhraseNode(
                        terms=toks, exact=False, slop=self.opts.slop,
                        inorder=self.opts.inorder,
                        fieldmask_attrs=node.fieldmask_attrs)
                    return self._lower(ph)
            return ("and", tuple(self._lower(k) for k in node.kids))
        if isinstance(node, ast.UnionNode):
            op = "dismax" if self.opts.scorer == "DISMAX" else "or"
            return (op, tuple(self._lower(k) for k in node.kids))
        if isinstance(node, ast.NotNode):
            return ("not", self._lower(node.child))
        if isinstance(node, ast.OptionalNode):
            return ("opt", self._lower(node.child))
        if isinstance(node, ast.TagNode):
            field = self.schema.field(node.field)
            if field.type != FieldType.TAG:
                raise WrongFieldType(f"@{node.field} is not a TAG field")
            ordn = len(self.tag_nodes)
            self.tag_nodes.append(node)
            n_slots = next_pow2(max(
                len(node.kids),
                min(self.opts.max_expansions, 256)
                if any(not isinstance(k, ast.TokenNode) for k in node.kids)
                else len(node.kids)))
            return self._leaf(LTag(field.attribute, ordn, n_slots), const=w)
        if isinstance(node, ast.NumericNode):
            field = self.schema.field(node.field)
            if field.type != FieldType.NUMERIC:
                raise WrongFieldType(f"@{node.field} is not NUMERIC")
            ordn = len(self.num_bounds)
            self.num_bounds.append((node.lo, node.hi))
            return self._leaf(
                LNumeric(ordn, field.attribute, node.lo_excl, node.hi_excl),
                const=w)
        if isinstance(node, ast.GeoNode):
            field = self.schema.field(node.field)
            if field.type != FieldType.GEO:
                raise WrongFieldType(f"@{node.field} is not GEO")
            unit_m = {"m": 1.0, "km": 1000.0, "mi": 1609.34, "ft": 0.3048}
            ordn = len(self.geo_params)
            self.geo_params.append((math.radians(node.lon),
                                    math.radians(node.lat),
                                    node.radius * unit_m[node.unit]))
            return self._leaf(LGeo(ordn, field.attribute), const=w)
        if isinstance(node, ast.GeometryNode):
            field = self.schema.field(node.field)
            if field.type != FieldType.GEOMETRY:
                raise WrongFieldType(f"@{node.field} is not GEOMETRY")
            ordn = len(self.host_nodes)
            self.host_nodes.append(node)
            return self._leaf(LHostMask(ordn), const=w)
        if isinstance(node, ast.IdsNode):
            ordn = len(self.host_nodes)
            self.host_nodes.append(node)
            return self._leaf(LHostMask(ordn), const=w)
        if isinstance(node, ast.VectorNode):
            if node.mode != "RANGE":
                raise QuerySyntaxError("KNN must be a top-level expression")
            field = self.schema.field(node.field)
            if field.type != FieldType.VECTOR:
                raise WrongFieldType(f"@{node.field} is not VECTOR")
            ordn = len(self.vec_blobs)
            self.vec_blobs.append(np.asarray(node.blob, np.float32))
            self.vec_radii.append(float(node.radius))
            return self._leaf(
                LVecRange(ordn, field.attribute,
                          field.vector.metric.value), const=w)
        if isinstance(node, ast.MissingNode):
            field = self.schema.field(node.field)
            if not field.indexmissing:
                raise QuerySyntaxError(
                    f"field {node.field} not indexed with INDEXMISSING")
            return self._leaf(LMissing(field.attribute), const=w)
        if isinstance(node, ast.WildcardNode):
            return self._leaf(LAll(), const=w)
        if isinstance(node, ast.EmptyNode):
            return self._leaf(LNone())
        raise QuerySyntaxError(f"cannot lower {type(node).__name__}")

    def set_synonyms(self, syn):
        self._syn = syn

    # -- signature (compile-cache key) -----------------------------------
    def signature(self, seg_sig: str, L: int, P: int, k: int,
                  batch: int = 1) -> str:
        return (f"{self.tree}|T={len(self.term_strings)}|L={L}|P={P}|k={k}"
                f"|scorer={self.opts.scorer}"
                f"|sort={self.opts.sort_field}:{self.opts.sort_asc}"
                f"|knn={self.knn.field if self.knn else None}"
                f"|b={batch}|{seg_sig}")

    # -- binding ----------------------------------------------------------
    def bind(self, seg: Segment) -> tuple[SegmentBinding, int, int]:
        """Resolve slots against one segment; returns (binding, L, P)."""
        opts = self.opts
        n_slots = len(self.term_strings)
        starts = np.zeros(n_slots, np.int32)
        lens = np.zeros(n_slots, np.int32)
        qmasks = np.asarray(self.term_qmasks or [0], np.int32)
        if n_slots == 0:
            qmasks = np.zeros(0, np.int32)

        # resolve dynamic expansions (affix/fuzzy/wildcard) per segment
        term_strings = list(self.term_strings)
        for lo, node in getattr(self, "_expansion_nodes", {}).items():
            terms = self._expand_node(node, seg)
            hi = lo
            while hi < n_slots and self.term_strings[hi] == "":
                hi += 1
            width = hi - lo
            for j, t in enumerate(terms[:width]):
                term_strings[lo + j] = t

        toff = seg.text.term_offsets_np
        dfs = np.zeros(n_slots, np.float64)
        for i, t in enumerate(term_strings):
            if not t:
                continue
            tid = seg.terms.lookup(t)
            if tid < 0:
                continue
            starts[i] = toff[tid]
            lens[i] = toff[tid + 1] - toff[tid]
            dfs[i] = seg.terms.doc_freq[tid]

        N = self.global_N if self.global_N else max(seg.n_docs, 1)
        idf = self._idf(dfs, N)
        tweight = (np.asarray(self.term_weights, np.float32)
                   if n_slots else np.zeros(0, np.float32))
        tweight = tweight * idf.astype(np.float32)

        L = int(next_pow2(max(int(lens.max()) if n_slots else 1, 1)))
        dyn: dict[str, Any] = {
            "tstarts": starts, "tlens": lens, "tmasks": qmasks,
            "tweight": tweight,
            "leaf_const": np.asarray(self.leaf_consts or [0.0], np.float32),
            "avgdl": np.float32(
                self.global_avgdl if self.global_avgdl
                else float(np.asarray(seg.doclen).sum()) / N),
            "now": np.int32(opts.now),
        }

        # tags
        P_tag = 1
        for j, node in enumerate(self.tag_nodes):
            tp = seg.tags.get(self.schema.field(node.field).attribute)
            leaf = self._find_tag_leaf(j)
            ns = leaf.n_slots
            tstarts = np.zeros(ns, np.int32)
            tlens = np.zeros(ns, np.int32)
            if tp is not None:
                vals = self._expand_tag_values(node, tp)
                for a, v in enumerate(vals[:ns]):
                    vid = tp.ids.get(v, -1)
                    if vid >= 0:
                        tstarts[a] = tp.offsets_np[vid]
                        tlens[a] = tp.offsets_np[vid + 1] - tp.offsets_np[vid]
                P_tag = max(P_tag, int(tlens.max()) if ns else 1)
            dyn[f"tag{j}_starts"] = tstarts
            dyn[f"tag{j}_lens"] = tlens
        dyn["_tagL"] = P_tag  # popped before jit

        # numerics / geo
        if self.num_bounds:
            dyn["num_lo"] = np.asarray([b[0] for b in self.num_bounds],
                                       np.float32)
            dyn["num_hi"] = np.asarray([b[1] for b in self.num_bounds],
                                       np.float32)
        if self.geo_params:
            dyn["geo_lon"] = np.asarray([g[0] for g in self.geo_params],
                                        np.float32)
            dyn["geo_lat"] = np.asarray([g[1] for g in self.geo_params],
                                        np.float32)
            dyn["geo_rad"] = np.asarray([g[2] for g in self.geo_params],
                                        np.float32)
        for i, blob in enumerate(self.vec_blobs):
            dyn[f"vblob{i}"] = blob
            dyn[f"vrad{i}"] = np.float32(self.vec_radii[i])

        # host-evaluated masks (geometry, ids)
        for i, node in enumerate(self.host_nodes):
            dyn[f"hm{i}"] = self._host_mask(node, seg)

        # position window bucket for phrase leaves
        P = 1
        for leaf in self._phrase_leaves(self.tree):
            for s in leaf.slots:
                if lens[s] > 0:
                    a = int(starts[s])
                    b = a + int(lens[s])
                    po = np.asarray(seg.text.pos_offsets[a]), np.asarray(
                        seg.text.pos_offsets[b])
                    P = max(P, int(po[1]) - int(po[0]))
        P = int(next_pow2(max(P, 1)))

        return SegmentBinding(seg, dyn), L, P

    def _idf(self, dfs: np.ndarray, N: int) -> np.ndarray:
        if self.opts.scorer.startswith("BM25"):
            # BM25 idf (reference idf crate: ln(1 + (N-n+0.5)/(n+0.5)))
            return np.log1p((N - dfs + 0.5) / (dfs + 0.5)).clip(min=0.0)
        # TFIDF logb idf: log2(1 + N/df)
        with np.errstate(divide="ignore"):
            return np.where(dfs > 0, np.log2(1.0 + N / np.maximum(dfs, 1)),
                            0.0)

    def _expand_node(self, node: ast.Node, seg: Segment) -> list[str]:
        st = seg.terms.sorted_terms
        if isinstance(node, ast.AffixNode):
            if len(node.text) < self.opts.min_prefix:
                return []
            return expand.expand_affix(st, node.text, node.prefix,
                                       node.suffix, self.opts.max_expansions)
        if isinstance(node, ast.FuzzyNode):
            return expand.expand_fuzzy(seg.terms, node.term, node.max_dist,
                                       self.opts.max_expansions)
        if isinstance(node, ast.WildcardQueryNode):
            return expand.expand_wildcard(st, node.pattern,
                                          self.opts.max_expansions)
        return []

    def _expand_tag_values(self, node: ast.TagNode, tp) -> list[str]:
        field = self.schema.field(node.field)
        out = []
        for k in node.kids:
            if isinstance(k, ast.TokenNode):
                v = k.term if field.casesensitive else k.term.lower()
                out.append(v.strip())
            elif isinstance(k, ast.AffixNode):
                out.extend(expand.expand_affix(
                    tp.sorted_values, k.text, k.prefix, k.suffix,
                    self.opts.max_expansions))
            elif isinstance(k, ast.WildcardQueryNode):
                out.extend(expand.expand_wildcard(
                    tp.sorted_values, k.pattern, self.opts.max_expansions))
            elif isinstance(k, ast.FuzzyNode):
                # fuzzy over tag values: brute force (tag dicts are small)
                out.extend([v for v in tp.sorted_values
                            if _lev(k.term, v) <= k.max_dist]
                           [:self.opts.max_expansions])
        return out

    def _host_mask(self, node: ast.Node, seg: Segment) -> np.ndarray:
        mask = np.zeros(seg.n_pad, bool)
        if isinstance(node, ast.GeometryNode):
            shapes = seg.geometries.get(
                self.schema.field(node.field).attribute)
            if shapes:
                q = wkt.parse(node.wkt)
                pred = wkt.PREDICATES[node.predicate]
                for i, s in enumerate(shapes):
                    if s is not None and pred(s, q):
                        mask[i] = True
        elif isinstance(node, ast.IdsNode):
            for key in node.keys:
                # resolved by the Index layer (gid -> local); see index.py
                pass
        return mask

    def _find_tag_leaf(self, ordn: int) -> LTag:
        for leaf in self._iter_leaves(self.tree):
            if isinstance(leaf, LTag) and leaf.ord == ordn:
                return leaf
        raise AssertionError

    def _iter_leaves(self, tree):
        tag = tree[0]
        if tag == "leaf":
            yield tree[1]
        elif tag in ("not", "opt"):
            yield from self._iter_leaves(tree[1])
        else:
            for k in tree[1]:
                yield from self._iter_leaves(k)

    def _phrase_leaves(self, tree):
        return [l for l in self._iter_leaves(tree) if isinstance(l, LPhrase)]


def _lev(a: str, b: str) -> int:
    if abs(len(a) - len(b)) > 3:
        return 4
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# ---------------------------------------------------------------------------
# Executor
# ---------------------------------------------------------------------------

_COMPILE_CACHE: dict[str, Any] = {}


@dataclasses.dataclass
class SegmentResult:
    """Raw device outputs for one segment."""
    local_idx: np.ndarray      # int32[k]
    scores: np.ndarray         # float32[k] (or -inf for empty tail)
    count: int                 # total matching docs
    sortkeys: Optional[np.ndarray] = None
    knn_dists: Optional[np.ndarray] = None


def execute(cq: CompiledQuery, seg: Segment, k: int,
            extra_mask: Optional[np.ndarray] = None,
            mode: str = "topk") -> SegmentResult:
    """Run a compiled query against one segment.

    mode "topk": top-k by score/sortkey (FT.SEARCH path).
    mode "mask": full dense match mask + scores (aggregation source).
    """
    binding, L, P = cq.bind(seg)
    dyn = binding.dyn
    tagL = int(next_pow2(dyn.pop("_tagL")))
    if extra_mask is not None:
        dyn["extra_mask"] = extra_mask
    k_pad = int(min(next_pow2(max(k, 1)), seg.n_pad))
    seg_sig = (f"n={seg.n_pad}|stride={seg.text.pos_stride}|tagL={tagL}"
               f"|extra={extra_mask is not None}|mode={mode}")
    sig = cq.signature(seg_sig, L, P, k_pad)
    fn = _COMPILE_CACHE.get(sig)
    if fn is None:
        fn = _build_fn(cq, seg, L, P, tagL, k_pad,
                       has_extra="extra_mask" in dyn, mode=mode)
        _COMPILE_CACHE[sig] = fn
    seg_args = _segment_args(cq, seg)
    out = fn(seg_args, {k_: jnp.asarray(v) for k_, v in dyn.items()})
    if mode == "mask":
        return SegmentResult(
            local_idx=np.asarray(out["match"]),   # bool mask, n_pad
            scores=np.asarray(out["score"]),
            count=int(out["count"]),
            knn_dists=np.asarray(out["knn"]) if "knn" in out else None,
        )
    res = SegmentResult(
        local_idx=np.asarray(out["idx"]),
        scores=np.asarray(out["scores"]),
        count=int(out["count"]),
        sortkeys=np.asarray(out["sortkeys"]) if "sortkeys" in out else None,
        knn_dists=np.asarray(out["knn"]) if "knn" in out else None,
    )
    return res


def _segment_args(cq: CompiledQuery, seg: Segment) -> dict:
    args = {
        "gids": seg.gids,
        "doc_ids": seg.text.doc_ids,
        "freqs": seg.text.freqs,
        "field_masks": seg.text.field_masks,
        "pos_offsets": seg.text.pos_offsets,
        "poskeys": seg.text.poskeys,
        "alive": seg.alive,
        "doclen": seg.doclen,
        "max_freq": seg.max_freq,
        "docscore": seg.docscore,
        "expire_at": seg.expire_at,
    }
    for j, node in enumerate(cq.tag_nodes):
        tp = seg.tags.get(cq.schema.field(node.field).attribute)
        args[f"tag{j}_docs"] = (tp.doc_ids if tp is not None
                                else jnp.zeros(1, jnp.int32))
    for leaf in cq._iter_leaves(cq.tree):
        if isinstance(leaf, LNumeric):
            col = seg.numerics[leaf.field]
            args[f"num{leaf.ord}_v"] = col.values
            args[f"num{leaf.ord}_p"] = col.present
        elif isinstance(leaf, LGeo):
            col = seg.geos[leaf.field]
            args[f"geo{leaf.ord}_lon"] = col.lon
            args[f"geo{leaf.ord}_lat"] = col.lat
            args[f"geo{leaf.ord}_p"] = col.present
        elif isinstance(leaf, LVecRange):
            col = seg.vectors[leaf.field]
            args[f"vec{leaf.ord}"] = col.vecs
            args[f"vec{leaf.ord}_p"] = col.present
            args[f"vec{leaf.ord}_sq"] = col.sq_norms
        elif isinstance(leaf, LMissing):
            args[f"has_{leaf.field}"] = seg.missing[leaf.field]
    if cq.knn is not None:
        field = cq.schema.field(cq.knn.field)
        col = seg.vectors[field.attribute]
        args["knn_vecs"] = col.vecs
        args["knn_present"] = col.present
        args["knn_sq"] = col.sq_norms
        args["knn_blob"] = jnp.asarray(
            np.asarray(cq.knn.blob, np.float32))
    if cq.opts.sort_field:
        f = cq.schema.field(cq.opts.sort_field)
        if f.type == FieldType.NUMERIC:
            col = seg.numerics[f.attribute]
            args["sort_v"] = col.values
            args["sort_p"] = col.present
        elif f.attribute in seg.strcols:
            sc = seg.strcols[f.attribute]
            args["sort_v"] = sc.order.astype(jnp.float32)
            args["sort_p"] = sc.value_ids >= 0
        else:
            raise FieldNotFound(
                f"SORTBY field {f.attribute} is not sortable")
    return args


def _build_fn(cq: CompiledQuery, seg_proto: Segment, L: int, P: int,
              tagL: int, k: int, has_extra: bool, mode: str = "topk",
              jit: bool = True):
    """Build + jit the executor for one query structure."""
    opts = cq.opts
    scorer = opts.scorer
    tree = cq.tree
    pos_stride = seg_proto.text.pos_stride
    knn = cq.knn
    knn_metric = (cq.schema.field(knn.field).vector.metric.value
                  if knn is not None else None)

    def run(seg, dyn):
        n_pad = seg["alive"].shape[0]
        n_slots = len(cq.term_strings)

        # ---- dense tf for all term slots (one scatter)
        if n_slots:
            acc = T.terms_tf_dense(
                seg["doc_ids"], seg["freqs"], seg["field_masks"],
                dyn["tstarts"], dyn["tlens"], dyn["tmasks"], n_pad, L)
            # acc holds tf; a separate +1 scatter marks matches even when
            # field weights are 0.  Single (term,doc) entry per slot, so
            # tf = acc_tf, match = acc_cnt > 0 — both from one fused pass:
            tf = acc
            # scorer transform
            if scorer.startswith("BM25"):
                contrib = T.bm25_transform(
                    tf, dyn["tweight"][:, None], seg["doclen"][None, :],
                    dyn["avgdl"])
            elif scorer == "TFIDF.DOCNORM":
                contrib = T.tfidf_docnorm_transform(
                    tf, dyn["tweight"][:, None], seg["doclen"][None, :])
            else:  # TFIDF, DISMAX, DOCSCORE use normalized tf*idf
                contrib = T.tfidf_transform(
                    tf, dyn["tweight"][:, None], seg["max_freq"][None, :])
            match_slots = tf > 0.0
        else:
            contrib = jnp.zeros((0, n_pad), jnp.float32)
            match_slots = jnp.zeros((0, n_pad), jnp.bool_)

        ones = jnp.ones((n_pad,), jnp.bool_)
        zeros_f = jnp.zeros((n_pad,), jnp.float32)

        def eval_node(t):
            tag = t[0]
            if tag == "leaf":
                return eval_leaf(t[1], t[2])
            if tag == "and":
                ms, ss = zip(*(eval_node(k) for k in t[1]))
                m = ms[0]
                for x in ms[1:]:
                    m = m & x
                s = sum(ss[1:], ss[0])
                return m, jnp.where(m, s, 0.0)
            if tag in ("or", "dismax"):
                ms, ss = zip(*(eval_node(k) for k in t[1]))
                m = ms[0]
                for x in ms[1:]:
                    m = m | x
                if tag == "dismax":
                    s = ss[0]
                    for x in ss[1:]:
                        s = jnp.maximum(s, x)
                else:
                    s = sum(ss[1:], ss[0])
                return m, s
            if tag == "not":
                m, _ = eval_node(t[1])
                return seg["alive"] & ~m, zeros_f
            if tag == "opt":
                m, s = eval_node(t[1])
                return ones, s
            raise AssertionError(tag)

        def eval_leaf(leaf, idx):
            const = dyn["leaf_const"][idx]
            if isinstance(leaf, LTerms):
                m = jnp.any(match_slots[leaf.lo:leaf.hi], axis=0)
                s = jnp.sum(contrib[leaf.lo:leaf.hi], axis=0)
                return m, s
            if isinstance(leaf, LPhrase):
                starts = jnp.stack([dyn["tstarts"][s] for s in leaf.slots])
                lens = jnp.stack([dyn["tlens"][s] for s in leaf.slots])
                m = T.phrase_match_dense(
                    seg["poskeys"], seg["pos_offsets"], starts, lens,
                    pos_stride, leaf.slop, leaf.inorder, n_pad, P)
                anylen = jnp.all(lens > 0)
                m = m & anylen
                # each phrase term must also match the field-mask filter
                # (positions are field-agnostic; masks live on postings)
                for s_ in leaf.slots:
                    m = m & match_slots[s_]
                s = jnp.sum(contrib[leaf.score_lo:leaf.score_hi], axis=0)
                return m, jnp.where(m, s, 0.0)
            if isinstance(leaf, LTag):
                m = T.tags_match_dense(
                    seg[f"tag{leaf.ord}_docs"],
                    dyn[f"tag{leaf.ord}_starts"],
                    dyn[f"tag{leaf.ord}_lens"], n_pad, tagL)
                return m, jnp.where(m, const, 0.0)
            if isinstance(leaf, LNumeric):
                m = T.numeric_range_mask(
                    seg[f"num{leaf.ord}_v"], seg[f"num{leaf.ord}_p"],
                    dyn["num_lo"][leaf.ord], dyn["num_hi"][leaf.ord],
                    leaf.lo_excl, leaf.hi_excl)
                return m, jnp.where(m, const, 0.0)
            if isinstance(leaf, LGeo):
                m = T.geo_radius_mask(
                    seg[f"geo{leaf.ord}_lon"], seg[f"geo{leaf.ord}_lat"],
                    seg[f"geo{leaf.ord}_p"], dyn["geo_lon"][leaf.ord],
                    dyn["geo_lat"][leaf.ord], dyn["geo_rad"][leaf.ord])
                return m, jnp.where(m, const, 0.0)
            if isinstance(leaf, LVecRange):
                d = V.distances_to(
                    seg[f"vec{leaf.ord}"], seg[f"vec{leaf.ord}_sq"],
                    dyn[f"vblob{leaf.ord}"], leaf.metric)
                m = (seg[f"vec{leaf.ord}_p"]
                     & (d <= dyn[f"vrad{leaf.ord}"]))
                return m, jnp.where(m, const, 0.0)
            if isinstance(leaf, LHostMask):
                m = dyn[f"hm{leaf.ord}"]
                return m, jnp.where(m, const, 0.0)
            if isinstance(leaf, LMissing):
                return seg["alive"] & ~seg[f"has_{leaf.field}"], zeros_f
            if isinstance(leaf, LAll):
                return seg["alive"], zeros_f
            if isinstance(leaf, LNone):
                return jnp.zeros((n_pad,), jnp.bool_), zeros_f
            raise AssertionError(leaf)

        match, score = eval_node(tree)
        # TTL + alive + padding
        not_expired = (seg["expire_at"] == 0) | (seg["expire_at"] > dyn["now"])
        match = match & seg["alive"] & not_expired
        if has_extra:
            match = match & dyn["extra_mask"]

        if scorer == "DOCSCORE":
            score = seg["docscore"]
        else:
            score = score * seg["docscore"]
        if scorer == "BM25STD.TANH":
            score = jnp.tanh(score)

        count = jnp.sum(match.astype(jnp.int32))
        out = {"count": count}

        if mode == "mask":
            out["match"] = match
            out["score"] = jnp.where(match, score, 0.0)
            if knn is not None:
                d = V.distances_to(seg["knn_vecs"], seg["knn_sq"],
                                   seg["knn_blob"], knn_metric)
                out["knn"] = jnp.where(match & seg["knn_present"], d, 3.4e38)
            return out

        if knn is not None:
            d = V.distances_to(seg["knn_vecs"], seg["knn_sq"],
                               seg["knn_blob"], knn_metric)
            valid = match & seg["knn_present"]
            big = jnp.float32(3.4e38)
            dm = jnp.where(valid, d, big)
            vals, idx = jax.lax.top_k(-dm, k)
            out["idx"] = idx
            out["knn"] = -vals
            out["scores"] = score[idx]
            out["count"] = jnp.sum(valid.astype(jnp.int32))
            return out

        if opts.sort_field:
            valid = match & seg["sort_p"]
            keyvals, idx = T.topk_by_key(seg["sort_v"], valid, k,
                                         opts.sort_asc)
            out["idx"] = idx
            out["scores"] = score[idx]
            out["sortkeys"] = keyvals
            # docs matching but missing the sort field rank last; count
            # stays the full match count like the reference sorter
            return out

        neg = jnp.float32(-3.4e38)
        masked = jnp.where(match, score, neg)
        vals, idx = jax.lax.top_k(masked, k)
        out["idx"] = idx
        out["scores"] = vals
        return out

    return jax.jit(run) if jit else run
