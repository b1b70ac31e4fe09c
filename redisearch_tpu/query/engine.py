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
import time as _time
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
from ..ops import window as W
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
    # epoch seconds for TTL filtering; defaults to the real clock so no
    # call site can accidentally run TTL checks against t=0
    now: int = dataclasses.field(
        default_factory=lambda: int(_time.time()))
    max_expansions: int = expand.DEFAULT_MAX_EXPANSIONS
    min_prefix: int = expand.DEFAULT_MIN_PREFIX
    language: str = "english"
    verbatim: bool = False         # disable stemming expansion
    with_vector_scores: bool = True
    expander: str = ""             # custom expander name (ext.py), "" = default
    # NOSTOPWORDS: keep stopwords as query terms (reference: RSSearchOptions
    # flag Search_NoStopwrods, parsed in aggregate_request.c)
    nostopwords: bool = False
    # INFIELDS: default TEXT field mask for terms without an explicit
    # @field modifier (reference: RSSearchOptions fieldmask)
    in_fields: Optional[tuple] = None
    # BM25STD.TANH stretch: score = tanh(bm25 / factor)
    # (reference: tanhStretched, ext/default.c; BM25STD_TANH_FACTOR=4)
    tanh_factor: float = 4.0


@dataclasses.dataclass
class SegmentBinding:
    """Dynamic argument pack for one segment."""
    seg: Segment
    dyn: dict[str, Any]
    # bind-time notices (e.g. exact slow path engaged for a phrase over
    # an ultra-common term) — surfaced on SearchResult.warnings
    warnings: tuple = ()


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
        self.vec_blob_params: list = []       # $param names for rebinding
        self.vec_blob_fields: list = []       # Field per blob (dtype)
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
        self._bind_cache: dict = {}   # seg.uid -> (dyn template, P)
        self._row_cache: dict = {}    # seg.uid -> packed-row template

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
        attrs = node.fieldmask_attrs
        if attrs is None and self.opts.in_fields:
            # INFIELDS narrows unscoped terms; explicit @field wins
            attrs = list(self.opts.in_fields)
        return self.schema.text_field_mask(attrs)

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
            from .. import ext as _ext
            custom = _ext.get_expander(self.opts.expander)
            if custom is not None and not (node.verbatim
                                           or self.opts.verbatim):
                terms = list(dict.fromkeys(custom(node.term)))
            else:
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
            self.vec_blobs.append(decode_blob(node.blob, field))
            self.vec_blob_params.append(node.blob_param)
            self.vec_blob_fields.append(field)
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
        self._bind_cache.clear()
        self._row_cache.clear()

    # -- signature (compile-cache key) -----------------------------------
    @property
    def tree_sig(self) -> str:
        """Structure fingerprint: identical iff two queries can share one
        compiled executable (same lowered tree/scorer/sort/knn shape)."""
        ts = getattr(self, "_tree_str", None)
        if ts is None:
            # stringifying the lowered tree is O(tree) — memoize it; the
            # rest of the key is cheap per call
            ts = self._tree_str = (
                f"{self.tree}|T={len(self.term_strings)}"
                f"|scorer={self.opts.scorer}"
                f"|th={self.opts.tanh_factor}"
                f"|sort={self.opts.sort_field}:{self.opts.sort_asc}"
                f"|knn={self.knn.field if self.knn else None}")
        return ts

    def signature(self, seg_sig: str, buckets: dict, P: int, k: int,
                  batch: int = 1) -> str:
        bstr = ",".join(f"{i}:{b}" for i, b in sorted(buckets.items()))
        return f"{self.tree_sig}|B[{bstr}]|P={P}|k={k}|b={batch}|{seg_sig}"

    @staticmethod
    def bucket_size(n: int) -> int:
        """Quantize a window length to a coarse bucket.

        Powers of 4 starting at 2048 (2k, 8k, 32k, 131k, 524k, 2M): a
        handful of levels keeps the compile universe tiny (each distinct
        bucket vector is one XLA executable) while per-query window
        inflation is bounded at 4x.  Small-side leaves keep small
        buckets, preserving the pivot-on-smallest intersection
        advantage.  The 2048 floor matters for serving: a zipf query
        mix's median term df is in the hundreds, and the mega-kernel's
        per-query cost (DMA rows, phase vectors, top-k extraction) scales
        with the BUCKET, not the live length.
        """
        b = 2048
        while b < n:
            b *= 4
        return b

    def leaves(self) -> list[tuple[Any, int]]:
        """All (leaf, leaf_idx) pairs of the lowered tree."""
        out = []

        def rec(t):
            if t[0] == "leaf":
                out.append((t[1], t[2]))
            elif t[0] in ("not", "opt"):
                rec(t[1])
            else:
                for k in t[1]:
                    rec(k)
        rec(self.tree)
        return out

    # -- binding ----------------------------------------------------------
    def bind(self, seg: Segment) -> tuple[SegmentBinding, int]:
        """Resolve slots against one segment, memoized per segment.

        Segments are immutable after seal, so everything bind computes is
        a pure function of (this query, segment) EXCEPT the clock and the
        vector payloads (rebound per call by prepare()).  The memo turns
        the serving hot path's per-query numpy work into one dict copy —
        bind dominated host time at batch-serving rates."""
        ent = self._bind_cache.get(seg.uid)
        if ent is None:
            binding, P = self._bind_fresh(seg)
            if len(self._bind_cache) > 64:
                self._bind_cache.clear()
            self._bind_cache[seg.uid] = (dict(binding.dyn), P,
                                         binding.warnings)
            return binding, P
        dyn_t, P, warns = ent
        dyn = dict(dyn_t)   # callers pop/add keys on their copy
        dyn["now"] = np.int32(self.opts.now)
        for i, blob in enumerate(self.vec_blobs):
            dyn[f"vblob{i}"] = blob
            dyn[f"vrad{i}"] = np.float32(self.vec_radii[i])
        if self.knn is not None:
            dyn["knn_blob"] = decode_blob(
                self.knn.blob, self.schema.field(self.knn.field))
        return SegmentBinding(seg, dyn, warns), P

    def bind_row(self, seg: Segment):
        """Bind against one segment as a packed int32 transport row.

        The serving path's binding: everything static w.r.t.
        (query, segment) — slot tables, window buckets, layout — is
        computed once and cached; each execution costs one row memcpy
        plus clock/vector-payload patches.  Returns (row, template)
        where template = (static_row, patches, layout, total, buckets,
        P2, group_sig, layout_fp): queries with equal group_sig can run
        in one batched executable over stacked rows."""
        ent = self._row_cache.get(seg.uid)
        if ent is None:
            binding, P = self.bind(seg)
            dyn = binding.dyn
            dyn.pop("_tagL", None)
            bk = dyn.pop("_buckets")
            layout, total = _layout_of(dyn)
            static = np.zeros(total, np.int32)
            _pack_into(layout, dyn, static)
            patches = tuple(
                e for e in layout
                if e[0] == "now" or e[0] == "knn_blob"
                or e[0].startswith("vblob") or e[0].startswith("vrad"))
            P2 = int(next_pow2(P))
            gsig = ((self.tree_sig,) + tuple(sorted(bk.items())) + (P2,))
            lfp = ";".join(f"{k}:{s}:{d}" for k, _, _, s, d in layout)
            ent = (static, patches, layout, total, bk, P2, gsig, lfp)
            if len(self._row_cache) > 64:
                self._row_cache.clear()
            self._row_cache[seg.uid] = ent
        static, patches = ent[0], ent[1]
        row = static.copy()
        for key, o, n, shape, dt in patches:
            if key == "now":
                row[o] = np.int32(self.opts.now)
                continue
            if key == "knn_blob":
                a = decode_blob(self.knn.blob,
                                self.schema.field(self.knn.field))
            elif key.startswith("vblob"):
                a = self.vec_blobs[int(key[5:])]
            else:                       # vrad{i}
                a = np.float32(self.vec_radii[int(key[4:])])
            a = np.asarray(a)
            if dt.startswith("float") or dt == "bfloat16":
                v = a.reshape(-1).astype(np.float32).view(np.int32)
            elif dt == "int32":
                v = a.reshape(-1)
            else:
                v = a.reshape(-1).astype(np.int32)
            row[o:o + n] = v
        return row, ent

    def _bind_fresh(self, seg: Segment) -> tuple[SegmentBinding, int]:
        """Resolve slots against one segment; returns (binding, P)."""
        opts = self.opts
        self._bind_warnings: list[str] = []
        n_slots = len(self.term_strings)
        starts = np.zeros(n_slots, np.int32)
        lens = np.zeros(n_slots, np.int32)
        from ..index.segment import mask_words, pack_mask_words
        K_words = mask_words(self.schema.num_text_fields)
        qmasks = pack_mask_words(self.term_qmasks or [0], K_words)
        if n_slots == 0:
            qmasks = (np.zeros(0, np.int32) if K_words == 1
                      else np.zeros((0, K_words), np.int32))

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
            "n_docs": np.int32(seg.n_docs),
        }

        # tags
        P_tag = 1
        for j, node in enumerate(self.tag_nodes):
            tp = seg.tags.get(self.schema.field(node.field).attribute)
            leaf = self._find_tag_leaf(j)
            ns = leaf.n_slots
            tstarts = np.zeros(ns, np.int32)
            tlens = np.zeros(ns, np.int32)
            # -2 = unbound slot: never equals a real value id, nor the -1
            # "doc has no value" marker in the dense codes column
            tqcodes = np.full(ns, -2, np.int32)
            if tp is not None:
                vals = self._expand_tag_values(node, tp)
                for a, v in enumerate(vals[:ns]):
                    vid = tp.ids.get(v, -1)
                    if vid >= 0:
                        tstarts[a] = tp.offsets_np[vid]
                        tlens[a] = tp.offsets_np[vid + 1] - tp.offsets_np[vid]
                        tqcodes[a] = vid
                P_tag = max(P_tag, int(tlens.max()) if ns else 1)
            dyn[f"tag{j}_starts"] = tstarts
            dyn[f"tag{j}_lens"] = tlens
            dyn[f"tag{j}_qcodes"] = tqcodes
        dyn["_tagL"] = P_tag  # popped before jit

        # numerics / geo
        numw_start = np.zeros(max(len(self.num_bounds), 1), np.int32)
        numw_len = np.zeros(max(len(self.num_bounds), 1), np.int32)
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
        if self.knn is not None:
            # per-query payload: lives in dyn so batched execution binds
            # each query's own blob (not the batch prototype's)
            dyn["knn_blob"] = decode_blob(
                self.knn.blob, self.schema.field(self.knn.field))

        # host-evaluated masks (geometry, ids)
        for i, node in enumerate(self.host_nodes):
            dyn[f"hm{i}"] = self._host_mask(node, seg)

        # position window bucket for phrase leaves (host mirror — indexing
        # the device array here would cost a transfer round trip per slot)
        P = 1
        po_np = seg.text.pos_offsets_np
        for leaf in self._phrase_leaves(self.tree):
            for s in leaf.slots:
                if lens[s] > 0 and po_np is not None:
                    a = int(starts[s])
                    b = a + int(lens[s])
                    P = max(P, int(po_np[b]) - int(po_np[a]))
        from ..index.segment import POS_SLICE_PAD
        P = min(int(self.bucket_size(P)), POS_SLICE_PAD) if P > 1 else 1

        # ---- per-leaf window buckets (static shapes for the window
        # evaluator; part of the compile-cache key)
        cap = int(next_pow2(seg.n_pad))
        buckets: dict[int, tuple] = {}
        tweight = dyn["tweight"]
        for leaf, idx in self.leaves():
            if isinstance(leaf, LTerms):
                lo, hi = leaf.lo, leaf.hi
                # compact non-empty slots to the front of the leaf range so
                # a static prefix covers every live expansion
                rng = list(range(lo, hi))
                nz = [i for i in rng if lens[i] > 0]
                perm = nz + [i for i in rng if lens[i] == 0]
                for arr in (starts, lens, qmasks, tweight):
                    arr[lo:hi] = arr[perm]
                nu = next_pow2(max(len(nz), 1))
                W = min(self.bucket_size(
                    int(lens[lo:hi].max()) if hi > lo else 1), cap)
                buckets[idx] = (min(nu, hi - lo), W)
            elif isinstance(leaf, LPhrase):
                W = min(self.bucket_size(
                    max((int(lens[s]) for s in leaf.slots), default=1)), cap)
                # per-slot position counts -> pivot on the rarest term so
                # the candidate set is the smallest position list
                po = seg.text.pos_offsets_np
                ncounts = []
                for s_ in leaf.slots:
                    a = int(starts[s_])
                    b = a + int(lens[s_])
                    ncounts.append(int(po[b] - po[a]) if lens[s_] > 0
                                   else 0)
                pos_counts = [c if c > 0 else 10**9 for c in ncounts]
                # in-order chains anchor on term 0 (reference walks
                # children in query order with a running span check);
                # unordered chains pivot on the rarest term
                pivot_j = 0 if leaf.inorder else int(
                    np.argmin(pos_counts))
                from ..index.segment import POS_SLICE_PAD as _PSP
                # members past the window cap probe the poskeys CSR by
                # dynamic binary search; a pivot past the cap scans its
                # run in chunks — NO truncation either way
                bigs = tuple(bool(c > _PSP) for c in ncounts)
                big_rounds = tuple(
                    max(int(np.ceil(np.log2(c + 1))), 1) if b else 0
                    for c, b in zip(ncounts, bigs))
                Pc = min(self.bucket_size(max(ncounts[pivot_j], 1)), _PSP)
                n_chunks = (
                    -(-ncounts[pivot_j] // Pc) if bigs[pivot_j] else 1)
                small = [c for j, c in enumerate(ncounts)
                         if j != pivot_j and not bigs[j]]
                Pm = min(self.bucket_size(max(max(small, default=1), 1)),
                         _PSP)
                if n_chunks > 1 or any(bigs):
                    self._bind_warnings.append(
                        "phrase over ultra-common term: exact slow path "
                        f"engaged (positions={max(ncounts)})")
                buckets[idx] = (W, Pc, Pm, pivot_j, bigs, big_rounds,
                                n_chunks)
            elif isinstance(leaf, LTag):
                ts = dyn[f"tag{leaf.ord}_starts"]
                tl = dyn[f"tag{leaf.ord}_lens"]
                nz = np.nonzero(tl > 0)[0]
                perm = np.concatenate([nz, np.nonzero(tl == 0)[0]])
                dyn[f"tag{leaf.ord}_starts"] = ts[perm]
                dyn[f"tag{leaf.ord}_lens"] = tl[perm]
                dyn[f"tag{leaf.ord}_qcodes"] = \
                    dyn[f"tag{leaf.ord}_qcodes"][perm]
                nu = next_pow2(max(len(nz), 1))
                W = min(self.bucket_size(int(tl.max()) if tl.size else 1),
                        cap)
                buckets[idx] = (min(nu, len(tl)), W)
            elif isinstance(leaf, LNumeric):
                col = seg.numerics.get(leaf.field)
                length = 0
                multi = bool(col is not None and col.multi)
                capN = cap
                if col is not None and col.sorted_vals_np is not None:
                    lo_v, hi_v = self.num_bounds[leaf.ord]
                    sv = col.sorted_vals_np
                    a = np.searchsorted(
                        sv, lo_v, side="right" if leaf.lo_excl else "left")
                    b = np.searchsorted(
                        sv, hi_v, side="left" if leaf.hi_excl else "right")
                    length = max(int(b - a), 0)
                    numw_start[leaf.ord] = a
                    numw_len[leaf.ord] = length
                    if multi:
                        # the expanded (value,doc) run can exceed n_pad
                        capN = int(next_pow2(max(len(sv), 1)))
                buckets[idx] = (min(self.bucket_size(length), capN), multi)
            elif isinstance(leaf, LVecRange):
                colv = seg.vectors.get(leaf.field)
                buckets[idx] = (bool(colv is not None and colv.multi),)
            else:
                buckets[idx] = ()
        # GetSlop divisor buckets (TFIDF/TFIDF.DOCNORM/legacy BM25): per
        # root-child, per-slot position-window sizes.  Computed AFTER the
        # LTerms slot compaction above so indices line up with the
        # compacted dyn arrays.
        if self.opts.scorer in _SLOP_SCORERS:
            slop_info = _slop_root_children(self.tree)
            if slop_info is not None:
                from ..index.segment import POS_SLICE_PAD as _PSP2
                sb = []
                for ch in slop_info[1]:
                    if ch[0] != "slots":
                        sb.append(())
                        continue
                    per = []
                    for s_ in ch[1]:
                        c = 0
                        if lens[s_] > 0 and po_np is not None:
                            a = int(starts[s_])
                            b = a + int(lens[s_])
                            c = int(po_np[b]) - int(po_np[a])
                        per.append(min(self.bucket_size(max(c, 1)), _PSP2))
                    sb.append(tuple(per))
                buckets[-1] = tuple(sb)

        dyn["numw_start"] = numw_start
        dyn["numw_len"] = numw_len
        dyn["_buckets"] = buckets  # popped before jit

        return SegmentBinding(seg, dyn, tuple(self._bind_warnings)), P

    def _idf(self, dfs: np.ndarray, N: int) -> np.ndarray:
        if self.opts.scorer == "DISMAX":
            # reference dismaxRecursive: term score = weight * freq —
            # no idf at all (ext/default.c:377-455)
            return np.ones_like(dfs)
        if self.opts.scorer == "BM25":
            # the legacy BM25 scorer uses the logb idf, not the BM25 idf
            # (ext/default.c bm25Recursive: QueryTerm_GetIDF) — fall
            # through to the TFIDF branch below
            pass
        elif self.opts.scorer.startswith("BM25"):
            # BM25 idf (reference idf crate: ln(1 + (N-n+0.5)/(n+0.5)))
            return np.log1p((N - dfs + 0.5) / (dfs + 0.5)).clip(min=0.0)
        # TFIDF idf = logb(1 + (N+1)/max(df,1)): the BINARY EXPONENT, a
        # step function — not a smooth log2 (reference idf crate
        # calculate_idf, idf/src/lib.rs: ilogb of the frequency ratio).
        # frexp is exact where log2().floor() can be off by one near
        # powers of two (the crate makes the same point).
        v = 1.0 + (N + 1) / np.maximum(dfs, 1.0)
        _m, e = np.frexp(v)
        return (e - 1).astype(np.float64)

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
            f = self.schema.field(node.field)
            shapes = seg.geometries.get(f.attribute)
            if shapes:
                q = wkt.parse(node.wkt)
                pred = wkt.PREDICATES[node.predicate]
                # geographic (SPHERICAL) is the reference default
                # (spec.c:1261-1265); FLAT is opt-in cartesian
                sph = (f.geometry.system != "FLAT"
                       if f.geometry is not None else True)
                for i, s in enumerate(shapes):
                    if s is not None and pred(s, q, spherical=sph):
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

# serving observability: how many batched queries rode which executor
# family (VERDICT round-2: record the kernel hit rate so BENCH numbers
# can't silently fall back to the scan path).  Reset by callers.
QUERY_PATH_STATS: dict[str, int] = {"kernel": 0, "phrase-kernel": 0,
                                    "scan": 0}


@dataclasses.dataclass
class SegmentResult:
    """Raw device outputs for one segment."""
    local_idx: np.ndarray      # int32[k]
    scores: np.ndarray         # float32[k] (or -inf for empty tail)
    count: int                 # total matching docs
    sortkeys: Optional[np.ndarray] = None
    knn_dists: Optional[np.ndarray] = None
    valid: Optional[np.ndarray] = None   # window mode: bool per window slot
    warnings: tuple = ()                 # bind-time notices


def execute(cq: CompiledQuery, seg: Segment, k: int,
            extra_mask: Optional[np.ndarray] = None,
            mode: str = "topk") -> SegmentResult:
    """Run a compiled query against one segment.

    mode "topk": top-k by score/sortkey (FT.SEARCH path).
    mode "window": candidate window (docs, valid, scores) — the
    aggregation source (all matching docs, no top-k truncation).
    """
    if _knn_host_col(cq, seg) is not None:
        if mode == "window":
            # aggregations route KNN sources through topk mode
            # (agg/pipeline.py) so this only guards exotic window
            # consumers (e.g. the HAMMING scorer path)
            raise WrongFieldType(
                "host-tier (storage='host') vector fields cannot feed "
                "window-mode execution; KNN over them yields top-k only")
        return _execute_host_knn(cq, seg, k, extra_mask)
    if seg.cold:
        return _execute_cold(cq, seg, k, extra_mask, mode)
    binding, P = cq.bind(seg)
    dyn = binding.dyn
    dyn.pop("_tagL", None)
    buckets = dyn.pop("_buckets")
    if extra_mask is not None:
        dyn["extra_mask"] = extra_mask
    k_pad = int(min(next_pow2(max(k, 1)), seg.n_pad))
    seg_sig = (f"n={seg.n_pad}|stride={seg.text.pos_stride}"
               f"|extra={extra_mask is not None}|mode={mode}"
               f"|ivf={_knn_ivf_sig(cq, seg)}"
               f"|tc={_tag_codes_ords(cq, seg)}"
               f"|d={seg.n_deleted > 0}|t={seg.has_ttl}"
               f"|u={seg.uniform_docscore}"
               f"|ft={seg.text_fexp is not None}:"
               f"{sorted(seg.field_fexp)}")
    sig = (cq.signature(seg_sig, buckets, P, k_pad)
           + _dyn_fingerprint(dyn))
    entry = _COMPILE_CACHE.get(sig)
    seg_args = _segment_args(cq, seg)
    if entry is None:
        raw = _build_fn(cq, seg, buckets, P, k_pad,
                        has_extra="extra_mask" in dyn, mode=mode,
                        jit=False)
        entry = _PackedExecutor(raw, dyn, seg_args)
        entry.sig = sig
        _COMPILE_CACHE[sig] = entry
    out = entry(seg_args, dyn)
    if mode == "window":
        return SegmentResult(
            local_idx=out["docs"],     # window doc ids
            scores=out["score"],
            count=int(out["count"]),
            valid=out["valid"],
            knn_dists=out.get("knn"),
            warnings=binding.warnings,
        )
    return SegmentResult(
        local_idx=out["idx"],
        scores=out["scores"],
        count=int(out["count"]),
        sortkeys=out.get("sortkeys"),
        knn_dists=out.get("knn"),
        warnings=binding.warnings,
    )


def _cold_slab_args(cq: CompiledQuery, seg: Segment, dyn: dict,
                    buckets: dict):
    """Assemble per-query window slabs from a COLD segment's host CSR
    arrays and rewrite the dyn starts to slab offsets.

    Cold segments (Schema.storage="host") keep postings/positions/tag
    CSR in host RAM — beyond-HBM text capacity, the disk-tier analog
    (reference src/search_disk_api.h).  A query's windows are contiguous
    CSR runs, so paging is plain numpy slices: the slab upload is
    bounded by the query's own window buckets, not the corpus.  The
    compiled program is IDENTICAL to the hot path (same _build_fn) —
    only the posting arrays it slices are the little slabs.

    Returns (seg_args, dyn, slab_sig)."""
    text = seg.text
    hd = np.asarray(text.doc_ids)
    hf = np.asarray(text.freqs)
    hm = np.asarray(text.field_masks)
    hdl = np.asarray(text.doclens)
    pk = np.asarray(text.poskeys)
    po = text.pos_offsets_np                    # int64 host mirror
    n_slots = len(cq.term_strings)
    tstarts = np.asarray(dyn["tstarts"]).copy()
    tlens = np.asarray(dyn["tlens"])

    # per-slot posting-window width + position-window width
    slotW = np.zeros(n_slots, np.int64)
    posW = np.zeros(n_slots, np.int64)
    for leaf, idx in cq.leaves():
        if isinstance(leaf, LTerms):
            _nu, W = buckets[idx]
            slotW[leaf.lo:leaf.hi] = np.maximum(slotW[leaf.lo:leaf.hi], W)
        elif isinstance(leaf, LPhrase):
            Wn, Pc, Pm, pivot_j, _bigs, _br, _nch = buckets[idx]
            for i, s in enumerate(leaf.slots):
                slotW[s] = max(slotW[s], Wn)
                posW[s] = max(posW[s], Pc if i == pivot_j else
                              max(Pc, Pm))
    sb = buckets.get(-1)
    if sb is not None:                           # slop-divisor scorers
        slop_info = _slop_root_children(cq.tree)
        if slop_info is not None:
            for ch, per in zip(slop_info[1], sb):
                if ch[0] == "slots":
                    for s_, Pj in zip(ch[1], per):
                        posW[s_] = max(posW[s_], Pj)

    live = [s for s in range(n_slots) if slotW[s] > 0]
    total = int(sum(int(slotW[s]) for s in live))
    total_pad = int(next_pow2(max(total, 1024)))
    sd = np.zeros(total_pad, hd.dtype)
    sf = np.zeros(total_pad, hf.dtype)
    sm_ = np.zeros(total_pad, hm.dtype)
    sdl = np.zeros(total_pad, hdl.dtype)
    spo = np.zeros(total_pad + 1, np.int64)

    # position slab: full runs (chunked/overflow paths scan them) + a
    # tail pad covering the widest position window slice
    pos_slots = [s for s in live if posW[s] > 0 and tlens[s] > 0]
    run_lens = {s: int(po[tstarts[s] + tlens[s]] - po[tstarts[s]])
                for s in pos_slots}
    pk_tail = int(max([int(posW[s]) for s in pos_slots], default=1))
    pk_total = sum(run_lens.values()) + pk_tail
    pk_pad = int(next_pow2(max(pk_total, 1024)))
    spk = np.full(pk_pad, 2**31 - 1, np.int32)

    cur = 0
    pk_cur = 0
    for s in live:
        W = int(slotW[s])
        st = int(tstarts[s])
        o = cur
        cur += W
        end = min(st + W, len(hd))
        sd[o:o + end - st] = hd[st:end]
        sf[o:o + end - st] = hf[st:end]
        sm_[o:o + end - st] = hm[st:end]
        sdl[o:o + end - st] = hdl[st:end]
        if s in run_lens:
            kb = int(po[st])
            rl = run_lens[s]
            spk[pk_cur:pk_cur + rl] = pk[kb:kb + rl]
            # pos_offsets rows for the whole window (slop reads them at
            # arbitrary posting positions); rebased into the pk slab
            ke = min(st + W + 1, len(po) - 1)
            spo[o:o + ke - st] = po[st:ke] - kb + pk_cur
            pk_cur += rl
        tstarts[s] = o

    dyn = dict(dyn)
    dyn["tstarts"] = tstarts.astype(tlens.dtype)

    args = _segment_args(cq, seg)
    import jax.numpy as jnp
    args["doc_ids"] = jnp.asarray(sd)
    args["freqs"] = jnp.asarray(sf)
    args["field_masks"] = jnp.asarray(sm_)
    args["posting_dl"] = jnp.asarray(sdl)
    args["pos_offsets"] = jnp.asarray(spo.astype(np.int32))
    args["poskeys"] = jnp.asarray(spk)

    # tag window slabs
    for j, node in enumerate(cq.tag_nodes):
        tp = seg.tags.get(cq.schema.field(node.field).attribute)
        if tp is None or not isinstance(tp.doc_ids, np.ndarray):
            continue
        e = None
        for lf, idx in cq.leaves():
            if isinstance(lf, LTag) and lf.ord == j:
                e = buckets.get(idx)
        if not e:
            continue
        nu, Wt = e
        ts = np.asarray(dyn[f"tag{j}_starts"]).copy()
        tl = np.asarray(dyn[f"tag{j}_lens"])
        td = np.asarray(tp.doc_ids)
        slab = np.zeros(int(next_pow2(max(nu * Wt, 256))), td.dtype)
        c2 = 0
        for v in range(min(nu, len(ts))):
            st = int(ts[v])
            end = min(st + Wt, len(td))
            slab[c2:c2 + end - st] = td[st:end]
            ts[v] = c2
            c2 += Wt
        dyn[f"tag{j}_starts"] = ts
        args[f"tag{j}_docs"] = jnp.asarray(slab)

    # safety net: any CSR array still numpy (odd leaf shapes) uploads
    # wholesale — correct, just not paged
    for kk in list(args):
        if isinstance(args[kk], np.ndarray):
            args[kk] = jnp.asarray(args[kk])

    slab_sig = (f"T={total_pad}|PK={pk_pad}|"
                + ",".join(f"{s}:{int(slotW[s])}:{int(posW[s])}"
                           for s in live))
    return args, dyn, slab_sig


def _execute_cold(cq: CompiledQuery, seg: Segment, k: int,
                  extra_mask: Optional[np.ndarray] = None,
                  mode: str = "topk") -> SegmentResult:
    """Execute against a cold (beyond-HBM) segment: page this query's
    windows to the device as slabs, then run the normal compiled
    program over them."""
    binding, P = cq.bind(seg)
    dyn = dict(binding.dyn)
    dyn.pop("_tagL", None)
    buckets = dyn.pop("_buckets")
    if extra_mask is not None:
        dyn["extra_mask"] = extra_mask
    seg_args, dyn, slab_sig = _cold_slab_args(cq, seg, dyn, buckets)
    k_pad = int(min(next_pow2(max(k, 1)), seg.n_pad))
    seg_sig = (f"cold[{slab_sig}]|n={seg.n_pad}"
               f"|stride={seg.text.pos_stride}"
               f"|extra={extra_mask is not None}|mode={mode}"
               f"|ivf={_knn_ivf_sig(cq, seg)}"
               f"|tc={_tag_codes_ords(cq, seg)}"
               f"|d={seg.n_deleted > 0}|t={seg.has_ttl}"
               f"|u={seg.uniform_docscore}"
               f"|ft={seg.text_fexp is not None}:"
               f"{sorted(seg.field_fexp)}")
    sig = (cq.signature(seg_sig, buckets, P, k_pad)
           + _dyn_fingerprint(dyn))
    entry = _COMPILE_CACHE.get(sig)
    if entry is None:
        raw = _build_fn(cq, seg, buckets, P, k_pad,
                        has_extra="extra_mask" in dyn, mode=mode,
                        jit=False)
        entry = _PackedExecutor(raw, dyn, seg_args)
        entry.sig = sig
        _COMPILE_CACHE[sig] = entry
    out = entry(seg_args, dyn)
    if mode == "window":
        return SegmentResult(
            local_idx=out["docs"], scores=out["score"],
            count=int(out["count"]), valid=out["valid"],
            knn_dists=out.get("knn"), warnings=binding.warnings)
    return SegmentResult(
        local_idx=out["idx"], scores=out["scores"],
        count=int(out["count"]), sortkeys=out.get("sortkeys"),
        knn_dists=out.get("knn"), warnings=binding.warnings)


class _BatchHandle:
    """In-flight batch: the device dispatch is async; result() performs
    the (single) d2h transfer and materializes per-query results.  Lets a
    serving loop overlap the next batch\'s host work (parse/bind/pack)
    with the device executing this one (the reference overlaps via worker
    threads; here the device pipeline is the second lane)."""

    def __init__(self, parts, n: int, cqs=None, seg=None, k: int = 10):
        self._parts = parts      # list of (idxs|None, entry|handle, flat)
        self._n = n
        self._cqs = cqs          # for host-side exact refires
        self._seg = seg
        self._k = k
        # Kick off the d2h transfer NOW (it queues behind the async
        # compute): by result() time the host copy is done or in
        # flight, so a pipelined serving loop overlaps the transfer of
        # batch i with the host prepare of batch i+1 AND the device
        # compute of batch i+1 — on a ~30 ms-RTT attach this is the
        # difference between transfer-bound and compute-bound serving.
        for _, entry, flat in parts:
            if entry is not None and hasattr(flat, "copy_to_host_async"):
                flat.copy_to_host_async()

    def _flat_parts(self):
        """Flatten nested sub-batch handles into (idxs, entry, flat).
        Positions beyond the outer group (pow2 padding rows) map to -1
        and are dropped at result time."""
        for idxs, entry, flat in self._parts:
            if entry is None and isinstance(flat, _BatchHandle):
                for sub_idxs, sub_entry, sub_flat in flat._flat_parts():
                    yield ([idxs[i] if i < len(idxs) else -1
                            for i in sub_idxs], sub_entry, sub_flat)
            else:
                yield (idxs, entry, flat)

    def result(self) -> list:
        out_all: list = [None] * self._n
        parts = []
        for idxs, entry, flat in self._flat_parts():
            if entry is None:   # foreign handle (e.g. pure-KNN sub-batch)
                sub = flat.result()
                for j, slot in enumerate(idxs):
                    if slot >= 0 and j < len(sub):
                        out_all[slot] = sub[j]
                continue
            parts.append((idxs, entry, flat))
        # one device_get for every group's output buffer: per-group
        # blocking collects would serialize link round-trips
        flats = jax.device_get([flat for _, _, flat in parts])
        refire = []
        for (idxs, entry, _), flat_np in zip(parts, flats):
            out = entry._unpack_out(np.asarray(flat_np))
            under = out.get("underfill")
            for j in range(len(idxs)):
                if idxs[j] < 0:          # pow2 padding row
                    continue
                if under is not None and int(under[j]):
                    refire.append(idxs[j])
                    continue
                if "scores" in out:
                    sc = out["scores"][j]
                else:
                    # "score1" compact form (query-constant scores —
                    # see _make_dense_knn): expand against live lanes
                    kd = out["knn"][j]
                    sc = np.where(kd < 3.3e38, out["score1"][j],
                                  0.0).astype(np.float32)
                out_all[idxs[j]] = SegmentResult(
                    local_idx=out["idx"][j],
                    scores=sc,
                    count=int(out["count"][j]),
                    sortkeys=(out["sortkeys"][j]
                              if "sortkeys" in out else None),
                    knn_dists=(out["knn"][j] if "knn" in out else None))
        # batched filtered-KNN skips the in-graph exact fallback;
        # underfilled queries (selective filter beat the dense top-M)
        # re-run exactly, one by one — rare by construction
        if refire and self._cqs is not None:
            for slot in refire:
                out_all[slot] = execute(self._cqs[slot], self._seg,
                                        self._k)
        return out_all


def _pure_knn_eligible(cqs: list, seg: Segment) -> bool:
    """A batch of unfiltered KNN queries over the same field can run as
    ONE [B, dim] x [N, dim]T MXU matmul instead of a per-query scan —
    the per-query scan re-reads the whole vector matrix from HBM B times.
    (This is the reference's `*=>[KNN ...]` memtier shape.)"""
    cq0 = cqs[0]
    if cq0.knn is None or cq0.opts.sort_field:
        return False
    field = cq0.schema.field(cq0.knn.field)
    col = seg.vectors.get(field.attribute)
    if col is None or col.multi:
        return False
    for cq in cqs:
        if (cq.knn is None or cq.host_nodes
                or cq.knn.field != cq0.knn.field
                or cq.knn.k != cq0.knn.k
                or cq.opts.sort_field):
            return False
        leaves = cq.leaves()
        if len(leaves) != 1 or not isinstance(leaves[0][0], LAll):
            return False
    return True


class _PureKnnHandle:
    def __init__(self, entry, flat, gidx, B):
        self._entry = entry
        self._flat = flat
        if hasattr(flat, "copy_to_host_async"):
            flat.copy_to_host_async()   # overlap d2h with next batch
        self._gidx = gidx
        self._B = B

    def result(self) -> list:
        out = self._entry._unpack_out(
            np.asarray(jax.device_get(self._flat)))
        res = []
        for i in range(self._B):
            res.append(SegmentResult(
                local_idx=out["idx"][i], scores=out["scores"][i],
                count=int(out["count"]), knn_dists=out["knn"][i]))
        return res


def _execute_batch_pure_knn(cqs: list, seg: Segment, k: int,
                            async_: bool = False):
    cq0 = cqs[0]
    field = cq0.schema.field(cq0.knn.field)
    col = seg.vectors[field.attribute]
    metric = field.vector.metric.value
    blobs = np.stack([decode_blob(cq.knn.blob, field) for cq in cqs])
    B_real = len(cqs)
    B = int(next_pow2(B_real))     # pow2 batch -> bounded executable set
    if B != B_real:
        blobs = np.concatenate(
            [blobs, np.repeat(blobs[-1:], B - B_real, axis=0)])
    k_eff = min(max(k, 1), seg.n_pad)
    now = int(cq0.opts.now)
    fexp = seg.field_fexp.get(field.attribute)
    sig = (f"pureknn|{seg.n_pad}|{col.vecs.dtype}|{metric}|B={B}"
           f"|k={k_eff}|t={seg.has_ttl}|d={seg.n_deleted > 0}"
           f"|fx={fexp is not None}|sc={col.scan_vecs is not None}")
    seg_args = {"vecs": col.vecs, "sq": col.sq_norms,
                "present": col.present, "alive": seg.alive,
                "expire_at": seg.expire_at}
    if col.scan_vecs is not None:
        seg_args["scan"] = col.scan_vecs
    if fexp is not None:
        seg_args["fexp"] = fexp
    dyn = {"blobs": blobs, "now": np.int32(now)}
    entry = _COMPILE_CACHE.get(sig)
    if entry is None:
        has_ttl = seg.has_ttl

        has_fexp = fexp is not None

        def run(sa, dy):
            valid = sa["present"] & sa["alive"]
            if has_ttl:
                exp = sa["expire_at"]
                valid = valid & ((exp == 0) | (exp > dy["now"]))
            if has_fexp:
                fe = sa["fexp"]
                valid = valid & ~((fe > 0) & (fe <= dy["now"]))
            # knn_batch = bf16 candidate scan + narrow f32 rescore for
            # f32 storage (exact distances at ~1/4 the HIGHEST-scan
            # cost) and approx_max_k top-k (recall 0.99) — exact
            # lax.top_k on a [B, n_pad] row lowers to per-row sorts
            # (~0.4 ms/query at 524k docs — the batch bottleneck).
            dists, idx = V.knn_batch(sa["vecs"], sa["sq"], valid,
                                     dy["blobs"], k_eff, metric,
                                     scan_vecs=sa.get("scan"))
            return {"idx": idx, "knn": dists,
                    "scores": jnp.zeros((B, k_eff), jnp.float32),
                    "count": jnp.sum(valid.astype(jnp.int32))}

        entry = _PackedExecutor(run, dyn, seg_args)
        entry.sig = sig
        _COMPILE_CACHE[sig] = entry
    flat = entry.submit(seg_args, dyn)
    handle = _PureKnnHandle(entry, flat, None, B_real)
    return handle if async_ else handle.result()


# ---------------------------------------------------------------------------
# Host-tier (beyond-HBM) KNN execution — ops/ivf.py HostIVF
# ---------------------------------------------------------------------------

def _knn_host_col(cq: CompiledQuery, seg: Segment):
    """The KNN field's VectorColumn when it lives on the host tier."""
    if cq.knn is None:
        return None
    col = seg.vectors.get(cq.schema.field(cq.knn.field).attribute)
    return col if col is not None and col.host else None


def _host_doc_ok(cq: CompiledQuery, seg: Segment, attr: str):
    """Device liveness mask for host-tier probes: deletes + doc TTL +
    field TTL on the KNN field (the in-graph paths check the same three;
    see knn_ok in _build_fn)."""
    now = jnp.int32(int(cq.opts.now))
    ok = None
    if seg.n_deleted > 0:
        ok = seg.alive
    if seg.has_ttl:
        e = seg.expire_at
        m = (e == 0) | (e > now)
        ok = m if ok is None else ok & m
    fe = seg.field_fexp.get(attr)
    if fe is not None:
        m = ~((fe > 0) & (fe <= now))
        ok = m if ok is None else ok & m
    return ok


def _host_knn_nprobe(cq: CompiledQuery) -> int:
    field = cq.schema.field(cq.knn.field)
    return int(cq.knn.ef_runtime or field.vector.nprobe)


def _filter_only(cq: CompiledQuery) -> CompiledQuery:
    """Shallow copy evaluating just the filter child of a KNN query
    (fresh bind caches; the lowered tree and slot tables are shared,
    read-only)."""
    import copy
    fcq = copy.copy(cq)
    fcq.knn = None
    fcq._bind_cache = {}
    fcq._row_cache = {}
    return fcq


def _execute_host_knn(cq: CompiledQuery, seg: Segment, k: int,
                      extra_mask: Optional[np.ndarray] = None
                      ) -> SegmentResult:
    """KNN over a host-tier vector field: probe centroids on device,
    page the probed lists' slabs up, scan exactly (ops/ivf.py
    host_ivf_knn).  Filtered KNN evaluates the filter child as a window
    (the BATCHES candidate set) and masks probed ids against it —
    the hybrid-iterator analog (src/iterators/hybrid_reader.c)."""
    from ..ops.ivf import host_ivf_knn

    field = cq.schema.field(cq.knn.field)
    col = seg.vectors[field.attribute]
    hivf = col.host_ivf
    if hivf is None:
        raise WrongFieldType(
            f"host-tier vector field @{field.attribute} has no IVF "
            "structure (segment not sealed through commit()?)")
    q = decode_blob(cq.knn.blob, field).astype(np.float32)[None, :]
    k_eff = min(max(k, 1), seg.n_pad)
    doc_ok = _host_doc_ok(cq, seg, field.attribute)

    leaves = cq.leaves()
    pure = (len(leaves) == 1 and isinstance(leaves[0][0], LAll)
            and not cq.host_nodes and extra_mask is None)
    warnings: tuple = ()
    if pure:
        dists, ids = host_ivf_knn(hivf, q, k_eff,
                                  _host_knn_nprobe(cq), doc_ok=doc_ok)
        dists, ids = dists[0], ids[0]
        scores = np.zeros(k_eff, np.float32)
    else:
        wres = execute(_filter_only(cq), seg, k_eff,
                       extra_mask=extra_mask, mode="window")
        warnings = wres.warnings
        raw = np.asarray(wres.local_idx)
        val = (np.asarray(wres.valid) if wres.valid is not None
               else np.ones(raw.shape, bool))
        raw_sc = np.asarray(wres.scores)
        # compact the window host-side: union windows carry duplicate doc
        # entries with only one valid owner (shift-folded dedup), and the
        # scan's searchsorted membership needs sorted UNIQUE candidates
        keep = val & (raw != np.int32(2**31 - 1))
        docs = raw[keep]
        sc = raw_sc[keep]
        order = np.argsort(docs, kind="stable")
        docs, sc = docs[order], sc[order]
        if len(docs):
            first = np.ones(len(docs), bool)
            first[1:] = docs[1:] != docs[:-1]
            docs, sc = docs[first], sc[first]
        Wc = int(next_pow2(max(len(docs), 1)))
        cand = np.full(Wc, 2**31 - 1, np.int32)
        cand[:len(docs)] = docs
        cval = np.zeros(Wc, bool)
        cval[:len(docs)] = True
        dists, ids = host_ivf_knn(hivf, q, k_eff, _host_knn_nprobe(cq),
                                  doc_ok=doc_ok,
                                  cand_docs=cand[None, :],
                                  cand_valid=cval[None, :])
        dists, ids = dists[0], ids[0]
        # text scores ride the window rows (same as the in-graph
        # filtered-KNN branches: out["scores"] = score[sel])
        pos = np.clip(np.searchsorted(cand, ids), 0, Wc - 1)
        hit = cand[pos] == ids
        sc_pad = np.concatenate([sc, np.zeros(Wc - len(docs), np.float32)])
        scores = np.where(hit, sc_pad[pos], 0.0).astype(np.float32)
    count = int((dists < 3.3e38).sum())
    return SegmentResult(local_idx=ids.astype(np.int32), scores=scores,
                         count=count, knn_dists=dists, warnings=warnings)


class _HostKnnBatchHandle:
    """execute_batch-compatible handle for host-tier KNN batches.  The
    paging driver is synchronous (its host gather is the pipeline), so
    results are computed up front and result() just returns them."""

    def __init__(self, results: list):
        self._results = results

    def result(self) -> list:
        return self._results


def _execute_batch_host_knn(cqs: list, seg: Segment, k: int,
                            async_: bool = False):
    """Batch driver: pure same-field KNN queries share one probe + one
    slab gather + one scan (paged lists amortize across the batch);
    anything else (filters, mixed fields) runs per query."""
    from ..ops.ivf import host_ivf_knn

    cq0 = cqs[0]
    field = cq0.schema.field(cq0.knn.field)
    col = seg.vectors[field.attribute]

    def batchable(cq):
        if (cq.knn is None or cq.host_nodes
                or cq.knn.field != cq0.knn.field
                or cq.opts.sort_field
                or _host_knn_nprobe(cq) != _host_knn_nprobe(cq0)):
            return False
        lv = cq.leaves()
        return len(lv) == 1 and isinstance(lv[0][0], LAll)

    if all(batchable(cq) for cq in cqs):
        hivf = col.host_ivf
        Q = np.stack([decode_blob(cq.knn.blob, field)
                      for cq in cqs]).astype(np.float32)
        k_eff = min(max(k, 1), seg.n_pad)
        doc_ok = _host_doc_ok(cq0, seg, field.attribute)
        dists, ids = host_ivf_knn(hivf, Q, k_eff, _host_knn_nprobe(cq0),
                                  doc_ok=doc_ok)
        results = [SegmentResult(
            local_idx=ids[i].astype(np.int32),
            scores=np.zeros(k_eff, np.float32),
            count=int((dists[i] < 3.3e38).sum()),
            knn_dists=dists[i]) for i in range(len(cqs))]
    else:
        results = [_execute_host_knn(cq, seg, k) for cq in cqs]
    handle = _HostKnnBatchHandle(results)
    return handle if async_ else handle.result()


def execute_batch(cqs: list[CompiledQuery], seg: Segment, k: int,
                  async_: bool = False):
    """Run a batch of same-structure queries in one device dispatch.

    The throughput path (serving + benchmarks): each group of queries
    sharing a (tree structure, window buckets) signature becomes one XLA
    program scanning stacked transport rows — amortizing postings reads
    and dispatch overhead the way the reference amortizes per-query cost
    across worker threads (src/util/workers.c), but on one device.
    Mixed batches are grouped automatically.  With async_=True returns a
    _BatchHandle immediately (device still working); .result() collects.
    """
    if _knn_host_col(cqs[0], seg) is not None:
        return _execute_batch_host_knn(cqs, seg, k, async_)
    if seg.cold:
        # cold segments page windows per query; slab assembly is the
        # host-side pipeline (one h2d per query, device work overlaps)
        handle = _HostKnnBatchHandle(
            [_execute_cold(cq, seg, k) for cq in cqs])
        return handle if async_ else handle.result()
    if _pure_knn_eligible(cqs, seg):
        return _execute_batch_pure_knn(cqs, seg, k, async_)
    subs = _prep_subs(cqs, seg, k)
    if len(subs) > 1 and all(e._warm for _, e, _, _ in subs):
        # fuse every group into ONE XLA program: a mixed-bucket batch
        # otherwise pays one dispatch+collect link round trip PER GROUP
        # (measured ~20 ms each on the tunneled attach — it dominated
        # the serving profile at B=4096 with ~5 bucket groups)
        flats = _combined_submit(tuple(e for _, e, _, _ in subs),
                                 tuple(sa for _, _, sa, _ in subs),
                                 tuple(b for _, _, _, b in subs))
        parts = [(g, e, fl)
                 for (g, e, _, _), fl in zip(subs, flats)]
    else:
        parts = [(g, e, e.submit_buf(sa, buf))
                 for g, e, sa, buf in subs]
    handle = _BatchHandle(parts, len(cqs), cqs=cqs, seg=seg, k=k)
    return handle if async_ else handle.result()


def _prep_subs(cqs: list, seg: Segment, k: int) -> list:
    """Bind + group + pack a batch: returns [(g, entry, seg_args,
    buf_np)] — everything execute_batch does before device submission.

    Binds every query as a packed transport row (memoized per segment:
    one template memcpy + clock/vector patches per query), then groups
    by group_sig — tree structure + window buckets.  Structurally
    different queries cannot share an executable; mixed *bucket*
    shapes are kept apart so one huge query never inflates everyone's
    windows."""
    groups: dict[tuple, list[int]] = {}
    ents = []
    for i, cq in enumerate(cqs):
        ent = cq._row_cache.get(seg.uid)
        if ent is None:
            _, ent = cq.bind_row(seg)
        ents.append(ent)
        # group key includes the layout fingerprint (ent[7]): the
        # group-wide template stacking below patches FIXED offsets from
        # the first query's layout, which is only safe when every row in
        # the group shares that packed layout
        groups.setdefault((ent[6], ent[7]), []).append(i)
    subs = []
    for idxs in groups.values():
        # pad each group to a power of two (replaying the last row) so
        # arbitrary group sizes reuse a handful of executables
        g = idxs + [idxs[-1]] * (int(next_pow2(len(idxs))) - len(idxs))
        patches = ents[idxs[0]][1]
        if all(p[0] == "now" for p in patches):
            # text serving: the only per-call field is the clock —
            # stack the cached templates and patch the column in one
            # vector op instead of per-query bind_row calls
            gr = np.stack([ents[i][0] for i in g])
            for _key, o, _n, _shape, _dt in patches:
                gr[:, o] = np.fromiter(
                    (cqs[i].opts.now for i in g), np.int32, len(g))
        else:
            # per-call vector payloads: stack the cached static
            # templates once and write each payload as ONE vectorized
            # column assignment — B bind_row calls would re-copy the
            # static row and re-patch per query in Python
            gr = np.stack([ents[i][0] for i in g])
            for key, o, n, _shape, dt in patches:
                if key == "now":
                    gr[:, o] = np.fromiter(
                        (cqs[i].opts.now for i in g), np.int32, len(g))
                    continue
                if key == "knn_blob":
                    cq0g = cqs[g[0]]
                    fld = cq0g.schema.field(cq0g.knn.field)
                    vals = [decode_blob(cqs[i].knn.blob, fld)
                            for i in g]
                elif key.startswith("vblob"):
                    j = int(key[5:])
                    vals = [cqs[i].vec_blobs[j] for i in g]
                else:                                   # vrad{j}
                    j = int(key[4:])
                    vals = [np.float32(cqs[i].vec_radii[j]) for i in g]
                M = np.stack([np.asarray(v).reshape(-1) for v in vals])
                if dt.startswith("float") or dt == "bfloat16":
                    M = M.astype(np.float32, copy=False).view(np.int32)
                elif dt != "int32":
                    M = M.astype(np.int32)
                gr[:, o:o + n] = M
        entry = _rows_executor(cqs[idxs[0]], ents[idxs[0]], seg, len(g), k)
        QUERY_PATH_STATS[entry.path] = (
            QUERY_PATH_STATS.get(entry.path, 0) + len(idxs))
        subs.append((g, entry, _segment_args(cqs[idxs[0]], seg),
                     entry._pack({"rows": gr})))
    return subs


#: combined-dispatch executables keyed by the fused entries' stable
#: compile signatures, order-normalized (the groups are sorted by sig
#: before fusing, so every ordering of the same group set shares ONE
#: executable).  LRU: hits re-insert; overflow evicts the oldest entry
#: instead of clearing the whole cache.
_COMBINED_CACHE: dict[tuple, list] = {}
_COMBINED_CACHE_MAX = 256


def _combined_submit(entries, seg_args_list, bufs):
    """One jitted program running every group's packed executor —
    collapses N dispatch+collect round trips into one.  Inputs may
    arrive in any group order; they are sorted by compile signature so
    permutations of the same group set reuse one executable, and the
    outputs are returned in the CALLER's order."""
    order = sorted(range(len(entries)), key=lambda i: entries[i].sig)
    entries_s = tuple(entries[i] for i in order)
    sas_s = tuple(seg_args_list[i] for i in order)
    bufs_s = tuple(jax.device_put(b) if isinstance(b, np.ndarray) else b
                   for b in (bufs[i] for i in order))
    key = tuple(e.sig for e in entries_s)
    rec = _COMBINED_CACHE.pop(key, None)
    if rec is not None and any(r is not e
                               for r, e in zip(rec[2], entries_s)):
        # a _COMPILE_CACHE clear rebuilt some entry under the same sig:
        # the cached multi-program closes over stale fns — rebuild
        rec = None
    if rec is None:
        fns = tuple(e.fn for e in entries_s)

        def multi(sas, bs):
            return tuple(f(sa, b) for f, sa, b in zip(fns, sas, bs))

        while len(_COMBINED_CACHE) >= _COMBINED_CACHE_MAX:
            _COMBINED_CACHE.pop(next(iter(_COMBINED_CACHE)))
        rec = [jax.jit(multi), False, entries_s]
    _COMBINED_CACHE[key] = rec       # (re-)insert = LRU move-to-end
    if not rec[1]:
        t0 = _time.perf_counter()
        out_s = rec[0](sas_s, bufs_s)
        global _COMPILE_SECONDS
        _COMPILE_SECONDS += _time.perf_counter() - t0
        rec[1] = True
    else:
        out_s = rec[0](sas_s, bufs_s)
    inv = [0] * len(order)
    for pos, i in enumerate(order):
        inv[i] = pos
    return [out_s[inv[i]] for i in range(len(entries))]


#: rounds-scan executables keyed by (per-group sigs, R): ONE dispatch
#: runs R same-shaped batches via lax.scan per group — on a tunneled
#: attach a standalone dispatch costs ~100 ms of link overhead
#: regardless of size, so amortizing it R-fold is the serving lever.
_ROUNDS_CACHE: dict[tuple, list] = {}
_ROUNDS_CACHE_MAX = 64


class _RoundsHandle:
    """In-flight execute_batch_rounds dispatch: result() collects the
    stacked output buffers once and finishes each round through the
    ordinary _BatchHandle logic (padding rows, underfill refires)."""

    def __init__(self, stacked, groups_rounds, rounds, seg, k):
        self._stacked = stacked          # list per group: dev [R, L]
        # per-ROUND group index lists (the same sig-aligned group can sit
        # at different batch positions in different rounds)
        self._groups_rounds = groups_rounds
        self._rounds = rounds
        self._seg = seg
        self._k = k
        for s in stacked:
            if hasattr(s, "copy_to_host_async"):
                s.copy_to_host_async()

    def result(self) -> list:
        flats = jax.device_get(self._stacked)    # list of [R, L] np
        out = []
        for r, cqs_r in enumerate(self._rounds):
            parts = [(g, e, np.asarray(fl[r]))
                     for (g, e), fl in zip(self._groups_rounds[r],
                                           flats)]
            out.append(_BatchHandle(parts, len(cqs_r), cqs=cqs_r,
                                    seg=self._seg, k=self._k).result())
        return out


class _RoundsFallbackHandle:
    def __init__(self, handles):
        self._hs = handles

    def result(self) -> list:
        return [h.result() for h in self._hs]


def execute_batch_rounds(rounds: list, seg: Segment, k: int,
                         async_: bool = False):
    """Run R same-shaped batches of queries in ONE device dispatch.

    Each round is a list of CompiledQuery, executed exactly like
    execute_batch; all rounds' packed transport buffers stack to
    [R, buf] per executable group and a lax.scan runs them inside one
    XLA program — amortizing the per-dispatch link overhead (~100 ms
    measured on the tunneled attach, vs ~26 ms of actual device compute
    for a 2048-query filtered-KNN batch) across R * B queries.  This is
    the deep-queue serving shape (the analog of the FLAT-KNN bench's
    chunks-inside-one-dispatch trick, generalized to any query family).

    Rounds must produce the same executable set (same group signatures
    and padded sizes — true for homogeneous serving streams); otherwise
    falls back to pipelined per-round execute_batch.  Returns a list of
    per-round result lists (async_: a handle whose .result() does)."""
    if (not rounds or _knn_host_col(rounds[0][0], seg) is not None
            or seg.cold or _pure_knn_eligible(rounds[0], seg)):
        return _rounds_fallback(rounds, seg, k, async_)
    subs_list = [_prep_subs(cqs, seg, k) for cqs in rounds]
    subs_list = [sorted(s, key=lambda t: t[1].sig) for s in subs_list]
    shape0 = [(e.sig, len(g)) for g, e, _, _ in subs_list[0]]
    if any([(e.sig, len(g)) for g, e, _, _ in s] != shape0
           for s in subs_list[1:]) or not all(
               e._warm for _, e, _, _ in subs_list[0]):
        return _rounds_fallback(rounds, seg, k, async_)
    R = len(rounds)
    entries = tuple(e for _, e, _, _ in subs_list[0])
    sas = tuple(sa for _, _, sa, _ in subs_list[0])
    blists = tuple(
        # explicit device_put: numpy jit args ride the slow inline
        # RPC transfer (~34 MB/s vs 1 GB/s bulk h2d) — see submit_buf
        jax.device_put(np.stack([s[j][3] for s in subs_list]))
        for j in range(len(entries)))
    key = (tuple(e.sig for e in entries), R)
    rec = _ROUNDS_CACHE.pop(key, None)
    if rec is not None and any(r is not e
                               for r, e in zip(rec[2], entries)):
        rec = None          # compile-cache rebuild under the same sig
    if rec is None:
        fns = tuple(e.fn for e in entries)

        def multi(sas_, bufs_):
            outs = []
            for f, sa, bs in zip(fns, sas_, bufs_):
                outs.append(jax.lax.scan(
                    lambda c, b, f=f, sa=sa: (c, f(sa, b)),
                    None, bs)[1])
            return tuple(outs)

        while len(_ROUNDS_CACHE) >= _ROUNDS_CACHE_MAX:
            _ROUNDS_CACHE.pop(next(iter(_ROUNDS_CACHE)))
        rec = [jax.jit(multi), False, entries]
    _ROUNDS_CACHE[key] = rec
    if not rec[1]:
        t0 = _time.perf_counter()
        stacked = rec[0](sas, blists)
        global _COMPILE_SECONDS
        _COMPILE_SECONDS += _time.perf_counter() - t0
        rec[1] = True
    else:
        stacked = rec[0](sas, blists)
    handle = _RoundsHandle(list(stacked),
                           [[(g, e) for g, e, _, _ in s]
                            for s in subs_list],
                           rounds, seg, k)
    return handle if async_ else handle.result()


def _rounds_fallback(rounds, seg, k, async_):
    handles = []
    for cqs in rounds:
        handles.append(execute_batch(cqs, seg, k, async_=True))
    h = _RoundsFallbackHandle(handles)
    return h if async_ else h.result()


def _kernel_plan(cq0: CompiledQuery, seg: Segment, bk: dict, k_pad: int):
    """Eligibility for the Pallas term-query mega-kernel
    (ops/intersect.py).  Returns (slot_descs, Ws, groups, pivot_g,
    aux_keys) or None.  Covered: BM25STD top-k over AND/OR/NOT/OPT of
    term groups with 1..4 live slots each (stem/synonym-expanded tokens
    included), plus TAG leaves inside intersections (sorted doc windows
    streamed from the tag postings array, hit-only members scoring the
    leaf constant once per doc), on a clean segment — the serving hot
    path.  slot_descs: ("t", term_slot) or ("g", tag_ord, value_j,
    leaf_idx); aux_keys name the segment-arg arrays the tag slots DMA
    from."""
    import os
    if os.environ.get("RS_TPU_NO_INTERSECT_KERNEL"):
        return None
    if not _kernel_seg_ok(cq0, seg, k_pad):
        return None
    from ..ops import intersect as IK

    def leaf_group(t, flag):
        if t[0] != "leaf" or not isinstance(t[1], LTerms):
            return None
        e = bk.get(t[2])
        if not e:
            return None
        nu, W = e
        if not 1 <= nu <= 4:
            return None
        return (flag, [("t", t[1].lo + j) for j in range(nu)],
                [W] * nu, -1)

    aux_ords: list[int] = []
    dense_descs: list = []          # (flag, ord, nv, leaf_idx)

    def tag_dense(t, flag):
        """Single-valued TAG leaf with a posting-aligned code column:
        becomes a dense in-kernel predicate (one window compare per
        pivot phase) instead of a member-window pass."""
        if t[0] != "leaf" or not isinstance(t[1], LTag):
            return None
        leaf, idx = t[1], t[2]
        e = bk.get(idx)
        if not e:
            return None
        nu, _W = e
        if not 1 <= nu <= 4 or len(dense_descs) >= 2:
            return None
        if seg.tag_pcodes(leaf.field) is None:
            return None
        dense_descs.append((flag, leaf.ord, nu, idx))
        return "dense"

    def tag_group(t, flag):
        if t[0] != "leaf" or not isinstance(t[1], LTag):
            return None
        leaf, idx = t[1], t[2]
        e = bk.get(idx)
        if not e:
            return None
        nu, W = e
        if not 1 <= nu <= 4:
            return None
        tp = seg.tags.get(leaf.field)   # LTag.field is the attribute
        if tp is None or tp.doc_ids.shape[0] % 128:
            return None
        if leaf.ord not in aux_ords:
            if len(aux_ords) >= 2:
                return None
            aux_ords.append(leaf.ord)
        src = aux_ords.index(leaf.ord)
        return (flag, [("g", leaf.ord, j, idx) for j in range(nu)],
                [W] * nu, src)

    tree = cq0.tree
    raw_groups = []
    if tree[0] == "leaf":
        g = leaf_group(tree, IK.REQ)
        if g is None:
            return None
        raw_groups.append(g)
    elif tree[0] == "or":
        # a union flattens to ONE group (sum-fold + first-owner dedup —
        # exactly union_windows semantics)
        if not 2 <= len(tree[1]) <= 4:
            return None
        slots_u: list = []
        ws_u: list[int] = []
        for kid in tree[1]:
            g = leaf_group(kid, IK.REQ)
            if g is None:
                return None
            slots_u += g[1]
            ws_u += g[2]
        raw_groups.append((IK.REQ, slots_u, ws_u, -1))
    elif tree[0] == "and":
        if not 2 <= len(tree[1]) <= 4:
            return None
        for kid in tree[1]:
            if kid[0] == "leaf":
                g = (leaf_group(kid, IK.REQ) or tag_dense(kid, IK.REQ)
                     or tag_group(kid, IK.REQ))
            elif kid[0] in ("not", "opt"):
                fl = IK.NOT if kid[0] == "not" else IK.OPT
                g = (leaf_group(kid[1], fl) or tag_dense(kid[1], fl)
                     or tag_group(kid[1], fl))
            else:
                g = None
            if g is None:
                return None
            if g != "dense":
                raw_groups.append(g)
        if not any(g[0] == IK.REQ and g[3] < 0 for g in raw_groups):
            return None   # the pivot must be a TEXT group
    else:
        return None

    total_slots = sum(len(g[1]) for g in raw_groups)
    if total_slots > 8:
        return None
    if sum(len(g[1]) for g in raw_groups if g[3] < 0) > 6:
        return None
    if any(w > IK.MAX_W_MEMBER or w % 1024
           for g in raw_groups for w in g[2]):
        return None
    slot_descs: list = []
    Ws: list[int] = []
    groups: list[tuple] = []
    for fl, sl, wl, src in raw_groups:
        idxs = tuple(range(len(slot_descs), len(slot_descs) + len(sl)))
        groups.append((fl, idxs, src))
        slot_descs += sl
        Ws += wl
    # the pivot group's windows bound the [B, W] output buffers; member
    # windows only occupy VMEM — a rare pivot can intersect against an
    # ultra-common member term without falling back
    req = [(i, sum(Ws[j] for j in g[1]))
           for i, g in enumerate(groups)
           if g[0] == IK.REQ and g[2] < 0
           and all(Ws[j] <= IK.MAX_W_PIVOT for j in g[1])]
    if not req:
        return None
    pivot_g = min(req, key=lambda e: e[1])[0]
    if len(groups[pivot_g][1]) > 4:
        return None
    # VMEM budget: 3 window arrays per text slot (+doclens per pivot
    # slot), 2 per tag slot, dense code windows per (pred, pivot slot),
    # plus 3 pivot-sized state buffers
    pivs = set(groups[pivot_g][1])
    srcs = IK._slot_srcs(len(slot_descs), groups)
    vmem = sum(((4 if j in pivs else 3) if srcs[j] < 0 else 2)
               * (Ws[j] + 1024) * 4
               for j in range(len(Ws)))
    vmem += 3 * (max(Ws[j] for j in pivs) + 1024) * 4
    vmem += len(dense_descs) * sum((Ws[j] + 1024) * 4 for j in pivs)
    if vmem > 12 * 1024 * 1024:
        return None
    aux_keys = tuple(f"tag{o}_docs" for o in aux_ords) + tuple(
        f"tag{o}_pcodes" for (_fl, o, _nv, _idx) in dense_descs)
    kdense = tuple((fl, len(aux_ords) + di, nv)
                   for di, (fl, _o, nv, _idx) in enumerate(dense_descs))
    dmeta = tuple((o, nv, idx) for (_fl, o, nv, idx) in dense_descs)
    return (tuple(slot_descs), tuple(Ws), tuple(groups), pivot_g,
            aux_keys, kdense, dmeta)


def _kernel_seg_ok(cq0: CompiledQuery, seg: Segment, k_pad: int) -> bool:
    """Shared cleanliness preconditions for the Pallas term kernels."""
    opts = cq0.opts
    if (opts.scorer != "BM25STD" or opts.sort_field is not None
            or cq0.knn is not None or k_pad > 64):
        return False
    if (seg.n_deleted > 0 or seg.has_ttl or seg.text_fexp is not None
            or not seg.uniform_docscore or seg.field_fexp):
        return False
    # kernel member hits derive from (weighted tf sum > 0); a WEIGHT 0
    # TEXT field stores tf == 0.0 postings, which would silently drop
    # REQ matches / miss NOT exclusions on the Pallas path — those
    # schemas take the XLA twin (membership-based hit) instead
    for f in cq0.schema.fields:
        if f.type == FieldType.TEXT and f.weight <= 0:
            return False
    try:
        if seg.text.field_masks.ndim != 1:
            return False
    except Exception:
        return False
    return True


def _kernel_plan_phrase(cq0: CompiledQuery, seg: Segment, bk: dict,
                        k_pad: int):
    """Eligibility for the Pallas phrase kernel (ops/intersect.py
    phrase_batch): a single exact / in-order-slop phrase leaf on a clean
    segment, with in-window (non-overflow) position lists.  Returns
    (slots, Ws, PWs, stride, slop) or None."""
    import os
    if os.environ.get("RS_TPU_NO_INTERSECT_KERNEL"):
        return None
    if not _kernel_seg_ok(cq0, seg, k_pad):
        return None
    tree = cq0.tree
    if tree[0] != "leaf" or not isinstance(tree[1], LPhrase):
        return None
    leaf = tree[1]
    if not leaf.inorder or leaf.slop < 0:
        return None
    T = len(leaf.slots)
    if not 2 <= T <= 4:
        return None
    if tuple(leaf.slots) != tuple(range(leaf.score_lo, leaf.score_hi)):
        return None
    e = bk.get(tree[2])
    if not e:
        return None
    Wn, Pc, Pm, pivot_j, bigs, _big_rounds, n_chunks = e
    if n_chunks > 1 or any(bigs) or pivot_j != 0:
        return None
    from ..ops import intersect as IK
    if Wn > IK.MAX_W_MEMBER or Wn % 1024:
        return None
    if Pc > IK.MAX_W_MEMBER or Pc % 1024 or Pm > IK.MAX_W_MEMBER \
            or Pm % 1024:
        return None
    try:
        if seg.text.poskeys.shape[0] % 128:
            return None
    except Exception:
        return None
    Ws = (Wn,) * T
    PWs = (Pc,) + (Pm,) * (T - 1)
    # VMEM budget: posting windows (slot0 carries doclens), poskey
    # windows, 6 chain buffers (Pc), 3 fold/score buffers (W0)
    vmem = sum((4 if t == 0 else 3) * (Ws[t] + 1024) * 4
               for t in range(T))
    vmem += sum((PWs[t] + 1024) * 4 for t in range(T))
    vmem += 6 * (Pc + 1024) * 4
    vmem += 3 * (Wn + 1024) * 4
    if vmem > 12 * 1024 * 1024:
        return None
    return (tuple(leaf.slots), Ws, PWs, int(seg.text.pos_stride),
            max(int(leaf.slop), 0))


def _kernel_batched_inputs(stacked, seg_args_, descs, aux_keys, dmeta):
    """Scalar-prefetch inputs for the intersection mega-kernel from the
    stacked transport rows: per-slot (starts, lens, qmasks) int32 meta
    and (tweights, avgdl, dense consts) f32 meta, plus the aux window
    arrays.  Shared by the search executor and the device-GROUPBY
    aggregate executor (agg/pipeline.py)."""
    cs, cl, cm, cw = [], [], [], []
    for d in descs:
        if d[0] == "t":
            s = d[1]
            cs.append(stacked["tstarts"][:, s])
            cl.append(stacked["tlens"][:, s])
            cm.append(stacked["tmasks"][:, s])
            cw.append(stacked["tweight"][:, s])
        else:               # ("g", tag_ord, value_j, leaf_idx)
            _g, ordn, j, lidx = d
            cs.append(stacked[f"tag{ordn}_starts"][:, j])
            cl.append(stacked[f"tag{ordn}_lens"][:, j])
            cm.append(jnp.zeros_like(cs[-1]))
            cw.append(stacked["leaf_const"][:, lidx])
    meta = jnp.stack(cs + cl + cm, axis=1).astype(jnp.int32)
    qcols = [stacked[f"tag{o}_qcodes"][:, :nv].astype(jnp.int32)
             for (o, nv, _lidx) in dmeta]
    if qcols:
        meta = jnp.concatenate([meta] + qcols, axis=1)
    fmeta = jnp.stack(
        cw + [stacked["avgdl"].reshape(-1)]
        + [stacked["leaf_const"][:, lidx]
           for (_o, _nv, lidx) in dmeta],
        axis=1).astype(jnp.float32)
    aux_arrs = tuple(seg_args_[kk] for kk in aux_keys)
    return meta, fmeta, aux_arrs


def _knn_dense_plan(cq0: CompiledQuery, seg: Segment, bk: dict):
    """Eligibility for the fully-batched dense-filter KNN path: a KNN
    query whose filter tree evaluates as doc-aligned column compares
    ([B, N] elementwise — no posting windows, no per-query scan).  The
    prefilter then fuses as a mask epilogue on the one [B, d] x [d, N]
    distance matmul (ops/vector.knn_batch_masked), which is the same
    program shape as the pure-KNN batch path that sustains ~170k QPS —
    the reference's ADHOC_BF/BATCHES switch (hybrid_reader.c:16-59)
    collapses into one fused scan.

    Covered leaves: single-valued TAG with a dense code column,
    single-valued NUMERIC, MISSING, ALL — alone or under AND, including
    NOT/OPT wrapping.  Returns a tuple of ("tagc"|"num"|"missing"|"all",
    params, leaf_idx, flag) specs or None; flag is "req"/"not"/"opt".
    """
    import os
    if os.environ.get("RS_TPU_NO_DENSE_KNN"):
        return None
    if cq0.knn is None or cq0.opts.sort_field is not None:
        return None
    sig = _knn_ivf_sig(cq0, seg)
    if sig.endswith("multi") or ":ivf:" in sig:
        return None
    if cq0.host_nodes:
        return None
    if (cq0.opts.scorer in _SLOP_SCORERS
            and _slop_root_children(cq0.tree) is not None):
        return None
    code_ords = set(_tag_codes_ords(cq0, seg))

    def leaf_spec(t, flag):
        if t[0] != "leaf":
            return None
        leaf, idx = t[1], t[2]
        if isinstance(leaf, LTag):
            if leaf.ord not in code_ords:
                return None
            e = bk.get(idx)
            if not e or e[0] > 4:   # bounded [B, N] compare passes
                return None
            return ("tagc", (leaf.ord, leaf.n_slots, leaf.field), idx,
                    flag)
        if isinstance(leaf, LNumeric):
            e = bk.get(idx)
            if not e or e[1]:       # multi-valued numerics stay windowed
                return None
            return ("num", (leaf.ord, leaf.lo_excl, leaf.hi_excl,
                            leaf.field), idx, flag)
        if isinstance(leaf, LMissing):
            return ("missing", (leaf.field,), idx, flag)
        if isinstance(leaf, LAll):
            return ("all", (), idx, flag)
        return None

    tree = cq0.tree
    kids = tree[1] if tree[0] == "and" else (tree,)
    if tree[0] not in ("leaf", "and"):
        return None
    specs = []
    for kid in kids:
        if kid[0] == "leaf":
            s = leaf_spec(kid, "req")
        elif kid[0] in ("not", "opt"):
            s = leaf_spec(kid[1], "not" if kid[0] == "not" else "opt")
        else:
            s = None
        if s is None:
            return None
        specs.append(s)
    if not any(s[3] == "req" for s in specs):
        return None
    return tuple(specs)


def _make_dense_knn(cq0: CompiledQuery, seg: Segment, dplan: tuple,
                    layout, k_pad: int, k_exact: int | None = None):
    """Batched executor fn for a dense-filter KNN plan (see
    _knn_dense_plan): bitmap epilogue on the shared distance matmul.

    Output slimming for the ~40 MB/s d2h collect path (the serving
    bottleneck on a tunneled attach): results carry exactly k lanes
    (not the pow2-padded k — the exact k rides the compile sig), and
    when scores are provably query-constant (uniform docscores, no OPT
    terms, non-DOCSCORE scorer) the per-hit scores array collapses to
    ONE f32 per query ("score1"; _BatchHandle re-expands)."""
    opts = cq0.opts
    scorer = opts.scorer
    field = cq0.schema.field(cq0.knn.field)
    metric = field.vector.metric.value
    has_ttl = seg.has_ttl
    dirty = seg.n_deleted > 0
    knn_has_fexp = field.attribute in seg.field_fexp
    uniform_ds = seg.uniform_docscore
    fexp_attrs = frozenset(seg.field_fexp)
    k_eff = min(k_exact if k_exact is not None else k_pad, seg.n_pad)
    const_score = (scorer != "DOCSCORE"
                   and (uniform_ds or scorer == "DISMAX")
                   and not any(s[3] == "opt" for s in dplan))
    tanh_factor = opts.tanh_factor

    def one_chunk(seg_args_, stacked, now):
        N = seg_args_["alive"].shape[0]
        ok = seg_args_["knn_present"]
        if dirty:
            ok = ok & seg_args_["alive"]
        valid = jnp.broadcast_to(ok[None, :], (now.shape[0], N))
        if has_ttl:
            exp = seg_args_["expire_at"]
            valid = valid & ((exp[None, :] == 0)
                             | (exp[None, :] > now[:, None]))
        if knn_has_fexp:
            fe = seg_args_["knn_fexp"]
            valid = valid & ~((fe[None, :] > 0)
                              & (fe[None, :] <= now[:, None]))

        def fexp_ok(kind, ordn):
            fe = seg_args_[f"{kind}{ordn}_fexp"]
            return ~((fe[None, :] > 0) & (fe[None, :] <= now[:, None]))

        const_req = jnp.zeros(now.shape, jnp.float32)       # [B]
        opt_hits = []
        for kind, prm, lidx, flag in dplan:
            if kind == "tagc":
                ordn, ns, fattr = prm
                codes = seg_args_[f"tag{ordn}_codes"]       # [N]
                qc = stacked[f"tag{ordn}_qcodes"]           # [B, ns]
                hit = codes[None, :] == qc[:, 0:1]
                for j in range(1, ns):
                    hit = hit | (codes[None, :] == qc[:, j:j + 1])
                if fattr in fexp_attrs:
                    hit = hit & fexp_ok("tag", ordn)
            elif kind == "num":
                ordn, lo_x, hi_x, fattr = prm
                v = seg_args_[f"num{ordn}_v"][None, :]
                p = seg_args_[f"num{ordn}_p"][None, :]
                lo = stacked["num_lo"][:, ordn:ordn + 1]
                hi = stacked["num_hi"][:, ordn:ordn + 1]
                ge = v > lo if lo_x else v >= lo
                le = v < hi if hi_x else v <= hi
                hit = p & ge & le
                if fattr in fexp_attrs:
                    hit = hit & fexp_ok("num", ordn)
            elif kind == "missing":
                (fattr,) = prm
                hit = ~seg_args_[f"has_{fattr}"][None, :]
                if f"has_{fattr}_fexp" in seg_args_:
                    fe = seg_args_[f"has_{fattr}_fexp"]
                    hit = hit | ((fe[None, :] > 0)
                                 & (fe[None, :] <= now[:, None]))
            else:                                           # "all"
                nd = stacked["n_docs"].reshape(-1)
                hit = (jax.lax.broadcasted_iota(
                    jnp.int32, (1, N), 1) < nd[:, None])
            const = stacked["leaf_const"][:, lidx]          # [B]
            if flag == "req":
                valid = valid & hit
                const_req = const_req + const
            elif flag == "not":
                valid = valid & ~hit
            else:                                           # opt
                opt_hits.append((hit, const))
        dists, idx = V.knn_batch_masked(
            seg_args_["knn_vecs"], seg_args_["knn_sq"], valid,
            stacked["knn_blob"], k_eff, metric,
            scan_vecs=seg_args_.get("knn_scan"))
        yielded = dists < 3.3e38
        count = jnp.sum(yielded.astype(jnp.int32), axis=1)
        if const_score:
            score1 = const_req                              # [B]
            if scorer == "BM25STD.TANH":
                score1 = jnp.tanh(score1 / tanh_factor)
            return {"idx": idx, "score1": score1, "knn": dists,
                    "count": count}
        score = jnp.broadcast_to(const_req[:, None], idx.shape)
        for hit, const in opt_hits:
            h = jnp.take_along_axis(hit, idx, axis=1)
            score = score + jnp.where(h, const[:, None], 0.0)
        if scorer == "DOCSCORE":
            score = seg_args_["docscore"][idx]
        elif not uniform_ds and scorer != "DISMAX":
            score = score * seg_args_["docscore"][idx]
        if scorer == "BM25STD.TANH":
            score = jnp.tanh(score / tanh_factor)
        score = jnp.where(yielded, score, 0.0)
        return {"idx": idx, "scores": score, "knn": dists,
                "count": count}

    # deep batches run in ONE dispatch (amortizing the link round trip
    # like the text path's SMEM-bounded chunks) but evaluate the [B, N]
    # mask + distance matrix in <=CH-query chunks INSIDE the program so
    # the transient stays bounded (~[CH, N] f32)
    CH = max(128, int(next_pow2((1 << 28) // max(seg.n_pad, 1) + 1)) // 2)

    def batched(seg_args_, dyn):
        stacked = _device_unpack_rows(layout, dyn["rows"])
        now = stacked["now"].reshape(-1)                    # [B]
        Bq = now.shape[0]
        if Bq <= CH:
            return one_chunk(seg_args_, stacked, now)
        outs = []
        for c0 in range(0, Bq, CH):
            sl = {kk: vv[c0:c0 + CH] for kk, vv in stacked.items()}
            outs.append(one_chunk(seg_args_, sl, now[c0:c0 + CH]))
        return {kk: jnp.concatenate([o[kk] for o in outs])
                for kk in outs[0]}

    return batched


def _exact_k_lanes(batched, ke: int):
    """Wrap a batched executor fn so per-hit output columns carry
    exactly `ke` lanes instead of the pow2-padded k.  The d2h collect
    path runs at ~40 MB/s on a tunneled attach, so result bytes ARE
    serving throughput; the exact k rides the compile signature.  Lanes
    are already rank-ordered in every path, so the trim is a slice."""
    _cols = ("idx", "scores", "knn", "sortkeys")

    def wrapped(seg_args_, dyn):
        out = batched(seg_args_, dyn)
        return {kk: (vv[:, :ke]
                     if kk in _cols and vv.ndim == 2
                     and vv.shape[1] > ke else vv)
                for kk, vv in out.items()}
    return wrapped


def _rows_executor(cq0: CompiledQuery, ent: tuple, seg: Segment, B: int,
                   k: int) -> "_PackedExecutor":
    """Compile-cached batched executor over stacked transport rows.

    lax.scan over the batch axis instead of vmap: the body compiles once
    (vmap of dynamic_slice re-lowers to arbitrary gathers and explodes
    compile time), and per-query work stays contiguous-window shaped.
    The packed executor then moves the whole batch's rows in ONE h2d and
    the results in ONE d2h transfer."""
    _static, _patches, layout, total, bk, P2, _gsig, lfp = ent
    k_pad = int(min(next_pow2(max(k, 1)), seg.n_pad))
    seg_sig = (f"n={seg.n_pad}|stride={seg.text.pos_stride}|batch={B}"
               f"|ivf={_knn_ivf_sig(cq0, seg)}"
               f"|tc={_tag_codes_ords(cq0, seg)}"
               f"|d={seg.n_deleted > 0}|t={seg.has_ttl}"
               f"|u={seg.uniform_docscore}"
               f"|ft={seg.text_fexp is not None}:"
               f"{sorted(seg.field_fexp)}"
               f"|sc={_knn_has_scan(cq0, seg)}"
               f"|pc={seg.text.pos_clamped}")
    sig = (cq0.signature(seg_sig, bk, P2, k_pad)
           + f"|rows[{lfp}]|ke={min(k, k_pad)}")
    entry = _COMPILE_CACHE.get(sig)
    if entry is not None:
        return entry
    # filtered-KNN batches hoist the [B, N] distance matmul out of the
    # per-query scan: queries then only gather distances at their
    # candidate docs instead of gathering dim-wide vector rows
    # Pallas intersection mega-kernel fast path (ops/intersect.py): one
    # grid step per query instead of a scan of ~6 small XLA kernels
    kplan = _kernel_plan(cq0, seg, bk, k_pad)
    if kplan is not None:
        from ..ops import intersect as IK
        slot_descs, Ws, kgroups, pivot_g, aux_keys, kdense, dmeta = kplan
        P_n = len(kgroups[pivot_g][1])

        def batched(seg_args_, dyn, _descs=slot_descs, _Ws=Ws,
                    _groups=kgroups, _pg=pivot_g, _aux=aux_keys,
                    _k=k_pad, _ke=min(k, k_pad), _dense=kdense,
                    _dmeta=dmeta, _Pn=P_n):
            stacked = _device_unpack_rows(layout, dyn["rows"])
            meta, fmeta, aux_arrs = _kernel_batched_inputs(
                stacked, seg_args_, _descs, _aux, _dmeta)
            # raw mode for small pivot windows: the kernel skips its
            # scalar-latency-bound in-VMEM extraction and emits the
            # masked (doc, score) windows; the batched iter_topk below
            # finishes at full VPU throughput.  Gated on the total raw
            # lanes so the [B, W] merge and HBM round trip stay cheap.
            pvt = _groups[_pg][1]
            raw_rows = sum(_Ws[s] // 128 + IK.R_EXTRA for s in pvt)
            _raw = raw_rows * 128 <= 10_240 and IK._use_pallas()
            # the scalar-prefetch meta lives in SMEM (1 MB, padded to
            # 128 lanes): chunk big batches into <=1024-query kernel
            # calls INSIDE this one program — one dispatch/collect pays
            # the link round trip for the whole batch
            Bq = meta.shape[0]
            CH = min(Bq, 1024)
            dd, ss, cc = [], [], []
            for c0 in range(0, Bq, CH):
                docs, scores, count = IK.intersect_batch(
                    meta[c0:c0 + CH], fmeta[c0:c0 + CH],
                    seg_args_["doc_ids"], seg_args_["freqs"],
                    seg_args_["field_masks"], seg_args_["posting_dl"],
                    *aux_arrs,
                    T=len(_descs), Ws=_Ws, groups=_groups, pivot_g=_pg,
                    k=_k, dense=_dense, raw=_raw)
                dd.append(docs)
                ss.append(scores)
                cc.append(count)
            docs = dd[0] if len(dd) == 1 else jnp.concatenate(dd)
            scores = ss[0] if len(ss) == 1 else jnp.concatenate(ss)
            count = cc[0] if len(cc) == 1 else jnp.concatenate(cc)
            if _Pn == 1 and not _raw:
                # single-phase output is already the exact top-k (score
                # desc, window position asc) — no merge needed.  Return
                # exactly _ke lanes: the d2h collect path runs at
                # ~40 MB/s on a tunneled attach, so result bytes are
                # serving throughput
                return {"idx": docs[:, :_ke], "scores": scores[:, :_ke],
                        "count": count}
            # kernel emits per-phase top-k ([B, P*k] lanes) + counts
            # (or raw windows); merging replaces the [B, W] iter_topk
            vals, sel = IK.iter_topk(scores, docs, _ke)
            idx = jnp.take_along_axis(docs, sel, axis=1)
            # exhausted lanes: consumers trim by the -inf score, but
            # pin the doc filler to INT32_MAX so raw and extracted
            # outputs are bit-identical
            idx = jnp.where(vals > jnp.float32(-3e38), idx,
                            jnp.int32(2**31 - 1))
            return {"idx": idx, "scores": vals, "count": count}

        proto = {"rows": np.zeros((B, total), np.int32)}
        entry = _PackedExecutor(_exact_k_lanes(batched, min(k, k_pad)),
                                proto, _segment_args(cq0, seg))
        entry.path = "kernel"
        entry.sig = sig
        _COMPILE_CACHE[sig] = entry
        return entry

    pplan = _kernel_plan_phrase(cq0, seg, bk, k_pad)
    if pplan is not None:
        from ..ops import intersect as IK
        pslots, pWs, pPWs, pstride, pslop = pplan
        pslots_l = list(pslots)

        def batched(seg_args_, dyn, _slots=pslots_l, _Ws=pWs,
                    _PWs=pPWs, _stride=pstride, _slop=pslop, _k=k_pad,
                    _ke=min(k, k_pad), _eq=not seg.text.pos_clamped):
            stacked = _device_unpack_rows(layout, dyn["rows"])
            ts = stacked["tstarts"][:, _slots].astype(jnp.int32)
            tl = stacked["tlens"][:, _slots].astype(jnp.int32)
            tm = stacked["tmasks"][:, _slots].astype(jnp.int32)
            po = seg_args_["pos_offsets"]
            pstart = po[ts]
            plen = po[ts + tl] - pstart
            meta = jnp.concatenate([ts, tl, tm, pstart, plen], axis=1)
            fmeta = jnp.concatenate(
                [stacked["tweight"][:, _slots],
                 stacked["avgdl"].reshape(-1, 1)],
                axis=1).astype(jnp.float32)
            # raw mode for small term-0 windows (same gate as the and2
            # kernel): skip the scalar-latency-bound in-VMEM k-pass
            # extraction, emit masked windows, finish with the batched
            # iter_topk below at full VPU throughput
            _raw = ((_Ws[0] // 128 + IK.R_EXTRA) * 128 <= 10_240
                    and IK._use_pallas())
            Bq = meta.shape[0]
            CH = min(Bq, 1024)       # SMEM-bounded kernel chunks
            dd, ss, cc = [], [], []
            for c0 in range(0, Bq, CH):
                docs, scores, count = IK.phrase_batch(
                    meta[c0:c0 + CH], fmeta[c0:c0 + CH],
                    seg_args_["doc_ids"], seg_args_["freqs"],
                    seg_args_["field_masks"], seg_args_["posting_dl"],
                    seg_args_["poskeys"],
                    T=len(_slots), Ws=_Ws, PWs=_PWs, stride=_stride,
                    slop=_slop, k=_k, raw=_raw, eq_join=_eq)
                dd.append(docs)
                ss.append(scores)
                cc.append(count)
            docs = dd[0] if len(dd) == 1 else jnp.concatenate(dd)
            scores = ss[0] if len(ss) == 1 else jnp.concatenate(ss)
            count = cc[0] if len(cc) == 1 else jnp.concatenate(cc)
            vals, sel = IK.iter_topk(scores, docs, _ke)
            idx = jnp.take_along_axis(docs, sel, axis=1)
            return {"idx": idx, "scores": vals, "count": count}

        proto = {"rows": np.zeros((B, total), np.int32)}
        entry = _PackedExecutor(_exact_k_lanes(batched, min(k, k_pad)),
                                proto, _segment_args(cq0, seg))
        entry.path = "phrase-kernel"
        entry.sig = sig
        _COMPILE_CACHE[sig] = entry
        return entry

    dplan = _knn_dense_plan(cq0, seg, bk)
    if dplan is not None:
        batched = _make_dense_knn(cq0, seg, dplan, layout, k_pad,
                                  k_exact=min(k, k_pad))
        proto = {"rows": np.zeros((B, total), np.int32)}
        entry = _PackedExecutor(_exact_k_lanes(batched, min(k, k_pad)),
                                proto, _segment_args(cq0, seg))
        entry.path = "knn-dense"
        entry.sig = sig
        _COMPILE_CACHE[sig] = entry
        return entry

    knn_row = bool(
        cq0.knn is not None
        and not _knn_ivf_sig(cq0, seg).endswith("multi")
        and ":ivf:" not in _knn_ivf_sig(cq0, seg))
    hoist = _knn_hoist_info(cq0, seg, bk, k_pad) if knn_row else None
    if hoist is not None:
        # windowed filtered KNN, batched: hoist everything [N]-wide out
        # of the per-query scan — ONE [B, d] x [d, N] distance matmul
        # (bf16 candidate pass for f32 storage) and ONE batched masked
        # top-M replace B per-query ~400 us masked approx_top_k calls;
        # the scan body only member-checks its M candidates against the
        # filter windows.  f32 exactness: the final k winners are
        # rescored at Precision.HIGHEST outside the scan (same two-phase
        # contract as ops/vector.knn_batch).
        knn_metric = cq0.schema.field(cq0.knn.field).vector.metric.value
        M, _Wc = hoist
        two_phase = seg.vectors[
            cq0.schema.field(cq0.knn.field).attribute].vecs.dtype == \
            jnp.float32
        C = min(max(4 * k_pad, k_pad + 16), M) if two_phase else k_pad
        raw = _build_fn(cq0, seg, bk, P2, C, has_extra=False,
                        jit=False, knn_row=False, host_fallback=True,
                        knn_topm=True, knn_underfill_k=k_pad)
        has_ttl = seg.has_ttl
        dirty = seg.n_deleted > 0
        knn_has_fexp = cq0.schema.field(
            cq0.knn.field).attribute in seg.field_fexp

        def batched(seg_args_, dyn, _M=M, _C=C, _k=k_pad,
                    _ke=min(k, k_pad), _tp=two_phase):
            stacked = _device_unpack_rows(layout, dyn["rows"])
            now = stacked["now"].reshape(-1)
            src = (seg_args_["knn_scan"]
                   if _tp and "knn_scan" in seg_args_
                   else seg_args_["knn_vecs"])
            D = V.distances_to(src,
                               seg_args_["knn_sq"], stacked["knn_blob"],
                               knn_metric, approx=_tp)   # [B, N]
            ok = seg_args_["knn_present"]
            if dirty:
                ok = ok & seg_args_["alive"]
            okd = jnp.broadcast_to(ok[None, :], D.shape)
            if has_ttl:
                exp = seg_args_["expire_at"]
                okd = okd & ((exp[None, :] == 0)
                             | (exp[None, :] > now[:, None]))
            if knn_has_fexp:
                fe = seg_args_["knn_fexp"]
                okd = okd & ~((fe[None, :] > 0)
                              & (fe[None, :] <= now[:, None]))
            dmd = jnp.where(okd, D, 3.4e38)
            if _tp:
                negd, ids = V._cand_top(-dmd, _M)        # [B, M]
            else:
                negd, ids = T.fast_top_k(-dmd, _M)       # [B, M]

            def body(_, args):
                dyn_i, nd_i, id_i = args
                return None, raw(seg_args_, dict(dyn_i, knn_negd=nd_i,
                                                 knn_ids=id_i))
            _, outs = jax.lax.scan(body, None, (stacked, negd, ids))
            if not _tp and _C == _k:
                # exact-k output lanes (d2h bytes are serving
                # throughput on the tunneled attach)
                return {kk: (vv[:, :_ke] if vv.ndim == 2 else vv)
                        for kk, vv in outs.items()}
            # exact f32 rescore of the candidate set + final top-k
            cidx = outs["idx"]                           # [B, C]
            dr = V._rescore(seg_args_["knn_vecs"], seg_args_["knn_sq"],
                            stacked["knn_blob"], cidx, knn_metric)
            dr = jnp.where(outs["knn"] >= 3.3e38, 3.4e38, dr)
            vals, sel = jax.lax.top_k(-dr, _ke)
            knn_k = -vals
            outs["idx"] = jnp.take_along_axis(cidx, sel, axis=1)
            outs["scores"] = jnp.take_along_axis(outs["scores"], sel,
                                                 axis=1)
            outs["knn"] = knn_k
            outs["count"] = jnp.sum((knn_k < 3.3e38).astype(jnp.int32),
                                    axis=1)
            return outs

        proto = {"rows": np.zeros((B, total), np.int32)}
        entry = _PackedExecutor(_exact_k_lanes(batched, min(k, k_pad)),
                                proto, _segment_args(cq0, seg))
        entry.path = "knn-batches"
        entry.sig = sig
        _COMPILE_CACHE[sig] = entry
        return entry
    raw = _build_fn(cq0, seg, bk, P2, k_pad, has_extra=False,
                    jit=False, knn_row=knn_row, host_fallback=True)
    # batch-axis execution shape: lax.scan, NOT vmap.  Measured on TPU
    # v5e (round 2): a chunked-vmap variant ([C, W]-shaped kernels, scan
    # over B/C chunks) was 2-5x SLOWER end to end — vmapped
    # dynamic_slice window reads lower to arbitrary-offset gathers,
    # losing the contiguous-DMA property the window algebra is built on.
    # The scan body keeps every window read a dynamic_slice.
    if knn_row:
        knn_metric = cq0.schema.field(cq0.knn.field).vector.metric.value

        def batched(seg_args_, dyn):
            stacked = _device_unpack_rows(layout, dyn["rows"])
            D = V.distances_to(seg_args_["knn_vecs"],
                               seg_args_["knn_sq"], stacked["knn_blob"],
                               knn_metric)               # [B, N]

            def body(_, args):
                dyn_i, d_i = args
                return None, raw(seg_args_, dict(dyn_i, knn_row=d_i))
            _, outs = jax.lax.scan(body, None, (stacked, D))
            return outs
    else:
        def batched(seg_args_, dyn):
            stacked = _device_unpack_rows(layout, dyn["rows"])

            def body(_, dyn_i):
                return None, raw(seg_args_, dyn_i)
            _, outs = jax.lax.scan(body, None, stacked)
            return outs

    proto = {"rows": np.zeros((B, total), np.int32)}
    entry = _PackedExecutor(_exact_k_lanes(batched, min(k, k_pad)),
                                proto, _segment_args(cq0, seg))
    entry.sig = sig
    _COMPILE_CACHE[sig] = entry
    return entry


def _tag_codes_ords(cq: CompiledQuery, seg: Segment) -> tuple:
    """Tag ords whose field has the dense value-id column on this segment
    (single-valued TAG fields — see TagPostings.codes).  Part of the
    compile-cache key: the predicate lowers to a per-candidate code
    compare instead of posting-window membership."""
    out = []
    for j, node in enumerate(cq.tag_nodes):
        tp = seg.tags.get(cq.schema.field(node.field).attribute)
        if tp is not None and tp.codes is not None:
            out.append(j)
    return tuple(out)


def _segment_args(cq: CompiledQuery, seg: Segment) -> dict:
    args = {
        "gids": seg.gids,
        "doc_ids": seg.text.doc_ids,
        "freqs": seg.text.freqs,
        "field_masks": seg.text.field_masks,
        "posting_dl": seg.text.doclens,
        "pos_offsets": seg.text.pos_offsets,
        "poskeys": seg.text.poskeys,
        "alive": seg.alive,
        "doclen": seg.doclen,
        "max_freq": seg.max_freq,
        "docscore": seg.docscore,
        "expire_at": seg.expire_at,
    }
    if seg.text_fexp is not None:
        args["text_fexp"] = seg.text_fexp
    for j, node in enumerate(cq.tag_nodes):
        attr = cq.schema.field(node.field).attribute
        tp = seg.tags.get(attr)
        args[f"tag{j}_docs"] = (tp.doc_ids if tp is not None
                                else jnp.zeros(1, jnp.int32))
        if tp is not None and tp.codes is not None:
            args[f"tag{j}_codes"] = tp.codes
            pc = seg.tag_pcodes(attr)
            if pc is not None:
                args[f"tag{j}_pcodes"] = pc
    for leaf, _idx in cq.leaves():
        if (isinstance(leaf, (LTag, LNumeric, LGeo, LVecRange))
                and leaf.field in seg.field_fexp):
            kind = ("tag" if isinstance(leaf, LTag)
                    else "num" if isinstance(leaf, LNumeric)
                    else "geo" if isinstance(leaf, LGeo) else "vec")
            args[f"{kind}{leaf.ord}_fexp"] = seg.field_fexp[leaf.field]
        if isinstance(leaf, LMissing):
            if leaf.field in seg.field_fexp:
                args[f"has_{leaf.field}_fexp"] = seg.field_fexp[leaf.field]
            elif seg.text_fexp is not None:
                fld = cq.schema.try_field(leaf.field)
                if fld is not None and fld.type == FieldType.TEXT:
                    args[f"has_{leaf.field}_fexp"] = \
                        seg.text_fexp[:, fld.field_id]
        if isinstance(leaf, LNumeric):
            col = seg.numerics[leaf.field]
            args[f"num{leaf.ord}_v"] = col.values
            args[f"num{leaf.ord}_p"] = col.present
            args[f"num{leaf.ord}_sd"] = (
                col.sorted_docs if col.sorted_docs is not None
                else jnp.zeros(1, jnp.int32))
            if col.multi:
                args[f"num{leaf.ord}_mv"] = col.multi_values
                args[f"num{leaf.ord}_mp"] = col.multi_present
        elif isinstance(leaf, LGeo):
            col = seg.geos[leaf.field]
            args[f"geo{leaf.ord}_lon"] = col.lon
            args[f"geo{leaf.ord}_lat"] = col.lat
            args[f"geo{leaf.ord}_p"] = col.present
        elif isinstance(leaf, LVecRange):
            col = seg.vectors[leaf.field]
            if col.host:
                raise WrongFieldType(
                    "VECTOR_RANGE is not supported on host-tier "
                    "(storage='host') vector fields — range queries "
                    "need the full vector matrix on device")
            args[f"vec{leaf.ord}"] = col.vecs
            args[f"vec{leaf.ord}_p"] = col.present
            args[f"vec{leaf.ord}_sq"] = col.sq_norms
            if col.multi:
                args[f"vec{leaf.ord}_dr"] = col.doc_rows
        elif isinstance(leaf, LMissing):
            args[f"has_{leaf.field}"] = seg.missing[leaf.field]
    if cq.knn is not None:
        field = cq.schema.field(cq.knn.field)
        col = seg.vectors[field.attribute]
        if col.host:
            # single-segment execution routes through _execute_host_knn;
            # reaching here means an in-graph context (e.g. a sharded
            # mesh program) that cannot page host slabs
            raise WrongFieldType(
                "host-tier (storage='host') vector fields are not "
                "supported in sharded in-graph execution; shard the "
                "corpus with per-shard host tiers instead")
        args["knn_vecs"] = col.vecs
        args["knn_present"] = col.present
        args["knn_sq"] = col.sq_norms
        if col.scan_vecs is not None:
            args["knn_scan"] = col.scan_vecs
        if field.attribute in seg.field_fexp:
            args["knn_fexp"] = seg.field_fexp[field.attribute]
        if col.multi:
            args["knn_doc_rows"] = col.doc_rows
        # (query blob itself is per-query dynamic state — see bind())
        if col.ivf is not None:
            args["ivf_cent"] = col.ivf.centroids
            args["ivf_csq"] = col.ivf.cent_sq
            args["ivf_bv"] = col.ivf.bucket_vecs
            args["ivf_bsq"] = col.ivf.bucket_sq
            args["ivf_bi"] = col.ivf.bucket_ids
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


def _dyn_fingerprint(dyn: dict) -> str:
    """Shape/dtype fingerprint of the dynamic state: the packed executor
    freezes its buffer layout at build time, so anything that can vary
    shape under the same query signature (e.g. vector dims across
    same-named fields) must key the cache."""
    return "|dyn=" + ",".join(
        f"{k}:{np.asarray(v).shape}:{np.asarray(v).dtype}"
        for k, v in sorted(dyn.items()))


_COMPILE_SECONDS = 0.0


def compile_seconds() -> float:
    """Cumulative wall time spent tracing/XLA-compiling executors.  Query
    deadline loops snapshot this around execute() calls and credit the
    delta, so a one-time compile never burns a query's timeout budget."""
    return _COMPILE_SECONDS


def _layout_of(proto: dict) -> tuple[list, int]:
    """Canonical flat int32 transport layout for a dict of arrays:
    sorted keys, each flattened to `size` lanes.  Shared by the packed
    executors and the per-query row cache (bind_row) — both sides must
    agree on it byte-for-byte."""
    layout = []
    off = 0
    for key in sorted(proto):
        a = np.asarray(proto[key])
        n = int(a.size) if a.shape else 1
        layout.append((key, off, n, a.shape, str(a.dtype)))
        off += n
    return layout, off


def _pack_into(layout: list, dyn: dict, buf: np.ndarray) -> np.ndarray:
    """Host-side pack by layout: floats ride as raw bit patterns (int32
    bitcast) so TPU denormal flushing can never corrupt them."""
    for key, o, n, shape, dt in layout:
        if not n:
            continue
        a = np.asarray(dyn[key])
        if dt.startswith("float") or dt == "bfloat16":
            v = a.reshape(-1).astype(np.float32).view(np.int32)
        elif dt == "int32":
            v = a.reshape(-1)
        else:
            v = a.reshape(-1).astype(np.int32)
        buf[o:o + n] = v
    return buf


def _device_unpack_rows(layout: list, rows) -> dict:
    """Vectorized device-side unpack of [B, total] stacked transport rows
    into a dict of [B, ...] arrays (one static slice per key, NOT per
    row — a lax.scan then carries per-query slices for free)."""
    B = rows.shape[0]
    d = {}
    for key, o, n, shape, dt in layout:
        if shape and int(np.prod(shape)) == 0:
            d[key] = jnp.zeros((B,) + shape, jnp.dtype(dt))
            continue
        sl = rows[:, o:o + n]
        if dt.startswith("float") or dt == "bfloat16":
            sl = jax.lax.bitcast_convert_type(sl, jnp.float32)
            if dt != "float32":
                sl = sl.astype(jnp.dtype(dt))
        elif dt == "bool":
            sl = sl.astype(jnp.bool_)
        elif dt != "int32":
            sl = sl.astype(jnp.dtype(dt))
        d[key] = sl.reshape((B,) + shape) if shape else sl[:, 0]
    return d


def _device_unpack(layout: list, buf) -> dict:
    """Device-side inverse of _pack_into (traced under jit)."""
    d = {}
    for key, o, n, shape, dt in layout:
        if shape and int(np.prod(shape)) == 0:
            d[key] = jnp.zeros(shape, jnp.dtype(dt))
            continue
        sl = jax.lax.dynamic_slice(buf, (o,), (n,))
        if dt.startswith("float") or dt == "bfloat16":
            sl = jax.lax.bitcast_convert_type(sl, jnp.float32)
            if dt != "float32":
                sl = sl.astype(jnp.dtype(dt))
        elif dt == "bool":
            sl = sl.astype(jnp.bool_)
        elif dt != "int32":
            sl = sl.astype(jnp.dtype(dt))
        d[key] = sl.reshape(shape) if shape else sl[0]
    return d


class _PackedExecutor:
    """Wraps a built executor so all per-query dynamic state crosses
    host->device as ONE int32 buffer and all outputs come back as ONE
    float32 buffer (ints bitcast).  Matters enormously when the device is
    reached over a high-latency link (each dict leaf is a separate
    transfer) and still trims dispatch overhead on local attach."""

    __slots__ = ("fn", "in_layout", "in_total", "out_layout", "out_total",
                 "out_keys", "_warm", "path", "sig")

    def __init__(self, raw_fn, dyn_proto: dict, seg_args: dict):
        self.path = "scan"      # which executor family built this entry
        self.sig = None         # stable compile signature (set by caller)
        # input layout from the prototype dyn (same sig => same shapes)
        self.in_layout, self.in_total = _layout_of(dyn_proto)
        in_layout = self.in_layout

        def unpack(buf):
            return _device_unpack(in_layout, buf)

        def packed(seg_args_, buf):
            # transport buffer is int32, NOT float32: small ints bitcast
            # to f32 are denormals, and TPU flushes denormals to zero in
            # downstream ops — f32 payloads ride as bit patterns instead
            # (integer ops never flush), mirroring the input buffer.
            out = raw_fn(seg_args_, unpack(buf))
            parts = []
            for key in sorted(out):
                a = out[key]
                flat = a.reshape(-1)
                if flat.shape[0] == 0:
                    continue
                if flat.dtype == jnp.int32:
                    pass
                elif flat.dtype == jnp.bool_:
                    flat = flat.astype(jnp.int32)
                else:
                    if flat.dtype != jnp.float32:
                        flat = flat.astype(jnp.float32)
                    flat = jax.lax.bitcast_convert_type(flat, jnp.int32)
                parts.append(flat)
            return jnp.concatenate(parts) if parts else jnp.zeros(
                (0,), jnp.int32)

        # output layout via abstract eval (no device work)
        dyn_buf = self._pack(dyn_proto)
        out_spec = jax.eval_shape(
            lambda s, b: raw_fn(s, unpack(b)), seg_args, dyn_buf)
        self.out_layout = []
        off = 0
        for key in sorted(out_spec):
            s = out_spec[key]
            n = int(np.prod(s.shape)) if s.shape else 1
            self.out_layout.append((key, off, n, s.shape, str(s.dtype)))
            off += n
        self.out_total = off
        self.fn = jax.jit(packed)
        self._warm = False

    def _pack(self, dyn: dict) -> np.ndarray:
        return _pack_into(self.in_layout, dyn, np.empty(self.in_total,
                                                        np.int32))

    def submit(self, seg_args: dict, dyn: dict):
        """Async dispatch: returns the device value (one future).

        The first call traces + XLA-compiles synchronously; that time is
        booked into the module compile clock so callers can exclude it
        from query deadlines (the reference's timeout clocks execution,
        not one-time executable builds)."""
        return self.submit_buf(seg_args, self._pack(dyn))

    def submit_buf(self, seg_args: dict, buf: np.ndarray):
        """submit() over an already-packed transport buffer.

        The buffer is device_put EXPLICITLY first: a numpy argument to a
        jitted call rides the dispatch RPC's inline-transfer path, which
        on a tunneled attach runs ~30x slower than the bulk h2d path
        (measured 34 MB/s vs 1 GB/s — it dominated serving dispatches)."""
        if isinstance(buf, np.ndarray):
            buf = jax.device_put(buf)
        if self._warm:
            return self.fn(seg_args, buf)
        t0 = _time.perf_counter()
        out = self.fn(seg_args, buf)
        global _COMPILE_SECONDS
        _COMPILE_SECONDS += _time.perf_counter() - t0
        self._warm = True
        return out

    def finish(self, flat_dev) -> dict:
        """Blocking collect: ONE d2h transfer, unpacked by layout."""
        return self._unpack_out(np.asarray(jax.device_get(flat_dev)))

    def __call__(self, seg_args: dict, dyn: dict) -> dict:
        return self.finish(self.submit(seg_args, dyn))

    def _unpack_out(self, flat: np.ndarray) -> dict:
        out = {}
        for key, o, n, shape, dt in self.out_layout:
            if shape and int(np.prod(shape)) == 0:
                out[key] = np.zeros(shape, np.dtype(dt))
                continue
            v = flat[o:o + n]
            if dt == "int32":
                v = v.view(np.int32)
            elif dt == "bool":
                v = v.view(np.int32).astype(bool)
            else:
                v = v.view(np.float32)
                if dt != "float32":
                    v = v.astype(np.dtype(dt))
            out[key] = v.reshape(shape) if shape else v[0]
        return out


def _knn_ivf_sig(cq: CompiledQuery, seg: Segment) -> str:
    """KNN part of the compile-cache key.  Must carry every KNN-related
    static baked into the executor closure: algo/probe shape, metric and
    storage dtype (two indexes can share field names and shapes)."""
    if cq.knn is None:
        return "none"
    from ..schema import VectorAlgo
    field = cq.schema.field(cq.knn.field)
    col = seg.vectors.get(field.attribute)
    base = (f"{field.vector.metric.value}:{field.vector.dtype}:"
            f"{cq.knn.hybrid_policy}:")
    if col is not None and col.multi:
        return base + "multi"  # row-layout exact scan (VecSim multi-value)
    if (col is None or col.ivf is None
            or field.vector.algo == VectorAlgo.FLAT):
        return base + "flat"
    nprobe = cq.knn.ef_runtime or field.vector.nprobe
    return base + f"ivf:{nprobe}:{col.ivf.nlist}:{col.ivf.list_pad}"


def _knn_has_scan(cq: CompiledQuery, seg: Segment) -> bool:
    """Whether the KNN field carries a bf16 scan copy (changes both the
    seg_args pytree and the program baked into the executor)."""
    if cq.knn is None:
        return False
    col = seg.vectors.get(cq.schema.field(cq.knn.field).attribute)
    return col is not None and col.scan_vecs is not None


def _can_gen(t) -> bool:
    """Static: can this subtree evaluate as a candidate *window*
    (generator), or only as a membership predicate (not/opt)?"""
    tag = t[0]
    if tag == "leaf":
        return isinstance(t[1], (LTerms, LPhrase, LTag, LNumeric,
                                 LAll, LNone))
    if tag == "and":
        return any(_can_gen(c) for c in t[1])
    if tag in ("or", "dismax"):
        return all(_can_gen(c) for c in t[1])
    return False  # not/opt are predicates


def _gen_bucket(t, buckets: dict, n_pad: int) -> int:
    """Static width of a subtree's generator output window."""
    tag = t[0]
    if tag == "leaf":
        leaf, idx = t[1], t[2]
        bk = buckets[idx]
        if isinstance(leaf, LTerms):
            return bk[0] * bk[1]
        if isinstance(leaf, LPhrase):
            if len(bk) > 4 and bk[6] > 1:
                return n_pad   # chunked dense accumulator
            return bk[1]           # position window bound
        if isinstance(leaf, LTag):
            return bk[0] * bk[1]
        if isinstance(leaf, LNumeric):
            return bk[0]
        if isinstance(leaf, LAll):
            return n_pad
        return 1                   # LNone
    if tag == "and":
        return min(_gen_bucket(c, buckets, n_pad)
                   for c in t[1] if _can_gen(c))
    if tag in ("or", "dismax"):
        return next_pow2(sum(_gen_bucket(c, buckets, n_pad)
                             for c in t[1]))
    return n_pad


def _knn_batch_M(k_eff: int, n_pad: int, Wc: int) -> int:
    """Candidate-set size for the BATCHES filtered-KNN branch: the pow-4
    bucket Wc can overstate the true window by 4x, so Wc/4 is the
    selectivity lower bound; M targets >= ~2k expected survivors even at
    worst-case bucket inflation (underfilled queries re-run exactly)."""
    return int(min(
        next_pow2(max(8 * k_eff * n_pad // max(Wc, 1), 4 * k_eff, 512)),
        8192, n_pad))


def _knn_hoist_info(cq: CompiledQuery, seg: Segment, buckets: dict,
                    k: int):
    """Static mirror of _build_fn's BATCHES-branch decision: returns
    (M, Wc) when a batched executor can hoist the per-query [N]-wide
    masked top-M out of the scan (the single biggest per-query cost of
    windowed filtered KNN — ~400 us/query at 500k docs), else None."""
    if cq.knn is None:
        return None
    sig = _knn_ivf_sig(cq, seg)
    if sig.endswith("multi") or ":ivf:" in sig:
        return None
    policy = cq.knn.hybrid_policy
    if policy == "ADHOC_BF":
        return None
    tree = cq.tree
    window_root = _can_gen(tree) and not (
        tree[0] == "leaf" and isinstance(tree[1], LAll))
    if not window_root:
        return None
    Wc = _gen_bucket(tree, buckets, seg.n_pad)
    if policy != "BATCHES" and Wc < 32768:
        return None
    k_eff = min(k, Wc)
    return _knn_batch_M(k_eff, seg.n_pad, Wc), Wc


def _build_fn(cq: CompiledQuery, seg_proto: Segment, buckets: dict,
              P: int, k: int, has_extra: bool, mode: str = "topk",
              jit: bool = True, knn_row: bool = False,
              host_fallback: bool = False, knn_topm: bool = False,
              knn_underfill_k: int = 0):
    """Build + jit the window-evaluator executor for one query structure.

    See ops/window.py for the evaluation model: every subtree evaluates as
    a sorted candidate *window* (generator) or a membership *predicate*;
    intersections pivot on the statically-smallest window.
    """
    opts = cq.opts
    scorer = opts.scorer
    tree = cq.tree
    pos_stride = seg_proto.text.pos_stride
    knn = cq.knn
    knn_metric = (cq.schema.field(knn.field).vector.metric.value
                  if knn is not None else None)
    knn_ivf = ":ivf:" in _knn_ivf_sig(cq, seg_proto)
    knn_multi = _knn_ivf_sig(cq, seg_proto).endswith("multi")
    knn_nprobe = (knn.ef_runtime or cq.schema.field(knn.field).vector.nprobe
                  if knn is not None else 0)
    knn_policy = (knn.hybrid_policy if knn is not None else None)
    knn_has_fexp = (knn is not None and cq.schema.field(knn.field).attribute
                    in seg_proto.field_fexp)
    dismax = scorer == "DISMAX"
    n_pad_static = seg_proto.n_pad
    # segment fast-path flags: clean segments skip per-candidate
    # alive/TTL/docscore gathers (exactness preserved — flags flip the
    # compile-cache key when the segment gets deletions/TTLs)
    seg_dirty = seg_proto.n_deleted > 0
    seg_ttl = seg_proto.has_ttl
    text_field_ttl = seg_proto.text_fexp is not None
    fexp_attrs = frozenset(seg_proto.field_fexp)
    tag_code_ords = frozenset(_tag_codes_ords(cq, seg_proto))
    seg_uniform_ds = seg_proto.uniform_docscore
    # BM25STD/DOCNORM read the norm operand from the per-posting doclens
    # column (sliced, not gathered); TFIDF needs max_freq and keeps the
    # gather path; legacy BM25's denominator uses only avgdl (no per-doc
    # norm at all — ext/default.c bm25Recursive)
    norm_from_postings = scorer in ("BM25STD", "BM25STD.TANH",
                                    "TFIDF.DOCNORM")
    slop_info = (_slop_root_children(tree)
                 if scorer in _SLOP_SCORERS else None)
    slop_buckets = buckets.get(-1)
    if slop_buckets is None:
        slop_info = None

    # ---- static analysis: which subtrees can generate, and how wide
    def can_gen(t) -> bool:
        return _can_gen(t)

    def gen_bucket(t) -> int:
        return _gen_bucket(t, buckets, n_pad_static)

    def run(seg, dyn):
        n_pad = seg["alive"].shape[0]

        def clampdoc(docs):
            return jnp.minimum(docs, n_pad - 1)

        # the per-doc normalization column for the active scorer
        normcol = (seg["max_freq"] if scorer in ("TFIDF", "DISMAX",
                                                 "DOCSCORE")
                   else seg["doclen"])

        def transform(tf, nv, slot):
            """Scorer math given tf and the norm-column values `nv` at the
            same docs (reference formulas, ext/default.c)."""
            w = dyn["tweight"][slot]
            if scorer == "BM25":
                # legacy (non-standard) BM25: k1=1.2, b=0.5, and the
                # denominator uses ONLY avgdl — no per-doc length
                # (ext/default.c bm25Recursive:165-171); w carries the
                # logb idf
                norm = 1.2 * (1.0 - 0.5 + 0.5 * dyn["avgdl"])
                return w * tf / (tf + norm)
            if scorer.startswith("BM25"):
                norm = T.BM25_K1 * (1.0 - T.BM25_B
                                    + T.BM25_B * nv
                                    / jnp.maximum(dyn["avgdl"], 1e-9))
                return w * tf * (T.BM25_K1 + 1.0) / (tf + norm)
            if scorer == "DISMAX":
                # weight * raw frequency — no normalization, no idf,
                # no doc score (reference dismaxRecursive)
                return w * tf
            return w * tf / jnp.maximum(nv, 1.0)

        # field-level TTL: expired-TEXT-field bitmask per doc, computed
        # once per query (reference: ttl_table + expiration_checker)
        emask = (W.expired_field_mask(seg["text_fexp"], dyn["now"])
                 if text_field_ttl else None)

        def field_alive(kind: str, ordn: int, docs, valid):
            """Leaf-level TTL check for non-text fields."""
            fe = seg[f"{kind}{ordn}_fexp"][clampdoc(docs)]
            return valid & ~((fe > 0) & (fe <= dyn["now"]))

        # ---- per-slot windows
        def slot_raw(slot: int, Wn: int):
            return W.slot_window(
                seg["doc_ids"], seg["freqs"], seg["field_masks"],
                dyn["tstarts"][slot], dyn["tlens"][slot],
                dyn["tmasks"][slot], Wn, emask=emask)

        def slot_norms(slot: int, Wn: int):
            """Norm operand aligned with the slot window: a contiguous
            slice of the per-posting doclens (no gather) for BM25/DOCNORM;
            a max_freq gather only for TFIDF."""
            if norm_from_postings:
                return W._slice(seg["posting_dl"], dyn["tstarts"][slot],
                                Wn)
            return None  # caller gathers normcol

        def slot_scored(slot: int, Wn: int):
            """Returns (docs, score, valid, nv): nv is the norm operand
            aligned with the window, threaded out so AND predicates reuse
            it instead of re-gathering normcol at pivot docs."""
            docs, tf, valid = slot_raw(slot, Wn)
            nv = slot_norms(slot, Wn)
            if nv is None:
                nv = normcol[clampdoc(docs)]
            s = transform(tf, nv, slot)
            return docs, jnp.where(valid, s, 0.0), valid, nv

        # ---- leaf generators
        def gen_leaf(leaf, idx):
            const = dyn["leaf_const"][idx]
            if isinstance(leaf, LTerms):
                nu, Wn = buckets[idx]
                wins = [slot_scored(leaf.lo + j, Wn) for j in range(nu)]
                if len(wins) == 1:
                    return wins[0]
                d, sc, v, dl = W.union_windows([w[:3] for w in wins],
                                               dismax=False,
                                               extra=[w[3] for w in wins])
                return d, sc, v, dl
            if isinstance(leaf, LPhrase):
                return gen_phrase(leaf, idx)
            if isinstance(leaf, LTag):
                nu, Wn = buckets[idx]
                wins = []
                for j in range(nu):
                    d, v = W.tag_window(
                        seg[f"tag{leaf.ord}_docs"],
                        dyn[f"tag{leaf.ord}_starts"][j],
                        dyn[f"tag{leaf.ord}_lens"][j], Wn)
                    wins.append((d, None, v))
                if len(wins) == 1:
                    d, _, v = wins[0]
                else:
                    d, _, v = W.union_windows(wins)
                if leaf.field in fexp_attrs:
                    v = field_alive("tag", leaf.ord, d, v)
                return d, jnp.where(v, const, 0.0), v, None
            if isinstance(leaf, LNumeric):
                (Wn, multi) = buckets[idx]
                d, v = W.numeric_window(
                    seg[f"num{leaf.ord}_sd"], dyn["numw_start"][leaf.ord],
                    dyn["numw_len"][leaf.ord], Wn)
                if multi:   # a doc appears once per in-range value
                    d, v = W.dedup_window(d, v)
                if leaf.field in fexp_attrs:
                    v = field_alive("num", leaf.ord, d, v)
                return d, jnp.where(v, const, 0.0), v, None
            if isinstance(leaf, LAll):
                d, v = W.iota_window(n_pad)
                v = v & (d < dyn["n_docs"])  # exclude padding rows
                # iota window: the norm column is already aligned
                return d, jnp.where(v, const, 0.0), v, normcol
            if isinstance(leaf, LNone):
                d = jnp.full((1,), W.INVALID, jnp.int32)
                return (d, jnp.zeros((1,), jnp.float32), d != W.INVALID,
                        None)
            raise AssertionError(leaf)

        def gen_phrase(leaf, idx):
            Wn, Pc, Pm, pivot_j, bigs, big_rounds, n_chunks = buckets[idx]
            starts = jnp.stack([dyn["tstarts"][s] for s in leaf.slots])
            lens = jnp.stack([dyn["tlens"][s] for s in leaf.slots])
            anylen = jnp.all(lens > 0)
            if n_chunks > 1:
                # pivot positions overflow the window cap: dense
                # accumulator path (exact — no truncation)
                _, acc = _phrase_chain_pivot(
                    seg["poskeys"], seg["pos_offsets"], starts, lens,
                    pos_stride, leaf.slop, leaf.inorder, Pc, Pm, pivot_j,
                    bigs=bigs, big_rounds=big_rounds, n_chunks=n_chunks,
                    n_pad=n_pad)
                docs, _vi = W.iota_window(n_pad)
                valid = acc & anylen
                # dense scatter-add of member-term score contributions
                score = jnp.zeros((n_pad,), jnp.float32)
                for s in range(leaf.score_lo, leaf.score_hi):
                    sd, ss, sv, _nv = slot_scored(s, Wn)
                    score = score.at[clampdoc(sd)].add(
                        jnp.where(sv, ss, 0.0), mode="drop")
                return docs, jnp.where(valid, score, 0.0), valid, normcol
            cand, alive_c = _phrase_chain_pivot(
                seg["poskeys"], seg["pos_offsets"], starts, lens,
                pos_stride, leaf.slop, leaf.inorder, Pc, Pm, pivot_j,
                bigs=bigs, big_rounds=big_rounds)
            alive_c = alive_c & anylen
            docs = jnp.where(alive_c, cand // pos_stride,
                             W.INVALID)
            docs, valid = W.dedup_adjacent(docs, alive_c)
            # score: sum of member-term contributions at the phrase docs
            score = jnp.zeros(docs.shape, jnp.float32)
            for s in range(leaf.score_lo, leaf.score_hi):
                sd, ss, sv, _nv = slot_scored(s, Wn)
                hit, add = W.member(sd, sv, ss, docs)
                score = score + add
            return docs, jnp.where(valid, score, 0.0), valid, None

        # ---- predicates: fn(docs, dl) -> (match, score); `dl` is the
        # norm-column values at `docs`, computed once by the caller so
        # membership-only term windows never pay their own N-gather
        def pred_leaf(leaf, idx):
            const = dyn["leaf_const"][idx]
            if isinstance(leaf, LTerms):
                nu, Wn = buckets[idx]
                wins = [slot_raw(leaf.lo + j, Wn) for j in range(nu)]

                def f(docs, dl, _wins=wins, _lo=leaf.lo):
                    m = jnp.zeros(docs.shape, jnp.bool_)
                    s = jnp.zeros(docs.shape, jnp.float32)
                    for j, (wd, wtf, wv) in enumerate(_wins):
                        hit, tf = W.member(wd, wv, wtf, docs)
                        m = m | hit
                        s = s + jnp.where(hit,
                                          transform(tf, dl, _lo + j), 0.0)
                    return m, s
                return f
            if isinstance(leaf, LTag):
                if leaf.ord in tag_code_ords:
                    # dense value-id column (single-valued TAG field):
                    # one code gather + compare per candidate instead of
                    # posting-window block membership (~100x less gather
                    # traffic at 64k-wide tag windows)
                    def f(docs, dl):
                        c = seg[f"tag{leaf.ord}_codes"][clampdoc(docs)]
                        qc = dyn[f"tag{leaf.ord}_qcodes"]
                        m = jnp.any(c[:, None] == qc[None, :], axis=1)
                        m = m & (docs != W.INVALID)
                        if leaf.field in fexp_attrs:
                            m = field_alive("tag", leaf.ord, docs, m)
                        return m, jnp.where(m, const, 0.0)
                    return f
                nu, Wn = buckets[idx]
                wins = []
                for j in range(nu):
                    wins.append(W.tag_window(
                        seg[f"tag{leaf.ord}_docs"],
                        dyn[f"tag{leaf.ord}_starts"][j],
                        dyn[f"tag{leaf.ord}_lens"][j], Wn))

                def f(docs, dl, _wins=wins):
                    m = jnp.zeros(docs.shape, jnp.bool_)
                    for wd, wv in _wins:
                        hit, _ = W.member(wd, wv, None, docs)
                        m = m | hit
                    if leaf.field in fexp_attrs:
                        m = field_alive("tag", leaf.ord, docs, m)
                    return m, jnp.where(m, const, 0.0)
                return f
            if isinstance(leaf, (LPhrase, LNone)):
                win = gen_leaf(leaf, idx)[:3]

                def f(docs, dl, _w=win):
                    hit, s = W.member(_w[0], _w[2], _w[1], docs)
                    return hit, s
                return f
            if isinstance(leaf, LNumeric):
                multi = buckets[idx][1]

                def f(docs, dl, _multi=multi):
                    cd = clampdoc(docs)
                    lo = dyn["num_lo"][leaf.ord]
                    hi = dyn["num_hi"][leaf.ord]
                    if _multi:
                        # any-value-in-range (JSON multi-value numerics)
                        v = seg[f"num{leaf.ord}_mv"][cd]      # [B, V]
                        p = seg[f"num{leaf.ord}_mp"][cd]
                        ge = v > lo if leaf.lo_excl else v >= lo
                        le = v < hi if leaf.hi_excl else v <= hi
                        m = jnp.any(p & ge & le, axis=-1)
                    else:
                        v = seg[f"num{leaf.ord}_v"][cd]
                        p = seg[f"num{leaf.ord}_p"][cd]
                        ge = v > lo if leaf.lo_excl else v >= lo
                        le = v < hi if leaf.hi_excl else v <= hi
                        m = p & ge & le
                    m = m & (docs != W.INVALID)
                    if leaf.field in fexp_attrs:
                        m = field_alive("num", leaf.ord, docs, m)
                    return m, jnp.where(m, const, 0.0)
                return f
            if isinstance(leaf, LGeo):
                def f(docs, dl):
                    cd = clampdoc(docs)
                    m = T.geo_radius_mask(
                        seg[f"geo{leaf.ord}_lon"][cd],
                        seg[f"geo{leaf.ord}_lat"][cd],
                        seg[f"geo{leaf.ord}_p"][cd]
                        if leaf.field not in fexp_attrs else
                        field_alive("geo", leaf.ord, docs,
                                    seg[f"geo{leaf.ord}_p"][cd]),
                        dyn["geo_lon"][leaf.ord],
                        dyn["geo_lat"][leaf.ord],
                        dyn["geo_rad"][leaf.ord])
                    m = m & (docs != W.INVALID)
                    return m, jnp.where(m, const, 0.0)
                return f
            if isinstance(leaf, LVecRange):
                (vmulti,) = buckets[idx]

                def f(docs, dl, _vm=vmulti):
                    cd = clampdoc(docs)
                    q = dyn[f"vblob{leaf.ord}"]
                    if _vm:
                        d = _multi_doc_dist(
                            seg[f"vec{leaf.ord}"],
                            seg[f"vec{leaf.ord}_sq"],
                            seg[f"vec{leaf.ord}_dr"], cd, q, leaf.metric)
                    else:
                        d = _metric_dist(
                            seg[f"vec{leaf.ord}"][cd].astype(jnp.float32),
                            seg[f"vec{leaf.ord}_sq"][cd], q, leaf.metric)
                    m = (seg[f"vec{leaf.ord}_p"][cd]
                         & (d <= dyn[f"vrad{leaf.ord}"])
                         & (docs != W.INVALID))
                    if leaf.field in fexp_attrs:
                        m = field_alive("vec", leaf.ord, docs, m)
                    return m, jnp.where(m, const, 0.0)
                return f
            if isinstance(leaf, LHostMask):
                def f(docs, dl):
                    m = dyn[f"hm{leaf.ord}"][clampdoc(docs)] \
                        & (docs != W.INVALID)
                    return m, jnp.where(m, const, 0.0)
                return f
            if isinstance(leaf, LMissing):
                # a field whose TTL lapsed counts as missing (reference:
                # expired fields behave like deleted fields for
                # ismissing(), field_expiration docs)
                def f(docs, dl):
                    cdk = clampdoc(docs)
                    m = ~seg[f"has_{leaf.field}"][cdk]
                    if f"has_{leaf.field}_fexp" in seg:
                        fe = seg[f"has_{leaf.field}_fexp"][cdk]
                        m = m | ((fe > 0) & (fe <= dyn["now"]))
                    m = m & (docs != W.INVALID)
                    return m, jnp.zeros(docs.shape, jnp.float32)
                return f
            if isinstance(leaf, LAll):
                def f(docs, dl):
                    m = docs != W.INVALID
                    return m, jnp.where(m, const, 0.0)
                return f
            raise AssertionError(leaf)

        # ---- recursive evaluation
        def eval_gen(t):
            tag = t[0]
            if tag == "leaf":
                return gen_leaf(t[1], t[2])
            if tag == "and":
                gens = [c for c in t[1] if can_gen(c)]
                pivot = min(gens, key=gen_bucket)
                docs, score, valid, dl = eval_gen(pivot)
                # the norm operand at pivot docs — the pivot's own sliced
                # doclens when available; a gather only as fallback
                needs_dl = any(_tree_has_terms(c) for c in t[1]
                               if c is not pivot)
                if dl is None:
                    dl = (normcol[clampdoc(docs)] if needs_dl
                          else jnp.zeros(docs.shape, jnp.float32))
                for c in t[1]:
                    if c is pivot:
                        continue
                    m, s = eval_pred(c)(docs, dl)
                    valid = valid & m
                    score = score + s
                return docs, jnp.where(valid, score, 0.0), valid, dl
            if tag in ("or", "dismax"):
                if tag == "or":
                    # flatten union-of-unions (e.g. each term leaf is a
                    # raw+stem slot union) into ONE merge: one sort over
                    # the combined windows instead of one per level.
                    # Sum-fold is associative so scores are identical;
                    # DISMAX is not (max over BRANCH sums), keep nesting.
                    wins = []
                    for c in t[1]:
                        wins.extend(gen_windows(c))
                else:
                    wins = [eval_gen(c) for c in t[1]]
                d, sc, v, dl = W.union_windows([w[:3] for w in wins],
                                               dismax=(tag == "dismax"),
                                               extra=[w[3] for w in wins])
                return d, sc, v, dl
            raise AssertionError(tag)

        def gen_windows(t):
            """Window list for a sum-fold union child, flattened."""
            if t[0] == "or":
                out = []
                for c in t[1]:
                    out.extend(gen_windows(c))
                return out
            if t[0] == "leaf" and isinstance(t[1], LTerms):
                nu, Wn = buckets[t[2]]
                return [slot_scored(t[1].lo + j, Wn) for j in range(nu)]
            return [eval_gen(t)]

        def eval_pred(t):
            tag = t[0]
            if tag == "leaf":
                return pred_leaf(t[1], t[2])
            if tag == "and":
                preds = [eval_pred(c) for c in t[1]]

                def f(docs, dl):
                    m = docs != W.INVALID
                    s = jnp.zeros(docs.shape, jnp.float32)
                    for p in preds:
                        mi, si = p(docs, dl)
                        m = m & mi
                        s = s + si
                    return m, jnp.where(m, s, 0.0)
                return f
            if tag in ("or", "dismax"):
                preds = [eval_pred(c) for c in t[1]]
                mx = tag == "dismax"

                def f(docs, dl):
                    m = jnp.zeros(docs.shape, jnp.bool_)
                    s = jnp.zeros(docs.shape, jnp.float32)
                    for p in preds:
                        mi, si = p(docs, dl)
                        m = m | mi
                        s = jnp.maximum(s, si) if mx else s + si
                    return m, s
                return f
            if tag == "not":
                child = eval_pred(t[1])

                def f(docs, dl):
                    mi, _ = child(docs, dl)
                    return ~mi & (docs != W.INVALID), \
                        jnp.zeros(docs.shape, jnp.float32)
                return f
            if tag == "opt":
                child = eval_pred(t[1])

                def f(docs, dl):
                    _, si = child(docs, dl)
                    return docs != W.INVALID, si
                return f
            raise AssertionError(tag)

        def slop_divide(sc, dcs):
            """Divide final TFIDF/legacy-BM25 scores by the match's
            proximity distance — the reference's GetSlop divisor
            (ext/default.c:131,226 → IndexResult_MinOffsetDelta,
            index_result.c:51): dist = sum of squared minimal offset
            deltas over consecutive offset-bearing root children; slop =
            floor(sqrt(dist)), or (num_children - 1) when dist == 0, or 1
            for non-aggregate results."""
            mode, childs = slop_info
            INF32 = jnp.int32(2**31 - 1)
            dlz = jnp.zeros(dcs.shape, jnp.float32)
            okeys = []
            for ci, ch in enumerate(childs):
                if ch[0] != "slots":
                    okeys.append(None)
                    continue
                parts = []
                for s_, Pj in zip(ch[1], slop_buckets[ci]):
                    kj, _ = T.gather_poskeys(
                        seg["poskeys"], seg["pos_offsets"],
                        dyn["tstarts"][s_], dyn["tlens"][s_], Pj)
                    parts.append(kj)
                okeys.append(parts[0] if len(parts) == 1
                             else jnp.sort(jnp.concatenate(parts)))
            oidx = [ci for ci, kk in enumerate(okeys) if kk is not None]
            m_off = len(oidx)
            if mode == "and":
                # intersection: every child matched every candidate
                num = jnp.full(dcs.shape, len(childs), jnp.int32)
                pres = {ci: None for ci in oidx}
                pairs = [(oidx[i], oidx[i + 1], None)
                         for i in range(m_off - 1)]
            else:
                # union: the result's children are the ones that matched
                # this doc; presence varies per candidate
                pres = {}
                num = jnp.zeros(dcs.shape, jnp.int32)
                for ci, ch in enumerate(childs):
                    if ch[0] == "pred" or ch[2] is not None:
                        sub = ch[1] if ch[0] == "pred" else ch[2]
                        pm, _ = eval_pred(sub)(dcs, dlz)
                    else:
                        # single term slot of an expanded-token union
                        s_ = ch[1][0]
                        Wn = buckets[tree[2]][1]
                        wd, _wtf, wv = slot_raw(s_, Wn)
                        pm, _ = W.member(wd, wv, None, dcs)
                    pres[ci] = pm
                    num = num + pm.astype(jnp.int32)
                pairs = []
                if m_off <= 4:
                    # exact consecutive-present pairing
                    for i in range(m_off):
                        for j in range(i + 1, m_off):
                            mk = pres[oidx[i]] & pres[oidx[j]]
                            for t_ in range(i + 1, j):
                                mk = mk & ~pres[oidx[t_]]
                            pairs.append((oidx[i], oidx[j], mk))
                else:
                    # wide unions: adjacent-present pairs only
                    pairs = [(oidx[i], oidx[i + 1],
                              pres[oidx[i]] & pres[oidx[i + 1]])
                             for i in range(m_off - 1)]
            dist = jnp.zeros(dcs.shape, jnp.int32)
            for ci, cj, mk in pairs:
                dd, _pa = T.min_offset_delta(okeys[ci], okeys[cj],
                                             pos_stride, dcs)
                ok = dd != INF32
                if mk is not None:
                    ok = ok & mk
                dist = dist + jnp.where(ok, dd * dd, 0)
            slop = jnp.where(
                num <= 1, 1,
                jnp.where(dist > 0,
                          jnp.floor(jnp.sqrt(dist.astype(jnp.float32)))
                          .astype(jnp.int32),
                          jnp.maximum(num - 1, 1)))
            return sc / jnp.maximum(slop, 1).astype(jnp.float32)

        # ---- root
        root_gen = can_gen(tree)
        root_is_iota = ((not root_gen)
                        or (tree[0] == "leaf"
                            and isinstance(tree[1], LAll)))
        if root_gen:
            docs, score, valid, _dl = eval_gen(tree)
            cd = clampdoc(docs)
            valid = valid & (docs != W.INVALID)
            # clean-segment fast path: skip per-candidate gathers
            if seg_dirty:
                valid = valid & seg["alive"][cd]
            if seg_ttl:
                exp = seg["expire_at"][cd]
                valid = valid & ((exp == 0) | (exp > dyn["now"]))
        else:
            docs, valid0 = W.iota_window(n_pad)
            # iota window: columns are doc-aligned, no gathers
            m, score = eval_pred(tree)(docs, normcol)
            valid = valid0 & m & seg["alive"]
            exp = seg["expire_at"]
            valid = valid & ((exp == 0) | (exp > dyn["now"]))
            cd = clampdoc(docs)
        if has_extra:
            valid = valid & dyn["extra_mask"][cd]

        if scorer == "DOCSCORE":
            score = seg["docscore"][cd]
        elif not seg_uniform_ds and scorer != "DISMAX":
            # DISMAX ignores the document score (DisMaxScorer)
            score = score * seg["docscore"][cd]
        if scorer == "BM25STD.TANH":
            score = jnp.tanh(score / opts.tanh_factor)
        if slop_info is not None:
            score = slop_divide(score, docs)
        score = jnp.where(valid, score, 0.0)

        count = jnp.sum(valid.astype(jnp.int32))
        out = {"count": count}
        Wc = docs.shape[0]
        k_eff = min(k, Wc)

        def knn_doc_dist(cd_):
            """Distance of each candidate doc to the query blob; for
            multi-value columns, min over the doc's vector rows (VecSim
            multi-value semantics: best vector wins)."""
            if knn_row:
                # batch-hoisted distances: the [B, N] matmul ran once
                # outside the per-query scan; gather this query's row
                return dyn["knn_row"][cd_]
            q = dyn["knn_blob"]
            if knn_multi:
                return _multi_doc_dist(seg["knn_vecs"], seg["knn_sq"],
                                       seg["knn_doc_rows"], cd_, q,
                                       knn_metric)
            return _metric_dist(seg["knn_vecs"][cd_], seg["knn_sq"][cd_],
                                q, knn_metric)

        def knn_ok(cd_=None):
            """Vector present AND not field-expired (HEXPIRE on the KNN
            field drops the doc from vector results at match time)."""
            p = (seg["knn_present"] if cd_ is None
                 else seg["knn_present"][cd_])
            if knn_has_fexp:
                fe = (seg["knn_fexp"] if cd_ is None
                      else seg["knn_fexp"][cd_])
                p = p & ~((fe > 0) & (fe <= dyn["now"]))
            return p

        if mode == "window":
            out["docs"] = docs
            out["valid"] = valid
            out["score"] = score
            if knn is not None:
                d = knn_doc_dist(cd)
                out["knn"] = jnp.where(valid & knn_ok(cd), d, 3.4e38)
            return out

        if knn is not None:
            q = dyn["knn_blob"]
            # mode selection (reference: hybrid BATCHES vs ADHOC_BF
            # heuristic, hybrid_reader.c): exact gather over small
            # candidate windows; dense BATCHES scan for wide filters;
            # IVF probe otherwise (when built)
            window_root = not root_is_iota
            # threshold measured on v5e (524k docs): masked approx_max_k
            # has a ~100 µs/query floor and scales mildly with M
            # (M=2048: 127 µs, M=8192: 260 µs) while the exact branch's
            # candidate gathers cost ~10 ns/element (32768-window: 332
            # µs for the distance gather alone) — BATCHES wins from
            # Wc >= 32768
            use_batches = (
                window_root and not knn_multi and not knn_ivf
                and knn_policy != "ADHOC_BF"
                and (knn_policy == "BATCHES" or Wc >= 32768))
            use_exact_gather = window_root and not use_batches and (
                knn_policy == "ADHOC_BF" or not knn_ivf
                or (knn_policy is None and Wc <= 16384))
            if use_exact_gather:
                d = knn_doc_dist(cd)
                dm = jnp.where(valid & knn_ok(cd), d, 3.4e38)
                vals, sel = T.fast_top_k(-dm, k_eff)
                out["idx"] = docs[sel]
                out["knn"] = -vals
                out["scores"] = score[sel]
            elif use_batches:
                # Wide filter: per-candidate gathers (d[cd],
                # knn_present[cd], docscore[cd]) cost ~7 ns/element of
                # random-gather traffic on TPU and dominate the query
                # (measured 3.6 ms per 524k-window gather).  Instead
                # take the best M docs from the batch-hoisted dense
                # distance row — every mask is doc-aligned, no gathers —
                # and predicate-check only those M.  Falls back to the
                # exact candidate gather when fewer than k survive the
                # filter and the scan didn't exhaust the live vectors
                # (the reference grows BATCHES iteratively;
                # hybrid_reader.c).
                # batched execution hoisted the [B, N] matmul; a single
                # query pays one [N, dim] x [dim] MXU matvec — far
                # cheaper than the per-candidate gathers either way
                if knn_topm:
                    # batched executor hoisted the [B, N] masked top-M
                    # out of the scan (one batched approx_max_k instead
                    # of B per-query ones — see _rows_executor)
                    negd, ids = dyn["knn_negd"], dyn["knn_ids"]
                else:
                    d_dense = (dyn["knn_row"] if knn_row else
                               V.distances_to(seg["knn_vecs"],
                                              seg["knn_sq"], q,
                                              knn_metric))
                    okd = knn_ok() & seg["alive"]
                    if seg_ttl:
                        expd = seg["expire_at"]
                        okd = okd & ((expd == 0) | (expd > dyn["now"]))
                    dmd = jnp.where(okd, d_dense, 3.4e38)
                    M = _knn_batch_M(k_eff, n_pad, Wc)
                    negd, ids = T.fast_top_k(-dmd, M)
                m_ids, s_ids = eval_pred(tree)(ids, normcol[ids])
                ok_ids = m_ids
                if has_extra:
                    ok_ids = ok_ids & dyn["extra_mask"][ids]
                if scorer == "DOCSCORE":
                    s_ids = seg["docscore"][ids]
                elif not seg_uniform_ds and scorer != "DISMAX":
                    s_ids = s_ids * seg["docscore"][ids]
                if scorer == "BM25STD.TANH":
                    s_ids = jnp.tanh(s_ids / opts.tanh_factor)
                if slop_info is not None:
                    s_ids = slop_divide(s_ids, ids)
                found = jnp.sum(ok_ids.astype(jnp.int32))
                exhausted = negd[-1] <= -3.3e38  # M covered all vectors

                def _batched(_):
                    dmm = jnp.where(ok_ids, -negd, 3.4e38)
                    vals, sel = T.fast_top_k(-dmm, k_eff)
                    return ids[sel], -vals, s_ids[sel]

                def _exact(_):
                    d = knn_doc_dist(cd)
                    dm = jnp.where(valid & knn_ok(cd), d, 3.4e38)
                    vals, sel = T.fast_top_k(-dm, k_eff)
                    return docs[sel], -vals, score[sel]

                if host_fallback:
                    # batched executors skip the in-graph exact branch:
                    # a lax.cond's branches can both execute under XLA,
                    # and the exact branch's window gather is the
                    # filtered-KNN cost cliff.  Underfilled queries are
                    # flagged and re-run host-side through execute()
                    # (_BatchHandle.result) — rare at sane selectivity.
                    idx_o, knn_o, sc_o = _batched(None)
                    # when the executor widened k to a rescore candidate
                    # set (knn_topm two-phase), underfill still compares
                    # against the caller's true k, not the widened one
                    k_need = knn_underfill_k or k_eff
                    out["underfill"] = jnp.where(
                        (found >= k_need) | exhausted,
                        jnp.int32(0), jnp.int32(1))
                else:
                    idx_o, knn_o, sc_o = jax.lax.cond(
                        (found >= k_eff) | exhausted, _batched, _exact,
                        None)
                out["idx"] = idx_o
                out["knn"] = knn_o
                out["scores"] = sc_o
            elif knn_ivf:
                from ..ops.ivf import ivf_probe_arrays
                # BATCHES analog: over-fetch probe candidates, then apply
                # the filter tree as a predicate on the probed doc ids
                # (hybrid_reader.c batch-grow, bounded to one batch here)
                kk = k_eff if root_is_iota else min(
                    max(8 * k_eff, 64), n_pad)
                dists, ids = ivf_probe_arrays(
                    seg["ivf_cent"], seg["ivf_csq"], seg["ivf_bv"],
                    seg["ivf_bsq"], seg["ivf_bi"], knn_metric,
                    q.astype(jnp.float32), kk, knn_nprobe)
                cid = jnp.clip(ids, 0, n_pad - 1)
                ok = (ids >= 0) & seg["alive"][cid]
                sc = jnp.zeros(ids.shape, jnp.float32)
                if root_is_iota:
                    ok = ok & valid[cid]
                    sc = score[cid]
                else:
                    dl_ids = normcol[cid]
                    m, si = eval_pred(tree)(cid, dl_ids)
                    ok = ok & m
                    sc = si
                dists = jnp.where(ok, dists, 3.4e38)
                vals2, sel2 = T.fast_top_k(-dists, k_eff)
                out["idx"] = cid[sel2]
                out["knn"] = -vals2
                out["scores"] = sc[sel2]
            else:
                if knn_row:
                    d = dyn["knn_row"]
                elif knn_multi:
                    # full scan: row distances once, then per-doc min via
                    # the doc_rows map (no [n, M, dim] blowup)
                    d_rows = V.distances_to(seg["knn_vecs"], seg["knn_sq"],
                                            q, knn_metric)
                    dr = seg["knn_doc_rows"]          # [n_pad, M]
                    dd = d_rows[jnp.clip(dr, 0, d_rows.shape[0] - 1)]
                    d = jnp.min(jnp.where(dr >= 0, dd, 3.4e38), axis=-1)
                else:
                    d = V.distances_to(seg["knn_vecs"], seg["knn_sq"], q,
                                       knn_metric)
                # window is the iota ordering here, so valid aligns by doc
                dm = jnp.where(valid & knn_ok(), d, 3.4e38)
                vals, sel = T.fast_top_k(-dm, k_eff)
                out["idx"] = sel
                out["knn"] = -vals
                out["scores"] = score[sel]
            # KNN count = number of yielded results (<= k), matching the
            # reference hybrid iterator which yields at most k docs
            # (hybrid_reader.c; FT.SEARCH KNN reply totals are k in
            # tests/pytests/test_vecsim.py execute_hybrid_query).  The
            # host layers clamp totals with min(total, k) either way.
            # Crucially this drops the window-wide `valid & knn_ok(cd)`
            # reduction whose knn_present[cd] gather (~3.6 ms per 524k
            # window) dominated wide-filter BATCHES queries — and lets
            # XLA DCE the whole window evaluation on that branch.
            out["count"] = jnp.sum(
                (out["knn"] < 3.3e38).astype(jnp.int32))
            return out

        if opts.sort_field:
            keys = seg["sort_v"][cd]
            # docs missing the sort value still match; they rank LAST in
            # either direction (reference: cmp_fields in
            # value/src/comparison.rs — a None sort key ranks "worst").
            # 3.0e38 keeps them distinguishable from the 3.4e38 invalid
            # filler that the result builders drop.
            worst = jnp.float32(3.0e38 if opts.sort_asc else -3.0e38)
            keys = jnp.where(seg["sort_p"][cd], keys, worst)
            keyvals, sel = T.topk_by_key(keys, valid, k_eff, opts.sort_asc)
            out["idx"] = docs[sel]
            out["scores"] = score[sel]
            out["sortkeys"] = keyvals
            return out

        neg = jnp.float32(-3.4e38)
        masked = jnp.where(valid, score, neg)
        vals, sel = T.fast_top_k(masked, k_eff)
        out["idx"] = docs[sel]
        out["scores"] = vals
        return out

    return jax.jit(run) if jit else run


def _tree_has_terms(t) -> bool:
    tag = t[0]
    if tag == "leaf":
        return isinstance(t[1], (LTerms, LPhrase))
    if tag in ("not", "opt"):
        return _tree_has_terms(t[1])
    return any(_tree_has_terms(c) for c in t[1])


# Scorers whose final score divides by the proximity "slop" of the match
# (reference: ext/default.c tfIdfInternal:131 and BM25Scorer:226 both call
# ctx->GetSlop = IndexResult_MinOffsetDelta; BM25STD/DISMAX do not).
_SLOP_SCORERS = ("TFIDF", "TFIDF.DOCNORM", "BM25")


def _tree_term_slots(t) -> tuple:
    """All term slots under a subtree, in query order (the offset sources
    of the subtree's index result — reference: an aggregate result's
    offset iterator merges its term children's offset vectors)."""
    tag = t[0]
    if tag == "leaf":
        if isinstance(t[1], LTerms):
            return tuple(range(t[1].lo, t[1].hi))
        if isinstance(t[1], LPhrase):
            return tuple(t[1].slots)
        return ()
    if tag in ("not",):
        return ()       # NOT children contribute no offsets to the match
    if tag == "opt":
        return _tree_term_slots(t[1])
    out: list[int] = []
    for c in t[1]:
        out.extend(_tree_term_slots(c))
    return tuple(out)


def _slop_root_children(tree):
    """Root-result children for the GetSlop divisor (reference:
    IndexResult_MinOffsetDelta walks the ROOT aggregate's children,
    src/index_result/index_result.c:51; ext/default.c:131,226).

    Returns None when the root is not an aggregate (slop = 1), else
    (mode, children): mode "and" = every child matched each candidate
    (intersection), "or" = presence varies per doc (union).  Each child is
    ("slots", slot_tuple, subtree_or_None) for offset-bearing children or
    ("pred", subtree) for children without offsets (numeric/tag/geo —
    counted in the child total, skipped for deltas)."""
    tag = tree[0]
    if tag == "leaf" and isinstance(tree[1], LPhrase):
        slots = tuple(tree[1].slots)
        if len(slots) < 2:
            return None
        return ("and", [("slots", (s,), None) for s in slots])
    if tag == "leaf" and isinstance(tree[1], LTerms):
        # a stem/synonym-expanded token lowers to one LTerms group, but the
        # reference models it as a UNION of term children
        slots = tuple(range(tree[1].lo, tree[1].hi))
        if len(slots) < 2:
            return None
        return ("or", [("slots", (s,), None) for s in slots])
    if tag in ("and", "or", "dismax"):
        kids = tree[1]
        if len(kids) < 2:
            return None
        children = []
        for c in kids:
            slots = _tree_term_slots(c)
            if slots:
                children.append(("slots", slots, c))
            else:
                children.append(("pred", c))
        return ("and" if tag == "and" else "or", children)
    return None


_BLOB_STORE_DTYPES = None


def decode_blob(raw, field) -> np.ndarray:
    """Decode a query vector param against the field's storage dtype
    (reference: blobs are raw arrays of the index's VecSimType).  Keeps
    int8/uint8 integer and bf16 as bf16 so the distance matmul runs on
    the MXU's low-precision paths; f16/f64 queries upcast to f32.

    An f32 ndarray of the right shape passes through WITHOUT a copy
    (serving hot path — the packed-row patch reads it immediately);
    callers must not mutate a passed blob before the batch submits."""
    vp = field.vector
    if (vp.dtype == "FLOAT32" and type(raw) is np.ndarray
            and raw.dtype == np.float32 and raw.ndim == 1
            and raw.shape[0] == vp.dim):
        return raw          # serving fast path: already decoded
    global _BLOB_STORE_DTYPES
    if _BLOB_STORE_DTYPES is None:
        import ml_dtypes
        _BLOB_STORE_DTYPES = {
            "INT8": np.int8, "UINT8": np.uint8,
            "FLOAT16": np.float16, "FLOAT64": np.float64,
            "BFLOAT16": ml_dtypes.bfloat16, "FLOAT32": np.float32}
    import ml_dtypes
    np_store = _BLOB_STORE_DTYPES[vp.dtype]
    if isinstance(raw, (bytes, bytearray)):
        arr = np.frombuffer(raw, dtype=np_store).copy()
    else:
        arr = np.asarray(raw)
    arr = arr.reshape(-1)
    if arr.shape[0] != vp.dim:
        raise QuerySyntaxError(
            f"query vector blob size mismatch for @{field.name}: got "
            f"{arr.shape[0]} values, want {vp.dim}")
    if vp.dtype in ("INT8", "UINT8"):
        if arr.dtype != np_store:
            lo, hi = (-128, 127) if vp.dtype == "INT8" else (0, 255)
            arr = np.clip(np.rint(arr.astype(np.float32)), lo,
                          hi).astype(np_store)
        return arr
    if vp.dtype == "BFLOAT16":
        return arr.astype(ml_dtypes.bfloat16)
    return arr.astype(np.float32, copy=False)


def _mxu_dots(rows, q):
    """<rows, q> on the MXU's native low-precision paths: int8xint8
    accumulates in int32, bf16xbf16 in f32; everything else runs f32."""
    if rows.dtype in (jnp.int8, jnp.uint8) and q.dtype == rows.dtype:
        return jnp.dot(rows, q,
                       preferred_element_type=jnp.int32).astype(jnp.float32)
    if rows.dtype == jnp.bfloat16:
        return jnp.dot(rows, q.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    # full f32 for f32 storage (DEFAULT = one-pass bf16 on TPU, which
    # diverges from ops/vector.py's exact distances — see _scores)
    return jnp.dot(rows.astype(jnp.float32), q.astype(jnp.float32),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _multi_doc_dist(vec_rows, sq_rows, doc_rows, cd, q, metric):
    """Per-doc best distance over each doc's vector rows (multi-value
    columns; reference: VecSim multi-value scoring takes the best
    vector).  cd: [B] doc ids -> [B] min distance."""
    rid = doc_rows[cd]                                    # [B, M]
    ok = rid >= 0
    r = jnp.clip(rid, 0, vec_rows.shape[0] - 1)
    d = _metric_dist(vec_rows[r], sq_rows[r], q, metric)  # [B, M]
    return jnp.min(jnp.where(ok, d, 3.4e38), axis=-1)


def _metric_dist(rows, sq, q, metric):
    dots = _mxu_dots(rows, q)
    qf = q.astype(jnp.float32)
    if metric == "L2":
        return sq - 2.0 * dots + jnp.sum(qf * qf)
    if metric == "IP":
        return 1.0 - dots
    return 1.0 - dots / jnp.maximum(jnp.sqrt(jnp.maximum(sq, 1e-30))
                                    * jnp.linalg.norm(qf), 1e-30)


def _phrase_chain_pivot(poskeys, pos_offsets, starts, lens, pos_stride,
                        slop, inorder, Pc, Pm, pivot_j, bigs=None,
                        big_rounds=None, n_chunks=1, n_pad=None):
    """Proximity check anchored at the rarest member term (the reference's
    intersection orders children by cardinality; same idea for offsets).

    Candidates are the pivot term's position keys (window Pc — small);
    every other term is probed by block_searchsorted into its keys
    (window Pm).  Semantics mirror the reference exactly
    (index_result/src/core/proximity.rs):

    - in-order (within_range_in_order): positions ascend in query order
      (equal allowed — overlapping synonym positions) and the CUMULATIVE
      signed span  sum(pos_i - pos_{i-1} - 1)  must be <= slop.  Greedy
      nearest-neighbor from a fixed pivot position minimizes both the
      forward and backward partial spans independently, and all pivot
      positions are tried, so the windowed chain is exact.
    - unordered (within_range_unordered): some choice of one position
      per term must fit a token window of length n+slop containing the
      pivot (span = max-min-(n-1) <= slop, any order), with min != max
      (two terms may not both sit on the single same token).  Checked by
      sliding the window across every offset that covers the pivot.

    Exact phrases lower to slop=0 + in-order.  Returns (candidate keys,
    alive mask) — keys of the PIVOT term — or, when the pivot term's
    positions overflow POS_SLICE_PAD (`n_chunks` > 1), a dense
    bool[n_pad] doc-match accumulator built by scanning the pivot's
    position run chunk by chunk (no silent truncation).

    Member terms whose positions overflow the Pm window (`bigs[j]`) are
    probed by dynamic-bounds binary search directly into the poskeys CSR
    (ops/text.py searchsorted_dynamic) instead of a truncated window —
    exact at any term frequency, at log-round gather cost on the
    degenerate ultra-common-term path only."""
    Tn = starts.shape[0]
    INF = 2**31 - 1
    if bigs is None:
        bigs = (False,) * Tn

    # hoisted member windows (small terms) / dynamic-probe closures
    member_keys: dict[int, Any] = {}
    for j in range(Tn):
        if j != pivot_j and not bigs[j]:
            member_keys[j] = T.gather_poskeys(
                poskeys, pos_offsets, starts[j], lens[j], Pm)[0]

    def probe_ge(j, q):
        """Smallest position key of term j that is >= q (INF if none)."""
        if not bigs[j]:
            keys_j = member_keys[j]
            idx = W.block_searchsorted(keys_j, q, side="left")
            return keys_j[jnp.clip(idx, 0, Pm - 1)]
        lo = pos_offsets[starts[j]]
        hi = pos_offsets[starts[j] + lens[j]]
        idx = T.searchsorted_dynamic(
            poskeys, q, lo, hi,
            rounds=big_rounds[j] if big_rounds else None)
        v = poskeys[jnp.minimum(idx, poskeys.shape[0] - 1)]
        return jnp.where(idx < hi, v, INF)

    def chain(cand):
        alive_c = cand != INF
        doc = cand // pos_stride

        if inorder:
            # anchor on TERM 0 (not the rarest term): the reference's
            # within_range_in_order walks children in QUERY order and
            # rejects as soon as the RUNNING span exceeds the budget — a
            # later overlapping term (negative gap) cannot redeem an
            # earlier overflow, so prefix sums must be checked per step.
            # Greedy smallest-position->=last per child is exactly the
            # reference's monotonic advance for each candidate start.
            # (bind sizes Pc for slot 0 when the leaf is in-order.)
            span = jnp.zeros(cand.shape, jnp.int32)
            anchor = cand
            ok = alive_c
            for j in range(1, Tn):
                found = probe_ge(j, anchor)
                ok = (ok & (found >= anchor) & (found != INF)
                      & ((found // pos_stride) == doc))
                span = jnp.where(ok, span + (found - anchor - 1), span)
                # running check: only a POSITIVE span can exceed budget
                ok = ok & (span <= max(slop, 0))
                anchor = jnp.where(ok, found, anchor)
            return ok

        # unordered: slide a window of n+slop tokens across the pivot.
        # Beyond a 64-token window fall back to the widest offset only
        # (approximation for huge slop).
        Wl = Tn + slop
        match = jnp.zeros(cand.shape, jnp.bool_)
        offsets = range(Wl) if Wl <= 64 else [0, Wl - 1]
        for o in offsets:
            lo_t = cand - o
            hi_t = lo_t + Wl - 1
            ok_o = alive_c
            sel_min, sel_max = cand, cand
            for j in range(Tn):
                if j == pivot_j:
                    continue
                found = probe_ge(j, lo_t)
                ok_o = (ok_o & (found >= lo_t) & (found <= hi_t)
                        & ((found // pos_stride) == doc))
                sel_min = jnp.minimum(sel_min, found)
                sel_max = jnp.maximum(sel_max, found)
            match = match | (ok_o & (sel_max != sel_min))
        return match

    if n_chunks <= 1:
        cand, _ = T.gather_poskeys(poskeys, pos_offsets, starts[pivot_j],
                                   lens[pivot_j], Pc)
        return cand, chain(cand)

    # pivot overflow: scan the pivot's position run in Pc-sized chunks,
    # accumulating matched docs densely.  poskeys carries a
    # POS_SLICE_PAD tail pad (index/builder.py) so chunk slices never
    # clamp.  The scatter per chunk is the degenerate-path price of
    # exactness on ultra-common pivot terms.
    kstart = pos_offsets[starts[pivot_j]]
    klen_total = pos_offsets[starts[pivot_j] + lens[pivot_j]] - kstart
    acc = jnp.zeros((n_pad,), jnp.bool_)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Pc, 1), 0).squeeze(-1)
    for c in range(n_chunks):
        off = kstart + c * Pc
        rem = klen_total - c * Pc
        keys = jax.lax.dynamic_slice(poskeys, (off,), (Pc,))
        cand = jnp.where(lane < rem, keys, INF)
        m = chain(cand) & (cand != INF)
        d = jnp.minimum(cand // pos_stride, n_pad - 1)
        acc = acc.at[d].max(m)
    return None, acc
