"""SearchIndex: the per-index facade tying schema, doc table, builder,
sealed segments, synonyms and the query engine together.

Reference analog: IndexSpec + the command-level glue (src/spec.c,
src/module.c FT.SEARCH path).  Differences by design:
  * documents live *in* the index (this framework owns storage; the
    reference follows an external Redis keyspace);
  * writes stage into a host-side builder and become searchable on
    `commit()` (called automatically by `search()`), sealing an immutable
    device segment — the LSM model replacing in-place mutation;
  * deletes flip a bitmap; `compact()` rebuilds segments dropping dead docs
    (replacing fork-GC).
"""

from __future__ import annotations

import copy
import threading
import time
from typing import Any, Iterable, Optional

import numpy as np

from ..analysis.stopwords import StopWordList
from ..analysis.synonyms import SynonymMap
from ..query import ast
from ..query.engine import CompiledQuery, QueryOptions, execute
from ..query.engine import compile_seconds as engine_compile_seconds
from ..query.parser import QueryParser
from ..schema import FieldType, Schema
from ..utils import log as _log
from ..utils.errors import (DocumentNotFound, IndexError_,
                            TimeoutError_)
from .builder import SegmentBuilder
from .doctable import DocMeta, DocTable
from .segment import Segment


class Hit:
    """One search result row."""

    __slots__ = ("key", "score", "fields", "sortkey", "vector_distance",
                 "gid", "payload")

    def __init__(self, key, score, fields=None, sortkey=None,
                 vector_distance=None, gid=0, payload=None):
        self.key = key
        self.score = score
        self.fields = fields
        self.sortkey = sortkey
        self.vector_distance = vector_distance
        self.gid = gid
        self.payload = payload

    def __repr__(self):
        return (f"Hit({self.key!r}, score={self.score:.4f}"
                + (f", sortkey={self.sortkey!r}" if self.sortkey is not None
                   else "")
                + (f", dist={self.vector_distance:.4f}"
                   if self.vector_distance is not None else "") + ")")


class SearchResult:
    def __init__(self, total: int, hits: list[Hit], query_ast=None):
        self.total = total
        self.hits = hits
        self.query_ast = query_ast
        self.warnings: list[str] = []

    def __iter__(self):
        return iter(self.hits)

    def __len__(self):
        return len(self.hits)


class SearchIndex:
    def __init__(self, schema: Schema):
        self.schema = schema
        self.doctable = DocTable()
        self.stopwords = StopWordList(schema.stopwords)
        self.synonyms = SynonymMap()
        self.segments: list[Segment] = []
        self._builder = SegmentBuilder(schema, self.stopwords, self.synonyms)
        self.created_at = time.time()
        # stats (reference: FT.INFO counters + Index Errors section,
        # src/info/index_error.c)
        self.stats = {"indexing_errors": 0, "queries": 0}
        # dialect usage bitset (reference: global_stats.h:30-34 +
        # per-index dialect_stats in FT.INFO)
        self.dialect_stats = {1: 0, 2: 0, 3: 0, 4: 0}
        self.index_errors = {"count": 0, "last_error": None,
                             "last_error_key": None, "by_field": {}}
        # query timeout/OOM behavior (reference: ON_TIMEOUT/ON_OOM configs)
        self.timeout_ms = 0          # 0 = unlimited
        self.on_timeout = "return"   # return | fail | return_strict
        self.on_oom = "ignore"       # ignore | return | fail
        self._prepared: dict = {}    # prepared-query cache (see prepare())
        # one-shot fault-injection hooks (reference: _FT.DEBUG query
        # wrapping with TIMEOUT_AFTER_N/CRASH/PAUSE debug params,
        # src/aggregate/aggregate_debug.c + debug RPs)
        self._debug_hooks: Optional[dict] = None
        # RLock: compact() re-enters commit() (commit -> maybe_compact ->
        # compact -> commit)
        self._commit_lock = threading.RLock()
        # background initial scan progress (reference: indexes_scanner.c
        # scannedDocs/totalDocs surfaced in FT.INFO as indexing +
        # percent_indexed; OOM aborts the scan with frozen progress)
        self.scan_state: Optional[dict] = None

    def wait_scan(self, timeout: float = 30.0) -> bool:
        """Block until a background initial scan finishes (True) or the
        timeout lapses (False).  No-op when the scan was synchronous."""
        deadline = time.perf_counter() + timeout
        while self.scan_state and self.scan_state.get("running"):
            if time.perf_counter() > deadline:
                return False
            time.sleep(0.005)
        return True

    # -- write path ---------------------------------------------------------
    def add_document(self, key: str, fields: dict[str, Any],
                     score: float = 1.0, payload: Optional[bytes] = None,
                     ttl: Optional[float] = None,
                     field_expiration: Optional[dict] = None,
                     language: Optional[str] = None) -> None:
        """HSET-equivalent: (re)index a document.  `field_expiration`
        maps field attr -> absolute epoch seconds (HEXPIRE analog); set
        before staging so the sealed segment carries the TTL columns.
        `language` overrides the per-doc analysis language (FT.ADD
        LANGUAGE, reference src/document_add.c:86)."""
        if self.schema.score_field and self.schema.score_field in fields:
            try:
                score = float(fields[self.schema.score_field])
            except (TypeError, ValueError):
                pass
        meta, old = self.doctable.put(key, fields, score=score,
                                      payload=payload)
        if language is not None:
            meta.language = language
        if ttl is not None:
            meta.expires_at = time.time() + ttl
        if field_expiration is not None:
            meta.field_expiration = dict(field_expiration)
        elif old is not None and old.field_expiration:
            meta.field_expiration = dict(old.field_expiration)
        if old is not None:
            self._mark_deleted(old.gid)
        try:
            self._builder.add(meta)
        except Exception as e:
            # reference behavior: the document is dropped, the error is
            # recorded per-field, and indexing continues (index_error.c)
            self.doctable.delete(key)
            self.stats["indexing_errors"] += 1
            self.index_errors["count"] += 1
            self.index_errors["last_error"] = str(e)
            self.index_errors["last_error_key"] = key
            self.index_errors["last_error_key_obfuscated"] = (
                _log.obfuscate_document(meta.gid))
            _log.logger.warning(
                "indexing failed for %s in %s: %s",
                _log.fmt_doc(key, meta.gid),
                _log.fmt_index(self.schema.name),
                _log.fmt_text(str(e)))
            field = getattr(e, "field", None) or "_"
            self.index_errors["by_field"][field] = (
                self.index_errors["by_field"].get(field, 0) + 1)
            # the builder may hold partial state for this doc; rebuild it
            self._rebuild_builder()
            return
        self.doctable.set_doclen(meta.gid, meta.doclen, meta.max_freq)

    def set_debug_hooks(self, timeout_after_n: Optional[int] = None,
                        crash: bool = False, pause_ms: float = 0) -> None:
        """Arm one-shot fault injection for the next query (reference:
        _FT.DEBUG FT.SEARCH ... DEBUG_PARAMS_COUNT n TIMEOUT_AFTER_N k /
        CRASH / PAUSE, aggregate_debug.c)."""
        self._debug_hooks = {"timeout_after_n": timeout_after_n,
                             "crash": crash, "pause_ms": pause_ms}

    def take_debug_hooks(self) -> Optional[dict]:
        dbg = self._debug_hooks
        self._debug_hooks = None
        if dbg is None:
            return None
        if dbg.get("crash"):
            raise RuntimeError("Debug crash injected (RP_CRASH analog)")
        if dbg.get("pause_ms"):
            time.sleep(float(dbg["pause_ms"]) / 1e3)
        return dbg

    def _rebuild_builder(self):
        keep = [g for g in self._builder._gids
                if (m := self.doctable.get(g)) is not None
                and not m.deleted]
        b = SegmentBuilder(self.schema, self.stopwords, self.synonyms)
        for g in keep:
            b.add(self.doctable.get(g))
        self._builder = b

    def add_documents(self, docs, commit: bool = True) -> int:
        """Bulk ingest via the native tokenizer (index/bulk.py); falls back
        to the incremental path when native features don't cover the
        schema.  docs: iterable of (key, fields)."""
        from .bulk import bulk_add
        n = bulk_add(self, docs, commit=commit)
        if self.segments:
            self._build_ann(self.segments[-1])
        return n

    def delete_document(self, key: str) -> bool:
        meta = self.doctable.delete(key)
        if meta is None:
            return False
        self._mark_deleted(meta.gid)
        return True

    def _mark_deleted(self, gid: int) -> None:
        for seg in self.segments:
            if seg.mark_deleted(gid):
                return
        # doc still in the builder: rebuild staging without it (rare path —
        # delete-before-commit); simplest correct handling is a re-stage.
        keep = [g for g in self._builder._gids if g != gid]
        if len(keep) != len(self._builder._gids):
            docs = [self.doctable.get(g) for g in keep]
            self._builder = SegmentBuilder(self.schema, self.stopwords,
                                           self.synonyms)
            for m in docs:
                if m is not None:
                    self._builder.add(m)

    def commit(self) -> None:
        """Seal pending docs into a new immutable segment.

        Thread-safe: concurrent readers may race to trigger the lazy seal
        (reference analog: the spec rwlock serializing index writes,
        docs/design/sound_iterator_revalidation.md) — a mutex makes the
        seal happen exactly once; segments themselves are immutable so
        readers never need revalidation."""
        with self._commit_lock:
            if len(self._builder) == 0:
                return
            seg = self._builder.seal()
            if seg is not None:
                self.segments.append(seg)
                self._build_ann(seg)
            self._builder = SegmentBuilder(self.schema, self.stopwords,
                                           self.synonyms)
            self.maybe_compact()

    def _build_ann(self, seg: Segment) -> None:
        """Build partitioned (IVF) ANN structures for qualifying vector
        fields.  Small segments stay brute-force FLAT — the tiered
        front-buffer semantics of the reference's TIERED index
        (src/vector_index.c:89): fresh writes are exact, large sealed
        segments get the ANN structure."""
        from ..schema import VectorAlgo
        from ..ops.ivf import HostIVF, IVFIndex
        for f in self.schema.fields_of(FieldType.VECTOR):
            vp = f.vector
            col = seg.vectors.get(f.attribute)
            if col is not None and col.host:
                # host tier has no device FLAT fallback: the bucket slabs
                # ARE the only query structure, so build unconditionally
                if col.host_ivf is None:
                    if col.compression:
                        col.host_ivf = HostIVF.build_lvq(
                            col.vecs, col.vq_off, col.vq_scl,
                            np.asarray(col.present), vp.metric.value,
                            nlist=vp.nlist)
                    else:
                        col.host_ivf = HostIVF.build(
                            col.vecs, np.asarray(col.present),
                            vp.metric.value, nlist=vp.nlist)
                continue
            if vp.algo == VectorAlgo.FLAT:
                continue
            if col is None or col.ivf is not None or col.multi:
                continue  # multi-value columns stay on the exact scan
            n_present = int(np.asarray(col.present).sum())
            if n_present < max(vp.flat_buffer_limit, 64):
                continue
            col.ivf = IVFIndex.build(
                np.asarray(col.vecs, np.float32),
                np.asarray(col.present), vp.metric.value,
                nlist=vp.nlist)

    def maybe_compact(self, dead_ratio: float = 0.25) -> None:
        """GC-policy analog (reference: fork-GC cycles): rebuild once the
        deleted fraction crosses `dead_ratio` — restores the clean-segment
        fast paths (see segment flags) and reclaims memory."""
        if not self.segments:
            return
        dead = sum(s.n_deleted for s in self.segments)
        live = max(self.doctable.num_docs, 1)
        if dead / (dead + live) >= dead_ratio:
            self.compact()

    def compact(self, reanalyze: bool = False) -> None:
        """Rebuild all segments dropping deleted docs (replaces fork-GC).

        reanalyze=True forces the full tokenize path (needed when the
        analysis chain changed, e.g. after FT.SYNUPDATE); otherwise a
        single sealed segment compacts by slicing its CSR arrays
        (index/slice.py) with no re-tokenization."""
        self.commit()
        if not reanalyze and len(self.segments) == 1:
            # fast path: compaction is a doc-subset slice of the CSR
            # arrays — no re-tokenization (index/slice.py)
            from .slice import live_locals, slice_segment
            src = self.segments[0]
            live = live_locals(src, self.doctable)
            if live.size == 0:
                self.segments = []
                return
            if live.size == src.num_alive == src.n_docs:
                return   # nothing to drop
            self.segments = [slice_segment(src, live)]
            # the slice carries host-tier structures itself; device IVF
            # must be rebuilt (it indexes pre-slice local ids)
            self._build_ann(self.segments[0])
            return
        builder = SegmentBuilder(self.schema, self.stopwords, self.synonyms)
        for seg in self.segments:
            alive = np.asarray(seg.alive)
            gids = seg.gids_host
            for i in range(seg.n_docs):
                if alive[i]:
                    meta = self.doctable.get(int(gids[i]))
                    if meta is not None and not meta.deleted:
                        builder.add(meta)
        self.segments = []
        seg = builder.seal()
        if seg is not None:
            self.segments.append(seg)
            self._build_ann(seg)

    # -- read path ----------------------------------------------------------
    def parse_query(self, query: str, params=None,
                    dialect: int = 2, nostopwords: bool = False) -> ast.Node:
        root = QueryParser(
            params=params,
            stopwords=StopWordList([]) if nostopwords else self.stopwords,
            dialect=dialect).parse(query)
        if dialect == 1:
            root = self._d1_resolve_fields(root)
        return root

    def _d1_resolve_fields(self, node: ast.Node) -> ast.Node:
        """Dialect-1 legacy: unknown fields match nothing instead of
        erroring (reference v1 grammar actions drop such nodes —
        src/query_parser/v1/parser.y tag/numeric/geo rules; unknown text
        modifiers get field bit 0 = @NULL)."""
        from ..schema import FieldType
        direct = getattr(node, "field", None)
        if direct is not None and isinstance(direct, str):
            if self.schema.try_field(direct) is None:
                return ast.EmptyNode()
        if node.fieldmask_attrs:
            known = [a for a in node.fieldmask_attrs
                     if (f := self.schema.try_field(a)) is not None
                     and f.type == FieldType.TEXT]
            if not known:
                return ast.EmptyNode()
            node.fieldmask_attrs = known
        for c in list(node.children()):
            resolved = self._d1_resolve_fields(c)
            if resolved is not c:
                from ..query.parser import _replace_child
                _replace_child(node, c, resolved)
        return node

    def compile(self, root: ast.Node, opts: QueryOptions) -> CompiledQuery:
        cq = CompiledQuery(self.schema, root, opts, synonyms=self.synonyms)
        cq.root = root  # kept for highlighting / EXPLAIN of results
        cq.global_N = max(self.doctable.num_docs, 1)
        cq.global_avgdl = self.doctable.avg_doclen or 1.0
        return cq

    def prepare(self, query: str, params: Optional[dict], opts: QueryOptions,
                dialect: int = 2) -> CompiledQuery:
        """Prepared-query cache: parse+lower once per (query string,
        scalar params, options); vector $params rebind on every hit —
        the hot path for serving (same KNN query, fresh embedding each
        call).  The reference's analog is its parsed-AST reuse; here the
        win is bigger because lowering also allocates slot tables."""
        scalar_items = []
        vec_params = {}
        for k, v in (params or {}).items():
            if isinstance(v, (bytes, np.ndarray)):
                vec_params[k] = v
            elif isinstance(v, (list, tuple)):
                # list params (vectors-as-lists, id lists) are baked into
                # the AST at parse time — their VALUES must key the cache
                vec_params[k] = v
                scalar_items.append((k, repr(v)))
            else:
                scalar_items.append((k, str(v)))
        key = (query, tuple(sorted(scalar_items)),
               tuple(sorted(vec_params)), dialect,
               opts.scorer, opts.sort_field, opts.sort_asc, opts.slop,
               opts.inorder, opts.verbatim, opts.language,
               opts.max_expansions, opts.expander, opts.in_fields,
               opts.tanh_factor, opts.nostopwords,
               self.doctable.num_docs)  # stats change -> new idf
        cq = self._prepared.get(key)
        if cq is None:
            root = self.parse_query(query, params, dialect,
                                    nostopwords=opts.nostopwords)
            cq = self.compile(root, opts)
            # a cleared cache costs ~0.5 ms/query of host parse+lower —
            # at serving batch sizes a small cap thrashes as soon as the
            # live query-string set beats it (measured: a 16-tag x 500-
            # term mix at cap 2048 dropped batched QPS 10x).  Entries are
            # a few KB; 32k caps worst-case growth at ~100s of MB.
            if len(self._prepared) >= 32768:
                self._prepared.clear()
            self._prepared[key] = cq
        # Serving fast path: a text query with no per-call vector
        # payloads and identical options needs no view at all — nothing
        # downstream mutates a CompiledQuery or its opts (the engine's
        # _filter_only copies first), so the cached object is returned
        # as-is.  Saves ~4 us/query of clone work on the hot loop.
        if not vec_params and cq.knn is None and cq.opts == opts:
            return cq
        # Return a per-call VIEW owning the mutable bits (opts, KNN node,
        # vector blobs) over the shared compiled structure + row/bind
        # caches.  Mutating the cached object in place would alias every
        # outstanding reference — a batch of the same KNN query string
        # with a different $vec per row must not collapse to the last
        # blob (reference analog: each AREQ owns its parsed params).
        # Hand-rolled clones: copy.copy's __reduce_ex__ path costs ~10 us
        # per object, and serving calls prepare() per query per batch.
        view = CompiledQuery.__new__(CompiledQuery)
        view.__dict__.update(cq.__dict__)
        vo = QueryOptions.__new__(QueryOptions)
        vo.__dict__.update(cq.opts.__dict__)
        view.opts = vo
        view.vec_blobs = list(cq.vec_blobs)
        if cq.knn is not None:
            # same hand-rolled clone as above: copy.copy's __reduce_ex__
            # path costs ~9 us/object on the KNN serving hot loop
            kn = cq.knn.__class__.__new__(cq.knn.__class__)
            kn.__dict__.update(cq.knn.__dict__)
            view.knn = kn
        if vec_params:
            from ..query.engine import decode_blob
            from ..query.parser import _coerce_vector
            if view.knn is not None and view.knn.blob_param in vec_params:
                view.knn.blob = _coerce_vector(
                    vec_params[view.knn.blob_param])
            for i, pname in enumerate(view.vec_blob_params):
                if pname in vec_params:
                    view.vec_blobs[i] = decode_blob(
                        _coerce_vector(vec_params[pname]),
                        view.vec_blob_fields[i])
        view.opts.k = opts.k
        view.opts.now = opts.now
        return view

    def search(
        self,
        query: str,
        params: Optional[dict] = None,
        offset: int = 0,
        num: int = 10,
        scorer: str = "BM25STD",
        sort_by: Optional[str] = None,
        sort_asc: bool = True,
        slop: int = -1,
        inorder: bool = False,
        verbatim: bool = False,
        language: Optional[str] = None,
        no_content: bool = False,
        return_fields: Optional[Iterable[str]] = None,
        dialect: int = 2,
        max_expansions: Optional[int] = None,
        payload: Optional[bytes] = None,
        in_keys: Optional[Iterable[str]] = None,
        in_fields: Optional[Iterable[str]] = None,
        tanh_factor: float = 4.0,
        expander: str = "",
        nostopwords: bool = False,
    ) -> SearchResult:
        """FT.SEARCH analog.  in_keys/in_fields mirror INKEYS/INFIELDS;
        expander/nostopwords mirror the per-query EXPANDER/NOSTOPWORDS
        search options (reference: RSSearchOptions inkeys/fieldmask/
        expanderName/Search_NoStopwrods, aggregate_request.c)."""
        self.commit()
        self.stats["queries"] += 1
        oom = self._check_oom()
        if oom is not None:
            return oom
        root = None
        if scorer == "HAMMING":
            root = self.parse_query(query, params, dialect)
            return self._search_hamming(root, payload, offset, num,
                                        no_content, return_fields)
        from .. import ext as _ext
        if _ext.is_custom_scorer(scorer):
            root = self.parse_query(query, params, dialect)
            return self._search_custom_scorer(
                root, _ext.get_scorer(scorer), offset, num, no_content,
                return_fields)
        opts = QueryOptions(
            scorer=scorer, k=offset + num, sort_field=sort_by,
            sort_asc=sort_asc, slop=slop, inorder=inorder,
            verbatim=verbatim, now=int(time.time()),
            language=language or self.schema.language,
            in_fields=tuple(in_fields) if in_fields else None,
            tanh_factor=tanh_factor,
            expander=expander, nostopwords=nostopwords,
        )
        if max_expansions:
            opts.max_expansions = max_expansions
        cq = self.prepare(query, params, opts, dialect)
        root = cq.root
        k = max(offset + num, 1)

        deadline = (time.perf_counter() + self.timeout_ms / 1e3
                    if self.timeout_ms else None)
        dbg = self.take_debug_hooks()
        dbg_n = dbg.get("timeout_after_n") if dbg else None
        warnings: list[str] = []
        merged: list[tuple] = []   # (rank_key, seg_i, Hit-ish tuple)
        total = 0
        inkey_gids = None
        if in_keys is not None:
            # INKEYS: restrict to the given document keys (reference
            # lowers this to an id-list intersection; here it fuses into
            # the query as an extra doc mask)
            metas = (self.doctable.get_by_key(k2) for k2 in in_keys)
            inkey_gids = np.array(sorted(m.gid for m in metas
                                         if m is not None and not m.deleted),
                                  np.int64)
        for seg in self.segments:
            if deadline is not None and time.perf_counter() > deadline:
                # reference ON_TIMEOUT policies (config.h TimeoutPolicy)
                if self.on_timeout == "fail":
                    raise TimeoutError_("Timeout limit was reached")
                if self.on_timeout == "return_strict" and not merged:
                    raise TimeoutError_("Timeout limit was reached")
                warnings.append("Timeout limit was reached")
                break
            comp0 = engine_compile_seconds()
            emask = (np.isin(seg.gids_host, inkey_gids)
                     if inkey_gids is not None else None)
            res = execute(cq, seg, k, extra_mask=emask)
            for w in res.warnings:
                if w not in warnings:
                    warnings.append(w)
            if deadline is not None:
                # a first-use executor compile is amortized setup, not
                # query work: it must not burn the timeout budget
                deadline += engine_compile_seconds() - comp0
            total += res.count
            gids = seg.gids_host
            n_valid = min(k, res.local_idx.shape[0])
            for j in range(n_valid):
                li = int(res.local_idx[j])
                sc = float(res.scores[j])
                if cq.knn is not None:
                    dist = float(res.knn_dists[j])
                    if dist >= 3.3e38:
                        continue
                    rank = dist
                elif sort_by is not None:
                    kv = float(res.sortkeys[j])
                    if abs(kv) >= 3.3e38:
                        continue
                    if abs(kv) >= 2.9e38:
                        # missing-sort-value sentinel: the doc matches but
                        # ranks last in either direction (reference:
                        # cmp_fields, value/src/comparison.rs)
                        rank = (1, 0.0)
                    else:
                        # string sort keys are per-segment dictionary
                        # ranks — incomparable across segments; rank on
                        # the resolved string instead (the reference
                        # merges WITHSORTKEYS values the same way,
                        # module.c:2453)
                        resolved = self._resolve_sortkey(seg, sort_by, kv)
                        if isinstance(resolved, str):
                            rank = (0, resolved if sort_asc
                                    else tuple(-ord(c) for c in resolved))
                        else:
                            rank = (0, kv if sort_asc else -kv)
                else:
                    if sc <= -3.3e38:
                        continue
                    rank = -sc
                merged.append((rank, int(gids[li]), sc,
                               float(res.knn_dists[j])
                               if res.knn_dists is not None else None,
                               float(res.sortkeys[j])
                               if res.sortkeys is not None else None,
                               seg))
            if dbg_n is not None and len(merged) >= dbg_n:
                # injected timeout (TIMEOUT_AFTER_N): apply ON_TIMEOUT
                merged = merged[:dbg_n]
                if self.on_timeout == "fail":
                    raise TimeoutError_("Timeout limit was reached")
                warnings.append("Timeout limit was reached")
                break
        merged.sort(key=lambda x: (x[0], x[1]))
        if cq.knn is not None:
            merged = merged[:cq.knn.k]  # KNN returns at most k results
        hits = []
        for rank, gid, sc, dist, skey, seg in merged[offset:offset + num]:
            meta = self.doctable.get(gid)
            if meta is None or meta.deleted:
                continue
            fields = None
            if not no_content:
                if return_fields:
                    fields = {f: meta.fields.get(f) for f in return_fields
                              if f in meta.fields}
                else:
                    fields = dict(meta.fields)
            sortkey = None
            if (skey is not None and sort_by is not None
                    and abs(skey) < 2.9e38):   # missing-value sentinel
                sortkey = self._resolve_sortkey(seg, sort_by, skey)
            hits.append(Hit(meta.key, sc, fields=fields, sortkey=sortkey,
                            vector_distance=dist, gid=gid,
                            payload=meta.payload))
        if cq.knn is not None:
            total = min(total, cq.knn.k)
        out = SearchResult(total=total, hits=hits, query_ast=root)
        out.warnings = warnings
        return out

    def _check_oom(self):
        """Query OOM guardrail (reference: QueryMemoryGuard,
        module.c:230-250): under device-memory pressure the query is let
        through (ignore), answered empty (return), or failed (fail)."""
        if self.on_oom == "ignore":
            return None
        try:
            import jax
            stats = jax.devices()[0].memory_stats()
            in_use = stats.get("bytes_in_use", 0)
            limit = stats.get("bytes_limit", 0)
        except Exception:
            return None
        if not limit or in_use / limit < 0.9:
            return None
        if self.on_oom == "fail":
            raise IndexError_("Not enough memory available to execute the "
                              "query")
        res = SearchResult(total=0, hits=[])
        res.warnings = ["OOM: query returned empty result"]
        return res

    def _search_custom_scorer(self, root, fn, offset, num, no_content,
                              return_fields) -> SearchResult:
        """EXTLOAD-analog custom scorer: over-fetch by BM25STD, re-rank
        on the host via the registered callable (ext.py)."""
        from .. import ext as _ext
        cq = self.compile(root, QueryOptions(
            scorer="BM25STD", k=max((offset + num) * _ext.RESCORE_FACTOR,
                                    64)))
        scored = []
        total = 0
        for seg in self.segments:
            res = execute(cq, seg, cq.opts.k)
            total += res.count
            gids = seg.gids_host
            for j in range(res.local_idx.shape[0]):
                base = float(res.scores[j])
                if base <= -3.3e38:
                    continue
                meta = self.doctable.get(int(gids[int(res.local_idx[j])]))
                if meta is None or meta.deleted:
                    continue
                scored.append((fn(meta.key, meta.fields, base), meta))
        scored.sort(key=lambda x: (-x[0], x[1].key))
        hits = []
        for score, meta in scored[offset:offset + num]:
            fields = None
            if not no_content:
                fields = ({f: meta.fields.get(f) for f in return_fields
                           if f in meta.fields} if return_fields
                          else dict(meta.fields))
            hits.append(Hit(meta.key, float(score), fields=fields,
                            gid=meta.gid, payload=meta.payload))
        return SearchResult(total=total, hits=hits, query_ast=root)

    def _search_hamming(self, root, payload: Optional[bytes], offset, num,
                        no_content, return_fields) -> SearchResult:
        """HAMMING scorer (reference: ext/default.c:457): score =
        1/(1+hamming_distance(query payload, doc payload)); docs without an
        equal-length payload score 0.  Payload distance is inherently
        host-side (payloads are opaque bytes on the doc table)."""
        cq = self.compile(root, QueryOptions())
        scored = []
        total = 0
        for seg in self.segments:
            res = execute(cq, seg, 1, mode="window")
            total += res.count
            gids = seg.gids_host
            for li in res.local_idx[res.valid]:
                meta = self.doctable.get(int(gids[int(li)]))
                if meta is None or meta.deleted:
                    continue
                score = 0.0
                if (payload is not None and meta.payload is not None
                        and len(meta.payload) == len(payload)):
                    dist = sum(bin(a ^ b).count("1")
                               for a, b in zip(payload, meta.payload))
                    score = 1.0 / (1.0 + dist)
                scored.append((score, meta))
        scored.sort(key=lambda x: (-x[0], x[1].key))
        hits = []
        for score, meta in scored[offset:offset + num]:
            fields = None
            if not no_content:
                fields = ({f: meta.fields.get(f) for f in return_fields
                           if f in meta.fields} if return_fields
                          else dict(meta.fields))
            hits.append(Hit(meta.key, score, fields=fields, gid=meta.gid,
                            payload=meta.payload))
        return SearchResult(total=total, hits=hits, query_ast=root)

    def search_many(self, queries: list, params: Optional[list] = None,
                    k: int = 10, scorer: str = "BM25STD",
                    dialect: int = 2,
                    opts_list: Optional[list] = None) -> list:
        """Batched FT.SEARCH: all queries execute in grouped device
        batches (engine.execute_batch) — per group one dispatch, all
        groups collected together.  opts_list overrides QueryOptions per
        query (FT.HYBRID runs its two branches with different scorers
        through here in a single collected round)."""
        from ..query.engine import execute_batch
        self.commit()
        n_real = len(queries)
        cqs = []
        for i, q in enumerate(queries):
            p = params[i] if params else None
            o = (opts_list[i] if opts_list
                 else QueryOptions(scorer=scorer, k=k))
            # prepare() returns a per-call view owning its vector
            # payloads, so same-string KNN queries with different blobs
            # never alias within the batch
            cqs.append(self.prepare(q, p, o, dialect))
        all_hits: list = [[] for _ in cqs]
        totals = [0] * len(cqs)
        knn_q = [False] * len(cqs)
        for seg in self.segments:
            results = execute_batch(cqs, seg, k)
            gids = seg.gids_host  # cached host mirror, not a d2h per query
            for i, res in enumerate(results):
                is_knn = res.knn_dists is not None
                knn_q[i] = is_knn
                totals[i] += res.count
                n_hit = 0
                for j in range(res.local_idx.shape[0]):
                    if n_hit >= k:   # device batch returns next_pow2(k)
                        break
                    sc = float(res.scores[j])
                    dist = (float(res.knn_dists[j]) if is_knn else None)
                    if is_knn:
                        if dist >= 3.3e38:
                            continue
                    elif sc <= -3.3e38:
                        continue
                    meta = self.doctable.get(
                        int(gids[int(res.local_idx[j])]))
                    if meta is None or meta.deleted:
                        continue
                    # share the meta's fields dict: doctable.put replaces
                    # metas wholesale on re-index, so the dict is stable
                    all_hits[i].append(Hit(meta.key, sc, fields=meta.fields,
                                           vector_distance=dist,
                                           gid=meta.gid))
                    n_hit += 1
        out = []
        for i in range(n_real):
            # deterministic merge: score (or distance) first, then doc id
            # — the reference sorter's docid tiebreak (result_processor.c
            # cmpByScore), which keeps RRF ranks stable across tied
            # scores regardless of segment interleaving
            key = ((lambda h: (h.vector_distance, h.gid)) if knn_q[i]
                   else (lambda h: (-h.score, h.gid)))
            out.append(SearchResult(total=totals[i],
                                    hits=sorted(all_hits[i], key=key)[:k]))
        return out

    def _resolve_sortkey(self, seg: Segment, field: str, keyval: float):
        f = self.schema.field(field)
        if f.type == FieldType.NUMERIC:
            return keyval
        sc = seg.strcols.get(f.attribute)
        if sc is not None and 0 <= int(keyval) < len(sc.table):
            return sc.table[int(keyval)]
        return keyval

    def aggregate(self, req) -> "AggregateResult":
        """FT.AGGREGATE analog; `req` is an agg.pipeline.AggregateRequest."""
        from ..agg.pipeline import run_aggregate
        return run_aggregate(self, req)

    def explain(self, query: str, params=None, dialect: int = 2) -> str:
        """FT.EXPLAIN analog."""
        return ast.dump(self.parse_query(query, params, dialect))

    # -- introspection -------------------------------------------------------
    def info(self) -> dict:
        """FT.INFO analog."""
        self_mem = sum(seg.memory_bytes() for seg in self.segments)
        n_terms = sum(len(seg.terms) for seg in self.segments)
        n_records = sum(seg.text.nnz for seg in self.segments)
        vec_mem = sum(
            (v.vecs.nbytes if hasattr(v.vecs, "nbytes") else 0)
            + (v.ivf.memory_bytes() if v.ivf is not None else 0)
            + (v.host_ivf.device_bytes() + v.host_ivf.host_bytes()
               if v.host_ivf is not None else 0)
            for seg in self.segments for v in seg.vectors.values())
        return {
            "index_name": self.schema.name,
            "index_options": {"prefixes": list(self.schema.prefixes),
                              "filter": self.schema.filter_expr,
                              "language": self.schema.language},
            "num_docs": self.doctable.num_docs,
            "max_doc_id": self.doctable.max_gid,
            "indexing": int(bool(self.scan_state
                                 and self.scan_state.get("running"))),
            "percent_indexed": (
                1.0 if not self.scan_state
                else (self.scan_state["scanned"]
                      / max(self.scan_state["total"], 1))),
            "background_indexing_status": (
                "OK" if not self.scan_state
                else ("PAUSED_ON_OOM" if self.scan_state.get("oom_abort")
                      else ("RUNNING" if self.scan_state.get("running")
                            else "OK"))),
            "num_terms": n_terms,
            "num_records": n_records,
            "num_segments": len(self.segments),
            "pending_docs": len(self._builder),
            "avg_doc_length": self.doctable.avg_doclen,
            "inverted_sz_mb": self_mem / 1e6,
            "vector_index_sz_mb": vec_mem / 1e6,
            "attributes": [
                {"identifier": f.name, "attribute": f.attribute,
                 "type": f.type.value, "sortable": f.sortable,
                 "weight": f.weight,
                 **({"algorithm": f.vector.algo.value,
                     "dim": f.vector.dim,
                     "metric": f.vector.metric.value}
                    if f.vector else {})}
                for f in self.schema.fields
            ],
            "index_errors": self._render_index_errors(),
            "queries": self.stats["queries"],
            "dialect_stats": {f"dialect_{d}": int(self.dialect_stats[d])
                              for d in (1, 2, 3, 4)},
        }

    def _render_index_errors(self) -> dict:
        """Index Errors section; the failing document key is obfuscated
        when hide-user-data-from-log is on (reference: index_error.c +
        obfuscation_api.h)."""
        out = dict(self.index_errors)
        obf = out.pop("last_error_key_obfuscated", None)
        if _log.hide_user_data and out.get("last_error_key") is not None:
            out["last_error_key"] = obf or "Document@?"
        return out
