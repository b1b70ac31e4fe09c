"""Immutable device-resident index segments.

This is the TPU-native replacement for the reference's mutable storage
engine (inverted index src/redisearch_rs/inverted_index, numeric range tree,
tag index, doc table columns — SURVEY.md §2.1).  Design (SURVEY.md §7.1):

  * Postings are CSR int32 device arrays (term_offsets + doc_ids/freqs/
    field_masks), not delta-compressed byte blocks: on TPU the decode cost of
    varint/qint would serialize a vector machine, while uncompressed strided
    int32 reads run at HBM line rate and feed scatter/gather directly.
  * Term positions ("offsets" in the reference, used for phrase/slop and
    highlighting) are stored as sorted int32 keys `local_doc * pos_stride +
    position` in a per-posting CSR.  Phrase matching then becomes
    `searchsorted` set-intersection over key arrays — a batch-at-a-time
    replacement for the reference's doc-at-a-time offset iterators
    (src/index_result, aggregate_plan slop checks).
  * NUMERIC/GEO/TAG/sortable fields are dense per-doc columns; range and
    radius filters are vectorized compares over the column instead of the
    reference's numeric range tree + geohash union iterators
    (src/redisearch_rs/numeric_range_tree, src/geo_index.c).
  * Deletes are a bitmap (`alive`); compaction rebuilds the segment.  This
    gives snapshot semantics by construction, replacing the reference's
    fork-GC + Revalidate protocol (src/fork_gc/, iterator_api.h:30-37).

A segment is immutable once sealed: queries never race writers.
"""

from __future__ import annotations

import dataclasses
import itertools
import os
from typing import Any, Optional

import numpy as np

try:  # jax optional at import time so pure-host tests stay light
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None

from ..schema import Field, FieldType, Schema

# Lane width of the TPU VPU; all ragged arrays are padded to a multiple.
LANE = 128


def round_up(x: int, m: int) -> int:
    return max(((x + m - 1) // m) * m, m)


# SLICE guarantee: device posting arrays carry a tail pad so that the
# engine's `dynamic_slice(arr, start, W)` window reads never clamp
# (start <= real length, W <= the pad).  ops/window.py relies on this.
# Position keys cap their pad (and the engine caps the P bucket) at
# POS_SLICE_PAD.  Terms with more positions than this stay EXACT in
# phrase windows via slow paths (engine.py _phrase_chain_pivot): member
# terms probe the CSR by dynamic binary search; an oversized pivot scans
# its run in POS_SLICE_PAD chunks into a dense doc accumulator.  A
# warning surfaces on SearchResult.warnings when either path engages.
POS_SLICE_PAD = 262144


def tail_pad(arr: np.ndarray, extra: int, fill=0) -> np.ndarray:
    out = np.full((arr.shape[0] + extra,) + arr.shape[1:], fill, arr.dtype)
    out[:arr.shape[0]] = arr
    return out


# The Pallas kernels (ops/intersect.py) DMA whole 128-lane ROWS: a
# window starting at `start` reads rows [start//128, start//128 +
# W//128 + R_EXTRA).  Beyond the XLA SLICE guarantee (start + W <= len)
# that reaches up to (R_EXTRA + 1) * 128 elements further — without
# this extra pad a window near the array tail makes the row copy clamp
# (dynamic-slice semantics), silently SHIFTING the window data against
# the kernel's start%128 offset and dropping/corrupting matches.
KERNEL_ROW_PAD = 9 * LANE


def posting_pad(n: int, cap: int) -> int:
    """Tail-pad size for kernel-readable posting arrays: the SLICE
    guarantee (`cap` >= any window bucket) plus the kernel row-DMA
    overhang, rounded so the padded length is whole 128-lane rows."""
    extra = cap + KERNEL_ROW_PAD
    return extra + (-(n + extra)) % LANE


def mask_words(n_text_fields: int) -> int:
    """int32 words per field mask (reference t_fieldMask is 128-bit:
    up to 4 words; single-word masks keep the flat fast path)."""
    return max(1, -(-n_text_fields // 32))


def pack_mask_words(masks, K: int) -> np.ndarray:
    """Pack python-int field masks into K int32 words.

    Returns int32[n] when K == 1 (bit 31 wraps through uint32 so a
    32-field mask still fits one word), else int32[n, K]."""
    a = np.asarray(
        [[(int(m) >> (32 * j)) & 0xFFFFFFFF for j in range(K)]
         for m in masks], dtype=np.uint64).reshape(-1, K)
    out = a.astype(np.uint32).view(np.int32)
    return out[:, 0] if K == 1 else out


def next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p <<= 1
    return p


@dataclasses.dataclass
class TermDict:
    """Host-side term dictionary (reference: terms Trie, src/trie/).

    On TPU the dictionary stays host-side (SURVEY.md §7.3): lookups are hash
    probes, and prefix/suffix/fuzzy expansion scans the sorted term list.
    """

    ids: dict[str, int]
    terms: list[str]                    # id -> term
    doc_freq: np.ndarray                # int32[n_terms]
    _sorted: Optional[list[str]] = None

    def lookup(self, term: str) -> int:
        return self.ids.get(term, -1)

    @property
    def sorted_terms(self) -> list[str]:
        if self._sorted is None:
            self._sorted = sorted(self.ids)
        return self._sorted

    def __len__(self) -> int:
        return len(self.terms)


@dataclasses.dataclass
class TextPostings:
    """CSR postings over all TEXT terms of a segment.

    Reference: InvertedIndex<E> blocks (inverted_index/src/index/core.rs:31)
    — here one flat strided layout for the whole segment.
    """

    term_offsets: Any   # int32[n_terms+1] into the nnz axis
    doc_ids: Any        # int32[nnz_pad] local doc ids (ascending per term)
    freqs: Any          # float32[nnz_pad] field-weighted term frequency
    field_masks: Any    # int32[nnz_pad] bitmask of TEXT fields (<=32 round1)
    # per-posting doc length (the BM25/DOCNORM norm operand) — replicated
    # into posting order so scoring windows slice it contiguously instead
    # of paying an arbitrary-index doclen gather (~30M elem/s on TPU)
    doclens: Any        # float32[nnz_pad]
    pos_offsets: Any    # int32[nnz_pad+1] into poskeys
    poskeys: Any        # int32[npos_pad] = local_doc * pos_stride + position
    pos_stride: int     # power of two >= max positions tracked per doc
    nnz: int
    max_postings: int   # longest posting list (gather bucket upper bound)
    # True when any position was clamped at pos_stride - 1 (docs longer
    # than the stride cap): the phrase equality-join formulation and the
    # anchor chain judge clamped keys differently, so the engine keeps
    # the chain kernel on such segments (ops/intersect.py phrase_batch)
    pos_clamped: bool = False
    term_offsets_np: Optional[np.ndarray] = None  # host mirror for planning
    pos_offsets_np: Optional[np.ndarray] = None   # host mirror for planning


@dataclasses.dataclass
class TagPostings:
    """CSR doc-id postings per TAG value (reference: src/tag_index.c)."""

    ids: dict[str, int]          # tag value -> tag id (host-side dict)
    values: list[str]            # tag id -> value
    offsets: Any                 # int32[n_tags+1]
    doc_ids: Any                 # int32[nnz_pad]
    nnz: int
    max_postings: int
    offsets_np: Optional[np.ndarray] = None       # host mirror for planning
    # Dense doc-aligned value-id column (int32[n_pad], -1 = no value),
    # built only when every doc carries <= 1 value for this field: tag
    # *predicates* then check `codes[doc] == qcode` per candidate instead
    # of block-gathering the value's posting window (the [Q,128] row-DMA
    # membership costs ~7 ns/element; the code compare is one gather per
    # candidate).  Multi-valued fields keep the posting-window member path.
    codes: Any = None
    _sorted: Optional[list[str]] = None

    @property
    def sorted_values(self) -> list[str]:
        if self._sorted is None:
            self._sorted = sorted(self.ids)
        return self._sorted


@dataclasses.dataclass
class NumericColumn:
    """Dense numeric column (replaces the numeric range tree).

    `sorted_*` is the value-sorted permutation: the numeric *generator*
    path — a range [lo, hi] is a contiguous run in sorted order found by
    searchsorted, the batch-at-a-time analog of a range-tree leaf scan
    (reference: numeric_range_tree).  Missing docs sort last with doc id
    INT32_MAX so a window gather yields valid sorted candidates.
    """

    values: Any    # float32[n_pad] (first value — SORTBY key)
    present: Any   # bool[n_pad]
    sorted_vals: Any = None   # float32 ascending over ALL (value,doc) pairs
    sorted_docs: Any = None   # int32 doc ids in value order (dups if multi)
    sorted_vals_np: Any = None  # host mirror for bind-time searchsorted
    # JSON multi-value support (reference: multi-value numeric fields index
    # every array element into the range tree): dense [n_pad, V] matrix for
    # the predicate path; the sorted permutation above holds every pair so
    # range *generator* windows see all values (deduped on device).
    multi_values: Any = None   # float32[n_pad, V]
    multi_present: Any = None  # bool[n_pad, V]
    multi: bool = False


def make_numeric_column(col_with_nan: np.ndarray, n: int,
                        value_lists=None) -> NumericColumn:
    """Build a NumericColumn (incl. sorted permutation) from a float array
    where NaN marks missing; entries beyond `n` are padding.
    `value_lists` (optional, len n) carries per-doc multi-values; when any
    doc has >1 value the column becomes multi-valued."""
    import jax.numpy as jnp

    present = ~np.isnan(col_with_nan)
    present[n:] = False
    n_pad = col_with_nan.shape[0]
    multi = (value_lists is not None
             and any(len(v) > 1 for v in value_lists))
    if multi:
        V = next_pow2(max(len(v) for v in value_lists))
        mv = np.zeros((n_pad, V), np.float32)
        mp = np.zeros((n_pad, V), np.bool_)
        pair_docs: list[int] = []
        pair_vals: list[float] = []
        for i, vals in enumerate(value_lists):
            for j, val in enumerate(vals):
                mv[i, j] = val
                mp[i, j] = True
                pair_docs.append(i)
                pair_vals.append(val)
        pv = np.asarray(pair_vals, np.float32)
        pd = np.asarray(pair_docs, np.int32)
        order = np.argsort(pv, kind="stable")
        sv = pv[order]
        sd = pd[order]
        cap = next_pow2(max(len(sv), n_pad))
        return NumericColumn(
            values=jnp.asarray(np.nan_to_num(col_with_nan, nan=0.0,
                                             posinf=0.0, neginf=0.0)),
            present=jnp.asarray(present),
            sorted_vals=jnp.asarray(tail_pad(sv, cap, np.inf)),
            sorted_docs=jnp.asarray(tail_pad(sd, cap, 2**31 - 1)),
            sorted_vals_np=sv,
            multi_values=jnp.asarray(mv),
            multi_present=jnp.asarray(mp),
            multi=True,
        )
    key = np.where(present, col_with_nan, np.inf)
    order = np.argsort(key, kind="stable").astype(np.int32)
    sv = key[order].astype(np.float32)
    sd = np.where(np.isfinite(sv), order, np.int32(2**31 - 1))
    cap = next_pow2(n_pad)
    return NumericColumn(
        values=jnp.asarray(np.nan_to_num(col_with_nan, nan=0.0,
                                         posinf=0.0, neginf=0.0)),
        present=jnp.asarray(present),
        sorted_vals=jnp.asarray(tail_pad(sv, cap, np.inf)),
        sorted_docs=jnp.asarray(tail_pad(sd.astype(np.int32), cap,
                                         2**31 - 1)),
        sorted_vals_np=sv[:n_pad] if not multi else sv,
    )


_VEC_JNP_DTYPES = {
    "BFLOAT16": "bfloat16", "INT8": "int8", "UINT8": "uint8",
    "FLOAT16": "float16", "FLOAT32": "float32", "FLOAT64": "float32",
}


def bf16_scan_copy(mat):
    """bf16 copy of an f32 device vector matrix for the two-phase KNN
    candidate scan (VectorColumn.scan_vecs / ops/vector.py knn_batch):
    halves the scan's HBM reads at +50% vector memory.  The f32 master
    stays the source of truth (rescore, checkpoints, compaction); the
    copy is derived state, rebuilt here on build/load/slice.  Returns
    None for non-f32 storage or under RS_TPU_NO_BF16_SCAN=1."""
    import jax.numpy as jnp

    if os.environ.get("RS_TPU_NO_BF16_SCAN"):
        return None
    a = jnp.asarray(mat)
    if a.dtype != jnp.float32:
        return None
    return a.astype(jnp.bfloat16)


def make_vector_column(rows_per_doc: list, n: int, n_pad: int, dim: int,
                       dtype_name: str, host: bool = False,
                       compression: str = "") -> "VectorColumn":
    """Build a VectorColumn from per-doc vector lists.
    rows_per_doc[i]: None | ndarray[dim] | list[ndarray[dim]].
    Multi-value docs switch the column to row layout (reference: VecSim
    multi-value support, src/vector_index.h).  host=True keeps the
    vector matrix in HOST memory (beyond-HBM tier, ops/ivf.py HostIVF);
    only `present` goes to the device.  compression="LVQ8" (host only)
    stores the matrix as per-vector-scaled uint8 codes (ops/lvq.py)."""
    import jax.numpy as jnp

    norm = []
    for r in rows_per_doc:
        if r is None:
            norm.append([])
        elif isinstance(r, (list, tuple)):
            norm.append(list(r))
        else:
            norm.append([r])
    norm += [[]] * (n_pad - len(norm))
    multi = any(len(v) > 1 for v in norm)
    dt = getattr(jnp, _VEC_JNP_DTYPES.get(dtype_name, "float32"))
    present = np.array([len(v) > 0 for v in norm], bool)
    if host and multi:
        raise ValueError(
            "host-tier (storage='host') vector fields do not support "
            "multi-value documents")
    if not multi:
        mat = np.zeros((n_pad, dim), np.float32)
        for i, v in enumerate(norm):
            if v:
                mat[i] = v[0]
        sq = (mat.astype(np.float64) ** 2).sum(1).astype(np.float32)
        if host:
            if compression:
                from ..ops.lvq import lvq_encode, lvq_sq_norms
                codes, off, scl = lvq_encode(mat)
                return VectorColumn(
                    vecs=codes, present=jnp.asarray(present), dim=dim,
                    sq_norms=lvq_sq_norms(codes, off, scl), host=True,
                    compression=compression, vq_off=off, vq_scl=scl)
            return VectorColumn(
                vecs=mat, present=jnp.asarray(present), dim=dim,
                sq_norms=sq, host=True)
        dev = jnp.asarray(mat, dtype=dt)
        return VectorColumn(
            vecs=dev, present=jnp.asarray(present), dim=dim,
            sq_norms=jnp.asarray(sq), scan_vecs=bf16_scan_copy(dev))
    M = next_pow2(max(len(v) for v in norm))
    R = sum(len(v) for v in norm)
    R_pad = max(round_up(R, 8), 8)
    rows = np.zeros((R_pad, dim), np.float32)
    doc_rows = np.full((n_pad, M), -1, np.int32)
    r = 0
    for i, v in enumerate(norm):
        for j, vec in enumerate(v):
            rows[r] = vec
            doc_rows[i, j] = r
            r += 1
    return VectorColumn(
        vecs=jnp.asarray(rows, dtype=dt),
        present=jnp.asarray(present), dim=dim,
        sq_norms=jnp.asarray((rows.astype(np.float64) ** 2)
                             .sum(1).astype(np.float32)),
        doc_rows=jnp.asarray(doc_rows), multi=True)


@dataclasses.dataclass
class GeoColumn:
    lon: Any       # float32[n_pad] radians
    lat: Any       # float32[n_pad] radians
    present: Any   # bool[n_pad]


@dataclasses.dataclass
class StrColumn:
    """Dictionary-encoded string column for SORTBY/GROUPBY on TAG/TEXT."""

    value_ids: Any        # int32[n_pad]; -1 = missing
    table: list[str]      # value id -> string
    order: Any            # int32[n_pad]: rank of value in lexicographic order


@dataclasses.dataclass
class VectorColumn:
    """Per-field vector data (reference: VecSim FLAT storage).

    IVF/tiered structures are built on top by ops/vector.py.
    """

    vecs: Any      # dtype[n_pad, dim]  (multi: dtype[R_pad, dim] rows)
    present: Any   # bool[n_pad]  (always per-doc)
    dim: int
    # Precomputed squared L2 norms (f32[n_pad]) for L2 via the MXU
    # ||a-b||^2 = ||a||^2 - 2ab + ||b||^2 trick.
    sq_norms: Any = None
    # bf16 copy of `vecs` for the two-phase candidate scan (f32 storage
    # only; ops/vector.py knn_batch scan_vecs).  Derived state — rebuilt
    # on load/compaction, never checkpointed.
    scan_vecs: Any = None
    # Multi-value vectors (reference: VecSim multi-value indexes — a doc's
    # score is the best of its vectors): all vectors stored as rows, with
    # doc_rows[n_pad, M] mapping each doc to its row indices (-1 pad).
    doc_rows: Any = None   # int32[n_pad, M]
    multi: bool = False
    # Partitioned ANN structure (ops/ivf.py IVFIndex) for IVF/TIERED
    # fields; None = brute-force FLAT scan (always exact).  Built by
    # SearchIndex.commit() when the segment crosses the tiered threshold —
    # small fresh segments stay FLAT, which IS the reference's tiered
    # flat-front-buffer semantics (src/vector_index.c tiered).
    ivf: Any = None
    # Beyond-HBM tier (VectorParams.storage == "host"): vecs/sq_norms are
    # HOST numpy, host_ivf (ops/ivf.py HostIVF) holds the bucket slabs;
    # KNN pages probed lists to the device per batch (reference analog:
    # the disk tier, src/search_disk_api.h).
    host: bool = False
    host_ivf: Any = None
    # LVQ8 compressed host tier (reference: SVS LVQ, src/vector_index.h:
    # 17-71; ops/lvq.py): `vecs` holds uint8 codes, vq_off/vq_scl the
    # per-vector dequant pair, sq_norms = ||reconstruction||^2.  The
    # compressed form is the source of truth — slicing/compaction stay
    # exact because quantization is per-vector.
    compression: str = ""
    vq_off: Any = None     # HOST f32[n_pad]
    vq_scl: Any = None     # HOST f32[n_pad]


def build_tag_codes(stage: dict, values: list, n_pad: int):
    """Dense value-id column for a single-valued TAG field (see
    TagPostings.codes); None when any doc carries more than one value.
    `stage` maps value -> list of local doc ids."""
    import jax.numpy as jnp

    codes = np.full(n_pad, -1, np.int32)
    for i, v in enumerate(values):
        lst = np.asarray(stage[v], np.int64)
        if lst.size and codes[lst].max() >= 0:
            return None
        codes[lst] = i
    return jnp.asarray(codes)


_SEG_UIDS = itertools.count()


@dataclasses.dataclass
class Segment:
    """One sealed, immutable, device-resident index segment."""

    n_docs: int                     # live+deleted real docs (<= n_pad)
    n_pad: int
    gids: Any                       # int32[n_pad]: local id -> global doc id
    alive: Any                      # bool[n_pad]: not deleted, not padding
    doclen: Any                     # float32[n_pad] total text tokens
    max_freq: Any                   # float32[n_pad] max term freq (TFIDF)
    docscore: Any                   # float32[n_pad] user score
    expire_at: Any                  # int32[n_pad] epoch-seconds (0 = never)
    terms: TermDict
    text: TextPostings
    tags: dict[str, TagPostings]            # field attr -> postings
    numerics: dict[str, NumericColumn]      # field attr -> column
    geos: dict[str, GeoColumn]
    strcols: dict[str, StrColumn]           # sortable TAG/TEXT columns
    vectors: dict[str, VectorColumn]
    missing: dict[str, Any]                 # field attr -> bool[n_pad] "has field"
    gid_to_local: dict[int, int]            # host-side for deletes
    # host-side geometry store: field attr -> list of parsed shapes or None
    geometries: dict[str, list] = dataclasses.field(default_factory=dict)
    # fast-path flags: when a segment has no deletions, no TTLs and uniform
    # doc scores, the engine skips per-candidate alive/TTL/docscore gathers
    n_deleted: int = 0
    has_ttl: bool = False
    uniform_docscore: bool = True
    # Cold (beyond-HBM) segment: text/tag CSR arrays are HOST numpy;
    # each query uploads only its term windows (engine._execute_cold).
    cold: bool = False
    # field-level TTLs (reference: ttl_table + expiration_checker):
    # text_fexp [n_pad, n_text_fields] int32 expiry per TEXT field (0 =
    # never); field_fexp: attr -> int32[n_pad] for non-text fields.
    text_fexp: Any = None
    field_fexp: dict = dataclasses.field(default_factory=dict)
    _gids_np: Any = None
    # posting-ALIGNED tag code columns (attr -> int32[nnz_pad]), built
    # lazily on first kernel-eligible tag-filtered query: pcodes[i] =
    # codes[text.doc_ids[i]], so a tag predicate at text-posting pivot
    # candidates is one contiguous window read + compare instead of a
    # posting-window membership pass (reference tag read path:
    # src/tag_index.c:17-57 — here the TPU answer is a dense column in
    # posting order, no gather)
    _pcode_cache: dict = dataclasses.field(default_factory=dict)
    # identity for per-segment caches (bind memos): segments are immutable
    # after seal, so a monotone uid is a sound cache key
    uid: int = dataclasses.field(
        default_factory=lambda: next(_SEG_UIDS))

    def tag_pcodes(self, attr: str):
        """Posting-aligned dense code column for a single-valued TAG
        field (None when unavailable: multi-valued, cold, or no text
        postings).  One device gather on first use, then cached — the
        segment is immutable after seal."""
        tp = self.tags.get(attr)
        if tp is None or tp.codes is None or self.cold:
            return None
        cached = self._pcode_cache.get(attr)
        if cached is None:
            import jax.numpy as jnp
            if int(self.text.doc_ids.shape[0]) == 0:
                return None
            idx = jnp.clip(self.text.doc_ids, 0, self.n_pad - 1)
            cached = jnp.asarray(tp.codes)[idx].astype(jnp.int32)
            self._pcode_cache[attr] = cached
        return cached

    @property
    def gids_host(self) -> np.ndarray:
        """Host mirror of the gid map (fetching the device array per query
        costs a full n_pad transfer)."""
        if self._gids_np is None:
            self._gids_np = np.asarray(self.gids)
        return self._gids_np

    # -- mutation (the only two allowed: delete + ttl refresh) -----------
    def mark_deleted(self, gid: int) -> bool:
        loc = self.gid_to_local.get(gid)
        if loc is None:
            return False
        self.alive = self.alive.at[loc].set(False)
        self.n_deleted += 1
        return True

    @property
    def num_alive(self) -> int:
        return int(np.asarray(self.alive).sum())

    def memory_bytes(self) -> int:
        total = 0

        def acc(x):
            nonlocal total
            if x is not None and hasattr(x, "nbytes"):
                total += x.nbytes

        for arr in (self.gids, self.alive, self.doclen, self.docscore,
                    self.expire_at, self.text.term_offsets, self.text.doc_ids,
                    self.text.freqs, self.text.field_masks,
                    self.text.pos_offsets, self.text.poskeys):
            acc(arr)
        for t in self.tags.values():
            acc(t.offsets), acc(t.doc_ids)
        for c in self.numerics.values():
            acc(c.values), acc(c.present)
        for g in self.geos.values():
            acc(g.lon), acc(g.lat), acc(g.present)
        for s in self.strcols.values():
            acc(s.value_ids), acc(s.order)
        for v in self.vectors.values():
            acc(v.vecs), acc(v.present), acc(v.sq_norms)
        return total
