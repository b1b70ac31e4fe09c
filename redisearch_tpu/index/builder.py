"""Host-side segment builder: the write path.

TPU-native replacement for the reference's indexing path (SURVEY.md §2.2:
src/document.c preprocessors, src/forward_index.c, src/indexer.c).  Instead
of appending into mutable compressed blocks under a lock, documents are
staged on the host (this file) and periodically *sealed* into an immutable
device-resident Segment (segment.py) — the LSM-ish model from SURVEY.md
§7.3 that replaces per-doc appends, fork-GC and the Revalidate protocol.

Field preprocessing mirrors Document_AddToIndexes (src/document.c:980):
  TEXT    -> tokenize -> per-term (freq, field mask, positions); stems are
             indexed as '+'-prefixed terms, phonetic codes as '\\x01'-prefixed
             terms (the reference marks these in its term trie the same way).
  NUMERIC -> dense float column.
  TAG     -> separator split -> per-value doc postings + dense sortable col.
  GEO     -> "lon,lat" -> dense radian columns.
  VECTOR  -> row in the [N, dim] matrix.
  GEOMETRY-> parsed WKT shape kept host-side (R-tree replaced by vectorized
             predicate checks at query time).
"""

from __future__ import annotations

import math
import time
from typing import Any, Optional

import numpy as np

from ..analysis.phonetics import dm_code
from ..analysis.stemmer import Stemmer
from ..analysis.stopwords import StopWordList
from ..analysis.tokenizer import Tokenizer, normalize_token
from ..schema import Field, FieldType, Schema
from ..utils import wkt
from ..utils.errors import IndexError_, WrongFieldType
from ..utils.jsonpath import get_field_value
from .doctable import DocMeta
from .segment import (
    LANE,
    POS_SLICE_PAD,
    GeoColumn,
    NumericColumn,
    Segment,
    StrColumn,
    TagPostings,
    TermDict,
    TextPostings,
    VectorColumn,
    build_tag_codes,
    make_numeric_column,
    make_vector_column,
    next_pow2,
    posting_pad,
    round_up,
    tail_pad,
)

STEM_PREFIX = "+"        # reference: STEM_PREFIX in forward index terms
PHONETIC_PREFIX = "\x01"  # reference: PHONETIC_PREFIX
# Device field masks are int32 words; schemas with more than 32 TEXT
# fields pack into [nnz, K] multi-word masks (K = ceil(F/32)), matching
# the reference's 128-bit t_fieldMask (src/redisearch.h) at K=4.
DEVICE_MAX_TEXT_FIELDS = 128
# Positions per doc tracked for phrase matching are capped so that
# local_doc * pos_stride + pos fits in int32 (see segment.py poskeys).
MAX_POS_STRIDE = 4096

def _bf16():
    import ml_dtypes
    return ml_dtypes.bfloat16


_VEC_NP_DTYPES = {
    "FLOAT32": np.float32,
    "FLOAT64": np.float64,
    "FLOAT16": np.float16,
    "INT8": np.int8,
    "UINT8": np.uint8,
}


def _vec_np_dtype(name: str):
    if name == "BFLOAT16":
        return _bf16()
    return _VEC_NP_DTYPES[name]


class _TermStage:
    __slots__ = ("docs", "freqs", "masks", "positions", "doc_freq")

    def __init__(self):
        self.docs: list[int] = []
        self.freqs: list[float] = []
        self.masks: list[int] = []
        self.positions: list[list[int]] = []
        self.doc_freq = 0


class SegmentBuilder:
    """Accumulates documents, then seals them into a Segment."""

    def __init__(self, schema: Schema,
                 stopwords: Optional[StopWordList] = None,
                 synonyms=None):
        self.schema = schema
        self.synonyms = synonyms
        if schema.num_text_fields > DEVICE_MAX_TEXT_FIELDS:
            raise IndexError_(
                f"device field mask supports up to {DEVICE_MAX_TEXT_FIELDS} "
                f"TEXT fields for now")
        self.stopwords = stopwords or StopWordList(schema.stopwords)
        self._stemmers: dict[str, Stemmer] = {}
        # staging
        self._gids: list[int] = []
        self._metas: list = []       # DocMeta refs: TTLs re-read at seal
        self._doclen: list[float] = []
        self._maxfreq: list[float] = []
        self._docscore: list[float] = []
        self._expire: list[int] = []
        self._terms: dict[str, _TermStage] = {}
        self._term_order: list[str] = []
        self._tags: dict[str, dict[str, list[int]]] = {
            f.attribute: {} for f in schema.fields if f.type == FieldType.TAG}
        self._numerics: dict[str, list[float]] = {
            f.attribute: [] for f in schema.fields
            if f.type == FieldType.NUMERIC}
        self._geos: dict[str, list[tuple[float, float]]] = {
            f.attribute: [] for f in schema.fields if f.type == FieldType.GEO}
        self._strcols: dict[str, list[Optional[str]]] = {
            f.attribute: [] for f in schema.fields
            if f.sortable and f.type in (FieldType.TEXT, FieldType.TAG)}
        self._vectors: dict[str, list[Optional[np.ndarray]]] = {
            f.attribute: [] for f in schema.fields
            if f.type == FieldType.VECTOR}
        self._geoms: dict[str, list] = {
            f.attribute: [] for f in schema.fields
            if f.type == FieldType.GEOMETRY}
        self._present: dict[str, list[bool]] = {
            f.attribute: [] for f in schema.fields}
        # field-level TTLs (reference: ttl_table — docId -> [(field, ts)])
        self._fexpire: dict[str, list[int]] = {
            f.attribute: [] for f in schema.fields}
        self._any_fexp = False
        self.max_positions = 0

    def __len__(self) -> int:
        return len(self._gids)

    def _stemmer_for(self, language: str) -> Stemmer:
        st = self._stemmers.get(language)
        if st is None:
            st = Stemmer(language)
            self._stemmers[language] = st
        return st

    # -- add one document -------------------------------------------------
    def add(self, meta: DocMeta) -> None:
        """Stage one document.  Mirrors Document_AddToIndexes."""
        local = len(self._gids)
        self._gids.append(meta.gid)
        self._metas.append(meta)
        self._docscore.append(meta.score)
        self._expire.append(int(-(-meta.expires_at // 1))
                            if meta.expires_at else 0)

        language = getattr(meta, "language", None) or str(
            meta.fields.get(self.schema.language_field, self.schema.language)
            if self.schema.language_field else self.schema.language)
        stemmer = self._stemmer_for(language)

        fe = meta.field_expiration or {}
        for f in self.schema.fields:
            v = fe.get(f.attribute) or fe.get(f.name) or 0
            self._fexpire[f.attribute].append(int(v))
            if v:
                self._any_fexp = True

        # per-doc forward index: term -> [freq, mask, positions].
        # Positions are global across TEXT fields (base advances per field,
        # +1 gap so phrases never falsely match across a field boundary).
        fwd: dict[str, list] = {}
        doclen = 0.0
        max_pos = 0
        pos_base = 0

        for field in self.schema.fields:
            raw = get_field_value(meta.fields, field.name)
            if raw is None and field.alias:
                raw = meta.fields.get(field.alias)
            if isinstance(raw, (str, bytes)) or raw is None:
                present = raw is not None and (raw != ""
                                               or field.indexempty)
            else:
                present = True
            self._present[field.attribute].append(bool(present))
            if field.type == FieldType.TEXT:
                n_tok, mp = self._add_text(field, raw, fwd, stemmer,
                                           pos_base)
                doclen += n_tok
                pos_base += n_tok + 1
                max_pos = max(max_pos, mp)
                if field.sortable:
                    val = str(raw) if raw is not None else None
                    if val is not None and not field.unf:
                        val = normalize_token(val)
                    self._strcols[field.attribute].append(val)
            elif field.type == FieldType.NUMERIC:
                self._numerics[field.attribute].append(
                    self._parse_numeric(field, raw))
            elif field.type == FieldType.TAG:
                joined = self._add_tag(field, raw, local)
                if field.sortable:
                    self._strcols[field.attribute].append(joined)
            elif field.type == FieldType.GEO:
                self._geos[field.attribute].append(
                    self._parse_geo(field, raw))
            elif field.type == FieldType.VECTOR:
                self._vectors[field.attribute].append(
                    self._parse_vector(field, raw))
            elif field.type == FieldType.GEOMETRY:
                self._geoms[field.attribute].append(
                    wkt.parse(str(raw)) if raw is not None else None)

        # merge forward index into term staging (reference: indexer.c:58
        # writeIndexEntry per term)
        max_freq = 0.0
        for term, (freq, mask, positions) in fwd.items():
            stage = self._terms.get(term)
            if stage is None:
                stage = _TermStage()
                self._terms[term] = stage
                self._term_order.append(term)
            stage.docs.append(local)
            stage.freqs.append(freq)
            stage.masks.append(mask)
            stage.positions.append(positions)
            stage.doc_freq += 1
            max_freq = max(max_freq, freq)

        self._doclen.append(doclen)
        self._maxfreq.append(max(max_freq, 1.0))
        self.max_positions = max(self.max_positions, max_pos)
        meta.doclen = int(doclen)
        meta.max_freq = int(max_freq)

    # -- field preprocessors ----------------------------------------------
    def _add_text(self, field: Field, raw: Any, fwd: dict,
                  stemmer: Stemmer, pos_base: int) -> tuple[int, int]:
        if raw is None:
            return 0, 0
        if isinstance(raw, (list, tuple)):  # JSON multi-value text
            text = " ".join(str(v) for v in raw)
        else:
            text = str(raw)
        tk = Tokenizer(self.stopwords,
                       None if field.nostem else stemmer)
        n_tok = 0
        max_pos = 0
        fbit = 1 << field.field_id
        # Stored freqs are field-WEIGHT-scaled, and the intersection
        # kernel derives membership from (tf sum > 0) (_member_pass's
        # want_tf fast path).  Clamp non-positive weights to a tiny
        # epsilon so a WEIGHT 0 field still registers hits (and NOT
        # exclusions) while contributing ~0 BM25 score — matching the
        # XLA twin's membership-based hit.
        w = field.weight if field.weight > 0 else 1e-6
        for tok in tk.tokenize(text):
            n_tok += 1
            if tok.is_stopword or field.noindex:
                continue
            pos = pos_base + tok.pos
            max_pos = max(max_pos, pos)
            self._fwd_add(fwd, tok.tok, w, fbit, pos)
            if tok.stem:
                self._fwd_add(fwd, STEM_PREFIX + tok.stem, w, fbit, pos)
            if field.phonetic:
                code = dm_code(tok.tok)
                if code:
                    self._fwd_add(fwd, PHONETIC_PREFIX + code, w, fbit, pos)
            if self.synonyms is not None:
                for syn in self.synonyms.group_terms(tok.tok):
                    self._fwd_add(fwd, syn, w, fbit, pos)
        return n_tok, max_pos

    @staticmethod
    def _fwd_add(fwd: dict, term: str, weight: float, fbit: int,
                 pos: int) -> None:
        ent = fwd.get(term)
        if ent is None:
            fwd[term] = [weight, fbit, [pos]]
        else:
            ent[0] += weight
            ent[1] |= fbit
            ent[2].append(pos)

    def _parse_numeric(self, field: Field, raw: Any) -> list:
        """Returns the list of values for the doc ([] = missing).  JSON
        multi-value numerics index every element (reference: multi-value
        fields feed each value into the numeric range tree)."""
        if raw is None or raw == "":
            return []
        vals = raw if isinstance(raw, (list, tuple)) else [raw]
        out = []
        for v in vals:
            if v is None or v == "":
                continue
            try:
                out.append(float(v))
            except (TypeError, ValueError):
                raise WrongFieldType(
                    f"Could not index numeric value for field {field.name}")
        return out

    def _add_tag(self, field: Field, raw: Any,
                 local: int) -> Optional[str]:
        if raw is None:
            return None
        if isinstance(raw, (list, tuple)):
            values = [str(v) for v in raw]
            joined = field.separator.join(values)
        else:
            joined = str(raw)
            values = [v.strip() for v in joined.split(field.separator)]
        stage = self._tags[field.attribute]
        for v in values:
            if v == "" and not field.indexempty:
                continue
            if not field.casesensitive:
                v = v.lower()
            lst = stage.get(v)
            if lst is None:
                stage[v] = [local]
            elif lst[-1] != local:
                lst.append(local)
        return joined if not field.casesensitive else joined

    def _parse_geo(self, field: Field, raw: Any) -> tuple[float, float]:
        if raw is None or raw == "":
            return (math.nan, math.nan)
        if isinstance(raw, (list, tuple)) and len(raw) == 2:
            lon, lat = float(raw[0]), float(raw[1])
        else:
            parts = str(raw).split(",")
            if len(parts) != 2:
                raise WrongFieldType(f"bad geo value for {field.name}: {raw}")
            lon, lat = float(parts[0]), float(parts[1])
        if not (-180 <= lon <= 180 and -85.05112878 <= lat <= 85.05112878):
            raise WrongFieldType(f"geo out of range for {field.name}")
        return (math.radians(lon), math.radians(lat))

    def _parse_vector(self, field: Field, raw: Any) -> Optional[list]:
        """Returns the doc's vector list (None = missing).  JSON
        multi-value vector fields ($..path arrays-of-arrays) index every
        vector (reference: VecSim multi-value)."""
        if raw is None:
            return None
        vp = field.vector
        npdt = _vec_np_dtype(vp.dtype)
        if isinstance(raw, str):
            # RESP clients send vector blobs as binary-safe strings
            raw = raw.encode("latin-1", "surrogateescape")
        if isinstance(raw, bytes):
            arr = np.frombuffer(raw, dtype=npdt).astype(np.float32)
            if arr.shape[0] != vp.dim and arr.shape[0] % vp.dim == 0:
                return list(arr.reshape(-1, vp.dim))  # concatenated blobs
            if arr.shape[0] != vp.dim:
                raise WrongFieldType(
                    f"vector dim mismatch for {field.name}: got "
                    f"{arr.shape[0]}, want {vp.dim}")
            return [arr]
        if (isinstance(raw, (list, tuple)) and raw
                and isinstance(raw[0], (list, tuple, np.ndarray))):
            vecs = [np.asarray(v, np.float32).reshape(-1) for v in raw]
        else:
            vecs = [np.asarray(raw, dtype=np.float32).reshape(-1)]
        for arr in vecs:
            if arr.shape[0] != vp.dim:
                raise WrongFieldType(
                    f"vector dim mismatch for {field.name}: got "
                    f"{arr.shape[0]}, want {vp.dim}")
        return vecs

    # -- seal ---------------------------------------------------------------
    def seal(self) -> Optional[Segment]:
        """Build the immutable device segment from staged docs."""
        import jax.numpy as jnp

        n = len(self._gids)
        if n == 0:
            return None
        n_pad = round_up(n, LANE)

        # EXPIRE can land on a doc while it is still staged (expire()
        # only patches sealed segments): re-read doc TTLs from the live
        # metas so the sealed columns carry them
        for i, m in enumerate(self._metas):
            self._expire[i] = (int(-(-m.expires_at // 1))
                               if m.expires_at else 0)

        gids = np.zeros(n_pad, np.int32)
        gids[:n] = self._gids
        alive = np.zeros(n_pad, bool)
        alive[:n] = True
        doclen = np.zeros(n_pad, np.float32)
        doclen[:n] = self._doclen
        max_freq = np.ones(n_pad, np.float32)
        max_freq[:n] = self._maxfreq
        docscore = np.zeros(n_pad, np.float32)
        docscore[:n] = self._docscore
        expire = np.zeros(n_pad, np.int32)
        expire[:n] = self._expire

        # ---- text postings CSR
        n_terms = len(self._term_order)
        pos_stride = min(next_pow2(self.max_positions + 2), MAX_POS_STRIDE)
        while pos_stride > 2 and n_pad * pos_stride >= 2**31:
            pos_stride //= 2
        term_offsets = np.zeros(n_terms + 1, np.int64)
        doc_freq = np.zeros(max(n_terms, 1), np.int32)
        nnz = 0
        npos = 0
        max_postings = 0
        for i, term in enumerate(self._term_order):
            st = self._terms[term]
            term_offsets[i] = nnz
            nnz += len(st.docs)
            max_postings = max(max_postings, len(st.docs))
            doc_freq[i] = st.doc_freq
            for plist in st.positions:
                npos += len(plist)
        term_offsets[n_terms] = nnz

        nnz_pad = round_up(nnz, LANE)
        npos_pad = round_up(npos, LANE)
        doc_ids = np.zeros(nnz_pad, np.int32)
        freqs = np.zeros(nnz_pad, np.float32)
        from .segment import mask_words, pack_mask_words
        K_words = mask_words(self.schema.num_text_fields)
        field_masks = (np.zeros(nnz_pad, np.int32) if K_words == 1
                       else np.zeros((nnz_pad, K_words), np.int32))
        pos_offsets = np.zeros(nnz_pad + 1, np.int64)
        poskeys = np.zeros(npos_pad, np.int32)
        at = 0
        pat = 0
        for term in self._term_order:
            st = self._terms[term]
            m = len(st.docs)
            doc_ids[at:at + m] = st.docs
            freqs[at:at + m] = st.freqs
            field_masks[at:at + m] = pack_mask_words(st.masks, K_words)
            for j in range(m):
                pos_offsets[at + j] = pat
                d = st.docs[j]
                for p in st.positions[j]:
                    poskeys[pat] = d * pos_stride + min(p, pos_stride - 1)
                    pat += 1
            at += m
        pos_offsets[at:] = pat

        terms = TermDict(
            ids={t: i for i, t in enumerate(self._term_order)},
            terms=list(self._term_order),
            doc_freq=doc_freq,
        )
        cap = next_pow2(n_pad)
        posting_dl = doclen[doc_ids]  # replicate doc length per posting
        # cold (storage="host") segments keep the CSR arrays in host RAM
        # — queries page their term windows up per execution
        # (engine._execute_cold); everything dense stays on device
        cold = self.schema.storage == "host"
        dev = (lambda a: np.ascontiguousarray(a)) if cold else jnp.asarray
        text = TextPostings(
            term_offsets=dev(term_offsets.astype(np.int32)),
            doc_ids=dev(tail_pad(doc_ids,
                                 posting_pad(len(doc_ids), cap))),
            freqs=dev(tail_pad(freqs, posting_pad(len(freqs), cap))),
            field_masks=dev(tail_pad(field_masks,
                                     posting_pad(len(field_masks), cap))),
            doclens=dev(tail_pad(posting_dl,
                                 posting_pad(len(posting_dl), cap))),
            pos_offsets=dev(pos_offsets.astype(np.int32)),
            poskeys=dev(tail_pad(poskeys,
                                 posting_pad(len(poskeys),
                                             POS_SLICE_PAD),
                                 2**31 - 1)),
            pos_stride=pos_stride,
            pos_clamped=self.max_positions + 1 > pos_stride - 1,
            nnz=nnz,
            max_postings=max_postings,
            term_offsets_np=term_offsets.astype(np.int32),
            pos_offsets_np=pos_offsets.astype(np.int64),
        )

        # ---- tag postings
        tags: dict[str, TagPostings] = {}
        for attr, stage in self._tags.items():
            values = sorted(stage)  # sorted for prefix expansion
            t_off = np.zeros(len(values) + 1, np.int64)
            t_nnz = 0
            t_max = 0
            for i, v in enumerate(values):
                t_off[i] = t_nnz
                t_nnz += len(stage[v])
                t_max = max(t_max, len(stage[v]))
            t_off[len(values)] = t_nnz
            t_ids = np.zeros(round_up(t_nnz, LANE), np.int32)
            at = 0
            for v in values:
                lst = stage[v]
                t_ids[at:at + len(lst)] = lst
                at += len(lst)
            # dense value-id column for single-valued fields (see
            # TagPostings.codes): docs seen twice disable the column
            codes = build_tag_codes(stage, values, n_pad)
            tags[attr] = TagPostings(
                ids={v: i for i, v in enumerate(values)},
                values=values,
                offsets=dev(t_off.astype(np.int32)),
                doc_ids=dev(tail_pad(t_ids, posting_pad(len(t_ids), cap))),
                nnz=t_nnz,
                max_postings=t_max,
                offsets_np=t_off.astype(np.int32),
                codes=codes,
            )

        # ---- dense columns
        numerics = {}
        for attr, vals in self._numerics.items():
            col = np.full(n_pad, np.nan, np.float32)
            col[:n] = [v[0] if v else np.nan for v in vals]
            numerics[attr] = make_numeric_column(col, n, value_lists=vals)
        geos = {}
        for attr, vals in self._geos.items():
            lon = np.full(n_pad, np.nan, np.float32)
            lat = np.full(n_pad, np.nan, np.float32)
            if vals:
                arr = np.asarray(vals, np.float32).reshape(n, 2)
                lon[:n] = arr[:, 0]
                lat[:n] = arr[:, 1]
            geos[attr] = GeoColumn(
                lon=jnp.asarray(np.nan_to_num(lon, nan=0.0)),
                lat=jnp.asarray(np.nan_to_num(lat, nan=0.0)),
                present=jnp.asarray(~np.isnan(lon)),
            )
        strcols = {}
        for attr, vals in self._strcols.items():
            uniq = sorted({v for v in vals if v is not None})
            idmap = {v: i for i, v in enumerate(uniq)}
            ids = np.full(n_pad, -1, np.int32)
            ids[:n] = [idmap.get(v, -1) if v is not None else -1 for v in vals]
            # value ids are assigned in sorted order, so order == id
            strcols[attr] = StrColumn(
                value_ids=jnp.asarray(ids),
                table=uniq,
                order=jnp.asarray(ids),
            )

        vectors = {}
        for attr, rows in self._vectors.items():
            field = self.schema.field(attr)
            vp = field.vector
            vectors[attr] = make_vector_column(rows, n, n_pad, vp.dim,
                                               vp.dtype,
                                               host=vp.storage == "host",
                                               compression=vp.compression)

        missing = {}
        for attr, pres in self._present.items():
            m = np.zeros(n_pad, bool)
            m[:n] = pres
            missing[attr] = jnp.asarray(m)

        geometries = {attr: list(vals) for attr, vals in self._geoms.items()}

        return Segment(
            n_docs=n,
            n_pad=n_pad,
            gids=jnp.asarray(gids),
            alive=jnp.asarray(alive),
            doclen=jnp.asarray(doclen),
            max_freq=jnp.asarray(max_freq),
            docscore=jnp.asarray(docscore),
            expire_at=jnp.asarray(expire),
            terms=terms,
            text=text,
            tags=tags,
            numerics=numerics,
            geos=geos,
            strcols=strcols,
            vectors=vectors,
            missing=missing,
            gid_to_local={g: i for i, g in enumerate(self._gids)},
            geometries=geometries,
            has_ttl=any(e != 0 for e in self._expire),
            uniform_docscore=all(s_ == 1.0 for s_ in self._docscore),
            cold=cold,
            **self._seal_field_ttls(n, n_pad),
        )

    def _seal_field_ttls(self, n: int, n_pad: int) -> dict:
        """Device columns for field-level TTLs (reference: ttl_table).
        TEXT fields pack into [n_pad, F] (expired-field bitmask filtering
        in term windows); other fields get per-attr columns consumed as
        leaf predicates."""
        import jax.numpy as jnp
        if not self._any_fexp:
            return {}
        out: dict = {"field_fexp": {}}
        tfields = self.schema.text_fields()
        if any(any(v) for f in tfields
               for v in [self._fexpire[f.attribute]]):
            tf = np.zeros((n_pad, max(len(tfields), 1)), np.int32)
            for f in tfields:
                tf[:n, f.field_id] = self._fexpire[f.attribute]
            out["text_fexp"] = jnp.asarray(tf)
        for f in self.schema.fields:
            if f.type == FieldType.TEXT:
                continue
            vals = self._fexpire[f.attribute]
            if any(vals):
                col = np.zeros(n_pad, np.int32)
                col[:n] = vals
                out["field_fexp"][f.attribute] = jnp.asarray(col)
        return out
