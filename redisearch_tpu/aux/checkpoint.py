"""Index checkpoint save/restore.

Reference: RDB persistence (src/rdb.c, spec.c:2990/3069) where most index
content is *rebuilt* from the keyspace on load, except vector graphs which
serialize inline (vector_index.c:497-512).  SURVEY.md §5.4: on TPU the
index IS arrays, so checkpointing is direct array serialization — one .npz
of every device array + a pickled host-side catalog (schema, doc table,
term dictionaries, synonyms).  No rebuild pass, no load-time throttling.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
from typing import Any

import numpy as np

FORMAT_VERSION = 1


def _collect_arrays(seg, prefix: str, arrays: dict, meta: dict):
    """Flatten a Segment's device arrays into the npz dict."""
    import jax.numpy as jnp

    def put(name, x):
        if x is not None and hasattr(x, "shape"):
            arrays[f"{prefix}.{name}"] = np.asarray(x)

    put("gids", seg.gids)
    put("alive", seg.alive)
    put("doclen", seg.doclen)
    put("max_freq", seg.max_freq)
    put("docscore", seg.docscore)
    put("expire_at", seg.expire_at)
    t = seg.text
    for n in ("term_offsets", "doc_ids", "freqs", "field_masks",
              "doclens", "pos_offsets", "poskeys"):
        put(f"text.{n}", getattr(t, n))
    meta[prefix] = {
        "n_docs": seg.n_docs, "n_pad": seg.n_pad,
        "n_deleted": seg.n_deleted, "has_ttl": seg.has_ttl,
        "uniform_docscore": seg.uniform_docscore,
        "cold": seg.cold,
        "pos_stride": t.pos_stride,
        "pos_clamped": bool(t.pos_clamped), "nnz": t.nnz,
        "max_postings": t.max_postings,
        "tag_fields": list(seg.tags), "numeric_fields": list(seg.numerics),
        "geo_fields": list(seg.geos), "str_fields": list(seg.strcols),
        "vector_fields": list(seg.vectors), "missing_fields":
        list(seg.missing),
    }
    for attr, tp in seg.tags.items():
        put(f"tag.{attr}.offsets", tp.offsets)
        put(f"tag.{attr}.doc_ids", tp.doc_ids)
        if tp.codes is not None:
            put(f"tag.{attr}.codes", tp.codes)
        meta[prefix][f"tag.{attr}"] = {"nnz": tp.nnz,
                                       "max_postings": tp.max_postings}
    for attr, c in seg.numerics.items():
        put(f"num.{attr}.values", c.values)
        put(f"num.{attr}.present", c.present)
        if c.multi:
            put(f"num.{attr}.mv", c.multi_values)
            put(f"num.{attr}.mp", c.multi_present)
    for attr, g in seg.geos.items():
        put(f"geo.{attr}.lon", g.lon)
        put(f"geo.{attr}.lat", g.lat)
        put(f"geo.{attr}.present", g.present)
    for attr, s in seg.strcols.items():
        put(f"str.{attr}.value_ids", s.value_ids)
        put(f"str.{attr}.order", s.order)
    for attr, v in seg.vectors.items():
        if v.compression:
            # LVQ8: persist the codes (uint8) + dequant pair — the
            # compressed form is the source of truth (4x smaller
            # checkpoints too)
            arrays[f"{prefix}.vec.{attr}.vecs"] = np.asarray(v.vecs)
            put(f"vec.{attr}.vqoff", v.vq_off)
            put(f"vec.{attr}.vqscl", v.vq_scl)
        else:
            arrays[f"{prefix}.vec.{attr}.vecs"] = np.asarray(
                v.vecs.astype(jnp.float32))
        put(f"vec.{attr}.present", v.present)
        put(f"vec.{attr}.sq", v.sq_norms)
        if v.multi:
            put(f"vec.{attr}.doc_rows", v.doc_rows)
        # persist trained centroids so load can rebuild the IVF/host-tier
        # structures by assignment only (no k-means retrain)
        if v.host and v.host_ivf is not None:
            put(f"vec.{attr}.cents", v.host_ivf.centroids)
        elif v.ivf is not None:
            put(f"vec.{attr}.cents", v.ivf.centroids)
        meta[prefix][f"vec.{attr}"] = {"dim": v.dim, "multi": v.multi,
                                       "host": v.host,
                                       "compression": v.compression}
    for attr, m in seg.missing.items():
        put(f"missing.{attr}", m)
    if seg.text_fexp is not None:
        put("text_fexp", seg.text_fexp)
    for attr, col in seg.field_fexp.items():
        put(f"fexp.{attr}", col)
    meta[prefix]["fexp_fields"] = list(seg.field_fexp)


def save(index, path: str) -> None:
    """Checkpoint a SearchIndex to `path` (a directory)."""
    index.commit()
    os.makedirs(path, exist_ok=True)
    arrays: dict[str, np.ndarray] = {}
    meta: dict[str, Any] = {"version": FORMAT_VERSION,
                            "n_segments": len(index.segments)}
    for i, seg in enumerate(index.segments):
        _collect_arrays(seg, f"seg{i}", arrays, meta)
    np.savez_compressed(os.path.join(path, "arrays.npz"), **arrays)
    host = {
        "schema": index.schema,
        "doctable": index.doctable,
        "synonyms": index.synonyms,
        "stopwords": list(index.stopwords),
        "terms": [(seg.terms.ids, seg.terms.terms, seg.terms.doc_freq)
                  for seg in index.segments],
        "tag_dicts": [{attr: (tp.ids, tp.values)
                       for attr, tp in seg.tags.items()}
                      for seg in index.segments],
        "strtables": [{attr: s.table for attr, s in seg.strcols.items()}
                      for seg in index.segments],
        "geometries": [seg.geometries for seg in index.segments],
        "gid_to_local": [seg.gid_to_local for seg in index.segments],
        "vec_dtypes": [{attr: str(v.vecs.dtype)
                        for attr, v in seg.vectors.items()}
                       for seg in index.segments],
    }
    with open(os.path.join(path, "host.pkl"), "wb") as f:
        pickle.dump(host, f)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load(path: str):
    """Restore a SearchIndex checkpoint."""
    import jax.numpy as jnp

    from ..index.index import SearchIndex
    from ..index.segment import (GeoColumn, NumericColumn, Segment,
                                 StrColumn, TagPostings, TermDict,
                                 TextPostings, VectorColumn,
                                 make_numeric_column)

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("version") != FORMAT_VERSION:
        raise ValueError(f"bad checkpoint version {meta.get('version')}")
    with open(os.path.join(path, "host.pkl"), "rb") as f:
        host = pickle.load(f)
    npz = np.load(os.path.join(path, "arrays.npz"))

    index = SearchIndex(host["schema"])
    index.doctable = host["doctable"]
    index.synonyms = host["synonyms"]

    def arr(name, as_jnp=True):
        a = npz[name]
        return jnp.asarray(a) if as_jnp else a

    for i in range(meta["n_segments"]):
        p = f"seg{i}"
        sm = meta[p]
        cold = bool(sm.get("cold"))
        csr = (lambda name: np.asarray(npz[name])) if cold else arr
        ids, terms, dfs = host["terms"][i]
        td = TermDict(ids=ids, terms=terms, doc_freq=np.asarray(dfs))
        text = TextPostings(
            term_offsets=csr(f"{p}.text.term_offsets"),
            doc_ids=csr(f"{p}.text.doc_ids"),
            freqs=csr(f"{p}.text.freqs"),
            field_masks=csr(f"{p}.text.field_masks"),
            doclens=csr(f"{p}.text.doclens"),
            pos_offsets=csr(f"{p}.text.pos_offsets"),
            poskeys=csr(f"{p}.text.poskeys"),
            pos_stride=sm["pos_stride"],
            pos_clamped=bool(sm.get("pos_clamped", False)),
            nnz=sm["nnz"],
            max_postings=sm["max_postings"],
            term_offsets_np=np.asarray(npz[f"{p}.text.term_offsets"]),
            pos_offsets_np=np.asarray(
                npz[f"{p}.text.pos_offsets"]).astype(np.int64),
        )
        tags = {}
        for attr in sm["tag_fields"]:
            tids, tvals = host["tag_dicts"][i][attr]
            tmeta = sm[f"tag.{attr}"]
            tags[attr] = TagPostings(
                ids=tids, values=tvals,
                offsets=csr(f"{p}.tag.{attr}.offsets"),
                doc_ids=csr(f"{p}.tag.{attr}.doc_ids"),
                nnz=tmeta["nnz"], max_postings=tmeta["max_postings"],
                offsets_np=np.asarray(npz[f"{p}.tag.{attr}.offsets"]),
                codes=(arr(f"{p}.tag.{attr}.codes")
                       if f"{p}.tag.{attr}.codes" in npz.files else None),
            )
        numerics = {}
        for attr in sm["numeric_fields"]:
            vals = np.asarray(npz[f"{p}.num.{attr}.values"])
            pres = np.asarray(npz[f"{p}.num.{attr}.present"])
            # rebuild the sorted permutation (cheap relative to load IO)
            if f"{p}.num.{attr}.mv" in npz.files:
                mv = np.asarray(npz[f"{p}.num.{attr}.mv"])
                mp = np.asarray(npz[f"{p}.num.{attr}.mp"])
                lists = [list(mv[r][mp[r]]) for r in range(sm["n_docs"])]
                numerics[attr] = make_numeric_column(
                    np.where(pres, vals, np.nan), sm["n_docs"],
                    value_lists=lists)
            else:
                numerics[attr] = make_numeric_column(
                    np.where(pres, vals, np.nan), sm["n_docs"])
        geos = {attr: GeoColumn(lon=arr(f"{p}.geo.{attr}.lon"),
                                lat=arr(f"{p}.geo.{attr}.lat"),
                                present=arr(f"{p}.geo.{attr}.present"))
                for attr in sm["geo_fields"]}
        strcols = {attr: StrColumn(value_ids=arr(f"{p}.str.{attr}.value_ids"),
                                   table=host["strtables"][i][attr],
                                   order=arr(f"{p}.str.{attr}.order"))
                   for attr in sm["str_fields"]}
        vectors = {}
        for attr in sm["vector_fields"]:
            dt = host["vec_dtypes"][i][attr]
            vmeta = sm[f"vec.{attr}"]
            metric = host["schema"].field(attr).vector.metric.value
            cents = (np.asarray(npz[f"{p}.vec.{attr}.cents"])
                     if f"{p}.vec.{attr}.cents" in npz.files else None)
            if vmeta.get("host"):
                from ..ops.ivf import HostIVF
                pres = np.asarray(npz[f"{p}.vec.{attr}.present"])
                comp = vmeta.get("compression", "")
                if comp:
                    mat = np.asarray(npz[f"{p}.vec.{attr}.vecs"],
                                     np.uint8)
                    off = np.asarray(npz[f"{p}.vec.{attr}.vqoff"],
                                     np.float32)
                    scl = np.asarray(npz[f"{p}.vec.{attr}.vqscl"],
                                     np.float32)
                    hivf = (HostIVF.build_lvq(mat, off, scl, pres,
                                              metric, centroids=cents)
                            if cents is not None else None)
                    vectors[attr] = VectorColumn(
                        vecs=mat, present=jnp.asarray(pres),
                        dim=vmeta["dim"],
                        sq_norms=np.asarray(npz[f"{p}.vec.{attr}.sq"]),
                        host=True, host_ivf=hivf, compression=comp,
                        vq_off=off, vq_scl=scl)
                    continue
                mat = np.asarray(npz[f"{p}.vec.{attr}.vecs"], np.float32)
                vectors[attr] = VectorColumn(
                    vecs=mat, present=jnp.asarray(pres),
                    dim=vmeta["dim"],
                    sq_norms=np.asarray(npz[f"{p}.vec.{attr}.sq"]),
                    host=True,
                    host_ivf=(HostIVF.build(mat, pres, metric,
                                            centroids=cents)
                              if cents is not None else None))
                continue
            ivf = None
            if cents is not None:
                from ..ops.ivf import IVFIndex
                ivf = IVFIndex.build(
                    np.asarray(npz[f"{p}.vec.{attr}.vecs"], np.float32),
                    np.asarray(npz[f"{p}.vec.{attr}.present"]), metric,
                    centroids=cents)
            from ..index.segment import bf16_scan_copy
            dev = jnp.asarray(npz[f"{p}.vec.{attr}.vecs"],
                              dtype=jnp.dtype(dt))
            multi = bool(vmeta.get("multi"))
            vectors[attr] = VectorColumn(
                vecs=dev,
                present=arr(f"{p}.vec.{attr}.present"),
                dim=vmeta["dim"],
                sq_norms=arr(f"{p}.vec.{attr}.sq"),
                scan_vecs=None if multi else bf16_scan_copy(dev),
                doc_rows=(arr(f"{p}.vec.{attr}.doc_rows")
                          if multi else None),
                multi=multi,
                ivf=ivf,
            )
        missing = {attr: arr(f"{p}.missing.{attr}")
                   for attr in sm["missing_fields"]}
        seg = Segment(
            n_docs=sm["n_docs"], n_pad=sm["n_pad"],
            gids=arr(f"{p}.gids"), alive=arr(f"{p}.alive"),
            doclen=arr(f"{p}.doclen"), max_freq=arr(f"{p}.max_freq"),
            docscore=arr(f"{p}.docscore"), expire_at=arr(f"{p}.expire_at"),
            terms=td, text=text, tags=tags, numerics=numerics, geos=geos,
            strcols=strcols, vectors=vectors, missing=missing,
            gid_to_local=host["gid_to_local"][i],
            geometries=host["geometries"][i],
            n_deleted=sm.get("n_deleted", 0),
            has_ttl=sm.get("has_ttl", True),
            uniform_docscore=sm.get("uniform_docscore", False),
            cold=cold,
            text_fexp=(arr(f"{p}.text_fexp")
                       if f"{p}.text_fexp" in npz.files else None),
            field_fexp={attr: arr(f"{p}.fexp.{attr}")
                        for attr in sm.get("fexp_fields", [])},
        )
        index.segments.append(seg)
    return index
