"""FT.HYBRID: combined text + vector retrieval with score fusion.

Reference: src/hybrid/ (HybridRequest, hybrid_request.h:30-60) — two
subqueries (SEARCH and VSIM), drained in parallel and merged by
RPHybridMerger with RRF (1/(rank+c), c=60) or LINEAR (alpha*text +
beta*vector) scoring (hybrid_scoring.h:13-19), followed by a tail pipeline
(APPLY/FILTER/GROUPBY/SORTBY/LIMIT).

Here both branches are device programs sharing the same segments, so
"parallel drain" is simply two jit dispatches; fusion is a host merge over
the two top-window lists (window sizes are small).  LINEAR normalizes the
text branch with BM25STD.TANH and the vector branch with 1/(1+dist),
matching the reference's normalized-score requirement.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np

from ..agg.pipeline import AggregateRequest, _run_steps
from ..query.engine import QueryOptions
from ..utils.errors import QuerySyntaxError

RRF_DEFAULT_CONSTANT = 60
DEFAULT_WINDOW = 20


@dataclasses.dataclass
class HybridQuery:
    """FT.HYBRID <idx> SEARCH <query> VSIM @<field> <vec> [COMBINE ...]"""

    search: str = "*"
    vsim_field: str = ""
    vsim_vector: Any = None
    search_params: Optional[dict] = None
    search_scorer: str = "BM25STD.TANH"
    combine: str = "RRF"                 # RRF | LINEAR
    rrf_constant: float = RRF_DEFAULT_CONSTANT
    window: int = DEFAULT_WINDOW
    alpha: float = 0.5                   # LINEAR text weight
    beta: float = 0.5                    # LINEAR vector weight
    knn_ef_runtime: Optional[int] = None
    limit: int = 10
    yield_score_as: Optional[str] = None


def run_hybrid(index, hq: HybridQuery,
               tail: Optional[AggregateRequest] = None) -> list[dict]:
    """Execute both branches + fusion + optional tail pipeline."""
    return run_hybrid_many(index, [hq], [tail])[0]


def run_hybrid_many(index, hqs: list,
                    tails: Optional[list] = None) -> list[list[dict]]:
    """Batched FT.HYBRID: every query's SEARCH and VSIM branches ride
    ONE search_many round (grouped device batches — same-structure
    branches share a dispatch), then fusion + tails run on host.  The
    serving analog of the reference's hybrid benchmark family
    (tests/benchmarks/hybrid-*.yml): the parallel depleter drain
    becomes two device batch lanes collected together."""
    for hq in hqs:
        if not hq.vsim_field:
            raise QuerySyntaxError("FT.HYBRID requires a VSIM field")
    index.commit()

    queries, params, opts = [], [], []
    for hq in hqs:
        vec = np.asarray(hq.vsim_vector, np.float32)
        queries.append(hq.search)
        params.append(hq.search_params)
        opts.append(QueryOptions(scorer=hq.search_scorer, k=hq.window))
        queries.append(
            f"*=>[KNN {hq.window} @{hq.vsim_field} $__hybrid_vec]")
        params.append({"__hybrid_vec": vec})
        opts.append(QueryOptions(k=hq.window))
    k_max = max(hq.window for hq in hqs)
    results = index.search_many(queries, params=params, k=k_max,
                                opts_list=opts)
    out = []
    for i, hq in enumerate(hqs):
        tail = tails[i] if tails else None
        out.append(_fuse(index, hq,
                         results[2 * i].hits[:hq.window],
                         results[2 * i + 1].hits[:hq.window], tail))
    return out


def _fuse(index, hq: HybridQuery, text_hits, knn_hits,
          tail: Optional[AggregateRequest] = None) -> list[dict]:
    fused: dict[str, dict] = {}
    if hq.combine.upper() == "RRF":
        for rank, h in enumerate(text_hits):
            e = fused.setdefault(h.key, {"__key": h.key, "__gid": h.gid,
                                         "__score": 0.0})
            e["__score"] += 1.0 / (rank + 1 + hq.rrf_constant)
            e["__text_score"] = h.score
        for rank, h in enumerate(knn_hits):
            e = fused.setdefault(h.key, {"__key": h.key, "__gid": h.gid,
                                         "__score": 0.0})
            e["__score"] += 1.0 / (rank + 1 + hq.rrf_constant)
            e["__vector_distance"] = h.vector_distance
    elif hq.combine.upper() == "LINEAR":
        for h in text_hits:
            e = fused.setdefault(h.key, {"__key": h.key, "__gid": h.gid,
                                         "__score": 0.0})
            e["__score"] += hq.alpha * h.score  # BM25STD.TANH in [0,1)
            e["__text_score"] = h.score
        for h in knn_hits:
            sim = 1.0 / (1.0 + max(h.vector_distance, 0.0))
            e = fused.setdefault(h.key, {"__key": h.key, "__gid": h.gid,
                                         "__score": 0.0})
            e["__score"] += hq.beta * sim
            e["__vector_distance"] = h.vector_distance
    else:
        raise QuerySyntaxError(f"bad COMBINE {hq.combine!r}")

    rows = sorted(fused.values(), key=lambda r: (-r["__score"], r["__key"]))
    # attach metas for the tail pipeline's LOAD
    for r in rows:
        r["__meta"] = index.doctable.get(r["__gid"])
    if hq.yield_score_as:
        for r in rows:
            r[hq.yield_score_as] = r["__score"]

    if tail is not None and tail.steps:
        tail.add_scores = True
        rows = _run_steps(index, tail, rows)
    else:
        rows = rows[:hq.limit]
        for r in rows:
            r.pop("__meta", None)
            r.pop("__gid", None)
    return rows
