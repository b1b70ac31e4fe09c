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
    if not hq.vsim_field:
        raise QuerySyntaxError("FT.HYBRID requires a VSIM field")
    index.commit()

    # both branches in one batched execution: per-branch dispatches are
    # submitted together and collected in a single round (the
    # reference's parallel depleter drain; here the device pipeline is
    # the second lane and each collect costs a full link round trip)
    vec = np.asarray(hq.vsim_vector, np.float32)
    text_res, knn_res = index.search_many(
        [hq.search,
         f"*=>[KNN {hq.window} @{hq.vsim_field} $__hybrid_vec]"],
        params=[hq.search_params, {"__hybrid_vec": vec}],
        k=hq.window,
        opts_list=[QueryOptions(scorer=hq.search_scorer, k=hq.window),
                   QueryOptions(k=hq.window)])
    text_hits = text_res.hits
    knn_hits = knn_res.hits

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
