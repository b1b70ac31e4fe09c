"""redisearch_tpu — a TPU-native search & aggregation framework.

A from-scratch reimplementation of RediSearch's capabilities (full-text
query language, scorers, numeric/tag/geo/geometry filters, vector KNN/range/
hybrid, aggregations, spellcheck/suggest/synonyms, distributed fan-out) with
a JAX/XLA/Pallas architecture: immutable device-resident segments, dense
mask/accumulator query evaluation, MXU distance scans, and SPMD sharding
over device meshes.  See SURVEY.md for the reference feature map.
"""

from .schema import (Field, FieldType, GeometryParams, IndexFlags, Schema,
                     VectorAlgo, VectorMetric, VectorParams)
from .index.index import Hit, SearchIndex, SearchResult
from .index.doctable import DocMeta, DocTable
from .query.engine import QueryOptions
from .agg.pipeline import ASC, DESC, AggregateRequest, AggregateResult
from .aux.hybrid import HybridQuery, run_hybrid_many
from .api import Client
from .utils import errors

__version__ = "0.1.0"


def enable_compilation_cache(path: str = "/tmp/redisearch_tpu_xla_cache",
                             min_compile_secs: float = 1.0) -> None:
    """Persist XLA executables across processes (serving restarts,
    benchmark runs).  First-compile of each query shape costs seconds —
    10-40 s through a remote attach — so a disk cache turns every warmup
    after the first process into a cache read."""
    import jax
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

__all__ = [
    "Field", "FieldType", "Schema", "IndexFlags", "VectorParams",
    "VectorAlgo", "VectorMetric", "GeometryParams", "SearchIndex",
    "SearchResult", "Hit", "DocTable", "DocMeta", "QueryOptions",
    "AggregateRequest", "AggregateResult", "ASC", "DESC", "HybridQuery",
    "run_hybrid_many",
    "Client", "errors",
]
