"""The SURVEY §2 query contract registry.

Every operator the engine claims is registered here as a named query:
a ``(spark_fn, oracle_sql)`` pair. ``spark_fn(spark, sf_dir)`` returns a
DataFrame built with the engine's operators; ``oracle_sql`` is equivalent
ANSI SQL for DuckDB over the same parquet views (None → streaming /
approximate ops that get the driver's weaker rows-only check).

Conventions enforced across the whole registry (SURVEY §2 inventory note):
- every computed column is aliased IDENTICALLY in Spark and oracle SQL;
- every floating-point aggregate is ``round(x, 6)`` on BOTH sides;
- ``collect_*`` results are sorted and joined to strings (portable hashing);
- raw ``events.ts`` projections are truncated to microseconds on the oracle
  side (DuckDB reads the nanos natively).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: SparkFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

#: Modules that self-register queries on import (one per SURVEY §2 family).
_QUERY_MODULES = (
    "streamline_hybrid_engine_spark.sources.io",
    "streamline_hybrid_engine_spark.operators.rowops",
    "streamline_hybrid_engine_spark.operators.joins",
    "streamline_hybrid_engine_spark.operators.aggregates",
    "streamline_hybrid_engine_spark.operators.windows",
    "streamline_hybrid_engine_spark.operators.sort_limit",
    "streamline_hybrid_engine_spark.operators.setops",
    "streamline_hybrid_engine_spark.operators.reshape",
    "streamline_hybrid_engine_spark.operators.subqueries",
    "streamline_hybrid_engine_spark.operators.time_windows",
    "streamline_hybrid_engine_spark.operators.cep",
    "streamline_hybrid_engine_spark.operators.graph",
    "streamline_hybrid_engine_spark.operators.enrichment",
    "streamline_hybrid_engine_spark.operators.metrics",
    "streamline_hybrid_engine_spark.operators.tpch_shapes",
    "streamline_hybrid_engine_spark.operators.tpch_suite",
    "streamline_hybrid_engine_spark.operators.sketches",
    "streamline_hybrid_engine_spark.operators.ivm",
    "streamline_hybrid_engine_spark.sources.pydatasource",
    "streamline_hybrid_engine_spark.functions.bundles",
    "streamline_hybrid_engine_spark.functions.udfs",
    "streamline_hybrid_engine_spark.llm.dedup",
    "streamline_hybrid_engine_spark.llm.similarity",
    "streamline_hybrid_engine_spark.llm.text",
    "streamline_hybrid_engine_spark.llm.selection",
    "streamline_hybrid_engine_spark.llm.multimodal",
    "streamline_hybrid_engine_spark.streaming.jobs",
)

_loaded = False


def query(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[SparkFn], SparkFn]:
    """Decorator: register ``fn`` as contract query ``name``."""

    def deco(fn: SparkFn) -> SparkFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, tuple(tags), fn.__doc__ or "")
        return fn

    return deco


def _load() -> None:
    global _loaded
    if not _loaded:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _loaded = True


def all_queries() -> dict[str, Query]:
    _load()
    return dict(_REGISTRY)


def get_query(name: str) -> Query:
    _load()
    return _REGISTRY[name]
