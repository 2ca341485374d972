"""Job metrics / accumulators — the Flink accumulator analog.

Reference analog: Flink accumulators (``IntCounter``, ``LongCounter``,
``Histogram`` — flink-core .../accumulators/), registered inside operators
and collected with the job result via
``ExecutionEnvironment.getLastJobExecutionResult()``. Spark's native
equivalent is ``DataFrame.observe`` + ``Observation``: named aggregate
expressions evaluated AS THE DATA FLOWS THROUGH the plan (an
``CollectMetrics`` node), collected on the driver after any action — no
second scan, no separate counting job.

Scale note: observed metrics are accumulator-style partial aggregates
merged at task completion — constant driver memory, zero extra shuffle.
The deterministic-sum convention (fixed-point micros) applies inside the
observe expressions exactly as in ordinary aggregates, so the collected
numbers are partitioning-independent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from streamline_hybrid_engine_spark.catalog import load_table
from streamline_hybrid_engine_spark.functions.numeric import MICROS, osum
from streamline_hybrid_engine_spark.registry import query


@query(
    "observe_pipeline_metrics",
    oracle=f"""
    SELECT count(*) AS n_rows,
           {osum("l_extendedprice * (1 - l_discount)", "revenue")},
           CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_deep_disc
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    """,
    tags=("metrics", "accumulators"),
)
def observe_pipeline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-side metrics via ``observe``: row count, deterministic
    revenue sum, and a predicate counter ride along with the scan the way
    Flink accumulators ride an operator — the action here stands in for
    whatever the pipeline's real action is (a sink write at 100 TB).

    The result is the collected metrics row itself, so the oracle checks
    the accumulator VALUES, not just that the plumbing ran."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    try:
        from pyspark.sql import Observation
    except ImportError:  # pragma: no cover - Observation exists since 3.3
        Observation = None
    rev_micros = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * MICROS
    ).cast("long")
    deep = F.when(F.col("l_discount") > 0.05, 1).otherwise(0)
    metrics = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(rev_micros).alias("rev_micros"),
        F.sum(deep).alias("n_deep_disc"),
    ]
    if Observation is None:  # degraded path: plain aggregate (same numbers)
        row = li.agg(*metrics).collect()[0]
        vals = row.asDict()
    else:
        obs = Observation()
        observed = li.observe(obs, *metrics)
        observed.count()  # any full-pass action flushes the metrics
        vals = obs.get
    return spark.createDataFrame(
        [
            (
                int(vals["n_rows"]),
                round(vals["rev_micros"] / MICROS, 6),
                int(vals["n_deep_disc"]),
            )
        ],
        "n_rows bigint, revenue double, n_deep_disc bigint",
    )
