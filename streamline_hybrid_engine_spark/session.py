"""SparkSession factory with pinned configs.

The reference (Flink 1.x) pins its runtime behavior via flink-conf.yaml
(managed memory fractions, network buffers). Our equivalent is a small set
of SQL configs chosen for correctness-vs-oracle and for 100 TB scale-out:

- ANSI on (Spark 4 default): matches DuckDB/Calcite arithmetic semantics.
- ``nanosAsLong``: the fixture ``events.parquet`` carries TIMESTAMP(NANOS),
  which Spark 4 otherwise refuses (PARQUET_TYPE_ILLEGAL). See catalog.py.
- UTC session timezone: deterministic rendering vs the (tz-naive) oracle.
- AQE on: runtime re-planning (skew joins, broadcast conversion) — the
  scale story replaces Flink's static cost-based optimizer choices.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configs that MUST be set before the JVM reads any fixture parquet.
STATIC_CONFS: dict[str, str] = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas exchange path (UDFs, toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # local-mode shuffle: sized by cpus(); at cluster scale AQE coalesces.
    "spark.sql.ansi.enabled": "true",
    # Let the planner pick shuffled-hash over sort-merge when its size
    # conditions hold, and let AQE rewrite SMJ->SHJ when every post-shuffle
    # partition is under 64 MB (guide §3.1/§9): drops the per-partition
    # sorts on every non-broadcast equi-join. Size-guarded on both paths
    # (static: canBuildLocalHashMap; runtime: the 64 MB local-map bound),
    # so per-task build memory stays bounded at cluster scale. Measured
    # r13 interleaved A/B on SMJ-heavy queries: -5..10% (graph_modularity
    # 3.2-3.5 -> 3.0 s, llm_dedup_keep 3.3-3.5 -> 3.0 s, CC 2.0-2.2 ->
    # 1.9 s), no row worse.
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "67108864",
}


def cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_session(app_name: str = "streamline-hybrid-engine-spark") -> SparkSession:
    """Build (or reuse) a local session with the engine's pinned configs."""
    n = cpus()
    import tempfile

    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # static conf: managed tables (bucketing tests/demos) land in tmp,
        # never in the repo working directory
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "she_warehouse"),
        )
    )
    for k, v in STATIC_CONFS.items():
        b = b.config(k, v)
    return b.getOrCreate()


def ensure_runtime_confs(spark: SparkSession) -> None:
    """Best-effort re-pin of runtime-settable confs on a foreign session.

    The driver hands us ITS SparkSession; these confs are all runtime-settable
    in Spark 4 and are required for oracle parity (UTC rendering) and for
    reading the nanos-timestamp fixture.

    Shuffle width is additionally pinned to the session's core count: a
    foreign session at the 200-partition default makes every STATEFUL
    streaming job build 200 state-store partitions per micro-batch (the
    state partition count is fixed at first checkpoint, before AQE can
    coalesce anything) — measured ~3× slower across the streaming suite on
    local[8]. Batch queries are unaffected (AQE already right-sizes them).
    """
    confs = dict(STATIC_CONFS)
    confs["spark.sql.shuffle.partitions"] = str(
        spark.sparkContext.defaultParallelism
    )
    for k, v in confs.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this build — catalog has a pyarrow fallback
