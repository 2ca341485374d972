"""Custom data source via the Python Data Source API — SURVEY §2.1.

Reference analog: Flink's user-defined ``InputFormat`` (FileInputFormat
subclasses, ~900 LoC base) — the extension point users implement to read
bespoke formats/systems. Spark 4's equivalent is the Python Data Source
API (``pyspark.sql.datasource``): declare schema, enumerate
InputPartitions (the split/parallelism contract, = Flink's
``createInputSplits``), and yield rows per partition — the engine handles
scheduling, Arrow transfer, and composition with the whole relational
surface.

The demo source generates deterministic synthetic telemetry (multiplicative
-hash scores), so the full path — partition planning, per-partition
generation, downstream aggregation — is oracle-checkable against DuckDB
``generate_series`` arithmetic. A real connector (REST pages, message
queue, proprietary format) swaps the generator loop only.

Scale notes: partitions are independent generator tasks (no driver
bottleneck, no shuffle until the query asks for one); options flow from
``.option(...)`` so parallelism is caller-controlled. Python-side row
generation is the honest cost of the extension point — columnar/Arrow
batch yield (``read`` returning pyarrow batches) is the fast path when
the source format supports it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from streamline_hybrid_engine_spark.registry import query

N_ROWS = 10_000
N_PARTS = 8
MULT = 2654435761  # Knuth multiplicative hash constant
MOD = 1_000_003


def _register(spark: SparkSession) -> None:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _Part(InputPartition):
        def __init__(self, start: int, end: int) -> None:
            self.start, self.end = start, end

    class SyntheticTelemetryReader(DataSourceReader):
        def __init__(self, options) -> None:
            self.n = int(options.get("n", N_ROWS))
            self.parts = int(options.get("partitions", N_PARTS))

        def partitions(self):
            step = -(-self.n // self.parts)  # ceil
            return [
                _Part(i * step, min((i + 1) * step, self.n))
                for i in range(self.parts)
                if i * step < self.n
            ]

        def read(self, partition):
            for i in range(partition.start, partition.end):
                yield (i, i % 7, (i * MULT) % MOD)

    class SyntheticTelemetrySource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "synthetic_telemetry"

        def schema(self) -> str:
            return "id BIGINT, bucket INT, score BIGINT"

        def reader(self, schema):
            return SyntheticTelemetryReader(self.options)

    try:
        spark.dataSource.register(SyntheticTelemetrySource)
    except Exception:
        pass  # already registered in this session


@query(
    "scan_python_datasource",
    oracle=f"""
    SELECT CAST(i % 7 AS INT) AS bucket,
           count(*) AS n,
           CAST(sum((i * {MULT}) % {MOD}) AS BIGINT) AS sum_score,
           CAST(max((i * {MULT}) % {MOD}) AS BIGINT) AS max_score
    FROM (SELECT unnest(range(0, {N_ROWS})) AS i)
    GROUP BY bucket
    """,
    tags=("sources", "datasource"),
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python Data Source end to end: register the format, read it
    with caller-chosen partitioning, aggregate downstream like any table.
    The oracle recomputes the deterministic generator arithmetically, so
    partition planning + per-partition generation + Arrow handoff are all
    value-checked."""
    _register(spark)
    df = (
        spark.read.format("synthetic_telemetry")
        .option("n", str(N_ROWS))
        .option("partitions", str(N_PARTS))
        .load()
    )
    return df.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.sum("score").alias("sum_score"),
        F.max("score").alias("max_score"),
    )
