"""JDBC source/sink builders — SURVEY §2.1 (Flink JDBCInputFormat /
JDBCAppendTableSink / JdbcSink).

No database (or JDBC driver jar) ships in this environment, so — like
sources/kafka.py — these builders construct the read/write plan and fail
with a clear message when the driver class is absent. On a real cluster add
the driver jar (e.g. ``org.postgresql:postgresql``) to
``spark.jars.packages`` and everything here works unchanged.

Scale notes (100 TB design point):
- A naive ``spark.read.jdbc(table)`` is a SINGLE-task scan — useless at
  scale. :func:`read_jdbc` therefore always takes partitioning bounds
  (partition_column/lower/upper/num_partitions) so Spark issues
  ``num_partitions`` range-predicated queries in parallel — the JDBC analog
  of parquet splits. Predicate pushdown still applies: filters on the
  returned DataFrame become WHERE clauses in each partition's query.
- Writes batch inserts per partition (``batchsize``); for exactly-once into
  a transactional store, stage to a temp table and atomically swap — the
  2PC pattern Flink's JdbcSink XA mode implements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class JdbcDriverMissing(RuntimeError):
    def __init__(self, url: str) -> None:
        super().__init__(
            f"JDBC access to {url!r} requires the driver jar on the classpath "
            "(e.g. spark.jars.packages=org.postgresql:postgresql:<version>); "
            "none ships in this container"
        )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 32,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel JDBC table scan: ``num_partitions`` range-split queries on
    ``partition_column`` (must be numeric/date and indexed for sane DB-side
    cost). Mirrors Flink's JDBCInputFormat + NumericBetweenParametersProvider.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # driver jar absent in this container
        raise JdbcDriverMissing(url) from e


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    """Batched parallel JDBC write (one connection per partition,
    ``batch_size``-row inserts) — Flink JDBCAppendTableSink analog."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    try:
        writer.save()
    except Exception as e:
        raise JdbcDriverMissing(url) from e
