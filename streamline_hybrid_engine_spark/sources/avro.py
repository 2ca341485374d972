"""Avro source/sink builders — SURVEY §2.1 (Flink flink-formats/flink-avro).

Avro is Spark's "built-in but external" format: the Avro CORE jars ship in
the distribution (``avro-1.12.x``), but the DataSource module
(``spark-avro_2.13``) must be added via ``spark.jars.packages`` and is
absent in this container (verified: ``format("avro")`` raises
FAILED_TO_FIND_DATA_SOURCE). Like sources/jdbc.py and sources/kafka.py,
these builders construct the full read/write plan and fail with a clear,
tested message when the module is missing; on a real cluster add
``org.apache.spark:spark-avro_2.13:<spark-version>`` and everything here
works unchanged.

Scale notes (100 TB design point):
- Avro is a ROW format: no column pruning or predicate pushdown at the
  reader (every byte of every row is decoded). Use it for ingestion
  interchange (Kafka payloads, cross-system dumps); convert to parquet at
  the lake boundary — ``read_avro(...).write.parquet(...)`` IS that
  converter, one pass, preserving partitioning.
- Schema evolution: pass ``avro_schema`` (reader schema) to decode old
  files under a new schema — Avro resolves fields by name with defaults,
  the row-format analog of ``mergeSchema`` on parquet
  (``scan_merge_schema``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class AvroModuleMissing(RuntimeError):
    def __init__(self, path: str) -> None:
        super().__init__(
            f"Avro access to {path!r} requires the spark-avro module on the "
            "classpath (spark.jars.packages="
            "org.apache.spark:spark-avro_2.13:<spark-version>); the Avro "
            "DataSource is external to the Spark distribution and absent in "
            "this container"
        )


def read_avro(
    spark: SparkSession, path: str, avro_schema: str | None = None
) -> DataFrame:
    """Avro file scan; ``avro_schema`` is an optional READER schema (JSON
    text) for schema-evolution decoding of older files."""
    reader = spark.read.format("avro")
    if avro_schema:
        reader = reader.option("avroSchema", avro_schema)
    try:
        return reader.load(path)
    except Exception as e:  # spark-avro module absent in this container
        raise AvroModuleMissing(path) from e


def write_avro(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str = "snappy"
) -> None:
    """Avro file sink (container-level ``compression``: snappy/deflate/
    zstandard) — the interchange-format write half of the lake boundary."""
    writer = df.write.format("avro").option("compression", compression).mode(mode)
    try:
        writer.save(path)
    except Exception as e:
        raise AvroModuleMissing(path) from e
