"""Kafka source/sink builders — SURVEY §2.1 (FlinkKafkaConsumer/Producer).

No broker (or kafka-sql connector jar) ships in this environment, so these
builders construct the streaming plan and fail with a clear message if the
connector is absent; the transformation logic they attach is the SAME code
the file-source jobs run (streaming/jobs.py), which is how the rest of the
pipeline stays tested. On a real cluster add
``org.apache.spark:spark-sql-kafka-0-10_2.13`` to ``spark.jars.packages``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

#: value schema expected on the events topic (JSON-encoded fixture rows)
EVENTS_JSON_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)

#: JSON codec options — to_json's DEFAULT timestamp format truncates to
#: milliseconds, silently losing the microsecond digits the rest of the
#: engine treats as exact (verified by the broker-free round-trip test).
#: Both directions must pin the same micro-precision format.
JSON_CODEC_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}


class KafkaConnectorMissing(RuntimeError):
    def __init__(self) -> None:
        super().__init__(
            "Kafka source requires the spark-sql-kafka connector on the "
            "classpath (spark.jars.packages="
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version>)"
        )


def read_events_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """events topic → typed streaming DataFrame (value is JSON per row).

    Mirrors Flink's FlinkKafkaConsumer + DeserializationSchema: offsets are
    tracked in the checkpoint (exactly-once with idempotent/txn sinks).
    """
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:  # connector jar absent in this container
        raise KafkaConnectorMissing() from e
    return raw.select(
        F.from_json(
            F.col("value").cast("string"), EVENTS_JSON_SCHEMA, JSON_CODEC_OPTS
        ).alias("r")
    ).select("r.*")


def write_stream_kafka(
    df: DataFrame, bootstrap_servers: str, topic: str, checkpoint: str
):
    """DataFrame → Kafka sink (FlinkKafkaProducer analog); key by user_id
    for per-key ordering, value = full row as JSON."""
    out = df.select(
        F.col("user_id").cast("string").alias("key"),
        F.to_json(F.struct("*"), JSON_CODEC_OPTS).alias("value"),
    )
    try:
        return (
            out.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic)
            .option("checkpointLocation", checkpoint)
            .start()
        )
    except Exception as e:
        raise KafkaConnectorMissing() from e
