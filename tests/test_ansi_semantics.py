"""ANSI-mode semantics (SURVEY §1.2): fail-fast arithmetic matching the
oracle engine — silent corruption is worse than an error at 100 TB."""

from __future__ import annotations

import pytest

from streamline_hybrid_engine_spark.sources.kafka import (
    KafkaConnectorMissing,
    read_events_kafka,
)


def test_ansi_mode_is_pinned_on(spark):
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_division_by_zero_throws(spark):
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        spark.sql("SELECT 1/0").collect()


def test_long_overflow_throws_not_wraps(spark):
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW"):
        spark.sql("SELECT 9223372036854775807 + CAST(1 AS BIGINT)").collect()


def test_bad_cast_throws(spark):
    with pytest.raises(Exception, match="CAST_INVALID_INPUT"):
        spark.sql("SELECT CAST('not a number' AS INT)").collect()


def test_try_variants_give_null_escape_hatch(spark):
    """Where pipeline code WANTS null-on-error, the try_* family is the
    sanctioned path — explicit, not a global mode flip."""
    row = spark.sql(
        "SELECT try_divide(1, 0) AS d, try_cast('x' AS INT) AS c,"
        " try_add(9223372036854775807, 1) AS a"
    ).first()
    assert row["d"] is None and row["c"] is None and row["a"] is None


def test_kafka_builder_fails_clearly_without_connector(spark):
    """The Kafka builder must raise the documented error in this
    connector-less container, not an opaque class-not-found."""
    with pytest.raises(KafkaConnectorMissing):
        read_events_kafka(spark, "localhost:9092", "events")


def test_jdbc_reader_fails_clearly_without_driver(spark):
    """The JDBC builder must raise the documented error in this driver-less
    container — and must always be constructed with partition bounds (the
    single-task JDBC scan footgun is not exposed at all)."""
    from streamline_hybrid_engine_spark.sources.jdbc import (
        JdbcDriverMissing,
        read_jdbc,
    )

    with pytest.raises(JdbcDriverMissing):
        read_jdbc(
            spark,
            "jdbc:postgresql://localhost:5432/nodb",
            "lineitem",
            partition_column="l_orderkey",
            lower_bound=1,
            upper_bound=6_000_000,
            num_partitions=32,
        ).count()


def test_jdbc_writer_fails_clearly_without_driver(spark):
    from streamline_hybrid_engine_spark.sources.jdbc import (
        JdbcDriverMissing,
        write_jdbc,
    )

    with pytest.raises(JdbcDriverMissing):
        write_jdbc(
            spark.range(3), "jdbc:postgresql://localhost:5432/nodb", "t_out"
        )


def test_kafka_value_codec_roundtrips_without_broker(spark, sf_dir):
    """The Kafka builders' value codec (to_json(struct(*)) on write,
    from_json(schema) on read — the DeserializationSchema analog) must
    round-trip the events schema exactly. Testable with zero broker: the
    codec is pure column expressions, identical in batch and streaming."""
    import pyspark.sql.functions as F

    from streamline_hybrid_engine_spark.catalog import load_table
    from streamline_hybrid_engine_spark.sources.kafka import (
        EVENTS_JSON_SCHEMA,
        JSON_CODEC_OPTS,
    )

    ev = load_table(spark, sf_dir, "events")
    wire = ev.select(
        F.col("user_id").cast("string").alias("key"),
        F.to_json(F.struct("*"), JSON_CODEC_OPTS).alias("value"),
    )
    back = wire.select(
        F.from_json(F.col("value"), EVENTS_JSON_SCHEMA, JSON_CODEC_OPTS).alias("r")
    ).select("r.*")
    orig = sorted(map(tuple, ev.collect()))
    rt = sorted(map(tuple, back.collect()))
    assert rt == orig


def test_avro_builder_fails_clearly_without_module(spark, tmp_path):
    """spark-avro is external to the distribution and absent here; both
    builders must raise the documented error, not a raw classpath stack."""
    from streamline_hybrid_engine_spark.sources.avro import (
        AvroModuleMissing,
        read_avro,
        write_avro,
    )

    with pytest.raises(AvroModuleMissing, match="spark-avro"):
        read_avro(spark, str(tmp_path / "in.avro"))
    df = spark.range(3)
    with pytest.raises(AvroModuleMissing, match="spark-avro"):
        write_avro(df, str(tmp_path / "out.avro"))
