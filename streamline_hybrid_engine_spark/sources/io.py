"""Sources / sinks — SURVEY §2.1.

Reference analog: Flink's ``FileInputFormat`` family (``TextInputFormat``,
``CsvInputFormat``, avro/parquet via Hadoop IF) and ``BucketingSink``.
Spark: ``spark.read.<format>`` DataSource V2 — splittable, predicate-pushdown,
schema-on-read. The CSV round-trip proves the text/CSV path end-to-end
(write then re-read with an explicit schema — never inference, SURVEY §1.1).
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from streamline_hybrid_engine_spark.catalog import load_table
from streamline_hybrid_engine_spark.functions.numeric import osum, dsum
from streamline_hybrid_engine_spark.registry import query


@query(
    "scan_parquet_lineitem",
    oracle=f"""
    SELECT l_returnflag, count(*) AS n, {osum("l_extendedprice", "sum_price")}
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("sources",),
)
def scan_parquet_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native parquet scan: vectorized reader + column pruning (2 of 11 cols)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), dsum("l_extendedprice", "sum_price")
    )


@query(
    "scan_csv_roundtrip",
    oracle=f"""
    SELECT o_orderstatus, count(*) AS n, {osum("o_totalprice", "sum_price")}
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("sources", "csv"),
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source round-trip (Flink CsvInputFormat/OutputFormat analog).

    Writes orders (key/status/price — types that round-trip text exactly:
    doubles are serialized round-trippably by Spark CSV) to a temp CSV
    directory, re-reads with an explicit schema, aggregates. The aggregate
    must equal the same aggregate on the parquet original.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = os.path.join(
        tempfile.gettempdir(), f"she_csv_roundtrip_{os.path.basename(sf_dir)}"
    )
    o.write.mode("overwrite").option("header", "true").csv(out)
    back = spark.read.schema(
        "o_orderkey long, o_orderstatus string, o_totalprice double"
    ).option("header", "true").csv(out)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), dsum("o_totalprice", "sum_price")
    )


@query(
    "scan_json_roundtrip",
    oracle="""
    SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
    tags=("sources", "json"),
)
def scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source round-trip (Flink JSON-format analog).

    Writes documents to temp JSON-lines, re-reads with an explicit schema
    (never inference — one pass, SURVEY §1.1), aggregates; must equal the
    same aggregate over the parquet original.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = os.path.join(
        tempfile.gettempdir(), f"she_json_roundtrip_{os.path.basename(sf_dir)}"
    )
    d.write.mode("overwrite").json(out)
    back = spark.read.schema("doc_id long, lang string, n_chars long").json(out)
    return back.groupBy("lang").agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("total_chars")
    )
