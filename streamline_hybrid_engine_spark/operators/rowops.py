"""Row-level operators — SURVEY §2.2 (map/project, filter, flatMap, distinct,
conditional expressions).

Reference analog: Flink's ``MapOperator``/``FilterOperator``/``FlatMapOperator``
and the fused ``DataSetCalc`` (filter+project). In Spark all of these fuse
into one whole-stage-codegen'd pipeline over the columnar scan; ``explode``
is the flatMap analog and stays JVM-side (no Python).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from streamline_hybrid_engine_spark.catalog import load_table
from streamline_hybrid_engine_spark.functions.numeric import rnd
from streamline_hybrid_engine_spark.registry import query


@query(
    "project_disc_price",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE), 6) AS disc_price,
           round(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DOUBLE), 6) AS charge
    FROM lineitem
    """,
    tags=("rowops",),
)
def project_disc_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map/project: arithmetic projection, no shuffle, full codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rnd(disc, "disc_price"),
        rnd(disc * (1 + F.col("l_tax")), "charge"),
    )


@query(
    "filter_shipdate_qty",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_quantity, 6) AS qty,
           round(l_extendedprice, 6) AS price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_quantity BETWEEN 5 AND 15
      AND l_returnflag <> 'A'
    """,
    tags=("rowops",),
)
def filter_shipdate_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter: conjunctive predicate, pushed down to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_quantity").between(5, 15)
        & (F.col("l_returnflag") != "A")
    ).select(
        "l_orderkey",
        "l_linenumber",
        rnd("l_quantity", "qty"),
        rnd("l_extendedprice", "price"),
    )


@query(
    "flatmap_explode_tokens",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    """,
    tags=("rowops", "flatmap"),
)
def flatmap_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatMap: one row → N token rows via explode (JVM generator, no UDF)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .count()
        .withColumnRenamed("count", "n")
    )


@query(
    "distinct_custkeys",
    oracle="SELECT DISTINCT o_custkey FROM orders",
    tags=("rowops",),
)
def distinct_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct rows — partial-agg dedup before the shuffle (scales)."""
    return load_table(spark, sf_dir, "orders").select("o_custkey").distinct()


@query(
    "case_when_segment",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 9000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg,
           CASE WHEN c_mktsegment IN ('AUTOMOBILE', 'MACHINERY') THEN 1 ELSE 0 END AS is_industrial,
           CASE WHEN c_name LIKE '%0001%' THEN 1 ELSE 0 END AS name_like
    FROM customer
    """,
    tags=("rowops", "expr"),
)
def case_when_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/NULLIF/IN/LIKE bundle (reference: codegen'd Calc exprs)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 9000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("DEFAULT")).alias(
            "seg"
        ),
        F.when(F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY"), 1)
        .otherwise(0)
        .alias("is_industrial"),
        F.when(F.col("c_name").like("%0001%"), 1).otherwise(0).alias("name_like"),
    )


@query(
    "cdc_apply_latest",
    oracle="""
    WITH log AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS uts,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             CAST(round(value * 1000000) AS BIGINT) AS v
      FROM events
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY uts DESC, event_id DESC) AS rn
      FROM log
    )
    SELECT user_id, v AS value_micros, uts AS updated_at
    FROM ranked WHERE rn = 1 AND op = 'U'
    """,
    tags=("rowops", "cdc"),
)
def cdc_apply_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog materialization (the reference's retraction-stream /
    upsert semantics, SURVEY §1.1, applied in batch): events re-read as a
    CDC log — `error` rows are deletes, everything else upserts — reduced
    to the last-writer-wins snapshot per key; keys whose final op is a
    delete vanish.

    One `max_by` aggregate with a struct ordering key (uts, event_id) —
    partial-aggregated map-side, no window/sort over the log (the
    row_number formulation the oracle uses would sort every partition;
    max_by keeps one candidate per key per partition — the difference
    between O(n log n) per partition and O(n) on a 100 TB changelog).
    Streaming face of the same semantics: stream_upsert_snapshot.
    """
    ev = load_table(spark, sf_dir, "events")
    lg = ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("uts"),
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.round(F.col("value") * 1000000).cast("long").alias("v"),
    )
    return cdc_apply(lg, keys=["user_id"], seq=["uts", "event_id"]).select(
        "user_id",
        F.col("v").alias("value_micros"),
        F.col("uts").alias("updated_at"),
    )


def cdc_apply(
    changes: DataFrame,
    keys: list[str],
    seq: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Library primitive: materialize a CDC log into its last-writer-wins
    snapshot. ``changes`` carries key columns, a total-ordering sequence
    (``seq`` — e.g. [commit_ts, lsn]; MUST be unique per key or the
    winner is undefined), an ``op_col`` whose ``delete_op`` value marks
    deletes, and arbitrary payload columns. Returns one row per
    surviving key with the winning row's payload; keys whose final op is
    a delete vanish.

    Plan: ONE ``max_by`` hash aggregate with the seq struct as the
    ordering key — partial-aggregated map-side (each partition keeps one
    candidate per key), never a row_number window sorting the whole log:
    the difference between O(n) and O(n log n) per partition on a 100 TB
    changelog. Streaming face: stream_upsert_snapshot."""
    payload = [c for c in changes.columns if c not in keys]
    last = changes.groupBy(*keys).agg(
        F.max_by(
            F.struct(*payload), F.struct(*[F.col(s) for s in seq])
        ).alias("_last")
    )
    snap = last.select(*keys, "_last.*")
    if op_col in payload:
        snap = snap.filter(F.col(op_col) != delete_op).drop(op_col)
    return snap


@query(
    "cdc_scd2_history",
    oracle="""
    WITH log AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS uts,
             CAST(round(value * 1000000) AS BIGINT) AS v
      FROM events WHERE event_type <> 'error'
    )
    SELECT user_id, v AS value_micros,
           uts AS valid_from,
           lead(uts) OVER (PARTITION BY user_id ORDER BY uts, event_id)
             AS valid_to,
           CASE WHEN lead(uts) OVER (PARTITION BY user_id ORDER BY uts, event_id)
                     IS NULL THEN 1 ELSE 0 END AS is_current
    FROM log
    """,
    tags=("rowops", "cdc", "scd2"),
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: the FULL version history the
    last-writer-wins snapshot (`cdc_apply_latest`) discards — each upsert
    becomes a [valid_from, valid_to) interval, closed by the next version's
    timestamp via `lead`, open (NULL + is_current flag) for the latest.

    The lakehouse dimension-history pattern: one window sort per key over
    the changelog, no self-join (the naive form joins each version to its
    successor). As-of queries against the result are `join_asof` shapes.
    At 100 TB the window shuffles once on user_id — same bound as any
    keyed op over the log.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    lg = ev.filter(F.col("event_type") != "error").select(
        "user_id",
        "event_id",
        F.col("ts").alias("uts"),
        F.round(F.col("value") * 1000000).cast("long").alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("uts", "event_id")
    nxt = F.lead("uts").over(w)
    return lg.select(
        "user_id",
        F.col("v").alias("value_micros"),
        F.col("uts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@query(
    "rowid_zip_with_index",
    oracle="""
    SELECT event_id,
           row_number() OVER (ORDER BY event_id) - 1 AS idx
    FROM events
    """,
    tags=("rowops", "index"),
)
def rowid_zip_with_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global row ids — Flink's ``DataSetUtils.zipWithIndex``
    (two-pass: count per partition, then offset + local position). The
    oracle's window form (`row_number() OVER (ORDER BY ...)`) funnels ALL
    data through one task; the engine instead range-sorts (parallel
    sampled range partitioning) and assigns ids with RDD ``zipWithIndex``
    — the same two-pass count-then-offset scheme as the reference, one of
    the few places an RDD is the genuinely right tool (the per-partition
    position is physical, not relational). `monotonically_increasing_id`
    is NOT this: its ids are unique but non-contiguous.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id")
    ordered = ev.orderBy("event_id")
    indexed = ordered.rdd.map(lambda r: r.event_id).zipWithIndex()
    return spark.createDataFrame(indexed, "event_id bigint, idx bigint")
