"""Set operations — SURVEY §2.7.

Reference analog: Flink's ``UnionOperator``; INTERSECT/EXCEPT are Calcite
rewrites to joins. Spark implements them natively (union is zero-shuffle
partition concatenation; intersect/except plan as semi/anti hash joins with
distinct — same rewrite the reference's optimizer does, minus our code).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from streamline_hybrid_engine_spark.catalog import load_table
from streamline_hybrid_engine_spark.registry import query


@query(
    "set_union_all_buyers_browsers",
    oracle="""
    SELECT user_id, count(*) AS n_actions
    FROM (
        SELECT user_id FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id FROM events WHERE event_type = 'click'
    )
    GROUP BY user_id
    """,
    tags=("setops",),
)
def set_union_all_buyers_browsers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no dedup shuffle) then aggregate."""
    ev = load_table(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    browsers = ev.filter(F.col("event_type") == "click").select("user_id")
    return (
        buyers.unionByName(browsers).groupBy("user_id").agg(F.count("*").alias("n_actions"))
    )


@query(
    "set_union_distinct_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    tags=("setops",),
)
def set_union_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — union + dedup, partial-agg before shuffle."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).distinct()


@query(
    "set_intersect_cust_nations",
    oracle="""
    SELECT c_nationkey AS nationkey, c_mktsegment AS seg FROM customer WHERE c_acctbal > 8000
    INTERSECT
    SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal < 2000
    """,
    tags=("setops",),
)
def set_intersect_cust_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — planned as left-semi hash join + distinct."""
    c = load_table(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 8000).select(
        F.col("c_nationkey").alias("nationkey"), F.col("c_mktsegment").alias("seg")
    )
    poor = c.filter(F.col("c_acctbal") < 2000).select(
        F.col("c_nationkey").alias("nationkey"), F.col("c_mktsegment").alias("seg")
    )
    return rich.intersect(poor)


@query(
    "set_except_parts_never_ordered",
    oracle="""
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    EXCEPT
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setops",),
)
def set_except_parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT/MINUS — planned as left-anti hash join + distinct.

    (Big-spender custkeys minus F-status custkeys — chosen because every
    part/supplier key IS referenced at sf0.01, which would make the naive
    'never ordered' formulation empty; 66 rows here.)
    """
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    fstat = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return big.subtract(fstat)  # DataFrame.subtract == SQL EXCEPT (distinct)


def _ordered_partkeys(spark: SparkSession, sf_dir: str, nationkey: int) -> DataFrame:
    """Multiset of part keys ordered by one nation's customers — duplicates
    preserved, which is what distinguishes the ALL set-op variants."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") == nationkey)
        .select("c_custkey")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(F.col("l_partkey").alias("partkey"))
    )


_OPARTKEYS = """
    SELECT l.l_partkey AS partkey
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_nationkey = {n}
"""


@query(
    "set_intersect_all_partkeys",
    oracle=f"""
    {_OPARTKEYS.format(n=1)}
    INTERSECT ALL
    {_OPARTKEYS.format(n=2)}
    """,
    tags=("setops", "multiset"),
)
def set_intersect_all_partkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag intersection with multiplicity min(l, r); the
    MULTISET face the distinct variant above can't exercise (a part bought
    3× by nation 1 and 2× by nation 2 survives exactly twice). Spark plans
    `intersectAll` as one aggregate per side + a join on (value, count) —
    no row explosion, shuffles carry (key, count) pairs only."""
    a = _ordered_partkeys(spark, sf_dir, 1)
    b = _ordered_partkeys(spark, sf_dir, 2)
    return a.intersectAll(b)


@query(
    "set_except_all_partkeys",
    oracle=f"""
    {_OPARTKEYS.format(n=1)}
    EXCEPT ALL
    {_OPARTKEYS.format(n=2)}
    """,
    tags=("setops", "multiset"),
)
def set_except_all_partkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference with multiplicity max(l − r, 0)."""
    a = _ordered_partkeys(spark, sf_dir, 1)
    b = _ordered_partkeys(spark, sf_dir, 2)
    return a.exceptAll(b)


@query(
    "set_union_schema_drift",
    oracle="""
    SELECT o_orderkey AS id, 'with_priority' AS generation,
           o_orderpriority AS priority,
           round(o_totalprice, 6) AS totalprice
    FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey AS id, 'legacy' AS generation,
           NULL AS priority,
           round(o_totalprice, 6) AS totalprice
    FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("setops", "schema_evolution"),
)
def set_union_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift union: ``unionByName(allowMissingColumns=True)`` over
    two generations of the same feed where the older one lacks a column
    — the missing side is NULL-padded BY NAME, not by position. This is
    the in-query face of schema evolution (the on-read face is
    scan_merge_schema): positional unionAll over drifted schemas
    silently misaligns columns, the classic lake-ingestion bug. The
    oracle spells the padding explicitly; at 100 TB this is how a
    backfill reads five years of a feed whose schema grew."""
    o = load_table(spark, sf_dir, "orders")
    current = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("id"),
        F.lit("with_priority").alias("generation"),
        F.col("o_orderpriority").alias("priority"),
        F.round("o_totalprice", 6).alias("totalprice"),
    )
    legacy = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("id"),
        F.lit("legacy").alias("generation"),
        F.round("o_totalprice", 6).alias("totalprice"),
    )
    return current.unionByName(legacy, allowMissingColumns=True)
