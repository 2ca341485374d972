"""Composite TPC-H-shape queries — relational-workload completeness.

The reference is a SQL engine (Flink SQL over Calcite); a user migrating
from it brings decision-support queries shaped like the TPC-H suite. The
single-operator rows of SURVEY §2.2–§2.8 prove each piece; these prove the
COMPOSITIONS Catalyst must plan well: conditional aggregation over a join
(Q12), a ratio of conditional sums (Q14), and disjunctive multi-table
predicates (Q19). Q1/Q3/Q5/Q6/Q17 shapes already exist
(agg_pricing_summary, topk_revenue_orders, join_5way_regional_revenue,
agg_global_revenue, subquery_scalar_part_avg); Q4's EXISTS shape is
subquery_exists_discounted.

Shared-dialect discipline (like sql_text_q1): each SQL string below runs
UNCHANGED on Spark and DuckDB — the query text IS the oracle, so dialect
drift is impossible. Fixed-point sum convention via functions.numeric.osum
(portable SQL on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from streamline_hybrid_engine_spark.catalog import register_views
from streamline_hybrid_engine_spark.functions.numeric import osum
from streamline_hybrid_engine_spark.registry import query

_Q12_SQL = """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY l_linestatus
"""


@query("q12_priority_by_linestatus", oracle=_Q12_SQL, tags=("tpch", "sql"))
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts (CASE inside SUM) over a
    fact-fact join with a pushed date filter. The CASE branches partial-
    aggregate map-side like any other sum — the shuffle carries 2 longs
    per (status), not rows."""
    register_views(spark, sf_dir)
    return spark.sql(_Q12_SQL)


_Q14_SQL = f"""
    SELECT round(CAST(sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(floor(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)
                    ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) AS DOUBLE), 6)
             AS promo_share,
           {osum("l_extendedprice * (1 - l_discount)", "total_revenue")},
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate < TIMESTAMP '1998-04-01'
"""


@query("q14_promo_revenue_share", oracle=_Q14_SQL, tags=("tpch", "sql"))
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of two conditional aggregates. Both sums are
    exact fixed-point integers (order-independent), so the final division
    is one double op on identical inputs in both engines — a ratio of two
    noisy double sums would be the classic hash-gate flake."""
    register_views(spark, sf_dir)
    return spark.sql(_Q14_SQL)


_Q19_SQL = f"""
    SELECT count(*) AS n_lines,
           {osum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_type = 'PROMO' AND l_quantity >= 40)
"""


@query("q19_disjunctive_bands", oracle=_Q19_SQL, tags=("tpch", "sql"))
def q19_disjunctive_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: a disjunction of conjunctive bands spanning BOTH
    join sides. Catalyst extracts the common single-side conjuncts it can
    (CNF conversion) and pushes them below the join; the cross-side
    residual evaluates post-join in codegen. The planning trap this
    certifies: a naive engine evaluates the whole OR post-join and scans
    both tables in full."""
    register_views(spark, sf_dir)
    return spark.sql(_Q19_SQL)


_Q21_SQL = """
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
"""


@query("q21_waiting_supplier", oracle=_Q21_SQL, tags=("tpch", "sql"))
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the hardest classic subquery composition: an
    EXISTS and a NOT EXISTS correlated to the SAME table in one query
    (suppliers whose line shipped >60 days after the order date on a
    finished multi-supplier order where no OTHER supplier was late;
    ship-date lateness replaces the fixture-absent commit/receipt dates).
    Catalyst plans the pair as a left-semi plus a null-safe left-anti join
    against the same scan — the shape that exposes engines which
    re-execute subqueries per outer row. Shared-dialect: text IS the
    oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_Q21_SQL)
