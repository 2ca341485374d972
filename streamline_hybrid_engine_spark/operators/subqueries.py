"""Subquery surface: EXISTS, correlated scalar, uncorrelated scalar —
SURVEY §2.2/§2.4 SQL-dialect completeness.

The reference dialect (Flink SQL per SURVEY §2) supports correlated
EXISTS/IN and scalar subqueries; Catalyst supports the same and
*decorrelates* them into joins (EXISTS → left-semi, correlated scalar →
aggregate + equi-join), which is exactly the plan you'd hand-write at
scale — no nested-loop re-execution per outer row. These queries certify
both the SQL acceptance and the decorrelated plan shape
(tests/test_plans.py pins the semi-join / aggregate-join rewrite).

Determinism notes:
- the Q17-style threshold compares ``2 * qty * cnt < sum_qty`` in exact
  arithmetic (quantities are integral, counts are bigint; products of
  integral doubles are exact well below 2^53) — no double DIVISION on a
  comparison boundary, the classic half-grid trap (SURVEY §2 conventions).
- revenue sums are fixed-point cents (bigint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

import pyspark.sql.functions as F

from streamline_hybrid_engine_spark.catalog import load_table, register_views
from streamline_hybrid_engine_spark.registry import query

# Shared-dialect discipline (same text runs on Spark and DuckDB) — like
# sql_text_q1, each SQL string below IS the oracle.

_EXISTS_SQL = """
    SELECT o_orderpriority,
           count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_discount >= 0.06
          AND l.l_quantity > 30
    )
    GROUP BY o_orderpriority
"""


@query("subquery_exists_discounted", oracle=_EXISTS_SQL, tags=("subquery", "sql"))
def subquery_exists_discounted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape): orders having at least one
    deeply-discounted bulk line, counted by priority.

    Catalyst decorrelates to orders LEFT SEMI JOIN lineitem on the order
    key with the two predicates pushed below the join — one shuffle pair,
    no per-row re-execution."""
    register_views(spark, sf_dir)
    return spark.sql(_EXISTS_SQL)


_SCALAR_CORR_SQL = """
    SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS below_half_avg_revenue_cents,
           count(*) AS n_lines
    FROM lineitem l
    WHERE 2 * l.l_quantity * (SELECT count(*) FROM lineitem l2
                              WHERE l2.l_partkey = l.l_partkey)
          < (SELECT sum(l2.l_quantity) FROM lineitem l2
             WHERE l2.l_partkey = l.l_partkey)
"""


@query("subquery_scalar_part_avg", oracle=_SCALAR_CORR_SQL, tags=("subquery", "sql"))
def subquery_scalar_part_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries (TPC-H Q17 shape): revenue from lines
    ordering less than half the part's average quantity.

    Catalyst rewrites both correlated aggregates into ONE per-part
    aggregate joined back on l_partkey — the table is scanned twice (outer
    + aggregate), not once per outer row. The inequality is kept in exact
    integer-valued arithmetic so the boundary is engine-independent."""
    register_views(spark, sf_dir)
    return spark.sql(_SCALAR_CORR_SQL)


_SCALAR_GLOBAL_SQL = """
    SELECT o_orderkey, o_custkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents
    FROM orders
    WHERE o_totalprice * 10 > 9 * (SELECT max(o_totalprice) FROM orders)
"""


@query("subquery_scalar_global_max", oracle=_SCALAR_GLOBAL_SQL, tags=("subquery", "sql"))
def subquery_scalar_global_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders within 10% of the global
    maximum price. Planned as a one-row broadcast into the scan filter
    (max is exact; the comparison multiplies instead of dividing so both
    engines evaluate the identical IEEE expression)."""
    register_views(spark, sf_dir)
    return spark.sql(_SCALAR_GLOBAL_SQL)


_NOT_IN_NULLS_SQL = """
    WITH sub AS (
      SELECT CASE WHEN o_totalprice < 300000 THEN NULL ELSE o_custkey END
               AS nullable_key
      FROM orders
    )
    SELECT
      (SELECT count(*) FROM customer
       WHERE c_custkey NOT IN (SELECT nullable_key FROM sub)) AS n_not_in,
      (SELECT count(*) FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM sub s
                         WHERE s.nullable_key = c.c_custkey)) AS n_not_exists
"""


@query("subquery_not_in_nulls", oracle=_NOT_IN_NULLS_SQL, tags=("subquery", "sql"))
def subquery_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic corner: NOT IN over a subquery containing NULLs
    must select ZERO rows (any NULL makes `x <> NULL` UNKNOWN, so the
    conjunction is never TRUE), while the null-safe NOT EXISTS counts the
    genuinely unmatched customers. Both counts in one row certify that
    the engine implements ANSI semantics rather than the intuitive ones —
    the classic silent-wrong-answer trap in migrated SQL. Same text on
    both engines; Catalyst plans NOT IN as null-aware anti join."""
    register_views(spark, sf_dir)
    return spark.sql(_NOT_IN_NULLS_SQL)


_RECURSIVE_SQL = """
    WITH RECURSIVE edges AS (
      SELECT 'n' || CAST(n_nationkey AS STRING) AS child,
             'r' || CAST(n_regionkey AS STRING) AS parent
      FROM nation
      UNION ALL
      SELECT 'c' || CAST(c_custkey AS STRING), 'n' || CAST(c_nationkey AS STRING)
      FROM customer
      UNION ALL
      SELECT 's' || CAST(s_suppkey AS STRING), 'n' || CAST(s_nationkey AS STRING)
      FROM supplier
    ),
    anc AS (
      SELECT child, parent AS ancestor, 1 AS depth FROM edges
      UNION ALL
      SELECT a.child, e.parent, a.depth + 1
      FROM anc a JOIN edges e ON e.child = a.ancestor
    )
    SELECT ancestor, count(*) AS n_descendants, max(depth) AS max_depth
    FROM anc GROUP BY ancestor
"""


@query("sql_recursive_hierarchy", oracle=_RECURSIVE_SQL, tags=("subquery", "sql", "recursive"))
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE, natively in BOTH engines (Spark 4 WITH RECURSIVE):
    ancestor closure over the region←nation←{customer, supplier} hierarchy
    — per ancestor, its transitive descendant count and depth.

    Until now recursive CTEs appeared only on the ORACLE side (the CC /
    PageRank checkers); this certifies the engine accepts the same SQL
    dialect directly — a Flink-SQL user's hierarchy walks port verbatim.
    The driver-loop operators (graph.connected_components) remain the
    scale path for big graphs: Spark executes a recursive CTE as
    iterative union steps without checkpoint hygiene or convergence
    control, so at 100 TB prefer the explicit loop. Shared-dialect: the
    query text IS the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


_LATERAL_SQL = """
    SELECT n.n_name, t.c_name, round(t.c_acctbal, 6) AS acctbal
    FROM nation n,
    LATERAL (SELECT c_name, c_acctbal FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_name LIMIT 2) t
"""


@query("sql_lateral_topk", oracle=_LATERAL_SQL, tags=("subquery", "sql", "lateral"))
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT: top-2 customers
    per nation, expressed as the SQL-standard lateral join rather than the
    window-rank idiom (`win_topk_orders` is the same semantics the other
    way). Catalyst decorrelates the lateral into a ranked join — no
    per-outer-row re-execution. Shared-dialect: the text IS the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


_MARK_JOIN_SQL = """
    SELECT c_custkey, c_mktsegment,
           EXISTS(SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT') AS has_urgent,
           EXISTS(SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 420000) AS has_big_ticket
    FROM customer c
"""


@query(
    "join_existence_mark",
    oracle=_MARK_JOIN_SQL,
    tags=("subquery", "join", "existence"),
)
def join_existence_mark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARK JOIN (ExistenceJoin): EXISTS in the SELECT list — keep EVERY
    probe row and attach a boolean per subquery instead of filtering
    (semi/anti joins answer "which rows"; the mark join answers "which
    rows, annotated" — the segmentation/feature-flag shape, and the
    remaining member of the join-type family the suite had not yet
    certified). Spark decorrelates each EXISTS to an ExistenceJoin — a
    hash join emitting probe ⟕ exists-bit with build-side dedup, never a
    row-multiplying outer join + groupBy (plan-pinned); two marks against
    the same fact table become two ExistenceJoins over one orders scan
    subtree each, both shuffling on the custkey the probe already
    carries. Shared-dialect text: DuckDB plans the same shape as its
    native MARK join, and the query text IS the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_MARK_JOIN_SQL)


@query(
    "subquery_all_rewrite",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier s
    WHERE s_acctbal > ALL (SELECT c_acctbal FROM customer c
                           WHERE c.c_nationkey = s.s_nationkey)
    """,
    tags=("subquery", "quantified"),
)
def subquery_all_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparison `> ALL (correlated subquery)` — SQL Spark
    does NOT accept (only IN/EXISTS subqueries); the engine ships the
    standard decorrelation a migrating workload needs: aggregate the
    subquery to per-key max, LEFT join, and keep rows where the key has
    NO subquery rows (x > ALL ∅ is TRUE — the empty-group edge the
    naive inner-join+max rewrite silently drops) OR the value beats the
    max. The fixture exercises the edge for real: at small SF some
    supplier nations have zero customers. One group-count-sized
    aggregate broadcast back — the subquery never re-executes per outer
    row."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    mx = c.groupBy("c_nationkey").agg(F.max("c_acctbal").alias("max_bal"))
    j = s.join(
        F.broadcast(mx), s.s_nationkey == mx.c_nationkey, "left"
    )
    return j.filter(
        F.col("max_bal").isNull() | (F.col("s_acctbal") > F.col("max_bal"))
    ).select("s_suppkey", "s_name", "s_acctbal")
