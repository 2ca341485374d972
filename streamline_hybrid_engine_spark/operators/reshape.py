"""Relational reshape operators: PIVOT and UNPIVOT — SURVEY §2.4 family.

The reference's SQL surface (Flink-1.x dialect per SURVEY §2.4) reaches
wide↔long reshaping through conditional aggregation and UNION ALL; Spark
exposes the same semantics first-class (``GroupedData.pivot`` with an
explicit value list, ``DataFrame.unpivot``). Explicit pivot values matter
twice over: correctness (deterministic output schema for the oracle gate)
and scale (an unlisted-values pivot runs a hidden distinct-collect over
the full input to discover columns before the real aggregation — an extra
job plus a driver collect you never want on a 100 TB table).

Determinism: pivot cells sum account balances as fixed-point CENTS
(bigint) — integer sums are order/partitioning-independent, so the value
hash matches DuckDB bit-for-bit; empty cells coalesce to 0 on both
engines to keep every column non-null BIGINT (mixed-nullability columns
land as different pandas dtypes per engine and break strict hashing).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from streamline_hybrid_engine_spark.catalog import load_table
from streamline_hybrid_engine_spark.registry import query

#: closed value list for the pivot — the TPC-H market segments.
SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

_PIVOT_CELLS = ",\n           ".join(
    f"CAST(COALESCE(SUM(CASE WHEN c_mktsegment = '{s}' "
    f"THEN CAST(round(c_acctbal * 100) AS BIGINT) END), 0) AS BIGINT)"
    f" AS {s.lower()}_bal_cents"
    for s in SEGMENTS
)


@query(
    "pivot_acctbal_by_segment",
    oracle=f"""
    SELECT n_name,
           {_PIVOT_CELLS}
    FROM customer JOIN nation ON n_nationkey = c_nationkey
    GROUP BY n_name
    """,
    tags=("reshape", "agg"),
)
def pivot_acctbal_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: nation × market-segment matrix of summed account balances.

    Spark plans pivot as two-stage aggregation — partial agg on
    (n_name, segment) before the first exchange, pivot-first agg after —
    so both shuffles carry at most |groups × segments| partial rows, never
    raw customer rows (pinned in tests/test_plans.py). The dimension join
    is broadcast (nation is tiny).
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    wide = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("bal_cents", cents)
        .groupBy("n_name")
        .pivot("c_mktsegment", list(SEGMENTS))
        .agg(F.sum("bal_cents"))
    )
    # empty cells → 0 on both engines: keeps every column non-null BIGINT,
    # so the cross-engine value hash is dtype-stable (a NULL cell would
    # surface as int64-vs-float64 pandas frames and hash differently).
    renames = [F.col("n_name")] + [
        F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"{s.lower()}_bal_cents")
        for s in SEGMENTS
    ]
    return wide.select(*renames)


_UNPIVOT_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")

_UNPIVOT_ORACLE = "\nUNION ALL\n".join(
    f"SELECT l_orderkey, l_linenumber, '{m}' AS measure, {m} AS val FROM lineitem"
    for m in _UNPIVOT_MEASURES
)


@query(
    "unpivot_lineitem_measures",
    oracle=_UNPIVOT_ORACLE,
    tags=("reshape",),
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long melt): four lineitem measures into
    (key, measure-name, value) rows.

    ``DataFrame.unpivot`` expands each input row to 4 output rows in a
    single narrow map stage — no shuffle, no UNION re-scan. The oracle is
    the classic 4-way UNION ALL, which scans the table four times; the
    Spark plan reads it ONCE, which is the difference that matters when
    the table is 100 TB (plan pinned in tests/test_plans.py).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=list(_UNPIVOT_MEASURES),
        variableColumnName="measure",
        valueColumnName="val",
    )


@query(
    "pivot_dynamic_discovery",
    oracle="""
    SELECT n_name,
           CAST(count(*) FILTER (c_mktsegment = 'AUTOMOBILE') AS BIGINT) AS automobile,
           CAST(count(*) FILTER (c_mktsegment = 'BUILDING') AS BIGINT) AS building,
           CAST(count(*) FILTER (c_mktsegment = 'FURNITURE') AS BIGINT) AS furniture,
           CAST(count(*) FILTER (c_mktsegment = 'HOUSEHOLD') AS BIGINT) AS household,
           CAST(count(*) FILTER (c_mktsegment = 'MACHINERY') AS BIGINT) AS machinery
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("reshape", "pivot"),
)
def pivot_dynamic_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with DISCOVERED values — ``pivot(col)`` with no value list
    (the spreadsheet-style surface analysts reach for when the category
    set isn't known up front): Spark runs a driver-side distinct on the
    pivot column (capped by spark.sql.pivotMaxValues, 10 000 default)
    and then plans the SAME conditional-aggregation as the static form —
    discovery costs one extra tiny job, the pivot itself is still one
    pass. The discovered set here is the 5 market segments; columns are
    lower-aliased so the oracle (explicit FILTER columns — DuckDB can't
    discover) lines up. The static-list sibling is
    pivot_acctbal_by_segment; at 100 TB prefer the static list — the
    discovery job scans the fact once more."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pv = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .pivot("c_mktsegment")
        .count()
    )
    renamed = pv.select(
        "n_name",
        *[
            F.coalesce(F.col(f"`{seg}`"), F.lit(0)).alias(seg.lower())
            for seg in sorted(
                col for col in pv.columns if col != "n_name"
            )
        ],
    )
    return renamed
