"""Sort / limit / top-k — SURVEY §2.6.

Reference analog: Flink's ``SortPartitionOperator`` + range partitioning and
the UnilateralSortMerger external sort; SQL sort+fetch via ``DataSetSort``.
Spark: ``orderBy`` range-partitions and external-sorts (Tungsten);
``orderBy().limit()`` collapses into ``TakeOrderedAndProject`` — a per-
partition top-k + driver merge, i.e. top-k never materializes a full sort
at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from streamline_hybrid_engine_spark.catalog import load_table
from streamline_hybrid_engine_spark.functions.numeric import dsum, osum, rnd
from streamline_hybrid_engine_spark.registry import query


@query(
    "sort_orders_by_price",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 6) AS totalprice, o_orderdate
    FROM orders WHERE o_totalprice > 350000
    ORDER BY o_totalprice DESC
    """,
    tags=("sort",),
)
def sort_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total sort (range-partitioned external sort under the hood)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_totalprice") > 350000)
        .orderBy(F.col("o_totalprice").desc())
        .select("o_orderkey", rnd("o_totalprice", "totalprice"), "o_orderdate")
    )


@query(
    "limit_top100_lineitems",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 6) AS price
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    LIMIT 100
    """,
    tags=("sort", "limit"),
)
def limit_top100_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first(n)/LIMIT — ordered by key for a deterministic result set."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy("l_orderkey", "l_linenumber")
        .limit(100)
        .select("l_orderkey", "l_linenumber", rnd("l_extendedprice", "price"))
    )


@query(
    "topk_revenue_orders",
    oracle=f"""
    SELECT o_orderkey, o_orderdate,
           {osum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "topk"),
)
def topk_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join → agg → ORDER BY + LIMIT (TakeOrdered).

    Join order matters: the segment-filtered customer⋈orders result is the
    small side — broadcast IT and stream lineitem (statistics alone pick
    the reverse here because the lineitem file sits under the broadcast
    threshold; building a fact-sized hash relation measured 2× slower).
    At extreme SF drop the hint and AQE picks the build side from runtime
    sizes.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    co = c.join(o, c.c_custkey == o.o_custkey).select("o_orderkey", "o_orderdate")
    return (
        li.join(F.broadcast(co), li.l_orderkey == co.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "limit_offset_pagination",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 6) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50 OFFSET 100
    """,
    tags=("sort_limit", "pagination"),
)
def limit_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination (page 3 of 50 by price) — the API-serving
    access pattern. The page is only well-defined under a TOTAL order
    (price ties broken by key), the same discipline as every top-k row;
    without the tiebreak, page boundaries shift between runs and
    engines. Spark executes offset+limit as a single take of
    offset+limit rows then a drop — fine for page-sized offsets; deep
    pagination at 100 TB uses keyset continuation instead (WHERE key >
    last_seen ORDER BY key LIMIT n), which stays O(page) regardless of
    depth — this row certifies the OFFSET semantics, the docstring
    carries the scale guidance."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", rnd("o_totalprice", "totalprice"))
        .offset(100)
        .limit(50)
    )


def keyset_page(
    df: DataFrame,
    order_by: list[tuple[str, str]],
    n: int,
    cursor: tuple | None = None,
) -> DataFrame:
    """One page of keyset-continuation pagination — the library face of
    ``limit_keyset_pagination``. ``order_by`` is the TOTAL order as
    (column, 'asc'|'desc') pairs — include a unique key last, or page
    boundaries are undefined; ``cursor`` is the last row of the previous
    page as a tuple aligned with ``order_by`` (None = first page).

    The row comparison "strictly after cursor" expands to the pushable
    disjunction ``c1 after v1 OR (c1 = v1 AND c2 after v2) OR ...``
    (Spark has no tuple comparison over mixed directions), applied
    BEFORE the sort, so the parquet scan prunes row groups and the
    sort+limit fuses into TakeOrderedAndProject: per-partition n-row
    heaps + one driver merge — O(page) at any depth, never the O(depth)
    re-sort-and-discard of OFFSET."""
    dirs = {d for _, d in order_by}
    if not dirs <= {"asc", "desc"}:
        raise ValueError(f"order_by directions must be asc/desc, got {dirs}")
    if cursor is not None:
        if len(cursor) != len(order_by):
            raise ValueError(
                f"cursor arity {len(cursor)} != order_by arity {len(order_by)}"
            )
        pred, eq = None, None
        for (col, d), v in zip(order_by, cursor):
            after = F.col(col) > F.lit(v) if d == "asc" else F.col(col) < F.lit(v)
            clause = after if eq is None else eq & after
            pred = clause if pred is None else pred | clause
            same = F.col(col) == F.lit(v)
            eq = same if eq is None else eq & same
        df = df.filter(pred)
    sort_cols = [
        F.col(c).asc() if d == "asc" else F.col(c).desc() for c, d in order_by
    ]
    return df.orderBy(*sort_cols).limit(n)


#: keyset cursor: the last row of the previous page in the
#: (price DESC, orderkey ASC) total order. Fixed literals so the predicate
#: is a pushable parquet filter; any (price, key) works the same way.
_KEYSET_PRICE = 420_000.0
_KEYSET_KEY = 0


@query(
    "limit_keyset_pagination",
    oracle=f"""
    SELECT o_orderkey, round(o_totalprice, 6) AS totalprice
    FROM orders
    WHERE o_totalprice < {_KEYSET_PRICE}
       OR (o_totalprice = {_KEYSET_PRICE} AND o_orderkey > {_KEYSET_KEY})
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
    tags=("sort_limit", "pagination"),
)
def limit_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-continuation pagination — the scale-safe page fetch that
    `limit_offset_pagination`'s docstring promises. The client carries the
    last row of the previous page as a cursor in the (price DESC, key ASC)
    total order; the next page is ``WHERE (price, key) AFTER cursor ORDER
    BY ... LIMIT n``, expanded to the row-comparison disjunction
    ``price < p OR (price = p AND key > k)`` (Spark has no tuple
    comparison over mixed ASC/DESC).

    Why this is the 100 TB pagination: OFFSET d re-sorts and discards a
    d-row prefix on every page — O(d) per page, O(pages²) for a full
    crawl. The keyset predicate instead pushes to the parquet scan
    (PushedFilters: row groups whose price-range stats fall entirely
    above the cursor are skipped — plan-pinned) and the remaining rows
    flow into ``TakeOrderedAndProject``: per-partition 50-row heaps + one
    driver merge, never a global sort, O(page) at any depth. Same result
    contract as the OFFSET form when the cursor is the OFFSET boundary
    row."""
    o = load_table(spark, sf_dir, "orders")
    page = keyset_page(
        o,
        [("o_totalprice", "desc"), ("o_orderkey", "asc")],
        50,
        cursor=(_KEYSET_PRICE, _KEYSET_KEY),
    )
    return page.select("o_orderkey", rnd("o_totalprice", "totalprice"))
