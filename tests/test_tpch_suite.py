"""Plan and semantics pins for the completed TPC-H suite (tpch_suite.py).

Value parity with DuckDB is covered by test_parity_sf0001.py (the module's
queries self-register); these tests pin the SCALE properties — the physical
strategies that make each shape viable at 100 TB — and the two semantic
traps the shapes were chosen to certify.
"""

from __future__ import annotations

from streamline_hybrid_engine_spark.plans import executed_plan
from streamline_hybrid_engine_spark.registry import all_queries

_QS = all_queries()


def plan(spark, sf_dir, name: str) -> str:
    return executed_plan(_QS[name].fn(spark, sf_dir))


def test_q10_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    """The top-20 cut must plan as TakeOrderedAndProject (per-partition
    heaps + one 20-row merge), never a total sort of the aggregate."""
    p = plan(spark, sf_dir, "q10_returned_items")
    assert "TakeOrderedAndProject" in p


def test_q18_single_lineitem_pass_no_reaggregate(spark, sf_dir):
    """The r6 rewrite carries the per-order sum out of the grouped-HAVING
    CTE, so the fact table must be scanned ONCE and aggregated ONCE — the
    textbook IN-subquery form re-scanned and re-aggregated lineitem in the
    outer query (r5 measured 1.49x baseline). The small qualifying-orders
    side then broadcasts into its joins."""
    p = plan(spark, sf_dir, "q18_large_volume_customer")
    assert p.count("lineitem.parquet") == 1
    assert "BroadcastHashJoin" in p


def test_q22_not_exists_plans_as_anti_join(spark, sf_dir):
    assert "LeftAnti" in plan(spark, sf_dir, "q22_global_sales_opportunity")


def test_q7_q8_dims_broadcast_no_fact_cartesian(spark, sf_dir):
    """The wide joins must broadcast dimension sides; no CartesianProduct
    or BroadcastNestedLoopJoin may appear anywhere in the suite's widest
    plans despite the cross-side disjunctive predicates."""
    for name in ("q7_nation_volume_shipping", "q8_market_share"):
        p = plan(spark, sf_dir, name)
        assert "BroadcastHashJoin" in p, name
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_q15_date_filter_pushed_to_lineitem_scan(spark, sf_dir):
    """The quarter filter must reach the parquet scan as PushedFilters,
    so at 100 TB the revenue view reads one quarter, not the table."""
    p = plan(spark, sf_dir, "q15_top_supplier")
    assert any(
        "l_shipdate" in seg[:300] for seg in p.split("PushedFilters:")[1:]
    )


def test_q2_correlated_min_decorrelates_to_aggregate_join(spark, sf_dir):
    """The per-part MIN subquery must plan as one aggregate + equi-join
    (BroadcastHashJoin/SortMergeJoin only) — a plan with nested-loop or
    cartesian re-execution per outer row would be quadratic at scale."""
    p = plan(spark, sf_dir, "q2_min_cost_supplier")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "HashAggregate" in p


def test_q13_customers_without_matching_orders_counted_in_zero_bucket(
    spark, sf_dir
):
    """The LEFT join keeps customers with no non-urgent orders; their
    count must be 0 (not a dropped row) — the histogram's 0 bucket equals
    the number of customers minus the customers that appear in the
    filtered orders side."""
    rows = {
        r["c_count"]: r["custdist"]
        for r in _QS["q13_customer_distribution"].fn(spark, sf_dir).collect()
    }
    total_customers = sum(rows.values())
    from streamline_hybrid_engine_spark.catalog import register_views

    register_views(spark, sf_dir)
    expected_total = spark.table("customer").count()
    assert total_customers == expected_total
    matched = spark.sql(
        "SELECT count(DISTINCT o_custkey) AS n FROM orders "
        "WHERE o_orderpriority <> '1-URGENT'"
    ).collect()[0]["n"]
    assert rows.get(0, 0) == expected_total - matched


def test_q15_equality_to_max_keeps_all_tied_suppliers(spark, sf_dir):
    """Q15's spec keeps every supplier tied at max revenue; the exact
    fixed-point totals make the tie test deterministic. All returned
    totals must equal one another."""
    vals = [
        r["total_revenue"]
        for r in _QS["q15_top_supplier"].fn(spark, sf_dir).collect()
    ]
    assert len(vals) >= 1
    assert all(v == vals[0] for v in vals)
