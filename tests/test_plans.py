"""Physical-plan assertions — the 100 TB scale contract.

Correctness says what a query returns; these tests pin HOW Spark executes
it: filters reach the parquet scan, small dims broadcast, top-k avoids a
global sort, hot paths stay in whole-stage codegen. A regression here is a
performance bug even when parity stays green.
"""

from __future__ import annotations

import pytest

from streamline_hybrid_engine_spark.plans import executed_plan, optimized_plan
from streamline_hybrid_engine_spark.registry import all_queries

_QS = all_queries()


def plan(spark, sf_dir, name: str, execute: bool = False) -> str:
    return executed_plan(_QS[name].fn(spark, sf_dir), execute=execute)


def optimized(spark, sf_dir, name: str) -> str:
    return optimized_plan(_QS[name].fn(spark, sf_dir))


def test_filter_reaches_parquet_scan(spark, sf_dir):
    """Predicate pushdown: the shipdate/qty filter must appear as
    PushedFilters on the scan, not only as a post-scan Filter."""
    p = plan(spark, sf_dir, "filter_shipdate_qty")
    assert "PushedFilters: [" in p
    assert "IsNotNull" in p.split("PushedFilters:")[1][:400]


def test_column_pruning_on_projection(spark, sf_dir):
    """The projection needs 5 of lineitem's 11 columns; the parquet scan
    must read exactly those, not the full schema."""
    p = plan(spark, sf_dir, "project_disc_price")
    read = p.split("ReadSchema:")[1].splitlines()[0]
    assert read.count(",") <= 4, read  # ≤5 columns read
    assert "l_shipdate" not in read and "l_returnflag" not in read


def test_small_dims_broadcast(spark, sf_dir):
    p = plan(spark, sf_dir, "join_broadcast_nation_region")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_5way_join_broadcasts_dims(spark, sf_dir):
    """Q5 shape: nation/region side must broadcast, never shuffle."""
    p = plan(spark, sf_dir, "join_5way_regional_revenue")
    assert p.count("BroadcastHashJoin") >= 2


def test_topk_uses_take_ordered_not_global_sort(spark, sf_dir):
    p = plan(spark, sf_dir, "topk_revenue_orders")
    assert "TakeOrderedAndProject" in p


def test_semi_anti_plan_as_joins(spark, sf_dir):
    assert "LeftSemi" in plan(spark, sf_dir, "join_semi_customers_with_orders")
    assert "LeftAnti" in plan(spark, sf_dir, "join_anti_customers_without_orders")


def test_agg_has_partial_final_split(spark, sf_dir):
    """Map-side partial aggregation (Flink combiner analog) must be planned."""
    p = plan(spark, sf_dir, "agg_pricing_summary")
    assert "partial_" in p  # HashAggregate(..., functions=[partial_sum(...)])


def test_pricing_summary_stays_in_codegen(spark, sf_dir):
    """The flagship scan→filter→agg pipeline must be whole-stage compiled."""
    p = plan(spark, sf_dir, "agg_pricing_summary", execute=True)
    # AQE's compact plan marks whole-stage-codegen stages with "*(n)"
    assert "*(1)" in p or "WholeStageCodegen" in p


def test_knn_blocked_join_no_cartesian(spark, sf_dir):
    """Label-blocked kNN must not degrade to a cartesian product."""
    p = plan(spark, sf_dir, "llm_knn_cosine_label")
    assert "CartesianProduct" not in p


def test_asof_join_is_window_not_join(spark, sf_dir):
    """The as-of op must compile to one window pass, not a pair-exploding
    join (SURVEY §2.3 scale note)."""
    o = optimized(spark, sf_dir, "join_asof_last_purchase")
    assert "Join" not in o
    assert "Window" in o


def test_partitioned_sink_reread_prunes_partitions(spark, sf_dir):
    """The partitioned-lake re-read must prune month directories at file
    listing time (PartitionFilters on the scan), not post-filter the data —
    the mechanism that makes a 100 TB lake queryable."""
    p = plan(spark, sf_dir, "sink_partitioned_parquet")
    assert "PartitionFilters: [" in p
    seg = p.split("PartitionFilters:")[1][:300]
    assert "order_month" in seg
