"""Semantic tests for round-3 operators (multiset set-ops, exact stats,
binned range join, observed metrics, boilerplate grams)."""

from __future__ import annotations

import pyspark.sql.functions as F

from streamline_hybrid_engine_spark.registry import all_queries

_QS = all_queries()


def test_intersect_all_multiplicity_semantics(spark):
    """Bag intersection keeps min(l, r) copies; bag difference max(l-r, 0)."""
    a = spark.createDataFrame([(1,), (1,), (1,), (2,), (3,)], "x bigint")
    b = spark.createDataFrame([(1,), (1,), (2,), (2,)], "x bigint")
    inter = sorted(r.x for r in a.intersectAll(b).collect())
    diff = sorted(r.x for r in a.exceptAll(b).collect())
    assert inter == [1, 1, 2]
    assert diff == [1, 3]


def test_corr_covar_matches_native_within_tolerance(spark, sf_dir):
    """The exact integer-sum formulation must agree with native corr /
    covar_pop to ~1e-6 (they differ only in accumulation order and the
    1e-3 fixed-point grid)."""
    got = {
        r.l_returnflag: r
        for r in _QS["agg_corr_covar"].fn(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    native = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.corr("l_quantity", "l_extendedprice").alias("c"),
            F.covar_pop("l_quantity", "l_extendedprice").alias("cv"),
        )
        .collect()
    }
    for flag, row in got.items():
        assert abs(row.corr_qty_price - native[flag].c) < 1e-4
        # covar magnitude ~1e4; fixed-point grid error is ~1e-3 relative
        assert abs(row.covar_pop_qty_price - native[flag].cv) < abs(
            native[flag].cv
        ) * 1e-3 + 1e-3


def test_binned_range_join_equals_plain_interval_join(spark, sf_dir):
    """The bucketed rewrite must be result-invisible vs the plain form."""
    plain = set(
        map(tuple, _QS["join_interval_events"].fn(spark, sf_dir).collect())
    )
    binned = set(map(tuple, _QS["join_range_binned"].fn(spark, sf_dir).collect()))
    assert plain == binned


def test_observed_metrics_match_direct_aggregate(spark, sf_dir):
    """Accumulator values collected via observe == the same aggregates run
    as an ordinary query."""
    row = _QS["observe_pipeline_metrics"].fn(spark, sf_dir).collect()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    direct = li.agg(
        F.count("*").alias("n"),
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1_000_000
            ).cast("long")
        ).alias("rev"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("deep"),
    ).collect()[0]
    assert row.n_rows == direct.n
    assert row.revenue == round(direct.rev / 1_000_000, 6)
    assert row.n_deep_disc == direct.deep


def test_boilerplate_fraction_bounds_and_coverage(spark, sf_dir):
    """Every doc with ≥1 gram appears; fractions lie in [0,1]; flagged
    instances never exceed total instances."""
    out = _QS["llm_boilerplate_grams"].fn(spark, sf_dir)
    rows = out.collect()
    docs_with_grams = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.size(F.split("text", " ")) >= 3)
        .count()
    )
    assert len(rows) == docs_with_grams
    assert all(0.0 <= r.boiler_frac <= 1.0 for r in rows)
    assert all(r.n_boiler <= r.n_grams for r in rows)
    # the synthetic vocabulary repeats heavily → boilerplate must exist
    assert any(r.n_boiler > 0 for r in rows)


def test_async_stream_enrich_equals_batch_join(spark, sf_dir):
    """Streaming async enrichment == the equivalent batch join aggregate
    (the hybrid batch-stream equivalence check)."""
    stream = {
        r.nation: r.n_events
        for r in _QS["stream_async_enrich"].fn(spark, sf_dir).collect()
    }
    from streamline_hybrid_engine_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    batch = {
        r.n_name: r.n
        for r in e.join(c, e.user_id == c.c_custkey, "left")
        .join(n, c.c_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert stream == batch
