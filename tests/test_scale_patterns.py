"""Scale-pattern tests: the 100 TB techniques SCALE.md promises, proven
on the local cluster — bucketed co-located joins (zero shuffle), streaming
checkpoint recovery (Flink savepoint analog), observed metrics
(accumulator analog).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from streamline_hybrid_engine_spark.catalog import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Bucketing both fact tables on the join key at write time makes the
    join zero-shuffle (SCALE.md joins: co-location option (a))."""
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # the in-memory catalog forgets tables between sessions but their files
    # survive in the warehouse dir — clear them or saveAsTable fails
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")

    joined = spark.table("b_lineitem").join(
        spark.table("b_orders").hint("MERGE"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:800]
    # sanity: result matches the unbucketed join
    assert joined.count() == li.join(o, li.l_orderkey == o.o_orderkey).count()


def test_observed_metrics_accumulator_analog(spark, sf_dir):
    """Flink accumulators → Spark ``observe()``: per-action metrics
    collected on the driver without a second pass."""
    from pyspark.sql import Observation

    obs = Observation("li_metrics")
    li = load_table(spark, sf_dir, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("total_qty"),
    )
    n = li.filter(F.col("l_quantity") >= 0).count()
    got = obs.get
    assert got["n_rows"] > 0
    assert got["n_rows"] >= n  # observe sees pre-filter rows
    assert got["total_qty"] > 0


def test_streaming_checkpoint_recovery_no_reprocessing(spark, sf_dir):
    """Exactly-once across restarts (Flink savepoint analog): a second run
    from the same checkpoint must process ONLY new files — counts continue,
    nothing is double-counted."""
    ev = load_table(spark, sf_dir, "events")
    stage = os.path.join(tempfile.gettempdir(), "she_ckpt_recovery_stage")
    ckpt = os.path.join(tempfile.gettempdir(), "she_ckpt_recovery_ckpt")
    out: list = []
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    first = ev.filter(F.col("ts") < "2024-01-15")
    second = ev.filter(F.col("ts") >= "2024-01-15")
    first.coalesce(1).write.parquet(f"{stage}/f0")

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )

    def drain() -> int:
        raw = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(stage)
        )
        seen = {"n": 0}

        def sink(batch_df, epoch_id):
            seen["n"] += batch_df.count()

        q = (
            raw.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return seen["n"]

    n1 = drain()
    assert n1 == first.count()
    # restart with new data only — the old file must not be reprocessed
    second.coalesce(1).write.parquet(f"{stage}/f1")
    n2 = drain()
    assert n2 == second.count(), f"reprocessed: got {n2}, want {second.count()}"


def test_aqe_splits_skewed_join(spark, sf_dir):
    """AQE skew-join handling (SCALE.md: 'skewed keys → AQE'): a join with
    one pathological hot key must still complete and stay correct; with
    skewJoin enabled Spark splits the hot partition at runtime."""
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    # build: 1 hot key with 50k rows + 1k cold keys
    hot = spark.range(50_000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    cold = spark.range(1_000).select(
        (F.col("id") + 1).alias("k"), F.col("id").alias("v")
    )
    left = hot.union(cold)
    right = spark.range(1_001).select(F.col("id").alias("k"), F.lit(1).alias("w"))
    # force a shuffle join (no broadcast) so skew handling is exercised
    joined = left.join(right.hint("SHUFFLE_MERGE"), "k")
    assert joined.count() == 51_000


def test_partitioned_lake_static_pruning(spark, sf_dir):
    """Date-partitioned lake layout → a date filter prunes partitions at
    plan time (PartitionFilters on the scan), the backbone of time-range
    queries at 100 TB."""
    lake = os.path.join(tempfile.gettempdir(), "she_part_lake")
    shutil.rmtree(lake, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    ev.write.partitionBy("event_date").parquet(lake)

    back = spark.read.parquet(lake).filter(F.col("event_date") == "2024-01-15")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters:")[1][:300]
    assert "event_date" in pf
    # and the filter is NOT a post-scan row filter on the partition column
    want = ev.filter(F.to_date("ts") == "2024-01-15").count()
    assert back.count() == want


def test_dynamic_partition_pruning_from_join(spark, sf_dir):
    """DPP: a selective dim-side filter prunes fact partitions at runtime
    (subquery broadcast into the scan's partition filter)."""
    lake = os.path.join(tempfile.gettempdir(), "she_part_lake_dpp")
    shutil.rmtree(lake, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    ev.write.partitionBy("event_date").parquet(lake)
    fact = spark.read.parquet(lake)
    dim = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"))
        .distinct()
        .filter(F.dayofmonth("d") == 15)
    )
    joined = fact.join(dim.hint("BROADCAST"), fact.event_date == dim.d)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:600]
    assert joined.count() > 0


def test_salted_join_equals_plain_join(spark, sf_dir):
    """salted_join (manual hot-key spreading) must be result-identical to
    the plain join while partitioning each hot key across n_salts."""
    from streamline_hybrid_engine_spark.operators.skew import salted_join

    hot = spark.range(20_000).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    cold = spark.range(500).select((F.col("id") % 100).alias("k"), F.col("id").alias("v"))
    skewed = hot.union(cold)
    small = spark.range(100).select(F.col("id").alias("j"), (F.col("id") * 10).alias("w"))

    got = salted_join(skewed, small, "k", "j", n_salts=8)
    want = skewed.join(small, skewed.k == small.j)
    cols = ["k", "v", "j", "w"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )
    # the hot key really is spread: >1 distinct salt observed for k=7
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(8))
    n_salts_hot = (
        skewed.filter(F.col("k") == 7).select(salt.alias("s")).distinct().count()
    )
    assert n_salts_hot > 1


def test_cc_loop_width_scales_with_graph_size():
    """The CC propagation loop's shuffle width must grow with the candidate
    graph instead of funneling any-sized graph through a constant number of
    tasks (the r2 scale-killer: a hard cap of 4). Floor protects fixtures;
    the cap bounds it by cluster parallelism."""
    from streamline_hybrid_engine_spark.llm.dedup import _cc_width

    # fixture-sized graphs take the floor
    assert _cc_width(n_edges=58, default_parallelism=32) == 4
    assert _cc_width(n_edges=0, default_parallelism=32) == 4
    # a billion-edge LSH graph fans out to ~1000 tasks on a big cluster
    assert _cc_width(n_edges=1_000_000_000, default_parallelism=4000) == 1000
    # monotone in graph size ...
    widths = [_cc_width(n, 4000) for n in (10**6, 10**7, 10**8, 10**9)]
    assert widths == sorted(widths) and widths[-1] > widths[0]
    # ... and capped by cluster parallelism, never exploding past 8x
    assert _cc_width(n_edges=10**12, default_parallelism=32) == 8 * 32


def test_exact_stats_partitioning_invariant(spark, sf_dir):
    """The exact-integer-sum statistics (corr/covar, skew/kurtosis) must be
    bit-identical under a different shuffle width — the property that
    justifies their existence over the native streaming-moment aggs."""
    from streamline_hybrid_engine_spark.registry import get_query

    before = spark.conf.get("spark.sql.shuffle.partitions")
    for name in ("agg_corr_covar", "agg_skew_kurtosis"):
        q = get_query(name).fn
        a = sorted(map(tuple, q(spark, sf_dir).collect()))
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            b = sorted(map(tuple, q(spark, sf_dir).collect()))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", before)
        assert a == b, name


def test_connected_components_width_scales_with_edges(spark):
    """cc_width drives the loop's shuffle width from the MEASURED graph;
    the generic loop must keep the same labels at any width."""
    from streamline_hybrid_engine_spark.operators.graph import (
        connected_components,
    )

    edges = [(i, i + 1) for i in range(0, 30, 2)]  # 15 disjoint pairs
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    a = sorted(map(tuple, connected_components(df).collect()))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        b = sorted(map(tuple, connected_components(df).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b
    # pairs are (0,1),(2,3),…,(28,29): each component's min is the even id
    assert all(label == v - (v % 2) for v, label in a)


def test_stream_shuffle_width_scales_with_input(spark, tmp_path, monkeypatch):
    """stream_shuffle_width sizes state partitions from input volume:
    floor 8 on tiny fixtures (the r9 width-sweep knee — 1/2/4/8/16 →
    57/60/71/79/46 k events/s), growing with bytes, capped at session
    cores — never a constant that starves a cluster or over-partitions
    a bounded drain."""
    import streamline_hybrid_engine_spark.streaming.jobs as jobs

    cores = spark.sparkContext.defaultParallelism

    def fake_size(bytes_):
        monkeypatch.setattr(
            jobs.os.path, "getsize", lambda _p: bytes_, raising=True
        )

    fake_size(1 << 20)  # 1 MB -> floor
    assert jobs.stream_shuffle_width(spark, "/x") == 8
    fake_size(40 << 20)  # 40 MB -> 10 partitions (4 MB each)
    assert jobs.stream_shuffle_width(spark, "/x") == min(cores, max(8, 10))
    fake_size(1 << 40)  # 1 TB -> capped at cores
    assert jobs.stream_shuffle_width(spark, "/x") == cores
    monkeypatch.undo()
    # missing file -> floor, not a crash
    assert jobs.stream_shuffle_width(spark, "/nonexistent-dir") == 8


def test_two_phase_sessions_equal_native_and_salt_the_shuffle(spark, sf_dir):
    """The skew rewrite must be invisible in values (== native
    session_window output) and visible in the plan: phase 1's window
    partitions on (user_id, bucket) — the deterministic time salt — so no
    single task owns a whole hot user."""
    from streamline_hybrid_engine_spark.plans import executed_plan
    from streamline_hybrid_engine_spark.registry import get_query

    two = get_query("win_session_two_phase").fn(spark, sf_dir)
    native = get_query("win_session_30m_batch").fn(spark, sf_dir)
    a = sorted(map(tuple, two.collect()))
    b = sorted(map(tuple, native.collect()))
    assert a == b and len(a) > 0
    import re

    p = executed_plan(two)
    assert re.search(r"Exchange hashpartitioning\(user_id#\d+L?, bucket#", p), p


def test_rolling_mau_hll_day_set_and_anchor_match_exact_form(spark, sf_dir):
    """ts_rolling_mau_hll (r12 valve): report-day set identical to the
    exact form's, the exact anchor equals the exact form's mau28 per
    day, and the 28-sketch-union estimate lands within the 5% contract
    on every day."""
    from streamline_hybrid_engine_spark.registry import get_query

    exact = {
        r["report_day"]: r["mau28"]
        for r in get_query("ts_rolling_mau").fn(spark, sf_dir).collect()
    }
    hll = get_query("ts_rolling_mau_hll").fn(spark, sf_dir).collect()
    assert {r["report_day"] for r in hll} == set(exact)
    assert len(hll) > 0
    for r in hll:
        assert r["mau28_exact"] == exact[r["report_day"]]
        assert r["hll_within_5pct"] is True


def test_seasonal_anomaly_bucketed_flags_equal_global_form(spark, sf_dir):
    """ts_seasonal_anomaly_bucketed (r12 valve): the bucketed-MAD rank
    reconstructs the exact global rank, so the emitted flag SET is
    row-identical to the global form's."""
    from streamline_hybrid_engine_spark.registry import get_query

    a = sorted(
        map(tuple, get_query("ts_seasonal_anomaly").fn(spark, sf_dir).collect())
    )
    b = sorted(
        map(
            tuple,
            get_query("ts_seasonal_anomaly_bucketed").fn(spark, sf_dir).collect(),
        )
    )
    assert a == b
    assert len(a) > 0
