"""Async-I/O enrichment semantics (operators/enrichment.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from streamline_hybrid_engine_spark.operators.enrichment import async_enrich


def test_async_enrich_joins_and_preserves_rows(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 99)], "id bigint, k bigint"
    )
    out = async_enrich(df, "k", "v", {10: "a", 20: "b", 30: "c"}).collect()
    got = {r.id: r.v for r in out}
    # every input row survives; unknown keys surface NULL (left-join face)
    assert got == {1: "a", 2: "b", 3: "c", 4: None}


def test_async_enrich_capacity_smaller_than_batch(spark):
    """Capacity below the batch size must still enrich every row (the
    semaphore bounds in-flight lookups, it must not drop or reorder)."""
    rows = [(i, i % 7) for i in range(500)]
    df = spark.createDataFrame(rows, "id bigint, k bigint").repartition(2)
    lookup = {k: f"v{k}" for k in range(7)}
    out = async_enrich(df, "k", "v", lookup, capacity=3)
    assert out.filter(F.col("v") != F.concat(F.lit("v"), F.col("k"))).count() == 0
    assert out.count() == 500
