"""Incremental view maintenance — partial-aggregate state + delta merge.

The capability a warehouse's materialized views and the reference-style
hybrid engines' upsert sinks share: an aggregate TABLE maintained by
merging each new batch's partial aggregates into stored state, never
recomputing history. Spark expresses it with zero custom machinery
because every algebraic aggregate already decomposes into mergeable
state: SUM merges by +, COUNT by +, MIN/MAX by min/max, AVG by keeping
(sum, count) — the same decomposition Spark's own partial/final
aggregation uses inside one query (test_agg_has_partial_final_split pins
it), lifted here across BATCHES.

The streaming face of the same idea is `stream_upsert_snapshot`
(foreachBatch merge into a keyed snapshot); this module certifies the
batch/backfill face, and its oracle is the strongest possible check: the
merged state must hash-equal a from-scratch recompute over all data.

Scale: state and delta are both aggregates shuffled on the SAME group
key, so the merge re-agg reuses the partitioning; state size is bounded
by the key cardinality, not history length — the entire point of IVM at
100 TB (re-aggregating a year of facts per refresh vs merging a day's
partial).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from streamline_hybrid_engine_spark.catalog import load_table
from streamline_hybrid_engine_spark.registry import query

#: history/delta split point — deltas are orders from 1997 onward.
IVM_CUTOFF = "1997-01-01"

_MERGE_OPS = {"sum": F.sum, "min": F.min, "max": F.max}


def ivm_merge(
    state: DataFrame, delta: DataFrame, keys: list[str], merges: dict[str, str]
) -> DataFrame:
    """Merge two partial-aggregate tables (identical schemas) into one —
    the library face of incremental view maintenance. ``merges`` names
    each measure column's merge operator: ``"sum"`` (for SUM and COUNT
    partials), ``"min"``, ``"max"``. Non-algebraic measures must be
    carried as their mergeable state (AVG as a (sum, count) pair and
    re-derived after the merge) — a column with no listed operator is a
    loud error, never silently dropped.

    Scale: both inputs are aggregates keyed on ``keys``; the merge is
    one unionByName + re-aggregate on the SAME key, so the shuffle
    reuses the grouping and state size is bounded by key cardinality,
    not history length (the point of IVM at 100 TB)."""
    bad = {c: op for c, op in merges.items() if op not in _MERGE_OPS}
    if bad:
        raise ValueError(f"unknown merge operators: {bad} (use sum/min/max)")
    for df, side in ((state, "state"), (delta, "delta")):
        missing = set(df.columns) - set(keys) - set(merges)
        if missing:
            raise ValueError(
                f"{side} has columns with no merge operator: {sorted(missing)}"
            )
    aggs = [_MERGE_OPS[op](c).alias(c) for c, op in merges.items()]
    return state.unionByName(delta).groupBy(*keys).agg(*aggs)

_MEASURES = """
           sum(CAST(floor(o_totalprice * 1000000) AS BIGINT)) AS sum_fx,
           count(*) AS n_orders,
           round(max(o_totalprice), 6) AS max_price
"""


@query(
    "ivm_incremental_agg_merge",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           round(CAST(sum(CAST(floor(o_totalprice * 1000000) AS BIGINT))
                      AS DOUBLE) / 1000000, 6) AS sum_totalprice,
           count(*) AS n_orders,
           round(max(o_totalprice), 6) AS max_price,
           round(CAST(floor(CAST(sum(CAST(floor(o_totalprice * 1000000) AS BIGINT)) AS DOUBLE)
                            / count(*)) AS DOUBLE) / 1000000, 6) AS avg_price
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
    tags=("ivm", "aggregates"),
)
def ivm_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance, certified by recompute: build
    the materialized state from pre-1997 orders, build the 1997+ delta's
    PARTIAL aggregates, merge state ⊕ delta with each measure's merge
    operator (sum→+, count→+, max→max; avg is NOT merged directly — it
    re-derives from the merged (sum, count) pair, the decomposition that
    makes AVG maintainable at all). The oracle aggregates the full table
    from scratch, so the hash gate proves merge(partials) ≡ recompute —
    the algebraic-correctness property IVM rests on. Fixed-point micros
    keep every merge integer-exact (a float SUM would drift between
    merge orders and the gate would see it).

    Production shape: `state` lives as a keyed table (Delta/Iceberg
    MERGE INTO target or `stream_upsert_snapshot`'s foreachBatch
    snapshot); each refresh computes only the delta partition's partials
    — this query IS that refresh with both sides read from the fixture."""
    o = load_table(spark, sf_dir, "orders", parallel=True)

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus", "o_orderpriority").agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 1_000_000).cast("long")
            ).alias("sum_fx"),
            F.count("*").alias("n_orders"),
            F.max("o_totalprice").alias("max_price"),
        )

    cutoff = F.lit(IVM_CUTOFF).cast("timestamp")
    state = partials(o.filter(F.col("o_orderdate") < cutoff))
    delta = partials(o.filter(F.col("o_orderdate") >= cutoff))
    merged = ivm_merge(
        state,
        delta,
        keys=["o_orderstatus", "o_orderpriority"],
        merges={"sum_fx": "sum", "n_orders": "sum", "max_price": "max"},
    )
    return merged.select(
        "o_orderstatus",
        "o_orderpriority",
        F.round(F.col("sum_fx").cast("double") / 1_000_000, 6).alias(
            "sum_totalprice"
        ),
        "n_orders",
        F.round("max_price", 6).alias("max_price"),
        F.round(
            F.floor(
                F.col("sum_fx").cast("double") / F.col("n_orders")
            ).cast("double")
            / 1_000_000,
            6,
        ).alias("avg_price"),
    )


@query(
    "ivm_retractable_agg",
    oracle="""
    WITH final_state AS (
      SELECT o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 17 <> 3
      UNION ALL
      SELECT o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT) + 10000 AS cents
      FROM orders WHERE o_orderkey % 19 = 4
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(cents AS HUGEINT)) AS BIGINT) AS sum_cents,
           CAST(floor(CAST(sum(CAST(cents AS HUGEINT)) AS DOUBLE) / count(*))
                AS BIGINT) AS avg_cents_floor
    FROM final_state GROUP BY o_orderstatus
    """,
    tags=("ivm", "changelog"),
)
def ivm_retractable_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retractable aggregate maintenance — the changelog algebra with
    DELETES: the view is kept as weighted partials (w = +1 insert,
    −1 retraction), so n = Σw and sum = Σ(w·x); the base table's rows,
    a delete changelog (every 17th order leaves) and an insert
    changelog (every 19th order re-enters re-priced +100.00 under a new
    key) all merge through ONE groupBy — the engine never rebuilds the
    view. The oracle recomputes the FINAL state from scratch; equality
    certifies the retraction algebra, the property that makes a
    changelog-consuming materialized view correct under updates (an
    update = retract old ⊕ insert new). AVG re-derives from (sum, n)
    as in ivm_incremental_agg_merge; max is deliberately absent —
    MAX is NOT retractable without per-group value multisets, and the
    docstring is where that boundary is recorded."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = o.select(
        "o_orderstatus", cents.alias("cents"), F.lit(1).alias("w")
    )
    deletes = o.filter(F.col("o_orderkey") % 17 == 3).select(
        "o_orderstatus", cents.alias("cents"), F.lit(-1).alias("w")
    )
    inserts = o.filter(F.col("o_orderkey") % 19 == 4).select(
        "o_orderstatus",
        (cents + 10000).alias("cents"),
        F.lit(1).alias("w"),
    )
    log = base.unionAll(deletes).unionAll(inserts)
    dec = "decimal(38,0)"
    merged = log.groupBy("o_orderstatus").agg(
        F.sum("w").cast("long").alias("n"),
        F.sum((F.col("w") * F.col("cents")).cast(dec)).cast("long").alias(
            "sum_cents"
        ),
    )
    return merged.select(
        "o_orderstatus",
        "n",
        "sum_cents",
        F.floor(F.col("sum_cents").cast("double") / F.col("n"))
        .cast("long")
        .alias("avg_cents_floor"),
    )
