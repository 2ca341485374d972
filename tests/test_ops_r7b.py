"""Round-7 batch E: weighted median, business-day calendar, rate-limited
backfill — semantic assertions beyond the differential parity gate."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from streamline_hybrid_engine_spark.registry import all_queries

_QS = all_queries()


def test_weighted_median_single_shuffle_plan(spark, sf_dir):
    from streamline_hybrid_engine_spark.plans import executed_plan

    p = executed_plan(_QS["win_weighted_median"].fn(spark, sf_dir))
    # one exchange on the group key serves both window frames AND the
    # final min-aggregate (flag is the grouping key)
    assert p.count("Exchange hashpartitioning") == 1


def test_weighted_median_crossing_rule(spark, sf_dir):
    """Per group, weight at-or-below the median must reach half the
    total, and weight strictly below must not."""
    df = _QS["win_weighted_median"].fn(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.floor(F.col("l_quantity")).cast("long").alias("wt"),
    )
    for row in df:
        at_or_below = (
            li.filter((F.col("flag") == row.flag) & (F.col("cents") <= row.wmedian_cents))
            .agg(F.sum("wt"))
            .first()[0]
        )
        below = (
            li.filter((F.col("flag") == row.flag) & (F.col("cents") < row.wmedian_cents))
            .agg(F.sum("wt"))
            .first()[0]
        ) or 0
        assert 2 * at_or_below >= row.total_weight
        assert 2 * below < row.total_weight


def test_busday_deadline_is_five_business_days(spark, sf_dir):
    """The closed form must agree with literal day-walking on every row."""
    rows = _QS["fn_busday_bundle"].fn(spark, sf_dir).collect()

    def walk(d: datetime.date, n: int) -> datetime.date:
        while d.weekday() >= 5:  # roll weekend start forward first
            d += datetime.timedelta(days=1)
        while n > 0:
            d += datetime.timedelta(days=1)
            if d.weekday() < 5:
                n -= 1
        return d

    for r in rows:
        assert r.deadline_5bd == walk(r.order_date, 5), r
        assert r.next_business_day.weekday() < 5
        assert r.deadline_5bd.weekday() < 5


def test_backfill_rate_limit_splits_batches(spark, sf_dir):
    rows = _QS["stream_rate_limited_backfill"].fn(spark, sf_dir).collect()
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert len(rows) == 4  # 8 staged files at 2 files/trigger
    assert sum(r.n_rows for r in rows) == n_events  # lossless, no dupes
