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


# --- model-based properties: library primitives vs brute-force Python --------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_iv = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(1, 20)),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_iv)
def test_interval_merge_matches_brute_force(spark, rows):
    from streamline_hybrid_engine_spark import interval_merge

    data = [
        (k, i, s, s + ln) for i, (k, s, ln) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "k long, id long, s long, e long")
    got = {
        (r.k, r.island_start, r.island_end, r.n_intervals)
        for r in interval_merge(df, ["k"], "s", "e", order_col="id").collect()
    }
    # brute force: sort per key, sweep with running max end
    expect = set()
    for k in {d[0] for d in data}:
        ivs = sorted((s, e) for kk, _, s, e in data if kk == k)
        cur_s, cur_e, n = ivs[0][0], ivs[0][1], 1
        for s, e in ivs[1:]:
            if s <= cur_e:
                cur_e, n = max(cur_e, e), n + 1
            else:
                expect.add((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
        expect.add((k, cur_s, cur_e, n))
    assert got == expect


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(-50, 50), st.integers(1, 9)),
        min_size=1,
        max_size=15,
    )
)
def test_weighted_median_matches_brute_force(spark, rows):
    from streamline_hybrid_engine_spark import weighted_median

    df = spark.createDataFrame(rows, "k long, v long, w long")
    got = {
        (r.k, r.wmedian, r.total_weight)
        for r in weighted_median(df, ["k"], "v", "w").collect()
    }
    expect = set()
    for k in {r[0] for r in rows}:
        pts = sorted((v, w) for kk, v, w in rows if kk == k)
        tot = sum(w for _, w in pts)
        cum = 0
        for v, w in pts:
            cum += w
            if 2 * cum >= tot:
                expect.add((k, v, tot))
                break
    assert got == expect


def test_waterfill_allocation_sums_to_budget(spark, sf_dir):
    """Σ allocation == floor(0.4·total) and no source exceeds its own
    tokens; capped sources all land within 1 token of each other (the
    water level)."""
    import pyspark.sql.functions as F  # noqa: F811

    rows = _QS["llm_mix_waterfill"].fn(spark, sf_dir).collect()
    total = sum(r.n_tokens for r in rows)
    assert sum(r.allocation for r in rows) == total * 4 // 10
    for r in rows:
        assert r.allocation <= r.n_tokens
    capped = [r.allocation for r in rows if r.capped]
    if capped:
        assert max(capped) - min(capped) <= 1
        # every uncapped source is smaller than the water level
        for r in rows:
            if not r.capped:
                assert r.n_tokens <= min(capped)


def test_checkpoint_resume_exactly_once_accounting(spark, sf_dir):
    """Across a stop/restart on the same checkpoint, phase 2 must process
    exactly the rows that landed while the job was down — no replay of
    phase 1, no loss."""
    rows = {
        r.phase: r
        for r in _QS["stream_checkpoint_resume"].fn(spark, sf_dir).collect()
    }
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    phase1 = rows["phase1"].n_rows
    assert phase1 > 0
    assert rows["phase2"].n_rows == total - phase1


def test_xcorr_lag0_is_series_correlation_diagonal(spark, sf_dir):
    """ts_cross_correlation_lag at lag 0 must reproduce
    ts_series_correlation exactly (the lag-0 slice IS that id, just
    ordered-pair-expanded), and every ordered pair must flag exactly
    one best lag."""
    lagged = _QS["ts_cross_correlation_lag"].fn(spark, sf_dir).collect()
    base = {
        (r["type_a"], r["type_b"]): (r["n_hours"], r["corr"])
        for r in _QS["ts_series_correlation"].fn(spark, sf_dir).collect()
    }
    lag0 = {
        (r["type_a"], r["type_b"]): (r["n_hours"], r["xcorr"])
        for r in lagged
        if r["lag_h"] == 0
    }
    # the unordered-pair id keeps type_a < type_b; lag-0 xcorr is
    # symmetric so both ordered orientations must match it
    for (a, b), v in base.items():
        assert lag0[(a, b)] == v
        assert lag0[(b, a)] == v
    best = {}
    for r in lagged:
        if r["is_best_lag"] == 1:
            key = (r["type_a"], r["type_b"])
            assert key not in best, f"two best lags for {key}"
            best[key] = r["lag_h"]
    assert set(best) == {k for k in lag0}
