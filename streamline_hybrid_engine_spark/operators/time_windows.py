"""Event-time group windows, batch analogs — SURVEY §2.9.

Reference analog: Flink's window assigners (``TumblingEventTimeWindows``,
``SlidingEventTimeWindows``, ``EventTimeSessionWindows``) + the ~1k-LoC
``WindowOperator``. Spark's ``window()`` / ``session_window()`` grouping
expressions implement identical semantics and — crucially — work in BOTH
batch and streaming plans, which is the hybrid batch-stream story: the same
query text runs over a bounded DataFrame here and over ``readStream`` in
streaming/jobs.py.

Alignment notes (oracle parity):
- Spark tumble/hop windows align to the Unix epoch; DuckDB ``date_trunc``/
  ``time_bucket`` (origin 2000-01-01) land on the same grid for 1h/15m.
- Spark sessions close when the next event is >= gap after the previous
  (window end = last_ts + gap, end-exclusive) → the gaps-and-islands oracle
  uses ``diff >= gap`` as the session-break predicate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from streamline_hybrid_engine_spark.catalog import load_table
from streamline_hybrid_engine_spark.functions.numeric import dsum, osum
from streamline_hybrid_engine_spark.registry import _REGISTRY, query


@query(
    "win_tumble_1h_batch",
    oracle=f"""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws,
           event_type,
           count(*) AS n,
           {osum("value", "sum_value")}
    FROM events
    GROUP BY ws, event_type
    """,
    tags=("timewindow",),
)
def win_tumble_1h_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time window (TUMBLE in the reference's SQL)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sum_value")
    )


@query(
    "win_hop_batch",
    oracle=f"""
    SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
             - CAST(gs.i AS INT) * INTERVAL '15 minutes' AS ws,
           count(*) AS n,
           {osum("value", "sum_value")}
    FROM events CROSS JOIN (SELECT generate_series AS i FROM generate_series(0, 3)) gs
    GROUP BY ws
    """,
    tags=("timewindow",),
)
def win_hop_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding/hopping window, 1h size / 15m slide (HOP in reference SQL).

    Each event belongs to exactly size/slide = 4 windows; the oracle
    reproduces the assignment via an explicit 0..3 replication.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("ws"), "n", "sum_value")
    )


@query(
    "win_session_30m_batch",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS uts,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                      >= INTERVAL '30 minutes'
                  OR lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ), numbered AS (
      SELECT user_id, uts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY uts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT user_id,
           min(uts) AS session_start,
           max(uts) + INTERVAL '30 minutes' AS session_end,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, sid
    """,
    tags=("timewindow", "session"),
)
def win_session_30m_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window, 30m gap (SESSION in reference SQL), in batch.

    The oracle is the classic gaps-and-islands rewrite; Spark's
    ``session_window`` end = last event + gap, and a gap of exactly 30m
    starts a new session (end-exclusive) → oracle breaks on ``diff >= gap``.
    """
    return sessionize(
        load_table(spark, sf_dir, "events"), "ts", ["user_id"], "30 minutes"
    )


def sessionize(
    df: DataFrame, ts_col: str, keys: list[str], gap: str = "30 minutes"
) -> DataFrame:
    """Library primitive: group ``df`` into per-key sessions separated by
    ``gap`` of inactivity; returns one row per session with
    (keys..., session_start, session_end, n_events). Works unchanged on
    batch and streaming DataFrames (``session_window`` is valid in both
    plans — add a watermark on ``ts_col`` first for streaming). Gap may
    also be a Column expression for per-event dynamic gaps
    (win_session_dynamic_gap's form). One shuffle on the keys; for
    whale-key skew use the two-phase salted form win_session_two_phase
    documents."""
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("_w"), *keys)
        .agg(F.count("*").alias("n_events"))
        .select(
            *keys,
            F.col("_w.start").alias("session_start"),
            F.col("_w.end").alias("session_end"),
            "n_events",
        )
    )


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute gap, in microseconds
SESSION_SALT_BUCKET_US = 6 * 3600 * 1_000_000  # 6-hour time-salt buckets


@query(
    "win_session_two_phase",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS uts,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                      >= INTERVAL '30 minutes'
                  OR lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ), numbered AS (
      SELECT user_id, uts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY uts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT user_id,
           min(uts) AS session_start,
           max(uts) + INTERVAL '30 minutes' AS session_end,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, sid
    """,
    tags=("timewindow", "session", "skew"),
)
def win_session_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase sessionization (SURVEY §4.2's
    "session-window skew salting", realized): identical sessions to
    `win_session_30m_batch`, different physical plan for the hot-key case.

    Native `session_window` (and the single gaps-and-islands window) hash
    ALL of a user's events to one task — a bot user with 10⁸ events is a
    straggler no AQE can split, because sessionization looks
    order-dependent. It isn't: session merging is ASSOCIATIVE. Phase 1
    sessionizes within (user, 6-hour time bucket) — the bucket is a
    DETERMINISTIC salt, so the hottest key now bounds a task at one user ×
    6 hours — emitting partial sessions (start, last_ts, n). Phase 2
    re-merges ONLY the partials (rows = sessions, orders of magnitude
    fewer than events) per user: a partial chains to its predecessor iff
    its start is < gap after the predecessor's last event — exactly the
    within-run criterion, because time-bucketing preserves event order, so
    a bucket boundary can only split a run between two CONSECUTIVE events
    and the merge test re-applies the same gap predicate to that same
    event pair. Oracle: the standard single-pass gaps-and-islands — the
    rewrite must be invisible.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    us = F.unix_micros("ts")
    bucketed = ev.withColumn(
        "bucket", F.floor(us / F.lit(SESSION_SALT_BUCKET_US))
    ).withColumn("us", us)
    from pyspark.sql import Window

    w1 = Window.partitionBy("user_id", "bucket").orderBy("us", "event_id")
    brk = (
        F.when(
            F.lag("us").over(w1).isNull()
            | ((F.col("us") - F.lag("us").over(w1)) >= SESSION_GAP_US),
            1,
        )
        .otherwise(0)
    )
    sid = F.sum(brk).over(
        Window.partitionBy("user_id", "bucket")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    partials = (
        bucketed.withColumn("sid", sid)
        .groupBy("user_id", "bucket", "sid")
        .agg(
            F.min("us").alias("p_start"),
            F.max("us").alias("p_last"),
            F.count("*").alias("p_n"),
        )
    )
    # phase 2 over partial sessions only: time order is (p_start) — buckets
    # are disjoint time ranges, so partials of one user never interleave
    w2 = Window.partitionBy("user_id").orderBy("p_start", "bucket", "sid")
    brk2 = (
        F.when(
            F.lag("p_last").over(w2).isNull()
            | ((F.col("p_start") - F.lag("p_last").over(w2)) >= SESSION_GAP_US),
            1,
        )
        .otherwise(0)
    )
    gid = F.sum(brk2).over(
        Window.partitionBy("user_id")
        .orderBy("p_start", "bucket", "sid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        partials.withColumn("gid", gid)
        .groupBy("user_id", "gid")
        .agg(
            F.timestamp_micros(F.min("p_start")).alias("session_start"),
            F.timestamp_micros(F.max("p_last") + SESSION_GAP_US).alias(
                "session_end"
            ),
            F.sum("p_n").alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


@query(
    "cep_lite_error_after_purchase",
    oracle="""
    SELECT user_id, purchase_id, error_id, round(gap_s, 6) AS gap_s
    FROM (
      SELECT user_id,
             event_id AS error_id,
             lag(event_id) OVER w AS purchase_id,
             lag(event_type) OVER w AS prev_type,
             event_type,
             (epoch_us(CAST(ts AS TIMESTAMP))
              - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w)) / 1000000.0 AS gap_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    )
    WHERE event_type = 'error' AND prev_type = 'purchase' AND gap_s <= 600
    """,
    tags=("timewindow", "cep"),
)
def cep_lite_error_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP-lite (MATCH_RECOGNIZE analog): purchase immediately followed by
    an error within 10 minutes, detected via lag sequences — the simple-
    pattern subset of Flink's NFA-based CEP library (SURVEY §2.9)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    ) / F.lit(1000000.0)
    return (
        ev.select(
            "user_id",
            F.col("event_id").alias("error_id"),
            F.lag("event_id").over(w).alias("purchase_id"),
            F.lag("event_type").over(w).alias("prev_type"),
            "event_type",
            gap.alias("gap_raw"),
        )
        .filter(
            (F.col("event_type") == "error")
            & (F.col("prev_type") == "purchase")
            & (F.col("gap_raw") <= 600)
        )
        .select(
            "user_id", "purchase_id", "error_id", F.round("gap_raw", 6).alias("gap_s")
        )
    )


@query(
    "ts_rollup_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(CAST(ts AS TIMESTAMP))) AS lo,
             date_trunc('hour', max(CAST(ts AS TIMESTAMP))) AS hi
      FROM events
    ),
    grid AS (
      SELECT t.hour, et.event_type
      FROM bounds,
           LATERAL unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS t(hour),
           (SELECT DISTINCT event_type FROM events) et
    ),
    agg AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
             count(*) AS n,
             CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_value_fp
      FROM events GROUP BY 1, 2
    )
    SELECT g.hour, g.event_type,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n,
           CAST(coalesce(a.sum_value_fp, 0) AS BIGINT) AS sum_value_fp,
           CAST(CASE WHEN a.hour IS NULL THEN 1 ELSE 0 END AS INT) AS gap_filled
    FROM grid g LEFT JOIN agg a
      ON a.hour = g.hour AND a.event_type = g.event_type
    """,
    tags=("timewindow", "rollup", "gapfill"),
)
def ts_rollup_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous rollup WITH gap fill: hourly aggregates
    per event type over the corpus's FULL hour grid — empty buckets
    materialize as zero rows flagged `gap_filled` (dashboards and
    downstream window math need the dense grid; a plain groupBy silently
    drops empty buckets).

    Shape: one pass aggregates (map-side partials), the dense grid comes
    from `sequence(lo, hi)` × distinct keys — |hours|·|keys| rows built
    from two broadcast scalars, never from the data volume — and one left
    join plants the aggregates on the grid. At 100 TB the grid is still
    tiny (hours × keys), so the join broadcasts the AGGREGATED side or the
    grid, whichever is smaller; the raw stream is touched exactly once.
    """
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias(
            "sum_value_fp"
        ),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.expr("sequence(lo, hi, INTERVAL 1 HOUR)")
        ).alias("hour")
    )
    keys = ev.select("event_type").distinct()
    grid = hours.crossJoin(F.broadcast(keys))
    return grid.join(agg, ["hour", "event_type"], "left").select(
        "hour",
        "event_type",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("sum_value_fp", F.lit(0)).alias("sum_value_fp"),
        F.when(F.col("n").isNull(), 1).otherwise(0).cast("int").alias(
            "gap_filled"
        ),
    )


@query(
    "ts_interpolate_linear",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(CAST(ts AS TIMESTAMP))) AS lo,
             date_trunc('hour', max(CAST(ts AS TIMESTAMP))) AS hi
      FROM events
    ),
    grid AS (
      SELECT t.hour, et.event_type
      FROM bounds,
           LATERAL unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS t(hour),
           (SELECT DISTINCT event_type FROM events) et
    ),
    agg AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
             CAST(floor(CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS DOUBLE)
                        / count(*)) AS BIGINT) AS mean_fp
      FROM events GROUP BY 1, 2
    ),
    planted AS (
      SELECT g.hour, g.event_type, a.mean_fp,
             CAST(epoch(g.hour) // 3600 AS BIGINT) AS idx
      FROM grid g LEFT JOIN agg a
        ON a.hour = g.hour AND a.event_type = g.event_type
    ),
    nbrs AS (
      SELECT hour, event_type, mean_fp, idx,
             last_value(mean_fp IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
             last_value(CASE WHEN mean_fp IS NOT NULL THEN idx END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pi,
             first_value(mean_fp IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY idx
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN mean_fp IS NOT NULL THEN idx END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY idx
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS ni
      FROM planted
    )
    SELECT hour, event_type,
           CASE WHEN mean_fp IS NOT NULL THEN 'actual'
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
                ELSE 'edge' END AS src,
           CAST(CASE
             WHEN mean_fp IS NOT NULL THEN mean_fp
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               CAST(floor(CAST(pv * (ni - idx) + nv * (idx - pi) AS DOUBLE)
                          / (ni - pi)) AS BIGINT)
             ELSE NULL END AS BIGINT) AS value_fp
    FROM nbrs
    """,
    tags=("timewindow", "interpolate", "gapfill"),
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the dense hourly grid — the hypertable
    `interpolate()` companion to `ts_rollup_gapfill`'s zero-fill: a gap
    hour takes the value linearly between its nearest PRESENT hours
    (time-weighted: pv·(ni−i) + nv·(i−pi) over ni−pi), hours before the
    first / after the last observation are flagged `edge` and stay NULL —
    interpolation never extrapolates.

    Determinism: hourly means and the interpolation are fixed-point
    integer arithmetic; the single division is an exact-integer numerator
    over a small integer denominator evaluated in double and floored —
    products stay ≤ ~1e13, exactly representable, so both engines floor
    the same rational (repo convention, see llm_kmeans_lloyd).

    Shape: one aggregation pass, the broadcast-scalar grid, and two
    IGNORE-NULLS window sweeps per key (forward + backward) over
    |hours|·|keys| GRID rows — never the raw volume. 100 TB: identical;
    the grid is dashboard-sized regardless of input scale.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.floor(
            F.sum(F.floor(F.col("value") * 1000000).cast("long")).cast("double")
            / F.count("*")
        )
        .cast("long")
        .alias("mean_fp")
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.expr("sequence(lo, hi, INTERVAL 1 HOUR)")).alias("hour")
    )
    keys = ev.select("event_type").distinct()
    planted = (
        hours.crossJoin(F.broadcast(keys))
        .join(agg, ["hour", "event_type"], "left")
        .withColumn("idx", (F.unix_micros("hour") / F.lit(3_600_000_000)).cast("long"))
    )
    back = (
        Window.partitionBy("event_type")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("idx")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    present_idx = F.when(F.col("mean_fp").isNotNull(), F.col("idx"))
    n = planted.select(
        "hour",
        "event_type",
        "mean_fp",
        "idx",
        F.last("mean_fp", ignorenulls=True).over(back).alias("pv"),
        F.last(present_idx, ignorenulls=True).over(back).alias("pi"),
        F.first("mean_fp", ignorenulls=True).over(fwd).alias("nv"),
        F.first(present_idx, ignorenulls=True).over(fwd).alias("ni"),
    )
    interp = F.floor(
        (
            F.col("pv") * (F.col("ni") - F.col("idx"))
            + F.col("nv") * (F.col("idx") - F.col("pi"))
        ).cast("double")
        / (F.col("ni") - F.col("pi"))
    ).cast("long")
    src = (
        F.when(F.col("mean_fp").isNotNull(), "actual")
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), "interp")
        .otherwise("edge")
    )
    return n.select(
        "hour",
        "event_type",
        src.alias("src"),
        F.when(F.col("mean_fp").isNotNull(), F.col("mean_fp"))
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp)
        .alias("value_fp"),
    )


@query(
    "win_session_dynamic_gap",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS uts,
             CASE WHEN event_type IN ('purchase', 'signup')
                  THEN INTERVAL '60 minutes' ELSE INTERVAL '15 minutes'
             END AS gap
      FROM events
    ), marked AS (
      SELECT user_id, event_id, uts, gap,
             max(uts + gap) OVER (PARTITION BY user_id ORDER BY uts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING) AS prev_end
      FROM g
    ), numbered AS (
      SELECT user_id, uts, gap,
             sum(CASE WHEN prev_end IS NULL OR uts >= prev_end
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY uts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT user_id,
           min(uts) AS session_start,
           max(uts + gap) AS session_end,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, sid
    """,
    tags=("timewindow", "session", "dynamic"),
)
def win_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window with a DYNAMIC per-event gap — engagement events
    (purchase/signup) hold a session open for 60 minutes, passive events
    (click/view/error) only 15: each event contributes the interval
    [ts, ts+gap(event)) and overlapping intervals merge, so the session's
    end is the max contributed end, not last-event+constant.

    This is the expression-gap form of ``session_window`` (the fixed-gap
    row is win_session_30m_batch; Flink analog: a custom
    ``SessionWindowTimeGapExtractor``). Oracle: interval-merge
    gaps-and-islands — a session breaks where an event's start reaches
    the RUNNING MAX of all previous ends (a lag of the end alone is
    wrong: a long-gap event can outlive several short-gap successors).
    Scale shape is identical to the fixed-gap session: one shuffle on
    user_id, per-key ordered merge, no pair explosion; the same
    two-phase salted decomposition (win_session_two_phase) applies when
    a key is hot."""
    ev = load_table(spark, sf_dir, "events")
    # session_window requires CalendarIntervalType gaps — INTERVAL '..'
    # literals parse as DayTimeIntervalType, so build via make_interval
    gap = F.when(
        F.col("event_type").isin("purchase", "signup"),
        F.expr("make_interval(0, 0, 0, 0, 0, 60, 0)"),
    ).otherwise(F.expr("make_interval(0, 0, 0, 0, 0, 15, 0)"))
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "ts_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             date_trunc('day', min(CAST(ts AS TIMESTAMP))) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id,
             date_trunc('day', CAST(ts AS TIMESTAMP)) AS act_day
      FROM events
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, a.act_day) AS BIGINT) AS day_offset,
           count(*) AS n_active_users
    FROM firsts f
    JOIN activity a ON a.user_id = f.user_id
    WHERE date_diff('day', f.cohort_day, a.act_day) <= 7
    GROUP BY f.cohort_day, day_offset
    """,
    tags=("timewindow", "cohort"),
)
def ts_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort analysis — the canonical product-analytics rollup
    the reference's SQL users run daily: users grouped by first-seen DAY
    (their cohort; the fixture's events span one month, so day
    granularity is what yields a real cohort matrix), counted as active
    per subsequent day offset (≤ 7). Offsets are exact integer date
    subtraction, so no calendar-interval ambiguity exists between
    engines.

    Scale shape: one groupBy(user) for first-seen, one distinct over
    (user, month) — both shuffle on user_id so ONE partitioning serves
    both sides and the join is co-partitioned; the final rollup's key
    space is cohorts × offsets (tiny). At 100 TB this is incremental:
    the firsts table is a running MERGE (new users only) and each day
    appends to activity — exactly the cdc_apply_latest / upsert-sink
    pattern elsewhere in the registry."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    activity = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("act_day")
    ).distinct()
    joined = firsts.join(activity, "user_id").withColumn(
        "day_offset",
        F.datediff(F.col("act_day"), F.col("cohort_day")).cast("long"),
    )
    return (
        joined.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_active_users"))
    )


@query(
    "ts_linear_attribution",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts,
             CAST(floor(value * 1000000) AS BIGINT) AS value_fx
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS c_ts
      FROM events WHERE event_type = 'click'
    ),
    touched AS (
      SELECT p.purchase_id, p.value_fx, c.click_id,
             count(*) OVER (PARTITION BY p.purchase_id) AS n_touches
      FROM p JOIN c
        ON p.user_id = c.user_id
       AND c.c_ts BETWEEN p.p_ts - INTERVAL 30 MINUTE AND p.p_ts
    )
    SELECT click_id,
           count(*) AS n_purchases,
           CAST(sum(value_fx // n_touches) AS BIGINT) AS attributed_micros
    FROM touched
    GROUP BY click_id
    """,
    tags=("timewindow", "attribution"),
)
def ts_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution — each purchase's value split
    EQUALLY across the clicks that preceded it within a 30-minute
    window, summed per click (the ad-tech revenue-crediting workload;
    first-touch and last-touch are the as-of joins, this is the
    many-touch completion). The per-touch share is integer division of
    fixed-point micros (``value_fx div n_touches``) — exact and
    identical cross-engine, where a double division would ulp-flake the
    sum; the deliberate remainder (up to n-1 micros per purchase) stays
    unassigned exactly as both engines compute it.

    Scale shape: the touch set comes from the SAME bounded interval
    join as join_interval_events (user equi-key + time-range predicate
    — never a pair explosion past the window), the per-purchase touch
    count is a window over the purchase key, and the final rollup
    shuffles on click_id. At 100 TB the binned form (join_range_binned)
    replaces the raw range join, unchanged semantics."""
    from pyspark.sql import Window  # noqa: PLC0415 — only this row needs it

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.floor(F.col("value") * 1_000_000).cast("long").alias("value_fx"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    touched = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).withColumn(
        "n_touches", F.count("*").over(Window.partitionBy("purchase_id"))
    )
    share = F.expr("value_fx div n_touches")
    return touched.groupBy("click_id").agg(
        F.count("*").alias("n_purchases"),
        F.sum(share).cast("long").alias("attributed_micros"),
    )


@query(
    "ts_asof_downsample",
    oracle="""
    WITH obs AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS uts,
             arg_max(value, event_id) AS v
      FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP)
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(date_trunc('hour', min(uts)), max(uts),
                                    INTERVAL 1 HOUR)) AS grid_ts
      FROM obs GROUP BY user_id
    )
    SELECT g.user_id, g.grid_ts, round(o.v, 6) AS asof_value
    FROM grid g
    ASOF LEFT JOIN obs o ON g.user_id = o.user_id AND g.grid_ts >= o.uts
    """,
    tags=("timeseries", "asof"),
)
def ts_asof_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of downsampling: resample each user's irregular event series to
    an hourly grid, each grid point carrying the LAST observed value
    at-or-before it (sample-and-hold — how tick data becomes bars and
    sensor streams become dashboards; distinct from `ts_rollup_gapfill`'s
    per-bucket aggregate+fill and `ts_interpolate_linear`'s line fit).
    Same-timestamp observations dedup to the max-event_id row first so
    the as-of pick is total-ordered; grid points before a user's first
    observation stay NULL.

    Implementation is the UNION-MARKER pattern, not a join: grid markers
    interleave with observations in one (user → ts, marker-last) sort and
    ``last(ignorenulls)`` carries the value forward — one shuffle on
    user_id, one per-partition sort, zero join (the per-key as-of join
    `join_asof_last_purchase` uses the same trick; a 100 TB resample
    inherits its skew story). The oracle cross-checks with a genuinely
    different algorithm — DuckDB's native ASOF LEFT JOIN — so a
    fencepost bug in either formulation (at-or-before vs strictly-
    before, marker-vs-event tie order) breaks the hash."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy("user_id", "ts").agg(
        F.max_by("value", "event_id").alias("v")
    )
    grid = (
        obs.groupBy("user_id")
        .agg(F.date_trunc("hour", F.min("ts")).alias("t0"), F.max("ts").alias("t1"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(t0, t1, interval 1 hour)")).alias("grid_ts"),
        )
    )
    unioned = obs.select(
        "user_id", F.col("ts").alias("pt"), F.lit(0).alias("marker"), "v"
    ).unionByName(
        grid.select(
            "user_id",
            F.col("grid_ts").alias("pt"),
            F.lit(1).alias("marker"),
            F.lit(None).cast("double").alias("v"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("pt", "marker")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("held", F.last("v", ignorenulls=True).over(w))
        .filter(F.col("marker") == 1)
        .select(
            "user_id",
            F.col("pt").alias("grid_ts"),
            F.round("held", 6).alias("asof_value"),
        )
    )


#: OHLC bar width — 6 hours, epoch-aligned (integer bucket key, so no
#: engine timezone/origin semantics are in play).
OHLC_BUCKET_S = 6 * 3600


@query(
    "ts_resample_ohlc",
    oracle=f"""
    WITH bucketed AS (
      SELECT user_id, value,
             (epoch_us(CAST(ts AS TIMESTAMP)) // {OHLC_BUCKET_S * 1_000_000})
               * {OHLC_BUCKET_S} AS bucket_start_s,
             first_value(value) OVER (
               PARTITION BY user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) // {OHLC_BUCKET_S * 1_000_000}
               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS o,
             first_value(value) OVER (
               PARTITION BY user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) // {OHLC_BUCKET_S * 1_000_000}
               ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS c
      FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, bucket_start_s,
           round(max(o), 6) AS open,
           round(max(value), 6) AS high,
           round(min(value), 6) AS low,
           round(max(c), 6) AS close,
           count(*) AS n_trades
    FROM bucketed
    GROUP BY user_id, bucket_start_s
    """,
    tags=("timeseries", "resample"),
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling — the canonical time-series downsample (kdb/
    InfluxDB/TimescaleDB candlestick rollup): per user and 6-hour
    epoch-aligned bucket, the first (open), max (high), min (low) and
    last (close) purchase value plus the trade count.

    Open/close are ONE partial/final aggregate via min_by/max_by over
    the (ts, event_id) struct. Physical note (plan-pinned): a STRUCT
    ordering key makes Spark pick SortAggregate, not HashAggregate (the
    agg buffer isn't UnsafeRow-mutable) — the per-partition sort is on
    the GROUPING key only and the map-side combine is fully intact, so
    the 100 TB win over a first_value window stands where it matters:
    one combined row per (user, bucket) crosses the shuffle instead of
    every event, and there is no (user → ts) window sort after it. The bucket key is integer epoch
    arithmetic (floor to 21600 s), deliberately NOT engine date-trunc
    functions — no timezone/origin semantics to diverge. Tie rows at the
    same (ts, event_id) cannot exist (event_id unique), so open/close
    are total-order deterministic."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    bucket = (
        F.floor(F.unix_micros("ts") / (OHLC_BUCKET_S * 1_000_000))
        * OHLC_BUCKET_S
    ).alias("bucket_start_s")
    tiebreak = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy("user_id", bucket).agg(
        F.round(F.min_by("value", tiebreak), 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max_by("value", tiebreak), 6).alias("close"),
        F.count("*").alias("n_trades"),
    )


@query(
    "ts_ewma_bitshift",
    oracle="""
    WITH RECURSIVE ev AS (
      SELECT user_id, event_id,
             CAST(floor(value * 1000000) AS BIGINT) AS fx,
             row_number() OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ) AS rn
      FROM events
    ),
    scan AS (
      SELECT user_id, event_id, rn, fx AS y FROM ev WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.event_id, e.rn, (e.fx + s.y) >> 1
      FROM scan s JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1
    )
    SELECT user_id, event_id, round(CAST(y AS DOUBLE) / 1000000, 6) AS ewma
    FROM scan
    """,
    tags=("timeseries", "iterative"),
)
def ts_ewma_bitshift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α = 1/2) per user over the
    event stream — smoothing, the time-series primitive windows cannot
    express (y_t depends on y_{t-1}, a scan not a frame). Made exactly
    reproducible by fixed-point + bit-shift: y_0 = fx_0,
    y_t = (fx_t + y_{t-1}) >> 1 on floor-µ longs — arithmetic shift is
    floor-division by 2 in BOTH engines (verified on negatives), so
    every smoothed value is integer-exact cross-engine, where a float
    α-blend would drift.

    Plan: ONE shuffle on user_id, then the whole recurrence folds inside
    a single row per user — sorted collect_list + an ``aggregate`` that
    appends each smoothed value to its accumulator array — and
    posexplodes back to per-event rows. Per-key memory = events-per-key
    (the same bound every per-key scan here has); keys parallelize
    across executors. Oracle: the recurrence as a recursive-CTE scan.
    Flink analog: keyed ProcessFunction carrying last-EWMA ValueState —
    `stream_user_session_state` is the streaming face of that pattern."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 1_000_000).cast("long").alias("fx"),
    )
    folded = (
        ev.groupBy("user_id")
        .agg(
            F.expr(
                "array_sort(collect_list(struct(ts, event_id, fx)))"
            ).alias("arr")
        )
        .withColumn(
            "ys",
            F.expr(
                "aggregate(arr, CAST(array() AS ARRAY<BIGINT>), (acc, s) -> "
                "acc || array(CASE WHEN size(acc) = 0 THEN s.fx "
                "ELSE shiftright(s.fx + element_at(acc, size(acc)), 1) END))"
            ),
        )
    )
    return folded.select(
        "user_id", F.posexplode(F.expr("arrays_zip(arr, ys)"))
    ).select(
        "user_id",
        F.col("col.arr.event_id").alias("event_id"),
        F.round(F.col("col.ys").cast("double") / 1_000_000, 6).alias("ewma"),
    )


#: regression epoch origin — x = seconds since this instant (slope is
#: shift-invariant; the intercept is defined AT this origin).
TREND_T0 = "2024-01-01 00:00:00"


@query(
    "ts_linear_trend",
    oracle=f"""
    WITH pts AS (
      SELECT user_id,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000
                  - epoch_us(TIMESTAMP '{TREND_T0}') // 1000000 AS HUGEINT) AS x,
             CAST(round(value * 100) AS HUGEINT) AS y
      FROM events
    ),
    sums AS (
      SELECT user_id, CAST(count(*) AS HUGEINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM pts GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_points,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 9) AS slope_cents_per_s,
           round(CAST(sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx AS DOUBLE)
                 / CAST(n * (n * sxx - sx * sx) AS DOUBLE) / 100, 6) AS intercept
    FROM sums
    """,
    tags=("timeseries", "regression"),
)
def ts_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key least-squares trend (slope + intercept of value over
    time) — the drift detector behind capacity forecasts and KPI
    monitors (the reference-era analog is a windowed regression UDAF;
    SQL engines ship it as regr_slope/regr_intercept, whose FLOAT sum
    order differs across engines and partitionings).

    Exactness: every sum (n, Σx, Σy, Σxy, Σx²) accumulates in
    DECIMAL(38,0) over integer x (seconds since a fixed origin — slope
    is shift-invariant, and the small offset keeps cross-products far
    from overflow at any per-key cardinality) and integer y (cents).
    Slope and intercept each become ONE division of identical exact
    integers → identical doubles, where regr_slope's running float
    moments would drift under Spark's partial aggregation. Plan: one
    partial-aggregating groupBy — five integer sums combine map-side,
    |users| rows shuffle, nothing else."""
    ev = load_table(spark, sf_dir, "events", parallel=True)
    dec = "decimal(38,0)"
    pts = ev.select(
        "user_id",
        (
            F.unix_seconds("ts")
            - F.unix_seconds(F.lit(TREND_T0).cast("timestamp"))
        )
        .cast(dec)
        .alias("x"),
        F.round(F.col("value") * 100).cast(dec).alias("y"),
    )
    sums = pts.groupBy("user_id").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(dec).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return sums.select(
        "user_id",
        F.col("n").cast("long").alias("n_points"),
        F.round(num.cast("double") / den.cast("double"), 9).alias(
            "slope_cents_per_s"
        ),
        F.round(
            (F.col("sy") * den - num * F.col("sx")).cast("double")
            / (F.col("n") * den).cast("double")
            / 100,
            6,
        ).alias("intercept"),
    )


@query(
    "ts_seasonal_profile",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             CAST(extract(HOUR FROM CAST(ts AS TIMESTAMP)) AS INTEGER) AS hod,
             CAST(floor(value * 1000000) AS BIGINT) AS fx
      FROM events
    ),
    prof AS (
      SELECT event_type, hod, count(*) AS n,
             sum(fx) AS sum_fx,
             floor(CAST(sum(fx) AS DOUBLE) / count(*)) AS mean_fx
      FROM pts GROUP BY event_type, hod
    ),
    gmeans AS (
      SELECT event_type,
             floor(CAST(sum(fx) AS DOUBLE) / count(*)) AS gmean_fx
      FROM pts GROUP BY event_type
    )
    SELECT p.event_type, p.hod, p.n,
           round(p.mean_fx / 1000000, 6) AS hod_mean,
           round((p.mean_fx - g.gmean_fx) / 1000000, 6) AS seasonal_dev
    FROM prof p JOIN gmeans g ON g.event_type = p.event_type
    """,
    tags=("timeseries", "seasonality"),
)
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile — the first step of every seasonal
    decomposition (and the 'seasonal naive' forecast baseline): per
    series (event_type), the mean value at each hour of day and its
    deviation from the series mean. Means are floor-of-exact-integer
    arithmetic (fixed-point sums ÷ exact counts, floored), so the
    profile hashes identically cross-engine where a float AVG would
    drift with partial-aggregation order. Plan: two partial-aggregating
    groupBys over the same scan (24×|series| and |series| rows move) +
    a broadcast join of the tiny global means — at 100 TB nothing but
    profile rows ever shuffles."""
    ev = load_table(spark, sf_dir, "events", parallel=True)
    pts = ev.select(
        "event_type",
        F.hour("ts").alias("hod"),
        F.floor(F.col("value") * 1_000_000).cast("long").alias("fx"),
    )
    prof = pts.groupBy("event_type", "hod").agg(
        F.count("*").alias("n"),
        F.floor(F.sum("fx").cast("double") / F.count("*")).alias("mean_fx"),
    )
    glob = pts.groupBy("event_type").agg(
        F.floor(F.sum("fx").cast("double") / F.count("*")).alias("gmean_fx")
    )
    return prof.join(F.broadcast(glob), "event_type").select(
        "event_type",
        "hod",
        "n",
        F.round(F.col("mean_fx") / 1_000_000, 6).alias("hod_mean"),
        F.round((F.col("mean_fx") - F.col("gmean_fx")) / 1_000_000, 6).alias(
            "seasonal_dev"
        ),
    )


@query(
    "ts_interval_merge",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS s,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT)
               + 1800000000 AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, s, e,
             CASE WHEN max(e) OVER (
                    PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) >= s THEN 0 ELSE 1 END AS is_new
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             CAST(sum(is_new) OVER (
               PARTITION BY user_id ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS island
      FROM flagged
    )
    SELECT user_id, island,
           min(s) AS island_start_us, max(e) AS island_end_us,
           count(*) AS n_intervals
    FROM islands GROUP BY user_id, island
    """,
    tags=("timeseries", "intervals"),
)
def ts_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval de-overlap (merge overlapping/touching intervals) — the
    gaps-and-islands pattern over ranges rather than points, behind
    uptime stitching, on-call coverage, and contiguous-session repair.
    Each event opens a 30-minute interval; per user, intervals whose
    start falls at or before the running max end so far fuse into one
    island. The running max end over ``ROWS UNBOUNDED PRECEDING AND 1
    PRECEDING`` is the textbook island detector: it handles the chain
    case (A overlaps B, B overlaps C, A spans both) that naive
    lag(end) misses. All arithmetic is epoch-micros longs — exact.

    Plan: one shuffle by user_id feeding two window passes over the
    same sort order (Spark fuses them into a single sort) + a final
    partial-aggregating groupBy on (user, island) — the group keys are
    a prefix extension of the window partitioning, so no extra
    exchange. At 100 TB a per-user timeline fits one partition by
    construction (user count ≫ executor count); no island ever spans
    partitions."""
    ev = load_table(spark, sf_dir, "events", parallel=True)
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("s"),
        (F.unix_micros(F.col("ts")) + 1_800_000_000).alias("e"),
    )
    return interval_merge(iv, ["user_id"], "s", "e", order_col="event_id").select(
        "user_id",
        "island",
        F.col("island_start").alias("island_start_us"),
        F.col("island_end").alias("island_end_us"),
        "n_intervals",
    )


def interval_merge(
    df: DataFrame,
    keys: list[str],
    start_col: str,
    end_col: str,
    order_col: str | None = None,
) -> DataFrame:
    """Library primitive: merge overlapping/touching intervals per key
    (gaps-and-islands over RANGES). Returns one row per merged island:
    (keys..., island, island_start, island_end, n_intervals). Start/end
    must be a totally ordered numeric/timestamp type; pass ``order_col``
    (a unique column) to pin intra-tie order when multiple intervals
    share a start — required for a deterministic island NUMBERING
    (island extents are tie-invariant either way). The island detector
    is the running-max-end over ``ROWS … AND 1 PRECEDING``, which
    handles chained overlaps that lag(end) misses. One shuffle on the
    keys; both window passes and the final aggregate share it (the
    aggregate keys extend the window partitioning)."""
    from pyspark.sql import Window

    order = [start_col, order_col] if order_col else [start_col, end_col]
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = df.withColumn(
        "is_new",
        F.when(F.max(end_col).over(w_prev) >= F.col(start_col), 0).otherwise(1),
    )
    islands = flagged.withColumn("island", F.sum("is_new").over(w_run))
    return islands.groupBy(*keys, "island").agg(
        F.min(start_col).alias("island_start"),
        F.max(end_col).alias("island_end"),
        F.count("*").alias("n_intervals"),
    )


@query(
    "cep_funnel_conversion",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us
      FROM events
    ),
    v AS (SELECT user_id, min(us) AS t_view FROM ev
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.us) AS t_click
          FROM ev e JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.us > v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.us) AS t_buy
          FROM ev e JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.us > c.t_click
          GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_click,
           (SELECT count(*) FROM p) AS n_purchase,
           round(CAST((SELECT count(*) FROM c) AS DOUBLE)
                 / (SELECT count(*) FROM v), 6) AS view_to_click,
           round(CAST((SELECT count(*) FROM p) AS DOUBLE)
                 / (SELECT count(*) FROM c), 6) AS click_to_purchase,
           round(CAST((SELECT count(*) FROM p) AS DOUBLE)
                 / (SELECT count(*) FROM v), 6) AS overall
    """,
    tags=("cep", "funnel"),
)
def cep_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion rates — the product-analytics staple
    (Amplitude/Mixpanel funnels): of users who viewed, how many later
    clicked; of those, how many later purchased. Stage k is the
    earliest stage-k event STRICTLY AFTER the user's stage-(k-1) entry
    time — the ordered-steps semantics that distinguishes a funnel
    from three independent counts. All comparisons are epoch-micros
    longs (the nanos fixture truncated identically in both engines).

    Plan: each stage is a user-keyed partial aggregate joined back to
    the previous stage's (user, t) pairs — three shuffles on the SAME
    user_id key, so AQE/exchange-reuse co-locates them; stage tables
    shrink monotonically (funnel property), so stages 2..k broadcast
    on a real cluster. The final single row is three exact counts and
    their ratios; no window, no per-user sort — at 100 TB this runs as
    a chain of hash joins over partial aggregates, never a
    sessionized event sort."""
    ev = load_table(spark, sf_dir, "events", parallel=True).select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("us")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_buy"))
    )
    counts = (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase")))
    )
    return counts.select(
        "n_view",
        "n_click",
        "n_purchase",
        F.round(F.col("n_click").cast("double") / F.col("n_view"), 6).alias(
            "view_to_click"
        ),
        F.round(
            F.col("n_purchase").cast("double") / F.col("n_click"), 6
        ).alias("click_to_purchase"),
        F.round(F.col("n_purchase").cast("double") / F.col("n_view"), 6).alias(
            "overall"
        ),
    )


@query(
    "ts_fill_forward_limit",
    oracle="""
    WITH sparse AS (
      SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CASE WHEN event_type <> 'view'
                  THEN CAST(round(value * 1000000) AS BIGINT)
             END AS v_micros
      FROM events
    ),
    carried AS (
      SELECT event_id, user_id, us,
             last_value(v_micros IGNORE NULLS) OVER w AS carry,
             last_value(CASE WHEN v_micros IS NOT NULL THEN us END
                        IGNORE NULLS) OVER w AS carry_us
      FROM sparse
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           CASE WHEN us - carry_us <= 1800000000 THEN carry END
             AS filled_micros,
           CASE WHEN us - carry_us <= 1800000000
                THEN round((us - carry_us) / 1000000.0, 6) END AS age_s
    FROM carried
    """,
    tags=("timeseries", "window"),
)
def ts_fill_forward_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF with a staleness bound: carry each user's last non-'view'
    reading forward AT MOST 30 minutes — past the horizon the gap stays
    NULL instead of silently serving stale data (the correctness edge
    plain IGNORE-NULLS fill-forward misses, and what sensor/feature
    pipelines actually require). Two IGNORE-NULLS frames over ONE
    per-user sort (value + its timestamp travel together), then a
    map-side age test on exact micros — no join back, no second shuffle.
    At 100 TB this is the same single-exchange shape as every window op
    here; the state is one (value, ts) pair per user regardless of
    horizon."""
    ev = load_table(spark, sf_dir, "events")
    sparse = ev.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("us"),
        F.when(
            F.col("event_type") != "view",
            F.round(F.col("value") * 1000000).cast("long"),
        ).alias("v_micros"),
    )
    filled = fill_forward_limited(
        sparse,
        "v_micros",
        "us",
        keys=["user_id"],
        order_cols=["us", "event_id"],
        max_age_us=1_800_000_000,
    )
    return filled.select(
        "event_id",
        "user_id",
        F.col("filled").alias("filled_micros"),
        F.round(F.col("fill_age_us") / F.lit(1000000.0), 6).alias("age_s"),
    )


@query(
    "ts_mom_growth",
    oracle="""
    WITH m AS (
      SELECT n_name, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
               AS month,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
      GROUP BY n_name, date_trunc('month', o_orderdate)
    )
    SELECT n_name, month, cents,
           round((cents - lag(cents) OVER w)
                 / CAST(lag(cents) OVER w AS DOUBLE), 6) AS mom_growth
    FROM m WINDOW w AS (PARTITION BY n_name ORDER BY month)
    """,
    tags=("timeseries", "window"),
)
def ts_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth per nation — the KPI-dashboard
    shape: calendar rollup, then lag over the OBSERVED month series
    (a missing month compares against the last month that traded;
    gapfill composition is ts_rollup_gapfill's job). Growth is a ratio
    of exact integer cents, rounded once; months are unique per
    partition so lag needs no tiebreak. Plan: one groupBy on
    (nation, month), then a window over month-count-sized groups —
    the sort is over ~84 rows per nation, nothing. At 100 TB the
    rollup is the only fact-sized shuffle and it partial-aggregates
    map-side."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    m = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("n_name").orderBy("month")
    prev = F.lag("cents").over(w)
    return m.select(
        "n_name",
        "month",
        "cents",
        F.round((F.col("cents") - prev) / prev.cast("double"), 6).alias(
            "mom_growth"
        ),
    )


@query(
    "ts_direction_changes",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CAST(round(value * 1000000) AS BIGINT) AS v_us
      FROM events
    ),
    d AS (
      SELECT user_id, event_id, us,
             v_us - lag(v_us) OVER (PARTITION BY user_id
                                    ORDER BY us, event_id) AS delta
      FROM v
    ),
    moves AS (
      SELECT user_id,
             CASE WHEN delta > 0 THEN 1 ELSE -1 END AS dir,
             lag(CASE WHEN delta > 0 THEN 1 ELSE -1 END) OVER (
               PARTITION BY user_id ORDER BY us, event_id) AS prev_dir
      FROM d WHERE delta IS NOT NULL AND delta <> 0
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_moves,
           CAST(sum(CASE WHEN dir * prev_dir = -1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_reversals,
           round(CAST(sum(CASE WHEN dir * prev_dir = -1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS reversal_rate
    FROM moves GROUP BY user_id
    """,
    tags=("timeseries", "window"),
)
def ts_direction_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direction-reversal profile per user: among NONZERO value moves
    (zero deltas are neither up nor down and are excluded before the
    second lag, so a flat stretch doesn't reset the run), how often
    does the sign flip? The zig-zag statistic — trend-vs-noise triage
    for metric streams, and the batch face of a flip-flop CEP alert.
    Two stacked lags over the SAME per-user ordering: Catalyst folds
    both Window nodes onto one sort when the partitioning+ordering
    match, so the plan stays single-exchange. Deltas are exact integer
    micros; the rate is a ratio of counts, rounded once."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("us"),
        F.round(F.col("value") * 1000000).cast("long").alias("v_us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    d = v.select(
        "user_id",
        "event_id",
        "us",
        (F.col("v_us") - F.lag("v_us").over(w)).alias("delta"),
    ).filter(F.col("delta").isNotNull() & (F.col("delta") != 0))
    moves = d.select(
        "user_id",
        "us",
        "event_id",
        F.when(F.col("delta") > 0, 1).otherwise(-1).alias("dir"),
    ).withColumn("prev_dir", F.lag("dir").over(w))
    flip = F.when(F.col("dir") * F.col("prev_dir") == -1, 1).otherwise(0)
    return moves.groupBy("user_id").agg(
        F.count("*").alias("n_moves"),
        F.sum(flip).cast("long").alias("n_reversals"),
        F.round(F.sum(flip).cast("double") / F.count("*"), 6).alias(
            "reversal_rate"
        ),
    )


@query(
    "ts_cusum_alarm",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CAST(round(value * 1000000) AS BIGINT) - 55000000 AS d
      FROM events
    ),
    c AS (
      SELECT user_id, event_id, us,
             CAST(sum(CAST(d AS HUGEINT)) OVER w AS BIGINT) AS cum
      FROM v
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s AS (
      SELECT user_id, us,
             cum - least(CAST(0 AS BIGINT), min(cum) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS stat
      FROM c
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(CASE WHEN stat > 100000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_alarms,
           min(CASE WHEN stat > 100000000 THEN us END) AS first_alarm_us
    FROM s GROUP BY user_id
    """,
    tags=("timeseries", "anomaly"),
)
def ts_cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change detection per user (Page's test): alarm
    when the cumulative positive drift of (value − target − slack)
    exceeds threshold h. The textbook recurrence S_i = max(0, S_{i−1} +
    d_i) looks inherently sequential — the insight that makes it a
    WINDOW op is the prefix identity S_i = C_i − min(0, min_{j≤i} C_j)
    (C = plain cumulative sum), so two frames over ONE per-user sort
    compute an exact integer-micros CUSUM with no UDF, no iteration,
    no state store. Complements dq_anomaly_mad_window (point outliers)
    with DRIFT detection (slow shifts that never trip a point fence).
    Target+slack = 55.0, h = 100.0, in micros; the streaming face
    would carry (C, min-prefix) as two longs of state."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("us"),
        F.round(F.col("value") * 1000000).cast("long").alias("v_us"),
    )
    scored = cusum(
        v,
        "v_us",
        keys=["user_id"],
        order_cols=["us", "event_id"],
        target=55_000_000,
        threshold=100_000_000,
    )
    return scored.groupBy("user_id").agg(
        F.count("*").alias("n_points"),
        F.sum("cusum_alarm").cast("long").alias("n_alarms"),
        F.min(F.when(F.col("cusum_alarm") == 1, F.col("us"))).alias(
            "first_alarm_us"
        ),
    )


@query(
    "ts_repurchase_intervals",
    oracle="""
    WITH gaps AS (
      SELECT o_custkey,
             CAST((epoch_us(CAST(o_orderdate AS TIMESTAMP))
                   - lag(epoch_us(CAST(o_orderdate AS TIMESTAMP))) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey))
                  // 86400000000 AS BIGINT) AS gap_days
      FROM orders
    )
    SELECT least(CAST(gap_days // 30 AS BIGINT), 12) AS gap_bucket_months,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           min(gap_days) AS min_days, max(gap_days) AS max_days
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY gap_bucket_months
    """,
    tags=("timeseries", "behavior"),
)
def ts_repurchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repurchase-interval distribution: days between CONSECUTIVE orders
    per customer (lag over the per-customer order sequence — the
    self-join-free form), bucketed into months with a 12+ tail bucket —
    the retention curve's raw material and the empirical input to any
    churn-window choice. Gap arithmetic is exact integer micros with
    integer division (order dates are midnight-aligned, so the day
    division is exact; // in both engines); same-day reorders land in
    bucket 0, ties break on o_orderkey. One exchange on custkey, then a
    12-row histogram: input-size-independent output."""
    o = load_table(spark, sf_dir, "orders")
    gaps = o.select(
        "o_custkey",
        F.expr(
            "(unix_micros(CAST(o_orderdate AS TIMESTAMP))"
            " - lag(unix_micros(CAST(o_orderdate AS TIMESTAMP))) OVER ("
            "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))"
            " div 86400000000"
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return gaps.select(
        F.least(F.expr("gap_days div 30"), F.lit(12).cast("long")).alias(
            "gap_bucket_months"
        ),
        "o_custkey",
        "gap_days",
    ).groupBy("gap_bucket_months").agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("o_custkey").cast("long").alias("n_customers"),
        F.min("gap_days").alias("min_days"),
        F.max("gap_days").alias("max_days"),
    )


@query(
    "ts_new_vs_returning",
    oracle="""
    WITH m AS (
      SELECT o_custkey,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month
      FROM orders
    ),
    firsts AS (
      SELECT o_custkey, min(month) AS first_month FROM m GROUP BY o_custkey
    ),
    act AS (SELECT DISTINCT o_custkey, month FROM m)
    SELECT act.month,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(sum(CASE WHEN f.first_month = act.month THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN f.first_month < act.month THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returning,
           round(CAST(sum(CASE WHEN f.first_month = act.month THEN 1 ELSE 0
                          END) AS DOUBLE) / count(*), 6) AS new_share
    FROM act JOIN firsts f ON f.o_custkey = act.o_custkey
    GROUP BY act.month
    """,
    tags=("timeseries", "behavior"),
)
def ts_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per month, how many active customers are NEW
    (this is their first-ever month) vs RETURNING — the decomposition
    under every 'is growth acquisition or retention?' question, and the
    monthly complement of ts_retention_cohorts' triangle. One
    distinct on (customer, month), one groupBy for the first-month
    table, one equi-join on custkey (both sides already partitioned by
    it — AQE reuses the exchange), counts exact. Scales as two passes
    over the order-key space; no window, no sort."""
    o = load_table(spark, sf_dir, "orders")
    m = o.select(
        "o_custkey",
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
    )
    act = m.distinct()
    firsts = m.groupBy("o_custkey").agg(F.min("month").alias("first_month"))
    new_flag = F.when(F.col("first_month") == F.col("month"), 1).otherwise(0)
    return act.join(firsts, "o_custkey").groupBy("month").agg(
        F.count("*").alias("n_active"),
        F.sum(new_flag).cast("long").alias("n_new"),
        F.sum(
            F.when(F.col("first_month") < F.col("month"), 1).otherwise(0)
        ).cast("long").alias("n_returning"),
        F.round(F.sum(new_flag).cast("double") / F.count("*"), 6).alias(
            "new_share"
        ),
    )


@query(
    "ts_status_transitions",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderstatus AS to_status,
             lag(o_orderstatus) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey)
               AS from_status
      FROM orders
    ),
    t AS (
      SELECT from_status, to_status, count(*) AS n
      FROM seq WHERE from_status IS NOT NULL
      GROUP BY from_status, to_status
    )
    SELECT from_status, to_status, CAST(n AS BIGINT) AS n,
           round(CAST(n AS DOUBLE)
                 / CAST(sum(n) OVER (PARTITION BY from_status) AS DOUBLE), 6)
             AS p
    FROM t
    """,
    tags=("timeseries", "behavior"),
)
def ts_status_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each customer's order
    STATUS sequence: count and row-normalized probability of every
    (from → to) pair between consecutive orders — the empirical kernel
    behind state-based LTV / process-mining models. One per-customer
    lag, one pair groupBy; the row normalization runs as a window over
    the |statuses|² aggregated table (9 rows), not the fact. Counts and
    the probability's operands are exact integers."""
    o = load_table(spark, sf_dir, "orders")
    return transition_matrix(
        o,
        "o_orderstatus",
        keys=["o_custkey"],
        order_cols=["o_orderdate", "o_orderkey"],
    ).select(
        F.col("from_state").alias("from_status"),
        F.col("to_state").alias("to_status"),
        "n",
        "p",
    )


@query(
    "ts_bounce_rate",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS uts,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - lag(CAST(ts AS TIMESTAMP)) OVER (
                           PARTITION BY user_id
                           ORDER BY CAST(ts AS TIMESTAMP), event_id)
                      >= INTERVAL '30 minutes'
                  OR lag(CAST(ts AS TIMESTAMP)) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ),
    numbered AS (
      SELECT user_id, uts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY uts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM marked
    ),
    sessions AS (
      SELECT user_id, sid, count(*) AS n_events
      FROM numbered GROUP BY user_id, sid
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS bounce_rate
    FROM sessions GROUP BY user_id
    """,
    tags=("timeseries", "session"),
)
def ts_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate per user: share of 30-minute sessions containing
    exactly one event — THE engagement KPI, and deliberately built by
    COMPOSING the exported sessionize() primitive rather than
    re-deriving gaps-and-islands, because that is how a user of the
    library would write it (the session assignment stays one shuffle;
    this adds only a per-user rollup of session rows)."""
    sessions = sessionize(
        load_table(spark, sf_dir, "events"), "ts", ["user_id"], "30 minutes"
    )
    bounce = F.when(F.col("n_events") == 1, 1).otherwise(0)
    return sessions.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum(bounce).cast("long").alias("n_bounces"),
        F.round(F.sum(bounce).cast("double") / F.count("*"), 6).alias(
            "bounce_rate"
        ),
    )


@query(
    "win_hop_distinct_users",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
             - CAST(gs.i AS INT) * INTERVAL '15 minutes' AS ws,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events CROSS JOIN
         (SELECT generate_series AS i FROM generate_series(0, 3)) gs
    GROUP BY ws
    """,
    tags=("timewindow", "distinct"),
)
def win_hop_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per SLIDING window (1h size / 15m hop) — the
    active-users-curve query, and deliberately the EXACT-distinct face:
    each event replicates into 4 hops (Spark's window() expansion; the
    oracle reproduces it with a 0..3 series), then a two-phase distinct
    aggregate. The ×4 replication before a distinct is the honest cost
    of exact sliding cardinality — the 100 TB relief valve is
    approx_count_distinct or the HLL-merge table (agg_hll_merge) where
    per-window sketches union WITHOUT re-replicating events; this id
    pins the exact semantics those approximations are judged against."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .select(F.col("w.start").alias("ws"), "n", "n_users")
    )


@query(
    "ts_conversion_latency",
    oracle="""
    WITH fv AS (
      SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    conv AS (
      SELECT e.user_id,
             (epoch_us(min(CAST(e.ts AS TIMESTAMP)))
              - epoch_us(min(fv.first_view))) // 1000000 AS delay_s
      FROM events e JOIN fv ON fv.user_id = e.user_id
      WHERE e.event_type = 'purchase'
        AND CAST(e.ts AS TIMESTAMP) >= fv.first_view
      GROUP BY e.user_id
    ),
    ranked AS (
      SELECT delay_s,
             row_number() OVER (ORDER BY delay_s, user_id) AS rn,
             count(*) OVER () AS n
      FROM conv
    )
    SELECT CAST(max(n) AS BIGINT) AS n_converted,
           max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
                    THEN delay_s END) AS q1_s,
           max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                    THEN delay_s END) AS median_s,
           max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT)
                    THEN delay_s END) AS q3_s
    FROM ranked
    """,
    tags=("timeseries", "behavior"),
)
def ts_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, seconds from FIRST view
    to the first purchase AT OR AFTER it, summarized as discrete
    quartiles (rank ceil(p·n) — the certified cross-engine convention).
    cep_funnel_conversion answers 'how many convert'; this answers 'how
    fast' — the latency half every funnel review asks for next. Delays
    are exact integer seconds (integer micros division). The final
    ranking window is global but runs over CONVERTED USERS (already two
    aggregations down from events); at 100 TB swap in the two-pass
    histogram narrowing for the quartiles, as the percentile family
    documents."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(
            F.expr(
                "(unix_micros(min(ts)) - unix_micros(min(first_view)))"
                " div 1000000"
            ).alias("delay_s")
        )
    )
    w = Window.orderBy("delay_s", "user_id")
    wg = Window.partitionBy()
    ranked = conv.select(
        "delay_s",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wg).alias("n"),
    )
    def q(p: float, alias: str):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("long"),
                F.col("delay_s"),
            )
        ).alias(alias)

    return ranked.agg(
        F.max("n").cast("long").alias("n_converted"),
        q(0.25, "q1_s"),
        q(0.5, "median_s"),
        q(0.75, "q3_s"),
    )


@query(
    "ts_conversion_latency_binned",
    oracle=_REGISTRY["ts_conversion_latency"].oracle,
    tags=("timeseries", "behavior", "scale-valve"),
)
def ts_conversion_latency_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts_conversion_latency's 100 TB relief valve, REALIZED (r10-verdict
    task 4): byte-identical oracle and output, with the global
    (delay_s, user_id) ranking window replaced by the shared binned_rank
    primitive — bin = delay_s div 2^16 (~18-hour latency cells, a
    monotone prefix of the order; ties in delay_s share a cell), so the
    quartile ranks come from a per-bin row_number plus a broadcast
    bucket-offset, and no window partitions the converted-user table
    into one task. The funnel/latency aggregate pipeline above it is
    unchanged: two groupBys down from events before any ranking."""
    from streamline_hybrid_engine_spark.operators.ranks import binned_rank

    ev = load_table(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(
            F.expr(
                "(unix_micros(min(ts)) - unix_micros(min(first_view)))"
                " div 1000000"
            ).alias("delay_s")
        )
    ).withColumn("bin", F.expr("delay_s div 65536"))
    ranked = binned_rank(
        conv,
        "bin",
        ["delay_s", "user_id"],
        rank_col="rn",
        total_col="n",
    )

    def q(p: float, alias: str):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("long"),
                F.col("delay_s"),
            )
        ).alias(alias)

    return ranked.agg(
        F.max("n").cast("long").alias("n_converted"),
        q(0.25, "q1_s"),
        q(0.5, "median_s"),
        q(0.75, "q3_s"),
    )


def cusum(
    df: DataFrame,
    value_col: str,
    keys: list[str],
    order_cols: list[str],
    target: int,
    threshold: int,
) -> DataFrame:
    """Library primitive: per-row one-sided CUSUM over integer values.

    Appends ``cusum_stat`` (S_i = max(0, S_{i-1} + value − target),
    computed via the prefix identity S_i = C_i − min(0, min_{j≤i} C_j)
    as two frames over ONE per-key sort — no UDF, no iteration) and
    ``cusum_alarm`` (stat > threshold). ``value_col`` and ``target``
    must be integers (fixed-point your floats first) so the statistic
    is exact; one shuffle on ``keys``. Works on any DataFrame; the
    streaming face carries (C, min C) as two longs of keyed state
    (stream_cusum_alarm)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dec = "decimal(38,0)"
    with_c = df.withColumn(
        "_cusum_c",
        F.sum((F.col(value_col) - F.lit(target)).cast(dec)).over(w).cast("long"),
    )
    stat = F.col("_cusum_c") - F.least(
        F.lit(0).cast("long"), F.min("_cusum_c").over(w)
    )
    return (
        with_c.withColumn("cusum_stat", stat)
        .withColumn("cusum_alarm", (F.col("cusum_stat") > threshold).cast("int"))
        .drop("_cusum_c")
    )


def fill_forward_limited(
    df: DataFrame,
    value_col: str,
    ts_us_col: str,
    keys: list[str],
    order_cols: list[str],
    max_age_us: int,
) -> DataFrame:
    """Library primitive: LOCF with a staleness bound. Appends
    ``filled`` (the last non-null ``value_col`` within ``max_age_us``
    of this row, else NULL) and ``fill_age_us``. Both IGNORE-NULLS
    frames share one per-key sort — one shuffle, no join back."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = F.last(value_col, ignorenulls=True).over(w)
    carry_us = F.last(
        F.when(F.col(value_col).isNotNull(), F.col(ts_us_col)),
        ignorenulls=True,
    ).over(w)
    age = F.col(ts_us_col) - carry_us
    fresh = age <= max_age_us
    return df.withColumn("filled", F.when(fresh, carry)).withColumn(
        "fill_age_us", F.when(fresh, age)
    )


def transition_matrix(
    df: DataFrame, state_col: str, keys: list[str], order_cols: list[str]
) -> DataFrame:
    """Library primitive: first-order Markov transition counts and
    row-normalized probabilities over each key's state sequence.
    Returns (from_state, to_state, n, p); the normalization window runs
    over the |states|² aggregate, not the input."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order_cols)
    seq = df.select(
        F.lag(state_col).over(w).alias("from_state"),
        F.col(state_col).alias("to_state"),
    ).filter(F.col("from_state").isNotNull())
    t = seq.groupBy("from_state", "to_state").agg(F.count("*").alias("n"))
    wrow = Window.partitionBy("from_state")
    return t.select(
        "from_state",
        "to_state",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wrow).cast("double"), 6
        ).alias("p"),
    )


@query(
    "ts_local_peaks",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CAST(round(value * 1000000) AS BIGINT) AS v_us
      FROM events
    ),
    n AS (
      SELECT user_id, us, v_us,
             lag(v_us) OVER w AS prev_v, lead(v_us) OVER w AS next_v
      FROM v WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    peaks AS (
      SELECT user_id, us, v_us FROM n
      WHERE prev_v IS NOT NULL AND next_v IS NOT NULL
        AND v_us > prev_v AND v_us > next_v AND v_us > 90000000
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_peaks,
           max(v_us) AS max_peak_micros,
           min(us) AS first_peak_us
    FROM peaks GROUP BY user_id
    """,
    tags=("timeseries", "anomaly"),
)
def ts_local_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum detection per user: a reading that strictly beats
    BOTH neighbors and clears an absolute floor (90.0, in micros) — the
    spike census that complements CUSUM (drift) and MAD (robust
    z-score): peaks are about SHAPE, not distribution. lag + lead share
    one per-user sort (one exchange); endpoints are excluded, not
    treated as peaks, so the answer is stable under re-chunking of the
    series — the property that matters when the same detector runs per
    micro-batch on the stream. Exact integer comparisons throughout."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("us"),
        F.round(F.col("value") * 1000000).cast("long").alias("v_us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    n = v.select(
        "user_id",
        "us",
        "v_us",
        F.lag("v_us").over(w).alias("prev_v"),
        F.lead("v_us").over(w).alias("next_v"),
    )
    peaks = n.filter(
        F.col("prev_v").isNotNull()
        & F.col("next_v").isNotNull()
        & (F.col("v_us") > F.col("prev_v"))
        & (F.col("v_us") > F.col("next_v"))
        & (F.col("v_us") > 90000000)
    )
    return peaks.groupBy("user_id").agg(
        F.count("*").alias("n_peaks"),
        F.max("v_us").alias("max_peak_micros"),
        F.min("us").alias("first_peak_us"),
    )


@query(
    "ts_time_in_state",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS state,
             lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id)
               - epoch_us(CAST(ts AS TIMESTAMP)) AS dwell_us
      FROM events
    )
    SELECT user_id, state,
           CAST(count(*) AS BIGINT) AS n_entries,
           CAST(sum(dwell_us) AS BIGINT) AS total_dwell_us
    FROM seq WHERE dwell_us IS NOT NULL
    GROUP BY user_id, state
    """,
    tags=("timeseries", "behavior"),
)
def ts_time_in_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-in-state accounting: each event opens a state (its type)
    that lasts until the user's NEXT event — sum the dwell per
    (user, state). The process-mining/dwell-time complement to the
    transition matrix (ts_status_transitions counts edges; this
    weights them with elapsed time). Last events carry no dwell
    (open-ended intervals excluded, not guessed — the honest batch
    semantics; a stream would close them at the watermark). One lead
    over one per-user sort, exact integer micros, then a partial-agg
    groupBy."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        (
            F.lead(F.unix_micros(F.col("ts"))).over(w)
            - F.unix_micros(F.col("ts"))
        ).alias("dwell_us"),
    ).filter(F.col("dwell_us").isNotNull())
    return seq.groupBy("user_id", "state").agg(
        F.count("*").alias("n_entries"),
        F.sum("dwell_us").cast("long").alias("total_dwell_us"),
    )


@query(
    "ts_series_correlation",
    oracle="""
    WITH hc AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY h, event_type
    ),
    grid AS (
      SELECT hs.h, t.event_type, coalesce(hc.n, 0) AS n
      FROM (SELECT DISTINCT h FROM hc) hs
      CROSS JOIN (SELECT DISTINCT event_type FROM hc) t
      LEFT JOIN hc ON hc.h = hs.h AND hc.event_type = t.event_type
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS m,
             CAST(sum(CAST(a.n AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(b.n AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(sum(CAST(a.n * b.n AS HUGEINT)) AS DOUBLE) AS sxy,
             CAST(sum(CAST(a.n * a.n AS HUGEINT)) AS DOUBLE) AS sxx,
             CAST(sum(CAST(b.n * b.n AS HUGEINT)) AS DOUBLE) AS syy
      FROM grid a JOIN grid b ON a.h = b.h AND a.event_type < b.event_type
      GROUP BY type_a, type_b
    )
    SELECT type_a, type_b, CAST(m AS BIGINT) AS n_hours,
           round((m * sxy - sx * sy)
                 / (sqrt(m * sxx - sx * sx) * sqrt(m * syy - sy * sy)), 6)
             AS corr
    FROM pairs
    """,
    tags=("timeseries", "statistics"),
)
def ts_series_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-series correlation matrix: Pearson between every pair of
    event types' HOURLY count series — does error volume track click
    volume? The co-movement screen run before any causal story. The
    hourly grid is ZERO-FILLED (distinct hours × types, absent cells =
    0) because corr-over-co-present-hours silently conditions on
    activity; the grid crossJoin is hours × 5 — metadata-sized. Pair
    join keyed on the hour (10 pairs per hour row), then the exact
    integer-moment Pearson (agg_corr_covar's discipline: five 128-bit
    sums, one closed form). Output is the 10-row upper triangle."""
    ev = load_table(spark, sf_dir, "events")
    hc = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"),
        "event_type",
    ).agg(F.count("*").cast("long").alias("n"))
    hours = hc.select("h").distinct()
    types = hc.select("event_type").distinct()
    grid = (
        hours.crossJoin(F.broadcast(types))
        .join(hc, ["h", "event_type"], "left")
        .select("h", "event_type", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
    )
    a = grid.select(
        F.col("h"), F.col("event_type").alias("type_a"), F.col("n").alias("x")
    )
    b = grid.select(
        F.col("h"), F.col("event_type").alias("type_b"), F.col("n").alias("y")
    )
    j = a.join(b, "h").filter(F.col("type_a") < F.col("type_b"))
    dec = "decimal(38,0)"
    s = j.groupBy("type_a", "type_b").agg(
        F.count("*").alias("m"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).cast("double").alias("syy"),
    )
    m = F.col("m").cast("double")
    return s.select(
        "type_a",
        "type_b",
        F.col("m").cast("long").alias("n_hours"),
        F.round(
            (m * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(m * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(m * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("corr"),
    )


@query(
    "ts_burstiness",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS g
      FROM events
    ),
    s AS (
      SELECT user_id, count(*) AS n,
             CAST(sum(CAST(g AS HUGEINT)) AS DOUBLE) AS s1,
             CAST(sum(CAST(g AS HUGEINT) * g) AS DOUBLE) AS s2
      FROM gaps WHERE g IS NOT NULL
      GROUP BY user_id HAVING count(*) >= 2
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
           round((sqrt((s2 - s1 * s1 / n) / (n - 1)) - s1 / n)
                 / (sqrt((s2 - s1 * s1 / n) / (n - 1)) + s1 / n), 6)
             AS burstiness
    FROM s
    """,
    tags=("timeseries", "statistics"),
)
def ts_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness index B = (σ − μ)/(σ + μ) over each user's inter-event
    gaps (Goh & Barabási): −1 = metronome, 0 = Poisson, →1 = bursty —
    the one-number answer to 'is this user a bot or a human?' and the
    traffic-model input autoscaling sizing uses. Moments are exact
    integer sums over integer-micros gaps (the corr/zscore discipline);
    σ is one correctly-rounded sqrt of identical operands, μ one
    division — the B ratio then runs on identical IEEE doubles.
    Single-gap users are excluded (σ undefined), not emitted as NaN.
    One lag + one groupBy on the same user partitioning."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            F.unix_micros(F.col("ts"))
            - F.lag(F.unix_micros(F.col("ts"))).over(w)
        ).alias("g"),
    ).filter(F.col("g").isNotNull())
    dec = "decimal(38,0)"
    s = (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("g").cast(dec)).cast("double").alias("s1"),
            F.sum((F.col("g").cast(dec) * F.col("g")).cast(dec))
            .cast("double")
            .alias("s2"),
        )
        .filter(F.col("n") >= 2)
    )
    n = F.col("n")
    mu = F.col("s1") / n
    sigma = F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / n) / (n - 1))
    return s.select(
        "user_id",
        n.cast("long").alias("n_gaps"),
        F.round((sigma - mu) / (sigma + mu), 6).alias("burstiness"),
    )


@query(
    "ts_median3_smooth",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CAST(round(value * 1000000) AS BIGINT) AS x
      FROM events
    ),
    n AS (
      SELECT user_id, event_id, us, x,
             lag(x) OVER w AS p, lead(x) OVER w AS q
      FROM v WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    )
    SELECT user_id, event_id,
           CASE WHEN p IS NULL OR q IS NULL THEN x
                ELSE x + p + q - greatest(x, p, q) - least(x, p, q)
           END AS smoothed_micros
    FROM n
    """,
    tags=("timeseries", "smoothing"),
)
def ts_median3_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-three smoothing — the classic despiking filter (kills
    single-sample glitches that a moving AVERAGE smears into two bad
    samples; Tukey's '53 smoother): per point, the median of
    (prev, x, next) computed arithmetically as sum − max − min over
    exact integer micros — no sort, no percentile machinery, identical
    in both engines by construction. Series endpoints pass through
    unsmoothed (a 2-element median would silently average — the honest
    edge). lag + lead share one per-user sort; composes in front of
    CUSUM/peaks as the denoise stage."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("us"),
        F.round(F.col("value") * 1000000).cast("long").alias("x"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    n = v.select(
        "user_id",
        "event_id",
        "x",
        F.lag("x").over(w).alias("p"),
        F.lead("x").over(w).alias("q"),
    )
    med3 = (
        F.col("x")
        + F.col("p")
        + F.col("q")
        - F.greatest("x", "p", "q")
        - F.least("x", "p", "q")
    )
    return n.select(
        "user_id",
        "event_id",
        F.when(
            F.col("p").isNull() | F.col("q").isNull(), F.col("x")
        )
        .otherwise(med3)
        .alias("smoothed_micros"),
    )


@query(
    "ts_seasonal_anomaly",
    oracle="""
    WITH v AS (
      SELECT event_id, user_id,
             extract(hour FROM CAST(ts AS TIMESTAMP)) AS hod,
             CAST(round(value * 1000000) AS BIGINT) AS v_us
      FROM events
    ),
    prof AS (
      SELECT hod,
             CAST(floor(CAST(sum(CAST(v_us AS HUGEINT)) AS DOUBLE)
                        / count(*)) AS BIGINT) AS hod_mean
      FROM v GROUP BY hod
    ),
    resid AS (
      SELECT v.event_id, v.user_id, v.hod, v.v_us - p.hod_mean AS r
      FROM v JOIN prof p ON p.hod = v.hod
    ),
    ranked AS (
      SELECT r, abs(r) AS a,
             row_number() OVER (ORDER BY abs(r), r) AS rn,
             count(*) OVER () AS n
      FROM resid
    ),
    mad AS (
      SELECT max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                      THEN a END) AS mad_r
      FROM ranked
    )
    SELECT resid.event_id, resid.user_id, resid.hod, resid.r AS residual_us,
           CASE WHEN 10000 * abs(resid.r) > 3 * 14826 * mad.mad_r
                THEN 1 ELSE 0 END AS is_anomaly
    FROM resid CROSS JOIN mad
    WHERE 10000 * abs(resid.r) > 3 * 14826 * mad.mad_r
    """,
    tags=("timeseries", "anomaly"),
)
def ts_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted anomaly detection: subtract the hour-of-day
    profile mean FIRST, then flag residuals past 3 × 1.4826 × MAD —
    the detector that doesn't page you every morning peak (a raw-value
    fence fires on the daily cycle; dq_anomaly_mad_window buckets by
    day, this deseasonalizes globally). The composition of two audited
    disciplines: floor-of-exact-integer profile means
    (ts_seasonal_profile) and rank-median MAD (dq_anomaly_mad_window),
    with the 3·1.4826 factor applied in SCALED INTEGERS
    (10000·|r| > 3·14826·MAD, 1.4826 = 14826/10⁴ — no float
    threshold). The residual MAD rank
    runs globally at fixture scale; the 100 TB form ranks per
    (hour-of-day) bucket — same valve as the percentile family."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_id",
        "user_id",
        F.hour(F.col("ts")).cast("long").alias("hod"),
        F.round(F.col("value") * 1000000).cast("long").alias("v_us"),
    )
    dec = "decimal(38,0)"
    prof = v.groupBy("hod").agg(
        F.floor(
            F.sum(F.col("v_us").cast(dec)).cast("double") / F.count("*")
        )
        .cast("long")
        .alias("hod_mean")
    )
    resid = v.join(F.broadcast(prof), "hod").select(
        "event_id",
        "user_id",
        "hod",
        (F.col("v_us") - F.col("hod_mean")).alias("r"),
    )
    w = Window.orderBy(F.abs(F.col("r")), F.col("r"))
    wg = Window.partitionBy()
    ranked = resid.select(
        F.abs(F.col("r")).alias("a"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wg).alias("n"),
    )
    mad = ranked.agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.5 * F.col("n")).cast("long"),
                F.col("a"),
            )
        ).alias("mad_r")
    )
    j = resid.crossJoin(F.broadcast(mad))
    return j.filter(
        10000 * F.abs(F.col("r")) > 3 * 14826 * F.col("mad_r")
    ).select(
        "event_id",
        "user_id",
        "hod",
        F.col("r").alias("residual_us"),
        F.lit(1).alias("is_anomaly"),
    )


@query(
    "ts_seasonal_anomaly_bucketed",
    oracle="""
    WITH v AS (
      SELECT event_id, user_id,
             extract(hour FROM CAST(ts AS TIMESTAMP)) AS hod,
             CAST(round(value * 1000000) AS BIGINT) AS v_us
      FROM events
    ),
    prof AS (
      SELECT hod,
             CAST(floor(CAST(sum(CAST(v_us AS HUGEINT)) AS DOUBLE)
                        / count(*)) AS BIGINT) AS hod_mean
      FROM v GROUP BY hod
    ),
    resid AS (
      SELECT v.event_id, v.user_id, v.hod, v.v_us - p.hod_mean AS r
      FROM v JOIN prof p ON p.hod = v.hod
    ),
    ranked AS (
      SELECT r, abs(r) AS a,
             row_number() OVER (ORDER BY abs(r), r) AS rn,
             count(*) OVER () AS n
      FROM resid
    ),
    mad AS (
      SELECT max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                      THEN a END) AS mad_r
      FROM ranked
    )
    SELECT resid.event_id, resid.user_id, resid.hod, resid.r AS residual_us,
           CASE WHEN 10000 * abs(resid.r) > 3 * 14826 * mad.mad_r
                THEN 1 ELSE 0 END AS is_anomaly
    FROM resid CROSS JOIN mad
    WHERE 10000 * abs(resid.r) > 3 * 14826 * mad.mad_r
    """,
    tags=("timeseries", "anomaly", "scale-valve"),
)
def ts_seasonal_anomaly_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts_seasonal_anomaly's answer through the bucketed-MAD plan — the
    executable realization of that docstring's promised 100 TB path
    (r11-verdict task 5). Same output schema, SAME oracle (the global
    form's, verbatim): the residual computation is identical, but the
    GLOBAL rank that locates the MAD (the single-partition
    row_number() over (ORDER BY |r|, r) — the one operator in the
    global form that cannot scale) is re-expressed through the shared
    :func:`..ranks.binned_rank` primitive over equi-width |r| buckets
    (width 2^22 µ): per-bucket counts ride a map-side-combined groupBy,
    the only single-partition window runs over the bucket-offset table
    (metadata-sized), and the rank window partitions by bucket. The
    located MAD is bit-identical to the global form's (the bin offsets
    reconstruct the exact global rank), so the emitted flag SET is
    identical too — test-pinned against ts_seasonal_anomaly on the
    fixture."""
    from streamline_hybrid_engine_spark.operators.ranks import binned_rank

    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_id",
        "user_id",
        F.hour(F.col("ts")).cast("long").alias("hod"),
        F.round(F.col("value") * 1000000).cast("long").alias("v_us"),
    )
    dec = "decimal(38,0)"
    prof = v.groupBy("hod").agg(
        F.floor(
            F.sum(F.col("v_us").cast(dec)).cast("double") / F.count("*")
        )
        .cast("long")
        .alias("hod_mean")
    )
    resid = v.join(F.broadcast(prof), "hod").select(
        "event_id",
        "user_id",
        "hod",
        (F.col("v_us") - F.col("hod_mean")).alias("r"),
    )
    absr = resid.select(
        F.abs(F.col("r")).alias("a"),
        "r",
    ).withColumn("bin", F.floor(F.col("a") / F.lit(1 << 22)).cast("long"))
    ranked = binned_rank(
        absr, "bin", ["a", "r"], rank_col="rn", total_col="n"
    )
    mad = ranked.filter(
        F.col("rn") == F.ceil(0.5 * F.col("n")).cast("long")
    ).agg(F.max("a").alias("mad_r"))
    j = resid.crossJoin(F.broadcast(mad))
    return j.filter(
        10000 * F.abs(F.col("r")) > 3 * 14826 * F.col("mad_r")
    ).select(
        "event_id",
        "user_id",
        "hod",
        F.col("r").alias("residual_us"),
        F.lit(1).alias("is_anomaly"),
    )


@query(
    "ts_path_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             lag(event_type, 2) OVER w AS t1,
             lag(event_type) OVER w AS t2,
             event_type AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    paths AS (
      SELECT t1 || '>' || t2 || '>' || t3 AS path,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE t1 IS NOT NULL
      GROUP BY path
    ),
    ranked AS (
      SELECT path, n, row_number() OVER (ORDER BY n DESC, path) AS rk,
             CAST(sum(n) OVER () AS BIGINT) AS tot
      FROM paths
    )
    SELECT rk, path, n, round(n / CAST(tot AS DOUBLE), 6) AS share
    FROM ranked WHERE rk <= 20
    """,
    tags=("timeseries", "behavior"),
)
def ts_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 behavioral path trigrams: the most common 3-step
    event-type sequences across all users — second-order process
    mining (ts_status_transitions is the first-order kernel; paths
    expose the PATTERNS the matrix marginalizes away, e.g.
    view>error>view vs view>view>error). Two stacked lags on one
    per-user sort, a path groupBy (≤5³ = 125 possible rows), ranking
    over that tiny table. Share is a ratio of exact counts."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type", 2).over(w).alias("t1"),
        F.lag("event_type").over(w).alias("t2"),
        F.col("event_type").alias("t3"),
    ).filter(F.col("t1").isNotNull())
    paths = seq.groupBy(
        F.concat_ws(">", "t1", "t2", "t3").alias("path")
    ).agg(F.count("*").cast("long").alias("n"))
    wr = Window.orderBy(F.col("n").desc(), F.col("path"))
    wg = Window.partitionBy()
    ranked = paths.select(
        "path",
        "n",
        F.row_number().over(wr).alias("rk"),
        F.sum("n").over(wg).cast("long").alias("tot"),
    )
    return ranked.filter(F.col("rk") <= 20).select(
        "rk",
        "path",
        "n",
        F.round(F.col("n") / F.col("tot").cast("double"), 6).alias("share"),
    )


@query(
    "ts_session_depth_hist",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS uts,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - lag(CAST(ts AS TIMESTAMP)) OVER (
                           PARTITION BY user_id
                           ORDER BY CAST(ts AS TIMESTAMP), event_id)
                      >= INTERVAL '30 minutes'
                  OR lag(CAST(ts AS TIMESTAMP)) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ),
    numbered AS (
      SELECT user_id, uts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY uts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM marked
    ),
    sessions AS (
      SELECT user_id, sid, CAST(count(*) AS BIGINT) AS depth
      FROM numbered GROUP BY user_id, sid
    )
    SELECT least(depth, 10) AS depth_bucket,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM sessions GROUP BY depth_bucket
    """,
    tags=("timeseries", "session"),
)
def ts_session_depth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-depth histogram (events per 30-min session, 10+ tail
    bucket) — the engagement-shape curve product reviews read next to
    the bounce rate (ts_bounce_rate is this histogram's first bar as a
    rate). Composed from the exported sessionize() primitive + one
    rollup of session rows; output ≤ 10 rows from any input."""
    sessions = sessionize(
        load_table(spark, sf_dir, "events"), "ts", ["user_id"], "30 minutes"
    )
    return (
        sessions.select(
            "user_id",
            F.least(F.col("n_events").cast("long"), F.lit(10).cast("long")).alias(
                "depth_bucket"
            ),
        )
        .groupBy("depth_bucket")
        .agg(
            F.count("*").alias("n_sessions"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )


@query(
    "ts_forecast_snaive_mae",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY h
    ),
    j AS (
      SELECT cur.h, cur.n AS actual, prev.n AS forecast
      FROM hourly cur
      JOIN hourly prev ON prev.h = cur.h - INTERVAL '24' HOUR
    )
    SELECT CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(abs(actual - forecast)) AS BIGINT) AS total_abs_err,
           round(CAST(sum(abs(actual - forecast)) AS DOUBLE) / count(*), 6)
             AS mae,
           round(CAST(sum(abs(actual - forecast)) AS DOUBLE)
                 / sum(actual), 6) AS wape
    FROM j
    """,
    tags=("timeseries", "forecast"),
)
def ts_forecast_snaive_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast evaluation: predict each hour's event
    volume with the SAME HOUR YESTERDAY and score MAE + WAPE — the
    baseline every forecasting effort must beat before it earns a
    model (and the capacity-planning sanity check by itself). The
    self-join on h−24h is exact timestamp equality over the hourly
    rollup (hours-count-sized, not events); errors are exact integer
    counts, both metrics one division each. Hours with no
    previous-day counterpart are excluded, not imputed — the honest
    eval window."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count("*").cast("long").alias("n"))
    cur = hourly.select("h", F.col("n").alias("actual"))
    prev = hourly.select(
        (F.col("h") + F.expr("INTERVAL 24 HOURS")).alias("h"),
        F.col("n").alias("forecast"),
    )
    j = cur.join(prev, "h")
    err = F.abs(F.col("actual") - F.col("forecast"))
    return j.agg(
        F.count("*").alias("n_hours"),
        F.sum(err).cast("long").alias("total_abs_err"),
        F.round(F.sum(err).cast("double") / F.count("*"), 6).alias("mae"),
        F.round(F.sum(err).cast("double") / F.sum("actual"), 6).alias("wape"),
    )


@query(
    "ts_rolling_mau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
      FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud),
    expanded AS (
      SELECT ud.user_id, ud.d + CAST(gs.i AS INT) AS report_day
      FROM ud CROSS JOIN
           (SELECT generate_series AS i FROM generate_series(0, 27)) gs
    )
    SELECT CAST(days.d AS TIMESTAMP) AS report_day,
           CAST((SELECT count(DISTINCT u2.user_id) FROM ud u2
                 WHERE u2.d = days.d) AS BIGINT) AS dau,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS mau28
    FROM days JOIN expanded e ON e.report_day = days.d
    GROUP BY days.d
    """,
    tags=("timeseries", "engagement"),
)
def ts_rolling_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU and trailing-28-day MAU per OBSERVED day — the
    product-analytics headline pair (and their ratio, the stickiness
    metric, is one division away). Rolling DISTINCT cannot slide like
    a sum (distinct doesn't subtract), so the exact form REPLICATES
    each (user, active-day) pair onto the 28 report days it supports —
    the same honest expansion as win_hop_distinct_users (×28 on the
    user-day DEDUPED table, not raw events), then a two-phase distinct
    per report day. Report days are restricted to observed days so
    ramp-in is visible but dead trailing days don't fabricate rows. At
    100 TB the relief valve is per-day HLL sketches unioned over the
    trailing window (agg_hll_merge's contract) — sketch merges replace
    row replication."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d0")
    ).distinct()
    days = ud.select(F.col("d0").alias("report_day")).distinct()
    expanded = ud.select(
        "user_id",
        F.explode(
            F.expr(
                "transform(sequence(0, 27),"
                " i -> timestampadd(DAY, i, d0))"
            )
        ).alias("report_day"),
    )
    dau = ud.groupBy(F.col("d0").alias("report_day")).agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    mau = (
        expanded.join(days, "report_day")
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").cast("long").alias("mau28"))
    )
    return dau.join(mau, "report_day").select(
        "report_day", "dau", "mau28"
    )


@query(
    "ts_rolling_mau_hll",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
      FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud),
    expanded AS (
      SELECT ud.user_id, ud.d + CAST(gs.i AS INT) AS report_day
      FROM ud CROSS JOIN
           (SELECT generate_series AS i FROM generate_series(0, 27)) gs
    )
    SELECT CAST(days.d AS TIMESTAMP) AS report_day,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS mau28_exact,
           TRUE AS hll_within_5pct
    FROM days JOIN expanded e ON e.report_day = days.d
    GROUP BY days.d
    """,
    tags=("timeseries", "engagement", "approx", "sketch", "scale-valve"),
)
def ts_rolling_mau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-28-day MAU via per-day HLL sketches — the 100 TB relief
    valve ts_rolling_mau's docstring promises, REALIZED as its own id
    (r11-verdict task 3; the win_hop_distinct_hll move applied to the
    28-day trailing window): events are touched ONCE (a 1-day TUMBLE
    builds one sketch per active day), and the ×28 replication that the
    exact form pays on every (user, day) pair moves to the SKETCH table
    (28 rows × ~1 KB per day — metadata-sized regardless of user-day
    volume); each report day then unions its 28 trailing day-sketches
    and estimates. Report days are restricted to observed days — the
    identical day set the exact form emits, pinned by test.

    ERROR-BOUND oracle (the win_hop_distinct_hll pattern): the estimate
    has no cross-engine oracle, so each row carries the EXACT trailing
    distinct as its anchor plus a Spark-computed verdict the SQL pins
    TRUE — the 28-sketch union lands within 5% of the true MAU on every
    report day (at fixture cardinality Datasketches HLL runs sparse and
    the estimate is exactly right; the bound is the contract that
    survives growth)."""
    ev = load_table(spark, sf_dir, "events")
    day_sk = ev.groupBy(F.window("ts", "1 day").alias("dw")).agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    days = day_sk.select(F.col("dw.start").alias("report_day"))
    shifted = day_sk.select(
        F.explode(F.expr("sequence(0, 27)")).alias("i"), "dw", "sk"
    ).select(
        F.expr("timestampadd(DAY, i, dw.start)").alias("report_day"), "sk"
    )
    est = (
        shifted.join(days, "report_day")
        .groupBy("report_day")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
    )
    ud = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d0")
    ).distinct()
    exact = (
        ud.select(
            "user_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, 27),"
                    " i -> timestampadd(DAY, i, d0))"
                )
            ).alias("report_day"),
        )
        .join(days, "report_day")
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").cast("long").alias("mau28_exact"))
    )
    return exact.join(est, "report_day").select(
        "report_day",
        "mau28_exact",
        (
            F.abs(F.col("est") - F.col("mau28_exact"))
            <= F.col("mau28_exact") * F.lit(0.05)
        ).alias("hll_within_5pct"),
    )


@query(
    "ts_twap",
    oracle="""
    WITH v AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CAST(round(value * 1000000) AS BIGINT) AS v_us,
             lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_us
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(next_us - us) AS BIGINT) AS total_us,
           CAST(floor(CAST(sum(CAST(v_us AS HUGEINT) * (next_us - us))
                           AS DOUBLE)
                      / sum(next_us - us)) AS BIGINT) AS twap_micros
    FROM v WHERE next_us IS NOT NULL
    GROUP BY user_id
    """,
    tags=("timeseries", "finance"),
)
def ts_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each reading holds until the next
    one, so its weight is its HOLDING TIME — the finance/sensor average
    that a plain mean gets wrong whenever sampling is irregular (a
    value held for an hour must outweigh one held a second; billing
    and mark-to-market both depend on it). Σ(v·dt)/Σdt with v·dt as
    exact 128-bit integers, floored to micros — the udaf_weighted_avg
    discipline with the weights COMPUTED from the event sequence (one
    lead, same machinery as ts_time_in_state). Open-ended last
    readings are excluded, not guessed."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = ev.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("us"),
        F.round(F.col("value") * 1000000).cast("long").alias("v_us"),
        F.lead(F.unix_micros(F.col("ts"))).over(w).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    dt = F.col("next_us") - F.col("us")
    dec = "decimal(38,0)"
    return v.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum(dt).cast("long").alias("total_us"),
        F.floor(
            F.sum((F.col("v_us").cast(dec) * dt).cast(dec)).cast("double")
            / F.sum(dt)
        )
        .cast("long")
        .alias("twap_micros"),
    )


def first_last_touch(
    cand: DataFrame,
    group_cols: list,
    offset_col: str,
    id_col: str,
    id_bound: int = 10_000_000,
) -> DataFrame:
    """Library primitive (r8 pass 4): first-touch and last-touch ids per
    group from bounded (offset, id) candidate rows — ONE min/max pair per
    group over a composite key, no row_number, no per-group sort (the
    core behind ts_attribution_first_last, on ANY candidate DataFrame).

    Encoding contract (the part the fuzzer hits): rows must satisfy
    0 ≤ offset and 0 ≤ id < id_bound, and max_offset × id_bound must fit
    int64 — bounded lookback windows satisfy this (24 h in micros ×10⁷ ≈
    8.6e17 < 2⁶³) where raw epoch keys would overflow. First touch =
    LARGEST offset (earliest touch), tie → smallest id, via inverting the
    id under one max(); last touch = smallest offset, tie → smallest id,
    under one min(). Returns group_cols + first_touch_id + last_touch_id."""
    off = F.col(offset_col)
    tid = F.col(id_col)
    g = cand.groupBy(*group_cols).agg(
        F.max(off * id_bound + (id_bound - 1 - tid)).alias("_first_key"),
        F.min(off * id_bound + tid).alias("_last_key"),
    )
    return g.select(
        *group_cols,
        (id_bound - 1 - F.col("_first_key") % id_bound).alias(
            "first_touch_id"
        ),
        (F.col("_last_key") % id_bound).alias("last_touch_id"),
    )


@query(
    "ts_attribution_first_last",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CAST(round(value * 1000000) AS BIGINT) AS v_us
      FROM events
    ),
    credited AS (
      SELECT p.user_id, p.event_id AS purchase_id, p.v_us,
             max((p.us - c.us) * 10000000 + (9999999 - c.event_id))
               AS first_key,
             min((p.us - c.us) * 10000000 + c.event_id) AS last_key
      FROM ev p JOIN ev c
        ON c.user_id = p.user_id AND c.event_type = 'click'
       AND c.us < p.us AND c.us >= p.us - 86400000000
      WHERE p.event_type = 'purchase'
      GROUP BY p.user_id, p.event_id, p.v_us
    )
    SELECT user_id, purchase_id,
           9999999 - (first_key % 10000000) AS first_click_id,
           last_key % 10000000 AS last_click_id,
           v_us AS value_micros
    FROM credited
    """,
    tags=("timeseries", "attribution"),
)
def ts_attribution_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch and last-touch attribution per purchase (clicks in
    the 24 h lookback; full credit to one click per model) — the two
    business rules marketing compares AGAINST ts_linear_attribution's
    equal split; same purchase set, three crediting answers. Engine
    form: the bounded interval join ts_linear_attribution already uses
    (per-user pair join restricted to the 24 h lookback), then ONE
    min/max pair per purchase over a bounded composite key — no
    row_number, no per-purchase sort. Purchases with
    no qualifying click are excluded (no credit to assign), matching
    the linear op's convention. Key encoding: lookback offset ×10⁷ +
    event_id fits int64 because the offset is BOUNDED by the 24 h
    window (8.64e10 × 10⁷ ≈ 8.6e17 < 2⁶³) where raw epoch micros would
    overflow — the composite-key trick only works on bounded ranges,
    and the first-touch side inverts the id (9999999 − id) so earliest
    time + smallest id win together under one max(). Key algebra lives
    in the exported :func:`first_last_touch` primitive (library pass 4)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        F.round(F.col("value") * 1000000).cast("long").alias("v_us"),
    )
    p = base.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("us").alias("p_us"),
        "v_us",
    )
    clicks = base.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("us").alias("c_us"),
        F.col("event_id").alias("c_id"),
    )
    j = p.join(clicks, "user_id").filter(
        (F.col("c_us") < F.col("p_us"))
        & (F.col("c_us") >= F.col("p_us") - 86400000000)
    )
    # offset bounded by the 24 h window — the encoding precondition
    cand = j.select(
        "user_id",
        "purchase_id",
        "v_us",
        (F.col("p_us") - F.col("c_us")).alias("off"),
        "c_id",
    )
    credited = first_last_touch(
        cand, ["user_id", "purchase_id", "v_us"], "off", "c_id"
    )
    return credited.select(
        "user_id",
        "purchase_id",
        F.col("first_touch_id").alias("first_click_id"),
        F.col("last_touch_id").alias("last_click_id"),
        F.col("v_us").alias("value_micros"),
    )


@query(
    "win_hop_distinct_hll",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
             - CAST(gs.i AS INT) * INTERVAL '15 minutes' AS ws,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           TRUE AS hll_within_5pct
    FROM events CROSS JOIN
         (SELECT generate_series AS i FROM generate_series(0, 3)) gs
    GROUP BY ws
    """,
    tags=("timewindow", "distinct", "approx", "sketch"),
)
def win_hop_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct users via per-slide HLL sketches — the
    100 TB relief valve win_hop_distinct_users' docstring promises,
    REALIZED as its own id (the skyline_grid move): events are touched
    ONCE (a 15-min TUMBLE builds one sketch per slide), and the ×4
    hop replication that the exact form pays on EVERY EVENT moves to
    the sketch table (4 rows × ~1 KB per slide — metadata-sized
    regardless of event volume); each 1-h hop then unions its 4 slide
    sketches and estimates. This is the sketch-per-partition /
    union-at-query-time shape agg_hll_merge stores, applied to sliding
    windows.

    ERROR-BOUND oracle (agg_approx_users pattern): the estimate has no
    cross-engine oracle, so each hop row carries the EXACT distinct as
    its anchor plus a Spark-computed verdict the SQL pins TRUE —
    union-of-4-slides lands within 5% of the true hop distinct on every
    hop (at fixture cardinality Datasketches HLL runs in sparse mode
    and the estimate is exactly right; the bound is the contract that
    survives growth). Hop coverage is proven identical to the exact
    form by construction: a hop exists iff one of its 4 slides has an
    event — same set the window() expansion emits."""
    ev = load_table(spark, sf_dir, "events")
    slides = ev.groupBy(F.window("ts", "15 minutes").alias("sw")).agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    hops = slides.select(
        F.explode(F.expr("sequence(0, 3)")).alias("k"), "sw", "sk"
    ).select(
        (
            F.col("sw.start")
            - F.expr("make_interval(0,0,0,0,0,15,0)") * F.col("k")
        ).alias("ws"),
        "sk",
    )
    est = hops.groupBy("ws").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    exact = (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_users_exact"))
        .select(F.col("w.start").alias("ws"), "n_users_exact")
    )
    return exact.join(est, "ws").select(
        "ws",
        "n_users_exact",
        (
            F.abs(F.col("est") - F.col("n_users_exact"))
            <= F.col("n_users_exact") * F.lit(0.05)
        ).alias("hll_within_5pct"),
    )


# --- r9: lagged cross-correlation between event-type series -------------------

#: maximum lead (in hours) scanned by the lagged cross-correlation.
XCORR_MAX_LAG_H = 6


@query(
    "ts_cross_correlation_lag",
    oracle=f"""
    WITH hc AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY h, event_type
    ),
    grid AS (
      SELECT hs.h, t.event_type, coalesce(hc.n, 0) AS n
      FROM (SELECT DISTINCT h FROM hc) hs
      CROSS JOIN (SELECT DISTINCT event_type FROM hc) t
      LEFT JOIN hc ON hc.h = hs.h AND hc.event_type = t.event_type
    ),
    lags AS (SELECT unnest(range(0, {XCORR_MAX_LAG_H} + 1)) AS lag_h),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag_h,
             count(*) AS m,
             CAST(sum(CAST(a.n AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(b.n AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(sum(CAST(a.n * b.n AS HUGEINT)) AS DOUBLE) AS sxy,
             CAST(sum(CAST(a.n * a.n AS HUGEINT)) AS DOUBLE) AS sxx,
             CAST(sum(CAST(b.n * b.n AS HUGEINT)) AS DOUBLE) AS syy
      FROM lags l
      JOIN grid a ON TRUE
      JOIN grid b ON b.h = a.h + to_hours(l.lag_h)
                 AND b.event_type <> a.event_type
      GROUP BY type_a, type_b, l.lag_h
    ),
    scored AS (
      SELECT type_a, type_b, CAST(lag_h AS BIGINT) AS lag_h,
             CAST(m AS BIGINT) AS n_hours,
             CASE WHEN (m * sxx - sx * sx) > 0 AND (m * syy - sy * sy) > 0
                  THEN round((m * sxy - sx * sy)
                             / (sqrt(m * sxx - sx * sx)
                                * sqrt(m * syy - sy * sy)), 6)
                  ELSE NULL END AS xcorr
      FROM pairs
    )
    SELECT type_a, type_b, lag_h, n_hours, xcorr,
           CAST(CASE WHEN row_number() OVER (
                  PARTITION BY type_a, type_b
                  ORDER BY coalesce(xcorr, -2) DESC, lag_h
                ) = 1 THEN 1 ELSE 0 END AS INT) AS is_best_lag
    FROM scored
    """,
    tags=("timeseries", "statistics"),
)
def ts_cross_correlation_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between event-type series — the
    lead/lag screen behind "do errors FOLLOW deploy clicks by two
    hours?": Pearson between series A at hour h and series B at hour
    h+lag for every ordered type pair and lag 0..{XCORR_MAX_LAG_H},
    plus the argmax-lag flag per pair (ties break to the smallest lag
    — 'earliest strongest lead wins', deterministic in both engines
    via coalesce(xcorr, -2) ranking so all-degenerate pairs can't
    float). ts_series_correlation is this table's lag-0 diagonal;
    the lagged sweep is what turns co-movement into a lead/lag story.
    Same exactness discipline as the lag-0 id: the hourly grid is
    ZERO-FILLED (absent cells = 0 — corr over co-present hours
    silently conditions on activity), moments are five 128-bit
    integer sums per (pair, lag) cell, the closed form divides once,
    zero-variance cells emit NULL explicitly instead of relying on
    either engine's x/0 behavior. Plan: the grid is hours × types
    (metadata-sized per day of data); the lag table is a
    {XCORR_MAX_LAG_H + 1}-row broadcast literal; the shifted self-join
    keys on the hour, so every (pair, lag) moment is one partial
    aggregate — no windows, no all-pairs. The grid subtree is
    referenced twice (shifted and unshifted side), so the optimizer
    may duplicate the events scan; both reads collapse map-side into
    the hours × types aggregate before anything wide, and at 100 TB
    the valve is `checkpoint_grid=True` (a localCheckpoint of hc —
    the graph family's lineage-cut move, here as EXECUTABLE
    parameterized code with a result-equality test) so the fact scan
    happens once."""
    return hourly_xcorr(spark, load_table(spark, sf_dir, "events"))


def hourly_xcorr(
    spark: SparkSession,
    events: DataFrame,
    max_lag_h: int = XCORR_MAX_LAG_H,
    checkpoint_grid: bool = False,
) -> DataFrame:
    """Library form of the lagged cross-correlation over ANY DataFrame
    with (`ts` timestamp, `event_type` string) columns. The contract id
    runs the default; `checkpoint_grid=True` is the 100 TB valve: the
    hours × types aggregate (`hc`) is referenced by both the shifted
    and unshifted join side, and without a lineage cut the optimizer
    duplicates the fact scan under each reference — at fixture scale
    the extra scan is cheaper than materialization, at 100 TB it is
    not. localCheckpoint materializes hc (metadata-sized: hours ×
    |types| rows) once, so the scan happens once. Result-identical by
    construction (tests pin it)."""
    hc = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"),
        "event_type",
    ).agg(F.count("*").cast("long").alias("n"))
    if checkpoint_grid:
        hc = hc.localCheckpoint()
    hours = hc.select("h").distinct()
    types = hc.select("event_type").distinct()
    grid = (
        hours.crossJoin(F.broadcast(types))
        .join(hc, ["h", "event_type"], "left")
        .select("h", "event_type", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
    )
    lags = spark.range(0, max_lag_h + 1).select(
        F.col("id").cast("int").alias("lag_h")
    )
    a = grid.crossJoin(F.broadcast(lags)).select(
        "lag_h",
        F.expr("h + make_interval(0, 0, 0, 0, lag_h, 0, 0)").alias("hb"),
        F.col("event_type").alias("type_a"),
        F.col("n").alias("x"),
    )
    b = grid.select(
        F.col("h").alias("hb"),
        F.col("event_type").alias("type_b"),
        F.col("n").alias("y"),
    )
    j = a.join(b, "hb").filter(F.col("type_a") != F.col("type_b"))
    dec = "decimal(38,0)"
    s = j.groupBy("type_a", "type_b", "lag_h").agg(
        F.count("*").alias("m"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).cast("double").alias("syy"),
    )
    m = F.col("m").cast("double")
    varx = m * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = m * F.col("syy") - F.col("sy") * F.col("sy")
    xcorr = F.when(
        (varx > 0) & (vary > 0),
        F.round(
            (m * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.sqrt(varx) * F.sqrt(vary)),
            6,
        ),
    ).otherwise(F.lit(None).cast("double"))
    from pyspark.sql import Window

    scored = s.select(
        "type_a",
        "type_b",
        F.col("lag_h").cast("long").alias("lag_h"),
        F.col("m").cast("long").alias("n_hours"),
        xcorr.alias("xcorr"),
    )
    wbest = Window.partitionBy("type_a", "type_b").orderBy(
        F.coalesce(F.col("xcorr"), F.lit(-2.0)).desc(), "lag_h"
    )
    return scored.withColumn(
        "is_best_lag",
        F.when(F.row_number().over(wbest) == 1, 1).otherwise(0).cast("int"),
    )
