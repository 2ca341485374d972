"""Analytic (OVER) window functions — SURVEY §2.5.

Reference analog: Flink's ``DataStreamOverAggregate`` (ProcessFunction +
MapState, ~600 LoC) and Calcite window rels for batch. In Spark the whole
family is one construct: ``Window.partitionBy().orderBy().rowsBetween()``,
executed by ``WindowExec`` after a single shuffle on the partition key —
per-key state never materializes more than the frame.

Determinism convention: every ORDER BY carries a unique tiebreaker column
(orderkey / event_id) so rank/ntile/lag results are reproducible across
engines; running float sums go through the decimal(38,18) exact-sum trick
(functions.numeric).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from streamline_hybrid_engine_spark.catalog import load_table
from streamline_hybrid_engine_spark.functions.numeric import DEC, rnd
from streamline_hybrid_engine_spark.registry import query


@query(
    "win_rank_orders_per_cust",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, round(o_totalprice, 6) AS totalprice,
             rank() OVER w AS rk,
             dense_rank() OVER w AS drk,
             row_number() OVER w AS rn
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rk <= 3
    """,
    tags=("window",),
)
def win_rank_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number, top-3 orders per customer."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            rnd("o_totalprice", "totalprice"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rk") <= 3)
    )


@query(
    "win_ntile_order_value",
    oracle="""
    SELECT o_orderkey,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window",),
)
def win_ntile_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over a global ordering."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        rnd(F.percent_rank().over(w), "pct_rank"),
        rnd(F.cume_dist().over(w), "cume"),
    )


@query(
    "win_lag_event_gap",
    oracle="""
    SELECT event_id, user_id,
           round((epoch_us(CAST(ts AS TIMESTAMP))
                  - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w)) / 1000000.0, 6) AS gap_s,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
    tags=("window",),
)
def win_lag_event_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead: inter-event gap seconds + next event type per user."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    ) / F.lit(1000000.0)
    return ev.select(
        "event_id",
        "user_id",
        rnd(gap, "gap_s"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "win_last_price_per_part",
    oracle="""
    SELECT DISTINCT l_partkey,
           round(last_value(l_extendedprice) OVER (
             PARTITION BY l_partkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 6) AS last_price,
           round(first_value(l_extendedprice) OVER (
             PARTITION BY l_partkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 6) AS first_price
    FROM lineitem
    """,
    tags=("window",),
)
def win_last_price_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value over the full partition frame."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return li.select(
        "l_partkey",
        rnd(F.last("l_extendedprice").over(w), "last_price"),
        rnd(F.first("l_extendedprice").over(w), "first_price"),
    ).distinct()


@query(
    "win_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,18))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS running_total
    FROM orders
    """,
    tags=("window",),
)
def win_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate, ROWS UNBOUNDED PRECEDING (exact decimal sum)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double")
    return o.select("o_custkey", "o_orderkey", rnd(running, "running_total"))


@query(
    "win_moving_avg_value_3",
    oracle="""
    SELECT event_id, user_id,
           round(CAST(sum(CAST(value AS DECIMAL(38,18))) OVER w AS DOUBLE)
                 / count(value) OVER w, 6) AS mavg3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def win_moving_avg_value_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding frame (ROWS 2 PRECEDING): 3-event moving average per user."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    mavg = F.sum(F.col("value").cast(DEC)).over(w).cast("double") / F.count(
        "value"
    ).over(w)
    return ev.select("event_id", "user_id", rnd(mavg, "mavg3"))


@query(
    "win_topk_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, round(o_totalprice, 6) AS totalprice
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 2
    """,
    tags=("window", "topk"),
)
def win_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group: rank-then-filter (the distributed group-topk idiom)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_orderdate", rnd("o_totalprice", "totalprice"))
    )


@query(
    "win_range_trailing_1h",
    oracle="""
    SELECT event_id, user_id,
           CAST(ts AS TIMESTAMP) AS uts,
           CAST(sum(CAST(round(value * 1000000) AS BIGINT)) OVER (
                  PARTITION BY user_id
                  ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trailing_1h_value_micros
    FROM events
    """,
    tags=("window", "timewindow"),
)
def win_range_trailing_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per user, trailing 1-hour sum of event value —
    the time-interval sliding frame (RANGE BETWEEN INTERVAL PRECEDING)
    that ROWS frames cannot express when event spacing is irregular.

    Two determinism rules make this hash-exact cross-engine: the frame is
    RANGE (peer rows with identical timestamps are all-in, so tie order
    can't change any row's frame — a ROWS frame would be nondeterministic
    under ties), and the summed measure is fixed-point micros (bigint), so
    accumulation order can't drift a double. One shuffle on user_id; the
    per-partition sort is the same sort every OVER query in this family
    already pays.
    """
    ev = load_table(spark, sf_dir, "events")
    micros = F.round(F.col("value") * 1000000).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600000000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.col("ts").alias("uts"),
        F.sum(micros).over(w).alias("trailing_1h_value_micros"),
    )


@query(
    "win_fill_forward_ignore_nulls",
    oracle="""
    WITH sparse AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS uts,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 1000000) AS BIGINT) END AS purchase_micros
      FROM events
    )
    SELECT event_id, user_id, uts,
           last_value(purchase_micros IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY uts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_micros
    FROM sparse
    """,
    tags=("window",),
)
def win_fill_forward_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill via LAST_VALUE ... IGNORE NULLS: carry each user's most
    recent purchase amount onto every subsequent event — the gap-fill
    idiom sensor/CDC pipelines use constantly, and a distinct capability
    from plain last_value (which would return the current row's NULL).
    Fixed-point micros keep the carried value hash-exact; (uts, event_id)
    ordering makes the frame deterministic under timestamp ties."""
    ev = load_table(spark, sf_dir, "events")
    sparse = ev.select(
        "event_id",
        "user_id",
        F.col("ts").alias("uts"),
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 1000000).cast("long"),
        ).alias("purchase_micros"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("uts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return sparse.select(
        "event_id",
        "user_id",
        "uts",
        F.last("purchase_micros", ignorenulls=True).over(w).alias(
            "last_purchase_micros"
        ),
    )


@query(
    "win_nth_value_second_cheapest",
    oracle="""
    SELECT DISTINCT l_partkey,
           nth_value(l_extendedprice, 2) OVER (
             PARTITION BY l_partkey
             ORDER BY l_extendedprice, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_cheapest
    FROM lineitem
    """,
    tags=("windows", "nth_value"),
)
def win_nth_value_second_cheapest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTH_VALUE over a full-partition frame: the second-cheapest line
    price per part (NULL when a part has one line — nth_value's defined
    miss behavior, unlike a rank-filter rewrite which would drop the
    row). The order is total (price, orderkey, linenumber) so price
    ties cannot flip which row is 'second' between engines; the frame
    must be UNBOUNDED FOLLOWING because the default frame ends at
    CURRENT ROW and would yield NULL for the first row of each
    partition."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        li.select(
            "l_partkey",
            F.nth_value("l_extendedprice", 2).over(w).alias("second_cheapest"),
        )
        .distinct()
    )


@query(
    "win_ratio_to_report",
    oracle="""
    WITH fx AS (
      SELECT event_id, user_id,
             CAST(floor(value * 1000000) AS BIGINT) AS v_fx
      FROM events WHERE event_type = 'purchase'
    )
    SELECT event_id, user_id,
           round(CAST(v_fx AS DOUBLE)
                 / CAST(sum(v_fx) OVER (PARTITION BY user_id) AS DOUBLE),
                 6) AS share_of_user_spend
    FROM fx
    """,
    tags=("windows", "ratio"),
)
def win_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATIO_TO_REPORT: each purchase as a share of its user's total
    spend — the window-aggregate-as-denominator idiom (Oracle SQL's
    ratio_to_report, spelled as value / sum() OVER in both engines).
    Numerator and denominator are exact fixed-point longs (the window
    sum of longs is order-independent), so the single double division
    happens on identical operands — putting the raw doubles through the
    window sum instead would ulp-drift with partition order. One
    shuffle on user_id, frame-less window (whole partition), no sort
    required."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    fx = ev.select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    w = Window.partitionBy("user_id")
    return fx.select(
        "event_id",
        "user_id",
        F.round(
            F.col("v_fx").cast("double") / F.sum("v_fx").over(w).cast("double"),
            6,
        ).alias("share_of_user_spend"),
    )


@query(
    "win_topk_with_ties",
    oracle="""
    SELECT user_id, event_id, round(value, 6) AS value, rnk
    FROM (
      SELECT user_id, event_id, value,
             CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC)
                  AS BIGINT) AS rnk
      FROM events WHERE event_type = 'purchase'
    ) t
    WHERE rnk <= 3
    """,
    tags=("windows", "topk", "ties"),
)
def win_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 purchases per user WITH TIES (SQL-standard FETCH FIRST …
    WITH TIES semantics): rank() keeps every row tied at the cut, so a
    user with four purchases at the third-highest value returns all
    four — row_number-based top-k (win_topk_orders) would
    nondeterministically drop one without a tiebreak column. The two
    semantics answer different questions ("the top-3 VALUES' rows" vs
    "exactly 3 rows") and a migrating workload needs both. Identical
    plan shape: one user_id shuffle, per-partition sort, rank filter
    pushed into the window via the limit-pushdown rule."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("value"))
    return (
        ev.select(
            "user_id",
            "event_id",
            F.rank().over(w).alias("rnk"),
            rnd("value", "value"),
        )
        .filter(F.col("rnk") <= 3)
        .select("user_id", "event_id", "value", F.col("rnk").cast("long").alias("rnk"))
    )


@query(
    "win_running_distinct_types",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS uts,
             CASE WHEN row_number() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY CAST(ts AS TIMESTAMP), event_id) = 1
                  THEN 1 ELSE 0 END AS first_of_type
      FROM events
    )
    SELECT user_id, event_id,
           CAST(sum(first_of_type) OVER (
             PARTITION BY user_id ORDER BY uts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS n_types_seen
    FROM flagged
    """,
    tags=("windows", "distinct", "running"),
)
def win_running_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) — how many distinct event types each user
    has seen as of every event. Neither engine supports DISTINCT inside
    a window frame, so this is the standard two-window rewrite: flag
    each (user, type)'s FIRST occurrence (row_number = 1 under a total
    order), then running-sum the flags per user — exactly one distinct
    increment per type, integer-exact, same spelling both engines.
    Scale shape: both windows partition by user_id (the second is a
    prefix of the first's key), so one shuffle serves the pair and the
    per-user sort is reused."""
    ev = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias(
            "first_of_type"
        ),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_of_type").over(w_run).cast("long").alias("n_types_seen"),
    )


@query(
    "win_pattern_islands",
    oracle="""
    WITH grp AS (
      SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS uts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
           - row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS island
      FROM events
    )
    SELECT user_id, event_type,
           min(uts) AS island_start, max(uts) AS island_end,
           count(*) AS n_events, min(event_id) AS first_event_id
    FROM grp
    GROUP BY user_id, event_type, island
    """,
    tags=("windows", "islands"),
)
def win_pattern_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE same-type events per
    user (the classic streak/run-length detector: consecutive logins,
    uninterrupted error bursts). The Tabibitosan double-row_number trick
    — overall rank minus per-type rank is constant exactly along an
    unbroken run of that type — turns run detection into a plain groupBy,
    no self-join and no per-row loop; islands report their span, size and
    first event.

    Scale: two windows over the SAME (user_id → ts, event_id) sort — one
    user_id shuffle, one per-partition sort serves both (the second
    window adds only a per-(user, type) rank pass) — then a hash
    aggregate on (user, type, island). Total-ordered by the event_id
    tiebreak, so islands are engine-stable. The streaming analog of a
    run break is a session gap: `stream_session_dynamic_gap` carries
    that face."""
    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    grp = ev.select(
        "user_id",
        "event_type",
        "event_id",
        "ts",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("island"),
    )
    return grp.groupBy("user_id", "event_type", "island").agg(
        F.min("ts").alias("island_start"),
        F.max("ts").alias("island_end"),
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event_id"),
    ).drop("island")


@query(
    "win_percent_rank_cume",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd,
           CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice)
    """,
    tags=("windows",),
)
def win_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position analytics: percent_rank ((rank-1)/(n-1)) and
    cume_dist (rows ≤ current / n) per customer ordered by price — the
    distribution-position pair that completes the ranking family (rank/
    dense_rank/ntile are earlier rows). Both are VALUE-determined: tied
    prices share pr/cd, so no synthetic tiebreak is needed for the
    values to be engine-stable (the convention's unique-tiebreak rule
    applies to row-identity functions like row_number, not these).
    Division by (n-1)/n on exact integer ranks → identical doubles both
    engines, rounded 6. One shuffle on o_custkey, one sort, both
    functions plus the count share the frame."""
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    wc = Window.partitionBy("o_custkey")
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.count("*").over(wc).alias("n"),
    )


@query(
    "win_range_numeric_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(count(*) OVER w AS BIGINT) AS n_near,
           round(CAST(sum(CAST(floor(o_totalprice * 1000000) AS BIGINT)) OVER w
                 AS DOUBLE) / 1000000, 6) AS sum_near
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 50000 PRECEDING AND 50000 FOLLOWING)
    """,
    tags=("windows", "range"),
)
def win_range_numeric_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-based RANGE frame on a NUMERIC ordering column (the
    non-time sibling of win_range_trailing_1h, and two-sided): per
    customer, the count and exact fixed-point sum of orders priced
    within ±50 000 of the current order. RANGE frames are defined by
    the ORDER-BY VALUE, so tied prices share identical frames and the
    result is engine-stable with no synthetic tiebreak — the property
    ROWS frames lack. Execution: one shuffle + one sort per customer,
    then Spark's WindowExec slides both frame boundaries monotonically
    (each row's bounds only ever advance — O(n) per partition, not
    O(n²) re-scans). The summed operand is the floor-µ long, so the
    running totals are integer-exact cross-engine."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, 50000)
    )
    fx = F.floor(F.col("o_totalprice") * 1_000_000).cast("long")
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(w).alias("n_near"),
        F.round(F.sum(fx).over(w).cast("double") / 1_000_000, 6).alias(
            "sum_near"
        ),
    )


@query(
    "win_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(floor(l_quantity) AS BIGINT) AS wt
      FROM lineitem
    ),
    c AS (
      SELECT flag, cents, wt,
             CAST(sum(wt) OVER (PARTITION BY flag ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum,
             CAST(sum(wt) OVER (PARTITION BY flag) AS BIGINT) AS tot
      FROM w
    )
    SELECT flag, min(cents) AS wmedian_cents, min(tot) AS total_weight
    FROM c WHERE 2 * cum >= tot
    GROUP BY flag
    """,
    tags=("window", "aggregate"),
)
def win_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (lower) per group — the quantity-weighted price
    midpoint, where every plain median is the wt=1 special case: the
    smallest value whose cumulative weight reaches half the group
    total. One cumulative-weight window over (group ORDER BY value) +
    a min over qualifying rows. No tiebreak column is needed for
    determinism: within a tie run of equal values the crossing ROW is
    order-ambiguous, but rows before the run have fixed cum <
    threshold and the run's last row has fixed cum, so the crossing
    VALUE — all the query emits — is identical under any intra-tie
    order (the same argument that makes the oracle exact). Weights
    and values are exact integers.

    Plan: one shuffle on the group key, one per-group sort serving
    both window frames. At 100 TB swap the full sort for the
    two-pass equi-depth-histogram narrowing `agg_percentile_disc`
    documents — same crossing rule over bucket boundaries."""
    li = load_table(spark, sf_dir, "lineitem")
    w = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.floor(F.col("l_quantity")).cast("long").alias("wt"),
    )
    return weighted_median(w, ["flag"], "cents", "wt").select(
        "flag",
        F.col("wmedian").alias("wmedian_cents"),
        "total_weight",
    )


def weighted_median(
    df: DataFrame, keys: list[str], value_col: str, weight_col: str
) -> DataFrame:
    """Library primitive: lower weighted median per key — the smallest
    value whose cumulative weight reaches half the key's total. Returns
    (keys..., wmedian, total_weight). Deterministic without a tiebreak
    column: the crossing VALUE is invariant under intra-tie row order
    (rows before a tie run have fixed cumulative weight, the run's last
    row has fixed cumulative weight — see win_weighted_median). Use
    integer-typed weights for an exact cross-engine result. One shuffle
    on the keys serves both window frames and the final aggregate."""
    win_cum = (
        Window.partitionBy(*keys)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    win_all = Window.partitionBy(*keys)
    c = df.select(
        *keys,
        value_col,
        F.sum(weight_col).over(win_cum).cast("long").alias("cum"),
        F.sum(weight_col).over(win_all).cast("long").alias("tot"),
    )
    return (
        c.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy(*keys)
        .agg(
            F.min(value_col).alias("wmedian"),
            F.min("tot").alias("total_weight"),
        )
    )


def weighted_median_binned(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    weight_col: str,
    bin_width: int,
) -> DataFrame:
    """:func:`weighted_median` through the histogram-narrowing plan —
    the SAME answer with NO per-key sort of the data (SURVEY §2.5
    weighted-median row's promised 100 TB path, realized r12).

    Phase 1 bins values equi-width (``floor(value / bin_width)`` —
    monotone, so bin ascending is a prefix of the value order and equal
    values share a bin) and sums weights per (key, bin): one map-side
    combined groupBy. Phase 2 runs cumulative/total weight windows over
    the BUCKET table only (keys × bins rows — metadata-sized) and picks
    each key's CROSSING bin: the first whose cumulative weight reaches
    half the total, carrying the cumulative weight BEFORE it as the
    offset. Phase 3 broadcast-joins the one-row-per-key crossing table
    back and sorts ONLY the crossing bin's rows — offset + in-bin
    cumulative weight equals the global cumulative weight, so the min
    qualifying value is exactly the plain form's crossing value
    (bin-width-invariant; differentially fuzzed at several widths).

    Exactness argument: every bin before the crossing bin has
    2·cum < tot for all its rows (its bin-end cumulative already fails
    the crossing test), and within the crossing bin the crossing VALUE
    is intra-tie-order invariant — the same argument the plain form's
    docstring proves."""
    b = df.withColumn(
        "__wmb", F.floor(F.col(value_col) / F.lit(bin_width)).cast("long")
    )
    bins = b.groupBy(*keys, "__wmb").agg(
        F.sum(weight_col).cast("long").alias("__bw")
    )
    w_off = (
        Window.partitionBy(*keys)
        .orderBy("__wmb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ann = bins.select(
        *keys,
        "__wmb",
        F.coalesce(F.sum("__bw").over(w_off), F.lit(0))
        .cast("long")
        .alias("__off"),
        (F.coalesce(F.sum("__bw").over(w_off), F.lit(0)) + F.col("__bw"))
        .cast("long")
        .alias("__cum"),
        F.sum("__bw")
        .over(Window.partitionBy(*keys))
        .cast("long")
        .alias("__tot"),
    )
    crossing = (
        ann.filter(2 * F.col("__cum") >= F.col("__tot"))
        .groupBy(*keys)
        .agg(
            F.min("__wmb").alias("__wmb"),
            F.min_by("__off", "__wmb").cast("long").alias("__off"),
            F.min("__tot").alias("__tot"),
        )
    )
    in_bin = b.join(F.broadcast(crossing), [*keys, "__wmb"])
    w_in = (
        Window.partitionBy(*keys)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = in_bin.select(
        *keys,
        value_col,
        "__tot",
        (F.col("__off") + F.sum(weight_col).over(w_in))
        .cast("long")
        .alias("__cumg"),
    )
    return (
        c.filter(2 * F.col("__cumg") >= F.col("__tot"))
        .groupBy(*keys)
        .agg(
            F.min(value_col).alias("wmedian"),
            F.min("__tot").alias("total_weight"),
        )
    )


@query(
    "win_weighted_median_binned",
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(floor(l_quantity) AS BIGINT) AS wt
      FROM lineitem
    ),
    c AS (
      SELECT flag, cents, wt,
             CAST(sum(wt) OVER (PARTITION BY flag ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum,
             CAST(sum(wt) OVER (PARTITION BY flag) AS BIGINT) AS tot
      FROM w
    )
    SELECT flag, min(cents) AS wmedian_cents, min(tot) AS total_weight
    FROM c WHERE 2 * cum >= tot
    GROUP BY flag
    """,
    tags=("window", "aggregate", "scale-valve"),
)
def win_weighted_median_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """win_weighted_median's answer through the equi-width-histogram
    narrowing plan — the executable realization of that docstring's
    promised 100 TB path (r11-verdict task 4). Same output schema, SAME
    oracle (the plain form's, verbatim): per-bin weight sums ride a
    map-side-combined groupBy, the cumulative window runs over the
    flag × bin bucket table only, and the exact sort touches just the
    crossing bin's rows — no per-flag sort of the 6M-row (or 100 TB)
    weighted table ever happens (plan-pinned: no range partitioning of
    the data; the data window partitions by (flag, bin-membership) via
    the crossing-bin broadcast semi-filter). Bin width 2^20 cents
    (~10 bins over the fixture price range); the answer is
    width-invariant (differential fuzz at widths 1 / 7 / 2^20 / ∞)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.floor(F.col("l_quantity")).cast("long").alias("wt"),
    )
    return weighted_median_binned(w, ["flag"], "cents", "wt", 1 << 20).select(
        "flag",
        F.col("wmedian").alias("wmedian_cents"),
        "total_weight",
    )


@query(
    "win_zscore_normalize",
    oracle="""
    WITH x AS (
      SELECT l_orderkey, l_linenumber, l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem WHERE l_linenumber = 1
    ),
    m AS (
      SELECT flag, count(*) AS n,
             CAST(sum(cents) AS HUGEINT) AS s1,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS s2
      FROM x GROUP BY flag
    )
    SELECT x.l_orderkey, x.flag, x.cents,
           round((x.cents - CAST(m.s1 AS DOUBLE) / m.n)
                 / sqrt((m.n * CAST(m.s2 AS DOUBLE) - CAST(m.s1 AS DOUBLE)
                         * CAST(m.s1 AS DOUBLE))
                        / (CAST(m.n AS DOUBLE) * (m.n - 1))), 6) AS z
    FROM x JOIN m ON m.flag = x.flag
    """,
    tags=("window", "normalize"),
)
def win_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score standardization — the feature-prep staple
    ((x − μ)/σ per peer group), deterministic cross-engine where a
    naive stddev_samp(double) is not: the moments are EXACT integer
    sums (Σx, Σx² over cents as DECIMAL(38,0)/HUGEINT — no
    accumulation-order drift), μ and σ² are single divisions of those
    identical integers, and sqrt is IEEE-754 CORRECTLY-ROUNDED (unlike
    ln/exp — the one transcendental that is safe cross-engine, which
    is why this op exists while PSI/entropy use integer proxies).
    Plan: one partial-agg groupBy for the moments (group-count-sized),
    broadcast back, map-side z — the raw rows never shuffle. The
    window-partition alternative (avg/std OVER (PARTITION BY flag))
    would sort every row; the aggregate+broadcast form is the 100 TB
    shape."""
    li = load_table(spark, sf_dir, "lineitem", parallel=True)
    x = li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    dec = "decimal(38,0)"
    m = x.groupBy("flag").agg(
        F.count("*").alias("n"),
        F.sum(F.col("cents").cast(dec)).alias("s1"),
        F.sum((F.col("cents").cast(dec) * F.col("cents")).cast(dec)).alias(
            "s2"
        ),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    var = (
        F.col("n") * F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double")
    ) / (F.col("n").cast("double") * (F.col("n") - 1))
    return x.join(F.broadcast(m), "flag").select(
        "l_orderkey",
        "flag",
        "cents",
        F.round((F.col("cents") - mu) / F.sqrt(var), 6).alias("z"),
    )


@query(
    "win_winsorize_p5p95",
    oracle="""
    WITH x AS (
      SELECT l_orderkey, l_linenumber, l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem WHERE l_partkey % 4 = 0
    ),
    ranked AS (
      SELECT l_orderkey, l_linenumber, flag, cents,
             row_number() OVER (PARTITION BY flag
                                ORDER BY cents, l_orderkey, l_linenumber)
               AS rn,
             count(*) OVER (PARTITION BY flag) AS n
      FROM x
    ),
    fences AS (
      SELECT flag,
             max(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT)
                      THEN cents END) AS p5,
             max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                      THEN cents END) AS p95
      FROM ranked GROUP BY flag
    )
    SELECT x.l_orderkey, x.l_linenumber, x.flag,
           greatest(f.p5, least(f.p95, x.cents)) AS winsorized_cents,
           CASE WHEN x.cents < f.p5 OR x.cents > f.p95
                THEN 1 ELSE 0 END AS clamped
    FROM x JOIN fences f ON f.flag = x.flag
    """,
    tags=("window", "robust"),
)
def win_winsorize_p5p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization at P5/P95 per group — the robust-feature-prep
    TRANSFORM next to dq_outlier_iqr's COUNT: tails are clamped to the
    fences, not dropped, preserving row count for downstream models.
    Discrete rank-ceil percentiles (the certified convention — exact
    5%/95% binary fractions, total-order tiebreak), 3-row fences
    broadcast back, the clamp is greatest/least integer arithmetic
    map-side. Note 0.05·n and 0.95·n: 0.05 is NOT an exact binary
    double but ceil() sits ≥ 1 ulp from the integer boundary except
    when 0.05·n is an exact integer — both engines compute the same
    product of the same two doubles, so the rank agrees everywhere
    regardless. At 100 TB the fence ranks come from the percentile
    narrowing pass, clamp unchanged."""
    li = load_table(spark, sf_dir, "lineitem", parallel=True)
    x = li.filter(F.col("l_partkey") % 4 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("flag").orderBy(
        "cents", "l_orderkey", "l_linenumber"
    )
    wp = Window.partitionBy("flag")
    ranked = x.select(
        "flag",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wp).alias("n"),
    )

    def pick(p: float, alias: str):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("long"),
                F.col("cents"),
            )
        ).alias(alias)

    fences = ranked.groupBy("flag").agg(pick(0.05, "p5"), pick(0.95, "p95"))
    j = x.join(F.broadcast(fences), "flag")
    return j.select(
        "l_orderkey",
        "l_linenumber",
        "flag",
        F.greatest(
            F.col("p5"), F.least(F.col("p95"), F.col("cents"))
        ).alias("winsorized_cents"),
        F.when(
            (F.col("cents") < F.col("p5")) | (F.col("cents") > F.col("p95")),
            1,
        )
        .otherwise(0)
        .alias("clamped"),
    )


@query(
    "win_running_sum_reset",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CAST(round(value * 1000000) AS BIGINT) AS v_us,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS reset
      FROM events
    ),
    seg AS (
      SELECT user_id, event_id, us, v_us,
             CAST(sum(reset) OVER (PARTITION BY user_id ORDER BY us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS segment
      FROM marked
    )
    SELECT user_id, event_id, segment,
           CAST(sum(CAST(v_us AS HUGEINT)) OVER (
             PARTITION BY user_id, segment ORDER BY us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS running_since_reset
    FROM seg
    """,
    tags=("window", "reset"),
)
def win_running_sum_reset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total WITH RESET: the cumulative value accumulated since
    each user's last 'purchase' (basket-since-checkout, usage-since-
    billing — the accumulate-then-reset shape). Windows cannot reset
    mid-frame, but the reset points are data: a cumulative count of
    reset markers IS the segment id (the gaps-and-islands move), and
    the running sum partitions by (user, segment) — a PREFIX extension
    of the user partitioning, so Catalyst satisfies the second window
    from the first's exchange: one shuffle, two logical sorts, exact
    integer micros. The purchase row itself starts its new segment
    (reset-inclusive semantics, pinned by the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    marked = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("us"),
        F.round(F.col("value") * 1000000).cast("long").alias("v_us"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "reset"
        ),
    )
    w1 = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = marked.withColumn(
        "segment", F.sum("reset").over(w1).cast("long")
    )
    dec = "decimal(38,0)"
    w2 = (
        Window.partitionBy("user_id", "segment")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return seg.select(
        "user_id",
        "event_id",
        "segment",
        F.sum(F.col("v_us").cast(dec)).over(w2).cast("long").alias(
            "running_since_reset"
        ),
    )
