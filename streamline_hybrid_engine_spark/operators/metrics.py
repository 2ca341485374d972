"""Job metrics / accumulators — the Flink accumulator analog.

Reference analog: Flink accumulators (``IntCounter``, ``LongCounter``,
``Histogram`` — flink-core .../accumulators/), registered inside operators
and collected with the job result via
``ExecutionEnvironment.getLastJobExecutionResult()``. Spark's native
equivalent is ``DataFrame.observe`` + ``Observation``: named aggregate
expressions evaluated AS THE DATA FLOWS THROUGH the plan (an
``CollectMetrics`` node), collected on the driver after any action — no
second scan, no separate counting job.

Scale note: observed metrics are accumulator-style partial aggregates
merged at task completion — constant driver memory, zero extra shuffle.
The deterministic-sum convention (fixed-point micros) applies inside the
observe expressions exactly as in ordinary aggregates, so the collected
numbers are partitioning-independent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from streamline_hybrid_engine_spark.catalog import load_table
from streamline_hybrid_engine_spark.functions.numeric import MICROS, osum
from streamline_hybrid_engine_spark.registry import query


@query(
    "observe_pipeline_metrics",
    oracle=f"""
    SELECT count(*) AS n_rows,
           {osum("l_extendedprice * (1 - l_discount)", "revenue")},
           CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_deep_disc
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    """,
    tags=("metrics", "accumulators"),
)
def observe_pipeline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-side metrics via ``observe``: row count, deterministic
    revenue sum, and a predicate counter ride along with the scan the way
    Flink accumulators ride an operator — the action here stands in for
    whatever the pipeline's real action is (a sink write at 100 TB).

    The result is the collected metrics row itself, so the oracle checks
    the accumulator VALUES, not just that the plumbing ran."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    try:
        from pyspark.sql import Observation
    except ImportError:  # pragma: no cover - Observation exists since 3.3
        Observation = None
    rev_micros = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * MICROS
    ).cast("long")
    deep = F.when(F.col("l_discount") > 0.05, 1).otherwise(0)
    metrics = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(rev_micros).alias("rev_micros"),
        F.sum(deep).alias("n_deep_disc"),
    ]
    if Observation is None:  # degraded path: plain aggregate (same numbers)
        row = li.agg(*metrics).collect()[0]
        vals = row.asDict()
    else:
        obs = Observation()
        observed = li.observe(obs, *metrics)
        observed.count()  # any full-pass action flushes the metrics
        vals = obs.get
    return spark.createDataFrame(
        [
            (
                int(vals["n_rows"]),
                round(vals["rev_micros"] / MICROS, 6),
                int(vals["n_deep_disc"]),
            )
        ],
        "n_rows bigint, revenue double, n_deep_disc bigint",
    )


_PROFILE_BASE = """
      SELECT o.o_orderkey, o.o_totalprice, c.c_mktsegment
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
"""


@query(
    "dq_null_profile",
    oracle=f"""
    WITH base AS ({_PROFILE_BASE})
    SELECT 'o_orderkey' AS col_name,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           count(DISTINCT o_orderkey) AS n_distinct
    FROM base
    UNION ALL
    SELECT 'o_totalprice',
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_totalprice)
    FROM base
    UNION ALL
    SELECT 'c_mktsegment',
           CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT c_mktsegment)
    FROM base
    """,
    tags=("metrics", "profiling"),
)
def dq_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality column profile (null count + exact distinct count per
    column) over a frame that actually HAS nulls — the left-join face of
    customer→orders. The profiling primitive behind optimizer stats and
    data-quality dashboards (the reference side: optimizer statistics
    collection).

    One aggregate pass computes all columns' stats (Catalyst plans the
    multi-countDistinct via a single Expand), then the wide row unpivots
    to the long (col_name, n_nulls, n_distinct) report — the oracle scans
    once per column instead (UNION ALL), same result. At 100 TB swap the
    exact distinct counts for approx_count_distinct (one pass, no Expand
    blow-up) — exact here because the gate needs determinism."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    base = c.join(o, c.c_custkey == o.o_custkey, "left")
    cols = ["o_orderkey", "o_totalprice", "c_mktsegment"]
    aggs = []
    for col in cols:
        aggs.append(
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias(f"{col}__nulls")
        )
        aggs.append(F.countDistinct(col).alias(f"{col}__distinct"))
    wide = base.agg(*aggs)
    stack = ", ".join(f"'{c_}', {c_}__nulls, {c_}__distinct" for c_ in cols)
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS (col_name, n_nulls, n_distinct)"
        )
    )


@query(
    "dq_expectations_orders",
    oracle="""
    SELECT 'orderkey_unique' AS constraint_name,
           count(*) = count(DISTINCT o_orderkey) AS passed,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'custkey_fk_in_customer',
           count(*) = 0,
           CAST(count(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS (
      SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'totalprice_positive',
           count(*) = 0,
           CAST(count(*) AS BIGINT)
    FROM orders WHERE o_totalprice <= 0
    UNION ALL
    SELECT 'orderdate_in_range',
           count(*) = 0,
           CAST(count(*) AS BIGINT)
    FROM orders
    WHERE o_orderdate < DATE '1992-01-01' OR o_orderdate > DATE '1998-12-31'
    UNION ALL
    SELECT 'status_in_domain',
           count(*) = 0,
           CAST(count(*) AS BIGINT)
    FROM orders WHERE o_orderstatus NOT IN ('O', 'F', 'P')
    """,
    tags=("metrics", "quality", "expectations"),
)
def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation suite (the Deequ/dbt-test
    pattern): key uniqueness, FK containment, value range, date range, and
    domain membership over ``orders``, each emitted as
    (constraint_name, passed, n_violations) — the validation gate a
    training-data pipeline runs before a table is allowed downstream.

    All five constraints evaluate in ONE aggregation pass over orders plus
    one broadcast semi-join for the FK check (conditional-count aggregates
    — never five scans; the oracle's UNION ALL scans per constraint
    instead, same rows). At 100 TB the shape is unchanged: conditional
    counts ride the scan map-side, the FK probe broadcasts the dimension's
    key column.
    """
    o = load_table(spark, sf_dir, "orders")
    cust_keys = (
        load_table(spark, sf_dir, "customer").select("c_custkey").distinct()
    )
    flagged = o.join(
        F.broadcast(cust_keys),
        o.o_custkey == cust_keys.c_custkey,
        "left",
    ).select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        "o_orderstatus",
        F.col("c_custkey").isNull().alias("fk_miss"),
    )
    viol = [
        ("orderkey_unique", F.count("*") - F.countDistinct("o_orderkey")),
        ("custkey_fk_in_customer", F.sum(F.when(F.col("fk_miss"), 1).otherwise(0))),
        (
            "totalprice_positive",
            F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)),
        ),
        (
            "orderdate_in_range",
            F.sum(
                F.when(
                    (F.col("o_orderdate") < F.lit("1992-01-01").cast("date"))
                    | (F.col("o_orderdate") > F.lit("1998-12-31").cast("date")),
                    1,
                ).otherwise(0)
            ),
        ),
        (
            "status_in_domain",
            F.sum(
                F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
            ),
        ),
    ]
    wide = flagged.agg(
        *[expr.cast("long").alias(f"v{i}") for i, (_, expr) in enumerate(viol)]
    )
    stack = ", ".join(f"'{name}', v{i}" for i, (name, _) in enumerate(viol))
    return wide.select(
        F.expr(f"stack({len(viol)}, {stack}) AS (constraint_name, n_violations)")
    ).select(
        "constraint_name",
        (F.col("n_violations") == 0).alias("passed"),
        "n_violations",
    )


@query(
    "dq_sequence_gaps",
    oracle="""
    WITH f AS (
      SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
    ),
    lagged AS (
      SELECT k, lag(k) OVER (ORDER BY k) AS prev_k FROM f
    )
    SELECT prev_k + 1 AS gap_start,
           CAST(k - prev_k - 1 AS BIGINT) AS gap_len
    FROM lagged
    WHERE prev_k IS NOT NULL AND k - prev_k > 1
    """,
    tags=("metrics", "dq", "gaps"),
)
def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap detection (gaps-and-islands, the gaps half — the
    session operator family is the islands half): every maximal run of
    ids MISSING from the F-status order stream, as (gap_start, gap_len).
    The completeness check every CDC/ingestion pipeline runs — a gap in
    an expected-dense sequence is a dropped batch. One lag over a total
    order; gaps are unique by start so the result needs no tiebreak.
    At 100 TB the global sort is avoided the usual way: range-partition
    by id, detect gaps within partitions, then compare only the 2·P
    boundary rows on the driver."""
    f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select(F.col("o_orderkey").alias("k"))
    from pyspark.sql import Window  # noqa: PLC0415

    lagged = f.select(
        "k", F.lag("k").over(Window.orderBy("k")).alias("prev_k")
    )
    return lagged.filter(
        F.col("prev_k").isNotNull() & (F.col("k") - F.col("prev_k") > 1)
    ).select(
        (F.col("prev_k") + 1).alias("gap_start"),
        (F.col("k") - F.col("prev_k") - 1).cast("long").alias("gap_len"),
    )


ANOMALY_K = 3.0  # flag beyond 3 robust sigmas
MAD_SIGMA = 1.4826  # MAD → sigma for normal data


@query(
    "dq_anomaly_mad_window",
    oracle=f"""
    WITH stats AS (
      SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
             quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1, 2
    ),
    dev AS (
      SELECT e.event_type, s.day, s.med,
             quantile_cont(abs(e.value - s.med), 0.5) AS mad
      FROM events e
      JOIN stats s ON e.event_type = s.event_type
                  AND date_trunc('day', CAST(e.ts AS TIMESTAMP)) = s.day
      GROUP BY 1, 2, 3
    )
    SELECT e.event_id, e.event_type, d.day, round(e.value, 6) AS value,
           round(abs(e.value - d.med) / ({MAD_SIGMA} * d.mad), 6) AS robust_z
    FROM events e
    JOIN dev d ON e.event_type = d.event_type
              AND date_trunc('day', CAST(e.ts AS TIMESTAMP)) = d.day
    WHERE d.mad > 0
      AND abs(e.value - d.med) > {ANOMALY_K} * {MAD_SIGMA} * d.mad
    """,
    tags=("dq", "robust"),
)
def dq_anomaly_mad_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: flag events whose value sits more than
    3 robust sigmas (MAD × 1.4826) from the MEDIAN of their
    (event_type, day) peer window — the data-quality tripwire that
    survives the heavy-tailed columns where mean/stddev z-scores drown
    (one whale purchase inflates stddev until nothing else flags).

    The "window" is a calendar-day bucket, deliberately: a true sliding
    per-row median needs a re-sort per row and does not distribute,
    while bucketed medians are two grouped aggregates shuffling on the
    SAME (type, day) key the events already group by downstream —
    time-local sensitivity with a 100 TB-viable plan, the same trade
    `ts_rollup_gapfill` makes. Three passes over events, all
    equi-shuffles; degenerate windows (MAD = 0: over half the bucket at
    the median) are excluded rather than dividing by zero. Median
    arithmetic is interpolated-identical across engines (see
    agg_mad_robust)."""
    ev = load_table(spark, sf_dir, "events", parallel=True).select(
        "event_id",
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        "value",
    )
    med = ev.groupBy("event_type", "day").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        ev.join(med, ["event_type", "day"])
        .groupBy("event_type", "day", "med")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    return (
        ev.join(mad, ["event_type", "day"])
        .filter(
            (F.col("mad") > 0)
            & (
                F.abs(F.col("value") - F.col("med"))
                > ANOMALY_K * MAD_SIGMA * F.col("mad")
            )
        )
        .select(
            "event_id",
            "event_type",
            "day",
            F.round("value", 6).alias("value"),
            F.round(
                F.abs(F.col("value") - F.col("med"))
                / (MAD_SIGMA * F.col("mad")),
                6,
            ).alias("robust_z"),
        )
    )


#: freshness SLA: a source lagging the corpus high-water mark by more
#: than this is stale (pipeline-health gate, pure event-time arithmetic).
FRESHNESS_SLA_S = 12 * 3600


@query(
    "dq_freshness_lag",
    oracle=f"""
    WITH per_source AS (
      SELECT event_type AS source,
             max(epoch_us(CAST(ts AS TIMESTAMP))) AS max_us,
             count(*) AS n_rows
      FROM events GROUP BY event_type
    ),
    hwm AS (SELECT max(max_us) AS hwm_us FROM per_source)
    SELECT source, n_rows,
           CAST((hwm_us - max_us) // 1000000 AS BIGINT) AS lag_s,
           (hwm_us - max_us) // 1000000 > {FRESHNESS_SLA_S} AS is_stale,
           CAST(to_timestamp(max_us // 1000000) AS TIMESTAMP) AS last_seen
    FROM per_source, hwm
    """,
    tags=("dq", "freshness"),
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-freshness monitoring — the first data-quality gate every
    ingestion pipeline runs: per source (event_type as the feed id), the
    last-seen event time, its lag behind the corpus high-water mark, and
    an SLA verdict (stale if > 12 h behind). Pure event-time integer
    arithmetic — no wall clock, so the check is reproducible (the hash
    gate could never pin `now() - max(ts)`).

    Plan: one partial-aggregating groupBy (max + count combine
    map-side), then the one-row high-water mark broadcast-crossed back —
    the same tiny-scalar crossJoin shape as the scalar-subquery rows. At
    100 TB: the groupBy shuffles |sources| rows, nothing else moves."""
    ev = load_table(spark, sf_dir, "events", parallel=True)
    per_source = ev.groupBy(F.col("event_type").alias("source")).agg(
        F.max(F.unix_micros("ts")).alias("max_us"),
        F.count("*").alias("n_rows"),
    )
    hwm = per_source.agg(F.max("max_us").alias("hwm_us"))
    lag_s = ((F.col("hwm_us") - F.col("max_us")) / 1_000_000).cast("long")
    return per_source.crossJoin(F.broadcast(hwm)).select(
        "source",
        "n_rows",
        lag_s.alias("lag_s"),
        (lag_s > FRESHNESS_SLA_S).alias("is_stale"),
        F.timestamp_seconds((F.col("max_us") / 1_000_000).cast("long")).alias(
            "last_seen"
        ),
    )


#: Benford first-digit expectations log10(1 + 1/d), d = 1..9 — embedded
#: as identical literals in BOTH dialects so every downstream float op
#: runs on bit-identical operands (no engine log10 in the query).
_BENFORD_P = (
    "0.301029995663981", "0.176091259055681", "0.1249387366083",
    "0.096910013008056", "0.079181246047625", "0.066946789630613",
    "0.057991946977687", "0.051152522447381", "0.045757490560675",
)
_BENFORD_CASE = "CASE d " + " ".join(
    f"WHEN {i + 1} THEN {p}" for i, p in enumerate(_BENFORD_P)
) + " END"


@query(
    "dq_benford_digits",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                         AS VARCHAR), 1, 1) AS INTEGER) AS d
      FROM orders
    ),
    counts AS (
      SELECT d, count(*) AS n_obs FROM digits GROUP BY d
    ),
    tot AS (SELECT sum(n_obs) AS n FROM counts)
    SELECT d, n_obs,
           round(CAST(n AS DOUBLE) * ({_BENFORD_CASE}), 6) AS n_expected,
           round((CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * ({_BENFORD_CASE}))
                 * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * ({_BENFORD_CASE}))
                 / (CAST(n AS DOUBLE) * ({_BENFORD_CASE})), 6) AS chi2_term
    FROM counts, tot
    """,
    tags=("dq", "benford"),
)
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit profile of order totals — the
    fraud/fabrication screen auditors run on financial facts: observed
    leading-digit counts vs n·log10(1+1/d), with the per-digit χ²
    contribution (a synthetic uniform price generator fails this
    spectacularly — which is itself the point: the operator SHOWS the
    deviation, the threshold is the analyst's).

    Determinism discipline: the leading digit comes from the INTEGER
    cents string (integer formatting is identical across engines;
    casting the raw double to string is not, and log10-of-data would
    hand the result to each engine's libm) — and the Benford
    probabilities are embedded as identical 15-digit literals in both
    dialects, so every float op runs on bit-identical operands. Plan:
    one map-side-combining 9-group aggregate + a broadcast scalar
    total; nothing else moves at any scale."""
    ev = load_table(spark, sf_dir, "orders", parallel=True)
    digits = ev.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(F.count("*").alias("n_obs"))
    tot = counts.agg(F.sum("n_obs").alias("n"))
    p_d = F.expr(_BENFORD_CASE)
    exp_n = F.col("n").cast("double") * p_d
    dev = F.col("n_obs").cast("double") - exp_n
    return counts.crossJoin(F.broadcast(tot)).select(
        "d",
        "n_obs",
        F.round(exp_n, 6).alias("n_expected"),
        F.round(dev * dev / exp_n, 6).alias("chi2_term"),
    )


# --- Distribution-drift monitor (chi-square, exact integers) -----------------

_DRIFT_ORACLE = """
    WITH ev AS (
      SELECT event_type,
             CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'
                  THEN 'base' ELSE 'cur' END AS period,
             CAST(floor(value) AS BIGINT) % 10 AS bucket
      FROM events
    ),
    cells AS (
      SELECT event_type, bucket,
             count(*) FILTER (period = 'base') + 1 AS b,
             count(*) FILTER (period = 'cur') AS o
      FROM ev GROUP BY event_type, bucket
    ),
    tots AS (
      SELECT event_type, CAST(sum(b) AS BIGINT) AS bt,
             CAST(sum(o) AS BIGINT) AS ot
      FROM cells GROUP BY event_type
    )
    SELECT c.event_type,
           CAST(sum(CAST(floor(
             CAST((c.o * t.bt - c.b * t.ot) AS DOUBLE)
             * (c.o * t.bt - c.b * t.ot)
             * 1000000 / (CAST(c.b AS DOUBLE) * t.ot * t.bt)
           ) AS BIGINT)) AS BIGINT) AS chi2_micros,
           CAST(min(t.ot) AS BIGINT) AS n_current
    FROM cells c JOIN tots t ON t.event_type = c.event_type
    GROUP BY c.event_type
"""


@query(
    "dq_drift_chi2",
    oracle=_DRIFT_ORACLE,
    tags=("dq", "drift"),
)
def dq_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor — the chi-square statistic between a
    baseline window (Jan 1-15) and the current window (Jan 16-30) of
    each series' value histogram, the production data-drift tripwire
    (chi-square chosen over PSI because PSI's ln is libm —
    engine-specific last-ulp rounding — while χ² = Σ(o−E)²/E is pure
    rational arithmetic: with E_i = b_i/B·O the per-bucket term is
    (o·B − b·O)²/(b·O·B), one double division of exact integers,
    FLOORED to micros and summed as longs so bucket order can't move
    the total). Laplace +1 on baseline buckets (the standard
    empty-cell guard — also what keeps the statistic defined when a
    bucket first appears). Plan: one partial-agg groupBy to the
    (series, bucket) grid — conditional counts split the periods in
    the SAME pass, no second scan — then dimension-sized totals
    broadcast back. At 100 TB only grid cells ever shuffle."""
    ev = load_table(spark, sf_dir, "events", parallel=True).select(
        "event_type",
        F.when(
            F.col("ts") < F.lit("2024-01-16").cast("timestamp"), "base"
        )
        .otherwise("cur")
        .alias("period"),
        (F.floor(F.col("value")).cast("long") % 10).alias("bucket"),
    )
    cells = ev.groupBy("event_type", "bucket").agg(
        (
            F.count(F.when(F.col("period") == "base", 1)) + 1
        ).alias("b"),
        F.count(F.when(F.col("period") == "cur", 1)).alias("o"),
    )
    tots = cells.groupBy("event_type").agg(
        F.sum("b").cast("long").alias("bt"),
        F.sum("o").cast("long").alias("ot"),
    )
    num = F.col("o") * F.col("bt") - F.col("b") * F.col("ot")
    term = F.floor(
        num.cast("double")
        * num
        * 1_000_000
        / (F.col("b").cast("double") * F.col("ot") * F.col("bt"))
    ).cast("long")
    return (
        cells.join(F.broadcast(tots), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(term).cast("long").alias("chi2_micros"),
            F.min("ot").cast("long").alias("n_current"),
        )
    )


# --- Referential-integrity audit ----------------------------------------------

_RI_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("events", "user_id", "customer", "c_custkey"),
)


def _ri_oracle() -> str:
    rows = []
    for child, ck, parent, pk in _RI_EDGES:
        rows.append(f"""
    SELECT '{child}.{ck}->{parent}.{pk}' AS constraint_name,
           (SELECT count(*) FROM {child}) AS n_child,
           (SELECT count(*) FROM {child} c
             WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                               WHERE p.{pk} = c.{ck})) AS n_orphan_child,
           (SELECT count(*) FROM {parent} p
             WHERE NOT EXISTS (SELECT 1 FROM {child} c
                               WHERE c.{ck} = p.{pk})) AS n_childless_parent
        """)
    return " UNION ALL ".join(rows)


@query(
    "dq_referential_integrity",
    oracle=_ri_oracle(),
    tags=("dq", "audit"),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key audit over the star schema's three edges: per
    constraint, child cardinality, orphan children (FK with no parent —
    the load-order bug) and childless parents (the q22-style inactive
    dimension rows). Each count is an ANTI join — Spark's own existence
    plan, never a row-multiplying outer join — and the childless side
    probes the DISTINCT child keys (map-side partial distinct), so the
    parent never joins the raw fact. At 100 TB every edge is an
    independent branch: keys-only column pruning at the scan, AQE picks
    broadcast vs shuffle per edge from the real key counts."""
    out = None
    for child, ck, parent, pk in _RI_EDGES:
        c = load_table(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = load_table(spark, sf_dir, parent).select(F.col(pk).alias("k"))
        n_child = c.agg(F.count("*").alias("n_child"))
        orphan = c.join(p, "k", "left_anti").agg(
            F.count("*").alias("n_orphan_child")
        )
        childless = p.join(c.distinct(), "k", "left_anti").agg(
            F.count("*").alias("n_childless_parent")
        )
        row = (
            n_child.crossJoin(orphan)
            .crossJoin(childless)
            .select(
                F.lit(f"{child}.{ck}->{parent}.{pk}").alias("constraint_name"),
                "n_child",
                "n_orphan_child",
                "n_childless_parent",
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


# --- IQR outlier fences ---------------------------------------------------------

_IQR_ORACLE = """
    WITH x AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ),
    ranked AS (
      SELECT flag, cents,
             row_number() OVER (PARTITION BY flag ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY flag) AS n
      FROM x
    ),
    fences AS (
      SELECT flag,
             max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
                      THEN cents END) AS q1,
             max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT)
                      THEN cents END) AS q3,
             CAST(max(n) AS BIGINT) AS n
      FROM ranked GROUP BY flag
    )
    SELECT x.flag, min(f.n) AS n, min(f.q1) AS q1_cents, min(f.q3) AS q3_cents,
           CAST(sum(CASE WHEN 2 * x.cents < 2 * f.q1 - 3 * (f.q3 - f.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(sum(CASE WHEN 2 * x.cents > 2 * f.q3 + 3 * (f.q3 - f.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM x JOIN fences f ON f.flag = x.flag
    GROUP BY x.flag
"""


@query("dq_outlier_iqr", oracle=_IQR_ORACLE, tags=("dq", "statistics"))
def dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier profile per group: Q1/Q3 as DISCRETE
    percentiles (rank ceil(p·n) — actual data values, the convention
    agg_percentile_disc already certified against DuckDB), then count
    rows outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR]. The 1.5 factor never
    touches floats: the test is doubled to 2x < 2·Q1 − 3·IQR — pure
    int64 — so the outlier COUNT is exact, not approximately exact.
    Complement to dq_anomaly_mad_window (time-local, MAD) — this is the
    distribution-global fence batch profiling uses. Plan: one exchange
    on flag shared by the ranking window, then 3-row fences broadcast
    back onto the cents rows for a map-side count. The rank-based
    quantile is the fixture path; at 100 TB swap in the two-pass
    histogram narrowing (agg_percentile_narrowed) to find Q1/Q3 without
    a per-group sort — the fence arithmetic is unchanged."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem", parallel=True)
    x = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("flag").orderBy("cents")
    wp = Window.partitionBy("flag")
    ranked = x.select(
        "flag",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wp).alias("n"),
    )
    fences = ranked.groupBy("flag").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.25 * F.col("n")).cast("long"),
                F.col("cents"),
            )
        ).alias("q1"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.75 * F.col("n")).cast("long"),
                F.col("cents"),
            )
        ).alias("q3"),
        F.max("n").cast("long").alias("n"),
    )
    f = F.broadcast(fences)
    j = x.join(f, "flag")
    return j.groupBy("flag").agg(
        F.min("n").alias("n"),
        F.min("q1").alias("q1_cents"),
        F.min("q3").alias("q3_cents"),
        F.sum(
            F.when(
                2 * F.col("cents") < 2 * F.col("q1") - 3 * (F.col("q3") - F.col("q1")),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_low"),
        F.sum(
            F.when(
                2 * F.col("cents") > 2 * F.col("q3") + 3 * (F.col("q3") - F.col("q1")),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_high"),
    )


# --- Single-pass column profiler ------------------------------------------------

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def _profile_oracle() -> str:
    aggs = ", ".join(
        f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS null_{c}, CAST(count(DISTINCT {c}) AS BIGINT) AS dist_{c}"
        for c in _PROFILE_COLS
    )
    arms = " UNION ALL ".join(
        f"SELECT '{c}' AS column_name, n_rows, null_{c} AS n_null,"
        f" dist_{c} AS n_distinct,"
        f" round((n_rows - null_{c}) / CAST(n_rows AS DOUBLE), 6) AS fill_rate"
        f" FROM wide"
        for c in _PROFILE_COLS
    )
    return f"WITH wide AS (SELECT count(*) AS n_rows, {aggs} FROM orders) {arms}"


@query("dq_column_profile", oracle=_profile_oracle(), tags=("dq", "profile"))
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler: per column, null count, EXACT
    distinct count, fill rate — the first query every onboarding of an
    unknown table runs. All six columns profile in ONE scan: Spark
    plans the multi-distinct aggregate with an Expand (row × distinct
    streams), which trades one extra map-side blow-up for never
    re-reading the fact — at 100 TB, 6 scans of a 10 TB table vs one
    Expand is not a close call. The wide 1-row result then unpivots to
    the long (column, metric) form tooling expects via a LocalRelation
    union — driver-side zero-cost. Swap countDistinct for
    approx_count_distinct when exactness is not contractual (the
    profile's scale relief valve; agg_approx_users shows the parity
    treatment)."""
    o = load_table(spark, sf_dir, "orders", parallel=True)
    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"null_{c}")
        )
        aggs.append(F.countDistinct(c).cast("long").alias(f"dist_{c}"))
    wide = o.agg(*aggs)
    # one stack() projection over the single 1-row aggregate — a unionAll
    # of per-column projections would copy the aggregate subtree (and its
    # scan) once per column
    arms = ", ".join(
        f"'{c}', null_{c}, dist_{c},"
        f" round((n_rows - null_{c}) / CAST(n_rows AS DOUBLE), 6)"
        for c in _PROFILE_COLS
    )
    return wide.select(
        "n_rows",
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {arms})"
            " AS (column_name, n_null, n_distinct, fill_rate)"
        ),
    ).select("column_name", "n_rows", "n_null", "n_distinct", "fill_rate")


@query(
    "dq_volume_by_month",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY month
    ),
    ranked AS (
      SELECT month, n,
             row_number() OVER (ORDER BY n, month) AS rn,
             count(*) OVER () AS cnt,
             CAST(sum(n) OVER () AS BIGINT) AS tot
      FROM m
    ),
    med AS (
      SELECT max(CASE WHEN rn = CAST(ceil(0.5 * cnt) AS BIGINT)
                      THEN n END) AS median_n
      FROM ranked
    )
    SELECT month, n,
           round(CAST(n AS DOUBLE) / tot, 6) AS share,
           CASE WHEN 2 * n < median_n THEN 1 ELSE 0 END AS low_volume
    FROM ranked CROSS JOIN med
    """,
    tags=("dq", "volume"),
)
def dq_volume_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-volume monitor: monthly row counts with corpus share and a
    LOW-VOLUME flag for months under half the median month — the
    partition-died-upstream alarm every scheduled loader needs (an
    absolute threshold goes stale as the business grows; the
    median-relative one doesn't). Median via the rank-ceil form over
    the ~84-month table, compared in doubled integers (2n < median —
    no 0.5 float) via a second global frame over the SAME ranked table —
    a separate aggregate branch would rescan the fact (caught by the
    plan pin). One fact-sized exchange total."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(F.count("*").alias("n"))
    w = Window.orderBy("n", "month")
    wg = Window.partitionBy()
    ranked = m.select(
        "month",
        "n",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wg).alias("cnt"),
        F.sum("n").over(wg).cast("long").alias("tot"),
    )
    median_n = F.max(
        F.when(
            F.col("rn") == F.ceil(0.5 * F.col("cnt")).cast("long"),
            F.col("n"),
        )
    ).over(wg)
    return ranked.select(
        "month",
        "n",
        F.round(F.col("n").cast("double") / F.col("tot"), 6).alias("share"),
        F.when(2 * F.col("n") < median_n, 1).otherwise(0).alias("low_volume"),
    )


# --- Primary-key uniqueness audit -----------------------------------------------

_PK_CHECKS = (
    ("lineitem", ("l_orderkey", "l_linenumber")),
    ("orders", ("o_orderkey",)),
    ("orders", ("o_custkey",)),  # deliberately NON-unique: shows violations
)


def _pk_oracle() -> str:
    arms = []
    for table, cols in _PK_CHECKS:
        key = ", ".join(cols)
        arms.append(f"""
    SELECT '{table}({key})' AS key_name,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_keys,
           CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
             AS n_rows_in_dups,
           max(c) AS max_multiplicity
    FROM (SELECT count(*) AS c FROM {table} GROUP BY {key})
        """)
    return " UNION ALL ".join(arms)


@query("dq_pk_uniqueness", oracle=_pk_oracle(), tags=("dq", "audit"))
def dq_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-uniqueness audit: per declared key, how many key values,
    how many are duplicated, how many rows sit inside duplicate groups,
    and the worst multiplicity — the dedup-BEFORE-merge check (a MERGE
    against a non-unique key silently multiplies rows; this is the
    query that catches it first). The third check (orders.o_custkey) is
    deliberately a NON-key so the violation columns are exercised with
    real numbers, not all-zeros. Each check is one partial-agg groupBy
    on its key + a 5-number rollup; branches are independent and
    AQE-sized."""
    out = None
    for table, cols in _PK_CHECKS:
        t = load_table(spark, sf_dir, table)
        g = t.groupBy(*[F.col(c) for c in cols]).agg(F.count("*").alias("c"))
        row = g.agg(
            F.count("*").alias("n_keys"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_keys"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_rows_in_dups"),
            F.max("c").alias("max_multiplicity"),
        ).select(
            F.lit(f"{table}({', '.join(cols)})").alias("key_name"),
            "n_keys",
            "n_dup_keys",
            "n_rows_in_dups",
            "max_multiplicity",
        )
        out = row if out is None else out.unionAll(row)
    return out


@query(
    "dq_reconcile_orders_lineitem",
    oracle="""
    WITH o AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY month
    ),
    l AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders_in_items,
             CAST(count(*) AS BIGINT) AS n_lineitems
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY month
    )
    SELECT o.month, o.n_orders,
           coalesce(l.n_orders_in_items, 0) AS n_orders_in_items,
           coalesce(l.n_lineitems, 0) AS n_lineitems,
           o.n_orders - coalesce(l.n_orders_in_items, 0) AS n_headerless,
           CASE WHEN o.n_orders = coalesce(l.n_orders_in_items, 0)
                THEN 1 ELSE 0 END AS reconciled
    FROM o LEFT JOIN l ON l.month = o.month
    """,
    tags=("dq", "reconciliation"),
)
def dq_reconcile_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header↔detail reconciliation by month: every order header should
    appear in the lineitem detail — the load-completeness check finance
    closes books with (dq_referential_integrity answers 'are there
    orphans, ever'; this answers 'WHICH month broke', which is what the
    re-run targets). Month attribution of detail rows comes from the
    header join so both sides bucket identically; exact distinct order
    counts per month, LEFT join keeps header-only months visible, the
    verdict is integer equality. Two partial-agg rollups + one
    month-count-sized join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem", parallel=True)
    om = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(F.count("*").cast("long").alias("n_orders"))
    lm = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.countDistinct("l_orderkey").cast("long").alias(
                "n_orders_in_items"
            ),
            F.count("*").cast("long").alias("n_lineitems"),
        )
    )
    j = om.join(lm, "month", "left")
    in_items = F.coalesce(F.col("n_orders_in_items"), F.lit(0))
    return j.select(
        "month",
        "n_orders",
        in_items.alias("n_orders_in_items"),
        F.coalesce(F.col("n_lineitems"), F.lit(0)).alias("n_lineitems"),
        (F.col("n_orders") - in_items).alias("n_headerless"),
        F.when(F.col("n_orders") == in_items, 1).otherwise(0).alias(
            "reconciled"
        ),
    )


@query(
    "dq_slo_attainment",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS g
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_gaps,
           round(CAST(sum(CASE WHEN g <= 60000000 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS within_1m,
           round(CAST(sum(CASE WHEN g <= 600000000 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS within_10m,
           round(CAST(sum(CASE WHEN g <= 3600000000 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS within_1h
    FROM gaps WHERE g IS NOT NULL
    GROUP BY event_type
    """,
    tags=("dq", "slo"),
)
def dq_slo_attainment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO attainment bands: the share of inter-event gaps within each
    latency objective (1 m / 10 m / 1 h), per event type — the
    INVERSE framing of a latency percentile (percentiles answer 'what
    latency covers 99%?'; SLOs answer 'what share meets the target?' —
    the number an error budget burns against, computable in ONE
    conditional-count pass with no ranking at all). Exact integer gap
    tests, ratios of exact counts; one per-user sort shared with every
    other gap operator, then a partial-agg rollup."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (
            F.unix_micros(F.col("ts"))
            - F.lag(F.unix_micros(F.col("ts"))).over(w)
        ).alias("g"),
    ).filter(F.col("g").isNotNull())

    def band(us: int, alias: str):
        return F.round(
            F.sum(F.when(F.col("g") <= us, 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias(alias)

    return gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        band(60_000_000, "within_1m"),
        band(600_000_000, "within_10m"),
        band(3_600_000_000, "within_1h"),
    )


# --- Order-independent content checksums ----------------------------------------

_CKSUM_TABLES = (
    ("orders", "CAST(o_orderkey AS STRING) || '|' || o_orderstatus || '|' ||"
               " CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING)"),
    ("customer", "CAST(c_custkey AS STRING) || '|' || c_mktsegment"),
    ("part", "CAST(p_partkey AS STRING) || '|' || p_brand"),
)


def _cksum_oracle() -> str:
    arms = []
    for t, expr in _CKSUM_TABLES:
        arms.append(f"""
    SELECT '{t}' AS table_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(('0x' || substr(md5({expr}), 1, 12))::BIGINT
                         AS HUGEINT)) % 9223372036854775807 AS BIGINT)
             AS content_checksum
    FROM {t}
        """)
    return " UNION ALL ".join(arms)


def content_checksum(df: DataFrame, render_expr: str) -> DataFrame:
    """Library primitive (r8 pass 4): order/partitioning-independent
    content checksum of ANY DataFrame — SUM of 48-bit md5 prefixes over
    the caller's canonical row rendering (a SQL expression producing one
    string per row), reduced mod 2⁶³−1. Equal row MULTISETS give equal
    checksums under any order, because addition is the associative,
    commutative combine. The sum accumulates in decimal(38,0) and only
    the final modulus lands in int64: the r8 sf0.1 measuring run caught
    the plain BIGINT sum overflowing under ANSI mode at just 150k rows
    (avg 48-bit value ≈ 1.4e14; ~65k rows is the real int64 budget — the
    old "safe to 10⁹ rows" note was arithmetic fiction). decimal(38,0)
    holds ~7×10²³ rows; the mod keeps the full per-row entropy. Returns
    one row (n_rows, content_checksum). The rendering is part of the
    contract: include every column that must match, pin float/money
    columns to fixed-point first (dq_content_checksum's table renderings
    are the model)."""
    return df.select(
        F.conv(F.substring(F.md5(F.expr(render_expr)), 1, 12), 16, 10)
        .cast("long")
        .alias("h")
    ).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.expr(
            "CAST(sum(CAST(h AS DECIMAL(38,0))) % 9223372036854775807"
            " AS BIGINT)"
        ).alias("content_checksum"),
    )


@query("dq_content_checksum", oracle=_cksum_oracle(), tags=("dq", "checksum"))
def dq_content_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content checksum per table: SUM of a 48-bit
    md5 prefix over a canonical row rendering — equal multisets of
    rows give equal checksums under ANY partitioning or row order,
    which is exactly what replica/migration verification needs (a
    concatenation checksum would be order-dependent; a full sort to
    canonicalize would cost a global sort per table). Addition is the
    associative combine; the sum accumulates in decimal(38,0)/HUGEINT
    and reduces mod 2⁶³−1 at the end (r8 fix: the original BIGINT sum
    claimed "safe to 10⁹ rows" but overflowed ANSI int64 at sf0.1's
    150k orders — 48-bit values budget only ~65k rows in int64), and
    the row rendering pins the same fixed-point money convention as
    every oracle. This checksum IS how the parity gate's own value-hash
    works, promoted to a user-facing operator (core exported as
    :func:`content_checksum`, library pass 4)."""
    out = None
    for t, expr in _CKSUM_TABLES:
        row = content_checksum(load_table(spark, sf_dir, t), expr).select(
            F.lit(t).alias("table_name"), "n_rows", "content_checksum"
        )
        out = row if out is None else out.unionAll(row)
    return out
