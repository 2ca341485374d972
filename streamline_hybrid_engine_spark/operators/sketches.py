"""Count-min sketch heavy hitters — the frequency-sketch family member.

The reference's sketch aggregates are covered by agg_approx_users /
agg_approx_percentile / agg_hll_merge (operators/aggregates.py, error-bound
oracles). This module adds the FREQUENCY sketch: a count-min sketch built
distributively, probed for heavy hitters. Unlike the HLL/KLL rows (whose
Spark-internal sketches DuckDB cannot replay, hence error-bound oracles),
CMS is defined entirely by its hash functions — and with the repo's
portable 48-bit md5 convention (llm/text.py train-split family) the SAME
sketch is computable in DuckDB SQL, so the oracle is EXACT: every cell
count, every estimate, every overcount integer-identical cross-engine.

Scale design (100 TB): the sketch build is ONE aggregation whose key space
is d·w cells (4·256 = 1024 rows here, tunable) — map-side partial
aggregation collapses each executor's slice to ≤1024 rows before the
shuffle regardless of input size; that is the whole point of CMS over an
exact groupBy at scale: the shuffle is O(d·w), not O(distinct keys). The
probe joins the candidate keys (distinct, or a provided watchlist) against
the tiny cell table — broadcast-sized by construction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from streamline_hybrid_engine_spark.catalog import load_table
from streamline_hybrid_engine_spark.registry import query

#: sketch geometry — depth (independent hash rows) × width (cells per row).
#: ε ≈ e/w ≈ 1.06%, δ ≈ e^-d ≈ 1.8% at these settings.
CMS_DEPTH = 4
CMS_WIDTH = 256


def _spark_cell(i: int, key_expr: str) -> str:
    """48-bit md5 bucket of (seed i, key) — Spark SQL side."""
    return (
        f"pmod(cast(conv(substr(md5(concat('cms', '{i}', ':', {key_expr})),"
        f" 1, 12), 16, 10) as bigint), {CMS_WIDTH})"
    )


def _duck_cell(i: int, key_expr: str) -> str:
    """Same bucket, DuckDB dialect (conv() is Spark-only)."""
    return (
        f"(('0x' || substr(md5('cms' || '{i}' || ':' || {key_expr}), 1, 12))"
        f"::BIGINT % {CMS_WIDTH})"
    )


_ORACLE = f"""
    WITH keyed AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
         cells AS (
           {" UNION ALL ".join(
               f"SELECT {i} AS i, {_duck_cell(i, 'k')} AS cell,"
               f" count(*) AS cnt FROM keyed GROUP BY 2"
               for i in range(CMS_DEPTH)
           )}
         ),
         exact AS (SELECT k, count(*) AS exact_cnt FROM keyed GROUP BY k),
         probes AS (
           SELECT k, exact_cnt, i, {_duck_cell("' || CAST(i AS VARCHAR) || '", "k")} AS cell
           FROM exact, (SELECT unnest(range({CMS_DEPTH})) AS i)
         ),
         est AS (
           SELECT p.k, p.exact_cnt, min(c.cnt) AS cms_est
           FROM probes p JOIN cells c ON c.i = p.i AND c.cell = p.cell
           GROUP BY p.k, p.exact_cnt
         )
    SELECT CAST(k AS BIGINT) AS user_id, cms_est, exact_cnt,
           cms_est - exact_cnt AS overcount
    FROM est
    ORDER BY cms_est DESC, user_id
    LIMIT 15
"""


@query("agg_cms_heavy_hitters", oracle=_ORACLE, tags=("aggregates", "sketch"))
def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a count-min sketch: build a d×w cell table over
    event user ids, probe every candidate key, rank by estimate.

    CMS guarantees est ≥ exact (only hash collisions inflate) — the
    ``overcount`` column exposes the error and the oracle checks it
    exactly, because both engines compute the identical md5-derived
    sketch (module doc). Build shuffle is O(d·w) thanks to map-side
    partials (test-pinned); the probe side here is the distinct keys
    (so the result can also show exact counts — at 100 TB you'd probe a
    watchlist instead and skip the exact branch entirely). Top-15 cut is
    total-ordered (estimate desc, then key)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    # build: one pass, posexplode to (i, cell), partial-agg to <=d*w rows
    cell_arr = F.array(
        *[F.expr(_spark_cell(i, "k")) for i in range(CMS_DEPTH)]
    )
    cells = (
        ev.select(F.posexplode(cell_arr).alias("i", "cell"))
        .groupBy("i", "cell")
        .agg(F.count("*").alias("cnt"))
    )
    # probe: distinct keys with exact counts, re-derive each row's cell
    exact = ev.groupBy("k").agg(F.count("*").alias("exact_cnt"))
    probes = exact.select(
        "k",
        "exact_cnt",
        F.posexplode(cell_arr).alias("i", "cell"),
    )
    est = (
        probes.join(F.broadcast(cells), ["i", "cell"])
        .groupBy("k", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return (
        est.select(
            F.col("k").cast("bigint").alias("user_id"),
            "cms_est",
            "exact_cnt",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
        )
        .orderBy(F.desc("cms_est"), "user_id")
        .limit(15)
    )


#: theta sketch: keep keys whose 48-bit md5 hash falls below 2^48 / RATE —
#: a fixed-threshold KMV. 1/16 sampling ≈ RSE 1/sqrt(kept) ≈ 11% on the
#: fixture's ~1.3k-distinct sets.
THETA_RATE = 16
THETA_MAX = 1 << 48


@query(
    "agg_theta_sketch_ops",
    oracle=f"""
    WITH keysets AS (
      SELECT o_custkey AS k,
             max(CASE WHEN o_orderpriority = '1-URGENT'
                       AND o_totalprice > 250000 THEN 1 ELSE 0 END) AS a,
             max(CASE WHEN o_totalprice > 420000 THEN 1 ELSE 0 END) AS b
      FROM orders GROUP BY o_custkey
    ),
    flagged AS (
      SELECT a, b,
             CASE WHEN ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 12))::BIGINT
                       < {THETA_MAX // THETA_RATE} THEN 1 ELSE 0 END AS kept
      FROM keysets WHERE a = 1 OR b = 1
    )
    SELECT CAST(sum(kept * a) * {THETA_RATE} AS BIGINT) AS est_a,
           CAST(sum(kept * b) * {THETA_RATE} AS BIGINT) AS est_b,
           CAST(sum(kept) * {THETA_RATE} AS BIGINT) AS est_union,
           CAST(sum(kept * a * b) * {THETA_RATE} AS BIGINT) AS est_intersect,
           CAST(sum(kept * a * (1 - b)) * {THETA_RATE} AS BIGINT) AS est_a_minus_b,
           CAST(sum(a) AS BIGINT) AS exact_a,
           CAST(sum(b) AS BIGINT) AS exact_b
    FROM flagged
    """,
    tags=("aggregates", "sketch"),
)
def agg_theta_sketch_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/KMV sketch SET ALGEBRA: distinct-count estimates for A, B,
    A∪B, A∩B and A∖B from fixed-threshold hash samples — the capability
    that separates theta sketches from HLL (agg_hll_merge unions, but
    cannot intersect or subtract). A = urgent-order customers, B =
    big-ticket customers (predicates chosen so neither set saturates the
    ~10-orders-per-customer fixture and the intersection is genuinely
    partial); a sketch is the set of kept 48-bit md5 key
    hashes (kept iff hash < 2^48/16), so sketch ops ARE set ops on kept
    hashes and every estimate is a kept-count × 16.

    Like the CMS row, the portable-md5 convention makes the ENTIRE
    sketch replayable in DuckDB — the oracle checks exact estimator
    values, not error bounds. Plan: ONE pass — per-key membership flags
    via groupBy(custkey) max (the only wide shuffle, and it is the
    exact-distinct both sets share), then every estimate AND both exact
    cardinalities fall out of a single global aggregate over flag
    products (the first cut ran 7 separate agg jobs + crossJoins;
    fusing them measured 1.74 s → ~0.6 s at sf0.1). At 100 TB you'd
    tighten theta (rate 2^14+) so sketches stay KBs; the exact columns
    ride along to make estimator error visible in the artifact."""
    o = load_table(spark, sf_dir, "orders", parallel=True)
    keysets = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.max(
            F.when(
                (F.col("o_orderpriority") == "1-URGENT")
                & (F.col("o_totalprice") > 250000),
                1,
            ).otherwise(0)
        ).alias("a"),
        F.max(F.when(F.col("o_totalprice") > 420000, 1).otherwise(0)).alias("b"),
    )
    h = "cast(conv(substr(md5(cast(k as string)), 1, 12), 16, 10) as bigint)"
    flagged = keysets.filter((F.col("a") == 1) | (F.col("b") == 1)).select(
        "a",
        "b",
        F.when(F.expr(h) < THETA_MAX // THETA_RATE, 1).otherwise(0).alias("kept"),
    )
    r = THETA_RATE
    return flagged.agg(
        (F.sum(F.col("kept") * F.col("a")) * r).alias("est_a"),
        (F.sum(F.col("kept") * F.col("b")) * r).alias("est_b"),
        (F.sum("kept") * r).alias("est_union"),
        (F.sum(F.col("kept") * F.col("a") * F.col("b")) * r).alias("est_intersect"),
        (F.sum(F.col("kept") * F.col("a") * (1 - F.col("b"))) * r).alias(
            "est_a_minus_b"
        ),
        F.sum("a").alias("exact_a"),
        F.sum("b").alias("exact_b"),
    )
