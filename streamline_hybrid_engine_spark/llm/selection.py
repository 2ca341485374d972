"""Data-selection operators: importance weighting and quality bucketing.

The two ids here are the corpus-SELECTION half of the LLM-pipeline
mandate that the scoring family (llm/text.py) feeds: given per-doc
quality/importance signals, decide WHAT to train on and HOW MUCH of it.

- ``llm_importance_dsir`` — hashed-ngram importance weights for
  target-domain data selection (DSIR, Xie et al. 2023, "Data Selection
  for Language Models via Importance Resampling", NeurIPS): weight each
  document by the log-likelihood ratio of a target-domain unigram model
  over a raw-corpus unigram model, both estimated on hashed token
  buckets so the method is vocabulary-free and the model is a
  fixed-width table.
- ``llm_perplexity_buckets`` — CCNet-style (Wenzek et al. 2020)
  head/middle/tail quality terciles per language over a per-document
  LM score, the bucketing used to stage pretraining corpora.

Determinism discipline (registry conventions): md5-derived bucket
hashes (engine-portable, vs Spark's murmur3 ``hash()`` which DuckDB
lacks); all scores are exact integer arithmetic — bit-length log2
(``length(bin(x)) - 1``) instead of libm ``log``, decimal(38,0)
accumulators where products can pass int64 at 100 TB, and NO negative
integer division anywhere (Spark ``div`` truncates toward zero while
engines differ on floor-vs-truncate for negatives, so the contract
avoids the case entirely).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from ..registry import query

#: Hashed-unigram model width for DSIR. 128 buckets keeps per-bucket
#: counts dense at fixture scale; at 100 TB the width only changes the
#: size of the broadcast score table (B rows), never a shuffle.
DSIR_BUCKETS = 128

#: The "target domain" predicate: a fixed source allowlist (the fixture
#: generator emits sources src0..src19 at every sf). In production this
#: is the high-quality seed corpus (e.g. Wikipedia) DSIR upweights
#: toward.
DSIR_TARGET = ("src0", "src1", "src2", "src3")

_T_SQL = ", ".join(f"'{s}'" for s in DSIR_TARGET)

# Fixed-point log-likelihood-ratio score for one hash bucket, shared
# shape between engines. With Laplace-smoothed unigram models
#   p_t(b) = (c_t+1)/(N_t+B),  p_r(b) = (c_r+1)/(N_r+B)
# the true score is log2(p_t/p_r) = log2(num/den) with
# num = (c_t+1)(N_r+B), den = (c_r+1)(N_t+B). A floor-ilog2 of the
# quotient is useless here — target and raw token distributions differ
# by FRACTIONS of a bit per bucket, so every score floors to 0 (first
# cut did exactly that: 500/500 docs scored 0). Sub-bit resolution with
# ZERO libm (the registry's Benford/geo/surprisal policy — engine libm
# log() differs in the last ulp) comes from the classic integer
# squaring algorithm, Q8 fixed point (units of 1/256 bit):
#
#   sign = +1 if num >= den else -1        (score is antisymmetric-ish;
#   q  = (big·2^16) div small, clamped to [2^16, 2^60]   floor effects
#   e  = ilog2(q)                           are pinned per branch)
#   m  = (q·2^16) div 2^e                  -- mantissa in [2^16, 2^17)
#   8×: m = m² div 2^16; bit = m >= 2^17; f = 2f+bit; m = m div 2^bit
#   score_q8 = sign · (256·(e−16) + f)     -- |err| < 1/256 bit
#
# Every step is exact integer arithmetic (products ride decimal(38,0)/
# HUGEINT where they can pass int64 — c <= N ~ 1e14 tokens at 100 TB
# puts num near 1e28; the mantissa loop itself stays under 2^34). The
# 2^60 clamp saturates the score at ±(44·256) q8 — beyond any real
# likelihood ratio — so ilog2/shift inputs always fit int64.

_LOG2_STEPS = 8  # Q8: 1/256-bit resolution
_SAT = 1 << 60


def _dsir_ratio_sql(decimal_cast: str, intdiv: str) -> tuple[str, str]:
    """(sign, q) SQL for one engine. ``decimal_cast`` formats a column
    into the engine's wide-integer type; ``intdiv`` is the integral
    division operator.

    Saturation is decided BEFORE the fixed-point division ever runs:
    ratio >= 2^44  ⟺  big div 2^44 >= small (exact for integer small),
    and big div 2^44 always fits int64. The first cut clamped AFTER —
    ``least((big·2^16) div small, 2^60)`` — and the hypothesis fuzz
    caught it immediately: Spark's decimal ``div`` returns LONG and
    silently WRAPS past int64 even under ANSI (observed: quotient
    9.224e18 → −9.223e18), so the clamp compared against a negative
    and the score came out wrong by 3 bits. Wrap-before-clamp is a
    class, not a one-off: never bound an integer expression after the
    operation that can overflow it."""
    b = DSIR_BUCKETS
    num = f"({decimal_cast.format('c_t')} + 1) * ({decimal_cast.format('n_r')} + {b})"
    den = f"({decimal_cast.format('c_r')} + 1) * ({decimal_cast.format('n_t')} + {b})"
    sign = f"CASE WHEN {num} >= {den} THEN 1 ELSE -1 END"
    big = f"greatest({num}, {den})"
    small = f"least({num}, {den})"
    q = (
        f"CASE WHEN ({big}) {intdiv} {1 << 44} >= {small} THEN {_SAT}"
        f" ELSE CAST(({big} * 65536) {intdiv} {small} AS BIGINT) END"
    )
    return sign, q


def _spark_log2_q8(df: DataFrame, q: str) -> DataFrame:
    """Append column ``lq8`` = Q8 fixed-point log2(q / 2^16), q >= 2^16."""
    df = df.withColumn("e", F.expr(f"length(bin({q})) - 1")).withColumn(
        "m",
        F.expr(f"cast((cast({q} as decimal(38,0)) * 65536)"
               " div shiftleft(cast(1 as bigint), e) as bigint)"),
    ).withColumn("f", F.lit(0))
    for _ in range(_LOG2_STEPS):
        df = (
            df.withColumn("m", F.expr("(m * m) div 65536"))
            .withColumn("f", F.expr("f * 2 + CASE WHEN m >= 131072 THEN 1 ELSE 0 END"))
            .withColumn("m", F.expr("CASE WHEN m >= 131072 THEN m div 2 ELSE m END"))
        )
    return df.withColumn("lq8", F.expr("256 * (e - 16) + f"))


def _duck_log2_q8_ctes(src: str) -> str:
    """CTE chain appending ``lq8`` to rows of ``src`` (needs sign, q)."""
    ctes = [
        f"lg0 AS (SELECT *, length(bin(q)) - 1 AS e,"
        f" CAST((q::HUGEINT * 65536) // (1::BIGINT << (length(bin(q)) - 1))"
        f" AS BIGINT) AS m, 0 AS f FROM {src})"
    ]
    for k in range(_LOG2_STEPS):
        ctes.append(
            f"lg{k + 1} AS (SELECT * REPLACE ("
            " CASE WHEN (m * m) // 65536 >= 131072"
            "  THEN ((m * m) // 65536) // 2 ELSE (m * m) // 65536 END AS m,"
            " f * 2 + CASE WHEN (m * m) // 65536 >= 131072"
            f"  THEN 1 ELSE 0 END AS f) FROM lg{k})"
        )
    ctes.append(
        f"lgf AS (SELECT *, 256 * (e - 16) + f AS lq8 FROM lg{_LOG2_STEPS})"
    )
    return ",\n    ".join(ctes)


_DUCK_SIGN, _DUCK_Q = _dsir_ratio_sql("{0}::HUGEINT", "//")
_SPARK_SIGN, _SPARK_Q = _dsir_ratio_sql("cast({0} as decimal(38,0))", "div")


def bucketize_tokens(
    docs: DataFrame, target: F.Column | None = None
) -> DataFrame:
    """(doc_id, is_t, b) token rows for ANY frame with (doc_id, text) —
    the shared front half of the batch query and its streaming face
    (works on a streaming DataFrame unchanged: explode + projection
    only). ``target`` marks target-domain rows; None uses the registry
    fixture predicate (source ∈ DSIR_TARGET, requires a source column)."""
    if target is None:
        target = F.col("source").isin(*DSIR_TARGET)
    toks = docs.select(
        "doc_id",
        target.alias("is_t"),
        F.explode(F.split("text", " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    return toks.select(
        "doc_id",
        "is_t",
        F.expr(
            "cast(conv(substr(md5(concat('dsir|', tok)), 1, 6), 16, 10)"
            f" as bigint) % {DSIR_BUCKETS}"
        ).alias("b"),
    )


def dsir_score_table(
    docs: DataFrame, target: F.Column | None = None
) -> DataFrame:
    """The DSIR "model": the B-row (b, score_q8) table fit on a STATIC
    documents frame (any frame with doc_id, text and a target
    predicate). Broadcast-sized by construction; the streaming face
    attaches it to a document stream per micro-batch."""
    cells = bucketize_tokens(docs, target).groupBy("b").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).cast("long").alias("c_t"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(1)).cast("long").alias("c_r"),
    )
    # totals as a window over the B-row cell table, NOT a separate
    # aggregate: Catalyst does not share subplans across join branches,
    # so cells.agg(...).crossJoin(cells) re-ran the corpus explode a
    # third time (.explain showed 3 parquet scans; 2 is the minimum —
    # doc-level tfs and bucket cells genuinely need one each). The
    # unpartitioned window is the documented metadata-sized valve: it
    # sorts B rows, never corpus data.
    w_all = Window.partitionBy()
    ratio = cells.select(
        "b",
        "c_t",
        "c_r",
        F.sum("c_t").over(w_all).cast("long").alias("n_t"),
        F.sum("c_r").over(w_all).cast("long").alias("n_r"),
    ).select(
        "b",
        F.expr(_SPARK_SIGN).alias("sign"),
        F.expr(_SPARK_Q).alias("q"),
    )
    return _spark_log2_q8(ratio, "q").select(
        "b", (F.col("sign") * F.col("lq8")).alias("score_q8")
    )


@query(
    "llm_importance_dsir",
    oracle=f"""
    WITH tb AS (
      SELECT doc_id,
             source IN ({_T_SQL}) AS is_t,
             ('0x' || substr(md5('dsir|' || tok), 1, 6))::BIGINT
               % {DSIR_BUCKETS} AS b
      FROM (SELECT doc_id, source,
                   unnest(string_split(text, ' ')) AS tok
            FROM documents)
      WHERE tok <> ''
    ),
    cells AS (
      SELECT b,
             CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
             CAST(sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS c_r
      FROM tb GROUP BY b
    ),
    tot AS (
      SELECT CAST(sum(c_t) AS BIGINT) AS n_t,
             CAST(sum(c_r) AS BIGINT) AS n_r
      FROM cells
    ),
    ratio AS (
      SELECT b, {_DUCK_SIGN} AS sign, {_DUCK_Q} AS q
      FROM cells CROSS JOIN tot
    ),
    {_duck_log2_q8_ctes("ratio")},
    scored AS (SELECT b, sign * lq8 AS score_q8 FROM lgf),
    doc_b AS (
      SELECT doc_id, b, CAST(count(*) AS BIGINT) AS tf
      FROM tb GROUP BY doc_id, b
    )
    SELECT d.doc_id,
           CAST(sum(d.tf) AS BIGINT) AS n_tokens,
           CAST(sum(d.tf * s.score_q8) AS BIGINT) AS dsir_q8
    FROM doc_b d JOIN scored s ON s.b = d.b
    GROUP BY d.doc_id
    """,
    tags=("llm", "selection"),
)
def llm_importance_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): score every document
    by how much more likely its tokens are under a TARGET-domain
    hashed-unigram model than under the RAW-corpus model —
    ``dsir_q8 = Σ_b tf_b · log2-ratio_q8(b)`` over the doc's hash
    buckets, in Q8 fixed point (1/256 bit). Positive ⇒ target-like
    (upsample), negative ⇒ raw-like. This is the data-mixing primitive
    behind importance-resampled pretraining corpora: downstream,
    resample with probability ∝ 2^(dsir_q8/256) (or threshold) to tilt
    a 100 TB crawl toward the seed domain.

    Vocabulary-free by construction (the hashing trick, same md5
    bucket arithmetic as llm_feature_hashing — engine-portable): the
    entire "model" is a B-row (bucket, score) table (B=DSIR_BUCKETS).
    Plan: one token explode feeding TWO map-side-combined aggregates —
    the B-cell count table (shuffle bounded by partitions × B) and the
    per-doc bucket tf (bounded by docs × occupied buckets) — then the
    score table BROADCAST back onto the doc-bucket rows and one final
    per-doc sum. The corpus is never shuffled by anything wider than
    doc_id; the model never materializes on the driver; the 8-step
    fixed-point log2 runs only on the B-row cell table, not per token.
    Sub-bit exactness: see the module-level algorithm note — the first
    cut used floor-ilog2 and scored 0 for every document, because real
    target/raw bucket ratios live within one bit of parity.
    """
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    tb = bucketize_tokens(docs)
    scored = dsir_score_table(docs)
    doc_b = tb.groupBy("doc_id", "b").agg(F.count("*").alias("tf"))
    return (
        doc_b.join(F.broadcast(scored), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("score_q8"))
            .cast("long")
            .alias("dsir_q8"),
        )
    )


#: Per-lang tercile labels in rank order (CCNet's names).
_TIERS = ("head", "middle", "tail")


# ntile_from_rank moved to operators.ranks in r11 (it pairs with the
# shared binned_rank primitive); re-imported here for its existing users.
from streamline_hybrid_engine_spark.operators.ranks import (  # noqa: E402,F401
    binned_rank,
    ntile_from_rank,
)


@query(
    "llm_perplexity_buckets",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    vocab AS (SELECT t, count(*) AS cnt FROM tok GROUP BY t),
    n AS (SELECT count(*) AS total FROM tok),
    bits AS (
      SELECT tok.doc_id,
             length(bin(CAST(n.total // vocab.cnt AS BIGINT))) - 1 AS bits
      FROM tok JOIN vocab ON vocab.t = tok.t CROSS JOIN n
    ),
    doc AS (
      SELECT doc_id, count(*) AS n_tokens,
             CAST((sum(bits)::HUGEINT * 1000000) // count(*) AS BIGINT)
               AS mean_micro
      FROM bits GROUP BY doc_id
    ),
    tiled AS (
      SELECT s.lang, d.mean_micro,
             ntile(3) OVER (PARTITION BY s.lang
                            ORDER BY d.mean_micro, d.doc_id) AS tier
      FROM doc d JOIN documents s ON s.doc_id = d.doc_id
    )
    SELECT lang,
           CASE tier WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                     ELSE 'tail' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(mean_micro) AS lo_micro,
           max(mean_micro) AS hi_micro,
           CAST(sum(mean_micro)::HUGEINT // count(*) AS BIGINT) AS avg_micro
    FROM tiled GROUP BY lang, bucket
    """,
    tags=("llm", "selection"),
)
def llm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language quality terciles (Wenzek et al. 2020):
    score every document with the unigram-LM surprisal-bits mean (the
    llm_surprisal_bits integer formula — ilog2(total/cnt) per token,
    exact floored micros per doc), then split each language into
    head / middle / tail thirds by score and report the tercile
    boundaries and sizes — the staging table a pretraining pipeline
    samples from (head first, tail last or never).

    Tercile assignment is EXACT ntile(3) semantics, computed the
    scale-safe way: the oracle says ``ntile(3) OVER (PARTITION BY lang
    ORDER BY mean_micro, doc_id)``, but a per-lang global sort puts an
    entire language's corpus through one partition at 100 TB (CommonCrawl
    English ≈ half the corpus). So the Spark side decomposes the rank by
    the agg_decile_lift_binned valve: bin = mean_micro div 1e6 (the
    integer bit count, ~20 bins/lang) is a PREFIX of the sort key, so
    row_number(lang) = broadcast bin-offset + row_number within
    (lang, bin) — windows only ever partition by (lang, bin), the
    offset table is langs × bins rows, and the exact ANSI ntile tier
    (first n%3 terciles get the extra row) is arithmetic on that rank.
    Tie-break doc_id makes the rank — hence every output row — fully
    deterministic. Output is the (lang, tercile) staging summary:
    n_docs, score range, exact floored mean.
    """
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    )
    vocab = toks.groupBy("t").agg(F.count("*").alias("cnt"))
    n = toks.agg(F.count("*").alias("total"))
    bits = (
        toks.join(vocab, "t")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            (F.length(F.bin(F.expr("total div cnt"))) - 1).alias("bits"),
        )
    )
    doc = bits.groupBy("doc_id").agg(
        F.expr(
            "CAST((sum(CAST(bits AS DECIMAL(38,0))) * 1000000)"
            " div count(*) AS BIGINT)"
        ).alias("mean_micro")
    )
    scored = doc.join(
        docs.select("doc_id", "lang"), "doc_id"
    ).withColumn("bin", F.expr("mean_micro div 1000000"))

    # shared binned-offset primitive (r11): bin = mean_micro div 1e6 is a
    # monotone prefix of (mean_micro, doc_id); the offset table is
    # langs × ~20 bins of metadata, windows partition by (lang, bin) only.
    ranked = binned_rank(
        scored,
        "bin",
        ["mean_micro", "doc_id"],
        group_cols=("lang",),
        rank_col="rnk",
        total_col="n_lang",
    ).select("lang", "mean_micro", "rnk", "n_lang")
    tier = ntile_from_rank("rnk", "n_lang", 3)
    bucket = (
        F.when(tier == 1, _TIERS[0])
        .when(tier == 2, _TIERS[1])
        .otherwise(_TIERS[2])
    )
    return (
        ranked.select("lang", "mean_micro", bucket.alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("mean_micro").alias("lo_micro"),
            F.max("mean_micro").alias("hi_micro"),
            F.expr(
                "CAST(sum(CAST(mean_micro AS DECIMAL(38,0)))"
                " div count(*) AS BIGINT)"
            ).alias("avg_micro"),
        )
    )
