"""Semantic tests for the data-selection operators (llm/selection.py).

Oracle parity at sf0.001 rides test_parity_sf0001 automatically; these
prove the formulas do what the ids claim — the DSIR score is the
integer-bit log-ratio it documents, and the binned-rank tercile equals
ANSI NTILE exactly (remainder rule and all).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window

_FUZZ = max(1, int(os.environ.get("SHE_FUZZ_SCALE", "1")))

from streamline_hybrid_engine_spark.catalog import load_table
import math

from streamline_hybrid_engine_spark.llm.selection import (
    _LOG2_STEPS,
    _SAT,
    _SPARK_Q,
    _SPARK_SIGN,
    DSIR_BUCKETS,
    DSIR_TARGET,
    _spark_log2_q8,
    ntile_from_rank,
)
from streamline_hybrid_engine_spark.registry import all_queries

_QS = all_queries()


def _expected_score_q8(c_t: int, c_r: int, n_t: int, n_r: int) -> int:
    """Pure-Python mirror of the Q8 fixed-point log2 squaring algorithm."""
    b = DSIR_BUCKETS
    num = (c_t + 1) * (n_r + b)
    den = (c_r + 1) * (n_t + b)
    sign = 1 if num >= den else -1
    q = min((max(num, den) * 65536) // min(num, den), _SAT)
    e = q.bit_length() - 1
    m = (q * 65536) // (1 << e)
    f = 0
    for _ in range(_LOG2_STEPS):
        m = (m * m) // 65536
        bit = 1 if m >= 131072 else 0
        f = f * 2 + bit
        m >>= bit
    return sign * (256 * (e - 16) + f)


def test_dsir_score_expression_matches_integer_reference(spark):
    """The decimal(38,0) SQL Q8 score == the pure-Python integer mirror,
    including the sign branch, the num==den boundary (score 0), counts
    past int32 (products past int64 — the regime the decimal
    accumulators exist for), and the 2^60 saturation clamp; and it
    tracks true log2 within 1/256 + float slop."""
    cases = [
        (0, 0, 0, 0),
        (5, 5, 100, 100),
        (9, 0, 10, 1000),
        (0, 9, 1000, 10),
        (1, 1, 7, 7),
        (6, 5, 100, 100),
        (5, 6, 100, 100),
        (123456, 7, 1_000_000, 2_000_000),
        (7, 123456, 2_000_000, 1_000_000),
        (3_000_000_000, 1, 40_000_000_000, 5_000_000_000),
        (1, 3_000_000_000, 5_000_000_000, 40_000_000_000),
        # saturation: ratio beyond 2^44
        (10**14, 0, 10**14, 10**14),
    ]
    df = spark.createDataFrame(
        [(int(a), int(b), int(c), int(d)) for a, b, c, d in cases],
        "c_t long, c_r long, n_t long, n_r long",
    ).select(
        "c_t", "c_r", "n_t", "n_r",
        F.expr(_SPARK_SIGN).alias("sign"),
        F.expr(_SPARK_Q).alias("q"),
    )
    got = _spark_log2_q8(df, "q").select(
        "c_t", "c_r", "n_t", "n_r", (F.col("sign") * F.col("lq8")).alias("s")
    )
    b = DSIR_BUCKETS
    for row in got.collect():
        exp = _expected_score_q8(row.c_t, row.c_r, row.n_t, row.n_r)
        assert row.s == exp, (row.c_t, row.c_r, row.n_t, row.n_r, row.s, exp)
        true = math.log2(
            ((row.c_t + 1) * (row.n_r + b)) / ((row.c_r + 1) * (row.n_t + b))
        )
        if abs(true) < 40:  # below the saturation clamp
            # fixed-point floor + per-step mantissa truncation: 2 q8 ulps
            assert abs(row.s / 256.0 - true) < (2 / 256.0) + 1e-4, (row, true)


#: r10 boundary templates: exact corners of the Q8 pipeline no random
#: draw would hit. With B=128: den = (c_r+1)(n_t+128), num = (c_t+1)(n_r+128).
_Q8_BOUNDARY_CASES = [
    # num == den exactly (score 0, sign must take the >= branch) and the
    # adjacent integers on both sides (sign flips at equality)
    (0, 0, 872, 871),   # num=999,  den=1000 → sign −1
    (0, 0, 872, 872),   # num=1000, den=1000 → 0
    (0, 0, 872, 873),   # num=1001, den=1000 → sign +1
    # the 2^44 saturation switch, exact and ±1 of n_r (den=200, so
    # num−den·2^44 = ±200): k=−1 is the LARGEST unsaturated quotient
    (199, 0, 72, (1 << 44) - 128 - 1),
    (199, 0, 72, (1 << 44) - 128),      # big div 2^44 == small exactly
    (199, 0, 72, (1 << 44) - 128 + 1),
    # one unit below saturation in num itself: num = 200·2^44 − 1
    (0, 0, 72, 200 * (1 << 44) - 129),
    # mantissa start exactly at a power of two: q = 2^17 (ratio 2.0)
    (0, 0, 872, 1872),  # num=2000, den=1000 → q=131072 → exactly 1 bit
]


def test_dsir_q8_saturation_and_equality_boundaries(spark):
    """r10 boundary template (Spark side): the saturate-BEFORE-divide
    switch at exactly ratio = 2^44 and ±1 (the wrap-before-clamp class
    the r9 fuzz caught lives here), num == den ± 1 around the sign
    branch, and the exact power-of-two mantissa. Ground truth = the
    pure-Python mirror."""
    df = spark.createDataFrame(
        [(i, a, b, c, d) for i, (a, b, c, d) in enumerate(_Q8_BOUNDARY_CASES)],
        "i int, c_t long, c_r long, n_t long, n_r long",
    ).select(
        "i", F.expr(_SPARK_SIGN).alias("sign"), F.expr(_SPARK_Q).alias("q")
    )
    got = {
        r.i: r.s
        for r in _spark_log2_q8(df, "q")
        .select("i", (F.col("sign") * F.col("lq8")).alias("s"))
        .collect()
    }
    for i, (a, b, c, d) in enumerate(_Q8_BOUNDARY_CASES):
        assert got[i] == _expected_score_q8(a, b, c, d), (i, _Q8_BOUNDARY_CASES[i])
    # the switch itself: k=−1 stays below _SAT, k=0 and k=+1 saturate
    assert _expected_score_q8(*_Q8_BOUNDARY_CASES[4]) == 44 * 256
    assert _expected_score_q8(*_Q8_BOUNDARY_CASES[3]) < 44 * 256
    # ratio exactly 2: 1.0 bit → 256 q8
    assert _expected_score_q8(*_Q8_BOUNDARY_CASES[7]) == 256


def test_dsir_q8_boundaries_duckdb_side():
    """Same boundary corners through the ORACLE's HUGEINT pipeline."""
    import duckdb

    from streamline_hybrid_engine_spark.llm.selection import (
        _DUCK_Q,
        _DUCK_SIGN,
        _duck_log2_q8_ctes,
    )

    values = ", ".join(
        f"({i}, {a}, {b}, {c}, {d})"
        for i, (a, b, c, d) in enumerate(_Q8_BOUNDARY_CASES)
    )
    sql = f"""
    WITH cells(i, c_t, c_r, n_t, n_r) AS (VALUES {values}),
    ratio AS (
      SELECT i, {_DUCK_SIGN} AS sign, {_DUCK_Q} AS q FROM cells
    ),
    {_duck_log2_q8_ctes("ratio")}
    SELECT i, sign * lq8 AS s FROM lgf
    """
    got = dict(duckdb.sql(sql).fetchall())
    for i, (a, b, c, d) in enumerate(_Q8_BOUNDARY_CASES):
        assert got[i] == _expected_score_q8(a, b, c, d), (i, _Q8_BOUNDARY_CASES[i])


_counts = st.tuples(
    st.integers(0, 10**13),
    st.integers(0, 10**13),
    st.integers(0, 10**14),
    st.integers(0, 10**14),
)


@settings(max_examples=15 * _FUZZ, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cases=st.lists(_counts, min_size=1, max_size=40))
def test_dsir_q8_fuzz_matches_python_mirror(spark, cases):
    """Random count shapes up to the 100 TB regime (counts to 1e14,
    products past int64): the SQL Q8 pipeline == the Python mirror on
    every row, one DataFrame per example."""
    df = spark.createDataFrame(
        [(i, int(a), int(b), int(c), int(d)) for i, (a, b, c, d) in enumerate(cases)],
        "i int, c_t long, c_r long, n_t long, n_r long",
    ).select("i", "c_t", "c_r", "n_t", "n_r",
             F.expr(_SPARK_SIGN).alias("sign"), F.expr(_SPARK_Q).alias("q"))
    got = {
        r.i: r.s
        for r in _spark_log2_q8(df, "q")
        .select("i", (F.col("sign") * F.col("lq8")).alias("s"))
        .collect()
    }
    for i, (a, b, c, d) in enumerate(cases):
        assert got[i] == _expected_score_q8(a, b, c, d), (i, cases[i], got[i])


def test_dsir_covers_every_doc_and_counts_all_tokens(spark, sf_dir):
    out = _QS["llm_importance_dsir"].fn(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert len(out) == n_docs
    assert out["doc_id"].is_unique
    n_toks = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
        .count()
    )
    assert int(out["n_tokens"].sum()) == n_toks


def test_dsir_target_sources_score_higher_on_average(spark, sf_dir):
    """The one-line sanity a data-mixing user checks first: docs FROM
    the target domain must average a higher importance weight than the
    rest (they are what the target model was fit on). Guarded against
    the degenerate fixture where all sources share one distribution by
    requiring only >=, with strict > when any score separates."""
    out = _QS["llm_importance_dsir"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    j = out.join(docs, "doc_id").withColumn(
        "is_t", F.col("source").isin(*DSIR_TARGET)
    )
    means = dict(
        j.groupBy("is_t")
        .agg((F.sum("dsir_q8") / F.sum("n_tokens")).alias("m"))
        .collect()
    )
    if len(means) == 2:
        # strict whenever ANY nonzero score separates the groups — a
        # regression that floors every score to 0 (the documented
        # floor-ilog2 failure mode) must FAIL here, not slide through >=
        separates = (
            out.filter(F.col("dsir_q8") != 0).limit(1).count() > 0
        )
        if separates:
            assert means[True] > means[False]
        else:
            assert means[True] >= means[False]


def test_ntile_from_rank_equals_spark_ntile_all_small_n(spark):
    """Differential: the closed-form tercile == F.ntile(3) for every
    partition size 1..25 (covers both remainder branches and the
    n < tiles guard), and a 7-tile spot check."""
    rows = [(n, r) for n in range(1, 26) for r in range(1, n + 1)]
    df = spark.createDataFrame(rows, "grp int, rnk int").withColumn(
        "n", F.max("rnk").over(Window.partitionBy("grp"))
    )
    for tiles in (3, 7):
        got = df.select(
            "grp",
            "rnk",
            ntile_from_rank("rnk", "n", tiles).alias("formula"),
            F.ntile(tiles)
            .over(Window.partitionBy("grp").orderBy("rnk"))
            .alias("ref"),
        )
        bad = got.filter(F.col("formula") != F.col("ref")).collect()
        assert not bad, f"tiles={tiles}: {bad[:5]}"


def test_perplexity_buckets_partition_languages_exactly(spark, sf_dir):
    out = _QS["llm_perplexity_buckets"].fn(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents")
    lang_counts = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    got = out.groupby("lang")["n_docs"].sum().to_dict()
    assert got == lang_counts
    for lang, grp in out.groupby("lang"):
        by = {r.bucket: r for r in grp.itertuples()}
        # ANSI remainder rule: earlier terciles never smaller, spread <= 1
        sizes = [by[b].n_docs for b in ("head", "middle", "tail") if b in by]
        assert sizes == sorted(sizes, reverse=True)
        assert max(sizes) - min(sizes) <= 1
        # score ranges are ordered (ties may touch, never invert)
        if "head" in by and "middle" in by:
            assert by["head"].hi_micro <= by["middle"].lo_micro
        if "middle" in by and "tail" in by:
            assert by["middle"].hi_micro <= by["tail"].lo_micro
        for r in grp.itertuples():
            assert r.lo_micro <= r.avg_micro <= r.hi_micro


def test_stream_dsir_filter_equals_batch_scores(spark, sf_dir):
    """The streaming face drains to exactly the batch id's rows: same
    docs, same n_tokens, same dsir_q8 (complete-mode drain over the
    one-file fixture stream; the model is the same static table)."""
    batch = {
        r.doc_id: (r.n_tokens, r.dsir_q8)
        for r in _QS["llm_importance_dsir"].fn(spark, sf_dir).collect()
    }
    stream = {
        r.doc_id: (r.n_tokens, r.dsir_q8)
        for r in _QS["stream_dsir_filter"].fn(spark, sf_dir).collect()
    }
    assert stream == batch


@settings(max_examples=25 * _FUZZ, deadline=None)
@given(cases=st.lists(_counts, min_size=1, max_size=60))
def test_dsir_q8_duckdb_side_matches_python_mirror(cases):
    """The ORACLE side at 100 TB-regime counts: the sf0.01 gate only
    exercises small counts, so the HUGEINT branch of the Q8 pipeline
    gets its own differential (pure DuckDB, no Spark)."""
    import duckdb

    from streamline_hybrid_engine_spark.llm.selection import (
        _DUCK_Q,
        _DUCK_SIGN,
        _duck_log2_q8_ctes,
    )

    values = ", ".join(
        f"({i}, {a}, {b}, {c}, {d})" for i, (a, b, c, d) in enumerate(cases)
    )
    sql = f"""
    WITH cells(i, c_t, c_r, n_t, n_r) AS (VALUES {values}),
    ratio AS (
      SELECT i, {_DUCK_SIGN} AS sign, {_DUCK_Q} AS q FROM cells
    ),
    {_duck_log2_q8_ctes("ratio")}
    SELECT i, sign * lq8 AS s FROM lgf
    """
    got = dict(duckdb.sql(sql).fetchall())
    for i, (a, b, c, d) in enumerate(cases):
        assert got[i] == _expected_score_q8(a, b, c, d), (i, cases[i], got[i])


@settings(max_examples=10 * _FUZZ, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["aa", "bb", "cc"]),       # lang
            st.integers(0, 50_000_000),                # mean_micro score
        ),
        min_size=1,
        max_size=60,
    )
)
def test_binned_tercile_assembly_equals_plain_ntile(spark, docs):
    """End-to-end randomized differential for the binned-rank path: on
    arbitrary (lang, score) corpora — duplicate scores, skewed langs,
    n < 3 languages — assembling rank as broadcast bin-offset +
    row_number within (lang, bin) and applying ntile_from_rank must
    reproduce plain ntile(3) OVER (PARTITION BY lang ORDER BY score,
    doc_id) row for row. This is the assembly llm_perplexity_buckets
    runs; the fixture only exercises one corpus shape."""
    rows = [
        (i, lang, int(score)) for i, (lang, score) in enumerate(docs)
    ]
    got, ref = _assembled_vs_plain_ntile(spark, rows)
    assert got == ref


def _assembled_vs_plain_ntile(spark, rows):
    """(assembled-tier, plain-ntile-tier) dicts for (doc_id, lang,
    mean_micro) rows — the exact binned-offset assembly
    llm_perplexity_buckets runs, against F.ntile(3) ground truth."""
    df = spark.createDataFrame(rows, "doc_id long, lang string, mean_micro long")
    scored = df.withColumn("bin", F.expr("mean_micro div 1000000"))
    bin_counts = scored.groupBy("lang", "bin").agg(F.count("*").alias("bn"))
    w_off = (
        Window.partitionBy("lang")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bin_counts.select(
        "lang",
        "bin",
        F.coalesce(F.sum("bn").over(w_off), F.lit(0)).alias("off"),
        F.sum("bn").over(Window.partitionBy("lang")).alias("n_lang"),
    )
    w_bin = Window.partitionBy("lang", "bin").orderBy("mean_micro", "doc_id")
    assembled = scored.join(F.broadcast(offsets), ["lang", "bin"]).select(
        "doc_id",
        (F.row_number().over(w_bin) + F.col("off")).alias("rnk"),
        "n_lang",
    )
    got = {
        r.doc_id: r.t
        for r in assembled.select(
            "doc_id", ntile_from_rank("rnk", "n_lang", 3).alias("t")
        ).collect()
    }
    ref = {
        r.doc_id: r.t
        for r in df.select(
            "doc_id",
            F.ntile(3)
            .over(Window.partitionBy("lang").orderBy("mean_micro", "doc_id"))
            .alias("t"),
        ).collect()
    }
    return got, ref


def test_binned_tercile_exact_bin_boundary_ties(spark):
    """r10 boundary template: every score an EXACT multiple of 1e6 —
    i.e. sitting precisely on a bin boundary, where an off-by-one in
    the offset/row_number hand-off would mis-tier — with heavy
    duplicates straddling two adjacent bins, at every remainder class
    n % 3 ∈ {0, 1, 2} (lang sizes 1..9 include n < 3, where ANSI ntile
    leaves tiles empty). Assembled tiers must equal plain ntile(3) row
    for row."""
    rows = []
    doc = 0
    for n in range(1, 10):
        lang = f"l{n}"
        for j in range(n):
            # alternate exactly-on-boundary scores across two bins with
            # duplicates: 1_000_000 and 2_000_000 only
            score = 1_000_000 * (1 + (j % 2))
            rows.append((doc, lang, score))
            doc += 1
    got, ref = _assembled_vs_plain_ntile(spark, rows)
    assert got == ref


def test_stream_perplexity_router_respects_batch_boundaries(spark, sf_dir):
    """Threshold routing invariants vs the batch terciles: per lang,
    every routed doc's score respects the frozen cut points (head <=
    head_hi < middle <= middle_hi < tail), per-lang totals equal the
    lang's doc count, and within a lang the route score ranges are
    ordered. Boundary ties route LOW by contract, so routed counts may
    differ from exact batch tercile sizes — ranges, not sizes, are the
    invariant."""
    batch = _QS["llm_perplexity_buckets"].fn(spark, sf_dir).toPandas()
    cuts = {}
    for lang, grp in batch.groupby("lang"):
        by = {r.bucket: r for r in grp.itertuples()}
        cuts[lang] = (
            by["head"].hi_micro if "head" in by else None,
            by["middle"].hi_micro if "middle" in by else None,
        )
    routed = _QS["stream_perplexity_router"].fn(spark, sf_dir).toPandas()
    lang_totals = batch.groupby("lang")["n_docs"].sum().to_dict()
    assert routed.groupby("lang")["n_docs"].sum().to_dict() == lang_totals
    for lang, grp in routed.groupby("lang"):
        head_hi, middle_hi = cuts[lang]
        by = {r.route: r for r in grp.itertuples()}
        if "head" in by:
            assert by["head"].hi_micro <= head_hi
        if "middle" in by:
            assert by["middle"].lo_micro > head_hi
            assert by["middle"].hi_micro <= middle_hi
        if "tail" in by:
            assert by["tail"].lo_micro > middle_hi
