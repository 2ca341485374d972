"""Text-analysis operators for LLM training-data pipelines — SURVEY §2.11.

Beyond-reference mandate: language-ID (n-gram/marker heuristic), quality
scoring, token counting (whitespace + BPE-ish regex), document
fingerprinting (winnowing-style hash sampling). Everything is built-in
``pyspark.sql.functions`` over the ``documents`` table — zero Python in
the row path, so the operators scale to arbitrary corpus size with one
shuffle (or none).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from streamline_hybrid_engine_spark.catalog import load_table
from streamline_hybrid_engine_spark.registry import query

#: marker tokens per language for the heuristic language-ID scorer.
#: (The fixture corpus is synthetic English-ish vocab; the operator proves
#: the scoring machinery, not linguistics.)
LANG_MARKERS = {
    "en": ("the", "a", "fast", "slow"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "los", "que"),
    "fr": ("le", "la", "les", "est"),
    "zh": ("shi", "de", "bu", "zai"),
}

STOPWORDS = ("a", "the", "of", "and", "to", "in")


@query(
    "llm_doc_token_stats",
    oracle="""
    SELECT doc_id, lang, source,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_unique,
           round(len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE), 6) AS ttr,
           round(list_sum(list_transform(toks, t -> CAST(length(t) AS DOUBLE))) / len(toks), 6) AS avg_tok_len,
           length(text) AS n_chars_actual
    FROM (SELECT doc_id, lang, source, text, string_split(text, ' ') AS toks FROM documents)
    """,
    tags=("llm", "text"),
)
def llm_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics: count, vocabulary, type-token ratio,
    mean token length — the basic quality-filter features."""
    docs = load_table(spark, sf_dir, "documents", parallel=True).withColumn(
        "toks", F.split("text", " ")
    )
    n = F.size("toks")
    uniq = F.size(F.array_distinct("toks"))
    tok_len_sum = F.expr(
        "aggregate(toks, CAST(0.0 AS DOUBLE), (acc, t) -> acc + CAST(length(t) AS DOUBLE))"
    )
    return docs.select(
        "doc_id",
        "lang",
        "source",
        n.alias("n_tokens"),
        uniq.alias("n_unique"),
        F.round(uniq / n.cast("double"), 6).alias("ttr"),
        F.round(tok_len_sum / n, 6).alias("avg_tok_len"),
        F.length("text").alias("n_chars_actual"),
    )


@query(
    "llm_text_quality",
    oracle=f"""
    SELECT doc_id,
           round(len(list_filter(toks, t -> list_contains({list(STOPWORDS)!r}, t)))
                 / CAST(len(toks) AS DOUBLE), 6) AS stopword_ratio,
           round(list_sum(list_transform(toks, t -> CAST(length(t) AS DOUBLE))) / len(toks), 6) AS mean_word_len,
           len(toks) AS n_tokens,
           CASE WHEN len(toks) BETWEEN 20 AND 1000
                 AND len(list_filter(toks, t -> list_contains({list(STOPWORDS)!r}, t)))
                     / CAST(len(toks) AS DOUBLE) BETWEEN 0.01 AND 0.6
                THEN 1 ELSE 0 END AS passes_filter
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    """,
    tags=("llm", "text", "quality"),
)
def llm_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, mean word length, length gate —
    a Gopher-style rule filter as one codegen'd expression."""
    docs = load_table(spark, sf_dir, "documents", parallel=True).withColumn(
        "toks", F.split("text", " ")
    )
    sw = F.array([F.lit(s) for s in STOPWORDS])
    n = F.size("toks")
    sw_ratio = F.size(F.filter("toks", lambda t: F.array_contains(sw, t))) / n.cast(
        "double"
    )
    mean_len = (
        F.expr(
            "aggregate(toks, CAST(0.0 AS DOUBLE), (acc, t) -> acc + CAST(length(t) AS DOUBLE))"
        )
        / n
    )
    return docs.select(
        "doc_id",
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(mean_len, 6).alias("mean_word_len"),
        n.alias("n_tokens"),
        F.when(
            n.between(20, 1000) & sw_ratio.between(0.01, 0.6), 1
        )
        .otherwise(0)
        .alias("passes_filter"),
    )


@query(
    "llm_text_langid",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {" , ".join(
                 f"len(list_filter(toks, t -> list_contains({list(marks)!r}, t))) AS score_{lg}"
                 for lg, marks in LANG_MARKERS.items()
             )}
      FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents)
    )
    SELECT doc_id, lang AS lang_actual,
           CASE
             {" ".join(
                 f"WHEN score_{lg} >= greatest(score_en, score_de, score_es, score_fr, score_zh)"
                 f" AND score_{lg} > 0 THEN '{lg}'"
                 for lg in LANG_MARKERS
             )}
             ELSE 'unknown' END AS lang_guess,
           greatest(score_en, score_de, score_es, score_fr, score_zh) AS best_score
    FROM scored
    """,
    tags=("llm", "text", "langid"),
)
def llm_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: marker-token hit counts per language, argmax
    with first-language-wins tie-breaking (CASE order — identical in both
    engines)."""
    docs = load_table(spark, sf_dir, "documents", parallel=True).withColumn(
        "toks", F.split("text", " ")
    )
    def _score(marks: tuple[str, ...]) -> F.Column:
        arr = F.array([F.lit(x) for x in marks])
        return F.size(F.filter("toks", lambda t: F.array_contains(arr, t)))

    scores = {lg: _score(marks) for lg, marks in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    guess = F.lit("unknown")
    # build CASE in reverse so earlier languages win ties (matches SQL order)
    for lg in reversed(list(LANG_MARKERS)):
        guess = F.when((scores[lg] >= best) & (scores[lg] > 0), lg).otherwise(guess)
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        guess.alias("lang_guess"),
        best.alias("best_score"),
    )


@query(
    "llm_token_count_bpe",
    oracle=r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_ish_tokens,
           CAST(ceil(length(replace(text, ' ', '')) / 4.0) AS BIGINT) AS char4_estimate
    FROM documents
    """,
    tags=("llm", "text", "tokens"),
)
def llm_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, BPE-ish regex pieces, and the
    chars/4 heuristic — the standard corpus-size triangulation."""
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).alias(
            "bpe_ish_tokens"
        ),
        F.ceil(F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) / 4.0).alias(
            "char4_estimate"
        ),
    )


@query(
    "llm_fingerprint_winnow",
    oracle="""
    SELECT doc_id,
           coalesce(array_to_string(list_sort(list_distinct(list_filter(
             list_transform(range(1, len(toks) - 1),
               i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])),
             h -> substr(h, 1, 1) = '0'))), ','), '') AS fingerprints
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    """,
    tags=("llm", "text", "fingerprint"),
)
def llm_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: 3-gram rolling hashes, mod-16 sampled
    (keep hashes whose first hex digit is '0' — winnowing-style 1/16
    selection), sorted + joined for a stable per-doc signature."""
    docs = load_table(spark, sf_dir, "documents", parallel=True).withColumn(
        "toks", F.split("text", " ")
    )
    # size guard: under ANSI, a <3-token doc would make the sequence count
    # down into negative indices and toks[i] would throw (ADVICE r01)
    fp = F.expr(
        "array_join(array_sort(array_distinct(filter("
        "CASE WHEN size(toks) >= 3 THEN transform(sequence(0, size(toks) - 3),"
        " i -> md5(concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])))"
        " ELSE array() END,"
        " h -> substr(h, 1, 1) = '0'))), ',')"
    )
    return docs.select("doc_id", fp.alias("fingerprints"))


@query(
    "llm_tfidf_top_terms",
    oracle="""
    WITH tf AS (
      SELECT doc_id, token, count(*) AS tf, count(*) OVER (PARTITION BY doc_id) AS _dummy
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY doc_id, token
    ),
    dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS doc_len FROM tf GROUP BY doc_id),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             round((tf.tf / CAST(dl.doc_len AS DOUBLE))
                   * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN dl USING (doc_id) JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tfidf, CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rk
          FROM scored)
    WHERE rk <= 3
    """,
    tags=("llm", "text", "tfidf"),
)
def llm_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: top-3 characteristic terms per document.

    tf = term count / doc length; idf = ln(N / df); deterministic ranking
    by (tfidf desc, token). Three narrow shuffles — (doc, token) counts,
    token document-frequency, doc length — all partial-aggregated; the df
    table is tiny (vocabulary) and broadcast back. The canonical corpus
    featurization pass at any scale.
    """
    from pyspark.sql import Window

    # plain scan: the pipeline shuffles at the first explode→groupBy anyway,
    # and the eager count() below must not pay a repartition
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar; at 100 TB this is a cheap count(*)
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "token")
        .select(
            "doc_id",
            "token",
            F.round(
                (F.col("tf") / F.col("doc_len").cast("double"))
                * F.log(F.lit(float(n_docs)) / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "token", "tfidf", F.col("rk").cast("long").alias("rk"))
    )


@query(
    "llm_train_split_hash",
    oracle="""
    WITH assigned AS (
      SELECT doc_id, source,
             CASE WHEN strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 13 THEN 'train'
                  WHEN strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 15 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, source, count(*) AS n_docs
    FROM assigned GROUP BY split, source
    """,
    tags=("llm", "split"),
)
def llm_train_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by content-stable hash:
    first md5 hex digit of the doc id buckets 16 ways → 13/2/1
    (~81/13/6%). Unlike ``randomSplit``, the assignment is reproducible
    across runs, engines and cluster sizes, and survives re-partitioning —
    the property a training pipeline actually needs. Zero shuffle for the
    assignment; one for the audit aggregate.
    """
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    digit = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
    ) - 1
    split = (
        F.when(digit < 13, "train").when(digit < 15, "val").otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split", "source")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "llm_sample_stratified",
    oracle="""
    SELECT doc_id, source,
           ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT % 100 AS bucket
    FROM documents
    WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT % 100 < 20
    """,
    tags=("llm", "sample"),
)
def llm_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% sample, uniform within every ``source`` stratum.

    Membership = 48-bit md5 bucket of the doc id < rate — content-stable
    like the train/val/test split: the same rows are selected on any
    engine, cluster size, partitioning, or run. ``rand()``/``sample()``
    cannot do this (seed- and partitioning-dependent), which is why
    reproducible training pipelines sample by hash threshold. The
    predicate is a plain comparison evaluated map-side at the scan:
    zero shuffle, and at 100 TB the sample never has to be materialized —
    any downstream job can re-derive it from the predicate alone.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.expr(
            "cast(conv(substr(md5(cast(doc_id as string)), 1, 12), 16, 10) as bigint)"
        ),
        F.lit(100),
    )
    return (
        docs.withColumn("bucket", bucket)
        .filter(F.col("bucket") < 20)
        .select("doc_id", "source", "bucket")
    )


#: max run length in a SORTED array — equal elements are adjacent, so the
#: longest run IS the max multiplicity. One codegen'd fold, zero shuffle.
def _max_run(arr_expr: str) -> str:
    return (
        f"aggregate(array_sort({arr_expr}), "
        "named_struct('prev', cast(null as string), 'run', 0, 'best', 0), "
        "(acc, t) -> named_struct("
        "  'prev', t, "
        "  'run', CASE WHEN acc.prev IS NOT NULL AND t = acc.prev "
        "         THEN acc.run + 1 ELSE 1 END, "
        "  'best', greatest(acc.best, CASE WHEN acc.prev IS NOT NULL AND t = acc.prev "
        "          THEN acc.run + 1 ELSE 1 END)), "
        "acc -> acc.best)"
    )


@query(
    "llm_quality_repetition",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
    tokc AS (
      SELECT doc_id, max(c) AS mx, sum(c) AS n, count(*) AS nd
      FROM (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY doc_id, tk)
      GROUP BY doc_id
    ),
    big AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
      FROM t
    ),
    bigc AS (
      SELECT doc_id, max(c) AS mxb, sum(c) AS nb
      FROM (SELECT doc_id, bg, count(*) AS c FROM big GROUP BY doc_id, bg)
      GROUP BY doc_id
    )
    SELECT tokc.doc_id,
           CAST(n AS BIGINT) AS n_toks,
           round(nd / n, 6) AS distinct_ratio,
           round(mx / n, 6) AS top_tok_frac,
           round(coalesce(mxb / nb, 0), 6) AS top_bigram_frac,
           (round(nd / n, 6) >= 0.2 AND round(mx / n, 6) <= 0.2
            AND round(coalesce(mxb / nb, 0), 6) <= 0.1) AS quality_ok
    FROM tokc LEFT JOIN bigc ON tokc.doc_id = bigc.doc_id
    """,
    tags=("llm", "text", "quality"),
)
def llm_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality gates (the Gopher/MassiveText rule family:
    distinct-token ratio, most-frequent-token fraction, most-frequent-
    bigram fraction; a doc failing any is boilerplate/spam-shaped).

    Scale design: everything is per-document, computed as higher-order
    folds over the token array (max multiplicity = longest run in the
    sorted array) — ZERO shuffle, whole corpus embarrassingly parallel.
    The oracle takes the classic unnest→group route; same numbers.
    """
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    t = docs.select("doc_id", F.split("text", " ").alias("toks")).select(
        "doc_id",
        "toks",
        F.expr(
            "CASE WHEN size(toks) >= 2 THEN transform(sequence(0, size(toks) - 2),"
            " i -> concat(toks[i], ' ', toks[i+1])) ELSE array() END"
        ).alias("bigs"),
    )
    m = t.select(
        "doc_id",
        F.size("toks").alias("n"),
        F.size(F.array_distinct("toks")).alias("nd"),
        F.expr(_max_run("toks")).alias("mx"),
        F.size("bigs").alias("nb"),
        F.expr(_max_run("bigs")).alias("mxb"),
    )
    distinct_ratio = F.round(F.col("nd") / F.col("n"), 6)
    top_tok = F.round(F.col("mx") / F.col("n"), 6)
    top_big = F.round(
        F.when(F.col("nb") > 0, F.col("mxb") / F.col("nb")).otherwise(F.lit(0.0)), 6
    )
    return m.select(
        "doc_id",
        F.col("n").cast("long").alias("n_toks"),
        distinct_ratio.alias("distinct_ratio"),
        top_tok.alias("top_tok_frac"),
        top_big.alias("top_bigram_frac"),
        (
            (distinct_ratio >= 0.2) & (top_tok <= 0.2) & (top_big <= 0.1)
        ).alias("quality_ok"),
    )


@query(
    "llm_pack_sequences",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n FROM documents
    ),
    w AS (
      SELECT doc_id, source, n,
             sum(n) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
      FROM t
    ),
    spans AS (
      SELECT source, cum_end - n AS cum_start, cum_end,
             unnest(range(CAST((cum_end - n) // 512 AS BIGINT),
                          CAST((cum_end - 1) // 512 AS BIGINT) + 1)) AS block_id
      FROM w WHERE n > 0
    )
    SELECT source, block_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(least(cum_end, (block_id + 1) * 512)
                    - greatest(cum_start, block_id * 512)) AS BIGINT) AS n_tokens
    FROM spans GROUP BY source, block_id
    """,
    tags=("llm", "text", "packing"),
)
def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: the GPT-style packed-dataset layout. Documents are
    concatenated in (source, doc_id) order into one token stream per
    source, chunked into fixed 512-token blocks (docs may straddle
    boundaries); output = per block, how many docs touch it and its token
    count (== 512 except each source's tail).

    Scale design: one window cumsum per source shard (packing is
    order-DEFINED, so the sort is the semantics, not overhead), then a
    bounded explode (a doc spans ceil(n/512)+1 blocks) and a hash agg. At
    100 TB, source shards pack independently — exactly how a distributed
    tokenizer-packer runs."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        t.withColumn("cum_end", F.sum("n").over(w))
        .withColumn("cum_start", F.col("cum_end") - F.col("n"))
        .filter(F.col("n") > 0)
    )
    spans = cum.select(
        "source",
        "cum_start",
        "cum_end",
        F.explode(
            F.expr(
                "sequence(cast(cum_start div 512 as bigint),"
                " cast((cum_end - 1) div 512 as bigint))"
            )
        ).alias("block_id"),
    )
    return spans.groupBy("source", "block_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.least(F.col("cum_end"), (F.col("block_id") + 1) * 512)
            - F.greatest(F.col("cum_start"), F.col("block_id") * 512)
        ).alias("n_tokens"),
    )


@query(
    "llm_pack_nostraddle",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_raw,
             least(len(string_split(text, ' ')), 512) AS n
      FROM documents
      WHERE len(string_split(text, ' ')) > 0
    ),
    placed AS (
      SELECT source, n, n_raw,
             (row_number() OVER (PARTITION BY source, n ORDER BY doc_id) - 1)
               // (512 // n) AS blk
      FROM t
    ),
    blocks AS (
      SELECT source, n, blk,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CASE WHEN n_raw > 512 THEN 1 ELSE 0 END) AS BIGINT)
               AS trunc_cnt
      FROM placed GROUP BY source, n, blk
    )
    SELECT source,
           CAST(sum(cnt) AS BIGINT) AS n_docs,
           CAST(sum(trunc_cnt) AS BIGINT) AS n_trunc,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(cnt * n) AS BIGINT) AS packed_tokens,
           CAST(sum(512 - cnt * n) AS BIGINT) AS pad_tokens,
           round(CAST(sum(512 - cnt * n) AS DOUBLE)
                 / CAST(count(*) * 512 AS DOUBLE), 6) AS pad_frac
    FROM blocks GROUP BY source
    """,
    tags=("llm", "text", "packing"),
)
def llm_pack_nostraddle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, NO-STRADDLE layout — the other standard besides
    llm_pack_sequences' GPT concatenation: documents never split across
    512-token training sequences (instruction-tuning pipelines can't
    straddle — a cross-boundary fragment detaches from its prompt), so
    every block pads to 512 and the report accounts the padding waste.

    Packing strategy is length-grouped greedy: docs sharing (source,
    clipped length L) pack floor(512/L) per block in doc_id order —
    blocks are homogeneous-length, assignment is pure arithmetic on a
    (source, L)-partitioned row_number. That is the deterministic,
    shuffle-minimal member of the no-straddle family: true first-fit-
    decreasing is a sequential recurrence (one task per source at 100 TB);
    length-grouping trades a bounded extra pad on each length class's
    tail block for full data parallelism — windows partition by
    (source, L), nothing coarser, and the whole id is two hash
    aggregations past the window. Docs longer than 512 truncate to one
    full block (counted in n_trunc); empty docs drop (as the straddling
    id does). Output = the per-source packing efficiency report:
    blocks, packed vs pad tokens, pad fraction."""
    docs = load_table(spark, sf_dir, "documents")
    n_raw = F.size(F.split("text", " "))
    t = docs.select(
        "doc_id",
        "source",
        n_raw.alias("n_raw"),
        F.least(n_raw, F.lit(512)).alias("n"),
    ).filter(F.col("n_raw") > 0)
    placed = t.withColumn(
        "blk",
        F.expr(
            "cast(row_number() OVER (PARTITION BY source, n ORDER BY doc_id)"
            " - 1 as bigint) div (512 div n)"
        ),
    )
    blocks = placed.groupBy("source", "n", "blk").agg(
        F.count("*").alias("cnt"),
        F.sum(F.when(F.col("n_raw") > 512, 1).otherwise(0)).alias(
            "trunc_cnt"
        ),
    )
    return blocks.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        F.sum("trunc_cnt").cast("long").alias("n_trunc"),
        F.count("*").cast("long").alias("n_blocks"),
        F.sum(F.col("cnt") * F.col("n")).cast("long").alias("packed_tokens"),
        F.sum(F.lit(512) - F.col("cnt") * F.col("n"))
        .cast("long")
        .alias("pad_tokens"),
        F.round(
            F.sum(F.lit(512) - F.col("cnt") * F.col("n")).cast("double")
            / (F.count("*") * 512).cast("double"),
            6,
        ).alias("pad_frac"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing + domain-temperature sampling (round-2 additions)
# ---------------------------------------------------------------------------

#: portable (Java regex ∩ RE2) patterns — see fn_regex_bundle for the
#: portability rules this subset follows (no lookaround, no \d shorthand
#: inside SQL strings, character classes + bounded quantifiers only).
_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+"
_PHONE_RE = "555-[0-9]{4}"

# The fixture corpus is clean synthetic text, so the query plants
# deterministic PII first — a contact line derived from doc_id, built by
# the SAME expression on both engines — and then proves the scrubber
# actually fires (counts are nonzero and the redacted text hash matches).
_PII_PAGE_SPARK = (
    "concat(text, ' reach me at user', cast(doc_id as string),"
    " '@mail-example.com or call 555-',"
    " lpad(cast(pmod(doc_id * 7919, 10000) as string), 4, '0'))"
)
_PII_PAGE_DUCK = (
    "text || ' reach me at user' || doc_id::VARCHAR"
    " || '@mail-example.com or call 555-'"
    " || lpad(((doc_id * 7919) % 10000)::VARCHAR, 4, '0')"
)


@query(
    "llm_pii_redact",
    oracle=f"""
    WITH page AS (
      SELECT doc_id, {_PII_PAGE_DUCK} AS page FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(page, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(page, '{_PHONE_RE}')) AS n_phones,
           md5(regexp_replace(regexp_replace(page, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5,
           length(page)
             - length(regexp_replace(regexp_replace(page, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                     '{_PHONE_RE}', '<PHONE>', 'g')) AS n_chars_removed
    FROM page
    """,
    tags=("llm", "text"),
)
def llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: find-and-mask emails and phone numbers, reporting
    per-document match counts and a fingerprint of the redacted text.

    Pure ``regexp_extract_all``/``regexp_replace`` — JVM codegen, zero
    shuffle, embarrassingly parallel over a 100 TB corpus. Patterns stay
    in the Java∩RE2 portable subset so the DuckDB oracle executes the
    byte-identical regex. (Real pipelines swap in stronger patterns /
    NER models via mapInPandas — the mm_* ops show that plumbing.)
    """
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    page = docs.withColumn("page", F.expr(_PII_PAGE_SPARK))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("page"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return page.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(page, '{_EMAIL_RE}', 0)")).alias("n_emails"),
        F.size(F.expr(f"regexp_extract_all(page, '{_PHONE_RE}', 0)")).alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
        (F.length("page") - F.length(redacted)).alias("n_chars_removed"),
    )


#: 48-bit hash space, as in llm_sample_stratified / llm_train_split_hash.
_HASH_SPACE = 1 << 48
_HASH48_SPARK = (
    "cast(conv(substr(md5(cast(doc_id as string)), 1, 12), 16, 10) as bigint)"
)
_HASH48_DUCK = "('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT"


@query(
    "llm_sample_temperature",
    oracle=f"""
    WITH counts AS (
      SELECT source, count(*) AS n_total FROM documents GROUP BY source
    ),
    rates AS (
      SELECT source, n_total,
             CAST(floor(sqrt(CAST((SELECT min(n_total) FROM counts) AS DOUBLE)
                             / n_total) * {_HASH_SPACE}) AS BIGINT) AS thresh
      FROM counts
    )
    SELECT r.source, r.n_total, r.thresh,
           count(*) FILTER (WHERE {_HASH48_DUCK} < r.thresh) AS n_kept
    FROM documents d JOIN rates r ON d.source = r.source
    GROUP BY r.source, r.n_total, r.thresh
    """,
    tags=("llm", "sample"),
)
def llm_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-temperature sampling (alpha = 0.5): per-source keep-rate
    ∝ count^(alpha-1), normalized so the smallest source keeps everything
    — the standard multi-domain rebalancing step before LLM training
    (large domains are down-sampled toward the temperature distribution).

    Membership is the same content-stable 48-bit-hash threshold as
    llm_sample_stratified, so the selected set is reproducible on any
    engine or partitioning. The per-source thresholds are a tiny
    broadcast; membership is then a map-side predicate at the scan —
    zero extra shuffle over the corpus at 100 TB. Cross-engine exactness:
    thresholds use only IEEE-correctly-rounded ops (÷, sqrt, ×) on exact
    integers, then floor to bigint — bit-identical on both engines; no
    comparison ever lands on a fraction an engine could round differently.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_total"))
    cmin = counts.agg(F.min("n_total").alias("c_min"))
    rates = counts.join(F.broadcast(cmin)).select(
        "source",
        "n_total",
        F.floor(
            F.sqrt(F.col("c_min").cast("double") / F.col("n_total"))
            * F.lit(_HASH_SPACE)
        )
        .cast("long")
        .alias("thresh"),
    )
    h48 = F.expr(_HASH48_SPARK)
    return (
        docs.join(F.broadcast(rates), "source")
        .groupBy("source", "n_total", "thresh")
        .agg(F.sum(F.when(h48 < F.col("thresh"), 1).otherwise(0)).alias("n_kept"))
    )


N_HASH_BUCKETS = 256  # feature-hashing dimensionality


@query(
    "llm_feature_hashing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    )
    SELECT doc_id,
           CAST(('0x' || substr(md5(tok), 1, 6))::BIGINT % {N_HASH_BUCKETS} AS BIGINT)
             AS bucket,
           count(*) AS tf
    FROM toks WHERE tok <> ''
    GROUP BY doc_id, bucket
    """,
    tags=("llm", "text", "features"),
)
def llm_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the hashing trick): tokens → fixed {N_HASH_BUCKETS}-dim
    sparse term-frequency vectors in long form (doc_id, bucket, tf) — the
    vocabulary-free featurizer for classifier-based quality filters
    (fastText-style) where a 100 TB corpus can't build/broadcast a vocab.

    Bucket = md5-derived 24-bit integer mod buckets (engine-portable, vs
    Spark's murmur3 `hash()` which DuckDB lacks). Long-form output IS the
    sparse representation — no array columns (registry convention), and
    downstream dot products against a broadcast weight vector are a
    (bucket) equi-join away. One explode + one groupBy; partial aggregation
    bounds the shuffle by docs × occupied buckets.
    """
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    bucket = F.expr(
        f"cast(conv(substr(md5(tok), 1, 6), 16, 10) as bigint) % {N_HASH_BUCKETS}"
    )
    return (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("tf"))
    )


W_MULT = 2654435761  # deterministic per-bucket weight: centered mult-hash
W_MOD = 1_000_003
W_CENTER = W_MOD // 2


@query(
    "llm_quality_classifier",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    feats AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 6))::BIGINT % {N_HASH_BUCKETS} AS bucket,
             count(*) AS tf
      FROM toks WHERE tok <> ''
      GROUP BY doc_id, bucket
    )
    SELECT doc_id,
           CAST(sum(tf * ((bucket * {W_MULT}) % {W_MOD} - {W_CENTER})) AS BIGINT)
             AS logit_fp,
           CAST(CASE WHEN sum(tf * ((bucket * {W_MULT}) % {W_MOD} - {W_CENTER})) > 0
                THEN 1 ELSE 0 END AS INT) AS keep
    FROM feats GROUP BY doc_id
    """,
    tags=("llm", "text", "classifier"),
)
def llm_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier scoring over hashed features — the
    fastText-style filter shape (CCNet/GPT-3 pipelines score every doc
    with a small linear model and keep by threshold). Features come from
    `llm_feature_hashing`'s md5 buckets; weights are a deterministic
    broadcast-sized vector (stand-in for trained weights — here derived
    from a centered multiplicative hash so the oracle can recompute them);
    the decision logit is an EXACT integer dot product, so the keep/drop
    gate can never flip on float noise (the sigmoid is monotone —
    thresholding the logit IS thresholding the probability).

    Scale: weights are w·|buckets| values (KBs) — joined or broadcast;
    scoring is one groupBy over the (doc, bucket, tf) stream. The whole
    filter is two hash aggregations; no Python anywhere.
    """
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    bucket = F.expr(
        f"cast(conv(substr(md5(tok), 1, 6), 16, 10) as bigint) % {N_HASH_BUCKETS}"
    )
    feats = (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("tf"))
    )
    w = (F.col("bucket") * W_MULT) % W_MOD - W_CENTER
    logit = F.sum(F.col("tf") * w)
    return feats.groupBy("doc_id").agg(
        logit.alias("logit_fp"),
        F.when(logit > 0, 1).otherwise(0).cast("int").alias("keep"),
    )


from streamline_hybrid_engine_spark.registry import _REGISTRY as _REG  # noqa: E402

_LANGID_ORACLE = _REG["llm_text_langid"].oracle


@query(
    "llm_langid_consistency",
    oracle=f"""
    WITH langid AS ({_LANGID_ORACLE})
    SELECT lang_actual,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN lang_guess <> lang_actual THEN 1 ELSE 0 END)
                AS BIGINT) AS n_mismatch,
           round(CAST(sum(CASE WHEN lang_guess <> lang_actual THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS mismatch_rate
    FROM langid GROUP BY lang_actual
    """,
    tags=("llm", "text", "langid", "audit"),
)
def llm_langid_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-detected language audit: per declared language, how
    often the marker-based detector disagrees — the metadata-quality check
    a multilingual pipeline runs before trusting the `lang` column for
    monolingual splits (mislabeled docs pollute per-language corpora).
    Composes the langid operator's output with one aggregation; the oracle
    wraps the langid oracle in a CTE so the two stay in sync by
    construction (same pattern as the corpus-assembly query).
    """
    langid = llm_text_langid(spark, sf_dir)
    mism = F.sum(
        F.when(F.col("lang_guess") != F.col("lang_actual"), 1).otherwise(0)
    )
    return langid.groupBy("lang_actual").agg(
        F.count("*").alias("n_docs"),
        mism.alias("n_mismatch"),
        F.round(mism.cast("double") / F.count("*"), 6).alias("mismatch_rate"),
    )


CHUNK_WINDOW = 128  # tokens per training chunk
CHUNK_STRIDE = 96   # 32-token overlap between consecutive chunks


@query(
    "llm_chunk_overlap",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id, toks, unnest(range(0, len(toks), {CHUNK_STRIDE})) AS start
      FROM t
    )
    SELECT doc_id,
           CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(len(toks[start + 1 : start + {CHUNK_WINDOW}]) AS BIGINT)
             AS n_chunk_tokens,
           md5(array_to_string(toks[start + 1 : start + {CHUNK_WINDOW}], ' '))
             AS chunk_md5,
           len(toks[start + 1 : start + {CHUNK_WINDOW}]) = {CHUNK_WINDOW}
             AS is_full
    FROM s
    """,
    tags=("llm", "text", "chunking"),
)
def llm_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: cut each document into
    {CHUNK_WINDOW}-token chunks on a {CHUNK_STRIDE}-token stride (32-token
    overlap), the standard context-window preparation for embedding /
    retrieval corpora — the in-document complement to `llm_pack_sequences`
    (which packs ACROSS documents without overlap).

    The overlap means a sentence straddling a chunk boundary appears
    whole in the next chunk — dropped chunks lose no contiguous context.
    `chunk_md5` fingerprints each chunk's exact text (md5 byte-identical
    cross-engine), so the oracle checks content, not just counts; the
    trailing partial chunk is flagged via `is_full`.

    100 TB design: one projection + one explode per document — zero
    shuffle, all codegen (sequence/slice/md5 are JVM built-ins); output
    scales by ~len/stride ≈ 1.33× the token volume, the expected cost of
    overlap. Chunks inherit the document's partitioning.
    """
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    toks = F.split("text", " ")
    t = docs.select("doc_id", toks.alias("toks"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("toks") - 1, F.lit(0)), F.lit(CHUNK_STRIDE)
    )
    chunk = F.slice(F.col("toks"), F.col("start") + 1, CHUNK_WINDOW)
    return (
        t.select("doc_id", "toks", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
            (F.size(chunk) == CHUNK_WINDOW).alias("is_full"),
        )
    )


#: vocabulary size for the coverage gate.
VOCAB_K = 200


@query(
    "llm_vocab_oov",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, count(DISTINCT doc_id) AS df
        FROM toks GROUP BY tok
      ) ORDER BY df DESC, tok LIMIT {VOCAB_K}
    )
    SELECT t.doc_id,
           count(*) AS n_tokens,
           count(*) FILTER (v.tok IS NULL) AS n_oov,
           round(CAST(count(*) FILTER (v.tok IS NULL) AS DOUBLE)
                 / count(*), 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
    GROUP BY t.doc_id
    """,
    tags=("llm", "text", "vocab"),
)
def llm_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage / OOV-rate gate — the tokenizer-fit check a
    training pipeline runs before committing to a vocab: build the
    top-{VOCAB_K} document-frequency vocabulary (ties broken by token,
    so the cut is total-ordered and engine-stable), then score every
    document's out-of-vocabulary token rate against it. High-OOV docs
    are the ones a fixed tokenizer will shred into bytes.

    Plan: token DF is one explode + (token, doc) distinct-count
    aggregate; the top-K cut is TakeOrderedAndProject (per-partition
    heaps, no global sort); the vocabulary (KBs) BROADCASTS into the
    per-token membership join, so the corpus-side explode never
    shuffles for the lookup — per-doc aggregation is the only wide
    exchange. The same shape at 100 TB with a 100k-entry vocab: still
    broadcast-sized. oov_rate divides two exact integers → identical
    doubles."""
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("df"), "tok")
        .limit(VOCAB_K)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count_if(F.col("in_vocab").isNull()).alias("n_oov"),
            F.round(
                F.count_if(F.col("in_vocab").isNull()).cast("double")
                / F.count("*"),
                6,
            ).alias("oov_rate"),
        )
    )


# --- Token-budget mixture allocation (waterfilling) --------------------------

_WATERFILL_ORACLE = """
    WITH src AS (
      SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(floor(sum(n) * 0.4) AS BIGINT) AS b FROM src
    ),
    ranked AS (
      SELECT source, n,
             row_number() OVER (ORDER BY n, source) AS i,
             CAST(coalesce(sum(n) OVER (
               ORDER BY n, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS prev_prefix,
             count(*) OVER () AS m
      FROM src
    ),
    marked AS (
      SELECT r.*, t.b,
             CASE WHEN r.prev_prefix + (r.m - r.i + 1) * r.n > t.b
                  THEN 1 ELSE 0 END AS uncapped
      FROM ranked r CROSS JOIN tot t
    ),
    params AS (
      SELECT min(prev_prefix) AS f, CAST(sum(uncapped) AS BIGINT) AS u,
             min(b) AS b
      FROM marked WHERE uncapped = 1
    )
    SELECT m.source, m.n AS n_tokens,
           CASE WHEN m.uncapped = 0 THEN m.n
                ELSE CAST(floor(CAST(p.b - p.f AS DOUBLE) / p.u) AS BIGINT)
                     + CASE WHEN row_number() OVER (
                              PARTITION BY m.uncapped ORDER BY m.n, m.source)
                            <= (p.b - p.f)
                               - CAST(floor(CAST(p.b - p.f AS DOUBLE) / p.u)
                                 AS BIGINT) * p.u
                            THEN 1 ELSE 0 END
           END AS allocation,
           CAST(m.uncapped AS BOOLEAN) AS capped
    FROM marked m CROSS JOIN params p
"""


def waterfill(
    src: DataFrame, n_col: str, tiebreak_col: str, budget: DataFrame
) -> DataFrame:
    """Library primitive (r8 pass 4): capped-fair-share allocation of a
    global budget across keyed sizes — the waterfilling closed form
    behind llm_mix_waterfill, on ANY DataFrame. ``src`` carries one row
    per key with a nonnegative long ``n_col``; ``budget`` is a 1-row
    DataFrame with a long column ``b``. Returns src's columns plus
    ``allocation`` (long) and ``capped`` (boolean); Σ allocation ==
    min(b, Σ n) exactly — the integer water level floor((b − f)/u) with
    the remainder unit-distributed to the first capped keys in the
    (n, tiebreak) total order (fuzz-pinned in
    tests/test_property_differential.py). ``src`` must not already carry
    columns named i/prev_prefix/m/b/uncapped. Everything after the
    caller's per-key aggregate runs on the key-dimension table, so the
    primitive costs nothing fact-sized."""
    from pyspark.sql import Window

    n = F.col(n_col)
    w = Window.orderBy(n_col, tiebreak_col)
    ranked = src.select(
        "*",
        F.row_number().over(w).alias("i"),
        F.coalesce(
            F.sum(n_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("long")
        .alias("prev_prefix"),
        F.count("*").over(Window.partitionBy()).alias("m"),
    )
    # NOTE: "uncapped" is the overshoot marker (1 = this key gets CAPPED);
    # the name is kept from the audited contract-query form
    marked = ranked.crossJoin(F.broadcast(budget)).withColumn(
        "uncapped",
        F.when(
            F.col("prev_prefix") + (F.col("m") - F.col("i") + 1) * n
            > F.col("b"),
            1,
        ).otherwise(0),
    )
    params = (
        marked.filter(F.col("uncapped") == 1)
        .agg(
            F.min("prev_prefix").alias("f"),
            F.sum("uncapped").cast("long").alias("u"),
        )
    )
    # exact integral division: floor of a DOUBLE quotient can be off by
    # one once b - f exceeds 2^53, breaking the Σallocation == min(b, Σn)
    # contract at extreme budgets (r8 advice item 1)
    base = F.expr("(b - f) div u").cast("long")
    rem = (F.col("b") - F.col("f")) - base * F.col("u")
    w_unc = Window.partitionBy("uncapped").orderBy(n_col, tiebreak_col)
    return marked.crossJoin(F.broadcast(params)).select(
        *src.columns,
        F.when(F.col("uncapped") == 0, n)
        .otherwise(
            base + F.when(F.row_number().over(w_unc) <= rem, 1).otherwise(0)
        )
        .alias("allocation"),
        (F.col("uncapped") == 1).alias("capped"),
    )


@query(
    "llm_mix_waterfill",
    oracle=_WATERFILL_ORACLE,
    tags=("llm", "mixture"),
)
def llm_mix_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture allocation under a global token budget —
    waterfilling (capped fair share): every source keeps all its tokens
    up to a common water level λ; sources below λ keep everything,
    sources above are capped, and λ is set so allocations sum exactly
    to the budget (40% of corpus tokens here). This is the allocation
    step behind every "N% web, M% code, capped per domain" training-mix
    spec. The closed form avoids iterating: source i (ascending by
    size) is capped iff giving it and every larger source its own size
    overshoots the budget (prev_prefix + remaining·n_i > B); the
    integer water level is floor((B − full_total)/n_capped) with the
    remainder distributed to the first capped sources in the same
    total order — every quantity an exact integer, Σ allocation == B
    by construction (test-pinned). Plan: the per-source aggregate is
    one partial-agg groupBy of the corpus; everything after runs on
    the DIMENSION-sized source table (windows over ~20 rows) — at
    100 TB the fact pass is the only cost. Allocation logic lives in the
    exported :func:`waterfill` primitive (library pass 4)."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("n")
    )
    tot = src.agg(F.floor(F.sum("n") * 0.4).cast("long").alias("b"))
    return waterfill(src, "n", "source", tot).select(
        "source",
        F.col("n").alias("n_tokens"),
        "allocation",
        "capped",
    )


# --- Unigram-LM surprisal scoring (integer-exact perplexity proxy) -----------

_SURPRISAL_ORACLE = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t
      FROM documents
    ),
    vocab AS (SELECT t, count(*) AS cnt FROM tok GROUP BY t),
    n AS (SELECT count(*) AS total FROM tok),
    scored AS (
      SELECT tok.doc_id,
             length(bin(CAST(floor(CAST(n.total AS DOUBLE) / vocab.cnt)
                            AS BIGINT))) - 1 AS bits
      FROM tok JOIN vocab ON vocab.t = tok.t CROSS JOIN n
    )
    SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(bits) AS BIGINT) AS total_bits,
           CAST(floor(CAST(sum(bits) AS DOUBLE) * 1000000 / count(*))
                AS BIGINT) AS mean_bits_micro
    FROM scored GROUP BY doc_id
"""


@query(
    "llm_surprisal_bits",
    oracle=_SURPRISAL_ORACLE,
    tags=("llm", "quality"),
)
def llm_surprisal_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document surprisal under the corpus's own unigram LM — the
    perplexity-style rarity score quality filters rank documents by
    (rare-token-heavy docs score high), as an INTEGER-EXACT proxy:
    token surprisal = floor(log2(N / count)) bits, computed as
    length(bin(N div count)) − 1 — a true integer log2 with zero libm
    (ln/log2's last-ulp rounding is engine-specific; the same reason
    the Benford screen avoids log10 and the geo bundle avoids
    mercator's ln·tan). Mean bits are floored to the micro grid from
    exact integer sums.

    Plan: explode to tokens, ONE shuffle to build the vocab counts,
    one shuffle-join tokens→counts (vocab is corpus-sized at 100 TB —
    a shuffle join, NOT a broadcast; for a bounded vocab you'd
    broadcast), one partial-agg groupBy back to docs. The N scalar is
    a broadcast single row."""
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("t")
    )
    vocab = tok.groupBy("t").agg(F.count("*").alias("cnt"))
    n = tok.agg(F.count("*").alias("total"))
    scored = (
        tok.join(vocab, "t")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            (
                F.length(
                    F.bin(
                        (F.col("total") / F.col("cnt")).cast("long")
                    )
                )
                - 1
            ).alias("bits"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("bits").cast("long").alias("total_bits"),
        F.floor(
            F.sum("bits").cast("double") * 1_000_000 / F.count("*")
        )
        .cast("long")
        .alias("mean_bits_micro"),
    )


# --- SymSpell fuzzy vocabulary match (spell-candidate join) ------------------

_SPELL_ORACLE = """
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    tokp AS (
      SELECT doc_id, CAST(x['pos'] AS BIGINT) AS pos,
             CAST(x['t'] AS VARCHAR) AS t
      FROM (SELECT doc_id,
                   unnest(list_transform(range(0, len(toks)),
                     i -> {'pos': i, 't': toks[CAST(i AS INTEGER) + 1]}))
                     AS x
            FROM base)
    ),
    noisy AS (
      SELECT substr(t, 1, CAST(floor(length(t) / 2.0) AS INTEGER) - 1)
             || substr(t, CAST(floor(length(t) / 2.0) AS INTEGER) + 1)
               AS typo
      FROM tokp
      WHERE (doc_id * 31 + pos) % 11 = 0 AND length(t) >= 4
    ),
    typo_cnt AS (SELECT typo, count(*) AS n_occ FROM noisy GROUP BY typo),
    vocab AS (
      SELECT DISTINCT t AS w FROM tokp WHERE length(t) >= 4
    ),
    tv AS (
      SELECT typo, unnest(list_transform(range(-1, length(typo)),
               i -> CASE WHEN i = -1 THEN typo
                    ELSE substr(typo, 1, CAST(i AS INTEGER))
                         || substr(typo, CAST(i AS INTEGER) + 2) END))
               AS var
      FROM typo_cnt
    ),
    vv AS (
      SELECT w, unnest(list_transform(range(-1, length(w)),
               i -> CASE WHEN i = -1 THEN w
                    ELSE substr(w, 1, CAST(i AS INTEGER))
                         || substr(w, CAST(i AS INTEGER) + 2) END))
               AS var
      FROM vocab
    ),
    cand AS (
      SELECT DISTINCT tv.typo, vv.w FROM tv JOIN vv ON tv.var = vv.var
    )
    SELECT c.typo, c.w AS suggestion,
           CAST(levenshtein(c.typo, c.w) AS INTEGER) AS lev,
           t.n_occ
    FROM cand c JOIN typo_cnt t ON t.typo = c.typo
    WHERE levenshtein(c.typo, c.w) <= 1
"""


@query(
    "llm_spell_candidates",
    oracle=_SPELL_ORACLE,
    tags=("llm", "fuzzy"),
)
def llm_spell_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy vocabulary match via SymSpell deletion neighborhoods — the
    OCR/typo-normalization join of a data-cleaning pipeline, and the
    scale-correct way to fuzzy-join strings: a pair is within edit
    distance 1 only if the two words share a member of their deletion
    neighborhoods ({word} ∪ {word minus one char} — |w|+1 variants per
    word), so candidate generation is a plain EQUI-join on the variant
    key instead of the |rare|×|vocab| levenshtein grid; the exact
    levenshtein (identical DP in both engines) then kills the
    neighborhood's false positives (e.g. 'ab'~'ba' share variants at
    distance 2) — candidate/verify, the same LSH discipline as minhash
    dedup. Typos are PLANTED deterministically (delete the middle char
    of every 11th (doc, pos) token — the fixture's 31-word vocabulary
    has no organic misspellings; same policy as llm_pii_redact's
    planted PII). At 100 TB the vocab side's variants broadcast when
    the dictionary is bounded; both sides shuffle on the variant key
    otherwise, and max_edit=2 squares the neighborhood (SymSpell's
    documented trade)."""
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    tokp = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "t")
    )
    mid = F.floor(F.length("t") / 2.0).cast("int")
    noisy = tokp.filter(
        ((F.col("doc_id") * 31 + F.col("pos")) % 11 == 0)
        & (F.length("t") >= 4)
    ).select(
        F.concat(
            F.substring(F.col("t"), F.lit(1), mid - 1),
            F.col("t").substr(mid + 1, F.length("t")),
        ).alias("typo")
    )
    typo_cnt = noisy.groupBy("typo").agg(F.count("*").alias("n_occ"))
    vocab = (
        tokp.filter(F.length("t") >= 4).select(F.col("t").alias("w")).distinct()
    )
    variant = (
        "transform(sequence(-1, length({c}) - 1), i -> CASE WHEN i = -1 "
        "THEN {c} ELSE concat(substring({c}, 1, i), substring({c}, i + 2)) "
        "END)"
    )
    tv = typo_cnt.select(
        "typo", F.explode(F.expr(variant.format(c="typo"))).alias("var")
    )
    vv = vocab.select("w", F.explode(F.expr(variant.format(c="w"))).alias("var"))
    cand = tv.join(vv, "var").select("typo", "w").distinct()
    return (
        cand.filter(F.levenshtein("typo", "w") <= 1)
        .join(typo_cnt, "typo")
        .select(
            "typo",
            F.col("w").alias("suggestion"),
            F.levenshtein("typo", "w").cast("int").alias("lev"),
            "n_occ",
        )
    )


@query(
    "llm_ngram_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, g
      FROM toks, unnest(list_transform(
             range(1, greatest(len(t) - 1, 1)),
             i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS u(g)
    ),
    firsts AS (
      SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g
    )
    SELECT grams.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           round(CAST(sum(CASE WHEN f.first_doc = grams.doc_id
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS novelty
    FROM grams JOIN firsts f ON f.g = grams.g
    GROUP BY grams.doc_id
    """,
    tags=("llm", "quality"),
)
def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty score: the fraction of a document's distinct
    trigrams whose FIRST corpus occurrence (min doc_id — ingestion
    order) is this document. Curation uses it as the inverse of
    boilerplate-ness: a crawl page full of previously-seen trigrams
    scores near 0 and gets downweighted before training. Dataflow:
    map-side trigram expansion (array transform — no Python), distinct
    (doc, gram) pairs, one groupBy for first-occurrence, equi-join
    back, per-doc ratio of exact counts. The gram→first_doc table is
    the same inverted index llm_contamination_8gram builds — at 100 TB
    build it once, reuse for both; the join is never all-pairs."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    grams = toks.select(
        "doc_id",
        F.explode(
            # Spark's sequence(0, stop) DESCENDS when stop < 0 — a short
            # doc must yield array() explicitly, not sequence(0, -1).
            F.expr(
                "CASE WHEN size(t) >= 3 THEN"
                " transform(sequence(0, size(t) - 3),"
                " i -> concat(t[i], ' ', t[i + 1], ' ', t[i + 2]))"
                " ELSE array() END"
            )
        ).alias("g"),
    ).distinct()
    firsts = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    j = grams.join(firsts, "g")
    return j.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.round(
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).cast("double")
            / F.count("*"),
            6,
        ).alias("novelty"),
    )


@query(
    "llm_rarity_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    df AS (
      SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM toks GROUP BY tok
    ),
    n AS (SELECT count(*) AS total FROM documents)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(CAST(sum(length(bin(total // n_docs)) - 1) AS DOUBLE)
                 / count(*), 6) AS rarity_bits
    FROM toks t JOIN df ON df.tok = t.tok CROSS JOIN n
    GROUP BY t.doc_id
    """,
    tags=("llm", "quality"),
)
def llm_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical rarity score: mean over a document's token INSTANCES of
    floor(log2(N / df(token))) — an integer-IDF proxy for how much of
    the doc is made of corpus-rare vocabulary. Curation reads it two
    ways: high rarity + low quality = gibberish/OCR noise; high rarity
    + high quality = the long-tail knowledge worth upweighting. The
    log2 is length(bin(x))−1 on an integer division — zero libm, zero
    cross-engine drift (same discipline as llm_surprisal_bits, which
    scores against the TOKEN-frequency unigram LM; this scores
    DOCUMENT-frequency dispersion — df vs tf). Plan: explode, one
    groupBy for df, equi-join back (Catalyst broadcasts the
    fixture-sized vocab; stats flip it to shuffle at corpus scale), one
    per-doc aggregate. The df table is shared with llm_tfidf_top_terms
    at 100 TB — build once."""
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    df = toks.groupBy("tok").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    n = docs.agg(F.count("*").alias("total"))
    j = toks.join(df, "tok").crossJoin(F.broadcast(n))
    bits = F.length(F.bin(F.expr("total div n_docs"))) - 1
    return j.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.sum(bits).cast("double") / F.count("*"), 6).alias(
            "rarity_bits"
        ),
    )


@query(
    "llm_corpus_mix_report",
    oracle="""
    WITH mix AS (
      SELECT source, lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CAST(n_chars AS HUGEINT)) AS BIGINT) AS chars,
             CAST(sum(sum(CAST(n_chars AS HUGEINT))) OVER () AS BIGINT)
               AS tot
      FROM documents GROUP BY source, lang
    )
    SELECT source, lang, n_docs, chars,
           round(chars / CAST(tot AS DOUBLE), 6) AS share,
           round(CAST(sum(chars) OVER (ORDER BY chars DESC, source, lang
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DOUBLE) / tot, 6) AS cum_share
    FROM mix
    """,
    tags=("llm", "reporting"),
)
def llm_corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report: per (source, lang) cell, document and
    character counts, corpus share, and CUMULATIVE share in descending
    size order — the table a data-mix decision (and llm_mix_waterfill's
    budget input) is read from, with cum_share showing how few cells
    cover 90% of the corpus. One partial-agg groupBy over the corpus;
    both windows (global total, running total) run over the
    cell-count-sized aggregate, not documents. Integer chars, ratios
    rounded once; the running frame is pinned ROWS with a total
    tiebreak so ties cannot reorder it."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    dec = "decimal(38,0)"
    mix = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_chars").cast(dec)).cast("long").alias("chars"),
    )
    wg = Window.partitionBy()
    wrun = Window.orderBy(
        F.col("chars").desc(), F.col("source"), F.col("lang")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = F.sum(F.col("chars").cast(dec)).over(wg).cast("long")
    return mix.select(
        "source",
        "lang",
        "n_docs",
        "chars",
        F.round(F.col("chars") / tot.cast("double"), 6).alias("share"),
        F.round(
            F.sum("chars").over(wrun).cast("double") / tot, 6
        ).alias("cum_share"),
    )


@query(
    "llm_token_offsets",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(string_split(text, ' ')) + 1),
               i -> {'pos': i - 1, 'tok': string_split(text, ' ')[i]})) AS u
      FROM documents WHERE doc_id % 10 = 0
    ),
    flat AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM toks),
    span AS (
      SELECT doc_id, pos, tok,
             CAST(sum(length(tok) + 1) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT) AS prior
      FROM flat
    )
    SELECT doc_id, pos, tok,
           coalesce(prior, 0) AS start_char,
           coalesce(prior, 0) + length(tok) AS end_char
    FROM span
    """,
    tags=("llm", "annotation"),
)
def llm_token_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token span offsets: (position, start_char, end_char) per token —
    the alignment table every span-annotation pipeline (NER, PII
    masking, citation grounding) needs to map model outputs back onto
    raw text. Offsets via a cumulative length window over posexplode
    (start = Σ preceding (len+1), exact for the single-space corpus;
    real text would tokenize with offsets upstream). DuckDB has no
    WITH ORDINALITY — the oracle reproduces position with the
    range→struct list_transform trick. One exchange on doc_id; the
    span arithmetic is exact integers, and llm_pii_redact is the
    consumer that would join on these spans."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    from pyspark.sql import Window

    flat = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok")
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(
        F.sum(F.length("tok") + 1).over(w).cast("long"), F.lit(0)
    )
    return flat.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        "tok",
        prior.alias("start_char"),
        (prior + F.length("tok")).cast("long").alias("end_char"),
    )


def _auc_oracle() -> str:
    clf = _REG["llm_quality_classifier"].oracle
    qual = _REG["llm_text_quality"].oracle
    return f"""
    WITH clf AS ({clf}),
    qual AS ({qual}),
    scored AS (
      SELECT c.logit_fp AS s, q.passes_filter AS y
      FROM clf c JOIN qual q ON q.doc_id = c.doc_id
    ),
    ranked AS (
      SELECT y,
             2 * rank() OVER (ORDER BY s)
               + count(*) OVER (PARTITION BY s) - 1 AS r2
      FROM scored
    ),
    agg AS (
      SELECT CAST(sum(CASE WHEN y = 1 THEN r2 ELSE 0 END) AS BIGINT)
               AS r2_pos,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(1 - y) AS BIGINT) AS n_neg
      FROM ranked
    )
    SELECT n_pos, n_neg,
           round((r2_pos - n_pos * (n_pos + 1))
                 / CAST(2 * n_pos * n_neg AS DOUBLE), 6) AS auc
    FROM agg
    """


def binary_auc(scored: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Library primitive (r8 pass 4): exact AUC-ROC of any score column
    against a 0/1 label — the Mann–Whitney rank-sum form behind
    llm_classifier_auc, on ANY DataFrame. Tie-averaged ranks are doubled
    to stay integral (2·avg_rank = 2·rank() + tiecount − 1), so numerator
    and denominator are exact integers and the single division is the
    only float (fuzz-pinned against the O(n²) pairwise definition in
    tests/test_property_differential.py). Returns one row
    (n_pos, n_neg, auc); auc is NULL when either class is empty. The
    global rank assumes an already-reduced scores table; at corpus scale
    narrow into score buckets first (llm_classifier_auc's docstring)."""
    from pyspark.sql import Window

    w = Window.orderBy(score_col)
    ws = Window.partitionBy(score_col)
    y = F.col(label_col)
    ranked = scored.select(
        y.alias("y"),
        # rank() is IntegerType — cast BEFORE the arithmetic so 2·rank
        # can't overflow int32 past ~1.07e9 rows (r8 advice item 2)
        (
            2 * F.rank().over(w).cast("long")
            + F.count("*").over(ws).cast("long")
            - 1
        ).alias("r2"),
    )
    agg = ranked.agg(
        F.sum(F.when(F.col("y") == 1, F.col("r2")).otherwise(0))
        .cast("long")
        .alias("r2_pos"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("long").alias("n_neg"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(
            # try_divide: an empty class yields NULL, not an ANSI
            # DIVIDE_BY_ZERO (the r8 fuzzer found the plain `/` throwing
            # under Spark 4's default ansi=true on one-class inputs)
            F.try_divide(
                F.col("r2_pos") - F.col("n_pos") * (F.col("n_pos") + 1),
                (2 * F.col("n_pos") * F.col("n_neg")).cast("double"),
            ),
            6,
        ).alias("auc"),
    )


@query("llm_classifier_auc", oracle=_auc_oracle(), tags=("llm", "evaluation"))
def llm_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC-ROC of the quality classifier's integer logit against the
    rule-filter verdict — the eval metric that closes the classifier
    loop (llm_quality_classifier ships scores; this measures them).
    EXACT, not trapezoid-approximated: AUC is the Mann–Whitney
    rank-sum statistic, and with tie-AVERAGED ranks doubled to stay
    integral (2·avg_rank = 2·rank() + tiecount − 1), the numerator
    Σr2_pos − n_pos(n_pos+1) and denominator 2·n_pos·n_neg are exact
    integers — one division, rounded once. Composition: both inputs
    are the registry's own audited queries (oracle nests their SQL).
    The global rank runs over docs (already reduced); at corpus scale
    use the two-pass histogram narrowing to rank within score buckets.
    Rank algebra lives in the exported :func:`binary_auc` primitive
    (library pass 4)."""
    from streamline_hybrid_engine_spark.registry import all_queries

    qs = all_queries()
    clf = qs["llm_quality_classifier"].fn(spark, sf_dir).select(
        "doc_id", F.col("logit_fp").alias("s")
    )
    qual = qs["llm_text_quality"].fn(spark, sf_dir).select(
        "doc_id", F.col("passes_filter").alias("y")
    )
    return binary_auc(clf.join(qual, "doc_id"), "s", "y")


#: Score-bucket width for the binned AUC rank decomposition. The classifier
#: logit spans ~±7e6 on the fixture corpus, so 2^16 yields ~10^2 buckets;
#: at corpus scale the logit range is bounded by doc length × weight range,
#: so the bucket table stays metadata-sized regardless of row count.
AUC_BIN = 1 << 16


def binary_auc_binned(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    bin_width: int = AUC_BIN,
    group_cols: tuple = (),
) -> DataFrame:
    """:func:`binary_auc` without the single-partition sort — the corpus-
    scale form its docstring promises. Same exact Mann–Whitney answer,
    decomposed by the binned-offset valve (agg_decile_lift_binned /
    llm_perplexity_buckets pattern): ``bin = score div bin_width`` is a
    PREFIX of the score order (integer div truncates toward zero, which is
    monotone), so the global ANSI rank splits into

        rank(s) = offset(bin) + rank_within_bin(s)

    where ``offset(bin)`` = rows in strictly-lower bins — a broadcast
    table of ~|score_range|/bin_width rows. Ties in s never cross bins
    (equal scores share a bin), so the within-bin peer count IS the global
    tiecount, and it rides the SAME bin-partitioned sorted exchange as the
    rank (RANGE frame over the sort key). No window in the plan ever
    partitions the corpus into one task.

    The doubled-rank sum accumulates in DECIMAL(38,0): Σ 2·avg_rank over n
    rows is Θ(n²), past int64 at ~3e9 rows — exactly the regime this form
    exists for. The one float division happens after both exact integer
    totals are in hand, matching the oracle's BIGINT→DOUBLE division.
    Differential-fuzzed against :func:`binary_auc` (same result to the
    last bit) in tests/test_property_differential.py.

    ``group_cols`` computes an independent AUC per group (the per-slice
    eval a model auditor wants — per language, per domain): every window
    gains the group keys as leading partition columns, the offset table
    grows to groups × buckets rows (still broadcast-sized), and the
    output carries one (group_cols..., n_pos, n_neg, auc) row per group.
    Grouped results are fuzz-pinned equal to running :func:`binary_auc`
    per group independently.

    The rank decomposition itself is the shared
    :func:`..operators.ranks.binned_rank` primitive (r11): bin = score
    div bin_width satisfies its monotone-prefix contract, method="rank"
    + peers gives the tie-averaged Mann–Whitney doubled rank."""
    from ..operators.ranks import binned_rank

    g = list(group_cols)
    s, y = F.col(score_col), F.col(label_col)
    binned = scored.select(
        *g,
        s.alias("s"),
        y.alias("y"),
        F.expr(f"{score_col} div {int(bin_width)}").alias("bin"),
    )
    ranked = binned_rank(
        binned,
        "bin",
        ["s"],
        group_cols=g,
        rank_col="rnk",
        method="rank",
        peers_col="peers",
    ).select(
        *g,
        "y",
        (2 * F.col("rnk") + F.col("peers") - 1).alias("r2"),
    )
    agg = ranked.groupBy(*g).agg(
        F.sum(F.when(F.col("y") == 1, F.col("r2")).otherwise(0).cast(
            "decimal(38,0)"
        )).alias("r2_pos"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("long").alias("n_neg"),
    )
    return agg.select(
        *g,
        "n_pos",
        "n_neg",
        F.round(
            F.try_divide(
                # n_pos enters decimal(38,0) BEFORE the multiply: at the
                # >3e9-row regime this form exists for, n_pos*(n_pos+1)
                # would overflow int64 (~3.04e9) if computed first. The
                # denominator gets the same treatment — a double product
                # is exact only to 2^53 (~9e15), which the >3e9-row regime
                # can exceed — so both quotient inputs stay exact integers
                # until the one cast at the division itself.
                (
                    F.col("r2_pos")
                    - F.col("n_pos").cast("decimal(38,0)")
                    * (F.col("n_pos") + 1)
                ).cast("double"),
                (
                    F.col("n_pos").cast("decimal(38,0)") * F.col("n_neg") * 2
                ).cast("double"),
            ),
            6,
        ).alias("auc"),
    )


@query(
    "llm_classifier_auc_binned",
    oracle=_auc_oracle(),
    tags=("llm", "evaluation", "scale-valve"),
)
def llm_classifier_auc_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """llm_classifier_auc's answer through the corpus-scale plan — the
    executable realization of the prose valve in that query's docstring
    ("at corpus scale narrow into score buckets first"). Same inputs,
    same oracle, same exact integer rank-sum AUC; the global
    ``Window.orderBy(score)`` is replaced by the binned-offset
    decomposition (see :func:`binary_auc_binned`): windows partition by
    score bucket, the bucket-offset table broadcasts, and nothing ever
    range-partitions the corpus into one task. The registry's fourth
    executable binned-rank id, after agg_decile_lift_binned,
    llm_perplexity_buckets, and the binned terciles."""
    from streamline_hybrid_engine_spark.registry import all_queries

    qs = all_queries()
    clf = qs["llm_quality_classifier"].fn(spark, sf_dir).select(
        "doc_id", F.col("logit_fp").alias("s")
    )
    qual = qs["llm_text_quality"].fn(spark, sf_dir).select(
        "doc_id", F.col("passes_filter").alias("y")
    )
    return binary_auc_binned(clf.join(qual, "doc_id"), "s", "y")


def _auc_by_lang_oracle() -> str:
    clf = _REG["llm_quality_classifier"].oracle
    qual = _REG["llm_text_quality"].oracle
    return f"""
    WITH clf AS ({clf}),
    qual AS ({qual}),
    scored AS (
      SELECT d.lang, c.logit_fp AS s, q.passes_filter AS y
      FROM clf c
      JOIN qual q ON q.doc_id = c.doc_id
      JOIN documents d ON d.doc_id = c.doc_id
    ),
    ranked AS (
      SELECT lang, y,
             2 * rank() OVER (PARTITION BY lang ORDER BY s)
               + count(*) OVER (PARTITION BY lang, s) - 1 AS r2
      FROM scored
    ),
    agg AS (
      SELECT lang,
             CAST(sum(CASE WHEN y = 1 THEN r2 ELSE 0 END) AS BIGINT)
               AS r2_pos,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(1 - y) AS BIGINT) AS n_neg
      FROM ranked GROUP BY lang
    )
    SELECT lang, n_pos, n_neg,
           round((r2_pos - n_pos * (n_pos + 1))
                 / CAST(2 * n_pos * n_neg AS DOUBLE), 6) AS auc
    FROM agg
    """


@query(
    "llm_classifier_auc_by_lang",
    oracle=_auc_by_lang_oracle(),
    tags=("llm", "evaluation", "scale-valve"),
)
def llm_classifier_auc_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language classifier AUC — the sliced eval a model auditor
    reads right after the corpus-level number: a quality classifier can
    rank well in aggregate while being noise on one language (the
    fastText-filter failure mode CCNet documents), and the per-slice
    AUC table is what surfaces it. Same exact integer Mann–Whitney
    rank-sum as llm_classifier_auc, computed per language through the
    grouped binned-offset valve (:func:`binary_auc_binned` with
    group_cols): windows partition by (lang, score bucket) — no
    language's corpus ever sorts in one task — the offset table is
    langs × buckets rows (broadcast), and a one-class language yields
    NULL auc through try_divide instead of an ANSI divide error.
    Grouped results are fuzz-pinned equal to independent per-group
    :func:`binary_auc` runs."""
    from streamline_hybrid_engine_spark.registry import all_queries

    qs = all_queries()
    clf = qs["llm_quality_classifier"].fn(spark, sf_dir).select(
        "doc_id", F.col("logit_fp").alias("s")
    )
    qual = qs["llm_text_quality"].fn(spark, sf_dir).select(
        "doc_id", F.col("passes_filter").alias("y")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    scored = clf.join(qual, "doc_id").join(docs, "doc_id")
    return binary_auc_binned(scored, "s", "y", group_cols=("lang",))


@query(
    "llm_rouge_n_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
      FROM toks, unnest(list_transform(range(1, len(t)),
             i -> t[i] || ' ' || t[i + 1])) AS u(g)
      GROUP BY doc_id, g
    ),
    pair AS (
      SELECT r.doc_id AS ref_id,
             CAST(sum(least(r.c, c.c)) AS BIGINT) AS overlap
      FROM grams r JOIN grams c
        ON c.doc_id = r.doc_id + 1 AND c.g = r.g
      GROUP BY r.doc_id
    ),
    sizes AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM grams GROUP BY doc_id
    )
    SELECT p.ref_id, p.overlap,
           round(p.overlap / CAST(sr.n AS DOUBLE), 6) AS rouge2_recall,
           round(p.overlap / CAST(sc.n AS DOUBLE), 6) AS rouge2_precision
    FROM pair p
    JOIN sizes sr ON sr.doc_id = p.ref_id
    JOIN sizes sc ON sc.doc_id = p.ref_id + 1
    """,
    tags=("llm", "evaluation"),
)
def llm_rouge_n_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 between adjacent document pairs — the n-gram overlap
    metric summarization/dedup evals report, in its PROPER
    clipped-multiset form: overlap = Σ_g min(count_ref, count_cand)
    (the distinct-set shortcut overcounts repeated grams; counts make
    it exact and integer). Recall divides by the reference's bigram
    mass, precision by the candidate's. The adjacent-id join is the
    stand-in for any blocked candidate pair stream — at scale this
    runs on LSH candidates exactly like llm_dedup_edit_verify. Grams
    count map-side; the pair join is gram-keyed equi."""
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN"
                " transform(sequence(0, size(t) - 2),"
                " i -> concat(t[i], ' ', t[i + 1]))"
                " ELSE array() END"
            )
        ).alias("g"),
    ).groupBy("doc_id", "g").agg(F.count("*").cast("long").alias("c"))
    r = grams.select(
        F.col("doc_id").alias("ref_id"), "g", F.col("c").alias("cr")
    )
    cnd = grams.select(
        (F.col("doc_id") - 1).alias("ref_id"), "g", F.col("c").alias("cc")
    )
    pair = (
        r.join(cnd, ["ref_id", "g"])
        .groupBy("ref_id")
        .agg(F.sum(F.least("cr", "cc")).cast("long").alias("overlap"))
    )
    sizes = grams.groupBy("doc_id").agg(F.sum("c").cast("long").alias("n"))
    sr = sizes.select(F.col("doc_id").alias("ref_id"), F.col("n").alias("nr"))
    sc = sizes.select(
        (F.col("doc_id") - 1).alias("ref_id"), F.col("n").alias("nc")
    )
    return (
        pair.join(sr, "ref_id")
        .join(sc, "ref_id")
        .select(
            "ref_id",
            "overlap",
            F.round(F.col("overlap") / F.col("nr").cast("double"), 6).alias(
                "rouge2_recall"
            ),
            F.round(F.col("overlap") / F.col("nc").cast("double"), 6).alias(
                "rouge2_precision"
            ),
        )
    )


@query(
    "llm_dataset_card",
    oracle="""
    WITH base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CAST(len(string_split(text, ' ')) AS HUGEINT))
                  AS BIGINT) AS n_tokens,
             CAST(sum(CAST(n_chars AS HUGEINT)) AS BIGINT) AS total_chars,
             CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts
      FROM documents
    ),
    vocab AS (
      SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vocab_size
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    ),
    langs AS (
      SELECT lang, count(*) AS n,
             row_number() OVER (ORDER BY count(*) DESC, lang) AS rk
      FROM documents GROUP BY lang
    )
    SELECT b.n_docs, b.n_tokens, b.total_chars, v.vocab_size,
           round(1.0 - b.n_unique_texts / CAST(b.n_docs AS DOUBLE), 6)
             AS exact_dup_rate,
           (SELECT lang FROM langs WHERE rk = 1) AS top_lang,
           round((SELECT n FROM langs WHERE rk = 1)
                 / CAST(b.n_docs AS DOUBLE), 6) AS top_lang_share
    FROM base b CROSS JOIN vocab v
    """,
    tags=("llm", "reporting"),
)
def llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card: the numbers a dataset README leads with —
    documents, whitespace tokens, characters, vocabulary size, EXACT
    duplicate rate (1 − distinct md5(text)/docs) and the dominant
    language with its share. Each stat is a corpus pass the relevant
    specialized operator already audits (token stats, exact dedup,
    corpus mix); this id certifies the one-shot SUMMARY composition —
    three aggregate branches (base counts, token-distinct vocab, lang
    argmax) crossJoined as 1-row scalars. At 100 TB swap exact
    distincts for the HLL faces per agg_hll_merge's contract; the card
    is the same shape."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents", parallel=True)
    dec = "decimal(38,0)"
    base = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")).cast(dec))
        .cast("long")
        .alias("n_tokens"),
        F.sum(F.col("n_chars").cast(dec)).cast("long").alias("total_chars"),
        F.countDistinct(F.md5(F.col("text"))).cast("long").alias(
            "n_unique_texts"
        ),
    )
    vocab = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .agg(F.countDistinct("tok").cast("long").alias("vocab_size"))
    )
    wl = Window.orderBy(F.col("n").desc(), F.col("lang"))
    langs = (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n"))
        .select("lang", "n", F.row_number().over(wl).alias("rk"))
        .filter(F.col("rk") == 1)
        .select(
            F.col("lang").alias("top_lang"), F.col("n").alias("top_lang_n")
        )
    )
    return (
        base.crossJoin(vocab)
        .crossJoin(F.broadcast(langs))
        .select(
            "n_docs",
            "n_tokens",
            "total_chars",
            "vocab_size",
            F.round(
                1.0 - F.col("n_unique_texts") / F.col("n_docs").cast("double"),
                6,
            ).alias("exact_dup_rate"),
            "top_lang",
            F.round(
                F.col("top_lang_n") / F.col("n_docs").cast("double"), 6
            ).alias("top_lang_share"),
        )
    )


@query(
    "llm_dataset_card_hll",
    oracle="""
    WITH base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CAST(len(string_split(text, ' ')) AS HUGEINT))
                  AS BIGINT) AS n_tokens,
             CAST(sum(CAST(n_chars AS HUGEINT)) AS BIGINT) AS total_chars,
             CAST(count(DISTINCT md5(text)) AS BIGINT)
               AS n_unique_texts_exact
      FROM documents
    ),
    vocab AS (
      SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vocab_size_exact
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    ),
    langs AS (
      SELECT lang, count(*) AS n,
             row_number() OVER (ORDER BY count(*) DESC, lang) AS rk
      FROM documents GROUP BY lang
    )
    SELECT b.n_docs, b.n_tokens, b.total_chars,
           b.n_unique_texts_exact, TRUE AS unique_hll_within_5pct,
           v.vocab_size_exact, TRUE AS vocab_hll_within_5pct,
           (SELECT lang FROM langs WHERE rk = 1) AS top_lang,
           round((SELECT n FROM langs WHERE rk = 1)
                 / CAST(b.n_docs AS DOUBLE), 6) AS top_lang_share
    FROM base b CROSS JOIN vocab v
    """,
    tags=("llm", "reporting", "approx", "sketch", "scale-valve"),
)
def llm_dataset_card_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """llm_dataset_card with its two exact-distinct faces swapped for
    HLL sketches — the executable realization of that docstring's
    promised 100 TB path (r11-verdict missing #7): unique-text count and
    vocabulary size become one ``hll_sketch_agg`` each (mergeable,
    KB-sized state per partition — the two card stats that can't ride a
    map-side-combined sum become sketch unions; everything else on the
    card already does). ERROR-BOUND oracle (the win_hop_distinct_hll /
    agg_approx_users pattern): each sketch face rides next to its EXACT
    anchor plus a Spark-computed within-5% verdict the SQL pins TRUE —
    at fixture cardinality the sketches run sparse and land exact; the
    5% bound is the contract that survives growth."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents", parallel=True)
    dec = "decimal(38,0)"
    base = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")).cast(dec))
        .cast("long")
        .alias("n_tokens"),
        F.sum(F.col("n_chars").cast(dec)).cast("long").alias("total_chars"),
        F.countDistinct(F.md5(F.col("text")))
        .cast("long")
        .alias("n_unique_texts_exact"),
        F.expr("hll_sketch_estimate(hll_sketch_agg(md5(text)))").alias(
            "uniq_est"
        ),
    )
    vocab = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).agg(
        F.countDistinct("tok").cast("long").alias("vocab_size_exact"),
        F.expr("hll_sketch_estimate(hll_sketch_agg(tok))").alias("voc_est"),
    )
    wl = Window.orderBy(F.col("n").desc(), F.col("lang"))
    langs = (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n"))
        .select("lang", "n", F.row_number().over(wl).alias("rk"))
        .filter(F.col("rk") == 1)
        .select(
            F.col("lang").alias("top_lang"), F.col("n").alias("top_lang_n")
        )
    )

    def within(est, exact):
        return (
            F.abs(F.col(est) - F.col(exact)) <= F.col(exact) * F.lit(0.05)
        )

    return (
        base.crossJoin(vocab)
        .crossJoin(F.broadcast(langs))
        .select(
            "n_docs",
            "n_tokens",
            "total_chars",
            "n_unique_texts_exact",
            within("uniq_est", "n_unique_texts_exact").alias(
                "unique_hll_within_5pct"
            ),
            "vocab_size_exact",
            within("voc_est", "vocab_size_exact").alias(
                "vocab_hll_within_5pct"
            ),
            "top_lang",
            F.round(
                F.col("top_lang_n") / F.col("n_docs").cast("double"), 6
            ).alias("top_lang_share"),
        )
    )


@query(
    "llm_bpe_pair_counts",
    oracle="""
    WITH toks AS (
      SELECT lower(tok) AS tok, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY lower(tok)
    ),
    pairs AS (
      SELECT substr(tok, i, 2) AS pair,
             CAST(sum(freq) AS BIGINT) AS n
      FROM toks, unnest(range(1, length(tok))) AS u(i)
      GROUP BY substr(tok, i, 2)
    ),
    ranked AS (
      SELECT pair, n, row_number() OVER (ORDER BY n DESC, pair) AS rk
      FROM pairs
    )
    SELECT rk, pair, n FROM ranked WHERE rk <= 20
    """,
    tags=("llm", "tokenizer"),
)
def llm_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE training iteration's COUNTING step: the most frequent
    adjacent symbol pairs across the corpus, weighted by word
    frequency — the argmax of this table is the merge a byte-pair
    tokenizer would learn next (llm_token_count_bpe consumes a trained
    tokenizer; this is how one is built). The word-frequency rollup
    FIRST is the classic optimization: pair counting then runs over
    the vocabulary (distinct words × their frequencies), not the
    corpus — at 100 TB that's the difference between a vocab-sized and
    a corpus-sized explode. Character pairs expand in-row; counts are
    exact; top-20 ranks over the pair table."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents", parallel=True)
    toks = (
        docs.select(
            F.explode(F.split(F.col("text"), " ")).alias("raw")
        )
        .select(F.lower(F.col("raw")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    pairs = (
        toks.select(
            "freq",
            F.explode(
                F.expr(
                    "CASE WHEN length(tok) >= 2 THEN"
                    " transform(sequence(1, length(tok) - 1),"
                    " i -> substr(tok, i, 2))"
                    " ELSE array() END"
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("pair"))
    return (
        pairs.select("pair", "n", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 20)
        .select("rk", "pair", "n")
    )


#: Merge rounds for the full BPE trainer (fixed N, like KM_ROUNDS — the
#: oracle unrolls the same count under a CTE chain).
BPE_MERGES = 6

#: BPE pre-tokenizer classes (r12, r11-verdict task 7 — widened from the
#: r9 [a-z]+-only contract): CASE FOLDING IS EXPLICIT (lower() before the
#: split — merges.txt certifies on folded text, recorded here as part of
#: the contract), then GPT-2-style class splits: letter RUNS, digit RUNS,
#: and every other non-space char as its own pre-token. Spark and DuckDB
#: share this exact pattern (same class convention as llm_doc_token_stats'
#: bpe_ish counter).
BPE_PRETOK_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

#: Byte-fallback bucket spelling: a pre-token outside [a-z0-9]+ (single
#: punctuation or any non-ASCII char) becomes '<x' + lowercase hex of its
#: UTF-8 bytes + '>' — one opaque SYMBOL, so the bracket segmentation
#: encoding stays collision-free ('(' / ')' / uppercase never reach a
#: token) and merges can still learn across buckets. '<'/'>' cannot occur
#: inside letter or digit runs, so the symbol regex below is unambiguous.
BPE_SYM_RE = "<x[0-9a-f]+>|."


def bpe_pretokenize(docs: DataFrame, extra_cols: tuple = ()) -> DataFrame:
    """The widened shared pre-tokenizer: (``*extra_cols``, tok) rows from
    a ``text`` column — casefold, class split (:data:`BPE_PRETOK_RE`),
    byte-fallback bucketing for everything outside [a-z0-9]+. DuckDB
    twin: :func:`_bpe_pretok_duck`."""
    safe = F.col("raw").rlike("^[a-z0-9]+$")
    fallback = F.concat(
        F.lit("<x"),
        F.lower(F.hex(F.encode(F.col("raw"), "UTF-8"))),
        F.lit(">"),
    )
    return docs.select(
        *extra_cols,
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{BPE_PRETOK_RE}', 0)")
        ).alias("raw"),
    ).select(*extra_cols, F.when(safe, F.col("raw")).otherwise(fallback).alias("tok"))


def bpe_bracket_enc(col: str = "tok"):
    """Per-SYMBOL bracket wrap of a token: '(t)(h)(e)' for char symbols,
    '(<x2e>)' for a byte-fallback bucket — the symbol-aware widening of
    the old per-char wrap (identical on [a-z]+ tokens)."""
    return F.regexp_replace(col, f"({BPE_SYM_RE})", "($1)")


def _bpe_pretok_duck(src: str, extra: str = "") -> str:
    """DuckDB twin of :func:`bpe_pretokenize`: (``extra``, tok) rows from
    ``src`` (a table name or name+WHERE exposing ``text``). ``extra`` is
    a leading column list like ``"source, "`` carried through."""
    return f"""
      SELECT {extra}CASE WHEN regexp_matches(raw, '^[a-z0-9]+$') THEN raw
                  ELSE '<x' || lower(hex(raw)) || '>' END AS tok
      FROM (SELECT {extra}unnest(regexp_extract_all(lower(text),
                          '{BPE_PRETOK_RE}')) AS raw
            FROM {src})
    """


#: DuckDB twin of :func:`bpe_bracket_enc` (applied to a column named tok).
_BPE_BRACKET_DUCK = (
    "regexp_replace(tok, '(" + BPE_SYM_RE + ")', '(\\1)', 'g')"
)


def bpe_train_and_segment(
    words: DataFrame, n_merges: int = BPE_MERGES
) -> tuple[DataFrame, DataFrame]:
    """(merge table, final word segmentation) after ``n_merges`` BPE
    rounds — the loop body shared by :func:`bpe_train_merges` (which
    returns the merges) and llm_bpe_segment (which consumes the final
    per-word symbol state the training loop already holds). See
    bpe_train_merges for the round mechanics."""
    enc = words.select(
        "tok",
        "freq",
        bpe_bracket_enc("tok").alias("enc"),
    ).localCheckpoint(eager=False)
    merge_rows = []
    for step in range(1, n_merges + 1):
        arr = enc.select(
            "freq",
            F.split(
                F.expr("substring(enc, 2, length(enc) - 2)"), r"\)\("
            ).alias("arr"),
        )
        pairs = (
            arr.filter(F.size("arr") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(arr) - 2),"
                        " i -> struct(arr[i] AS lhs, arr[i + 1] AS rhs))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("freq").cast("long").alias("cnt"))
        )
        # LAZY checkpoint of the 1-row argmax: it has TWO consumers (this
        # round's merge row in the final union + the replace broadcast
        # below). Un-checkpointed, the merge-table evaluation re-ran every
        # round's full pair explode+count a second time at collect; lazy
        # (not eager) so it materializes inside the SAME job that builds
        # the round's broadcast — one computation, no extra job barrier.
        best = (
            pairs.orderBy(F.col("cnt").desc(), F.col("lhs"), F.col("rhs"))
            .limit(1)
            .localCheckpoint(eager=False)
        )
        merge_rows.append(
            best.select(
                F.lit(step).cast("int").alias("step"),
                "lhs",
                "rhs",
                F.col("cnt").alias("pair_count"),
            )
        )
        pat = F.concat(
            F.lit("("), F.col("lhs"), F.lit(")("), F.col("rhs"), F.lit(")")
        )
        rep = F.concat(F.lit("("), F.col("lhs"), F.col("rhs"), F.lit(")"))
        # LAZY too (r13): the round's blocks materialize inside the NEXT
        # round's broadcast-build job (which computes arr→pairs→best over
        # them) — the eager form paid one checkpoint job per round of
        # pure job-launch overhead; persist semantics still guarantee
        # each round's replace pass runs once
        enc = (
            enc.crossJoin(F.broadcast(best.select("lhs", "rhs")))
            .select("tok", "freq", F.replace("enc", pat, rep).alias("enc"))
            .localCheckpoint(eager=False)
        )
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionAll(m)
    return out, enc


def bpe_train_merges(words: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """Full iterative BPE merge training over a (tok, freq) word table —
    the N-merge driver loop llm_bpe_pair_counts is one counting step of
    (the llm_kmeans_lloyd iteration pattern applied to tokenizer
    training). Returns the learned merge table: one row per round,
    (step, lhs, rhs, pair_count).

    Segmentation state is a bracket encoding: every current symbol is
    wrapped as ``(sym)``, so a word's state is e.g. ``(t)(h)(e)``.
    Applying merge (x, y) is then ONE string replace of ``(x)(y)`` with
    ``(xy)`` — and because scanning resumes past each replacement,
    plain leftmost non-overlapping replace() IS the BPE greedy
    left-to-right pass (``(a)(a)(a)`` under merge (a,a) →
    ``(aa)(a)``, never a double merge of the shared middle). A merged
    token can never re-match as the pair's right element (xy is
    strictly longer than y), so one pass per round is exact. Brackets
    are collision-free because the caller's tokens contain only
    [a-z0-9] chars and <x..> byte-fallback symbols (the widened r12
    pre-tokenizer contract, :func:`bpe_pretokenize`, enforced upstream
    — '(' and ')' can never appear inside a token).

    Per round: adjacent-pair explode over the VOCAB-sized word table
    (never the corpus — word-frequency rollup first is the classic BPE
    trainer optimization), freq-weighted count, argmax merge (ties:
    count desc, then lexicographic (lhs, rhs) — deterministic on both
    engines, ASCII-only strings), then the merge applied via a
    broadcast 1-row cross join — NO collect, the chosen pair never
    visits the driver. Each round's word table is localCheckpoint-ed
    (eager) so the 2-consumer lineage (next round + its merge row)
    can't replay exponentially. Differential-fuzzed against a
    pure-Python BPE trainer in tests/test_property_differential.py."""
    merges, _ = bpe_train_and_segment(words, n_merges)
    return merges


def _bpe_trainer_wordfreq_duck(where: str = "") -> str:
    """The trainer's pre-tokenized word-frequency rollup (DuckDB side):
    the WIDENED contract (r12) — casefolded letter runs, digit runs, and
    byte-fallback buckets for everything else (:func:`_bpe_pretok_duck`),
    so the bracket encoding stays collision-free on realistic text.
    ``where`` optionally restricts the source documents (the deployment
    id trains on the hash-split train fold only)."""
    src = f"documents {where}" if where else "documents"
    return f"""
      SELECT tok, freq, {_BPE_BRACKET_DUCK} AS enc
      FROM (SELECT tok, CAST(count(*) AS BIGINT) AS freq
            FROM ({_bpe_pretok_duck(src)})
            GROUP BY tok)
    """


def _bpe_cte_body(with_final: bool, where: str = "") -> str:
    """Unrolled N-merge BPE training as a CTE chain (count → argmax →
    replace per round), mirroring bpe_train_and_segment round for round.
    Every CTE is MATERIALIZED: DuckDB inlines plain CTEs per reference,
    and with w{r} referencing w{r-1} through b{r} the inlined tree grows
    exponentially in rounds (the first cut of this oracle never finished
    6 rounds). The merge applies via a 1-row cross join — same empty-best
    semantics as the Spark side's broadcast crossJoin (no pairs left →
    empty word table → no further merge rows on either engine).
    ``with_final`` also materializes w{N}, the post-last-merge word
    segmentation the segment id reads."""
    ctes = [f"w0 AS MATERIALIZED ({_bpe_trainer_wordfreq_duck(where)})"]
    for r in range(1, BPE_MERGES + 1):
        prev = f"w{r - 1}"
        ctes.append(
            f"p{r} AS MATERIALIZED ("
            f" SELECT lhs, rhs, CAST(sum(freq) AS BIGINT) AS cnt FROM ("
            f"  SELECT freq, arr[i] AS lhs, arr[i + 1] AS rhs"
            f"  FROM (SELECT freq,"
            f"         string_split(substr(enc, 2, length(enc) - 2), ')(')"
            f"          AS arr FROM {prev}),"
            f"       unnest(range(1, len(arr))) AS u(i))"
            f" GROUP BY lhs, rhs)"
        )
        ctes.append(
            f"b{r} AS MATERIALIZED (SELECT lhs, rhs, cnt FROM p{r}"
            f" ORDER BY cnt DESC, lhs, rhs LIMIT 1)"
        )
        if r < BPE_MERGES or with_final:
            ctes.append(
                f"w{r} AS MATERIALIZED ("
                f" SELECT w.tok, w.freq, replace(w.enc,"
                f"  '(' || b.lhs || ')(' || b.rhs || ')',"
                f"  '(' || b.lhs || b.rhs || ')') AS enc"
                f" FROM {prev} w, b{r} b)"
            )
    return ",\n".join(ctes)


def _bpe_trainer_oracle() -> str:
    selects = " UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS step, lhs, rhs, cnt AS pair_count"
        f" FROM b{r}"
        for r in range(1, BPE_MERGES + 1)
    )
    return f"WITH {_bpe_cte_body(with_final=False)}\n{selects}"


@query(
    "llm_bpe_train_merges",
    oracle=_bpe_trainer_oracle(),
    tags=("llm", "tokenizer", "iterative"),
)
def llm_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL BPE tokenizer trainer: 6 merge rounds over the corpus
    word-frequency table — llm_bpe_pair_counts runs one round's counting
    step; this closes the loop a tokenizer-building user hits right after
    llm_tokenizer_fertility says their tokenizer is bad. Output is the
    learned merge table (step, lhs, rhs, pair_count), i.e. the merges.txt
    a BPE tokenizer ships.

    Pre-tokenizer (widened r12): explicit case folding, then GPT-2-style
    class splits — letter runs, digit runs, and byte-fallback buckets
    (``<x..>`` UTF-8-hex symbols) for punctuation and non-ASCII — so the
    trainer certifies on realistic text while the bracket segmentation
    encoding stays collision-free (see :data:`BPE_PRETOK_RE` /
    :func:`bpe_pretokenize`, and :func:`bpe_train_merges` for the round
    mechanics, checkpoint discipline, and why one replace() per round is
    exactly the greedy left-to-right merge pass).

    Scale design (100 TB corpus): ONE corpus-sized aggregation total (the
    word rollup); every round after that is vocab-sized — pair explode of
    ~|vocab| short arrays, a map-side-combined count to |pairs| cells,
    and a broadcast 1-row cross join to apply the argmax merge. No
    collect, no global sort (the argmax is a TakeOrdered over the pair
    table), rounds are a driver loop exactly like llm_kmeans_lloyd's."""
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    words = bpe_pretokenize(docs).groupBy("tok").agg(
        F.count("*").cast("long").alias("freq")
    )
    return bpe_train_merges(words, BPE_MERGES)


@query(
    "llm_bpe_segment",
    oracle=f"""
    WITH {_bpe_cte_body(with_final=True)},
    seg AS (
      SELECT tok,
             CAST(len(string_split(substr(enc, 2, length(enc) - 2), ')('))
                  AS BIGINT) AS n_syms
      FROM w{BPE_MERGES}
    ),
    sw AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS freq
      FROM ({_bpe_pretok_duck("documents", extra="source, ")})
      GROUP BY source, tok
    )
    SELECT source,
           CAST(sum(freq) AS BIGINT) AS n_words,
           CAST(count(*) AS BIGINT) AS n_distinct_words,
           CAST(sum(freq * n_syms) AS BIGINT) AS bpe_tokens,
           CAST(sum(freq * length(tok)) AS BIGINT) AS n_chars,
           CAST((sum(freq * n_syms)::HUGEINT * 1000000)
                // sum(freq) AS BIGINT) AS fertility_micro,
           CAST((sum(freq * length(tok))::HUGEINT * 1000000)
                // sum(freq * n_syms) AS BIGINT) AS chars_per_token_micro
    FROM sw JOIN seg USING (tok)
    GROUP BY source
    """,
    tags=("llm", "tokenizer", "iterative"),
)
def llm_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the trained tokenizer — the step after llm_bpe_train_merges
    that closes the train → segment → audit loop (llm_tokenizer_fertility
    audits a fixed external tokenizer; this audits the one the trainer
    just learned). The training loop's final word-segmentation state is
    reused directly (same 6 rounds, same argmax merges — the trainer
    already holds every word's post-merge symbol string; re-deriving it
    by replaying merges would double the work), then joined back to the
    per-(source, word) frequency table for the corpus-weighted report:
    tokens/word fertility and chars/token compression per source, in
    exact floored micros — the before/after numbers a tokenizer-building
    user compares against the fertility audit that sent them here.

    Scale: the segmentation table is vocab-sized (one row per distinct
    word), the per-source rollup is corpus-sized ONCE (the same word
    count every id in this family starts from), and the join is
    vocab × (source-vocab) — never corpus-wide. Sums ride exact longs;
    both divisions are integer micros (the registry's no-libm float
    discipline)."""
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    words = bpe_pretokenize(docs).groupBy("tok").agg(
        F.count("*").cast("long").alias("freq")
    )
    _, enc = bpe_train_and_segment(words, BPE_MERGES)
    seg = enc.select(
        "tok",
        F.size(
            F.split(
                F.expr("substring(enc, 2, length(enc) - 2)"), r"\)\("
            )
        )
        .cast("long")
        .alias("n_syms"),
    )
    sw = (
        bpe_pretokenize(docs, extra_cols=("source",))
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    return sw.join(seg, "tok").groupBy("source").agg(
        F.sum("freq").cast("long").alias("n_words"),
        F.count("*").cast("long").alias("n_distinct_words"),
        F.sum(F.col("freq") * F.col("n_syms")).cast("long").alias("bpe_tokens"),
        F.sum(F.col("freq") * F.length("tok")).cast("long").alias("n_chars"),
        F.expr(
            "CAST((sum(CAST(freq AS DECIMAL(38,0)) * n_syms) * 1000000)"
            " div sum(freq) AS BIGINT)"
        ).alias("fertility_micro"),
        F.expr(
            "CAST((sum(CAST(freq AS DECIMAL(38,0)) * length(tok)) * 1000000)"
            " div sum(CAST(freq AS DECIMAL(38,0)) * n_syms) AS BIGINT)"
        ).alias("chars_per_token_micro"),
    )


def bpe_apply_merges(words: DataFrame, merges: list) -> DataFrame:
    """Replay a SHIPPED merge table (the rows of merges.txt, in step
    order) over ANY word table — the INFERENCE path of a BPE tokenizer,
    the half :func:`bpe_train_merges` trains. ``words`` needs a ``tok``
    column ([a-z0-9] chars and <x..> fallback symbols per the widened
    pre-tokenizer contract, :func:`bpe_pretokenize`); ``merges`` is a
    sequence of rows/dicts with ``step``/``lhs``/``rhs`` (a collected
    merge table or a parsed merges.txt — it IS the shipped artifact, so
    driver-side literals are the honest deployment shape). Appends
    ``enc``, the bracket-encoded segmentation after all merges.

    The whole replay is ONE projection: the initial per-char bracket
    encoding with |merges| nested leftmost-non-overlapping replace()
    calls folded around it — pure whole-stage codegen, no loop state, no
    shuffle, no checkpoint (unlike training, which must re-count between
    merges). Each replace() is exactly the greedy left-to-right BPE merge
    pass (see bpe_train_merges for why), so replaying the merge list
    reproduces the trainer's internal segmentation state bit-for-bit on
    the training vocab — the merges.txt portability contract, pinned by
    test and by llm_bpe_apply_merges' oracle."""
    enc = bpe_bracket_enc("tok")
    for m in sorted(merges, key=lambda r: r["step"]):
        enc = F.replace(
            enc,
            F.lit(f"({m['lhs']})({m['rhs']})"),
            F.lit(f"({m['lhs']}{m['rhs']})"),
        )
    return words.withColumn("enc", enc)


_BPE_TRAIN_WHERE = (
    "WHERE strpos('0123456789abcdef',"
    " substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 13"
)
_BPE_HELD_WHERE = _BPE_TRAIN_WHERE.replace("< 13", ">= 13")


def _bpe_apply_oracle() -> str:
    """Train chain on the TRAIN fold, then replay b1..bN over the
    held-out fold's vocab encodings — the same replace per round, no
    recounting (that is the deployment claim). MATERIALIZED throughout
    (the iterative-oracle lesson)."""
    ctes = [_bpe_cte_body(with_final=False, where=_BPE_TRAIN_WHERE)]
    ctes.append(
        f"h0 AS MATERIALIZED ("
        f" SELECT tok, {_BPE_BRACKET_DUCK} AS enc"
        f" FROM (SELECT DISTINCT tok FROM"
        f" ({_bpe_pretok_duck(f'documents {_BPE_HELD_WHERE}')})))"
    )
    for r in range(1, BPE_MERGES + 1):
        ctes.append(
            f"h{r} AS MATERIALIZED (SELECT h.tok, replace(h.enc,"
            f" '(' || b.lhs || ')(' || b.rhs || ')',"
            f" '(' || b.lhs || b.rhs || ')') AS enc"
            f" FROM h{r - 1} h, b{r} b)"
        )
    ctes += [
        f"seg AS MATERIALIZED (SELECT tok,"
        f" CAST(len(string_split(substr(enc, 2, length(enc) - 2), ')('))"
        f" AS BIGINT) AS n_syms FROM h{BPE_MERGES})",
        f"tv AS MATERIALIZED (SELECT DISTINCT tok FROM"
        f" ({_bpe_pretok_duck(f'documents {_BPE_TRAIN_WHERE}')}))",
        f"sw AS MATERIALIZED ("
        f" SELECT source, tok, CAST(count(*) AS BIGINT) AS freq"
        f" FROM ({_bpe_pretok_duck(f'documents {_BPE_HELD_WHERE}', extra='source, ')})"
        f" GROUP BY source, tok)",
    ]
    body = ",\n".join(ctes)
    return f"""
    WITH {body}
    SELECT sw.source,
           CAST(sum(sw.freq) AS BIGINT) AS n_words,
           CAST(count(*) AS BIGINT) AS n_distinct_words,
           CAST(count(*) FILTER (WHERE tv.tok IS NULL) AS BIGINT)
             AS n_unseen_words,
           CAST(sum(sw.freq * seg.n_syms) AS BIGINT) AS bpe_tokens,
           CAST((sum(sw.freq * seg.n_syms)::HUGEINT * 1000000)
                // sum(sw.freq) AS BIGINT) AS fertility_micro
    FROM sw JOIN seg ON seg.tok = sw.tok
    LEFT JOIN tv ON tv.tok = sw.tok
    GROUP BY sw.source
    """


@query(
    "llm_bpe_apply_merges",
    oracle=_bpe_apply_oracle(),
    tags=("llm", "tokenizer", "iterative"),
)
def llm_bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE DEPLOYMENT face (r10-verdict task 6): train merges.txt on
    the hash-split TRAIN fold (the llm_train_split_hash convention,
    digit < 13), then segment the HELD-OUT folds by REPLAYING the shipped
    merge table over their vocab — never by reusing the trainer's
    internal state. This is the path that certifies merges.txt
    portability: the replay (:func:`bpe_apply_merges`, one codegen'd
    projection of chained replaces) must reproduce segmentation without
    any recounting, on text the trainer never saw. Output per held-out
    source: word/distinct counts, UNSEEN-vocab count (words absent from
    the training fold — the deployment OOV pressure a tokenizer report
    leads with), total BPE tokens, and exact floored-micros fertility —
    the numbers that tell a user whether the trained tokenizer
    generalizes off its own corpus.

    Scale: training is the audited vocab-sized loop; the replay is a
    single map over the held-out VOCAB (no corpus pass beyond the word
    rollups), the unseen check is a vocab×vocab left join, and the
    report rides exact integer sums. Precondition shared with the
    trainer: the corpus yields all BPE_MERGES merges (an empty argmax
    empties the word table on both engines identically)."""
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    digit = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
    ) - 1
    train_docs = docs.filter(digit < 13)
    held_docs = docs.filter(digit >= 13)

    def rollup(d: DataFrame) -> DataFrame:
        return (
            bpe_pretokenize(d)
            .groupBy("tok")
            .agg(F.count("*").cast("long").alias("freq"))
        )

    train_words = rollup(train_docs)
    # merges.txt: the shipped artifact — BPE_MERGES rows to the driver
    merges = [
        r.asDict()
        for r in bpe_train_merges(train_words, BPE_MERGES)
        .orderBy("step")
        .collect()
    ]
    seg = bpe_apply_merges(rollup(held_docs).select("tok"), merges).select(
        "tok",
        F.size(
            F.split(F.expr("substring(enc, 2, length(enc) - 2)"), r"\)\(")
        )
        .cast("long")
        .alias("n_syms"),
    )
    sw = (
        bpe_pretokenize(held_docs, extra_cols=("source",))
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    tv = train_words.select("tok", F.lit(1).alias("in_train"))
    if len(merges) < BPE_MERGES:
        # Degrade exactly like the oracle: when the train fold yields
        # fewer than BPE_MERGES merges, the oracle's per-round h{r} CTEs
        # cross-join an EMPTY b{r} and emit no rows — so mirror that
        # empty result instead of replaying the shorter merge list over
        # a non-empty held-out vocab (r11 ADVICE #2).
        sw = sw.limit(0)
    return (
        sw.join(seg, "tok")
        .join(tv, "tok", "left")
        .groupBy("source")
        .agg(
            F.sum("freq").cast("long").alias("n_words"),
            F.count("*").cast("long").alias("n_distinct_words"),
            F.sum(F.when(F.col("in_train").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_unseen_words"),
            F.sum(F.col("freq") * F.col("n_syms"))
            .cast("long")
            .alias("bpe_tokens"),
            F.expr(
                "CAST((sum(CAST(freq AS DECIMAL(38,0)) * n_syms) * 1000000)"
                " div sum(freq) AS BIGINT)"
            ).alias("fertility_micro"),
        )
    )


def _langid_confusion_oracle() -> str:
    langid = _REG["llm_text_langid"].oracle
    return f"""
    WITH scored AS ({langid})
    SELECT lang_actual, lang_guess,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(count(*) AS DOUBLE)
                 / CAST(sum(count(*)) OVER (PARTITION BY lang_actual)
                        AS DOUBLE), 6) AS row_share
    FROM scored GROUP BY lang_actual, lang_guess
    """


@query(
    "llm_langid_confusion",
    oracle=_langid_confusion_oracle(),
    tags=("llm", "evaluation"),
)
def llm_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the language-ID heuristic: actual × guessed
    counts with row-normalized shares — the eval view that turns
    llm_text_langid's per-doc guesses into the per-language
    precision/recall picture (which languages leak into which — the
    input to threshold or marker-list tuning; llm_langid_consistency
    checks stability, this checks CORRECTNESS against labels). Pure
    composition: the scorer's own audited query feeds a |langs|²
    groupBy; the row normalization windows over that tiny matrix.
    Matrix algebra lives in the exported :func:`confusion_matrix`
    primitive (library pass 4)."""
    from streamline_hybrid_engine_spark.registry import all_queries

    scored = all_queries()["llm_text_langid"].fn(spark, sf_dir)
    return confusion_matrix(scored, "lang_actual", "lang_guess")


def confusion_matrix(
    scored: DataFrame, actual_col: str, guess_col: str
) -> DataFrame:
    """Library primitive (r8 pass 4): confusion matrix with row-share
    normalization for ANY (actual, guess) label pair — the core behind
    llm_langid_confusion. One |classes|² groupBy of the scored table,
    then the normalization windows over that tiny matrix (nothing
    fact-sized after the count). Returns
    (actual_col, guess_col, n, row_share); rows with n = 0 are absent
    (sparse form — the consumer's pivot fills zeros)."""
    from pyspark.sql import Window

    t = scored.groupBy(actual_col, guess_col).agg(
        F.count("*").cast("long").alias("n")
    )
    wrow = Window.partitionBy(actual_col)
    return t.select(
        actual_col,
        guess_col,
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wrow).cast("double"),
            6,
        ).alias("row_share"),
    )


# --- ROUGE-L: LCS-based pair metric over LSH candidates (r7 verdict task 5) ---

#: token clip for the per-pair LCS. The bit-parallel fold keeps one
#: machine word of DP state per pair, so the clip must stay < 63 bits;
#: 32 tokens bounds the fold at 32×32 JVM ops per pair while covering
#: the fixture docs' headline content (same bounded-verify economics as
#: llm_dedup_edit_verify's 80-char prefix).
ROUGE_L_CLIP = 32

#: one bit-parallel LCS round (Crochemore–Iliopoulos–Pinzon–Reid 2001):
#: with M = match mask of the next reference token against the candidate
#: tokens, L' = ((L + (L & M)) | (L & ~M)) masked to |b| bits; after
#: folding all of `a`, LCS = |b| − popcount(L). Fuzz-verified against the
#: classic O(n·m) DP (tests/test_property_differential.py).
_LCS_EXPR = """
CASE WHEN size(a) = 0 OR size(b) = 0 THEN CAST(0 AS BIGINT) ELSE CAST(
  size(b) - bit_count(
    aggregate(
      transform(a, tok ->
        aggregate(sequence(0, size(b) - 1), CAST(0 AS BIGINT),
          (m, j) -> CASE WHEN element_at(b, j + 1) = tok
                    THEN m | shiftleft(CAST(1 AS BIGINT), j)
                    ELSE m END)),
      shiftleft(CAST(1 AS BIGINT), size(b)) - 1,
      (L, M) -> ((L + (L & M)) | (L & ~M))
                & (shiftleft(CAST(1 AS BIGINT), size(b)) - 1)
    )
  ) AS BIGINT) END
"""


def _rouge_l_oracle() -> str:
    from streamline_hybrid_engine_spark.llm.dedup import BAND_ROWS, _ORACLE_SIGS

    return f"""
    WITH RECURSIVE sigs AS ({_ORACLE_SIGS}),
    bands AS (
      SELECT doc_id, seed // {BAND_ROWS} AS band,
             md5(string_agg(mh::VARCHAR, '|' ORDER BY seed)) AS bandsig
      FROM sigs GROUP BY doc_id, seed // {BAND_ROWS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id < b.doc_id
    ),
    toks AS (
      SELECT doc_id, list_slice(string_split(text, ' '), 1, {ROUGE_L_CLIP}) AS t
      FROM documents
    ),
    p AS (
      SELECT c.d1, c.d2, ta.t AS a, tb.t AS b
      FROM cand c
      JOIN toks ta ON ta.doc_id = c.d1
      JOIN toks tb ON tb.doc_id = c.d2
    ),
    dp AS (
      SELECT d1, d2, a, b, 0 AS i,
             CAST((CAST(1 AS BIGINT) << len(b)) - 1 AS BIGINT) AS L
      FROM p
      UNION ALL
      SELECT d1, d2, a, b, i + 1,
             CAST((((L + (L & M)) | (L & ~M))
                   & ((CAST(1 AS BIGINT) << len(b)) - 1)) AS BIGINT)
      FROM (
        SELECT d1, d2, a, b, i, L,
               CAST(coalesce(list_sum(list_transform(range(1, len(b) + 1),
                     j -> CASE WHEN b[j] = a[i + 1]
                          THEN (CAST(1 AS BIGINT) << (j - 1))
                          ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT) AS M
        FROM dp WHERE i < len(a)
      )
    ),
    fin AS (
      SELECT d1, d2,
             CAST(len(a) AS BIGINT) AS la,
             CAST(len(b) AS BIGINT) AS lb,
             CAST(len(b) - bit_count(CAST(L AS BIGINT)) AS BIGINT) AS lcs_len
      FROM dp WHERE i = len(a)
    )
    SELECT d1, d2, lcs_len,
           round(lcs_len / CAST(la AS DOUBLE), 6) AS rougel_recall,
           round(lcs_len / CAST(lb AS DOUBLE), 6) AS rougel_precision,
           round(2.0 * lcs_len / CAST(la + lb AS DOUBLE), 6) AS rougel_f1
    FROM fin
    """


@query(
    "llm_rouge_l_pairs",
    oracle=_rouge_l_oracle(),
    tags=("llm", "evaluation"),
)
def llm_rouge_l_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-L between LSH candidate pairs — the LCS-based metric that
    completes the eval family next to `llm_rouge_n_pairs`' clipped n-gram
    overlap (a summarization scorer migrating from ROUGE-2 to ROUGE-L is
    the capability edge r7's verdict named). Semantics: token-level
    longest common subsequence on the first ROUGE_L_CLIP tokens of each
    side; recall = LCS/|ref|, precision = LCS/|cand|, and F1 reduces to
    2·LCS/(|ref|+|cand|) — all exact integers over a division, so the
    hash can't drift.

    The O(n·m) LCS DP is collapsed into a bit-parallel fold (CIPR 2001):
    the whole DP state is ONE 64-bit word per pair, updated by `aggregate`
    over precomputed per-token match masks — pure JVM codegen, zero
    Python, zero extra shuffle beyond the candidate join. The clip bounds
    the word width (< 63 bits) and the LSH candidate set bounds the pair
    count — never all-pairs, never full-document DP, exactly the
    `llm_dedup_edit_verify` economics. Oracle: the identical fold as a
    DuckDB recursive CTE over the same shared-formulation candidate CTE —
    a different evaluator of the same recurrence, so a masking or
    fencepost slip in either engine breaks the hash."""
    from streamline_hybrid_engine_spark.llm.dedup import llm_dedup_minhash_pairs

    pairs = llm_dedup_minhash_pairs(spark, sf_dir).select("d1", "d2")
    docs = load_table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id",
        F.slice(F.split(F.col("text"), " "), 1, ROUGE_L_CLIP).alias("toks"),
    )
    ta = docs.select(F.col("doc_id").alias("d1"), F.col("toks").alias("a"))
    # b-side match masks built ONCE PER DOC as a token→word map (the r9
    # amortization the clip-126 sibling already uses, applied here in
    # r12): the inline `_LCS_EXPR` redid the O(|a|·|b|) mask fold inside
    # every pair — k× redundantly for a doc in k LSH candidate pairs —
    # where the map form pays σ·|b| once per doc and O(|a|) lookups per
    # pair. Same recurrence, same words (nw=1 at clip 32), fuzz-pinned
    # identical to the classic DP.
    tb = docs.select(
        F.col("doc_id").alias("d2"),
        F.size("toks").cast("int").alias("nb"),
        F.expr(lcs_bmap_expr(ROUGE_L_CLIP, b="toks")).alias("bm"),
    )
    j = (
        pairs.join(ta, "d1")
        .join(tb, "d2")
        .withColumn("lcs_len", F.expr(lcs_fold_map_expr(ROUGE_L_CLIP)))
    )
    la = F.size("a").cast("double")
    lb = F.col("nb").cast("double")
    return j.select(
        "d1",
        "d2",
        "lcs_len",
        F.round(F.col("lcs_len") / la, 6).alias("rougel_recall"),
        F.round(F.col("lcs_len") / lb, 6).alias("rougel_precision"),
        F.round(F.lit(2.0) * F.col("lcs_len") / (la + lb), 6).alias(
            "rougel_f1"
        ),
    )


# --- long-document ROUGE-L: multi-word bit-parallel LCS (r8 verdict task 4) ---

#: usable bits per signed-BIGINT word of LCS state. 62 keeps the carry
#: chain overflow-free: word + (word & mask) + carry_in ≤
#: (2^62−1)+(2^62−1)+1 = 2^63−1, the exact top of signed 64 — so the
#: multi-precision add never wraps and the carry is one unsigned shift.
LCS_WORD_BITS = 62

#: token clip for the long-form pair metric: 126 = the widest clip the
#: DuckDB oracle can hold in ONE HUGEINT word (127 usable bits on signed
#: 128) — which is the point: Spark folds ceil(126/62)=3 carry-chained
#: 62-bit words while the oracle folds a single 126-bit word, so a carry
#: or fencepost slip in either engine's arithmetic breaks the hash. The
#: Spark-side generator itself has no such cap (any clip = more words).
ROUGE_L_LONG_CLIP = 126


def lcs_fold_expr(clip: int, a: str = "a", b: str = "b") -> str:
    """SQL expression for token-level LCS length between array columns
    `a` and `b` (each of size ≤ clip), as a MULTI-WORD bit-parallel
    CIPR fold — the lift of the one-word `_LCS_EXPR` (clip ≤ 62) to
    arbitrary clips (r8 verdict task 4: 200-token summarization
    references stop being out of contract).

    State is ceil(clip/62) signed-64 words of 62 usable bits each; per
    reference token the recurrence L' = ((L + (L & M)) | (L & ~M)) & ones
    runs word-by-word, with ONLY the addition carrying across words
    (OR/AND are per-word): s_w = L_w + (L_w & M_w) + c_w, c_{w+1} =
    s_w >>> 62 — overflow-free by the LCS_WORD_BITS argument. Pure JVM
    whole-stage codegen, zero Python, zero shuffle. Fuzzed against the
    classic O(n·m) DP at every word boundary (61/62/63, 123/124/125)
    plus the 64-bit-intuition clips 64/65/127/128
    (tests/test_property_differential.py)."""
    nw = (max(1, clip) + LCS_WORD_BITS - 1) // LCS_WORD_BITS
    m62 = f"CAST({(1 << LCS_WORD_BITS) - 1} AS BIGINT)"

    def wmask(w: int) -> str:
        # bits of b that land in word w: (1 << nb_w) - 1 with
        # nb_w = clamp(size(b) - 62w, 0, 62); shiftleft(1, 0..62)-1 is safe
        return (
            f"(shiftleft(CAST(1 AS BIGINT), "
            f"greatest(0, least({LCS_WORD_BITS}, "
            f"size({b}) - {w * LCS_WORD_BITS}))) - 1)"
        )

    def tok_mask(w: int) -> str:
        lo = w * LCS_WORD_BITS
        return (
            f"aggregate(sequence({lo}, {lo + LCS_WORD_BITS - 1}), "
            f"CAST(0 AS BIGINT), (m, j) -> "
            f"CASE WHEN j < size({b}) AND element_at({b}, j + 1) = tok "
            f"THEN m | shiftleft(CAST(1 AS BIGINT), j - {lo}) ELSE m END)"
        )

    masks = ", ".join(tok_mask(w) for w in range(nw))
    init = ", ".join(wmask(w) for w in range(nw))
    # carry-chained word updates: build s_w as an expression string that
    # embeds the previous word's carry (expression size grows O(nw²) —
    # constant once the clip is chosen)
    carry = "CAST(0 AS BIGINT)"
    words = []
    for w in range(nw):
        lw = f"element_at(L, {w + 1})"
        mw = f"element_at(M, {w + 1})"
        s = f"({lw} + ({lw} & {mw}) + {carry})"
        words.append(f"((({s} & {m62}) | ({lw} & ~{mw})) & {wmask(w)})")
        carry = f"shiftrightunsigned({s}, {LCS_WORD_BITS})"
    popcnt = " + ".join(f"bit_count(element_at(L, {w + 1}))" for w in range(nw))
    # the 4-arg aggregate: the `finish` lambda binds the final state ONCE
    # so the per-word popcounts don't re-evaluate the whole fold
    return f"""
CASE WHEN size({a}) = 0 OR size({b}) = 0 THEN CAST(0 AS BIGINT) ELSE
  aggregate(
    transform({a}, tok -> array({masks})),
    array({init}),
    (L, M) -> array({", ".join(words)}),
    L -> CAST(size({b}) - ({popcnt}) AS BIGINT)
  )
END
"""


def lcs_bmap_expr(clip: int, b: str = "b") -> str:
    """Per-DOCUMENT token → match-mask-words map for the multi-word LCS
    fold: for every distinct token of `{b}`, the ceil(clip/62)-word bit
    mask of its positions. This is the candidate-degree amortization of
    `lcs_fold_expr`'s inline masks: the inline form recomputes doc b's
    mask table inside EVERY pair (O(|a|·|b|) interpreted-lambda work per
    pair, k× redundantly for a doc in k LSH pairs); building the map
    once per doc makes the per-pair fold O(|a|) map lookups — the form
    that holds up when a hot near-dup cluster gives one doc thousands
    of candidate pairs at 100 TB. One |b| scan per distinct token
    (σ·|b| per doc, paid once)."""
    nw = (max(1, clip) + LCS_WORD_BITS - 1) // LCS_WORD_BITS
    zeros = ", ".join(["CAST(0 AS BIGINT)"] * nw)
    upd = ", ".join(
        f"CASE WHEN (j div {LCS_WORD_BITS}) = {w} THEN "
        f"element_at(m, {w + 1}) | shiftleft(CAST(1 AS BIGINT), "
        f"j % {LCS_WORD_BITS}) ELSE element_at(m, {w + 1}) END"
        for w in range(nw)
    )
    return (
        f"map_from_entries(transform(array_distinct({b}), t -> struct(t, "
        f"aggregate(sequence(0, size({b}) - 1), array({zeros}), "
        f"(m, j) -> CASE WHEN element_at({b}, j + 1) = t "
        f"THEN array({upd}) ELSE m END))))"
    )


def lcs_fold_map_expr(
    clip: int, a: str = "a", bmap: str = "bm", bsize: str = "nb"
) -> str:
    """The `lcs_fold_expr` recurrence with match masks looked up from a
    precomputed per-doc map (`lcs_bmap_expr`) instead of rebuilt inline
    per pair. Identical arithmetic — same words, same carry chain, same
    final popcount — so it is fuzzed against the classic DP alongside
    the inline form; `{bsize}` is the b-side token count column (the
    map cannot answer size())."""
    nw = (max(1, clip) + LCS_WORD_BITS - 1) // LCS_WORD_BITS
    m62 = f"CAST({(1 << LCS_WORD_BITS) - 1} AS BIGINT)"
    zeros = ", ".join(["CAST(0 AS BIGINT)"] * nw)

    def wmask(w: int) -> str:
        return (
            f"(shiftleft(CAST(1 AS BIGINT), "
            f"greatest(0, least({LCS_WORD_BITS}, "
            f"{bsize} - {w * LCS_WORD_BITS}))) - 1)"
        )

    init = ", ".join(wmask(w) for w in range(nw))
    carry = "CAST(0 AS BIGINT)"
    words = []
    for w in range(nw):
        lw = f"element_at(L, {w + 1})"
        mw = f"element_at(M, {w + 1})"
        s = f"({lw} + ({lw} & {mw}) + {carry})"
        words.append(f"((({s} & {m62}) | ({lw} & ~{mw})) & {wmask(w)})")
        carry = f"shiftrightunsigned({s}, {LCS_WORD_BITS})"
    popcnt = " + ".join(
        f"bit_count(element_at(L, {w + 1}))" for w in range(nw)
    )
    return f"""
CASE WHEN size({a}) = 0 OR {bsize} = 0 THEN CAST(0 AS BIGINT) ELSE
  aggregate(
    transform({a}, tok -> coalesce(element_at({bmap}, tok), array({zeros}))),
    array({init}),
    (L, M) -> array({", ".join(words)}),
    L -> CAST({bsize} - ({popcnt}) AS BIGINT)
  )
END
"""


def _rouge_l_long_oracle() -> str:
    from streamline_hybrid_engine_spark.llm.dedup import BAND_ROWS, _ORACLE_SIGS

    return f"""
    WITH RECURSIVE sigs AS ({_ORACLE_SIGS}),
    bands AS (
      SELECT doc_id, seed // {BAND_ROWS} AS band,
             md5(string_agg(mh::VARCHAR, '|' ORDER BY seed)) AS bandsig
      FROM sigs GROUP BY doc_id, seed // {BAND_ROWS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id < b.doc_id
    ),
    toks AS (
      SELECT doc_id,
             list_slice(string_split(text, ' '), 1, {ROUGE_L_LONG_CLIP}) AS t
      FROM documents
    ),
    p AS (
      SELECT c.d1, c.d2, ta.t AS a, tb.t AS b
      FROM cand c
      JOIN toks ta ON ta.doc_id = c.d1
      JOIN toks tb ON tb.doc_id = c.d2
    ),
    dp AS (
      SELECT d1, d2, a, b, 0 AS i,
             ((1::HUGEINT << len(b)) - 1) AS L
      FROM p
      UNION ALL
      SELECT d1, d2, a, b, i + 1,
             (((L + (L & M)) | (L & ~M)) & ((1::HUGEINT << len(b)) - 1))
      FROM (
        SELECT d1, d2, a, b, i, L,
               coalesce(list_sum(list_transform(range(1, len(b) + 1),
                     j -> CASE WHEN b[j] = a[i + 1]
                          THEN (1::HUGEINT << (j - 1))
                          ELSE 0::HUGEINT END)), 0::HUGEINT) AS M
        FROM dp WHERE i < len(a)
      )
    ),
    fin AS (
      SELECT d1, d2,
             CAST(len(a) AS BIGINT) AS la,
             CAST(len(b) AS BIGINT) AS lb,
             CAST(len(b) - bit_count(L) AS BIGINT) AS lcs_len
      FROM dp WHERE i = len(a)
    )
    SELECT d1, d2, lcs_len,
           round(lcs_len / CAST(la AS DOUBLE), 6) AS rougel_recall,
           round(lcs_len / CAST(lb AS DOUBLE), 6) AS rougel_precision,
           round(2.0 * lcs_len / CAST(la + lb AS DOUBLE), 6) AS rougel_f1
    FROM fin
    """


@query(
    "llm_rouge_l_long",
    oracle=_rouge_l_long_oracle(),
    tags=("llm", "evaluation"),
)
def llm_rouge_l_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-document ROUGE-L between LSH candidate pairs: the clip-126
    lift of `llm_rouge_l_pairs` (clip 32) via the multi-word
    bit-parallel LCS (r8 verdict task 4 — the difference between a demo
    metric and one a summarization-eval user can run on real
    references). Spark folds three carry-chained 62-bit BIGINT words
    per pair; the DuckDB oracle folds the SAME recurrence in one
    126-bit HUGEINT word — two different machine arithmetics evaluating
    one recurrence, so a carry-propagation or word-boundary slip in
    either engine breaks the hash. Candidate economics unchanged: LSH
    band pairs only, never all-pairs; the fold is pure JVM, zero
    Python, zero extra shuffle. r9 perf: the b-side match masks are
    built ONCE PER DOC as a token→words map (`lcs_bmap_expr`, below
    the join) instead of inline per pair — the inline form redid
    O(|a|·|b|) mask work for every pair, k× redundantly for a doc in
    k candidate pairs (and a hot near-dup cluster at 100 TB means
    large k); the fold is now O(|a|) map lookups per pair
    (11.7 s → re-measured after the change, BASELINE.md r9 block)."""
    from streamline_hybrid_engine_spark.llm.dedup import llm_dedup_minhash_pairs

    pairs = llm_dedup_minhash_pairs(spark, sf_dir).select("d1", "d2")
    docs = load_table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id",
        F.slice(F.split(F.col("text"), " "), 1, ROUGE_L_LONG_CLIP).alias(
            "toks"
        ),
    )
    ta = docs.select(F.col("doc_id").alias("d1"), F.col("toks").alias("a"))
    tb = docs.select(
        F.col("doc_id").alias("d2"),
        F.size("toks").cast("int").alias("nb"),
        F.expr(lcs_bmap_expr(ROUGE_L_LONG_CLIP, b="toks")).alias("bm"),
    )
    j = (
        pairs.join(ta, "d1")
        .join(tb, "d2")
        .withColumn("lcs_len", F.expr(lcs_fold_map_expr(ROUGE_L_LONG_CLIP)))
    )
    la = F.size("a").cast("double")
    lb = F.col("nb").cast("double")
    return j.select(
        "d1",
        "d2",
        "lcs_len",
        F.round(F.col("lcs_len") / la, 6).alias("rougel_recall"),
        F.round(F.col("lcs_len") / lb, 6).alias("rougel_precision"),
        F.round(F.lit(2.0) * F.col("lcs_len") / (la + lb), 6).alias(
            "rougel_f1"
        ),
    )


RESERVOIR_K = 50


@query(
    "llm_sample_reservoir_k",
    oracle=f"""
    SELECT source, doc_id, hk
    FROM (
      SELECT source, doc_id,
             substr(md5('rsv1|' || CAST(doc_id AS VARCHAR)), 1, 12) AS hk,
             row_number() OVER (
               PARTITION BY source
               ORDER BY substr(md5('rsv1|' || CAST(doc_id AS VARCHAR)), 1, 12),
                        doc_id
             ) AS rn
      FROM documents
    ) t WHERE rn <= {RESERVOIR_K}
    """,
    tags=("llm", "sampling"),
)
def llm_sample_reservoir_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-k uniform sample per source — the
    reproducible replacement for reservoir sampling in a training-data
    pipeline (classic reservoir is stream-order-dependent, so two runs
    over the same corpus disagree; content-keyed hash ranking gives the
    same k docs on every run, every partitioning, every engine — the
    property that makes sample audits and incremental re-runs possible).
    Keep the k={RESERVOIR_K} docs with the smallest salted-md5 rank per
    source; the salt decorrelates this sample from every other hash
    decision in the pipeline (split/dedup/temperature all use different
    salts). Uniformity: md5 is uniform on doc ids, so rank-k selection
    is a simple random sample conditioned on the corpus — same
    hash-threshold discipline as llm_train_split_hash, fixed COUNT
    instead of fixed RATE. Scale: per-group top-k by hash rank — the
    window sort is per-source; at 100 TB swap for the max_by-k/
    TakeOrdered per group spelling (no global sort either way)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    hk = F.substring(
        F.md5(F.concat(F.lit("rsv1|"), F.col("doc_id").cast("string"))), 1, 12
    )
    w = Window.partitionBy("source").orderBy("hk", "doc_id")
    return (
        docs.select("source", "doc_id", hk.alias("hk"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= RESERVOIR_K)
        .drop("rn")
    )


# --- Interpolated Kneser-Ney bigram LM scoring (exact rational) ---------------

#: shared CTE prefix: corpus bigram instances → counts → context stats
#: (cv + N1v fused) → continuation stats → type total → exact-rational
#: per-bigram p(w|v) in fixed-point micros. Reused verbatim by the
#: doc-scoring id, the top-followers drill-down and (with `{src}` bound
#: to the TRAIN split) the held-out scorer, so every oracle certifies
#: the SAME LM.
_KN_CTES_TMPL = """
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM {src}
    ),
    big_inst AS (
      SELECT doc_id, t[i] AS v, t[i + 1] AS w
      FROM tok, unnest(range(1, len(t))) AS u(i)
    ),
    big AS (
      SELECT v, w, CAST(count(*) AS BIGINT) AS c
      FROM big_inst GROUP BY v, w
    ),
    vstats AS (
      SELECT v, CAST(sum(c) AS BIGINT) AS cv,
             CAST(count(*) AS BIGINT) AS n1v
      FROM big GROUP BY v
    ),
    wstats AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n1w FROM big GROUP BY w
    ),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM big),
    p AS (
      SELECT b.v, b.w,
             CAST((((4 * b.c - 3)::HUGEINT * nt.nt
                    + 3::HUGEINT * vs.n1v * ws.n1w) * 1000000)
                  // (4::HUGEINT * vs.cv * nt.nt) AS BIGINT) AS p_micro
      FROM big b
      JOIN vstats vs ON vs.v = b.v
      JOIN wstats ws ON ws.w = b.w
      CROSS JOIN nt
    )
"""

_KN_CTES = _KN_CTES_TMPL.format(src="documents")

_KN_ORACLE = _KN_CTES + """
    SELECT i.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(p.p_micro) AS BIGINT) AS sum_p_micro,
           CAST(sum(p.p_micro) // count(*) AS BIGINT) AS mean_p_micro
    FROM big_inst i JOIN p ON p.v = i.v AND p.w = i.w
    GROUP BY i.doc_id
"""


def _bigram_instances(docs: DataFrame) -> DataFrame:
    """(doc_id, v, w) bigram instances — one explode pass, ANSI-safe for
    docs of < 2 tokens (empty array, no row). Shared by the KN trainer
    and the held-out scorer so both sides tokenize identically."""
    return (
        docs.withColumn("t", F.split(F.col("text"), " "))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(t) >= 2 THEN"
                    " transform(sequence(0, size(t) - 2),"
                    " i -> struct(t[i] AS v, t[i + 1] AS w))"
                    " ELSE array() END"
                )
            ).alias("vw"),
        )
        .select("doc_id", "vw.v", "vw.w")
    )


def _kn_tables(spark: SparkSession, sf_dir: str, docs: DataFrame | None = None):
    """The KN LM's constituent tables — bigram instances, gram counts,
    context stats (cv + N1v fused in one groupBy), continuation stats,
    type total, and the exact-rational per-bigram p(w|v) in micros —
    shared by the doc-scoring id, the top-followers drill-down and the
    held-out scorer, which trains on the split subset it passes as
    `docs` (mirrors the SQL side's _KN_CTES_TMPL `{src}` binding)."""
    if docs is None:
        docs = load_table(spark, sf_dir, "documents", parallel=True)
    inst = _bigram_instances(docs)
    big = inst.groupBy("v", "w").agg(F.count("*").cast("long").alias("c"))
    vstats = big.groupBy("v").agg(
        F.sum("c").cast("long").alias("cv"),
        F.count("*").cast("long").alias("n1v"),
    )
    wstats = big.groupBy("w").agg(F.count("*").cast("long").alias("n1w"))
    nt = big.agg(F.count("*").cast("long").alias("nt"))
    p = (
        big.join(vstats, "v")
        .join(wstats, "w")
        .crossJoin(F.broadcast(nt))
        .select(
            "v",
            "w",
            F.expr(
                "CAST((((4 * c - 3) * CAST(nt AS DECIMAL(38,0))"
                "       + 3 * CAST(n1v AS DECIMAL(38,0)) * n1w) * 1000000)"
                "     div (4 * CAST(cv AS DECIMAL(38,0)) * nt) AS BIGINT)"
            ).alias("p_micro"),
        )
    )
    return inst, big, vstats, wstats, nt, p


@query("llm_ngram_lm_kn", oracle=_KN_ORACLE, tags=("llm", "quality"))
def llm_ngram_lm_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram language-model scoring per doc —
    the real-LM upgrade of llm_surprisal_bits' unigram proxy, and the
    quality signal CCNet-style pipelines filter on (docs whose bigrams
    the corpus LM finds improbable are boilerplate/noise/foreign). KN is
    THE standard smoothed n-gram estimator: p(w|v) = (c(vw) − d)/c(v) +
    d·N1+(v·)/c(v) · N1+(·w)/N1+(··), absolute discount d interpolated
    with the CONTINUATION probability (how many contexts a word follows,
    not how often — the insight that made KN the default).

    Exactness discipline: d = 3/4 makes every per-bigram probability the
    exact rational ((4c−3)·N + 3·N1v·N1w) / (4·c_v·N); the engine floors
    it once to fixed-point micros — Spark computes the products in
    decimal(38,0) with integral `div`, DuckDB in HUGEINT with `//`, both
    exact floor on positives (the cross-engine trap catalogue's
    HUGEINT/decimal rule), so the hash certifies the entire LM, not a
    float approximation of it. Σ_w p(w|v) = 1 pre-floor by construction
    (test-pinned). Plan: one explode pass builds instances; counts,
    context stats (cv + N1v fused in ONE groupBy), continuation stats
    and the type total are all aggregate-sized; scoring re-joins the
    instances gram-keyed — never more than |corpus bigrams| rows in
    flight, same economics as TF-IDF. Docs with < 2 tokens carry no
    bigram and emit no row (both engines, inner join)."""
    inst, big, vstats, wstats, nt, p = _kn_tables(spark, sf_dir)
    return (
        inst.join(p, ["v", "w"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("p_micro").cast("long").alias("sum_p_micro"),
        )
        .withColumn(
            "mean_p_micro", F.expr("sum_p_micro div n_bigrams").cast("long")
        )
    )


#: contexts ranked by corpus frequency kept in the follower table. The
#: fixture contract uses a deterministic top-N (cv DESC, v ASC) so the
#: hash is stable; at 100 TB the same query swaps the metadata-sized
#: rank window for a cv ≥ threshold filter (no ordering at all) — a
#: documented valve, not a semantics change.
KN_TOP_CONTEXTS = 100

#: followers kept per context (p_micro DESC, w ASC — exact-integer
#: probabilities make ties real, the tiebreak makes them deterministic).
KN_TOP_FOLLOWERS = 5

_KN_FOLLOWERS_ORACLE = _KN_CTES + f"""
    , ctx AS (
      SELECT v, cv, ctx_rank FROM (
        SELECT v, cv,
               row_number() OVER (ORDER BY cv DESC, v) AS ctx_rank
        FROM vstats
      ) WHERE ctx_rank <= {KN_TOP_CONTEXTS}
    ),
    ranked AS (
      SELECT c.v, p.w, b.c AS c_vw, p.p_micro,
             CAST(c.ctx_rank AS BIGINT) AS ctx_rank,
             row_number() OVER (PARTITION BY c.v
                                ORDER BY p.p_micro DESC, p.w)
               AS follower_rank
      FROM ctx c
      JOIN p ON p.v = c.v
      JOIN big b ON b.v = p.v AND b.w = p.w
    )
    SELECT v, w, c_vw, p_micro, ctx_rank,
           CAST(follower_rank AS BIGINT) AS follower_rank
    FROM ranked WHERE follower_rank <= {KN_TOP_FOLLOWERS}
"""


@query(
    "llm_kn_top_followers",
    oracle=_KN_FOLLOWERS_ORACLE,
    tags=("llm", "quality"),
)
def llm_kn_top_followers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-context top-follower table of the Kneser-Ney bigram LM — the
    drill-down the r8 verdict asked for (task 6): keep the LM's pieces,
    skip the per-doc collapse. For the KN_TOP_CONTEXTS most frequent
    contexts v, the KN_TOP_FOLLOWERS most probable followers w with
    their raw count and exact-rational p_micro — the table a curation
    engineer reads to sanity-check what the LM actually learned (and
    the N1+(v·) continuation inputs are already inside these rows'
    arithmetic). Pure COMPOSITION of _kn_tables' audited aggregates:
    the only additions are one metadata-sized rank window over vstats
    (vocabulary rows — the documented valve swaps it for a cv-threshold
    filter at scale), a context semi-reduction of p BEFORE the follower
    window (so the rank sort touches ≤ KN_TOP_CONTEXTS contexts' rows),
    and the gram-keyed count re-join. No new corpus-sized shuffle."""
    from pyspark.sql import Window

    inst, big, vstats, wstats, nt, p = _kn_tables(spark, sf_dir)
    wctx = Window.orderBy(F.col("cv").desc(), "v")
    ctx = (
        vstats.withColumn("ctx_rank", F.row_number().over(wctx))
        .filter(F.col("ctx_rank") <= KN_TOP_CONTEXTS)
        .select("v", F.col("ctx_rank").cast("long").alias("ctx_rank"))
    )
    wf = Window.partitionBy("v").orderBy(F.col("p_micro").desc(), "w")
    return (
        p.join(ctx, "v")
        .join(big, ["v", "w"])
        .withColumn("follower_rank", F.row_number().over(wf))
        .filter(F.col("follower_rank") <= KN_TOP_FOLLOWERS)
        .select(
            "v",
            "w",
            F.col("c").alias("c_vw"),
            "p_micro",
            "ctx_rank",
            F.col("follower_rank").cast("long").alias("follower_rank"),
        )
    )


# --- r9 wave: tokenizer fertility, BLEU-2 pairs, held-out KN scoring ----------


@query(
    "llm_tokenizer_fertility",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
           CAST(sum(len(regexp_extract_all(text,
                '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS bpe_tokens,
           CAST(sum(strlen(text)) AS BIGINT) AS n_bytes,
           CAST((sum(len(regexp_extract_all(text,
                  '[a-z]+|[0-9]+|[^a-z0-9 ]')))::HUGEINT * 1000000)
                // greatest(sum(len(string_split(text, ' ')))::HUGEINT, 1)
                AS BIGINT) AS fertility_micro,
           CAST((sum(strlen(text))::HUGEINT * 1000000)
                // greatest(sum(len(regexp_extract_all(text,
                     '[a-z]+|[0-9]+|[^a-z0-9 ]')))::HUGEINT, 1)
                AS BIGINT) AS bytes_per_token_micro
    FROM documents GROUP BY lang
    """,
    tags=("llm", "text", "tokens"),
)
def llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language — the standard multilingual
    tokenizer evaluation: subword tokens per whitespace word (fertility)
    and bytes per subword token, per declared language. High fertility
    means the tokenizer fragments that language's words (poor vocab
    coverage → the language gets fewer effective context tokens); the
    table is what a tokenizer-selection study reports (e.g. the XLM-R /
    NLLB tokenizer audits). Uses the same BPE-ish regex pieces as
    llm_token_count_bpe so the two ids triangulate one tokenizer. The
    ratios are floored fixed-point micros via exact integral division
    (HUGEINT // vs decimal div — the cross-engine rule), denominators
    clamped ≥ 1 so an all-space pathological shard can't divide by zero
    under ANSI. Plan: one scan, one language-keyed partial aggregate —
    no joins, no windows; at 100 TB this is a pure map-side-combine
    groupBy on a ~dozen-key column."""
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    bpe = F.size(
        F.expr(r"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")
    )
    agg = docs.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("ws_tokens"),
        F.sum(bpe).cast("long").alias("bpe_tokens"),
        F.sum(F.octet_length("text")).cast("long").alias("n_bytes"),
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    return agg.select(
        "lang",
        "n_docs",
        "ws_tokens",
        "bpe_tokens",
        "n_bytes",
        F.expr(
            f"CAST(({dec.format('bpe_tokens')} * 1000000)"
            f" div greatest({dec.format('ws_tokens')}, 1) AS BIGINT)"
        ).alias("fertility_micro"),
        F.expr(
            f"CAST(({dec.format('n_bytes')} * 1000000)"
            f" div greatest({dec.format('bpe_tokens')}, 1) AS BIGINT)"
        ).alias("bytes_per_token_micro"),
    )


@query(
    "llm_bleu_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    u1 AS (
      SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
      FROM toks, unnest(t) AS z(g) GROUP BY doc_id, g
    ),
    u2 AS (
      SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
      FROM toks, unnest(list_transform(range(1, len(t)),
             i -> t[i] || ' ' || t[i + 1])) AS z(g)
      GROUP BY doc_id, g
    ),
    ov1 AS (
      SELECT r.doc_id AS ref_id, CAST(sum(least(r.c, c.c)) AS BIGINT) AS m1
      FROM u1 r JOIN u1 c ON c.doc_id = r.doc_id + 1 AND c.g = r.g
      GROUP BY r.doc_id
    ),
    ov2 AS (
      SELECT r.doc_id AS ref_id, CAST(sum(least(r.c, c.c)) AS BIGINT) AS m2
      FROM u2 r JOIN u2 c ON c.doc_id = r.doc_id + 1 AND c.g = r.g
      GROUP BY r.doc_id
    ),
    lens AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS n1,
             CAST(greatest(len(t) - 1, 0) AS BIGINT) AS n2
      FROM toks
    )
    SELECT a.doc_id AS ref_id,
           coalesce(ov1.m1, 0) AS m1,
           coalesce(ov2.m2, 0) AS m2,
           a.n1 AS ref_len,
           b.n1 AS cand_len,
           round(coalesce(ov1.m1, 0) / CAST(b.n1 AS DOUBLE), 6) AS p1,
           CASE WHEN b.n2 > 0
                THEN round(coalesce(ov2.m2, 0) / CAST(b.n2 AS DOUBLE), 6)
                ELSE 0.0 END AS p2,
           round(sqrt((coalesce(ov1.m1, 0) / CAST(b.n1 AS DOUBLE))
                      * (CASE WHEN b.n2 > 0
                         THEN coalesce(ov2.m2, 0) / CAST(b.n2 AS DOUBLE)
                         ELSE 0.0 END)), 6) AS bleu2_nobp,
           CAST((a.n1::HUGEINT * 1000000) // b.n1 AS BIGINT)
             AS brevity_ratio_micro
    FROM lens a
    JOIN lens b ON b.doc_id = a.doc_id + 1
    LEFT JOIN ov1 ON ov1.ref_id = a.doc_id
    LEFT JOIN ov2 ON ov2.ref_id = a.doc_id
    """,
    tags=("llm", "evaluation"),
)
def llm_bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-2 between adjacent document pairs — the precision-oriented
    counterpart of llm_rouge_n_pairs, completing the MT/summarization
    eval pair (ROUGE asks "did the candidate recover the reference?",
    BLEU asks "is what the candidate said licensed by the reference?").
    Modified n-gram precision in its proper CLIPPED-multiset form
    (m_n = Σ_g min(count_ref, count_cand), the same discipline the
    ROUGE id uses), geometric mean over n=1,2 — sqrt is IEEE
    correctly-rounded in both engines, so the geometric mean is as
    engine-exact as the integer components under it. The brevity
    penalty is emitted as the EXACT fixed-point length ratio
    (ref_len/cand_len in floored micros) rather than exp(1−r): libm
    exp carries no correct-rounding guarantee across engines, and
    BP = exp(1 − max(1, r)) is a trivial downstream map of the emitted
    ratio — same keep-the-hash-exact call as the KN LM's micros. All
    adjacent pairs are retained (zero-overlap pairs score 0 instead of
    dropping — a BLEU of 0 is information). The adjacent-id join is the
    stand-in for any blocked candidate stream; at scale this runs on
    LSH candidates exactly like the ROUGE ids. Plan: gram counts
    map-side, two gram-keyed equi-joins, one pair-keyed assembly —
    never all-pairs."""
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    u1 = toks.select("doc_id", F.explode("t").alias("g")).groupBy(
        "doc_id", "g"
    ).agg(F.count("*").cast("long").alias("c"))
    u2 = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN"
                " transform(sequence(0, size(t) - 2),"
                " i -> concat(t[i], ' ', t[i + 1]))"
                " ELSE array() END"
            )
        ).alias("g"),
    ).groupBy("doc_id", "g").agg(F.count("*").cast("long").alias("c"))

    def _overlap(u: DataFrame, out: str) -> DataFrame:
        r = u.select(F.col("doc_id").alias("ref_id"), "g", F.col("c").alias("cr"))
        c = u.select(
            (F.col("doc_id") - 1).alias("ref_id"), "g", F.col("c").alias("cc")
        )
        return (
            r.join(c, ["ref_id", "g"])
            .groupBy("ref_id")
            .agg(F.sum(F.least("cr", "cc")).cast("long").alias(out))
        )

    lens = toks.select(
        "doc_id",
        F.size("t").cast("long").alias("n1"),
        F.greatest(F.size("t") - 1, F.lit(0)).cast("long").alias("n2"),
    )
    a = lens.select(
        F.col("doc_id").alias("ref_id"),
        F.col("n1").alias("ref_len"),
    )
    b = lens.select(
        (F.col("doc_id") - 1).alias("ref_id"),
        F.col("n1").alias("cand_len"),
        F.col("n2").alias("cand_n2"),
    )
    m1 = F.coalesce(F.col("m1"), F.lit(0)).cast("long")
    m2 = F.coalesce(F.col("m2"), F.lit(0)).cast("long")
    p1 = m1 / F.col("cand_len").cast("double")
    p2 = F.when(
        F.col("cand_n2") > 0, m2 / F.col("cand_n2").cast("double")
    ).otherwise(F.lit(0.0))
    return (
        a.join(b, "ref_id")
        .join(_overlap(u1, "m1"), "ref_id", "left")
        .join(_overlap(u2, "m2"), "ref_id", "left")
        .select(
            "ref_id",
            m1.alias("m1"),
            m2.alias("m2"),
            "ref_len",
            "cand_len",
            F.round(p1, 6).alias("p1"),
            F.round(p2, 6).alias("p2"),
            F.round(F.sqrt(p1 * p2), 6).alias("bleu2_nobp"),
            F.expr(
                "CAST((CAST(ref_len AS DECIMAL(38,0)) * 1000000)"
                " div cand_len AS BIGINT)"
            ).alias("brevity_ratio_micro"),
        )
    )


#: train-split predicate shared (textually) with llm_train_split_hash:
#: first md5 hex digit of the doc id < 13 → 'train' (~81%); everything
#: else (val+test) is the held-out pool the LM never saw.
_KN_TRAIN_SQL = (
    "strpos('0123456789abcdef',"
    " substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 13"
)

_KN_HELDOUT_ORACLE = _KN_CTES_TMPL.format(
    src=f"(SELECT * FROM documents WHERE {_KN_TRAIN_SQL})"
) + f"""
    , ho AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE NOT ({_KN_TRAIN_SQL})
    ),
    ho_inst AS (
      SELECT doc_id, t[i] AS v, t[i + 1] AS w
      FROM ho, unnest(range(1, len(t))) AS u(i)
    ),
    scored AS (
      SELECT i.doc_id,
             CASE WHEN p.p_micro IS NOT NULL THEN 'hit'
                  WHEN vs.v IS NOT NULL AND ws.w IS NOT NULL THEN 'backoff'
                  ELSE 'oov' END AS kind,
             greatest(
               CASE WHEN p.p_micro IS NOT NULL THEN p.p_micro
                    WHEN vs.v IS NOT NULL AND ws.w IS NOT NULL THEN
                      CAST((3::HUGEINT * vs.n1v * ws.n1w * 1000000)
                           // (4::HUGEINT * vs.cv * nt.nt) AS BIGINT)
                    ELSE 0 END, 1) AS p_eff
      FROM ho_inst i
      LEFT JOIN p ON p.v = i.v AND p.w = i.w
      LEFT JOIN vstats vs ON vs.v = i.v
      LEFT JOIN wstats ws ON ws.w = i.w
      CROSS JOIN nt
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(CASE WHEN kind = 'hit' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hit,
           CAST(sum(CASE WHEN kind = 'backoff' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_backoff,
           CAST(sum(CASE WHEN kind = 'oov' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(sum(p_eff) AS BIGINT) AS sum_p_micro,
           CAST(sum(p_eff) // count(*) AS BIGINT) AS mean_p_micro
    FROM scored GROUP BY doc_id
"""


@query(
    "llm_kn_heldout_surprisal",
    oracle=_KN_HELDOUT_ORACLE,
    tags=("llm", "quality"),
)
def llm_kn_heldout_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out Kneser-Ney scoring — the actual CCNet-style perplexity
    filter loop: train the bigram LM on the TRAIN split only (the same
    deterministic md5-digit split llm_train_split_hash assigns, so the
    split audit and the LM trainer can never disagree), then score the
    docs the LM never saw. llm_ngram_lm_kn scores in-sample, which
    flatters memorized boilerplate; quality filtering needs the
    held-out number, and held-out scoring forces the LM's real decision
    tree per bigram: seen (the full interpolated estimate), unseen pair
    with both words known (the continuation-only backoff term
    d·N1+(v·)/c(v) · N1+(·w)/N1+(··) — exactly the interpolation weight
    KN reserves for novel combinations), or OOV (probability floor).
    Every branch stays an exact rational floored once to micros
    (decimal(38,0) div vs HUGEINT //), clamped ≥ 1 micro so downstream
    log-surprisal never sees a zero. The hit/backoff/oov counts are the
    drill-down a curation engineer reads: a doc that is mostly 'oov'
    is foreign to the corpus, mostly-'backoff' is novel phrasing of
    known vocabulary — different filtering decisions. Plan: the train
    tables are aggregate-sized (vocabulary / bigram types); the
    held-out instances join gram-keyed (never more than |held-out
    bigrams| rows in flight); vstats/wstats attach by vocabulary key
    and nt broadcasts — same economics as the in-sample scorer."""
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    digit = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
    ) - 1
    train = docs.filter(digit < 13)
    heldout = docs.filter(digit >= 13)
    _, _, vstats, wstats, nt, p = _kn_tables(spark, sf_dir, docs=train)
    ho_inst = _bigram_instances(heldout)
    backoff = F.expr(
        "CAST((3 * CAST(n1v AS DECIMAL(38,0)) * n1w * 1000000)"
        " div (4 * CAST(cv AS DECIMAL(38,0)) * nt) AS BIGINT)"
    )
    scored = (
        ho_inst.join(p, ["v", "w"], "left")
        .join(vstats, "v", "left")
        .join(wstats, "w", "left")
        .crossJoin(F.broadcast(nt))
        .select(
            "doc_id",
            F.when(F.col("p_micro").isNotNull(), "hit")
            .when(F.col("cv").isNotNull() & F.col("n1w").isNotNull(), "backoff")
            .otherwise("oov")
            .alias("kind"),
            F.greatest(
                F.when(F.col("p_micro").isNotNull(), F.col("p_micro"))
                .when(
                    F.col("cv").isNotNull() & F.col("n1w").isNotNull(), backoff
                )
                .otherwise(F.lit(0).cast("long")),
                F.lit(1).cast("long"),
            ).alias("p_eff"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(F.when(F.col("kind") == "hit", 1).otherwise(0))
            .cast("long")
            .alias("n_hit"),
            F.sum(F.when(F.col("kind") == "backoff", 1).otherwise(0))
            .cast("long")
            .alias("n_backoff"),
            F.sum(F.when(F.col("kind") == "oov", 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.sum("p_eff").cast("long").alias("sum_p_micro"),
        )
        .withColumn(
            "mean_p_micro", F.expr("sum_p_micro div n_bigrams").cast("long")
        )
    )
