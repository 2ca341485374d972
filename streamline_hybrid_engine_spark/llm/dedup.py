"""Deduplication operators for LLM training-data pipelines — SURVEY §2.11.

Beyond-reference mandate (BASELINE.json): exact dedup, MinHash+LSH,
SimHash, n-gram Jaccard. All pure DataFrame/SQL — hashing is ``md5``
(verified byte-identical between Spark 4.1.2 and DuckDB 1.0; ``xxhash64``
has no DuckDB builtin, SURVEY §2.11).

Scale design (100 TB):
- shingling/explode stays JVM-side (no Python);
- MinHash-LSH is the scale path for near-dup: candidate pairs come from a
  bucket JOIN on (band, band-signature) — never an all-pairs product; at
  1000 executors the band join shuffles only (doc, band) rows, and skewed
  mega-buckets are handled by AQE skew-join splitting;
- exact n-gram Jaccard is blocked by ``source`` (a natural partition key)
  and only verifies the candidate tail, mirroring a production pipeline's
  verify-after-LSH stage.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from streamline_hybrid_engine_spark.catalog import is_warmed, load_table
from streamline_hybrid_engine_spark.operators.graph import (
    cc_width,
    connected_components,
)
from streamline_hybrid_engine_spark.registry import query

#: Sweep-mode memo for shared subtrees (band frame, cluster labels). The
#: LSH family forms a dependency chain — pairs → clusters → keep, plus
#: leakage on the band frame — and a driver sweep runs every link as its
#: own query, recomputing the shared prefix each time. Memoization is
#: gated on catalog.is_warmed so it ONLY happens in driver-sweep context;
#: bench and parity measure the full pipeline per query.
_SWEEP_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def _shared(
    spark: SparkSession, sf_dir: str, key: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Materialize ``build()`` once per (session, sf_dir) in sweep mode;
    always localCheckpoint (the callers self-join or iterate over it)."""
    if not is_warmed(spark, sf_dir):
        # LAZY (r13): blocks materialize inside the first consumer's job
        # (self-join sides are separate stages, so no duplicate compute);
        # eager paid one extra job per query with no reuse benefit
        return build().localCheckpoint(eager=False)
    k = (spark.sparkContext.applicationId, os.path.realpath(sf_dir), key)
    if k not in _SWEEP_MEMO:
        # sweep memo stays EAGER: the memo hands the same blocks to many
        # later queries, so materializing now (once) is the whole point
        _SWEEP_MEMO[k] = build().localCheckpoint(eager=True)
    return _SWEEP_MEMO[k]

N_SEEDS = 16
BAND_ROWS = 8  # 2 bands × 8 rows: (1/2)^(1/8) ≈ 0.917 jaccard @ 50% capture

#: shingle helper (Spark SQL expr, 0-based array indexing). The size guard
#: matters under ANSI mode: for docs with <3 tokens `sequence(0, size-3)`
#: would count DOWN into negative indices and `toks[i]` would throw
#: INVALID_ARRAY_INDEX; the oracle's `range(1, len-1)` is empty there, so
#: the correct behavior is zero shingles (row dropped by the explode).
_SHINGLES = (
    "CASE WHEN size(toks) >= 3 THEN "
    "transform(sequence(0, size(toks) - 3), "
    "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) "
    "ELSE array() END"
)


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → distinct (doc_id, source, shingle) of token 3-grams."""
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    return (
        docs.withColumn("toks", F.split("text", " "))
        .withColumn("sh", F.explode(F.expr(_SHINGLES)))
        .select("doc_id", "source", "sh")
        .distinct()
    )


_ORACLE_SHINGLES = """
    SELECT DISTINCT doc_id, source, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
    FROM (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
         LATERAL (SELECT unnest(range(1, len(toks) - 1)) AS i)
"""

#: Carter-Wegman double hashing: ONE md5 per shingle yields two 48-bit
#: integers (h1, h2); permutation k is h1 + k*h2 (≤ 2^52, no int64
#: overflow under ANSI). 16× less hash work than seed-salted md5 while
#: staying bit-identical between Spark (`conv(hex,16,10)`) and DuckDB
#: (`('0x'||hex)::BIGINT`) — verified equal this session.
_ORACLE_SIGS = f"""
    WITH h AS (
      SELECT doc_id,
             ('0x' || substr(md5(sh), 1, 12))::BIGINT AS h1,
             ('0x' || substr(md5(sh), 13, 12))::BIGINT AS h2
      FROM ({_ORACLE_SHINGLES})
    )
    SELECT doc_id, s.seed, min(h1 + s.seed * h2) AS mh
    FROM h, (SELECT unnest(range(0, {N_SEEDS})) AS seed) s
    GROUP BY doc_id, s.seed
"""


@query(
    "llm_dedup_exact_docs",
    oracle="""
    SELECT text, min(doc_id) AS keep_doc_id, count(*) AS n_copies
    FROM documents GROUP BY text
    """,
    tags=("llm", "dedup"),
)
def llm_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, keep the smallest doc_id.

    (``dropDuplicates(["text"])`` is the one-liner; the groupBy form is
    used so the survivor choice is deterministic for the oracle.)
    """
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies")
    )


def _minhash_wide(
    spark: SparkSession, sf_dir: str, sh: DataFrame | None = None
) -> DataFrame:
    """Per-doc wide MinHash row (doc_id, mh0..mh15): ONE aggregation pass
    over the shingle rows computes all 16 permutation-mins (no 16× explode;
    one md5 per shingle via Carter-Wegman). Shared by the signature,
    LSH-pairs and leakage queries. ``sh`` overrides the shingle source
    (the sampled-eval valve feeds a hash-sampled subset)."""
    if sh is None:
        sh = _doc_shingles(spark, sf_dir)
    hashed = sh.withColumn("hex", F.md5("sh")).select(
        "doc_id",
        F.expr("cast(conv(substr(hex, 1, 12), 16, 10) as bigint)").alias("h1"),
        F.expr("cast(conv(substr(hex, 13, 12), 16, 10) as bigint)").alias("h2"),
    )
    return hashed.groupBy("doc_id").agg(
        *[
            F.min(F.col("h1") + F.lit(k) * F.col("h2")).alias(f"mh{k}")
            for k in range(N_SEEDS)
        ]
    )


def _bands_with_sig(
    spark: SparkSession, sf_dir: str, sh: DataFrame | None = None
) -> DataFrame:
    """(doc_id, sig, band, bandsig) rows for LSH bucketing.

    ``sig`` is the full 16-long signature array CARRIED THROUGH to the band
    rows, so pair queries estimate jaccard directly from the bucket join —
    no re-join against the signature table (r01 plan audit: that re-join
    cost two extra exchanges). The bandsig md5 text matches the oracle's
    ``md5(string_agg(mh::VARCHAR, '|' ORDER BY seed))`` because ``sig`` is
    seed-ordered and ``slice`` preserves order. Derived band rows need no
    shuffle of their own — one explode over the already-aggregated per-doc
    row."""
    n_bands = N_SEEDS // BAND_ROWS
    sig = F.array(*[F.col(f"mh{k}") for k in range(N_SEEDS)])
    return (
        _minhash_wide(spark, sf_dir, sh=sh)
        .select("doc_id", sig.alias("sig"))
        .select(
            "doc_id",
            "sig",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {n_bands - 1}), b -> "
                    f"struct(b as band, md5(array_join(transform("
                    f"slice(sig, b * {BAND_ROWS} + 1, {BAND_ROWS}), "
                    f"x -> cast(x as string)), '|')) as bandsig))"
                )
            ).alias("bs"),
        )
        .select("doc_id", "sig", "bs.band", "bs.bandsig")
    )


def per_row_band_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, band, bandsig) computed entirely PER ROW — the
    streaming-safe form of :func:`_bands_with_sig`.

    The batch path explodes shingles and groupBy-mins them (right at rest:
    the explode keeps rows narrow and the agg combines map-side). A
    STREAM can't run that unwatermarked groupBy in append mode, so here
    the whole signature folds inside one row: tokenize → distinct
    3-gram shingles → one md5 each → Carter-Wegman (h1, h2) → 16
    permutation-mins via ``aggregate`` over the array → band digests.
    Identical values to the batch frame by construction (same shingle
    set, same hash arithmetic, same band digest text) — test-pinned.
    Zero shuffle: per-doc work scales with doc length only, so at 100 TB
    this maps over the corpus with no exchange at all. Docs with <3
    tokens have no shingles (batch: dropped by the explode) and are
    FILTERED here — they never enter any bucket, i.e. trivially kept.
    """
    n_bands = N_SEEDS // BAND_ROWS
    hs = (
        f"transform(array_distinct({_SHINGLES}), s -> struct("
        "cast(conv(substr(md5(s), 1, 12), 16, 10) as bigint) as h1, "
        "cast(conv(substr(md5(s), 13, 12), 16, 10) as bigint) as h2))"
    )
    # fold each permutation's min inside the row; 2^60 sentinel is above
    # any real h1 + k*h2 (≤ 2^48 + 15·2^48 = 2^52)
    sig = (
        f"transform(sequence(0, {N_SEEDS - 1}), k -> "
        f"aggregate(hs, cast({1 << 60} as bigint), "
        "(acc, x) -> least(acc, x.h1 + k * x.h2)))"
    )
    return (
        docs.withColumn("toks", F.split("text", " "))
        .filter(F.expr("size(toks) >= 3"))
        .withColumn("hs", F.expr(hs))
        .withColumn("sig", F.expr(sig))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {n_bands - 1}), b -> "
                    f"struct(b as band, md5(array_join(transform("
                    f"slice(sig, b * {BAND_ROWS} + 1, {BAND_ROWS}), "
                    f"x -> cast(x as string)), '|')) as bandsig))"
                )
            ).alias("bs"),
        )
        .select("doc_id", "bs.band", "bs.bandsig")
    )


def minhash_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Library primitive: end-to-end MinHash-LSH near-dup clustering over
    any (id, text) DataFrame — shingle → signature → band buckets →
    candidate pairs → connected components. Returns (id, cluster_id):
    ``cluster_id`` is the cluster's minimum id; survivors of a
    keep-one-per-cluster policy are the rows where id == cluster_id, and
    docs with no near-dup (or under 3 tokens) are their own singleton
    cluster.

    The composition is exactly the oracle-checked contract chain
    (llm_dedup_minhash_sig → _pairs → _clusters → _keep) with the
    fixture plumbing removed: per-row signatures (zero shuffle), ONE
    band-bucket equi-join for candidates (never all-pairs), pointer-
    jumping CC on the candidate graph (O(log diameter) rounds) — the
    architecture that survives 100 TB. Tune via module constants
    (N_SEEDS/BAND_ROWS set the jaccard capture curve)."""
    ids = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    bands = per_row_band_signatures(ids)
    a = bands.select(F.col("doc_id").alias("d1"), "band", "bandsig")
    b = bands.select(F.col("doc_id").alias("d2"), "band", "bandsig")
    pairs = (
        a.join(b, ["band", "bandsig"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    labels = connected_components(pairs, "d1", "d2")
    matched = labels.select(
        F.col("vid").alias(id_col), F.col("label").alias("cluster_id")
    )
    singles = (
        docs.select(F.col(id_col))
        .join(matched.select(id_col), id_col, "left_anti")
        .select(F.col(id_col), F.col(id_col).alias("cluster_id"))
    )
    return matched.unionByName(singles)


@query(
    "llm_dedup_minhash_sig",
    oracle=_ORACLE_SIGS,
    tags=("llm", "dedup", "minhash"),
)
def llm_dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures: 16 permutations via Carter-Wegman double hashing.

    shingle → one md5 → (h1, h2) 48-bit ints → permutation k = h1 + k*h2
    → min per (doc, seed). One md5 per shingle instead of one per
    (shingle, seed): 16× less hash work at identical statistical quality
    (§2.11). Fully deterministic, so the oracle reproduces the exact
    signature matrix.
    """
    unpivot = "stack({n}, {pairs}) as (seed, mh)".format(
        n=N_SEEDS,
        pairs=", ".join(f"cast({k} as bigint), mh{k}" for k in range(N_SEEDS)),
    )
    return _minhash_wide(spark, sf_dir).select("doc_id", F.expr(unpivot))


@query(
    "llm_dedup_minhash_pairs",
    oracle=f"""
    WITH sigs AS ({_ORACLE_SIGS}),
    bands AS (
      SELECT doc_id, seed // {BAND_ROWS} AS band,
             md5(string_agg(mh::VARCHAR, '|' ORDER BY seed)) AS bandsig
      FROM sigs GROUP BY doc_id, seed // {BAND_ROWS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id < b.doc_id
    )
    SELECT d1, d2,
           round(count(CASE WHEN sa.mh = sb.mh THEN 1 END) / {N_SEEDS}.0, 6) AS est_jaccard
    FROM cand
    JOIN sigs sa ON sa.doc_id = d1
    JOIN sigs sb ON sb.doc_id = d2 AND sb.seed = sa.seed
    GROUP BY d1, d2
    """,
    tags=("llm", "dedup", "minhash", "lsh"),
)
def llm_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates: band signatures → bucket join →
    jaccard estimate from signature agreement. The full LSH pipeline:
    shingle → minhash → band → bucket-join → estimate.

    The band rows carry the full 16-long signature array, so the estimate
    is a ``zip_with`` over the two arrays already present on the joined
    row — the r01 plan re-joined the (doc, seed, mh) table twice here,
    costing two extra shuffles of the signature matrix (VERDICT r01 #3).
    The band frame (2 rows × ~200 bytes per doc — tiny next to the corpus)
    is localCheckpoint'ed so the shingle→md5→minhash subtree runs ONCE, not
    once per self-join side; at cluster scale swap for ``persist(DISK)`` if
    executor loss must not trigger recompute.
    """
    bands = _shared(
        spark, sf_dir, "bands", lambda: _bands_with_sig(spark, sf_dir)
    )
    return band_pairs(bands)


def band_pairs(bands: DataFrame) -> DataFrame:
    """(d1, d2, est_jaccard) LSH candidate pairs from a
    (doc_id, sig, band, bandsig) band table — the bucket-join body of
    llm_dedup_minhash_pairs, callable on any band subset (the
    hash-sampled eval valve feeds a sampled one)."""
    a = bands.select(
        F.col("doc_id").alias("d1"), F.col("sig").alias("sig1"), "band", "bandsig"
    )
    b = bands.select(
        F.col("doc_id").alias("d2"), F.col("sig").alias("sig2"), "band", "bandsig"
    )
    n_agree = F.expr(
        "aggregate(zip_with(sig1, sig2, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),"
        " 0, (acc, v) -> acc + v)"
    )
    return (
        a.join(b, ["band", "bandsig"])
        .filter(F.col("d1") < F.col("d2"))
        .select(
            "d1",
            "d2",
            F.round(n_agree / F.lit(float(N_SEEDS)), 6).alias("est_jaccard"),
        )
        .distinct()  # docs agreeing on BOTH bands appear once, like the oracle
    )


@query(
    "llm_dedup_simhash",
    oracle="""
    SELECT doc_id,
           array_to_string(list_transform(range(1, 17), i ->
             CASE WHEN list_sum(list_transform(toks, t ->
               CASE WHEN strpos('89abcdef', substr(md5(t), i, 1)) > 0 THEN 1 ELSE -1 END)) > 0
             THEN '1' ELSE '0' END), '') AS simhash16
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    """,
    tags=("llm", "dedup", "simhash"),
)
def llm_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (16-bit): per bit position, majority vote of token-hash bits.

    Bit i of token t = high bit of hex digit i of md5(t) — portable across
    engines without integer hex parsing. Implemented as ONE nested
    higher-order expression (transform × aggregate): no explode, no
    shuffle besides none — embarrassingly parallel per document.
    """
    docs = load_table(spark, sf_dir, "documents", parallel=True).withColumn(
        "toks", F.split("text", " ")
    )
    # Hash each token ONCE (hs), then the 16-bit majority loop only does
    # substr/instr over the cached hex strings — 16× less md5 work than
    # hashing inside the per-bit aggregate. Same result as the oracle,
    # which keeps the straightforward per-bit form.
    hashed = docs.withColumn("hs", F.expr("transform(toks, t -> md5(t))"))
    bits = F.expr(
        "array_join(transform(sequence(1, 16), i -> "
        "CASE WHEN aggregate(hs, 0, (acc, h) -> acc + "
        "  CASE WHEN instr('89abcdef', substr(h, i, 1)) > 0 THEN 1 ELSE -1 END"
        ") > 0 THEN '1' ELSE '0' END), '')"
    )
    return hashed.select("doc_id", bits.alias("simhash16"))


@query(
    "llm_dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS ({_ORACLE_SHINGLES}),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT d1, d2,
           round(n_shared / (sa.n + sb.n - n_shared), 6) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.doc_id = d1
    JOIN sizes sb ON sb.doc_id = d2
    WHERE n_shared / (sa.n + sb.n - n_shared) >= 0.1
    """,
    tags=("llm", "dedup", "jaccard"),
)
def llm_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity, blocked by source.

    Inverted-index join on shingles within a block (never all-pairs),
    |A∩B| from the join, |A∪B| = |A|+|B|-|A∩B|. The verify stage of a
    production near-dup pipeline. Body: :func:`ngram_jaccard_pairs`
    (shared with the sampled-eval valve).
    """
    return ngram_jaccard_pairs(_doc_shingles(spark, sf_dir))


def ngram_jaccard_pairs(sh: DataFrame) -> DataFrame:
    """(d1, d2, jaccard) exact n-gram Jaccard pairs (≥ 0.1) from a
    (doc_id, source, sh) shingle table — the inverted-index-join body of
    llm_dedup_ngram_jaccard, callable on any shingle subset (the
    hash-sampled eval valve feeds a sampled one)."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("d1"), "source", "sh")
    b = sh.select(F.col("doc_id").alias("d2"), "source", "sh")
    shared = (
        a.join(b, ["source", "sh"])
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("nb"))
    jac = F.col("n_shared") / (F.col("na") + F.col("nb") - F.col("n_shared"))
    return (
        shared.join(sa, "d1")
        .join(sb, "d2")
        .filter(jac >= 0.1)
        .select("d1", "d2", F.round(jac, 6).alias("jaccard"))
    )


_ORACLE_CLUSTERS = f"""
    WITH RECURSIVE sigs AS ({_ORACLE_SIGS}),
    bands AS (
      SELECT doc_id, seed // {BAND_ROWS} AS band,
             md5(string_agg(mh::VARCHAR, '|' ORDER BY seed)) AS bandsig
      FROM sigs GROUP BY doc_id, seed // {BAND_ROWS}
    ),
    edges AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id < b.doc_id
    ),
    und AS (SELECT d1, d2 FROM edges UNION ALL SELECT d2, d1 FROM edges),
    reach AS (
      SELECT doc_id AS a, doc_id AS b FROM documents
      UNION
      SELECT r.a, u.d2 FROM reach r JOIN und u ON u.d1 = r.b
    )
    SELECT a AS doc_id, min(b) AS cluster_id,
           CAST(count(*) OVER (PARTITION BY min(b)) AS BIGINT) AS cluster_size
    FROM reach GROUP BY a
    """


@query(
    "llm_dedup_clusters",
    oracle=_ORACLE_CLUSTERS,
    tags=("llm", "dedup", "iterative"),
)
def llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: connected components over the LSH
    candidate graph by iterative min-label propagation.

    The Flink-iterations analog (SURVEY §1.1 ``iterate``/``iterateDelta``
    → driver-side loop): labels start as doc_id, each round takes the min
    label across candidate-pair neighbors, loop until fixpoint (checked,
    bounded at 25 rounds = graph diameter bound). ``localCheckpoint`` per
    round truncates the growing lineage — at 100 TB this is the standard
    large-graph CC pattern (rounds = O(component diameter), each round one
    shuffle on doc_id; dup clusters are short chains so it converges in a
    few rounds).

    Oracle: recursive-CTE transitive closure (exactly the min reachable
    node per doc). Output: every document with its cluster representative
    and cluster size. In sweep mode the label table is cached via
    ``_shared`` so repeat calls within a sweep reuse it; llm_dedup_keep
    deliberately does NOT consume it — its r5 rewrite runs its own CC pass
    over the minhash pairs because its contract needs only per-cluster
    aggregates (no corpus-wide size window), which is cheaper than joining
    back through this full label table.
    """
    return _shared(
        spark, sf_dir, "clusters", lambda: _build_clusters(spark, sf_dir)
    )


#: Back-compat alias — the generic loop machinery now lives in
#: operators/graph.py (shared with `graph_connected_components`).
_cc_width = cc_width


def _build_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # iterate only over the candidate graph's vertices — documents with no
    # near-dup edge are singleton clusters and skip the loop entirely (at
    # 100 TB the graph is ≪ the corpus: candidates are the LSH-filtered
    # tail). The loop itself (min-label propagation + pointer jumping,
    # measured-width shuffles, convergence check) is the shared
    # graph.connected_components — the Gelly-CC machinery this operator is
    # the LLM-pipeline face of.
    pairs = llm_dedup_minhash_pairs(spark, sf_dir).select("d1", "d2")
    docs = load_table(spark, sf_dir, "documents", parallel=True).select("doc_id")
    labels = connected_components(pairs, "d1", "d2").select(
        F.col("vid").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    singletons = docs.join(
        labels.select("doc_id"), "doc_id", "left_anti"
    ).select("doc_id", F.col("doc_id").alias("cluster_id"))
    all_labels = labels.unionByName(singletons)
    w_size = F.count("*").over(Window.partitionBy("cluster_id"))
    return all_labels.select("doc_id", "cluster_id", w_size.alias("cluster_size"))


@query(
    "llm_split_leakage",
    oracle=f"""
    WITH sigs AS ({_ORACLE_SIGS}),
    bands AS (
      SELECT doc_id, seed // {BAND_ROWS} AS band,
             md5(string_agg(mh::VARCHAR, '|' ORDER BY seed)) AS bandsig
      FROM sigs GROUP BY doc_id, seed // {BAND_ROWS}
    ),
    splits AS (
      SELECT doc_id,
             CASE WHEN strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 13 THEN 'train'
                  WHEN strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 15 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT DISTINCT a.doc_id AS train_doc, b.doc_id AS eval_doc, sb.split AS eval_split
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id <> b.doc_id
    JOIN splits sa ON sa.doc_id = a.doc_id AND sa.split = 'train'
    JOIN splits sb ON sb.doc_id = b.doc_id AND sb.split <> 'train'
    """,
    tags=("llm", "dedup", "split", "leakage"),
)
def llm_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→eval contamination audit: near-duplicate pairs that CROSS the
    train/val-test boundary of the hash split (`llm_train_split_hash`'s
    assignment rule).

    A training pipeline that dedups within splits but not across them
    leaks eval answers into training data; this is the check that catches
    it. Candidates come from the MinHash-LSH band buckets (never
    all-pairs) joined against the content-stable split assignment — both
    already-verified building blocks, composed. At 100 TB this is the
    same bounded bucket equi-join as `llm_dedup_minhash_pairs` with one
    extra broadcast-sized map-side split column.
    """
    bands = _shared(
        spark, sf_dir, "bands", lambda: _bands_with_sig(spark, sf_dir)
    ).drop("sig")
    digit = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
    ) - 1
    split = F.when(digit < 13, "train").when(digit < 15, "val").otherwise("test")
    splits = load_table(spark, sf_dir, "documents").select(
        "doc_id", split.alias("split")
    )
    train = splits.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc")
    )
    evals = splits.filter(F.col("split") != "train").select(
        F.col("doc_id").alias("eval_doc"), F.col("split").alias("eval_split")
    )
    a = bands.select(F.col("doc_id").alias("train_doc"), "band", "bandsig")
    b = bands.select(F.col("doc_id").alias("eval_doc"), "band", "bandsig")
    return (
        a.join(b, ["band", "bandsig"])
        .filter(F.col("train_doc") != F.col("eval_doc"))
        .join(train, "train_doc")
        .join(evals, "eval_doc")
        .select("train_doc", "eval_doc", "eval_split")
        .distinct()
    )


@query(
    "llm_dedup_keep",
    oracle=f"""
    SELECT doc_id, cluster_size
    FROM ({_ORACLE_CLUSTERS})
    WHERE doc_id = cluster_id
    """,
    tags=("llm", "dedup"),
)
def llm_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated corpus: cluster representatives (min doc_id per
    near-dup cluster) — the materialization step after cluster resolution,
    i.e. what a training pipeline actually writes out. Exact duplicates are
    subsumed: identical texts have identical signatures, always share both
    LSH bands, and therefore land in one cluster. ``cluster_size`` carries
    how many documents each survivor replaced (1 = unique).

    Unlike llm_dedup_clusters (whose contract is every document's label,
    needing the corpus-wide size window), the survivor list only needs
    per-CLUSTER aggregates: sizes come from one groupBy over the CC
    labels — already the component MINIMUM, so the representative id is
    the grouping key itself — and the non-candidate tail enters as
    size-1 rows via an anti join. That skips the full-corpus window sort
    and the label join-back entirely; at 100 TB the groupBy input is the
    LSH-candidate tail (≪ corpus), and the anti join is the same probe
    the clusters path already does."""
    pairs = llm_dedup_minhash_pairs(spark, sf_dir).select("d1", "d2")
    docs = load_table(spark, sf_dir, "documents", parallel=True).select("doc_id")
    labels = connected_components(pairs, "d1", "d2")
    reps = labels.groupBy(F.col("label").alias("doc_id")).agg(
        F.count("*").alias("cluster_size")
    )
    singles = docs.join(
        labels.select(F.col("vid").alias("doc_id")), "doc_id", "left_anti"
    ).select("doc_id", F.lit(1).cast("long").alias("cluster_size"))
    return reps.unionByName(singles)


@query(
    "llm_contamination_8gram",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    grams AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(toks[i:i+7], ' ')) AS g
      FROM toks, LATERAL (SELECT unnest(range(1, len(toks) - 6)) AS i)
    ),
    splits AS (
      SELECT doc_id,
             CASE WHEN strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 13 THEN 'train'
                  WHEN strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 15 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    train_grams AS (
      SELECT DISTINCT g FROM grams JOIN splits USING (doc_id) WHERE split = 'train'
    ),
    eval_grams AS (
      SELECT g.doc_id, s.split, g.g
      FROM grams g JOIN splits s ON s.doc_id = g.doc_id WHERE s.split <> 'train'
    )
    SELECT e.doc_id AS eval_doc, e.split AS eval_split,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(t.g) AS BIGINT) AS n_contaminated,
           round(count(t.g) / CAST(count(*) AS DOUBLE), 6) AS contaminated_frac
    FROM eval_grams e LEFT JOIN train_grams t ON t.g = e.g
    GROUP BY e.doc_id, e.split
    """,
    tags=("llm", "dedup", "contamination"),
)
def llm_contamination_8gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit by exact 8-gram overlap — the
    GPT-3-report method, complementing the LSH near-dup leakage check
    (`llm_split_leakage`): for every eval-split document, the fraction of
    its distinct 8-grams that also appear anywhere in the train split.

    Scale design: grams are md5'd to 16-byte keys before the join (shuffle
    hashes, not text); the train side is reduced to DISTINCT grams first
    (one hash agg), and the overlap is a left join on the gram hash —
    an inverted-index probe, never doc×doc. Hot grams (corpus boilerplate)
    are exactly what AQE's skew-join split handles.
    """
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    grams = (
        docs.withColumn("toks", F.split("text", " "))
        .withColumn(
            "g",
            F.explode(
                F.expr(
                    "CASE WHEN size(toks) >= 8 THEN transform(sequence(0, size(toks) - 8),"
                    " i -> md5(array_join(slice(toks, i + 1, 8), ' ')))"
                    " ELSE array() END"
                )
            ),
        )
        .select("doc_id", "g")
        .distinct()
    )
    digit = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
    ) - 1
    split = F.when(digit < 13, "train").when(digit < 15, "val").otherwise("test")
    splits = docs.select("doc_id", split.alias("split"))
    g_split = grams.join(splits, "doc_id")
    train_grams = (
        g_split.filter(F.col("split") == "train").select("g").distinct()
        .withColumn("hit", F.lit(1))
    )
    eval_grams = g_split.filter(F.col("split") != "train")
    return (
        eval_grams.join(train_grams, "g", "left")
        .groupBy(
            F.col("doc_id").alias("eval_doc"), F.col("split").alias("eval_split")
        )
        .agg(
            F.count("*").alias("n_grams"),
            F.count("hit").alias("n_contaminated"),
            F.round(F.count("hit") / F.count("*").cast("double"), 6).alias(
                "contaminated_frac"
            ),
        )
    )


# ---------------------------------------------------------------------------
# End-to-end corpus materialization (round-2b flagship)
# ---------------------------------------------------------------------------

from streamline_hybrid_engine_spark.llm.text import STOPWORDS  # noqa: E402

_SPLIT_CASE_DUCK = """CASE WHEN strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 13 THEN 'train'
                  WHEN strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 15 THEN 'val'
                  ELSE 'test' END"""

#: composed from the shared cluster CTE so dedup semantics stay in sync
#: with llm_dedup_clusters / llm_dedup_keep by construction.
_ORACLE_CORPUS_FINAL = f"""
    WITH clusters AS ({{clusters}}),
    survivors AS (SELECT doc_id FROM clusters WHERE doc_id = cluster_id),
    scored AS (
      SELECT doc_id, source,
             len(toks) AS n,
             len(list_filter(toks, t -> list_contains({list(STOPWORDS)!r}, t)))
               / CAST(len(toks) AS DOUBLE) AS sw_ratio,
             {_SPLIT_CASE_DUCK} AS split
      FROM (SELECT doc_id, source, text, string_split(text, ' ') AS toks FROM documents)
    )
    SELECT split, source, count(*) AS n_docs,
           CAST(sum(n) AS BIGINT) AS n_tokens_total
    FROM scored JOIN survivors USING (doc_id)
    WHERE n BETWEEN 20 AND 1000 AND sw_ratio BETWEEN 0.01 AND 0.6
    GROUP BY split, source
"""


@query(
    "llm_corpus_final",
    oracle=_ORACLE_CORPUS_FINAL.format(clusters=_ORACLE_CLUSTERS),
    tags=("llm", "pipeline"),
)
def llm_corpus_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The assembled training corpus: near-dup cluster survivors that pass
    the Gopher-style quality gate, bucketed into train/val/test, with
    per-cell document and token accounting — the single number a data lead
    actually signs off on ("how many training tokens survive the
    pipeline?").

    Composition is the point: this reuses the LSH dedup survivor set
    (llm_dedup_keep — shared/cached subtree during driver sweeps), the
    quality expression (llm_text_quality), and the content-stable split
    hash (llm_train_split_hash) in ONE plan. Survivors arrive as a keyed
    join; quality + split are map-side expressions; the final aggregate is
    one shuffle of |cells| partial rows. The composition adds no corpus
    scan beyond what dedup already performs.
    """
    keep = llm_dedup_keep(spark, sf_dir).select("doc_id")
    docs = load_table(spark, sf_dir, "documents", parallel=True).withColumn(
        "toks", F.split("text", " ")
    )
    sw = F.array([F.lit(s) for s in STOPWORDS])
    n = F.size("toks")
    sw_ratio = F.size(F.filter("toks", lambda t: F.array_contains(sw, t))) / n.cast(
        "double"
    )
    digit = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
    ) - 1
    split = F.when(digit < 13, "train").when(digit < 15, "val").otherwise("test")
    return (
        docs.join(keep, "doc_id")
        .filter(n.between(20, 1000) & sw_ratio.between(0.01, 0.6))
        .groupBy(split.alias("split"), "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n.cast("long")).alias("n_tokens_total"),
        )
    )


BOILER_MIN_DOCS = 8  # a 3-gram in ≥ 8 distinct docs is "boilerplate"


@query(
    "llm_boilerplate_grams",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           LATERAL (SELECT unnest(range(1, len(toks) - 1)) AS i)
    ),
    freq AS (
      SELECT sh FROM grams GROUP BY sh
      HAVING count(DISTINCT doc_id) >= {BOILER_MIN_DOCS}
    )
    SELECT g.doc_id,
           count(*) AS n_grams,
           CAST(sum(CASE WHEN f.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boiler,
           round(CAST(sum(CASE WHEN f.sh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS boiler_frac
    FROM grams g LEFT JOIN freq f ON f.sh = g.sh
    GROUP BY g.doc_id
    """,
    tags=("llm", "dedup", "quality"),
)
def llm_boilerplate_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-global boilerplate detection: per document, the fraction of
    3-gram INSTANCES whose gram occurs in ≥ {BOILER_MIN_DOCS} distinct
    documents — the cross-document complement to the doc-internal
    `llm_quality_repetition` gates (headers, license blocks, navigation
    chrome repeat ACROSS documents, not within one).

    Scale design: gram instances stay exploded only long enough for two
    hash aggregations (per-gram doc frequency; per-doc instance counts) —
    the frequent-gram table is the corpus's repeated tail, orders of
    magnitude smaller than the gram stream, and joins back as an equi-join
    on the gram key (inverted-index shape, same as the contamination
    audit). No distinct-per-doc materialization of the full gram set.
    """
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    grams = (
        docs.withColumn("toks", F.split("text", " "))
        .withColumn("sh", F.explode(F.expr(_SHINGLES)))
        .select("doc_id", "sh")
    )
    freq = (
        grams.groupBy("sh")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= BOILER_MIN_DOCS)
        .select("sh", F.lit(1).alias("hit"))
    )
    boiler = F.sum(F.coalesce("hit", F.lit(0)))
    return (
        grams.join(freq, "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            boiler.alias("n_boiler"),
            F.round(boiler.cast("double") / F.count("*"), 6).alias("boiler_frac"),
        )
    )


@query(
    "llm_dedup_edit_verify",
    oracle=f"""
    WITH sigs AS ({_ORACLE_SIGS}),
    bands AS (
      SELECT doc_id, seed // {BAND_ROWS} AS band,
             md5(string_agg(mh::VARCHAR, '|' ORDER BY seed)) AS bandsig
      FROM sigs GROUP BY doc_id, seed // {BAND_ROWS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id < b.doc_id
    )
    SELECT c.d1, c.d2,
           levenshtein(substr(ta.text, 1, 80), substr(tb.text, 1, 80)) AS edit_dist,
           round(1.0 - CAST(levenshtein(substr(ta.text, 1, 80), substr(tb.text, 1, 80)) AS DOUBLE)
                       / greatest(length(substr(ta.text, 1, 80)), length(substr(tb.text, 1, 80))), 6)
             AS edit_sim
    FROM cand c
    JOIN documents ta ON ta.doc_id = c.d1
    JOIN documents tb ON tb.doc_id = c.d2
    """,
    tags=("llm", "dedup", "verify"),
)
def llm_dedup_edit_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification of LSH candidate pairs — the
    character-level complement to `llm_dedup_ngram_jaccard`'s token-level
    verify (catches near-dups that tokenize differently: punctuation,
    casing artifacts, OCR noise). Levenshtein on the 80-char prefix:
    O(len²) per pair, so the prefix cap bounds the cell count and the LSH
    candidate set bounds the pair count — never all-pairs, never
    full-document DP. Both engines implement classic unit-cost
    Levenshtein (verified equal on the fixture corpus).
    """
    pairs = llm_dedup_minhash_pairs(spark, sf_dir).select("d1", "d2")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 80).alias("prefix")
    )
    ta = docs.select(F.col("doc_id").alias("d1"), F.col("prefix").alias("pa"))
    tb = docs.select(F.col("doc_id").alias("d2"), F.col("prefix").alias("pb"))
    lev = F.levenshtein("pa", "pb")
    sim = F.lit(1.0) - lev.cast("double") / F.greatest(
        F.length("pa"), F.length("pb")
    )
    return (
        pairs.join(ta, "d1")
        .join(tb, "d2")
        .select("d1", "d2", lev.alias("edit_dist"), F.round(sim, 6).alias("edit_sim"))
    )


@query(
    "llm_dedup_containment",
    oracle=f"""
    WITH sh AS ({_ORACLE_SHINGLES}),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared
      FROM sh a JOIN sh b ON a.source = b.source AND a.sh = b.sh
                         AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT s.d1, s.d2,
           round(CAST(s.n_shared AS DOUBLE) / sa.n, 6) AS containment
    FROM shared s
    JOIN sizes sa ON sa.doc_id = s.d1
    WHERE CAST(s.n_shared AS DOUBLE) / sa.n >= 0.5
    """,
    tags=("llm", "dedup", "containment"),
)
def llm_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment |A∩B| / |A| — catches SUB-document
    duplication that symmetric Jaccard misses: a short doc quoted whole
    inside a long one scores containment ≈ 1 while Jaccard ≈ |A|/|B| ≈ 0.
    Directional by construction (d1 contained in d2 ≠ the reverse), so
    both directions emit independently.

    Same inverted-index economics as the Jaccard verify: source-blocked
    shingle equi-join, pair counts from the index, one size join — never
    an all-pairs product; at 100 TB the block key comes from LSH bands
    instead of `source`.
    """
    sh = _doc_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("d1"), "source", "sh")
    b = sh.select(F.col("doc_id").alias("d2"), "source", "sh")
    shared = (
        a.join(b, ["source", "sh"])
        .filter(F.col("d1") != F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("na"))
    cont = F.col("n_shared").cast("double") / F.col("na")
    return (
        shared.join(sa, "d1")
        .filter(cont >= 0.5)
        .select("d1", "d2", F.round(cont, 6).alias("containment"))
    )


@query(
    "llm_minhash_calibration",
    oracle=f"""
    WITH sigs AS ({_ORACLE_SIGS}),
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
    est AS (
      SELECT d1, d2,
             round(count(CASE WHEN sa.mh = sb.mh THEN 1 END) / {N_SEEDS}.0, 6)
               AS est_jaccard
      FROM cand
      JOIN sigs sa ON sa.doc_id = d1
      JOIN sigs sb ON sb.doc_id = d2 AND sb.seed = sa.seed
      GROUP BY d1, d2
    ),
    sh AS ({_ORACLE_SHINGLES}),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    shared AS (
      SELECT e.d1, e.d2, count(*) AS n_shared
      FROM est e
      JOIN sh a ON a.doc_id = e.d1
      JOIN sh b ON b.doc_id = e.d2 AND b.sh = a.sh
      GROUP BY e.d1, e.d2
    )
    SELECT e.d1, e.d2, e.est_jaccard,
           round(CAST(coalesce(s.n_shared, 0) AS DOUBLE)
                 / (sa.n + sb.n - coalesce(s.n_shared, 0)), 6) AS exact_jaccard,
           round(abs(e.est_jaccard
                 - CAST(coalesce(s.n_shared, 0) AS DOUBLE)
                   / (sa.n + sb.n - coalesce(s.n_shared, 0))), 6) AS abs_err
    FROM est e
    LEFT JOIN shared s ON s.d1 = e.d1 AND s.d2 = e.d2
    JOIN sizes sa ON sa.doc_id = e.d1
    JOIN sizes sb ON sb.doc_id = e.d2
    """,
    tags=("llm", "dedup", "minhash", "calibration"),
)
def llm_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimation-quality audit: for every LSH candidate pair, the
    signature-agreement Jaccard estimate NEXT TO the exact shingle Jaccard
    and their absolute error — the calibration table a pipeline inspects
    when tuning bands/rows (a drifting error distribution means the
    band/row trade-off no longer matches the corpus).

    Exact Jaccard here is computed on candidates only (the estimate is
    free from the signatures already on the pair row; the exact side is
    one inverted-index join over the candidate set) — the audit costs a
    verify pass, never an all-pairs pass.
    """
    pairs = llm_dedup_minhash_pairs(spark, sf_dir)
    sh = _doc_shingles(spark, sf_dir).drop("source")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("d1"), "sh")
    b = sh.select(F.col("doc_id").alias("d2"), "sh")
    shared = (
        pairs.select("d1", "d2")
        .join(a, "d1")
        .join(b, ["d2", "sh"])
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("nb"))
    exact = F.coalesce("n_shared", F.lit(0)).cast("double") / (
        F.col("na") + F.col("nb") - F.coalesce("n_shared", F.lit(0))
    )
    return (
        pairs.join(shared, ["d1", "d2"], "left")
        .join(sa, "d1")
        .join(sb, "d2")
        .select(
            "d1",
            "d2",
            "est_jaccard",
            F.round(exact, 6).alias("exact_jaccard"),
            F.round(F.abs(F.col("est_jaccard") - exact), 6).alias("abs_err"),
        )
    )


@query(
    "llm_dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE sigs AS ({_ORACLE_SIGS}),
    bands AS (
      SELECT doc_id, seed // {BAND_ROWS} AS band,
             md5(string_agg(mh::VARCHAR, '|' ORDER BY seed)) AS bandsig
      FROM sigs GROUP BY doc_id, seed // {BAND_ROWS}
    ),
    edges AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id < b.doc_id
    ),
    und AS (SELECT d1, d2 FROM edges UNION ALL SELECT d2, d1 FROM edges),
    reach AS (
      SELECT doc_id AS a, doc_id AS b FROM documents
      UNION
      SELECT r.a, u.d2 FROM reach r JOIN und u ON u.d1 = r.b
    ),
    clusters AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
    quality AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    )
    SELECT cluster_id, cluster_size, doc_id AS best_doc_id,
           n_tokens AS best_n_tokens
    FROM (
      SELECT c.cluster_id, c.doc_id, q.n_tokens,
             CAST(count(*) OVER (PARTITION BY c.cluster_id) AS BIGINT)
               AS cluster_size,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY q.n_tokens DESC, c.doc_id) AS rk
      FROM clusters c JOIN quality q ON q.doc_id = c.doc_id
    ) WHERE rk = 1
    """,
    tags=("llm", "dedup", "survivor"),
)
def llm_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked survivor selection: per duplicate cluster, keep the
    BEST document (longest token count, ties to the smallest doc_id)
    instead of `llm_dedup_keep`'s smallest-id policy — the policy real
    pipelines want (among near-duplicates, retain the most complete copy).
    Composition of the shared cluster labels with a quality signal, argmax
    via `max_by` with a (quality, -id) struct — partial-aggregated
    map-side, no window sort over clusters.
    """
    clusters = _shared(
        spark, sf_dir, "clusters", lambda: _build_clusters(spark, sf_dir)
    ).select("doc_id", "cluster_id")
    quality = load_table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    joined = clusters.join(quality, "doc_id")
    return joined.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"),
        F.expr(
            "max_by(doc_id, named_struct('q', n_tokens, 'negid', -doc_id))"
        ).alias("best_doc_id"),
        F.max("n_tokens").alias("best_n_tokens"),
    )


@query(
    "llm_dedup_cross_source",
    oracle=f"""
    WITH sigs AS ({_ORACLE_SIGS}),
    bands AS (
      SELECT doc_id, seed // {BAND_ROWS} AS band,
             md5(string_agg(mh::VARCHAR, '|' ORDER BY seed)) AS bandsig
      FROM sigs GROUP BY doc_id, seed // {BAND_ROWS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id < b.doc_id
    )
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           count(*) AS n_dup_pairs
    FROM cand c
    JOIN documents da ON da.doc_id = c.d1
    JOIN documents db ON db.doc_id = c.d2
    GROUP BY 1, 2
    """,
    tags=("llm", "dedup", "provenance"),
)
def llm_dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: near-dup pair counts per
    (source, source) cell — the provenance view that tells a corpus owner
    WHICH feeds copy from which (mirror sites, syndication, scraped
    re-posts) and which dedup blocking key the corpus actually needs
    (heavy off-diagonal mass ⇒ source-blocked verify stages miss
    duplicates). Candidates from the LSH band join (never all-pairs);
    the matrix itself is |sources|² cells, map-side aggregated. Cells are
    unordered pairs (least/greatest) so A→B and B→A mass lands together.
    """
    pairs = llm_dedup_minhash_pairs(spark, sf_dir).select("d1", "d2")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    da = docs.select(F.col("doc_id").alias("d1"), F.col("source").alias("sa"))
    db = docs.select(F.col("doc_id").alias("d2"), F.col("source").alias("sb"))
    return (
        pairs.join(da, "d1")
        .join(db, "d2")
        .groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(F.count("*").alias("n_dup_pairs"))
    )


@query(
    "llm_dedup_cluster_stats",
    oracle=f"""
    WITH RECURSIVE sigs AS ({_ORACLE_SIGS}),
    bands AS (
      SELECT doc_id, seed // {BAND_ROWS} AS band,
             md5(string_agg(mh::VARCHAR, '|' ORDER BY seed)) AS bandsig
      FROM sigs GROUP BY doc_id, seed // {BAND_ROWS}
    ),
    edges AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id < b.doc_id
    ),
    und AS (SELECT d1, d2 FROM edges UNION ALL SELECT d2, d1 FROM edges),
    reach AS (
      SELECT doc_id AS a, doc_id AS b FROM documents
      UNION
      SELECT r.a, u.d2 FROM reach r JOIN und u ON u.d1 = r.b
    ),
    clusters AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
    sizes AS (SELECT cluster_id, count(*) AS csize FROM clusters GROUP BY cluster_id)
    SELECT csize AS cluster_size,
           count(*) AS n_clusters,
           CAST(csize * count(*) AS BIGINT) AS n_docs,
           CAST(count(*) * (csize - 1) AS BIGINT) AS n_removed_at_one_per_cluster
    FROM sizes GROUP BY csize
    """,
    tags=("llm", "dedup", "report"),
)
def llm_dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup topline report: cluster-size histogram — how many
    clusters of each size exist, how many documents they hold, and how
    many rows a keep-one-per-cluster policy removes. The first table in
    every dedup write-up (duplication level, long-tail vs mega-cluster
    shape — a mega-cluster row is the boilerplate alarm). Two aggregations
    over the shared cluster labels; at 100 TB the histogram is |distinct
    sizes| rows.
    """
    clusters = _shared(
        spark, sf_dir, "clusters", lambda: _build_clusters(spark, sf_dir)
    ).select("doc_id", "cluster_id")
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("csize"))
    return sizes.groupBy(F.col("csize").alias("cluster_size")).agg(
        F.count("*").alias("n_clusters"),
        (F.col("cluster_size") * F.count("*")).alias("n_docs"),
        (F.count("*") * (F.col("cluster_size") - 1)).alias(
            "n_removed_at_one_per_cluster"
        ),
    )


@query(
    "llm_dedup_url_canonical",
    oracle="""
    WITH messy AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN 'https://' || source || '.Example.COM/p/' || (doc_id % 10) || '?b=2&a=1'
               WHEN 1 THEN 'HTTPS://' || source || '.example.com:443/p/' || (doc_id % 10) || '?a=1&b=2#frag'
               WHEN 2 THEN 'https://' || upper(source) || '.example.com/p/' || (doc_id % 10) || '/?a=1&utm_source=x&b=2'
               ELSE 'https://' || source || '.EXAMPLE.com/p/' || (doc_id % 10) || '?b=2&fbclid=abc&a=1'
             END AS url
      FROM documents
    ),
    split AS (
      SELECT doc_id, url,
             split_part(split_part(url, '#', 1), '?', 1) AS base,
             split_part(split_part(url, '#', 1), '?', 2) AS query
      FROM messy
    ),
    parts AS (
      SELECT doc_id, url, query,
             regexp_replace(
               lower(array_to_string(list_slice(string_split(base, '/'), 1, 3), '/')),
               ':443$', '') AS scheme_host,
             CASE WHEN len(string_split(base, '/')) > 3
                  THEN regexp_replace(
                    '/' || array_to_string(
                      list_slice(string_split(base, '/'), 4,
                                 len(string_split(base, '/'))), '/'),
                    '/$', '')
                  ELSE '' END AS path
      FROM split
    ),
    canon AS (
      SELECT doc_id, url,
             scheme_host || path || '?' || array_to_string(
               list_sort(list_filter(string_split(query, '&'),
                 p -> NOT (p LIKE 'utm_%' OR p LIKE 'fbclid%'))), '&')
               AS canonical_url
      FROM parts
    )
    SELECT c.doc_id, c.url, c.canonical_url,
           g.n_dups, c.doc_id = g.keep_id AS keep
    FROM canon c
    JOIN (SELECT canonical_url, count(*) AS n_dups, min(doc_id) AS keep_id
          FROM canon GROUP BY canonical_url) g
      ON g.canonical_url = c.canonical_url
    """,
    tags=("llm", "dedup", "url"),
)
def llm_dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the crawl-pipeline step BEFORE any
    content dedup: the same page arrives under scheme/host case
    variants, an explicit :443, tracking parameters (utm_*, fbclid),
    shuffled query order, fragments, and trailing slashes; canonicalize
    and the variants collapse. Messy URLs are assembled deterministically
    per doc (4 variant grammars over source + doc_id%10 paths, so real
    multi-doc groups exist); the canonicalizer is a GENERIC string
    pipeline (not a re-derivation from the construction): strip
    fragment → split query → lowercase scheme+host ONLY (paths stay
    case-significant in general; these are numeric) → drop :443 → drop
    tracking params → sort surviving params → strip trailing slash.
    Both engines run their own spelling of that pipeline (split /
    higher-order filter / sort / join), so a canonicalizer bug in either
    breaks the hash. Plan: zero-shuffle canonicalization, one groupBy on
    the canonical key, one join back — survivor = min doc_id, the exact
    dedup convention (llm_dedup_exact_docs) applied to the URL key."""
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    variant = F.col("doc_id") % 4
    pid = (F.col("doc_id") % 10).cast("string")
    messy = (
        F.when(
            variant == 0,
            F.concat(F.lit("https://"), F.col("source"), F.lit(".Example.COM/p/"), pid, F.lit("?b=2&a=1")),
        )
        .when(
            variant == 1,
            F.concat(F.lit("HTTPS://"), F.col("source"), F.lit(".example.com:443/p/"), pid, F.lit("?a=1&b=2#frag")),
        )
        .when(
            variant == 2,
            F.concat(F.lit("https://"), F.upper("source"), F.lit(".example.com/p/"), pid, F.lit("/?a=1&utm_source=x&b=2")),
        )
        .otherwise(
            F.concat(F.lit("https://"), F.col("source"), F.lit(".EXAMPLE.com/p/"), pid, F.lit("?b=2&fbclid=abc&a=1")),
        )
    )
    base = "substring_index(substring_index(url, '#', 1), '?', 1)"
    qry = (
        "CASE WHEN instr(substring_index(url, '#', 1), '?') > 0 "
        "THEN substring_index(substring_index(url, '#', 1), '?', -1) "
        "ELSE '' END"
    )
    canon = docs.select("doc_id", messy.alias("url")).selectExpr(
        "doc_id",
        "url",
        f"regexp_replace(lower(concat_ws('/', slice(split({base}, '/'), 1, 3))),"
        " ':443$', '') AS scheme_host",
        f"CASE WHEN size(split({base}, '/')) > 3 "
        f"THEN regexp_replace(concat('/', concat_ws('/', "
        f"slice(split({base}, '/'), 4, size(split({base}, '/')) - 3))), '/$', '') "
        "ELSE '' END AS path",
        f"array_join(array_sort(filter(split({qry}, '&'), "
        "p -> NOT (p LIKE 'utm_%' OR p LIKE 'fbclid%'))), '&') AS params",
    ).select(
        "doc_id",
        "url",
        F.concat(
            F.col("scheme_host"), F.col("path"), F.lit("?"), F.col("params")
        ).alias("canonical_url"),
    )
    groups = canon.groupBy("canonical_url").agg(
        F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id")
    )
    return canon.join(groups, "canonical_url").select(
        "doc_id",
        "url",
        "canonical_url",
        "n_dups",
        (F.col("doc_id") == F.col("keep_id")).alias("keep"),
    )


# --- Incremental dedup: a new batch against the existing corpus --------------

INCR_TAU = 0.5  # signature-agreement admit threshold


_INCR_ORACLE = f"""
    WITH sigs AS ({_ORACLE_SIGS}),
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
    est AS (
      SELECT d1, d2,
             round(count(CASE WHEN sa.mh = sb.mh THEN 1 END)
                   / {N_SEEDS}.0, 6) AS ej
      FROM cand
      JOIN sigs sa ON sa.doc_id = d1
      JOIN sigs sb ON sb.doc_id = d2 AND sb.seed = sa.seed
      GROUP BY d1, d2
    ),
    rel AS (
      SELECT d2 AS new_id, d1 AS partner, ej FROM est
      WHERE d2 % 5 = 0 AND ej >= {INCR_TAU}
      UNION ALL
      SELECT d1 AS new_id, d2 AS partner, ej FROM est
      WHERE d1 % 5 = 0 AND d2 % 5 <> 0 AND ej >= {INCR_TAU}
    ),
    best AS (
      SELECT new_id, min(partner) AS match_id FROM rel GROUP BY new_id
    ),
    best_ej AS (
      SELECT b.new_id, b.match_id, min(r.ej) AS match_est
      FROM best b JOIN rel r
        ON r.new_id = b.new_id AND r.partner = b.match_id
      GROUP BY b.new_id, b.match_id
    )
    SELECT d.doc_id AS new_doc_id,
           CASE WHEN b.match_id IS NULL THEN 'keep' ELSE 'dup' END AS verdict,
           b.match_id, b.match_est
    FROM documents d LEFT JOIN best_ej b ON b.new_id = d.doc_id
    WHERE d.doc_id % 5 = 0
"""


@query(
    "llm_dedup_incremental",
    oracle=_INCR_ORACLE,
    tags=("llm", "dedup", "minhash", "incremental"),
)
def llm_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup admission — the PRODUCTION ingestion shape:
    a NEW batch (doc_id % 5 == 0 stands in for today's crawl) is
    deduplicated against the EXISTING corpus and within itself, and the
    old×old pair space is never touched. A new doc is a 'dup' if an
    LSH candidate with signature agreement ≥ INCR_TAU (0.5) exists that is
    either an old doc or an earlier new doc (smaller id — the
    first-arrival-wins rule the streaming face enforces with keyed
    state); its match is the smallest qualifying partner. Composes the
    oracle-checked pairs pipeline (shingle → Carter-Wegman minhash →
    band buckets → agreement estimate) and then RESTRICTS the pair
    space to new×any — at 100 TB the band-bucket table is a PERSISTED
    state table keyed by (band, bandsig): each ingestion joins only the
    day's signatures against it and appends its own, exactly the
    `stream_dedup_minhash_lsh` state discipline in batch form; cost
    scales with the batch, not the corpus."""
    pairs = llm_dedup_minhash_pairs(spark, sf_dir)
    is_new = lambda c: F.col(c) % 5 == 0  # noqa: E731
    qual = pairs.filter(F.col("est_jaccard") >= INCR_TAU)
    rel = (
        qual.filter(is_new("d2"))
        .select(
            F.col("d2").alias("new_id"),
            F.col("d1").alias("partner"),
            F.col("est_jaccard").alias("ej"),
        )
        .unionAll(
            qual.filter(is_new("d1") & ~is_new("d2")).select(
                F.col("d1").alias("new_id"),
                F.col("d2").alias("partner"),
                F.col("est_jaccard").alias("ej"),
            )
        )
    )
    best = rel.groupBy("new_id").agg(F.min("partner").alias("match_id"))
    best_ej = (
        best.join(
            rel,
            (rel.new_id == best.new_id) & (rel.partner == best.match_id),
        )
        .groupBy(best.new_id, "match_id")
        .agg(F.min("ej").alias("match_est"))
    )
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    new_docs = docs.filter(is_new("doc_id")).select(
        F.col("doc_id").alias("new_doc_id")
    )
    return (
        new_docs.join(
            best_ej, new_docs.new_doc_id == best_ej.new_id, "left"
        )
        .select(
            "new_doc_id",
            F.when(F.col("match_id").isNull(), "keep")
            .otherwise("dup")
            .alias("verdict"),
            "match_id",
            "match_est",
        )
    )


@query(
    "llm_dedup_token_sort",
    oracle="""
    WITH sig AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(string_split(text, ' ')), ' '))
               AS s
      FROM documents
    )
    SELECT doc_id,
           CAST(count(*) OVER (PARTITION BY s) AS BIGINT) AS n_same,
           CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY s)
                THEN 1 ELSE 0 END AS keep
    FROM sig
    """,
    tags=("llm", "dedup"),
)
def llm_dedup_token_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-sort dedup: hash the doc's SORTED token multiset, so two
    documents that differ only by word order (scraper re-serialization,
    shuffled boilerplate lists) collapse to one signature — the cheap
    word-order-invariant rung between exact dedup (verbatim only) and
    MinHash (any near-dup, 128 hashes). One map-side sort per row
    (tokens sort WITHIN the row — no shuffle), one exchange on the
    16-byte signature; survivor = min doc_id, same convention as
    llm_dedup_exact_docs. Tokens are ascii-lowercase so Spark's
    sort_array and DuckDB's list_sort agree bytewise; at 100 TB this is
    a strict prefilter feeding the MinHash band join, not a replacement
    for it."""
    docs = load_table(spark, sf_dir, "documents")
    sig = docs.select(
        "doc_id",
        F.md5(
            F.array_join(F.sort_array(F.split(F.col("text"), " ")), " ")
        ).alias("s"),
    )
    w = Window.partitionBy("s")
    return sig.select(
        "doc_id",
        F.count("*").over(w).cast("long").alias("n_same"),
        F.when(F.col("doc_id") == F.min("doc_id").over(w), 1)
        .otherwise(0)
        .alias("keep"),
    )


def _eval_pr_oracle() -> str:
    from streamline_hybrid_engine_spark.registry import _REGISTRY as _REG

    cand = _REG["llm_dedup_minhash_pairs"].oracle
    truth = _REG["llm_dedup_ngram_jaccard"].oracle
    return f"""
    WITH cand AS ({cand}),
    truth AS ({truth}),
    hit AS (
      SELECT count(*) AS n_hit
      FROM cand c JOIN truth t ON t.d1 = c.d1 AND t.d2 = c.d2
    )
    SELECT CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
           CAST(n_hit AS BIGINT) AS n_hit,
           round(CAST(n_hit AS DOUBLE)
                 / nullif((SELECT count(*) FROM cand), 0), 6) AS precision,
           round(CAST(n_hit AS DOUBLE)
                 / nullif((SELECT count(*) FROM truth), 0), 6) AS recall
    FROM hit
    """


@query(
    "llm_dedup_eval_pr",
    oracle=_eval_pr_oracle(),
    tags=("llm", "dedup", "evaluation"),
)
def llm_dedup_eval_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-quality evaluation: precision/recall of the MinHash-LSH
    candidate pairs against the exact n-gram-Jaccard pairs as ground
    truth — the measurement that turns band/row parameter choices
    (llm_minhash_calibration's theory) into an observed operating
    point on the actual corpus. Pure COMPOSITION: both pair sets are
    the registry's own audited queries (engine side reuses their
    DataFrames; the oracle nests their oracle SQL verbatim, so this id
    inherits their exactness), plus one pair equi-join and null-safe
    count ratios. At 100 TB the truth side is the expensive one — run
    the eval on a hash-stable document SAMPLE (llm_train_split_hash's
    bucketing), which estimates corpus P/R without an all-corpus exact
    Jaccard."""
    from streamline_hybrid_engine_spark.registry import all_queries

    qs = all_queries()
    # each pair set has TWO consumers (its count + the hit join) — lazy
    # checkpoints so the LSH bucket join and, above all, the exact
    # inverted-index Jaccard pipeline run ONCE, not twice (r12; the
    # checkpoint tables are pair-sized, far below either pipeline's
    # intermediates)
    cand = (
        qs["llm_dedup_minhash_pairs"].fn(spark, sf_dir)
        .select("d1", "d2")
        .localCheckpoint(eager=False)
    )
    truth = (
        qs["llm_dedup_ngram_jaccard"].fn(spark, sf_dir)
        .select("d1", "d2")
        .localCheckpoint(eager=False)
    )
    n_cand = cand.agg(F.count("*").cast("long").alias("n_candidates"))
    n_truth = truth.agg(F.count("*").cast("long").alias("n_truth"))
    n_hit = cand.join(truth, ["d1", "d2"]).agg(
        F.count("*").cast("long").alias("n_hit")
    )
    return (
        n_hit.crossJoin(n_cand)
        .crossJoin(n_truth)
        .select(
            "n_candidates",
            "n_truth",
            "n_hit",
            F.round(
                F.col("n_hit")
                / F.nullif(F.col("n_candidates"), F.lit(0)).cast("double"),
                6,
            ).alias("precision"),
            F.round(
                F.col("n_hit")
                / F.nullif(F.col("n_truth"), F.lit(0)).cast("double"),
                6,
            ).alias("recall"),
        )
    )


#: Hash-stable sample bucket for the sampled dedup eval: md5 first hex
#: digit of doc_id < 12 → a deterministic 3/4-corpus sample (the
#: llm_train_split_hash digit convention). 12, not 8: true near-dup
#: pairs are SPARSE on the fixture (1-2 corpus-wide) and both-endpoint
#: sampling thins them quadratically — 3/4 keeps the sampled truth set
#: non-degenerate at sf0.01 while still exercising the valve; at 100 TB
#: the digit bound drops (e.g. < 1 for a 1/16 sample).
EVAL_SAMPLE_DIGIT_LT = 12


def _eval_pr_sampled_oracle() -> str:
    from streamline_hybrid_engine_spark.registry import _REGISTRY as _REG

    cand = _REG["llm_dedup_minhash_pairs"].oracle
    truth = _REG["llm_dedup_ngram_jaccard"].oracle
    s = (
        "SELECT doc_id FROM documents"
        " WHERE strpos('0123456789abcdef',"
        f" substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < {EVAL_SAMPLE_DIGIT_LT}"
    )
    return f"""
    WITH cand0 AS MATERIALIZED ({cand}),
    truth0 AS MATERIALIZED ({truth}),
    s AS MATERIALIZED ({s}),
    cand AS (SELECT c.d1, c.d2 FROM cand0 c
             JOIN s s1 ON s1.doc_id = c.d1 JOIN s s2 ON s2.doc_id = c.d2),
    truth AS (SELECT t.d1, t.d2 FROM truth0 t
              JOIN s s1 ON s1.doc_id = t.d1 JOIN s s2 ON s2.doc_id = t.d2),
    hit AS (
      SELECT count(*) AS n_hit
      FROM cand c JOIN truth t ON t.d1 = c.d1 AND t.d2 = c.d2
    )
    SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_docs_sample,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
           CAST(n_hit AS BIGINT) AS n_hit,
           round(CAST(n_hit AS DOUBLE)
                 / nullif((SELECT count(*) FROM cand), 0), 6) AS precision,
           round(CAST(n_hit AS DOUBLE)
                 / nullif((SELECT count(*) FROM truth), 0), 6) AS recall
    FROM hit
    """


@query(
    "llm_dedup_eval_pr_sampled",
    oracle=_eval_pr_sampled_oracle(),
    tags=("llm", "dedup", "evaluation", "scale-valve"),
)
def llm_dedup_eval_pr_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """llm_dedup_eval_pr's answer through the hash-stable SAMPLE plan —
    the executable realization of that docstring's promised 100 TB path
    (r11-verdict missing #6): the exact-Jaccard truth side is the
    expensive half, so the whole eval runs on a deterministic
    half-corpus bucket (md5-digit < {EVAL_SAMPLE_DIGIT_LT} of doc_id —
    the llm_train_split_hash convention; at 100 TB the digit bound is
    the valve, e.g. < 1 for a 1/16 sample). The SPARK plan filters the
    SHINGLE table first and rebuilds both pair pipelines from the
    sampled subset (:func:`ngram_jaccard_pairs`, :func:`band_pairs` over
    sampled :func:`_bands_with_sig`), so cost is sample-bounded — while
    the oracle filters the full-corpus pair sets by endpoint membership,
    which is provably the same set: a pair's Jaccard depends only on its
    two documents, and LSH bucket joins restricted to sample members
    yield exactly the full-corpus pairs whose BOTH endpoints are sampled
    (signatures are per-doc). That equivalence is also test-pinned
    against the full eval's pair sets."""
    digit = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
    ) - 1
    sh = _doc_shingles(spark, sf_dir).filter(digit < EVAL_SAMPLE_DIGIT_LT)
    # same two-consumer shape as the full eval: lazy-checkpoint both pair
    # sets so each sampled pipeline computes once (r12)
    truth = (
        ngram_jaccard_pairs(sh)
        .select("d1", "d2")
        .localCheckpoint(eager=False)
    )
    cand = band_pairs(
        _bands_with_sig(spark, sf_dir, sh=sh).localCheckpoint(eager=False)
    ).select("d1", "d2").localCheckpoint(eager=False)
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.filter(digit < EVAL_SAMPLE_DIGIT_LT).agg(
        F.count("*").cast("long").alias("n_docs_sample")
    )
    n_cand = cand.agg(F.count("*").cast("long").alias("n_candidates"))
    n_truth = truth.agg(F.count("*").cast("long").alias("n_truth"))
    n_hit = cand.join(truth, ["d1", "d2"]).agg(
        F.count("*").cast("long").alias("n_hit")
    )
    return (
        n_hit.crossJoin(n_docs)
        .crossJoin(n_cand)
        .crossJoin(n_truth)
        .select(
            "n_docs_sample",
            "n_candidates",
            "n_truth",
            "n_hit",
            F.round(
                F.col("n_hit")
                / F.nullif(F.col("n_candidates"), F.lit(0)).cast("double"),
                6,
            ).alias("precision"),
            F.round(
                F.col("n_hit")
                / F.nullif(F.col("n_truth"), F.lit(0)).cast("double"),
                6,
            ).alias("recall"),
        )
    )


# --- substring-level dedup: repeated-span removal (r8 verdict task 5) --------

#: anchor width in tokens. A repeated span of L ≥ SPAN_ANCHOR tokens
#: appears as exactly L − SPAN_ANCHOR + 1 consecutive repeated anchors,
#: so anchor-run merging IS the "extend the match" step of Lee et al.
#: 2022 ("Deduplicating Training Data Makes Language Models Better"),
#: expressed relationally instead of via an in-memory suffix array.
SPAN_ANCHOR = 8

#: minimum span length (tokens) worth emitting for removal — spans
#: shorter than this are overwhelmingly idiom, not duplication (Lee et
#: al. use 50 BPE tokens at corpus scale; the fixture corpus is small,
#: so the contract pins a proportionally smaller floor).
SPAN_MIN_TOKENS = 12


def _substring_oracle() -> str:
    a, m = SPAN_ANCHOR, SPAN_MIN_TOKENS
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, i AS p,
             md5(array_to_string(t[i + 1 : i + {a}], ' ')) AS gh
      FROM toks, unnest(range(0, len(t) - {a} + 1)) AS u(i)
      WHERE len(t) >= {a}
    ),
    hot AS (
      SELECT gh FROM grams GROUP BY gh HAVING count(*) >= 2
    ),
    rep AS (
      SELECT g.doc_id, g.p FROM grams g JOIN hot USING (gh)
    ),
    isl0 AS (
      SELECT doc_id, p,
             CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 1
                  THEN 0 ELSE 1 END AS brk
      FROM rep
    ),
    isl AS (
      SELECT doc_id, p,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS g
      FROM isl0
    ),
    spans AS (
      SELECT doc_id, min(p) AS start_tok, max(p) + {a} - 1 AS end_tok
      FROM isl GROUP BY doc_id, g
      HAVING max(p) + {a} - min(p) >= {m}
    ),
    sh AS (
      SELECT s.doc_id,
             CAST(s.start_tok AS BIGINT) AS start_tok,
             CAST(s.end_tok AS BIGINT) AS end_tok,
             CAST(s.end_tok - s.start_tok + 1 AS BIGINT) AS n_tokens,
             md5(array_to_string(
               t[s.start_tok + 1 : s.end_tok + 1], ' ')) AS span_md5
      FROM spans s JOIN toks USING (doc_id)
    )
    SELECT doc_id, start_tok, end_tok, n_tokens, span_md5,
           (row_number() OVER (PARTITION BY span_md5
                               ORDER BY doc_id, start_tok) = 1) AS keep
    FROM sh
    """


@query(
    "llm_dedup_substring",
    oracle=_substring_oracle(),
    tags=("llm", "dedup"),
)
def llm_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup — the dedup family's last missing
    granularity (r8 verdict task 5): remove REPEATED SPANS inside
    otherwise-distinct documents, the Lee et al. 2022 corpus pass that
    document-level MinHash/SimHash cannot see. Relational formulation:
    (1) every SPAN_ANCHOR-token anchor gram per position (explode —
    |tokens| rows, the same economics as llm_contamination_8gram);
    (2) anchors repeated ≥ 2× anywhere in the corpus (map-side-combined
    count, skew-safe for boilerplate grams); (3) per-doc ISLAND MERGE of
    consecutive repeated anchor positions — a maximal repeated span of L
    tokens is exactly a run of L−A+1 repeated anchors, so gaps-and-
    islands IS match extension, bucketed end to end (never a suffix
    array in memory, never doc×doc); (4) spans ≥ SPAN_MIN_TOKENS join
    back to token arrays for a span content hash, and the first
    occurrence by (doc_id, start_tok) per identical span text is marked
    ``keep`` — the removal table a curation pipeline applies. All
    windows are doc- or span-hash-partitioned; nothing global. Fuzzed
    vs a brute-force Python span finder
    (tests/test_property_differential.py)."""
    a = SPAN_ANCHOR
    docs = load_table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    grams = docs.filter(F.size("toks") >= a).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(toks) - {a}), "
                f"i -> md5(concat_ws(' ', slice(toks, i + 1, {a}))))"
            )
        ).alias("p", "gh"),
    )
    hot = (
        grams.groupBy("gh")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("gh")
    )
    rep = grams.join(hot, "gh", "left_semi").select("doc_id", "p")
    wseq = Window.partitionBy("doc_id").orderBy("p")
    isl = rep.withColumn(
        "brk",
        F.when(F.col("p") - F.lag("p").over(wseq) <= 1, 0).otherwise(1),
    ).withColumn("isl", F.sum("brk").over(wseq))
    spans = (
        isl.groupBy("doc_id", "isl")
        .agg(
            F.min("p").cast("long").alias("start_tok"),
            (F.max("p") + a - 1).cast("long").alias("end_tok"),
        )
        .withColumn(
            "n_tokens", (F.col("end_tok") - F.col("start_tok") + 1)
        )
        .filter(F.col("n_tokens") >= SPAN_MIN_TOKENS)
        .drop("isl")
    )
    sh = spans.join(docs, "doc_id").select(
        "doc_id",
        "start_tok",
        "end_tok",
        "n_tokens",
        F.md5(
            F.concat_ws(
                " ",
                F.expr("slice(toks, CAST(start_tok + 1 AS INT), "
                       "CAST(n_tokens AS INT))"),
            )
        ).alias("span_md5"),
    )
    wk = Window.partitionBy("span_md5").orderBy("doc_id", "start_tok")
    return sh.withColumn("keep", F.row_number().over(wk) == 1)
