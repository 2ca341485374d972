"""Semantic unit tests for the LLM-pipeline operators (beyond oracle parity).

Parity proves Spark == DuckDB on the same formula; these prove the formula
itself does what the operator claims (dedup finds planted dupes, LSH recalls
near neighbors, quality gates behave at the boundaries).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from streamline_hybrid_engine_spark.catalog import load_table
from streamline_hybrid_engine_spark.llm.dedup import N_SEEDS
from streamline_hybrid_engine_spark.registry import all_queries

_QS = all_queries()


def test_exact_dedup_counts_add_up(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = _QS["llm_dedup_exact_docs"].fn(spark, sf_dir)
    total = out.agg(F.sum("n_copies")).first()[0]
    assert total == docs.count()
    assert out.count() == docs.select("text").distinct().count()


def test_minhash_identical_docs_get_identical_signatures(spark, sf_dir):
    """Exact duplicates must agree on every minhash seed (est_jaccard = 1)."""
    docs = load_table(spark, sf_dir, "documents")
    dup = docs.groupBy("text").agg(
        F.min("doc_id").alias("d1"), F.max("doc_id").alias("d2")
    ).filter(F.col("d1") != F.col("d2")).first()
    if dup is None:
        pytest.skip("fixture has no exact duplicates at this sf")
    sigs = _QS["llm_dedup_minhash_sig"].fn(spark, sf_dir)
    s1 = {r["seed"]: r["mh"] for r in sigs.filter(F.col("doc_id") == dup["d1"]).collect()}
    s2 = {r["seed"]: r["mh"] for r in sigs.filter(F.col("doc_id") == dup["d2"]).collect()}
    assert s1 == s2 and len(s1) == N_SEEDS


def test_minhash_pairs_estimates_bounded(spark, sf_dir):
    pairs = _QS["llm_dedup_minhash_pairs"].fn(spark, sf_dir).collect()
    for r in pairs:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert r["d1"] < r["d2"]


def test_simhash_is_16_bits(spark, sf_dir):
    out = _QS["llm_dedup_simhash"].fn(spark, sf_dir)
    bad = out.filter(~F.col("simhash16").rlike("^[01]{16}$")).count()
    assert bad == 0


def test_knn_is_symmetric_top1_of_dot(spark, sf_dir):
    """nn_cos must equal the true max dot within the label block."""
    out = _QS["llm_knn_cosine_label"].fn(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings")
    assert out.count() == e.count()  # every vector has ≥1 same-label peer
    r = out.first()
    assert -1.001 <= r["nn_cos"] <= 1.001  # unit-norm fixture → cosine range


def test_lsh_buckets_partition_the_table(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    out = _QS["llm_knn_lsh"].fn(spark, sf_dir)
    # LSH output covers only vectors whose bucket has ≥2 members, never more
    assert 0 < out.count() <= e.count()


def test_quality_filter_boundaries(spark, sf_dir):
    out = _QS["llm_text_quality"].fn(spark, sf_dir)
    rows = out.collect()
    for r in rows:
        expected = int(
            20 <= r["n_tokens"] <= 1000 and 0.01 <= r["stopword_ratio"] <= 0.6
        )
        assert r["passes_filter"] == expected


def test_langid_guess_domain(spark, sf_dir):
    out = _QS["llm_text_langid"].fn(spark, sf_dir)
    langs = {r["lang_guess"] for r in out.collect()}
    assert langs <= {"en", "de", "es", "fr", "zh", "unknown"}


def test_multimodal_checksum_matches_payload(spark, sf_dir):
    """mapInPandas decode must hash the actual bytes it was handed."""
    import hashlib

    out = _QS["mm_decode_meta"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    joined = out.join(docs, "doc_id").select("text", "checksum", "n_bytes").first()
    assert joined["checksum"] == hashlib.md5(joined["text"].encode()).hexdigest()
    assert joined["n_bytes"] == len(joined["text"].encode())


def test_ivf_multiprobe_dominates_single_probe(spark, sf_dir):
    """nprobe=2 reranks over a SUPERSET of nprobe=1's candidates (the
    second-nearest cell is added, nothing removed), so per query the
    multi-probe nn_cos can never be worse — and on the fixture at least
    one query must actually improve (a neighbor just across a Voronoi
    boundary), else the second probe is dead code."""
    one = {
        r["vec_id"]: r["nn_cos"]
        for r in _QS["llm_knn_ivf"].fn(spark, sf_dir).collect()
    }
    two = {
        r["vec_id"]: (r["nn_cos"], r["nn_cell"])
        for r in _QS["llm_knn_ivf_multiprobe"].fn(spark, sf_dir).collect()
    }
    # superset, not equality: multiprobe can legitimately return queries
    # nprobe=1 drops (a vector alone in its home cell gains candidates
    # only through its second probe cell) — dominance is over set(one)
    assert set(one) <= set(two)
    assert all(two[v][0] >= one[v] for v in one)
    assert any(two[v][0] > one[v] for v in one)


def test_multiprobe_recall_table_is_consistent(spark, sf_dir):
    """The nprobe tuning table: both rows cover the same query sample and
    ground truth; recall at nprobe=2 is >= nprobe=1 (its candidate set is
    a superset per query); hits never exceed exact; recall_micro is the
    stated floored ratio."""
    rows = {
        r["nprobe"]: r
        for r in _QS["llm_ann_recall_multiprobe"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {1, 2}
    r1, r2 = rows[1], rows[2]
    assert r1["n_queries"] == r2["n_queries"] > 0
    assert r1["n_exact"] == r2["n_exact"] >= r1["n_queries"]
    assert 0 <= r1["n_hits"] <= r2["n_hits"] <= r2["n_exact"]
    for r in (r1, r2):
        assert r["recall_micro"] == r["n_hits"] * 1_000_000 // r["n_exact"]


def test_pca_recall_eval_covers_sample_and_bounds(spark, sf_dir):
    """PCA recall delta: one row per sampled query, n_exact == k, hits
    within [0, k], recall the stated floored ratio — and the 2-dim cut
    must retain SOME signal (mean recall strictly above the ~k/N
    random-guess floor)."""
    out = _QS["llm_pca_recall_eval"].fn(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    n_q = emb.filter(F.col("vec_id") % 8 == 0).count()
    assert len(out) == n_q
    for r in out:
        assert r["n_exact"] == 10
        assert 0 <= r["n_hit"] <= 10
        assert r["recall_micro"] == r["n_hit"] * 1_000_000 // 10
    mean_recall = sum(r["n_hit"] for r in out) / (10 * len(out))
    assert mean_recall > 2 * 10 / n, mean_recall


def test_pack_nostraddle_accounting_identities(spark, sf_dir):
    """No-straddle packing report: every block is exactly 512 wide
    (packed + pad == blocks * 512), the report covers every non-empty
    doc exactly once, and pad_frac is the stated ratio."""
    out = _QS["llm_pack_nostraddle"].fn(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_nonempty = docs.filter(F.size(F.split("text", " ")) > 0).count()
    assert sum(r["n_docs"] for r in out) == n_nonempty
    for r in out:
        assert r["packed_tokens"] + r["pad_tokens"] == r["n_blocks"] * 512
        assert r["pad_frac"] == round(
            r["pad_tokens"] / (r["n_blocks"] * 512), 6
        )
        assert 0 <= r["n_trunc"] <= r["n_docs"]


def test_bmp_codec_roundtrip_and_rejections():
    """The real decoder: bit-exact round trip through encode_bmp for every
    row-padding width (1..4 px) in BOTH row orders, and ValueError (never
    NotImplementedError) on non-BMP / compressed / non-24bpp payloads."""
    import struct

    import pytest

    from streamline_hybrid_engine_spark.llm.multimodal import (
        decode_image_real,
        encode_bmp,
    )

    for w in (1, 2, 3, 4):
        for top_down in (False, True):
            pixels = [
                [((x * 37 + y * 101) % 256, (x + y) % 256, (x * y + 7) % 256)
                 for x in range(w)]
                for y in range(3)
            ]
            payload = encode_bmp(pixels, top_down=top_down)
            assert len(payload) == 54 + 3 * ((w * 3 + 3) // 4 * 4)
            assert decode_image_real(payload) == (w, 3, pixels)

    with pytest.raises(ValueError, match="not a BMP"):
        decode_image_real(b"\x89PNG" + b"\x00" * 64)
    rle8 = bytearray(encode_bmp([[(0, 0, 0)]]))
    struct.pack_into("<I", rle8, 30, 1)  # compression = BI_RLE8
    with pytest.raises(ValueError, match="image library"):
        decode_image_real(bytes(rle8))
    pal8 = bytearray(encode_bmp([[(0, 0, 0)]]))
    struct.pack_into("<H", pal8, 28, 8)  # bpp = 8 (paletted)
    with pytest.raises(ValueError, match="image library"):
        decode_image_real(bytes(pal8))
    with pytest.raises(ValueError, match="truncated"):
        decode_image_real(encode_bmp([[(1, 2, 3)]])[:-1])
    # non-positive width/zero height must raise, not return (w, h, []):
    # w<=0 makes row_size negative, which would slip past the truncation
    # check because its RHS shrinks
    for dims_off, bad in ((18, -1), (18, 0), (22, 0)):
        mal = bytearray(encode_bmp([[(1, 2, 3)]]))
        struct.pack_into("<i", mal, dims_off, bad)
        with pytest.raises(ValueError, match="invalid BMP dimensions"):
            decode_image_real(bytes(mal))


def test_pca_projection_covers_corpus_and_separates_variance(spark, sf_dir):
    """PCA projection: one exact-integer coordinate pair per vector,
    byte-identical on re-run (deterministic integer eigen — the whole
    point), and component 1 carries at least as much variance as
    component 2 (it targeted the dominant eigenvector)."""
    out = _QS["llm_embedding_pca_project"].fn(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    assert len(out) == emb.count()
    assert len({r["vec_id"] for r in out}) == len(out)
    again = _QS["llm_embedding_pca_project"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # component 1 captures at least component 2's energy once the
    # different L2 norms of the ∞-normalized directions are divided out
    from streamline_hybrid_engine_spark.llm.similarity import (
        PCA_SCALE,
        _PCA_DIM,
        llm_embedding_gram,
        pca_power_component,
    )

    cells = llm_embedding_gram(spark, sf_dir).collect()
    gram = [[0] * _PCA_DIM for _ in range(_PCA_DIM)]
    for r in cells:
        gram[r["i"]][r["j"]] = gram[r["j"]][r["i"]] = r["g_fp"]
    w1 = pca_power_component(gram, [PCA_SCALE] * _PCA_DIM)
    w2 = pca_power_component(
        gram,
        [PCA_SCALE if i % 2 == 0 else -PCA_SCALE for i in range(_PCA_DIM)],
        orth=w1,
    )
    e1 = sum(r["p1_fp"] ** 2 for r in out) / sum(x * x for x in w1)
    e2 = sum(r["p2_fp"] ** 2 for r in out) / sum(x * x for x in w2)
    # the unit-norm fixture's gram spectrum is nearly flat (random-ish
    # directions), so strict e1 >= e2 can flip by truncation noise when
    # λ1 ≈ λ2 — demand near-parity instead; the spectral-gap-gated strict
    # ordering lives in the numpy fuzz (test_property_differential)
    assert e1 >= 0.9 * e2, (e1, e2)
    # and the two directions must be genuinely distinct (deflation did
    # something): |cos(w1, w2)| well away from 1
    num = abs(sum(a * b for a, b in zip(w1, w2)))
    den = (sum(a * a for a in w1) * sum(b * b for b in w2)) ** 0.5
    assert num / den < 0.05, num / den


def test_stratified_sample_rate_and_determinism(spark, sf_dir):
    """~20% overall, no stratum wildly off, and byte-identical on re-run
    (the whole point vs rand()/sample())."""
    out = _QS["llm_sample_stratified"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n, total = out.count(), docs.count()
    assert 0.05 * total < n < 0.40 * total  # loose: small strata are noisy
    assert out.filter((F.col("bucket") < 0) | (F.col("bucket") >= 20)).count() == 0
    again = {r["doc_id"] for r in _QS["llm_sample_stratified"].fn(spark, sf_dir).collect()}
    assert again == {r["doc_id"] for r in out.collect()}


def test_split_leakage_pairs_cross_the_boundary(spark, sf_dir):
    """Every reported pair is train-side × eval-side under the SAME hash
    rule the split operator uses, and eval_split is never 'train'."""
    out = _QS["llm_split_leakage"].fn(spark, sf_dir).collect()
    digit = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
    ) - 1
    split = F.when(digit < 13, "train").when(digit < 15, "val").otherwise("test")
    assign = {
        r["doc_id"]: r["s"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", split.alias("s"))
        .collect()
    }
    for r in out:
        assert assign[r["train_doc"]] == "train"
        assert assign[r["eval_doc"]] == r["eval_split"] != "train"


def test_shingles_short_doc_ansi_safe(spark):
    """Docs with <3 tokens must yield ZERO shingles, not an ANSI
    INVALID_ARRAY_INDEX crash (ADVICE r01: unguarded descending sequence)."""
    from streamline_hybrid_engine_spark.llm.dedup import _SHINGLES

    df = spark.createDataFrame(
        [(1, "one"), (2, "one two"), (3, "a b c d")], "doc_id long, text string"
    )
    out = (
        df.withColumn("toks", F.split("text", " "))
        .select("doc_id", F.explode(F.expr(_SHINGLES)).alias("sh"))
        .collect()
    )
    assert sorted({r.doc_id for r in out}) == [3]
    assert len(out) == 2  # 4 tokens -> two 3-gram shingles


def test_minhash_pairs_single_pass_no_sig_rejoin(spark, sf_dir):
    """VERDICT r01 #3: the jaccard estimate must come from signature arrays
    carried through the band join — the signature matrix must not be
    re-joined (which showed up as 2 extra hash exchanges on (d1)/(d2, seed)
    in the r01 plan)."""
    df = _QS["llm_dedup_minhash_pairs"].fn(spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "zip_with" in p  # estimate computed on the joined row
    # the only hash exchanges allowed are the band-bucket join + distinct;
    # a sigs re-join would add partitioning on d1 / (d2, seed)
    assert p.count("Exchange hashpartitioning") <= 3, p


def test_salted_join_rejects_outer_shapes(spark):
    """ADVICE r01: replicated build side would emit unmatched rows n_salts
    times under right/full outer — must raise."""
    from streamline_hybrid_engine_spark.operators.skew import salted_join

    df = spark.range(4).withColumnRenamed("id", "k")
    dim = spark.range(2).withColumnRenamed("id", "k2")
    with pytest.raises(ValueError, match="inner.*left"):
        salted_join(df, dim, "k", "k2", how="full")
    assert salted_join(df, dim, "k", "k2", how="left").count() == 4


def test_max_run_counts_multiplicity(spark):
    """The zero-shuffle fold must equal the max token multiplicity."""
    from streamline_hybrid_engine_spark.llm.text import _max_run

    df = spark.createDataFrame(
        [(1, ["a", "b", "a", "c", "a"]), (2, ["x"]), (3, ["y", "y"])],
        "id long, toks array<string>",
    )
    got = {r.id: r.mx for r in df.select("id", F.expr(_max_run("toks")).alias("mx")).collect()}
    assert got == {1: 3, 2: 1, 3: 2}


def test_pack_sequences_conserves_tokens(spark, sf_dir):
    """Packing invariants: token totals conserved; every non-tail block is
    exactly 512 tokens; block ids are dense per source."""
    out = _QS["llm_pack_sequences"].fn(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    total = docs.select(F.sum(F.size(F.split("text", " ")))).first()[0]
    assert sum(r.n_tokens for r in out) == total
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, rows in by_src.items():
        rows.sort(key=lambda r: r.block_id)
        assert [r.block_id for r in rows] == list(range(len(rows)))  # dense
        assert all(r.n_tokens == 512 for r in rows[:-1])  # only tail partial


def test_dedup_keep_is_cluster_representatives(spark, sf_dir):
    clusters = _QS["llm_dedup_clusters"].fn(spark, sf_dir)
    keep = _QS["llm_dedup_keep"].fn(spark, sf_dir)
    n_clusters = clusters.select("cluster_id").distinct().count()
    assert keep.count() == n_clusters
    # survivors + replaced = corpus
    assert clusters.count() == load_table(spark, sf_dir, "documents").count()


def test_contamination_full_for_cross_split_exact_dupes(spark, sf_dir):
    """An eval doc whose text appears verbatim in the train split must be
    100% contaminated; and n_contaminated <= n_grams everywhere."""
    out = _QS["llm_contamination_8gram"].fn(spark, sf_dir)
    rows = out.collect()
    assert all(r.n_contaminated <= r.n_grams for r in rows)
    # find exact-dup groups that straddle the split boundary
    digit = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
    ) - 1
    split = F.when(digit < 13, "train").otherwise("eval")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", split.alias("split")
    )
    cross = (
        docs.groupBy("text")
        .agg(
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("n_train"),
            F.collect_list(F.when(F.col("split") != "train", F.col("doc_id"))).alias(
                "eval_ids"
            ),
        )
        .filter((F.col("n_train") > 0) & (F.size("eval_ids") > 0))
        .collect()
    )
    if not cross:
        pytest.skip("no cross-split exact duplicates at this sf")
    frac = {r.eval_doc: r.contaminated_frac for r in rows}
    for grp in cross:
        for eid in grp.eval_ids:
            assert frac[eid] == 1.0, (eid, frac[eid])


def test_temperature_sampling_rates_monotone_and_bounded(spark, sf_dir):
    """Per-source keep-rate must be ≤ 1, equal to 1 for the smallest
    source, and monotonically non-increasing in source size."""
    rows = _QS["llm_sample_temperature"].fn(spark, sf_dir).collect()
    space = float(1 << 48)
    by_size = sorted(rows, key=lambda r: r.n_total)
    assert all(r.thresh <= space for r in rows)
    assert by_size[0].thresh == space  # smallest source keeps everything
    threshes = [r.thresh for r in by_size]
    assert threshes == sorted(threshes, reverse=True)
    for r in rows:
        assert 0 <= r.n_kept <= r.n_total


def test_temperature_sampling_partitioning_invariant(spark, sf_dir):
    """Hash-threshold membership must not depend on partitioning."""
    q = _QS["llm_sample_temperature"].fn
    a = sorted(map(tuple, q(spark, sf_dir).collect()))
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        b = sorted(map(tuple, q(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b


def test_pii_redact_masks_every_planted_contact(spark, sf_dir):
    """Every document gets exactly one planted email + phone; the scrubber
    must find ≥1 of each and the redacted text must contain no residue."""
    df = _QS["llm_pii_redact"].fn(spark, sf_dir)
    rows = df.collect()
    assert all(r.n_emails >= 1 for r in rows)
    assert all(r.n_phones >= 1 for r in rows)
    assert all(r.n_chars_removed > 0 for r in rows)


def test_corpus_final_is_subset_of_quality_and_survivors(spark, sf_dir):
    """Pipeline composition sanity: final corpus doc counts per cell can't
    exceed either the dedup survivor count or the quality-pass count."""
    import pyspark.sql.functions as F

    final = _QS["llm_corpus_final"].fn(spark, sf_dir)
    n_final = final.agg(F.sum("n_docs")).collect()[0][0]
    n_keep = _QS["llm_dedup_keep"].fn(spark, sf_dir).count()
    quality = _QS["llm_text_quality"].fn(spark, sf_dir)
    n_quality = quality.filter(F.col("passes_filter") == 1).count()
    assert n_final <= min(n_keep, n_quality)
    assert n_final > 0


def test_approx_percentile_close_to_exact(spark, sf_dir):
    """The query's own error-bound verdicts (GK accuracy 10000 ⇒ rank
    error ≤ n/10000 ⇒ value inside the exact [p−0.001, p+0.001] band)
    must all be TRUE, and the exact-p50 anchor must match a direct
    percentile computation."""
    import pyspark.sql.functions as F

    rows = _QS["agg_approx_percentile"].fn(spark, sf_dir).collect()
    assert rows, "no groups"
    for r in rows:
        assert r.p50_ok and r.p90_ok and r.p99_ok, r
    from streamline_hybrid_engine_spark.catalog import load_table

    exact = {
        e.l_returnflag: e.p
        for e in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.expr("round(percentile(l_extendedprice, 0.5), 6)").alias("p"))
        .collect()
    }
    for r in rows:
        assert r.exact_p50 == exact[r.l_returnflag], r


def test_kmeans_partitions_every_vector_exactly_once(spark, sf_dir):
    from streamline_hybrid_engine_spark.registry import get_query

    km = get_query("llm_kmeans_lloyd").fn(spark, sf_dir).collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r.n_members for r in km) == n_vecs
    assert len(km) <= 10
    # seeds are real vectors, so no cluster can be empty in round 1 and the
    # smallest member of cluster c can never be smaller than 0
    assert all(r.n_members >= 1 for r in km)


def test_kmeans_partitioning_invariant(spark, sf_dir):
    """Fixed-point centroid grid ⇒ same clusters under any shuffle width."""
    from streamline_hybrid_engine_spark.registry import get_query

    q = get_query("llm_kmeans_lloyd").fn
    before = spark.conf.get("spark.sql.shuffle.partitions")
    a = sorted(map(tuple, q(spark, sf_dir).collect()))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = sorted(map(tuple, q(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b


def test_feature_hashing_conserves_token_mass(spark, sf_dir):
    import pyspark.sql.functions as F

    from streamline_hybrid_engine_spark.registry import get_query

    fh = get_query("llm_feature_hashing").fn(spark, sf_dir)
    hashed_total = fh.agg(F.sum("tf")).collect()[0][0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    token_total = docs.select(
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert hashed_total == token_total
    assert fh.filter((F.col("bucket") < 0) | (F.col("bucket") >= 256)).count() == 0


def test_hll_merged_estimate_bounds(spark, sf_dir):
    """The query's own error-bound verdict must hold, the exact anchor
    must match a direct distinct count, and the union must dedup segment
    overlap (global distinct ≤ sum of per-segment distincts)."""
    import pyspark.sql.functions as F

    from streamline_hybrid_engine_spark.registry import get_query

    row = get_query("agg_hll_merge").fn(spark, sf_dir).collect()[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = o.select(F.countDistinct("o_custkey")).collect()[0][0]
    assert row.merged_within_5pct, row
    assert row.exact_total == exact
    assert row.exact_total <= row.sum_segment_exact  # union dedups overlap


def test_chunk_overlap_covers_documents(spark, sf_dir):
    """Chunk accounting: chunks per doc = ceil(n_toks/stride) over starts
    < n_toks; every non-final chunk is full; the final chunk carries the
    remainder; chunk 0's fingerprint is the document's first 128 tokens."""
    import hashlib

    from streamline_hybrid_engine_spark.catalog import load_table
    from streamline_hybrid_engine_spark.llm.text import CHUNK_STRIDE, CHUNK_WINDOW

    chunks = {}
    for r in _QS["llm_chunk_overlap"].fn(spark, sf_dir).collect():
        chunks.setdefault(r.doc_id, []).append(r)
    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    assert set(chunks) == set(docs)
    for doc_id, rows in chunks.items():
        toks = docs[doc_id]
        n = len(toks)
        rows.sort(key=lambda r: r.chunk_id)
        # starts are 0, stride, ... <= n-1
        assert len(rows) == ((n - 1) // CHUNK_STRIDE) + 1
        for r in rows:
            start = r.chunk_id * CHUNK_STRIDE
            expect = min(CHUNK_WINDOW, n - start)
            assert r.n_chunk_tokens == expect, (doc_id, r, n)
            assert r.is_full == (expect == CHUNK_WINDOW), (doc_id, r, n)
        first = " ".join(toks[:CHUNK_WINDOW])
        assert rows[0].chunk_md5 == hashlib.md5(first.encode()).hexdigest()


def test_pq_adc_ranking_is_informative(spark, sf_dir):
    """PQ-ADC quality check. The fixture embeddings are near-orthogonal
    random unit vectors (no label clustering), so NO 10-code quantizer can
    reproduce the exact top-10 — the honest bar for this codebook/data is
    informativeness: the true cosine of ADC's picks must sit far above the
    corpus distribution (measured ~0.83 mean percentile; asserted at
    mean ≥ corpus mean + 0.5σ, comfortably below measured, far above the
    0 an uninformative ranking gives)."""
    import numpy as np

    from streamline_hybrid_engine_spark.catalog import load_table
    from streamline_hybrid_engine_spark.registry import get_query

    rows = load_table(spark, sf_dir, "embeddings").collect()
    emb = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    q = emb[0]
    cos = {v: float(q @ e) for v, e in emb.items() if v != 0}
    vals = np.array(list(cos.values()))
    picks = [
        cos[r["vec_id"]]
        for r in get_query("llm_ann_pq").fn(spark, sf_dir).collect()
    ]
    assert np.mean(picks) >= vals.mean() + 0.5 * vals.std()


def test_semantic_dedup_semdedup_invariants(spark, sf_dir):
    """SemDeDup contract (value parity vs the unrolled oracle is
    test_parity's job): exactly one keeper per cluster; the keeper is the
    member LEAST similar to its cell centroid (diversity rule, vec_id
    tie-break); clusters never span cells unless linked through edges —
    and the fixture must exercise multi-member clusters."""
    import pyspark.sql.functions as F

    from streamline_hybrid_engine_spark.catalog import load_table
    from streamline_hybrid_engine_spark.llm.similarity import (
        _DOT,
        label_centroids,
    )
    from streamline_hybrid_engine_spark.registry import get_query

    out = get_query("llm_dedup_semantic").fn(spark, sf_dir).toPandas()
    assert len(out) == out.vec_id.nunique()  # one verdict per vector
    by_cluster = out.groupby("cluster_id")
    assert (by_cluster.keep.sum() == 1).all()  # exactly one survivor
    assert (by_cluster.size() == by_cluster.cluster_size.first()).all()
    assert (out.cluster_id <= out.vec_id).all()  # rep = min member id
    assert (out.cluster_size > 1).any()  # fixture exercises real dedup

    # keeper = argmin (cdot, vec_id) within the cluster
    e = load_table(spark, sf_dir, "embeddings")
    cdots = {
        r["vec_id"]: r["cdot"]
        for r in e.crossJoin(F.broadcast(label_centroids(e)))
        .withColumn("cdot", F.expr(_DOT.format(a="embedding", b="cvec")))
        .groupBy("vec_id")
        .agg(F.max("cdot").alias("cdot"))
        .collect()
    }
    for cid, grp in by_cluster:
        want = min((cdots[v], v) for v in grp.vec_id)[1]
        got = grp[grp.keep].vec_id.iloc[0]
        assert got == want, (cid, got, want)


# --- r9 wave-2: tokenizer fertility + ANN recall eval -------------------------


def test_tokenizer_fertility_consistent_with_token_counts(spark, sf_dir):
    """The per-language sums must equal llm_token_count_bpe's per-doc
    counts re-aggregated, and the micro ratios must be the exact floor
    of those integer sums — fertility is an AUDIT table, so it must
    agree with the id it audits."""
    per_doc = {
        r["doc_id"]: (r["ws_tokens"], r["bpe_ish_tokens"])
        for r in _QS["llm_token_count_bpe"].fn(spark, sf_dir).collect()
    }
    langs = {
        r["doc_id"]: r["lang"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    want = {}
    for d, (ws, bpe) in per_doc.items():
        lg = langs[d]
        n, w, b = want.get(lg, (0, 0, 0))
        want[lg] = (n + 1, w + ws, b + bpe)
    out = _QS["llm_tokenizer_fertility"].fn(spark, sf_dir).collect()
    assert {r["lang"] for r in out} == set(want)
    for r in out:
        n, w, b = want[r["lang"]]
        assert (r["n_docs"], r["ws_tokens"], r["bpe_tokens"]) == (n, w, b)
        assert r["fertility_micro"] == b * 1_000_000 // max(w, 1)
        assert r["bytes_per_token_micro"] == r["n_bytes"] * 1_000_000 // max(
            b, 1
        )


def test_ann_recall_matches_independent_reference(spark, sf_dir):
    """llm_ann_recall_eval vs a from-scratch Python reference: the same
    md5-derived hyperplanes, the same LEFT-TO-RIGHT double fold (python
    float ops are the identical IEEE sequence, so not even an ulp can
    differ), the same rounded-cosine + id ranking. Certifies that the
    eval really measures the llm_knn_lsh index and that recall counts
    the exact intersection."""
    import hashlib

    rows = load_table(spark, sf_dir, "embeddings").collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    signs = [
        1.0
        if int(hashlib.md5(f"plane:{i}".encode()).hexdigest()[0], 16) >= 8
        else -1.0
        for i in range(8 * 64)
    ]

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def bucket(v):
        bits = []
        for p in range(8):
            acc = 0.0
            for i in range(64):
                acc += v[i] * signs[p * 64 + i]
            bits.append("1" if acc > 0 else "0")
        return "".join(bits)

    buckets = {vid: bucket(v) for vid, v in vecs.items()}
    qids = sorted(v for v in vecs if v % 8 == 0)

    def topk(qid, cands):
        scored = sorted(
            ((-round(fold_dot(vecs[qid], vecs[b]), 6), b) for b in cands),
        )[:10]
        return {b for _, b in scored}

    expected = {}
    for q in qids:
        exact = topk(q, [b for b in vecs if b != q])
        approx = topk(
            q, [b for b in vecs if b != q and buckets[b] == buckets[q]]
        )
        n_hit = len(exact & approx)
        expected[q] = (len(exact), n_hit, n_hit * 1_000_000 // 10)

    got = {
        r["vec_id"]: (r["n_exact"], r["n_hit"], r["recall_micro"])
        for r in _QS["llm_ann_recall_eval"].fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_ivfpq_funnel_is_informative_and_bounded(spark, sf_dir):
    """llm_ann_ivfpq (r12): 10 rows, exact-rerank order (exact_cos
    non-increasing with the documented id tie-break), every returned
    candidate's home cell is one of the query's probed cells, and the
    funnel is INFORMATIVE — the mean exact cosine of its top-10 must
    beat the corpus mean cosine to the query by a wide margin (a random
    shortlist would match it)."""
    import pyspark.sql.functions as F

    out = _QS["llm_ann_ivfpq"].fn(spark, sf_dir).collect()
    assert len(out) == 10
    got = [(r["exact_cos"], -r["vec_id"]) for r in out]
    assert got == sorted(got, reverse=True)
    assert len({r["cell"] for r in out}) <= 2  # NPROBE cells only
    from streamline_hybrid_engine_spark.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    dot = (
        "aggregate(zip_with(embedding, qe,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    corpus_mean = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .agg(F.avg(F.expr(dot)))
        .first()[0]
    )
    top_mean = sum(r["exact_cos"] for r in out) / len(out)
    assert top_mean > corpus_mean + 0.05, (top_mean, corpus_mean)


def test_ivfpq_recall_row_dominated_by_exact_scored_multiprobe(spark, sf_dir):
    """The IVFPQ tuning-table row (r12): same query sample / ground
    truth / candidate CELLS as the multiprobe nprobe=2 row, but scored
    through the lossy ADC shortlist — so its recall can never EXCEED the
    exact-scored nprobe=2 row (per query, top-k from a subset of the
    same candidates), and on the fixture it must retain real signal
    (recall well above the ~k/N random floor)."""
    ivfpq = _QS["llm_ann_recall_ivfpq"].fn(spark, sf_dir).collect()
    assert len(ivfpq) == 1
    r = ivfpq[0]
    mp = {
        x["nprobe"]: x
        for x in _QS["llm_ann_recall_multiprobe"].fn(spark, sf_dir).collect()
    }
    r2 = mp[2]
    assert r["nprobe"] == 2
    assert r["n_queries"] == r2["n_queries"] > 0
    assert r["n_exact"] == r2["n_exact"]
    assert 0 <= r["n_hits"] <= r2["n_hits"]
    assert r["recall_micro"] == r["n_hits"] * 1_000_000 // r["n_exact"]
    # informativeness floor: 12% recall@10 vs the ~2% random-shortlist
    # expectation at fixture size (measured 22.1% on the r12 fixture)
    assert r["recall_micro"] >= 120_000, r["recall_micro"]


def test_dedup_eval_sampled_equals_endpoint_filtered_full(spark, sf_dir):
    """llm_dedup_eval_pr_sampled (r12 valve): rebuilding both pair
    pipelines from the hash-sampled shingle subset must yield EXACTLY
    the full-corpus pair sets filtered to both-endpoints-in-sample —
    the equivalence the docstring proves (pair scores are pairwise;
    LSH buckets restricted to members lose nothing) — and the emitted
    counts must match a recount over those filtered sets."""
    import pyspark.sql.functions as F

    from streamline_hybrid_engine_spark.llm.dedup import EVAL_SAMPLE_DIGIT_LT

    digit = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("d1").cast("string")), 1, 1),
    ) - 1
    digit2 = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("d2").cast("string")), 1, 1),
    ) - 1

    def endpoint_filtered(name):
        out = _QS[name].fn(spark, sf_dir).select("d1", "d2")
        return sorted(
            map(
                tuple,
                out.filter(
                    (digit < EVAL_SAMPLE_DIGIT_LT)
                    & (digit2 < EVAL_SAMPLE_DIGIT_LT)
                ).collect(),
            )
        )

    cand_f = endpoint_filtered("llm_dedup_minhash_pairs")
    truth_f = endpoint_filtered("llm_dedup_ngram_jaccard")
    row = _QS["llm_dedup_eval_pr_sampled"].fn(spark, sf_dir).collect()[0]
    assert row["n_candidates"] == len(cand_f)
    assert row["n_truth"] == len(truth_f)
    assert row["n_hit"] == len(set(cand_f) & set(truth_f))
    assert 0 < row["n_docs_sample"]
    assert row["n_candidates"] > 0  # the sample still sees LSH candidates
