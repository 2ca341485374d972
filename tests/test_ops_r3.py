"""Semantic tests for round-3 operators (multiset set-ops, exact stats,
binned range join, observed metrics, boilerplate grams)."""

from __future__ import annotations

import pyspark.sql.functions as F

from streamline_hybrid_engine_spark.registry import all_queries

_QS = all_queries()


def test_intersect_all_multiplicity_semantics(spark):
    """Bag intersection keeps min(l, r) copies; bag difference max(l-r, 0)."""
    a = spark.createDataFrame([(1,), (1,), (1,), (2,), (3,)], "x bigint")
    b = spark.createDataFrame([(1,), (1,), (2,), (2,)], "x bigint")
    inter = sorted(r.x for r in a.intersectAll(b).collect())
    diff = sorted(r.x for r in a.exceptAll(b).collect())
    assert inter == [1, 1, 2]
    assert diff == [1, 3]


def test_corr_covar_matches_native_within_tolerance(spark, sf_dir):
    """The exact integer-sum formulation must agree with native corr /
    covar_pop to ~1e-6 (they differ only in accumulation order and the
    1e-3 fixed-point grid)."""
    got = {
        r.l_returnflag: r
        for r in _QS["agg_corr_covar"].fn(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    native = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.corr("l_quantity", "l_extendedprice").alias("c"),
            F.covar_pop("l_quantity", "l_extendedprice").alias("cv"),
        )
        .collect()
    }
    for flag, row in got.items():
        assert abs(row.corr_qty_price - native[flag].c) < 1e-4
        # covar magnitude ~1e4; fixed-point grid error is ~1e-3 relative
        assert abs(row.covar_pop_qty_price - native[flag].cv) < abs(
            native[flag].cv
        ) * 1e-3 + 1e-3


def test_binned_range_join_equals_plain_interval_join(spark, sf_dir):
    """The bucketed rewrite must be result-invisible vs the plain form."""
    plain = set(
        map(tuple, _QS["join_interval_events"].fn(spark, sf_dir).collect())
    )
    binned = set(map(tuple, _QS["join_range_binned"].fn(spark, sf_dir).collect()))
    assert plain == binned


def test_observed_metrics_match_direct_aggregate(spark, sf_dir):
    """Accumulator values collected via observe == the same aggregates run
    as an ordinary query."""
    row = _QS["observe_pipeline_metrics"].fn(spark, sf_dir).collect()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    direct = li.agg(
        F.count("*").alias("n"),
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1_000_000
            ).cast("long")
        ).alias("rev"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("deep"),
    ).collect()[0]
    assert row.n_rows == direct.n
    assert row.revenue == round(direct.rev / 1_000_000, 6)
    assert row.n_deep_disc == direct.deep


def test_boilerplate_fraction_bounds_and_coverage(spark, sf_dir):
    """Every doc with ≥1 gram appears; fractions lie in [0,1]; flagged
    instances never exceed total instances."""
    out = _QS["llm_boilerplate_grams"].fn(spark, sf_dir)
    rows = out.collect()
    docs_with_grams = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.size(F.split("text", " ")) >= 3)
        .count()
    )
    assert len(rows) == docs_with_grams
    assert all(0.0 <= r.boiler_frac <= 1.0 for r in rows)
    assert all(r.n_boiler <= r.n_grams for r in rows)
    # the synthetic vocabulary repeats heavily → boilerplate must exist
    assert any(r.n_boiler > 0 for r in rows)


def test_async_stream_enrich_equals_batch_join(spark, sf_dir):
    """Streaming async enrichment == the equivalent batch join aggregate
    (the hybrid batch-stream equivalence check)."""
    stream = {
        r.nation: r.n_events
        for r in _QS["stream_async_enrich"].fn(spark, sf_dir).collect()
    }
    from streamline_hybrid_engine_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    batch = {
        r.n_name: r.n
        for r in e.join(c, e.user_id == c.c_custkey, "left")
        .join(n, c.c_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert stream == batch


def test_scd2_intervals_tile_per_key(spark, sf_dir):
    """SCD2 validity intervals must tile: per user, exactly one open
    (is_current) row, and each version's valid_to equals the next
    version's valid_from."""
    rows = _QS["cdc_scd2_history"].fn(spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, versions in by_user.items():
        versions.sort(key=lambda r: r.valid_from)
        assert sum(r.is_current for r in versions) == 1
        assert versions[-1].valid_to is None
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to == b.valid_from


def test_gram_diagonal_equals_norms(spark, sf_dir):
    """G[i][i] summed over the diagonal must equal the corpus's summed
    squared L2 norms (up to the 1e-6 fixed-point floor per cell)."""
    g = _QS["llm_embedding_gram"].fn(spark, sf_dir)
    diag = (
        g.filter(F.col("i") == F.col("j")).agg(F.sum("g_fp")).collect()[0][0]
        / 1_000_000
    )
    norms = _QS["llm_embedding_norm"].fn(spark, sf_dir)
    total_sq = norms.select(
        F.sum(F.col("l2_norm") * F.col("l2_norm")).alias("s")
    ).collect()[0][0]
    # 64 cells × n vectors, each floored: error < 64n/1e6
    n = norms.count()
    assert abs(diag - total_sq) < 64 * n / 1e6 + 1e-3
    assert g.count() == 64 * 65 // 2  # full upper triangle present


def test_edit_verify_bounds_and_self_similarity(spark, sf_dir):
    """Edit similarity lies in [0,1]; distance 0 ⇔ similarity 1."""
    rows = _QS["llm_dedup_edit_verify"].fn(spark, sf_dir).collect()
    assert rows, "LSH candidates must exist in the fixture corpus"
    for r in rows:
        assert 0.0 <= r.edit_sim <= 1.0
        assert (r.edit_dist == 0) == (r.edit_sim == 1.0)


def test_binned_range_join_plans_as_equi_join(spark, sf_dir):
    """The binned rewrite must plan as a hash/merge EQUI join — a
    BroadcastNestedLoopJoin would mean the bucket keys didn't register."""
    from streamline_hybrid_engine_spark.plans import executed_plan

    p = executed_plan(_QS["join_range_binned"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in p


def test_percentile_disc_matches_duckdb_quantile_disc(spark, sf_dir, duck):
    """The ceil(p*n) window formulation must reproduce DuckDB's native
    quantile_disc on the same data."""
    got = {
        r.l_returnflag: (r.q1_disc, r.q2_disc, r.q3_disc)
        for r in _QS["agg_percentile_disc"].fn(spark, sf_dir).collect()
    }
    want = {
        f: (q1, q2, q3)
        for f, q1, q2, q3 in duck.execute(
            """SELECT l_returnflag, quantile_disc(l_quantity, 0.25),
                      quantile_disc(l_quantity, 0.5), quantile_disc(l_quantity, 0.75)
               FROM lineitem GROUP BY l_returnflag"""
        ).fetchall()
    }
    assert got == want


def test_skew_kurtosis_matches_native_within_tolerance(spark, sf_dir):
    """Exact power-sum formulation vs Spark's native population
    skewness/kurtosis (same definitions, streaming accumulation)."""
    got = {
        r.l_returnflag: (r.skewness_qty, r.kurtosis_qty)
        for r in _QS["agg_skew_kurtosis"].fn(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    native = {
        r.l_returnflag: (r.sk, r.ku)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.skewness("l_quantity").alias("sk"),
            F.kurtosis("l_quantity").alias("ku"),
        )
        .collect()
    }
    for flag, (sk, ku) in got.items():
        assert abs(sk - native[flag][0]) < 1e-4
        assert abs(ku - native[flag][1]) < 1e-4


def test_blob_datasource_partitions_and_payloads(spark, sf_dir):
    """Blob source plumbing: (modality × shard) split planning yields 12
    independent read tasks, and every payload's bytes round-trip Arrow
    exactly as _blob_bytes generated them."""
    from streamline_hybrid_engine_spark.sources.pydatasource import (
        BLOB_SHARDS,
        BLOBS_PER_MODALITY,
        MODALITIES,
        _blob_bytes,
        _register_blob,
    )

    _register_blob(spark)
    df = spark.read.format("blob_store").load()
    assert df.rdd.getNumPartitions() == len(MODALITIES) * BLOB_SHARDS
    rows = df.collect()
    assert len(rows) == len(MODALITIES) * BLOBS_PER_MODALITY
    for r in rows[:20]:
        assert bytes(r.payload) == _blob_bytes(r.modality, r.blob_id)
    # modality blocks are contiguous id ranges (mi*per + j)
    for mi, m in enumerate(MODALITIES):
        ids = sorted(r.blob_id for r in rows if r.modality == m)
        assert ids == list(
            range(mi * BLOBS_PER_MODALITY, (mi + 1) * BLOBS_PER_MODALITY)
        )


def test_interpolation_is_bounded_and_anchored(spark, sf_dir):
    """Interpolated values must lie within [min(pv,nv), max(pv,nv)] of
    their anchors, actual rows must carry the true hourly fixed-point
    mean, and edges never extrapolate (NULL)."""
    import pyspark.sql.functions as F

    from streamline_hybrid_engine_spark.catalog import load_table
    from streamline_hybrid_engine_spark.registry import get_query

    rows = get_query("ts_interpolate_linear").fn(spark, sf_dir).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.event_type, []).append(r)
    ev = load_table(spark, sf_dir, "events")
    means = {
        (r.hour, r.event_type): r.m
        for r in ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        )
        .agg(
            F.floor(
                F.sum(F.floor(F.col("value") * 1000000).cast("long")).cast("double")
                / F.count("*")
            )
            .cast("long")
            .alias("m")
        )
        .collect()
    }
    n_interp = 0
    for et, series in by_key.items():
        series.sort(key=lambda r: r.hour)
        for i, r in enumerate(series):
            if r.src == "actual":
                assert r.value_fp == means[(r.hour, et)], r
            elif r.src == "edge":
                assert r.value_fp is None, r
            else:
                n_interp += 1
                pv = next(
                    s.value_fp for s in reversed(series[:i]) if s.src == "actual"
                )
                nv = next(s.value_fp for s in series[i + 1 :] if s.src == "actual")
                assert min(pv, nv) <= r.value_fp <= max(pv, nv), (r, pv, nv)
    assert n_interp > 0  # the fixture actually has gaps


def test_geo_bundle_geohash_matches_textbook_values(spark):
    """The non-iterative bit-interleave geohash must equal the standard
    bisection geohash on published reference points."""
    from streamline_hybrid_engine_spark.functions.bundles import _GH32, _GH_BITS

    def gh6_ref(lat, lon):
        # textbook bisection, written independently of the operator
        lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
        bits, out = [], []
        for i in range(30):
            rng, v = (lon_rng, lon) if i % 2 == 0 else (lat_rng, lat)
            mid = (rng[0] + rng[1]) / 2
            bits.append(1 if v >= mid else 0)
            rng[0 if v >= mid else 1] = mid
        for i in range(6):
            out.append(_GH32[int("".join(map(str, bits[5 * i : 5 * i + 5])), 2)])
        return "".join(out)

    cases = [(57.64911, 10.40744), (40.689247, -74.044502), (0.0, 0.0)]
    n = 1 << _GH_BITS
    sdf = spark.createDataFrame(cases, "lat double, lon double")
    import pyspark.sql.functions as F

    got = (
        sdf.select(
            "lat",
            "lon",
            F.least(
                F.floor((F.col("lat") + 90) / 180 * n).cast("long"), F.lit(n - 1)
            ).alias("ilat"),
            F.least(
                F.floor((F.col("lon") + 180) / 360 * n).cast("long"), F.lit(n - 1)
            ).alias("ilon"),
        )
        .withColumn(
            "code",
            F.expr(
                f"aggregate(sequence(0, {_GH_BITS - 1}), CAST(0 AS BIGINT), "
                "(acc, k) -> acc + shiftleft((shiftright(ilon, k) & 1), 2 * k + 1) "
                "+ shiftleft((shiftright(ilat, k) & 1), 2 * k))"
            ),
        )
        .withColumn(
            "gh",
            F.concat(
                *[
                    F.substring(
                        F.lit(_GH32),
                        (F.shiftright("code", s).bitwiseAND(31) + 1).cast("int"),
                        1,
                    )
                    for s in (25, 20, 15, 10, 5, 0)
                ]
            ),
        )
        .collect()
    )
    for r in got:
        assert r["gh"] == gh6_ref(r["lat"], r["lon"]), (r["lat"], r["lon"])
    assert [r["gh"] for r in got[:2]] == ["u4pruy", "dr5r7p"]
