"""Pins for the CMS sketch (operators/sketches.py) and runtime bloom-filter
join pruning (join_bloom_pruned_fact) — value parity runs in
test_parity_sf0001.py; these pin the scale mechanics and sketch guarantees.
"""

from __future__ import annotations

from streamline_hybrid_engine_spark.plans import executed_plan
from streamline_hybrid_engine_spark.registry import all_queries

_QS = all_queries()


def test_bloom_filter_probes_fact_side(spark, sf_dir):
    """InjectRuntimeFilter must build a bloom filter from the selective
    dim side and probe it in a Filter on the fact (lineitem) side —
    the semi-join reduction that shrinks the join shuffle at 100 TB."""
    p = executed_plan(_QS["join_bloom_pruned_fact"].fn(spark, sf_dir))
    assert "might_contain" in p
    assert "bloom_filter_agg" in p
    probe = next(line for line in p.splitlines() if "might_contain" in line)
    assert "l_partkey" in probe


def test_bloom_filter_confs_restored(spark, sf_dir):
    """The threshold overrides must not leak into the session (they would
    silently re-plan every later broadcast join as SMJ)."""
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    _QS["join_bloom_pruned_fact"].fn(spark, sf_dir)
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before


def test_cms_build_has_map_side_partials(spark, sf_dir):
    """The sketch build's whole point at scale: every executor collapses
    its slice to <= depth*width cells BEFORE the shuffle (partial_count
    under the d*w-cell aggregate)."""
    p = executed_plan(_QS["agg_cms_heavy_hitters"].fn(spark, sf_dir))
    assert "partial_count" in p


def test_cms_estimates_never_undercount(spark, sf_dir):
    """CMS guarantee: estimate >= exact count for every key (collisions
    only inflate). overcount must be non-negative everywhere."""
    rows = _QS["agg_cms_heavy_hitters"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r["overcount"] >= 0 for r in rows)
    assert all(r["cms_est"] >= r["exact_cnt"] for r in rows)


def test_zorder_buckets_bound_both_dimensions(spark, sf_dir):
    """The z-order property: each top-3-bit bucket pins y's top 2 bits
    and x's top 1 bit, so on the 2^16 grid every bucket's rectangle
    spans <= 2^14 in y and <= 2^15 in x — both dimensions bounded,
    unlike any single-column sort."""
    rows = _QS["lake_zorder_layout"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["y_max"] - r["y_min"] <= 1 << 14, r
        assert r["x_max"] - r["x_min"] <= 1 << 15, r
    assert sum(r["n_rows"] for r in rows) > 0


def test_aqe_skew_join_splits_hot_partition(spark, sf_dir):
    """The finalized adaptive plan must contain an 'AQEShuffleRead skewed'
    node — proof OptimizeSkewedJoin split the hot key's partition into
    per-map-block sub-reads (and duplicated dim rows per sub-split)."""
    df = _QS["join_aqe_skew_split"].fn(spark, sf_dir)
    p = executed_plan(df)
    assert "isFinalPlan=true" in p
    assert "skewed" in p, p[:2000]


def test_aqe_skew_join_confs_restored(spark, sf_dir):
    before = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    _QS["join_aqe_skew_split"].fn(spark, sf_dir)
    after = {k: spark.conf.get(k) for k in before}
    assert after == before


def test_theta_sketch_estimates_track_exacts(spark, sf_dir):
    """The theta estimator must land near the exact cardinalities
    (RSE ≈ 1/sqrt(kept) ≈ 11% at rate 16 on the fixture sets — assert a
    generous 4σ), and the set algebra must be internally consistent:
    |A∪B| = |A| + |B| − |A∩B| and |A∖B| = |A| − |A∩B| hold EXACTLY on
    kept-hash counts."""
    from streamline_hybrid_engine_spark.registry import get_query

    r = get_query("agg_theta_sketch_ops").fn(spark, sf_dir).collect()[0]
    assert abs(r["est_a"] - r["exact_a"]) <= 0.45 * r["exact_a"]
    assert abs(r["est_b"] - r["exact_b"]) <= 0.45 * r["exact_b"]
    assert r["est_union"] == r["est_a"] + r["est_b"] - r["est_intersect"]
    assert r["est_a_minus_b"] == r["est_a"] - r["est_intersect"]
    assert r["est_union"] >= max(r["est_a"], r["est_b"])
