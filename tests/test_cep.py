"""NFA semantics tests for the 3-state CEP operator (operators/cep.py).

Parity proves Spark == the recursive-CTE oracle on the fixture; these pin
the machine's edge behavior on adversarial synthetic sequences: timeout
expiry + restart, greedy non-overlap, relaxed contiguity, first-element
anchoring.
"""

from __future__ import annotations

import datetime as dt

from streamline_hybrid_engine_spark.operators.cep import match_abc
from streamline_hybrid_engine_spark.registry import all_queries

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    """rows: (user_id, event_id, event_type, hours_after_t0)"""
    return spark.createDataFrame(
        [(u, e, t, T0 + dt.timedelta(hours=h)) for u, e, t, h in rows],
        "user_id long, event_id long, event_type string, ts timestamp",
    )


def _matches(spark, rows):
    out = match_abc(_events(spark, rows)).collect()
    return sorted((r.user_id, r.view_id, r.click_id, r.purchase_id) for r in out)


def test_basic_match_and_span(spark):
    df = match_abc(
        _events(spark, [(1, 10, "view", 0), (1, 11, "click", 1), (1, 12, "purchase", 2)])
    ).collect()
    assert [(r.view_id, r.click_id, r.purchase_id, r.span_s) for r in df] == [
        (10, 11, 12, 7200.0)
    ]


def test_relaxed_contiguity_ignores_other_events(spark):
    rows = [
        (1, 10, "view", 0),
        (1, 11, "error", 0.5),   # ignored between A and B
        (1, 12, "click", 1),
        (1, 13, "signup", 1.5),  # ignored between B and C
        (1, 14, "purchase", 2),
    ]
    assert _matches(spark, rows) == [(1, 10, 12, 14)]


def test_anchors_first_view_and_first_click(spark):
    rows = [
        (1, 10, "view", 0),
        (1, 11, "view", 1),      # second view ignored (phase already 1)
        (1, 12, "click", 2),
        (1, 13, "click", 3),     # second click ignored (phase already 2)
        (1, 14, "purchase", 4),
    ]
    assert _matches(spark, rows) == [(1, 10, 12, 14)]


def test_timeout_expires_partial_match(spark):
    rows = [
        (1, 10, "view", 0),
        (1, 11, "click", 1),
        (1, 12, "purchase", 25),  # > 24h after the view: machine reset, no match
    ]
    assert _matches(spark, rows) == []


def test_timeout_reset_allows_restart(spark):
    rows = [
        (1, 10, "view", 0),
        (1, 11, "view", 26),      # first view expired; this one starts fresh
        (1, 12, "click", 27),
        (1, 13, "purchase", 28),
    ]
    assert _matches(spark, rows) == [(1, 11, 12, 13)]


def test_greedy_non_overlapping(spark):
    rows = [
        (1, 10, "view", 0),
        (1, 11, "click", 1),
        (1, 12, "purchase", 2),
        (1, 13, "view", 3),
        (1, 14, "click", 4),
        (1, 15, "purchase", 5),
    ]
    assert _matches(spark, rows) == [(1, 10, 11, 12), (1, 13, 14, 15)]


def test_wrong_order_never_matches(spark):
    rows = [(1, 10, "purchase", 0), (1, 11, "click", 1), (1, 12, "view", 2)]
    assert _matches(spark, rows) == []


def test_streaming_twin_equals_batch(spark, sf_dir):
    """The applyInPandasWithState NFA must produce exactly the batch result
    on the bounded drain (hybrid promise: one semantics, two runtimes)."""
    qs = all_queries()
    batch = {tuple(r) for r in qs["cep_pattern_abc"].fn(spark, sf_dir).collect()}
    stream = {
        tuple(r) for r in qs["cep_pattern_abc_stream"].fn(spark, sf_dir).collect()
    }
    assert batch == stream and len(batch) > 0


def test_absence_complements_presence(spark, sf_dir):
    """The absence anti-join must be the exact complement of the
    presence semi-join under the SAME interval predicate (error by the
    same user in (ts, ts+30 min]) — together they partition the purchase
    set. (cep_lite uses different semantics — strict contiguity, 10 min —
    so the complement is asserted against the predicate itself.)"""
    import pyspark.sql.functions as F

    from streamline_hybrid_engine_spark.catalog import load_table
    from streamline_hybrid_engine_spark.operators.cep import ABSENCE_WINDOW_US
    from streamline_hybrid_engine_spark.registry import get_query

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    cond = (
        (p.user_id == e.e_user)
        & (e.e_ts > p.purchase_ts)
        & (F.unix_micros(e.e_ts) - F.unix_micros(p.purchase_ts) <= ABSENCE_WINDOW_US)
    )
    with_err = {r.purchase_id for r in p.join(e, cond, "left_semi").collect()}
    without = {
        r.purchase_id
        for r in get_query("cep_absence_no_error_after_purchase")
        .fn(spark, sf_dir)
        .collect()
    }
    all_purchases = {r.purchase_id for r in p.collect()}
    assert with_err.isdisjoint(without)
    assert with_err | without == all_purchases
    assert with_err and without  # fixture exercises both branches


# --- MATCH_RECOGNIZE text face ----------------------------------------------


def test_match_recognize_parses_to_expected_spec():
    from streamline_hybrid_engine_spark.operators.cep import (
        MR_SPEC_TEXT,
        parse_match_recognize,
    )

    spec, part, order = parse_match_recognize(MR_SPEC_TEXT)
    assert part == "user_id" and order == "ts"
    assert spec.steps == ("signup", "view", "error")
    assert spec.timeout_us == 48 * 3_600_000_000


def test_match_recognize_units_and_whitespace():
    from streamline_hybrid_engine_spark.operators.cep import parse_match_recognize

    spec, _, _ = parse_match_recognize(
        "MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts "
        "PATTERN (A B) WITHIN INTERVAL '90' MINUTES "
        "DEFINE A AS event_type = 'view', B AS event_type = 'click')"
    )
    assert spec.steps == ("view", "click")
    assert spec.timeout_us == 90 * 60_000_000


def test_match_recognize_rejects_bad_specs():
    import pytest

    from streamline_hybrid_engine_spark.operators.cep import parse_match_recognize

    base = (
        "MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts PATTERN ({pat}) "
        "WITHIN INTERVAL '1' HOUR DEFINE {defs})"
    )
    ok_defs = "A AS event_type = 'view', B AS event_type = 'click'"
    # quantifiers/alternation must be rejected loudly, never silently dropped
    with pytest.raises(ValueError, match="quantifiers"):
        parse_match_recognize(base.format(pat="A+ B", defs=ok_defs))
    # undefined pattern variable
    with pytest.raises(ValueError, match="without DEFINE"):
        parse_match_recognize(base.format(pat="A B C", defs=ok_defs))
    # non-event_type predicate is not compilable
    with pytest.raises(ValueError, match="unsupported DEFINE"):
        parse_match_recognize(
            base.format(pat="A B", defs="A AS score > 3, B AS event_type = 'x'")
        )
    # missing WITHIN
    with pytest.raises(ValueError, match="WITHIN"):
        parse_match_recognize(
            "MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts PATTERN (A B) "
            "DEFINE A AS event_type = 'view', B AS event_type = 'click')"
        )


def test_match_recognize_equals_programmatic_api(spark, sf_dir):
    """The text face and compile_pattern must produce identical matches
    for the same (steps, timeout)."""
    from streamline_hybrid_engine_spark.catalog import load_table
    from streamline_hybrid_engine_spark.operators.cep import (
        compile_pattern,
        match_pattern,
        match_recognize,
    )

    ev = load_table(spark, sf_dir, "events")
    text = (
        "MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts "
        "PATTERN (V P) WITHIN INTERVAL '6' HOUR "
        "DEFINE V AS event_type = 'view', P AS event_type = 'purchase')"
    )
    via_text = {tuple(r) for r in match_recognize(ev, text).collect()}
    spec = compile_pattern(("view", "purchase"), 6 * 3_600_000_000)
    via_api = {tuple(r) for r in match_pattern(ev, spec).collect()}
    assert via_text == via_api and via_text
