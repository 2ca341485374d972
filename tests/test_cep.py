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
    # alternation/grouping must be rejected loudly, never silently dropped
    with pytest.raises(ValueError, match="alternation"):
        parse_match_recognize(base.format(pat="A|B B", defs=ok_defs))
    with pytest.raises(ValueError, match="alternation"):
        parse_match_recognize(base.format(pat="(A B)+ B", defs=ok_defs))
    # a quantified FINAL variable needs lookahead — rejected, not degraded
    with pytest.raises(ValueError, match="final pattern variable"):
        parse_match_recognize(base.format(pat="A B+", defs=ok_defs))
    # zero-width max is meaningless
    with pytest.raises(ValueError, match="bad bounds"):
        parse_match_recognize(base.format(pat="A{0} B", defs=ok_defs))
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


# -- quantified patterns (counter-NFA) --------------------------------------


def _qspec(entries, timeout_h=24):
    from streamline_hybrid_engine_spark.operators.cep import compile_quantified

    return compile_quantified(entries, timeout_h * 3_600_000_000)


def _qrun(spec, seq):
    """Run (etype, hours, event_id) rows through advance(); return matches."""
    st, out = spec.initial_state(), []
    for etype, h, eid in seq:
        st, m = spec.advance(st, etype, int(h * 3_600_000_000), eid)
        if m is not None:
            out.append(m)
    return out


def test_quantified_plus_absorbs_all_repeats():
    spec = _qspec((("a", "view", 1, None), ("b", "purchase", 1, 1)))
    out = _qrun(spec, [("view", 0, 1), ("view", 1, 2), ("view", 2, 3), ("purchase", 3, 4)])
    # a_first, a_last, a_cnt, b_id, span
    assert out == [(1, 3, 3, 4, 3 * 3600.0)]


def test_quantified_bounded_stops_absorbing_at_max():
    spec = _qspec((("a", "view", 1, 2), ("b", "purchase", 1, 1)))
    out = _qrun(spec, [("view", 0, 1), ("view", 1, 2), ("view", 2, 3), ("purchase", 3, 4)])
    # third view is skipped (relaxed contiguity), capture stops at 2
    assert out == [(1, 2, 2, 4, 3 * 3600.0)]


def test_quantified_min_not_met_blocks_jump():
    spec = _qspec((("a", "view", 2, 3), ("b", "purchase", 1, 1)))
    assert _qrun(spec, [("view", 0, 1), ("purchase", 1, 2)]) == []
    out = _qrun(spec, [("view", 0, 1), ("view", 1, 2), ("purchase", 2, 3)])
    assert out == [(1, 2, 2, 3, 2 * 3600.0)]


def test_quantified_optional_slot_emits_nulls_when_skipped():
    spec = _qspec(
        (("a", "signup", 1, 1), ("b", "error", 0, 1), ("c", "purchase", 1, 1))
    )
    out = _qrun(spec, [("signup", 0, 1), ("purchase", 1, 2)])
    assert out == [(1, None, 2, 3600.0)]
    out = _qrun(spec, [("signup", 0, 1), ("error", 0.5, 9), ("purchase", 1, 2)])
    assert out == [(1, 9, 2, 3600.0)]


def test_quantified_star_start_anchors_at_first_matched_event():
    spec = _qspec((("a", "view", 0, None), ("b", "purchase", 1, 1)))
    # purchase alone matches: a_* NULL, span 0 (anchor = the emitting event)
    assert _qrun(spec, [("purchase", 5, 7)]) == [(None, None, None, 7, 0.0)]


def test_quantified_timeout_resets_and_restarts():
    spec = _qspec((("a", "view", 1, None), ("b", "purchase", 1, 1)), timeout_h=24)
    out = _qrun(
        spec,
        [("view", 0, 1), ("view", 1, 2), ("view", 30, 3), ("purchase", 31, 4)],
    )
    # first attempt expired at +30h; the expiring view starts a new match
    assert out == [(3, 3, 1, 4, 3600.0)]


def test_quantified_greedy_non_overlapping():
    spec = _qspec((("a", "view", 1, None), ("b", "purchase", 1, 1)))
    out = _qrun(
        spec,
        [("view", 0, 1), ("purchase", 1, 2), ("view", 2, 3), ("purchase", 3, 4)],
    )
    assert out == [(1, 1, 1, 2, 3600.0), (3, 3, 1, 4, 3600.0)]


def test_quantified_text_equals_hand_declared_spec():
    from streamline_hybrid_engine_spark.operators.cep import (
        _MR_QUANT_EXPECTED,
        MR_QUANT_SPEC_TEXT,
        parse_match_recognize,
    )

    spec, part_col, order_col = parse_match_recognize(MR_QUANT_SPEC_TEXT)
    assert (spec, part_col, order_col) == (_MR_QUANT_EXPECTED, "user_id", "ts")


def test_quantifier_token_forms():
    from streamline_hybrid_engine_spark.operators.cep import parse_match_recognize

    base = (
        "MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts PATTERN ({pat}) "
        "WITHIN INTERVAL '1' HOUR DEFINE A AS event_type = 'view', "
        "B AS event_type = 'click', C AS event_type = 'purchase')"
    )
    for pat, bounds in [
        ("A+ B C", (1, None)),
        ("A* B C", (0, None)),
        ("A? B C", (0, 1)),
        ("A{3} B C", (3, 3)),
        ("A{2,} B C", (2, None)),
        ("A{2,5} B C", (2, 5)),
    ]:
        spec, _, _ = parse_match_recognize(base.format(pat=pat))
        a = spec.slots[0]
        assert (a.min_ct, a.max_ct) == bounds, pat


def test_quantified_registry_face_runs(spark, sf_dir):
    """The registry id must return rows with the documented shape (v_cnt
    >= 1, c_cnt in 1..2, nullable e_id) — value parity vs the generated
    recursive-CTE oracle is test_parity_sf0001's job."""
    from streamline_hybrid_engine_spark.registry import get_query

    rows = get_query("cep_match_recognize_quantified").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.v_cnt >= 1 and r.v_first_id is not None
        assert 1 <= r.c_cnt <= 2
        assert r.span_s <= 96 * 3600.0


def test_quantified_streaming_twin_equals_batch(spark, sf_dir):
    """The counter-NFA in applyInPandasWithState keyed state must produce
    exactly the batch quantified result on the bounded drain."""
    from streamline_hybrid_engine_spark.registry import all_queries

    qs = all_queries()
    batch = {
        tuple(r)
        for r in qs["cep_match_recognize_quantified"].fn(spark, sf_dir).collect()
    }
    stream = {
        tuple(r) for r in qs["cep_quantified_stream"].fn(spark, sf_dir).collect()
    }
    assert batch == stream and batch


def test_alternation_text_equals_programmatic(spark, sf_dir):
    """MR_ALT_SPEC_TEXT through the parser == the hand-declared twin
    run programmatically — the same text≡API pin the plain and
    quantified faces carry."""
    from streamline_hybrid_engine_spark.catalog import load_table
    from streamline_hybrid_engine_spark.operators.cep import (
        _ALT_TWIN,
        MR_ALT_SPEC_TEXT,
        match_pattern_classes,
        match_recognize,
    )

    ev = load_table(spark, sf_dir, "events")
    via_text = {
        tuple(r) for r in match_recognize(ev, MR_ALT_SPEC_TEXT).collect()
    }
    via_api = {
        tuple(r) for r in match_pattern_classes(ev, _ALT_TWIN).collect()
    }
    assert via_text == via_api
    assert via_text  # the fixture must actually produce matches


def test_alternation_parse_rejections_are_loud():
    import pytest

    from streamline_hybrid_engine_spark.operators.cep import (
        MR_ALT_SPEC_TEXT,
        compile_alternation,
        parse_match_recognize,
    )

    with pytest.raises(ValueError, match="quantifiers"):
        parse_match_recognize(
            MR_ALT_SPEC_TEXT.replace("PATTERN (S X P)", "PATTERN (S X+ P)")
        )
    with pytest.raises(ValueError, match="DISJOINT"):
        parse_match_recognize(
            MR_ALT_SPEC_TEXT.replace("'click', 'error'", "'click', 'signup'")
        )
    with pytest.raises(ValueError, match="DISJOINT"):
        compile_alternation(
            (("a", ("x", "y")), ("b", ("y",))), 1_000_000
        )


def test_alternation_format_parse_roundtrip():
    from streamline_hybrid_engine_spark.operators.cep import (
        _ALT_TWIN,
        format_match_recognize,
        parse_match_recognize,
    )

    spec, _, _ = parse_match_recognize(format_match_recognize(_ALT_TWIN))
    assert spec == _ALT_TWIN
