"""Complex event processing — a real 3-state pattern matcher (SURVEY §2.9).

The reference ships an NFA-based CEP library (Flink flink-cep: Pattern
.begin("A").followedBy("B").followedBy("C").within(timeout)). r01 covered
only the lag-based 2-event subset (cep_lite_error_after_purchase); this
module is the genuine article: a per-key NFA with relaxed contiguity and a
timeout, run as imperative state over Arrow batches — exactly the case the
build rules reserve for ``applyInPandas`` (run semantics over an ordered
per-key sequence are not window-expressible: each transition depends on the
machine's state after the previous row).

Pattern (fixture vocabulary): view → click → purchase per user, greedy
non-overlapping ("after match skip past the match"), other event types
ignored (relaxed contiguity), the whole match within TIMEOUT of the view.
Timeout expiry resets the machine; the expiring row itself may start a new
match. Deterministic given the (ts, event_id) total order — the oracle is
the same machine as a recursive-CTE scan in DuckDB.

Scale design (100 TB): one shuffle on user_id, then a linear per-key scan
with O(1) state — the same cost shape as Flink's keyed CEP operator. The
Python loop runs over Arrow-batched pandas rows per user; keys parallelize
across executors, and per-key event counts (not corpus size) bound the
sequential work.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from streamline_hybrid_engine_spark.catalog import load_table
from streamline_hybrid_engine_spark.registry import query

#: match window: purchase.ts - view.ts must be <= this (fixture events are
#: sparse — ~1 event/user/hour — so sub-day timeouts never complete a match)
TIMEOUT_US = 86_400_000_000  # 24 hours

MATCH_SCHEMA = (
    "user_id long, view_id long, click_id long, purchase_id long, span_s double"
)


def advance(state: tuple, etype: str, uts: int, eid: int):
    """One NFA transition. ``state`` = (phase, view_id, view_us, click_id);
    phase 0 = start, 1 = saw view, 2 = saw view+click.

    Returns (new_state, match_or_None). Shared verbatim by the batch and
    streaming operators so their semantics cannot drift.
    """
    phase, view_id, view_us, click_id = state
    if phase >= 1 and uts - view_us > TIMEOUT_US:  # expiry first, then consume
        phase, view_id, view_us, click_id = 0, None, None, None
    if phase == 0 and etype == "view":
        return (1, eid, uts, None), None
    if phase == 1 and etype == "click":
        return (2, view_id, view_us, eid), None
    if phase == 2 and etype == "purchase":
        match = (view_id, click_id, eid, round((uts - view_us) / 1e6, 6))
        return (0, None, None, None), match
    return (phase, view_id, view_us, click_id), None


def match_abc(events: DataFrame) -> DataFrame:
    """Run the view→click→purchase NFA over a (user_id, event_id,
    event_type, ts) DataFrame; one output row per completed match."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    def run_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        uid = int(pdf["user_id"].iloc[0])
        # vectorized datetime64 → micros (int64 ns view, integral div)
        uts = (
            pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64") // 1000
        ).tolist()
        state, out = (0, None, None, None), []
        for etype, t, eid in zip(
            pdf["event_type"].tolist(), uts, pdf["event_id"].tolist()
        ):
            state, match = advance(state, etype, t, int(eid))
            if match is not None:
                out.append((uid, *match))
        return pd.DataFrame(
            out, columns=["user_id", "view_id", "click_id", "purchase_id", "span_s"]
        )

    from streamline_hybrid_engine_spark.catalog import keyed_parallelism

    return (
        keyed_parallelism(
            events.select("user_id", "event_id", "event_type", "ts"), "user_id"
        )
        .groupBy("user_id")
        .applyInPandas(run_user, schema=MATCH_SCHEMA)
    )


def _timeout_reset(expr: str) -> str:
    """Oracle helper: the state after applying timeout expiry, inlined
    (recursive CTEs cannot name intermediates)."""
    return (
        f"(CASE WHEN s.state >= 1 AND e.uts - s.view_us > {TIMEOUT_US} "
        f"THEN 0 ELSE s.state END) = {expr}"
    )


_CEP_ORACLE = f"""
WITH RECURSIVE ev AS (
  SELECT user_id, event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS uts,
         row_number() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
  FROM events
),
scan AS (
  SELECT user_id, 0 AS rn, 0 AS state,
         CAST(NULL AS BIGINT) AS view_id, CAST(NULL AS BIGINT) AS view_us,
         CAST(NULL AS BIGINT) AS click_id,
         CAST(NULL AS BIGINT) AS m_view, CAST(NULL AS BIGINT) AS m_click,
         CAST(NULL AS BIGINT) AS m_purchase, CAST(NULL AS BIGINT) AS m_span_us
  FROM (SELECT DISTINCT user_id FROM ev)
  UNION ALL
  SELECT e.user_id, e.rn,
    CASE
      WHEN {_timeout_reset('0')} AND e.event_type = 'view' THEN 1
      WHEN {_timeout_reset('1')} AND e.event_type = 'click' THEN 2
      WHEN {_timeout_reset('2')} AND e.event_type = 'purchase' THEN 0
      ELSE (CASE WHEN s.state >= 1 AND e.uts - s.view_us > {TIMEOUT_US} THEN 0 ELSE s.state END)
    END AS state,
    CASE
      WHEN {_timeout_reset('0')}
           THEN CASE WHEN e.event_type = 'view' THEN e.event_id ELSE NULL END
      WHEN {_timeout_reset('2')} AND e.event_type = 'purchase' THEN NULL
      ELSE s.view_id
    END AS view_id,
    CASE
      WHEN {_timeout_reset('0')}
           THEN CASE WHEN e.event_type = 'view' THEN e.uts ELSE NULL END
      WHEN {_timeout_reset('2')} AND e.event_type = 'purchase' THEN NULL
      ELSE s.view_us
    END AS view_us,
    CASE
      WHEN {_timeout_reset('1')} AND e.event_type = 'click' THEN e.event_id
      WHEN {_timeout_reset('2')} AND e.event_type = 'purchase' THEN NULL
      WHEN {_timeout_reset('0')} THEN NULL
      ELSE s.click_id
    END AS click_id,
    CASE WHEN {_timeout_reset('2')} AND e.event_type = 'purchase'
         THEN s.view_id ELSE NULL END AS m_view,
    CASE WHEN {_timeout_reset('2')} AND e.event_type = 'purchase'
         THEN s.click_id ELSE NULL END AS m_click,
    CASE WHEN {_timeout_reset('2')} AND e.event_type = 'purchase'
         THEN e.event_id ELSE NULL END AS m_purchase,
    CASE WHEN {_timeout_reset('2')} AND e.event_type = 'purchase'
         THEN e.uts - s.view_us ELSE NULL END AS m_span_us
  FROM scan s JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1
)
SELECT user_id, m_view AS view_id, m_click AS click_id, m_purchase AS purchase_id,
       round(m_span_us / 1000000.0, 6) AS span_s
FROM scan WHERE m_purchase IS NOT NULL
"""


@query("cep_pattern_abc", oracle=_CEP_ORACLE, tags=("cep", "timewindow"))
def cep_pattern_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-state CEP over the events table: view → click → purchase within
    24h, greedy non-overlapping, relaxed contiguity. Oracle = the identical
    state machine as a DuckDB recursive-CTE scan (validated row-for-row
    against an independent Python reference at build time)."""
    return match_abc(load_table(spark, sf_dir, "events"))


@query("cep_pattern_abc_stream", oracle=None, tags=("cep", "streaming", "state"))
def cep_pattern_abc_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of cep_pattern_abc via ``applyInPandasWithState``:
    the NFA state (phase, view_id, view_us, click_id) lives in keyed group
    state across micro-batches — Flink CEP's keyed NFA operator shape.
    Rows within a batch are processed in (ts, event_id) order; cross-batch
    order relies on the file source's mtime ordering (bounded drain), the
    same caveat as stream_user_session_state. Incomplete matches emit
    nothing (a timeout side output would be the Flink timed-out-pattern
    analog — see stream_watermark_deadletter for the mechanism)."""
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from streamline_hybrid_engine_spark.streaming.jobs import (
        read_events_stream,
        run_to_memory,
    )

    def run_user(key, pdfs, state: GroupState):
        st = tuple(state.get) if state.exists else (0, None, None, None)
        rows = []
        for pdf in pdfs:
            uts = (
            pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64") // 1000
        ).tolist()
            rows.extend(
                zip(pdf["event_type"].tolist(), uts, pdf["event_id"].tolist())
            )
        rows.sort(key=lambda r: (r[1], r[2]))
        out = []
        for etype, t, eid in rows:
            st, match = advance(st, etype, t, eid)
            if match is not None:
                out.append((key[0], *match))
        state.update(st)
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "view_id", "click_id", "purchase_id", "span_s"],
            )

    ev = read_events_stream(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "ts"
    )
    matches = ev.groupBy("user_id").applyInPandasWithState(
        run_user,
        outputStructType=MATCH_SCHEMA,
        stateStructType="phase int, view_id long, view_us long, click_id long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(matches, "she_cep_pattern_abc_stream", "append")
