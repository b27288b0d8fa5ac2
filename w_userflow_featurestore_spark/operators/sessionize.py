"""Sessionization + session-state classification (the silver layer).

The reference sessionizes by grouping on a client-supplied ``session_id``
(reference silver_user_session_events.py:111-123 — a 9-key groupBy, NOT a
gaps-and-islands window) and then classifies each session with an ordered
when-chain state machine (:125-141). The generic event stream in this
engine has no client session id, so sessionization itself is derived with
the classic gaps-and-islands pattern (a new session starts when the gap to
the previous event of the same user exceeds ``gap_ms``); the rollup and the
state machine then mirror the reference's semantics exactly:

- rollup = min/max timestamps, duration, presence flags via max(when...)
  (silver_user_session_events.py:114-123)
- ordered state rules COMPLETE -> EXIT -> TIMEOUT_EXIT -> IN_PROGRESS with
  an injected ``now`` (the reference uses wall-clock current_timestamp(),
  :135, which makes it non-deterministic — here "now" is a parameter,
  SURVEY.md §7.4).

Scale notes: both steps shuffle once on ``user_id`` (the window and the
groupBy share the partitioning, so Catalyst reuses the exchange). No
Python crosses the row path — everything is whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from w_userflow_featurestore_spark.functions import epoch_ms, exact_sum, fround, presence_flag

DEFAULT_GAP_MS = 30 * 60 * 1000          # 30 min inactivity starts a new session
DEFAULT_TIMEOUT_MS = 600 * 1000          # reference: 600 s idle => TIMEOUT_EXIT
                                         # (silver_user_session_events.py:135)
DEFAULT_COMPLETE_THRESHOLD = 50.0        # analog of scroll_ratio >= 0.95 (:128)


def assign_sessions(events: DataFrame, user_col: str = "user_id",
                    ts_col: str = "ts", order_tiebreak: str = "event_id",
                    gap_ms: int = DEFAULT_GAP_MS) -> DataFrame:
    """Gaps-and-islands session assignment: adds a ``session_id`` column.

    session boundary  <=>  first event of a user OR gap > gap_ms
    session_id = user_id * 1e10 + epoch-SECOND of the session's first
    event — CONTENT-derived, so the id of a session is a function of
    (user, session start) alone, identical no matter which batch or
    increment computes it. A batch-positional id (user * K + running
    boundary count, the obvious formulation) silently COLLIDES across
    incremental runs: the increment's first session of a user takes
    position 1 again and its MERGE overwrites a different, earlier
    session. Two sessions of one user start > gap apart (minutes), so
    epoch-second granularity cannot collide; unique across users for
    user_id < ~9.2e8 (long headroom above the 1e10 multiplier).

    When the input has an ``event_type`` column the output ALSO
    carries ``_first_event_type`` — the session's entry event type,
    constant across every row of a session BY CONSTRUCTION here. It
    is an internal carry for :func:`rollup_sessions` (which groups on
    it to stay a HashAggregate); drop it before handing the frame to
    an external sink that selects ``*``. Do not fabricate the column
    yourself: :func:`rollup_sessions` trusts it to be session-constant
    and a non-constant value silently splits a session into duplicate
    rollup rows (round-13 ADVICE note).
    """
    if gap_ms < 1000:
        raise ValueError(
            f"gap_ms={gap_ms} < 1000: the content-derived session id uses "
            "epoch-SECOND of the session start, so a sub-second gap could "
            "start two sessions of one user within the same second and "
            "silently merge them under one id (corrupting MERGE upserts)")
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev_ms = F.lag(epoch_ms(F.col(ts_col))).over(w)
    is_new = F.when(
        prev_ms.isNull() | (epoch_ms(F.col(ts_col)) - prev_ms > gap_ms), 1
    ).otherwise(0)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # running last-boundary timestamp: same single (user) exchange as
    # the lag — no extra shuffle for the session-start lookup
    start_ms = F.max(F.when(is_new == 1, epoch_ms(F.col(ts_col)))).over(cum)
    out = events.withColumn(
        "session_id",
        (F.col(user_col) * F.lit(10_000_000_000)
         + F.floor(start_ms / 1000)).cast("long"))
    if "event_type" in events.columns:
        # The session's ENTRY event type, carried forward from the
        # boundary row over the SAME window frame (round 12): every row
        # of a session then holds its session's first event's type, so
        # rollup_sessions can GROUP on it instead of aggregating it
        # with min_by(event_type, struct(ts, event_id)) — a struct
        # buffer that forces the whole rollup into SortAggregate (an
        # extra sort on every session-derived query). The struct
        # wrapper keeps a NULL type at the session head NULL (bare
        # last(..., ignorenulls) would borrow the previous session's
        # type); the window's (ts, tiebreak) order IS min_by's
        # struct(ts, event_id) tie-break, so values are identical —
        # oracle- and property-pinned.
        first_t = F.last(
            F.when(is_new == 1,
                   F.struct(F.col("event_type").alias("v"))),
            ignorenulls=True).over(cum)["v"]
        out = out.withColumn("_first_event_type", first_t)
    return out


def rollup_sessions(events_with_sessions: DataFrame,
                    user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Event -> session-grain rollup (reference A1,
    silver_user_session_events.py:111-123).

    One row per session: time bounds, duration, entry event, value
    aggregates, distinct item count, and 0/1 presence flags per event type
    (the reference's seen_enter/seen_scroll/seen_complete/seen_exit).

    Contract on ``_first_event_type``: when present it must be the
    :func:`assign_sessions` carry (session-constant) — the fast path
    below groups on it, so a caller-fabricated non-constant value
    would split sessions into duplicate rows. Frames whose session
    ids were assigned elsewhere (no carry column) take the generic
    min_by path, which derives the entry type itself.
    """
    e = events_with_sessions
    item = F.from_json(F.col("props"), "k INT")["k"]  # schema-ful JSON decode (S2)
    aggs = [
        F.min(ts_col).alias("start_time"),
        F.max(ts_col).alias("end_time"),
        (epoch_ms(F.max(ts_col)) - epoch_ms(F.min(ts_col))).alias("duration_ms"),
        F.count(F.lit(1)).alias("n_events"),
        exact_sum(F.col("value")).alias("sum_value"),
        fround(F.max("value"), 2).alias("max_value"),
        F.count_distinct(item).alias("n_items"),
        presence_flag(F.col("event_type"), "purchase").alias("seen_purchase"),
        presence_flag(F.col("event_type"), "error").alias("seen_error"),
        presence_flag(F.col("event_type"), "click").alias("seen_click"),
        presence_flag(F.col("event_type"), "view").alias("seen_view"),
    ]
    # entry type = the FIRST event's type by (ts, event_id) —
    # deterministic under equal timestamps, and a NULL type at the
    # session head stays NULL (the honest answer) instead of silently
    # borrowing the next event's type. The oracle's
    # list(... ORDER BY ts, event_id)[1] mirrors both behaviors
    # (DuckDB's arg_min would skip NULLs — caught by the randomized
    # parity harness).
    if "_first_event_type" in e.columns:
        # assign_sessions carried the entry type to every session row
        # (constant within the group), so it joins the GROUP KEY —
        # with the min_by struct gone every aggregate has a mutable
        # buffer and the rollup plans as a HashAggregate instead of
        # Sort + SortAggregate on every session-derived query
        # (round 12, guide §2.4; value-identical, oracle-pinned).
        g = (e.groupBy(F.col("session_id"), F.col(user_col),
                       F.col("_first_event_type")
                        .alias("entry_event_type"))
             .agg(*aggs))
        cols = ["session_id", user_col, "start_time", "end_time",
                "duration_ms", "n_events", "entry_event_type",
                "sum_value", "max_value", "n_items", "seen_purchase",
                "seen_error", "seen_click", "seen_view"]
        return g.select(*cols).withColumn("datetime",
                                          F.to_date("start_time"))
    # generic path for callers that assigned session ids elsewhere:
    # min_by over the (ts, id) struct pins the same tie-break
    entry = F.min_by("event_type",
                     F.struct(F.col(ts_col), F.col("event_id"))) \
        .alias("entry_event_type")
    return (
        e.groupBy("session_id", user_col)
         .agg(*aggs[:4], entry, *aggs[4:])
         .withColumn("datetime", F.to_date("start_time"))
    )


def classify_sessions(sessions: DataFrame, now: str,
                      complete_threshold: float = DEFAULT_COMPLETE_THRESHOLD,
                      timeout_ms: int = DEFAULT_TIMEOUT_MS) -> DataFrame:
    """Ordered session-state machine (reference A2,
    silver_user_session_events.py:125-141):

      1. COMPLETE      seen terminal-success AND measure >= threshold
      2. EXIT          seen failure signal (falls through rule 1)
      3. TIMEOUT_EXIT  now - end_time > timeout  (now is INJECTED, not
                       wall-clock — reference quirk P9 fixed)
      4. IN_PROGRESS   otherwise

    Then 0/1 ints is_complete / is_exit, with TIMEOUT_EXIT counted as exit
    (:139-141). Rule order is load-bearing: a session with both purchase
    and error is COMPLETE, matching the reference's when-chain.
    """
    now_ms = epoch_ms(F.to_timestamp(F.lit(now)))
    state: Column = (
        F.when((F.col("seen_purchase") == 1) &
               (F.col("max_value") >= complete_threshold), "COMPLETE")
         .when(F.col("seen_error") == 1, "EXIT")
         .when(now_ms - epoch_ms(F.col("end_time")) > timeout_ms, "TIMEOUT_EXIT")
         .otherwise("IN_PROGRESS"))
    return (sessions
            .withColumn("session_state", state)
            .withColumn("is_complete",
                        F.when(F.col("session_state") == "COMPLETE", 1).otherwise(0))
            .withColumn("is_exit",
                        F.when(F.col("session_state").isin("EXIT", "TIMEOUT_EXIT"), 1)
                         .otherwise(0)))


def sessionize(events: DataFrame, now: str,
               gap_ms: int = DEFAULT_GAP_MS,
               complete_threshold: float = DEFAULT_COMPLETE_THRESHOLD,
               timeout_ms: int = DEFAULT_TIMEOUT_MS) -> DataFrame:
    """Full event -> classified-session pipeline (the silver layer)."""
    return classify_sessions(
        rollup_sessions(assign_sessions(events, gap_ms=gap_ms)),
        now=now, complete_threshold=complete_threshold, timeout_ms=timeout_ms)
