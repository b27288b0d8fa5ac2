"""Custom stateful streaming sessionization via applyInPandasWithState.

The third sessionization mode, alongside batch gaps-and-islands
(operators/sessionize.py) and the watermarked ``session_window``
aggregation (streaming/ingest.py streaming_sessionize):

- The REFERENCE re-judges session state every 10-minute batch run until a
  session reaches a terminal state (reference
  silver_user_session_events.py:125-141 — its README issue #2 records
  that nested stateful streaming ops forced aggregation out of
  streaming). That means a TIMEOUT_EXIT is only discovered on the next
  batch cadence.
- ``session_window`` closes sessions on event-time watermark progress but
  can only emit the windowed aggregate — the classification state machine
  still runs downstream.
- THIS operator keeps one open session per user as explicit state and
  emits a fully CLASSIFIED session row the moment the session closes:
  either a later event of the same user arrives past the inactivity gap
  (event-time close; the successor's timestamp is the "now" the state
  machine judges against), or no event arrives for ``timeout_ms`` of
  processing time (GroupStateTimeout — the streaming analog of the
  reference's current_timestamp() TIMEOUT_EXIT rule, reference
  silver_user_session_events.py:135).

Streaming vs batch semantics: append mode emits only CLOSED sessions
(COMPLETE / EXIT / TIMEOUT_EXIT) — IN_PROGRESS is represented by the
state store, not by output rows. Fed the same in-order events, the
closed rows equal the batch ``sessionize`` rows for every session the
batch run also considers closed (pinned by tests).

Scale design: state is keyed by user_id — the shuffle and the state
store partition on the same key, sized O(active users), each entry a
fixed-width aggregate plus the open session's distinct item set (cap
``max_items`` bounds degenerate sessions). Events cross to Python in
Arrow batches per group, aggregates fold in numpy/pandas — this is the
``applyInPandasWithState`` pattern for operators whose per-key logic the
built-in windowed aggregations cannot express.

Exactness: values fold as 1e2-scaled integers (functions.scaled_long's
trick), so sums are order-exact and match the batch engine's
``exact_sum`` bit-for-bit.
"""

from __future__ import annotations

import json
from typing import Any, Iterator

from pyspark.sql import DataFrame

from w_userflow_featurestore_spark.operators.sessionize import (
    DEFAULT_COMPLETE_THRESHOLD,
    DEFAULT_GAP_MS,
    DEFAULT_TIMEOUT_MS,
)

OUTPUT_SCHEMA = (
    "session_id long, user_id long, start_time timestamp, "
    "end_time timestamp, duration_ms long, n_events long, "
    "entry_event_type string, sum_value double, max_value double, "
    "n_items long, seen_purchase int, seen_error int, seen_click int, "
    "seen_view int, datetime date, session_state string, "
    "is_complete int, is_exit int")

# state tuple layout (stateStructType below, field order is load-bearing)
STATE_SCHEMA = (
    "seq long, start_ms long, end_ms long, n_events long, "
    "entry_type string, sum_scaled long, max_scaled long, "
    "items array<long>, seen_purchase int, seen_error int, "
    "seen_click int, seen_view int")

_SEEN_TYPES = ("purchase", "error", "click", "view")


def _new_session(seq: int, ts_ms: int, etype: str) -> list:
    st = [seq, ts_ms, ts_ms, 0, etype, 0, None, [], 0, 0, 0, 0]
    return st


def _fold_event(st: list, ts_ms: int, etype: str, value, props) -> None:
    st[2] = max(st[2], ts_ms)          # end_ms (events arrive sorted anyway)
    st[3] += 1                         # n_events
    if value is not None:
        scaled = int((value * 100 + 0.5) // 1)   # scaled_long semantics
        st[5] += scaled
        st[6] = scaled if st[6] is None else max(st[6], scaled)
    if props:
        try:
            k = json.loads(props).get("k")
        except (ValueError, TypeError):
            k = None
        if k is not None and k not in st[7]:
            st[7] = st[7] + [int(k)]
    for i, t in enumerate(_SEEN_TYPES):
        if etype == t:
            st[8 + i] = 1


def close_session(st: list, user_id: int, now_ms: int,
                  complete_threshold: float = DEFAULT_COMPLETE_THRESHOLD,
                  timeout_ms: int = DEFAULT_TIMEOUT_MS) -> dict:
    """Classified output row for an open-session state — the reference's
    ordered when-chain (A2) applied at close time with ``now_ms`` as the
    injected clock. Pure function: unit-testable without a stream."""
    import pandas as pd

    max_value = None if st[6] is None else st[6] / 100.0
    if st[8] == 1 and max_value is not None and \
            max_value >= complete_threshold:
        state = "COMPLETE"
    elif st[9] == 1:
        state = "EXIT"
    elif now_ms - st[2] > timeout_ms:
        state = "TIMEOUT_EXIT"
    else:
        state = "IN_PROGRESS"
    start = pd.Timestamp(st[1], unit="ms")
    return {
        # content-derived id (user + session-start second) — identical
        # to batch assign_sessions, so streaming and batch/incremental
        # outputs merge into the same table rows
        "session_id": user_id * 10_000_000_000 + st[1] // 1000,
        "user_id": user_id,
        "start_time": start,
        "end_time": pd.Timestamp(st[2], unit="ms"),
        "duration_ms": st[2] - st[1],
        "n_events": st[3],
        "entry_event_type": st[4],
        "sum_value": st[5] / 100.0,
        "max_value": max_value,
        "n_items": len(st[7]),
        "seen_purchase": st[8], "seen_error": st[9],
        "seen_click": st[10], "seen_view": st[11],
        "datetime": start.date(),
        "session_state": state,
        "is_complete": 1 if state == "COMPLETE" else 0,
        "is_exit": 1 if state in ("EXIT", "TIMEOUT_EXIT") else 0,
    }


def fold_events(st: list | None, seq0: int, user_id: int,
                events: list[tuple],
                gap_ms: int = DEFAULT_GAP_MS,
                complete_threshold: float = DEFAULT_COMPLETE_THRESHOLD,
                timeout_ms: int = DEFAULT_TIMEOUT_MS,
                max_items: int = 10_000) -> tuple[list[dict], list]:
    """Advance one user's open-session state over (ts_ms, event_type,
    value, props) tuples sorted by time; returns (closed rows, new state).
    Pure function — the applyInPandasWithState wrapper and the unit tests
    share it."""
    closed: list[dict] = []
    for ts_ms, etype, value, props in events:
        if st is None:
            st = _new_session(seq0 + 1, ts_ms, etype)
        elif ts_ms - st[2] > gap_ms:
            closed.append(close_session(st, user_id, now_ms=ts_ms,
                                        complete_threshold=complete_threshold,
                                        timeout_ms=timeout_ms))
            st = _new_session(st[0] + 1, ts_ms, etype)
        if len(st[7]) >= max_items:
            st[7] = st[7][:max_items]
        _fold_event(st, ts_ms, etype, value, props)
    return closed, st


def stateful_sessionize(events: DataFrame,
                        gap_ms: int = DEFAULT_GAP_MS,
                        complete_threshold: float = DEFAULT_COMPLETE_THRESHOLD,
                        timeout_ms: int = DEFAULT_TIMEOUT_MS) -> DataFrame:
    """events stream -> stream of CLASSIFIED closed sessions.

    ``df.groupBy(user_id).applyInPandasWithState(...)`` with a
    processing-time GroupStateTimeout: a user silent for ``timeout_ms``
    has their open session closed and emitted as TIMEOUT_EXIT without
    waiting for another event (the batch engine can only discover this on
    its next scheduled run). Works on a batch DataFrame too (state folds
    once per group, no timeouts) — handy for backfills and tests.
    """
    if gap_ms < 1000:
        raise ValueError(
            f"gap_ms={gap_ms} < 1000: session ids are epoch-second "
            "content-derived (see assign_sessions) — sub-second gaps can "
            "collide two sessions of one user under one id")
    import pandas as pd

    def handle(key: Any, pdfs: Iterator, state: Any) -> Iterator:
        user_id = int(key[0])
        if state.hasTimedOut:
            st = list(state.get)
            st[7] = list(st[7])
            row = close_session(st, user_id,
                                now_ms=st[2] + timeout_ms + 1,
                                complete_threshold=complete_threshold,
                                timeout_ms=timeout_ms)
            state.remove()
            yield pd.DataFrame([row])
            return
        evs: list[tuple] = []
        for pdf in pdfs:
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
            for i in range(len(pdf)):
                evs.append((ts_ms[i], pdf["event_type"].iloc[i],
                            None if pd.isna(pdf["value"].iloc[i])
                            else float(pdf["value"].iloc[i]),
                            pdf["props"].iloc[i],
                            int(pdf["event_id"].iloc[i])))
        # sort by (ts, event_id) — the batch engine's window order
        evs.sort(key=lambda e: (e[0], e[4]))
        if state.exists:
            st = list(state.get)
            st[7] = list(st[7])
            seq0 = st[0]
        else:
            st, seq0 = None, 0
        closed, st = fold_events(
            st, seq0, user_id, [e[:4] for e in evs], gap_ms=gap_ms,
            complete_threshold=complete_threshold, timeout_ms=timeout_ms)
        state.update(tuple(st))
        state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame(closed)

    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                handle,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf="ProcessingTimeTimeout"))
