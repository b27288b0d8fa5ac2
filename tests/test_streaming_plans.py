"""Streaming plan pins (round-9 verdict #2: extend the plan-pin
inventory to the untimed streaming surfaces).

Batch plan pins (test_plans.py) execute and inspect the physical
plan; a streaming frame has no physical plan until a query starts, so
these pins read the ANALYZED logical plan — which is where every
property that matters at 100 TB is already decided:

* EventTimeWatermark present with the configured delay — state is
  bounded by the replay window, not stream lifetime (the O(watermark)
  vs O(forever) state distinction every stateful operator's docstring
  argues);
* the stateful operator is the intended one (session_window aggregate,
  DeduplicateWithinWatermark, stream-stream join with a time-range
  condition, FlatMapGroupsInPandasWithState) — a silent fallback to an
  unbounded variant (plain dropDuplicates, un-watermarked join) would
  pass behavioral tests on tiny streams and OOM in production;
* pure-transformation surfaces (parse_with_dead_letter) stay
  aggregation/join-free, so they add zero shuffles to any pipeline
  they front.

The foreachBatch sinks (bronze_ingest, stream_upsert, drift/novelty
monitors, streaming_scd2) are deliberately absent: their per-batch
work is the BATCH operators, whose physical plans test_plans.py
already pins; the sink glue is behaviorally covered in
test_streaming_incremental.py / test_scd2_streaming.py.
"""

from __future__ import annotations

import pytest

from w_userflow_featurestore_spark.streaming import ingest as ING
from w_userflow_featurestore_spark.streaming.stateful import (
    stateful_sessionize,
)

EVENTS_DDL = ("event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")


@pytest.fixture
def stream(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame([], EVENTS_DDL).write.parquet(src)
    return spark.readStream.schema(EVENTS_DDL).parquet(src)


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_streaming_sessionize_is_a_watermarked_session_window(stream):
    plan = _analyzed(ING.streaming_sessionize(stream))
    # 10-minute watermark annotation (-T600000ms) bounds the session
    # state; session_window is the native gap-sessionization aggregate
    assert "EventTimeWatermark" in plan
    assert "-T600000ms" in plan
    assert "session_window" in plan
    assert plan.count("Aggregate") == 1      # one rollup, no re-agg
    assert "Join" not in plan


def test_streaming_window_counts_is_a_watermarked_tumbling_agg(stream):
    plan = _analyzed(ING.streaming_window_counts(stream))
    assert "EventTimeWatermark" in plan and "-T600000ms" in plan
    # tumbling window + dim grouping, single aggregate, no joins
    assert "Aggregate [window#" in plan or "Aggregate [w" in plan
    assert "event_type" in plan
    assert plan.count("Aggregate") == 1
    assert "Join" not in plan


def test_streaming_dedup_state_is_watermark_bounded(stream):
    plan = _analyzed(ING.streaming_dedup(stream))
    # DeduplicateWithinWatermark, NOT plain Deduplicate: state is
    # O(replay window). A regression to dropDuplicates() would still
    # dedup correctly on any finite test stream — only this pin (and
    # production state size) can tell them apart.
    assert "DeduplicateWithinWatermark" in plan
    assert "event_id" in plan
    assert "EventTimeWatermark" in plan
    assert "10 minutes" in plan


def test_streaming_attribution_join_is_watermarked_both_sides(spark,
                                                              stream,
                                                              tmp_path):
    src2 = str(tmp_path / "src2")
    spark.createDataFrame([], EVENTS_DDL).write.parquet(src2)
    clicks = spark.readStream.schema(EVENTS_DDL).parquet(src2)
    plan = _analyzed(ING.streaming_attribution(stream, clicks))
    # stream-stream LEFT OUTER join: BOTH inputs must carry a
    # watermark (1 hour) or Spark cannot ever finalize the outer side
    # — and the join condition must carry the time-range bound that
    # lets state age out
    assert plan.count("EventTimeWatermark") == 2
    assert plan.count("-T3600000ms") >= 2
    assert "Join LeftOuter" in plan
    # the range bound itself: click_ts in [ts - 30 min, ts]
    assert "click_ts" in plan
    assert "INTERVAL '30' MINUTE" in plan


def test_stateful_sessionize_uses_pandas_group_state(stream):
    plan = _analyzed(stateful_sessionize(stream))
    # the custom-state path: applyInPandasWithState with a timeout —
    # not a session_window rewrite, not an unbounded groupBy
    assert "FlatMapGroupsInPandasWithState" in plan
    assert "user_id" in plan


def test_parse_with_dead_letter_is_shuffle_free(spark):
    # pure transformation: one projection per output, zero aggregates,
    # zero joins — works identically batch/stream (the wire-schema
    # plan-equivalence discipline), so pin it on a batch frame where
    # the PHYSICAL plan is also available
    raw = spark.createDataFrame([("{}",)], "value string")
    valid, dead = ING.parse_with_dead_letter(raw, EVENTS_DDL)
    for df in (valid, dead):
        plan = _analyzed(df)
        assert "Aggregate" not in plan
        assert "Join" not in plan
        phys = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in phys


def test_streaming_novelty_and_drift_sinks_declare_their_triggers(
        spark, stream, tmp_path):
    # the sink builders return un-started StreamingQuery writers via
    # .start(); pin the cheap static contract instead of starting a
    # broker: availableNow drains-and-stops (the backfill/test mode),
    # and the returned object is a live StreamingQuery handle
    q = ING.streaming_novelty_monitor(
        stream.selectExpr("event_id AS doc_id", "props AS text"),
        str(tmp_path / "scores"), str(tmp_path / "led"),
        str(tmp_path / "ck"), available_now=True)
    try:
        q.awaitTermination(120)
        assert q.exception() is None
    finally:
        q.stop()
