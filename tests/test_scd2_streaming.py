"""Incremental SCD2 maintenance: batch-equivalence with the one-shot
history build, txn replay exactly-once, and the streaming wrapper."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tests.conftest import rows
from w_userflow_featurestore_spark.operators.scd import (
    scd2_apply_batch, scd2_history,
)
from w_userflow_featurestore_spark.sources import LogTable

EVENTS_DDL = ("event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string")

SCD_COLS = ("user_id", "event_type", "valid_from_ms", "valid_to_ms",
            "version", "is_current")


def _b(eid, ts, uid, etype):
    return (eid, dt.datetime.fromisoformat(ts), uid, etype, 1.0, "{}")


def _df(spark, data):
    return spark.createDataFrame(data, EVENTS_DDL)


# three in-order tranches exercising every fold case: value continuing
# across a batch boundary (u1 view->view), changing at the boundary
# (u1 ->click, u2 view->error), changing WITHIN a batch (u2 multi-run),
# a key appearing mid-stream (u3), and a key silent in a batch (u2 in b2)
B1 = [_b(1, "2024-01-01 00:00:00", 1, "view"),
      _b(2, "2024-01-01 00:10:00", 2, "view"),
      _b(3, "2024-01-01 00:20:00", 2, "click")]
B2 = [_b(4, "2024-01-01 01:00:00", 1, "view"),
      _b(5, "2024-01-01 01:30:00", 1, "click")]
B3 = [_b(6, "2024-01-01 02:00:00", 1, "view"),
      _b(7, "2024-01-01 02:10:00", 2, "error"),
      _b(8, "2024-01-01 02:20:00", 2, "view"),
      _b(9, "2024-01-01 02:30:00", 3, "view")]


def test_apply_batches_equals_one_shot_history(spark, tmp_path):
    t = LogTable.create(spark, str(tmp_path / "scd"), [])
    for i, b in enumerate([B1, B2, B3]):
        scd2_apply_batch(t, _df(spark, b), txn=f"b{i}")
    assert rows(t.read(), *SCD_COLS) == \
        rows(scd2_history(_df(spark, B1 + B2 + B3)), *SCD_COLS)
    # exactly one open interval per key
    assert t.read().where("is_current = 1").count() == 3


def test_replayed_batch_is_exactly_once(spark, tmp_path):
    t = LogTable.create(spark, str(tmp_path / "scd"), [])
    scd2_apply_batch(t, _df(spark, B1), txn="b0")
    s = scd2_apply_batch(t, _df(spark, B2), txn="b1")
    before = rows(t.read(), *SCD_COLS)
    # checkpoint-recovery replay: same batch, same token -> no-op
    assert scd2_apply_batch(t, _df(spark, B2), txn="b1") == s
    assert rows(t.read(), *SCD_COLS) == before
    # a replay WITHOUT the token would corrupt (multi-run batch is not
    # semantically idempotent) — the token is load-bearing
    scd2_apply_batch(t, _df(spark, B2), txn="b1-other")
    assert rows(t.read(), *SCD_COLS) != before


def test_streaming_scd2_matches_batch_history(spark, tmp_path):
    from w_userflow_featurestore_spark.streaming.ingest import (
        streaming_scd2,
    )
    src, tbl, ckpt = (str(tmp_path / d) for d in ("src", "scd", "ck"))

    def run():
        q = streaming_scd2(
            spark.readStream.schema(EVENTS_DDL).parquet(src), tbl, ckpt,
            available_now=True)
        q.awaitTermination(120)

    _df(spark, B1).coalesce(1).write.mode("append").parquet(src)
    run()
    _df(spark, B2 + B3).coalesce(1).write.mode("append").parquet(src)
    run()   # checkpoint restart picks up only the new tranche
    got = rows(LogTable(spark, tbl).read(), *SCD_COLS)
    assert got == rows(scd2_history(_df(spark, B1 + B2 + B3)), *SCD_COLS)


def test_random_batch_splits_equal_one_shot(spark, tmp_path):
    """Batch-split invariance: ANY in-order partitioning of the stream
    folds to the same table as the one-shot history build — seeded
    random streams and split points, the property the per-case tests
    can only sample."""
    import random
    rng = random.Random(42)
    for trial in range(3):
        n = 40
        events, t0 = [], 0
        for eid in range(n):
            t0 += rng.randint(1, 90)
            events.append(_b(eid, "2024-01-01 00:00:00", rng.randint(1, 4),
                             rng.choice(["a", "b", "c"])))
            # re-stamp with a strictly increasing timestamp
            e = list(events[-1])
            e[1] = dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t0)
            events[-1] = tuple(e)
        cuts = sorted(rng.sample(range(1, n), rng.randint(1, 5)))
        batches, prev = [], 0
        for c in cuts + [n]:
            batches.append(events[prev:c])
            prev = c
        t = LogTable.create(spark, str(tmp_path / f"scd{trial}"), [])
        for i, b in enumerate(batches):
            scd2_apply_batch(t, _df(spark, b), txn=f"t{trial}b{i}")
        assert rows(t.read(), *SCD_COLS) == \
            rows(scd2_history(_df(spark, events)), *SCD_COLS), \
            f"trial {trial} cuts {cuts}"
