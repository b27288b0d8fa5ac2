"""Cleansing operators — reference D1/P3/P4 semantics
(reference silver_user_session_events.py:87-108)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import rows
from w_userflow_featurestore_spark.operators.cleanse import (
    dedup_latest, drop_null_keys, fill_unknown,
)


def _df(spark, data, schema):
    return spark.createDataFrame(data, schema)


def test_dedup_latest_keeps_latest(spark):
    df = _df(spark, [
        ("e1", "2024-01-01 00:00:00", "old"),
        ("e1", "2024-01-01 00:05:00", "new"),
        ("e2", "2024-01-01 00:00:00", "only"),
    ], "id string, ts string, payload string")
    out = dedup_latest(df, key=["id"], order_by=["ts"])
    assert rows(out, "id", "payload") == [("e1", "new"), ("e2", "only")]


def test_dedup_latest_tiebreak_is_deterministic(spark):
    df = _df(spark, [
        ("e1", "2024-01-01 00:00:00", "a"),
        ("e1", "2024-01-01 00:00:00", "b"),
    ], "id string, ts string, payload string")
    out = dedup_latest(df, key=["id"], order_by=["ts", "payload"])
    assert rows(out, "id", "payload") == [("e1", "b")]


def test_drop_null_keys_conjunctive(spark):
    df = _df(spark, [
        (1, "u"), (None, "v"), (2, None), (3, "w"),
    ], "user_id int, session string")
    out = drop_null_keys(df, ["user_id", "session"])
    assert rows(out, "user_id") == [(1,), (3,)]


def test_fill_unknown(spark):
    df = _df(spark, [("web", None), (None, "kr")], "platform string, country string")
    out = fill_unknown(df, ["platform", "country"])
    assert rows(out, "platform", "country") == [
        ("UNKNOWN", "kr"), ("web", "UNKNOWN")]
    # untouched columns stay NULL
    df2 = _df(spark, [(None, None)], "platform string, country string")
    out2 = fill_unknown(df2, ["platform"])
    assert rows(out2, "country") == [(None,)]


def test_dedup_is_idempotent(spark):
    df = _df(spark, [
        ("e1", "2024-01-01 00:00:00", "old"),
        ("e1", "2024-01-01 00:05:00", "new"),
    ], "id string, ts string, payload string")
    once = dedup_latest(df, key=["id"], order_by=["ts"])
    twice = dedup_latest(once, key=["id"], order_by=["ts"])
    assert rows(once) == rows(twice)
