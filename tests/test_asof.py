"""Point-in-time AS-OF join edge cases (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from tests.conftest import rows
from w_userflow_featurestore_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame([
        (1, 10, _ts("2024-01-01 10:00:00")),   # before any right row
        (2, 10, _ts("2024-01-01 11:00:00")),   # equal ts to a right row
        (3, 10, _ts("2024-01-01 12:30:00")),   # between right rows
        (4, 20, _ts("2024-01-01 10:00:00")),   # key with no right rows
    ], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([
        (10, _ts("2024-01-01 11:00:00"), 1.0),
        (10, _ts("2024-01-01 12:00:00"), 2.0),
        (10, _ts("2024-01-01 13:00:00"), 3.0),
    ], "user_id long, ts timestamp, value double")
    return left, right


def test_asof_backward_includes_equal_ts(spark):
    left, right = _frames(spark)
    out = rows(asof_join(left, right, on=["user_id"]),
               "event_id", "value_r")
    assert out == [(1, None),    # no prior right row -> NULL
                   (2, 1.0),     # equal ts included (backward)
                   (3, 2.0),     # latest at-or-before 12:30
                   (4, None)]    # key never appears on the right


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    out = rows(asof_join(left, right, on=["user_id"], strict=True),
               "event_id", "value_r")
    assert out == [(1, None), (2, None), (3, 2.0), (4, None)]


def test_asof_single_shuffle_no_pair_blowup(spark):
    left, right = _frames(spark)
    p = (asof_join(left, right, on=["user_id"])
         ._jdf.queryExecution().executedPlan().toString())
    # union + keyed window: exactly one hash exchange, no join operator
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p
