"""Direct semantics for rolling_active_users (window membership,
partial-window flag) and quality_report (violation counting, one-pass
plan shape)."""

from __future__ import annotations

from tests.conftest import rows
from w_userflow_featurestore_spark.operators.quality import (
    bounds, in_set, min_rows, not_null, quality_report, unique,
)
from w_userflow_featurestore_spark.operators.temporal import (
    rolling_active_users,
)

_EV = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _ev(spark, data):
    from datetime import datetime
    data = [(e, datetime.fromisoformat(ts), u, t, v)
            for e, ts, u, t, v in data]
    return spark.createDataFrame(data, _EV)


def test_rolling_actives_counts_window_membership_once(spark):
    df = _ev(spark, [
        # user 1 active on day 1 twice and day 3: counts ONCE in any
        # window containing either day
        (1, "2024-01-01 01:00:00", 1, "view", 0.0),
        (2, "2024-01-01 02:00:00", 1, "view", 0.0),
        (3, "2024-01-03 01:00:00", 1, "view", 0.0),
        (4, "2024-01-03 02:00:00", 2, "view", 0.0),
        (5, "2024-01-09 01:00:00", 3, "view", 0.0),
    ])
    got = {r["day"]: r for r in rolling_active_users(df).collect()}
    # observed range only: 01-01 .. 01-09
    assert sorted(got) == [f"2024-01-0{d}" for d in range(1, 10)]
    assert got["2024-01-01"]["n_active_7d"] == 1          # u1
    assert got["2024-01-03"]["n_active_7d"] == 2          # u1, u2
    assert got["2024-01-07"]["n_active_7d"] == 2          # u1(d1,d3), u2
    # day 8: u1's day-1 activity aged out but day-3 still in [d2,d8]
    assert got["2024-01-08"]["n_active_7d"] == 2
    assert got["2024-01-09"]["n_active_7d"] == 3          # +u3
    assert got["2024-01-09"]["n_active_1d"] == 1
    assert got["2024-01-02"]["n_active_1d"] == 0          # gap day present
    # ramp-up flag: first 6 days are partial windows
    assert got["2024-01-06"]["is_complete_window"] == 0
    assert got["2024-01-07"]["is_complete_window"] == 1


def test_quality_report_counts_each_violation_kind(spark):
    df = spark.createDataFrame(
        [(1, 1, "click", 5.0), (1, None, "click", -2.0),
         (2, 3, "bogus", 5.0), (None, 4, None, 2000.0)],
        "event_id long, user_id long, event_type string, value double")
    got = dict(
        (r["rule"], (r["n_violations"], r["passed"]))
        for r in quality_report(df, [
            not_null("event_id"), unique("event_id"),
            not_null("user_id"),
            bounds("value", lo=0, hi=1000),
            in_set("event_type", ["click", "view"]),
            min_rows(10),
        ]).collect())
    assert got["event_id_not_null"] == (1, 0)
    assert got["event_id_unique"] == (1, 0)       # two id=1 rows
    assert got["user_id_not_null"] == (1, 0)
    assert got["value_bounds"] == (2, 0)          # -2.0 and 2000.0
    # NULL event_type is completeness's concern, not domain's
    assert got["event_type_in_set"] == (1, 0)     # 'bogus' only
    assert got["min_rows"] == (6, 0)              # shortfall 10-4


def test_quality_report_all_green_and_single_scan(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    rep = quality_report(df, [not_null("k"), unique("k"), min_rows(2)])
    assert rows(rep, "passed") == [(1,), (1,), (1,)]
    # the whole suite must compile to ONE scan of the input
    from w_userflow_featurestore_spark.plans import physical_plan
    assert physical_plan(rep).count("Scan ExistingRDD") == 1
