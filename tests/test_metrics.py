"""Gold-layer metric operators — reference A3-A16 semantics on hand-built
session/event frames (FIXTURES.md §1.2 cases 8-14: bounce, binge,
repeat-complete, retention directions, division guards, histogram
boundaries, lexicographic continuation order)."""

from __future__ import annotations

import datetime as dt

from tests.conftest import rows
from w_userflow_featurestore_spark.operators import metrics as M

D1 = dt.date(2024, 1, 1)
D2 = dt.date(2024, 1, 2)

SESSION_SCHEMA = ("session_id long, user_id long, start_time timestamp, "
                  "end_time timestamp, duration_ms long, n_events long, "
                  "entry_event_type string, sum_value double, max_value double, "
                  "n_items long, datetime date, session_state string, "
                  "is_complete int, is_exit int")


def _sessions(spark, data):
    return spark.createDataFrame(data, SESSION_SCHEMA)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _sess(sid, uid, start, end, state, date=D1, entry="view",
          max_value=10.0, n_events=2):
    dur = int((_ts(end) - _ts(start)).total_seconds() * 1000)
    return (sid, uid, _ts(start), _ts(end), dur, n_events, entry, 10.0,
            max_value, 1, date,
            state, 1 if state == "COMPLETE" else 0,
            1 if state in ("EXIT", "TIMEOUT_EXIT") else 0)


def test_user_daily_rates_and_bounce(spark):
    s = _sessions(spark, [
        _sess(1, 1, "2024-01-01 10:00:00", "2024-01-01 10:00:05", "COMPLETE"),
        _sess(2, 1, "2024-01-01 11:00:00", "2024-01-01 11:20:00", "EXIT"),
        _sess(3, 1, "2024-01-01 12:00:00", "2024-01-01 12:20:00", "IN_PROGRESS"),
        _sess(4, 2, "2024-01-01 10:00:00", "2024-01-01 10:30:00", "TIMEOUT_EXIT"),
    ])
    got = {r["user_id"]: r for r in M.user_daily(s).collect()}
    u1 = got[1]
    assert u1["total_sessions"] == 3
    assert (u1["complete_sessions"], u1["exit_sessions"],
            u1["in_progress_sessions"]) == (1, 1, 1)
    assert u1["completion_rate"] == 0.33
    assert u1["exit_rate"] == 0.33
    assert u1["bounce_ratio"] == 0.33          # session 1 lasted 5 s <= 10 s
    assert u1["multi_session_flag"] == 1
    u2 = got[2]
    assert u2["total_sessions"] == 1
    assert u2["exit_sessions"] == 1            # TIMEOUT_EXIT counts as exit
    assert u2["multi_session_flag"] == 0


def test_return_intervals_clamp_and_default(spark):
    s = _sessions(spark, [
        # overlapping sessions: negative interval clamps to 0
        _sess(1, 1, "2024-01-01 10:00:00", "2024-01-01 10:30:00", "COMPLETE"),
        _sess(2, 1, "2024-01-01 10:20:00", "2024-01-01 10:40:00", "EXIT"),
        # 20 min after session 2 ends
        _sess(3, 1, "2024-01-01 11:00:00", "2024-01-01 11:10:00", "EXIT"),
        # single-session user: lone interval greatest(NULL,0)=0
        _sess(4, 2, "2024-01-01 10:00:00", "2024-01-01 10:10:00", "COMPLETE"),
    ])
    got = {r["user_id"]: r["avg_return_interval_s"]
           for r in M.return_intervals(s).collect()}
    # greatest() SKIPS nulls (Spark & DuckDB both), so the first session's
    # NULL lag becomes 0, not NULL: user 1 avg = (0 + 0 + 1200)/3 = 400
    assert got[1] == 400.0
    assert got[2] == 0.0


def test_repeat_events_greatest_clamp(spark):
    ev = spark.createDataFrame([
        (1, _ts("2024-01-01 10:00:00"), 1, "purchase", 10.0, '{"k": 7}'),
        (2, _ts("2024-01-01 11:00:00"), 1, "purchase", 10.0, '{"k": 7}'),
        (3, _ts("2024-01-01 12:00:00"), 1, "purchase", 10.0, '{"k": 8}'),
        (4, _ts("2024-01-01 13:00:00"), 1, "view", 10.0, '{"k": 9}'),
    ], "event_id long, ts timestamp, user_id long, event_type string,"
       " value double, props string")
    out = rows(M.repeat_events(ev), "user_id", "repeat_purchase_cnt")
    # item 7 bought twice -> 1 repeat; item 8 once -> 0; views ignored
    assert out == [(1, 1)]


def test_item_daily_bucket_boundaries(spark):
    mk = [(i, _ts("2024-01-01 10:00:00"), 1, "view", v, '{"k": 1}')
          for i, v in enumerate([0.0, 39.99, 40.0, 80.0, 120.0, 160.0, 500.0])]
    ev = spark.createDataFrame(
        mk, "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string")
    r = M.item_daily(ev).collect()[0]
    # [0,40) x2, [40,80) x1, [80,120) x1, [120,160) x1, [160,inf) closed x2
    assert (r["value_bucket_1"], r["value_bucket_2"], r["value_bucket_3"],
            r["value_bucket_4"], r["value_bucket_5"]) == (2, 1, 1, 1, 2)
    assert r["n_events"] == 7


def test_item_continuation_lexicographic_order(spark):
    # items 2 and 10: lexicographically "10" < "2", so the user's "next"
    # item after 10 is 2 — item 10 is the continued one, item 2 is last.
    # (reference quirk A7: episode_id ordered as STRING)
    ev = spark.createDataFrame([
        (1, _ts("2024-01-01 10:00:00"), 1, "purchase", 60.0, '{"k": 2}'),
        (2, _ts("2024-01-01 11:00:00"), 1, "purchase", 60.0, '{"k": 10}'),
    ], "event_id long, ts timestamp, user_id long, event_type string,"
       " value double, props string")
    got = {r["item_k"]: r for r in M.item_continuation(ev).collect()}
    assert got[10]["continuing_users"] == 1   # "10" -> lead "2" exists
    assert got[2]["continuing_users"] == 0    # "2" is lexicographically last
    assert got[10]["continuation_index"] == 1.0
    assert got[2]["continuation_index"] == 0.0


def test_top_item_tiebreak_smallest_item(spark):
    ev = spark.createDataFrame([
        (1, _ts("2024-01-01 10:00:00"), 1, "view", 50.0, '{"k": 5}'),
        (2, _ts("2024-01-01 11:00:00"), 1, "view", 50.0, '{"k": 3}'),
    ], "event_id long, ts timestamp, user_id long, event_type string,"
       " value double, props string")
    out = rows(M.top_item_per_day(M.item_daily(ev)), "top_item")
    assert out == [(3,)]                      # equal avg -> smaller item wins


def test_binge_ratio_guarded(spark):
    ev = spark.createDataFrame([
        (1, _ts("2024-01-01 10:00:00"), 1, "view", 1.0, '{"k": 1}'),
        (2, _ts("2024-01-01 11:00:00"), 1, "view", 1.0, '{"k": 2}'),
        (3, _ts("2024-01-01 10:00:00"), 2, "view", 1.0, '{"k": 1}'),
    ], "event_id long, ts timestamp, user_id long, event_type string,"
       " value double, props string")
    r = M.binge_ratio(ev).collect()[0]
    assert (r["unique_users"], r["binge_users"]) == (2, 1)
    assert r["binge_ratio"] == 0.5


def _retention_sessions(spark):
    return _sessions(spark, [
        # day 1: users 1,2 ; day 2: users 2,3  (entry type fixed "view")
        _sess(1, 1, "2024-01-01 10:00:00", "2024-01-01 10:10:00", "COMPLETE", D1),
        _sess(2, 2, "2024-01-01 10:00:00", "2024-01-01 10:10:00", "EXIT", D1),
        _sess(3, 2, "2024-01-02 10:00:00", "2024-01-02 10:10:00", "COMPLETE", D2),
        _sess(4, 3, "2024-01-02 10:00:00", "2024-01-02 10:10:00", "EXIT", D2),
    ])


def test_retention_yesterday_anchored(spark):
    out = M.retention_yesterday_anchored(
        _retention_sessions(spark), dim="entry_event_type")
    got = {r["datetime"]: r for r in out.collect()}
    r = got[D2]                               # anchored on day-1 cohort
    assert (r["yesterday_users"], r["retained_users"]) == (2, 1)
    assert r["retention_rate"] == 0.5
    # day-2 cohort also appears (anchored at Jan 3) with 0 retained
    r3 = got[dt.date(2024, 1, 3)]
    assert (r3["yesterday_users"], r3["retained_users"]) == (2, 0)


def test_retention_today_anchored_new_user_split(spark):
    out = M.retention_today_anchored(
        _retention_sessions(spark), dim="entry_event_type")
    got = {r["datetime"]: r for r in out.collect()}
    r = got[D2]                               # anchored on day-2 cohort
    assert (r["today_users"], r["returning_users"], r["new_users"]) == (2, 1, 1)
    assert r["returning_ratio"] == 0.5 and r["new_ratio"] == 0.5
    r1 = got[D1]                              # no yesterday -> all new
    assert (r1["today_users"], r1["returning_users"], r1["new_users"]) == (2, 0, 2)


def test_cohort_vs_global_weighted_reagg(spark):
    s = _sessions(spark, [
        _sess(1, 0, "2024-01-01 10:00:00", "2024-01-01 10:10:00", "COMPLETE"),
        _sess(2, 0, "2024-01-01 11:00:00", "2024-01-01 11:10:00", "EXIT"),
        _sess(3, 1, "2024-01-01 10:00:00", "2024-01-01 10:10:00", "COMPLETE"),
    ])
    out = {r["cohort"]: r for r in M.cohort_vs_global(s).collect()}
    # global completion = 2/3 = 0.67 ; cohort0 = 0.5, cohort1 = 1.0
    assert out[0]["global_completion_rate"] == 0.67
    assert out[0]["completion_gap"] == -0.17
    assert out[1]["completion_index"] == 1.49  # floor(1.0/0.67*100+0.5)/100
    assert out[0]["sessions_per_user"] == 2.0


def test_cardinality_sketch_close_to_exact(spark):
    import __spark_entry__ as entrymod
    out = entrymod.QUERIES["cardinality_sketch"](
        spark, "/root/testdata/sf0.001").collect()
    assert out
    # every group's HLL estimate must land in the 5% band of exact —
    # the same boolean the value oracle pins TRUE
    assert all(r["rel_err_ok"] for r in out)
    assert all(r["exact_users"] > 0 for r in out)


def test_dimension_gap_features_leave_one_out(spark):
    df = spark.createDataFrame([
        (D1, "web", "mobile", 0.2),
        (D1, "web", "pc", 0.6),
        (D1, "ios", "mobile", 0.4),
    ], "datetime date, platform string, device string, completion_rate double")
    out = M.dimension_gap_features(
        df, "datetime", ["platform", "device"], ["completion_rate"])
    got = {(r["platform"], r["device"]): r for r in out.collect()}
    # across platform (partition by device): mobile {0.2,0.4} -> 0.2; pc -> 0
    assert got[("web", "mobile")]["completion_rate_gap_across_platform"] == 0.2
    assert got[("web", "pc")]["completion_rate_gap_across_platform"] == 0.0
    # across device (partition by platform): web {0.2,0.6} -> 0.4
    assert got[("web", "mobile")]["completion_rate_gap_across_device"] == 0.4
    assert got[("ios", "mobile")]["completion_rate_gap_across_device"] == 0.0


def test_quantile_sketch_gate_and_exactness(spark):
    import __spark_entry__ as entrymod

    out = entrymod.queries()["quantile_sketch"](
        spark, "/root/testdata/sf0.001").collect()
    assert out and all(r["rank_err_ok"] for r in out)
    assert all(r["exact_p50_ms"] >= 0 for r in out)


def test_cohort_retention_triangle_semantics(spark):
    import datetime as dt
    ev = spark.createDataFrame(
        [(i, dt.datetime.fromisoformat(ts), u, "view", 1.0, "{}")
         for i, (ts, u) in enumerate([
             ("2024-01-01 10:00:00", 1), ("2024-01-01 11:00:00", 2),
             ("2024-01-02 10:00:00", 1),   # u1 returns day+1
             ("2024-01-02 11:00:00", 3),   # u3 is a day-2 cohort
             ("2024-01-03 10:00:00", 1), ("2024-01-03 11:00:00", 3),
         ])],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string")
    from w_userflow_featurestore_spark.operators.metrics import (
        cohort_retention_triangle,
    )
    got = {(r["cohort_day"], r["day_offset"]):
           (r["n_active"], r["cohort_size"], r["retention_bp"])
           for r in cohort_retention_triangle(ev).collect()}
    assert got[("2024-01-01", 0)] == (2, 2, 10000)   # both cohort users
    assert got[("2024-01-01", 1)] == (1, 2, 5000)    # only u1 back
    assert got[("2024-01-01", 2)] == (1, 2, 5000)
    assert got[("2024-01-02", 0)] == (1, 1, 10000)   # u3's cohort
    assert got[("2024-01-02", 1)] == (1, 1, 10000)
    assert ("2024-01-03", 0) not in got              # no new users day 3
