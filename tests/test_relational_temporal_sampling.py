"""Edge-semantics tests for the relational (rollup/cube/pivot/semi/anti),
temporal (rolling/tumbling/sliding windows), and sampling (hash split)
operators. Oracle parity pins cross-engine values; these pin the
SEMANTICS that parity alone could miss (grouping-id meaning, calendar
gaps, winnowing guarantee, split stability)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tests.conftest import rows
from w_userflow_featurestore_spark.operators import relational as REL
from w_userflow_featurestore_spark.operators import sampling as SMP
from w_userflow_featurestore_spark.operators import temporal as TMP
from w_userflow_featurestore_spark.operators import text as TX


def _events(spark, data):
    return spark.createDataFrame(
        data, "ts timestamp, user_id long, event_type string, value double")


TS = dt.datetime


def test_rollup_levels_and_gid(spark):
    ev = _events(spark, [
        (TS(2024, 1, 1, 10), 1, "click", 1.0),
        (TS(2024, 1, 1, 11), 1, "view", 2.0),
        (TS(2024, 1, 2, 10), 2, "click", 4.0),
    ])
    got = {(r.day, r.dim, r.gid): (r.n_events, r.sum_value)
           for r in REL.rollup_daily(ev).collect()}
    assert got[("2024-01-01", "click", 0)] == (1, 1.0)
    assert got[("2024-01-01", None, 1)] == (2, 3.0)       # per-day subtotal
    assert got[(None, None, 3)] == (3, 7.0)               # grand total
    # rollup must NOT produce the per-dim marginal (gid=2)
    assert not any(gid == 2 for (_, _, gid) in got)


def test_cube_adds_dim_marginal(spark):
    ev = _events(spark, [
        (TS(2024, 1, 1, 10), 1, "click", 1.0),
        (TS(2024, 1, 2, 10), 2, "click", 4.0),
    ])
    got = {(r.day, r.dim, r.gid): r.n_events
           for r in REL.cube_daily(ev).collect()}
    assert got[(None, "click", 2)] == 2                   # the extra set
    assert len(got) == 2 + 2 + 1 + 1                      # leafs+days+dim+grand


def test_pivot_zero_fills_missing_vocab(spark):
    ev = _events(spark, [(TS(2024, 1, 1), 1, "click", 1.0)])
    r = REL.pivot_counts(ev, ["click", "purchase"]).collect()[0]
    assert (r.n_click, r.n_purchase, r.n_total) == (1, 0, 1)


def test_pivot_total_counts_out_of_vocab_and_null_rows(spark):
    # n_total is the TRUE row count: an out-of-vocabulary type and a
    # NULL type are invisible in the per-value columns yet still count
    ev = _events(spark, [(TS(2024, 1, 1), 1, "click", 1.0),
                         (TS(2024, 1, 1, 1), 1, "scroll", 1.0),
                         (TS(2024, 1, 1, 2), 1, None, 1.0)])
    r = REL.pivot_counts(ev, ["click", "purchase"]).collect()[0]
    assert (r.n_click, r.n_purchase, r.n_total) == (1, 0, 3)


def test_semi_anti_partition_probe(spark):
    probe = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    ledger = spark.createDataFrame([(2,), (2,), (9,)], "fk long")
    semi = rows(REL.semi_join_keys(probe, ledger, "k", "fk"), "k")
    anti = rows(REL.anti_join_keys(probe, ledger, "k", "fk"), "k")
    assert semi == [(2,)]                 # no duplication on multi-match
    assert anti == [(1,), (3,)]           # complement within probe


def test_dataset_split_stable_and_shuffle_free(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = SMP.dataset_split(df).select("doc_id", "split")
    b = SMP.dataset_split(df.repartition(7)).select("doc_id", "split")
    assert a.exceptAll(b).count() == 0    # partitioning-independent
    frac = {r.split: r.n for r in
            a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(frac["train"] / 2000 - 0.8) < 0.05
    assert abs(frac["val"] / 2000 - 0.1) < 0.03
    # pure projection: no Exchange in the plan
    assert "Exchange" not in SMP.dataset_split(df)._jdf \
        .queryExecution().executedPlan().toString()


def test_rolling_window_respects_calendar_gaps(spark):
    ev = _events(spark, [
        (TS(2024, 1, 1), 1, "click", 10.0),
        (TS(2024, 1, 3), 1, "click", 5.0),
        (TS(2024, 2, 20), 1, "click", 2.0),   # > 7 days later: fresh window
    ])
    got = {r.day: (r.n_events_7d, r.sum_value_7d, r.active_days_7d)
           for r in TMP.rolling_daily_features(ev).collect()}
    assert got["2024-01-03"] == (2, 15.0, 2)
    assert got["2024-02-20"] == (1, 2.0, 1)   # no smear across the gap


def test_sliding_windows_cover_each_event_twice(spark):
    ev = _events(spark, [(TS(2024, 1, 1, 0, m), 1, "click", 1.0)
                         for m in (0, 13, 29, 30, 59)])
    out = TMP.sliding_window_counts(ev)
    assert out.agg(F.sum("n_events")).first()[0] == 2 * 5
    # 1h window sliding 30min: starts are 30-min aligned
    assert all(r.window_start_ms % 1_800_000 == 0 for r in out.collect())


def test_winnowing_shared_substring_shares_fingerprint(spark):
    common = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [(1, "AAA " + common + " BBB"), (2, "xyz " + common + " qrs"),
         (3, "completely unrelated content with nothing in common here")],
        "doc_id long, text string")
    fp = TX.winnow_fingerprints(docs)
    a = {r.fingerprint for r in fp.where("doc_id = 1").collect()}
    b = {r.fingerprint for r in fp.where("doc_id = 2").collect()}
    c = {r.fingerprint for r in fp.where("doc_id = 3").collect()}
    assert a & b                          # guaranteed: match >= k+w-1 chars
    assert not (a & c) and not (b & c)


def test_session_window_exact_gap_merges(spark):
    ev = _events(spark, [
        (TS(2024, 1, 1, 0, 0), 1, "click", 1.0),
        (TS(2024, 1, 1, 0, 30), 1, "click", 1.0),        # exactly gap: MERGES
        (TS(2024, 1, 1, 1, 0, 1), 1, "click", 1.0),      # gap + 1s: NEW
    ])
    out = TMP.session_window_rollup(ev).collect()
    assert sorted(r.n_events for r in out) == [1, 2]
    two = next(r for r in out if r.n_events == 2)
    # end = last event + gap
    assert two.session_end_ms - two.session_start_ms == (30 + 30) * 60 * 1000


def test_setops_distinct_semantics(spark):
    import __spark_entry__ as entry
    e = spark.createDataFrame(
        [(1, "purchase"), (1, "purchase"), (1, "click"),
         (2, "signup"), (2, "click"), (2, "error"),
         (3, "purchase")],                      # no click -> excluded
        "user_id long, event_type string")

    def users(t):
        return e.where(F.col("event_type") == t).select("user_id")

    got = (users("purchase").union(users("signup"))
           .intersect(users("click")).subtract(users("error")))
    assert rows(got) == [(1,)]                  # distinct, 2 dropped by error


def test_winnowing_short_doc_single_fingerprint(spark):
    docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    assert TX.winnow_fingerprints(docs).count() == 1


def test_time_decay_halves_per_day(spark):
    import datetime as dt

    from w_userflow_featurestore_spark.operators.temporal import (
        time_decay_features)
    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 3, 12), 1, "view", 8.00, "{}"),
         (2, dt.datetime(2024, 1, 2, 9), 1, "view", 8.00, "{}"),
         (3, dt.datetime(2024, 1, 1, 23), 1, "view", 8.00, "{}"),
         (4, dt.datetime(2024, 1, 3, 1), 2, "view", 1.27, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string")
    got = {r.user_id: r for r in time_decay_features(ev).collect()}
    # ref = 2024-01-03: ages 0,1,2 days -> 800 + 400 + 200 cents
    assert got[1].decayed_value_c == 1400 and got[1].n_events == 3
    assert got[2].decayed_value_c == 127      # age 0, exact cents


def test_cap_group_rows_bounds_and_determinism(spark):
    from w_userflow_featurestore_spark.operators.sampling import (
        cap_group_rows)
    ev = spark.createDataFrame(
        [(i, 1 if i < 20 else 2, "view") for i in range(23)],
        "event_id long, user_id long, event_type string")
    got = cap_group_rows(ev, ["user_id"], n=5, id_col="event_id")
    per_user = {r.user_id: 0 for r in got.collect()}
    for r in got.collect():
        per_user[r.user_id] = per_user.get(r.user_id, 0) + 1
    assert per_user[1] == 5          # hot user capped
    assert per_user[2] == 3          # small group untouched
    # deterministic: identical survivor set on rerun
    a = sorted(r.event_id for r in got.collect())
    b = sorted(r.event_id
               for r in cap_group_rows(ev, ["user_id"], n=5,
                                       id_col="event_id").collect())
    assert a == b


def test_churn_labels_forward_window_and_gaps(spark):
    import datetime as dt

    from w_userflow_featurestore_spark.operators.temporal import (
        churn_labels)
    mk = lambda eid, day, uid: (eid, dt.datetime(2024, 1, day, 10), uid,  # noqa: E731
                                "view", 1.0, "{}")
    ev = spark.createDataFrame(
        # user 1: days 1, 5, 20 -> day1 rescued by day5 (gap 4 <= 7),
        # day5 churned (next is 15 days later), day20 churned (stream end)
        [mk(1, 1, 1), mk(2, 5, 1), mk(3, 20, 1),
         # user 2: days 1, 9 -> gap 8 > 7: day1 churned
         mk(4, 1, 2), mk(5, 9, 2)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string")
    got = {(r.user_id, int(r.activity_date[-2:])): r.churned
           for r in churn_labels(ev).collect()}
    assert got[(1, 1)] == 0 and got[(1, 5)] == 1 and got[(1, 20)] == 1
    assert got[(2, 1)] == 1 and got[(2, 9)] == 1
