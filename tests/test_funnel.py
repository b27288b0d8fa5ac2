"""Funnel semantics: strict sequencing, ties, day reset, plan shape."""

from __future__ import annotations

import datetime as dt

import pytest

from w_userflow_featurestore_spark.operators.funnel import (
    funnel_daily, funnel_progress)
from tests.conftest import rows
from w_userflow_featurestore_spark.plans import assert_plan, shuffle_count


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp")


def _prog(spark, rows, steps=("view", "click", "purchase")):
    df = funnel_progress(_events(spark, rows), list(steps))
    return {r.user_id: tuple(r[f"{s}_ts"] for s in steps)
            for r in df.collect()}


def test_strict_sequence_ignores_out_of_order_steps(spark):
    got = _prog(spark, [
        # user 1: click BEFORE any view -> click step unreached
        (1, 1, "click", _ts("2024-01-01 09:00:00")),
        (2, 1, "view", _ts("2024-01-01 10:00:00")),
        # user 2: full ordered funnel
        (3, 2, "view", _ts("2024-01-01 09:00:00")),
        (4, 2, "click", _ts("2024-01-01 09:30:00")),
        (5, 2, "purchase", _ts("2024-01-01 10:00:00")),
    ])
    assert got[1] == (_ts("2024-01-01 10:00:00"), None, None)
    assert got[2] == (_ts("2024-01-01 09:00:00"),
                      _ts("2024-01-01 09:30:00"),
                      _ts("2024-01-01 10:00:00"))


def test_later_qualifying_step_still_counts(spark):
    # early click ignored, but a SECOND click after the view qualifies
    got = _prog(spark, [
        (1, 1, "click", _ts("2024-01-01 09:00:00")),
        (2, 1, "view", _ts("2024-01-01 10:00:00")),
        (3, 1, "click", _ts("2024-01-01 11:00:00")),
    ])
    assert got[1] == (_ts("2024-01-01 10:00:00"),
                      _ts("2024-01-01 11:00:00"), None)


def test_equal_timestamps_progress_by_event_id(spark):
    t = _ts("2024-01-01 09:00:00")
    # same instant: view (id 1) then click (id 2) -> progression counts
    assert _prog(spark, [(1, 1, "view", t), (2, 1, "click", t)])[1] == \
        (t, t, None)
    # reversed ids: click sorts before the view -> no progression
    assert _prog(spark, [(2, 1, "view", t), (1, 1, "click", t)])[1] == \
        (t, None, None)


def test_earliest_completion_is_kept(spark):
    got = _prog(spark, [
        (1, 1, "view", _ts("2024-01-01 09:00:00")),
        (2, 1, "view", _ts("2024-01-01 09:30:00")),
        (3, 1, "click", _ts("2024-01-01 10:00:00")),
    ])
    assert got[1] == (_ts("2024-01-01 09:00:00"),
                      _ts("2024-01-01 10:00:00"), None)


def test_duplicate_steps_rejected(spark):
    with pytest.raises(ValueError):
        funnel_progress(_events(spark, []), ["view", "view"])


def test_daily_funnel_resets_at_midnight(spark):
    rows = [
        # day 1: view only; day 2: click only -> neither day converts
        (1, 1, "view", _ts("2024-01-01 23:00:00")),
        (2, 1, "click", _ts("2024-01-02 01:00:00")),
        # user 2 full funnel inside day 1
        (3, 2, "view", _ts("2024-01-01 09:00:00")),
        (4, 2, "click", _ts("2024-01-01 09:10:00")),
        (5, 2, "purchase", _ts("2024-01-01 09:20:00")),
    ]
    out = {str(r.datetime): r for r in
           funnel_daily(_events(spark, rows),
                        ["view", "click", "purchase"]).collect()}
    d1, d2 = out["2024-01-01"], out["2024-01-02"]
    assert (d1.reached_view, d1.reached_click, d1.reached_purchase) == (2, 1, 1)
    assert d1.conv_view_to_click == 0.5 and d1.conv_overall == 0.5
    assert (d2.reached_view, d2.reached_click) == (0, 0)
    assert d2.conv_view_to_click is None  # zero-guarded, not a crash


def test_funnel_plan_single_window_sort(spark):
    rows = [(1, 1, "view", _ts("2024-01-01 09:00:00"))]
    df = funnel_daily(_events(spark, rows), ["view", "click", "purchase"])
    # one exchange for the (day, user) windows+rollup, one for the day
    # agg — step count must NOT add shuffles or sorts
    assert_plan(df, max_shuffles=2)
    assert shuffle_count(
        funnel_daily(_events(spark, rows), ["view", "click"])) == 2


def test_funnel_salted_identical_to_unsalted_fixture(spark):
    """Skew option: time-block decomposition must be output-IDENTICAL
    on real fixture events, for an aligned span (1 h), a span that
    divides nothing cleanly (7 min 1 s), and a degenerate tiny span
    (every event its own block — all progression crosses boundaries)."""
    from w_userflow_featurestore_spark.sources import read_table
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    steps = ["view", "click", "purchase"]
    want = rows(funnel_daily(ev, steps))
    for span in (3_600_000, 421_000, 1_000):
        got = rows(funnel_daily(ev, steps, salt_span_ms=span))
        assert got == want, f"span={span}"


def test_funnel_salted_bounds_window_partition(spark):
    # the salted window partitions by (..., _blk): a hot entity's rows
    # split across blocks instead of one task
    from w_userflow_featurestore_spark.operators.funnel import (
        funnel_progress,
    )
    from w_userflow_featurestore_spark.plans import physical_plan
    from w_userflow_featurestore_spark.sources import read_table
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    plan = physical_plan(funnel_progress(ev, ["view", "purchase"],
                                         salt_span_ms=3_600_000))
    assert "_blk" in plan.split("Window")[1][:400]


def test_funnel_and_transitions_salted_equivalence_randomized(spark):
    """Randomized streams (seeded): bursty timestamps WITH exact ties,
    multiple users/days, compared salted-vs-unsalted across spans that
    land ties on block boundaries. Complements the fixture test with
    adversarial shapes the generator never emits."""
    import random

    from w_userflow_featurestore_spark.operators.paths import (
        transition_matrix,
    )

    rng = random.Random(7)
    types = ["view", "click", "purchase", "error"]
    rows_in = []
    eid = 0
    for user in range(1, 6):
        t = dt.datetime(2024, 1, 1, 0, 0, 0)
        for _ in range(rng.randint(40, 80)):
            # bursts: 30% chance the NEXT event shares this timestamp
            if not (rng.random() < 0.3):
                t += dt.timedelta(seconds=rng.randint(1, 9000))
            eid += 1
            rows_in.append((eid, t, user, rng.choice(types), 1.0, "{}"))
    ev = spark.createDataFrame(
        rows_in, "event_id long, ts timestamp, user_id long,"
                 " event_type string, value double, props string")

    steps = ["view", "click", "purchase"]
    want_f = rows(funnel_daily(ev, steps))
    want_t = rows(transition_matrix(ev))
    for span in (9_000_000, 3_600_000, 1_000):
        assert rows(funnel_daily(ev, steps, salt_span_ms=span)) == want_f, \
            f"funnel span={span}"
        assert rows(transition_matrix(ev, salt_span_ms=span)) == want_t, \
            f"transitions span={span}"
