"""Round-4 feature ops: SCD Type-2 history, gap-fill/LOCF backfill,
deterministic negative sampling, key-skew profiling — direct
small-frame semantics the sf-scale oracle can't isolate (tie-breaks,
gap edges, draw determinism)."""

from __future__ import annotations

from tests.conftest import rows
from w_userflow_featurestore_spark.operators.sampling import (
    negative_samples,
)
from w_userflow_featurestore_spark.operators.scd import scd2_history
from w_userflow_featurestore_spark.operators.skew import key_skew_profile
from w_userflow_featurestore_spark.operators.temporal import (
    feature_backfill,
)

_EV = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _ev(spark, data):
    from datetime import datetime
    data = [(e, datetime.fromisoformat(ts), u, t, v)
            for e, ts, u, t, v in data]
    return spark.createDataFrame(data, _EV)


def test_scd2_runs_versions_and_current_flag(spark):
    df = _ev(spark, [
        # user 1: view -> view (collapsed) -> click -> view
        (1, "2024-01-01 00:00:00", 1, "view", 0.0),
        (2, "2024-01-01 00:10:00", 1, "view", 0.0),
        (3, "2024-01-01 00:20:00", 1, "click", 0.0),
        (4, "2024-01-01 00:30:00", 1, "view", 0.0),
        # user 2: single state, stays current
        (5, "2024-01-01 01:00:00", 2, "purchase", 0.0),
    ])
    got = rows(scd2_history(df), "user_id", "event_type", "version",
               "is_current")
    assert got == sorted([(1, "view", 1, 0), (1, "click", 2, 0),
                          (1, "view", 3, 1), (2, "purchase", 1, 1)],
                         key=lambda t: tuple((v is None, str(v)) for v in t))
    # intervals are half-open and chained: valid_to of run k ==
    # valid_from of run k+1
    iv = {r["version"]: r for r in
          scd2_history(df).where("user_id = 1").collect()}
    assert iv[1]["valid_to_ms"] == iv[2]["valid_from_ms"]
    assert iv[2]["valid_to_ms"] == iv[3]["valid_from_ms"]
    assert iv[3]["valid_to_ms"] is None


def test_scd2_same_ts_ties_break_by_event_id(spark):
    df = _ev(spark, [
        (10, "2024-01-01 00:00:00", 1, "b", 0.0),
        (2, "2024-01-01 00:00:00", 1, "a", 0.0),   # same ts, lower id
    ])
    got = rows(scd2_history(df), "event_type", "version")
    assert got == [("a", 1), ("b", 2)]


def test_backfill_fills_gaps_locf_and_staleness(spark):
    df = _ev(spark, [
        (1, "2024-01-01 12:00:00", 1, "view", 1.50),
        (2, "2024-01-03 12:00:00", 1, "view", 2.25),
        (3, "2024-01-04 12:00:00", 2, "view", 9.00),  # sets global end
    ])
    out = {(r["user_id"], r["day"]): r
           for r in feature_backfill(df).collect()}
    # user 1 gets a dense 01-01..01-04 grid (global end day)
    assert sorted(d for (u, d) in out if u == 1) == [
        "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    gap = out[(1, "2024-01-02")]
    assert (gap["n_events"], gap["sum_value_cents"]) == (0, 0)
    assert gap["locf_value_cents"] == 150          # carried from 01-01
    assert gap["days_since_activity"] == 1
    tail = out[(1, "2024-01-04")]
    assert tail["locf_value_cents"] == 225
    assert tail["days_since_activity"] == 1
    active = out[(1, "2024-01-03")]
    assert (active["n_events"], active["days_since_activity"]) == (1, 0)
    # user 2's grid starts at ITS first day, not the corpus min
    assert sorted(d for (u, d) in out if u == 2) == ["2024-01-04"]


def test_negative_samples_deterministic_and_disjoint(spark):
    pos = spark.createDataFrame(
        [(u, i) for u in range(5) for i in range(u + 1)],
        "user_id long, item_k int")
    a = rows(negative_samples(pos, k=4))
    b = rows(negative_samples(pos, k=4))
    assert a == b and len(a) > 0              # rerun-stable
    # no sampled negative is a true positive; at most k per pair
    positives = {(u, i) for u, i in pos.collect()}
    per_pair: dict[tuple, int] = {}
    for u, i, draw, neg in a:
        assert (u, neg) not in positives
        per_pair[(u, i)] = per_pair.get((u, i), 0) + 1
    assert all(n <= 4 for n in per_pair.values())
    # a different salt yields a different (still valid) draw set
    assert rows(negative_samples(pos, k=4, salt="neg2")) != a


def test_key_skew_profile_ranks_and_shares(spark):
    df = _ev(spark, [(i, "2024-01-01 00:00:00", 1 if i < 6 else i, "v", 0.0)
                     for i in range(10)])
    got = key_skew_profile(df, "user_id", top_k=3).collect()
    assert [r["rank"] for r in got] == [1, 2, 3]
    top = got[0]
    assert (top["key"], top["n_rows"], top["share_bp"]) == ("1", 6, 6000)
    # deterministic tie-break among the 1-row keys: lexicographic key
    assert [r["key"] for r in got[1:]] == sorted(r["key"] for r in got[1:])


def test_backfill_explicit_end_day_excludes_later_cohorts(spark):
    """end_day earlier than a key's first activity must yield NO rows
    for that key — sequence(start, stop) REVERSES when start > stop,
    so without the guard the key would get a descending phantom grid."""
    df = _ev(spark, [
        (1, "2024-01-01 12:00:00", 1, "view", 1.0),
        (2, "2024-01-05 12:00:00", 2, "view", 2.0),   # after end_day
    ])
    out = feature_backfill(df, end_day="2024-01-03").collect()
    assert sorted((r["user_id"], r["day"]) for r in out) == [
        (1, "2024-01-01"), (1, "2024-01-02"), (1, "2024-01-03")]
