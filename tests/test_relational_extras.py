"""above_group_avg and frequent_tokens semantics + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from w_userflow_featurestore_spark.operators.relational import (
    above_group_avg)
from w_userflow_featurestore_spark.operators.text import frequent_tokens
from w_userflow_featurestore_spark.plans import assert_plan


def test_above_group_avg_integer_exact_boundary(spark):
    df = spark.createDataFrame(
        [(1, "g1", 10.00), (2, "g1", 20.00), (3, "g1", 22.51),
         (4, "g2", 5.00)],
        "id long, grp string, val double")
    # g1 avg = 17.50 * 1.5 = 26.25 -> nothing kept; g2 single row can
    # never exceed 1.5x its own average
    assert above_group_avg(df, "grp", "val").count() == 0
    df2 = spark.createDataFrame(
        [(1, "g1", 10.00), (2, "g1", 20.00), (3, "g1", 45.01)],
        "id long, grp string, val double")
    # avg = 25.003333 -> 1.5x = 37.505; only 45.01 clears it
    rows = above_group_avg(df2, "grp", "val").collect()
    assert [r.id for r in rows] == [3]
    assert rows[0].group_avg == 25.0


def test_above_group_avg_strict_inequality_at_exact_factor(spark):
    # vals 10, 20, 30: avg 20, 1.5x = 30 -> 30 is NOT above (strict >)
    df = spark.createDataFrame(
        [(1, "g", 10.0), (2, "g", 20.0), (3, "g", 30.0)],
        "id long, grp string, val double")
    assert above_group_avg(df, "grp", "val").count() == 0


def test_frequent_tokens_order_and_ties(spark):
    docs = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a z z")], "doc_id long, text string")
    got = [(r.token, r.n_occurrences)
           for r in frequent_tokens(docs, k=3).collect()]
    # a:3, b:3 tie -> 'a' first; z:2 third
    assert got == [("a", 3), ("b", 3), ("z", 2)]


def test_frequent_tokens_plan_is_takeordered(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    df = frequent_tokens(docs, k=5)
    assert_plan(df, max_shuffles=1, max_sort_merge_joins=0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_above_group_avg_plan_no_per_row_subquery(spark):
    df = spark.createDataFrame([(1, "g", 1.0)],
                               "id long, grp string, val double")
    # one shuffle for the group agg + one to co-partition the join
    assert_plan(above_group_avg(df, "grp", "val"), max_shuffles=3)


def test_vocab_coverage_boundary_and_values(spark):
    from w_userflow_featurestore_spark.operators.text import vocab_coverage
    docs = spark.createDataFrame(
        [(1, "aa aa bb"),          # aa x2, bb x1
         (2, "bb cc cc"),          # cc x2
         (3, "zz")],               # rare token only
        "doc_id long, text string")
    # corpus counts: aa=2, bb=2, cc=2, zz=1 -> top-2 vocab = {aa, bb}
    # (count desc, token asc tie-break)
    got = {r["doc_id"]: (r["n_tokens"], r["n_covered"], r["coverage_bp"])
           for r in vocab_coverage(docs, vocab_k=2).collect()}
    assert got[1] == (3, 3, 10000)
    assert got[2] == (3, 1, 3333)          # floor(1*10000/3)
    assert got[3] == (1, 0, 0)


def test_daily_volume_anomaly_null_baseline_and_flags(spark):
    import datetime as dtm
    from w_userflow_featurestore_spark.operators.temporal import (
        daily_volume_anomaly,
    )
    mk = lambda d, n: [(i, dtm.datetime(2024, 1, d, 10, 0, i), "view")  # noqa: E731
                       for i in range(n)]
    ev = spark.createDataFrame(mk(1, 10) + mk(2, 3) + mk(3, 4),
                               "event_id long, ts timestamp, event_type string")
    got = {str(r["datetime"]): (r["prev_n_events"], r["ratio_bp"],
                                r["is_anomaly"])
           for r in daily_volume_anomaly(ev).collect()}
    assert got["2024-01-01"] == (None, None, None)       # no baseline
    assert got["2024-01-02"] == (10, 3000, 1)            # collapse -> flag
    assert got["2024-01-03"] == (3, 13333, 0)            # within band


def test_winsorize_caps_and_flags(spark):
    from tests.conftest import rows as _rows
    from w_userflow_featurestore_spark.operators.features import (
        winsorize,
    )
    df = spark.createDataFrame(
        [(i, "a", float(i)) for i in range(1, 101)],
        "event_id long, event_type string, value double")
    out = winsorize(df, "value", "event_type", 0.10, 0.90)
    got = {r["event_id"]: (r["value_w"], r["clipped"])
           for r in out.collect()}
    # p10 of 1..100 = 10.9, p90 = 90.1 (linear interpolation)
    assert got[1] == (10.9, 1) and got[100] == (90.1, 1)
    assert got[50] == (50.0, 0)
    assert sum(c for _, c in got.values()) == 20   # 1..10 and 91..100


def test_target_encode_loo_excludes_own_row(spark):
    from w_userflow_featurestore_spark.operators.features import (
        target_encode,
    )
    df = spark.createDataFrame(
        [(1, "x", 10.0), (2, "x", 20.0), (3, "x", 30.0),
         (4, "y", 100.0)],
        "event_id long, event_type string, value double")
    out = {r["event_id"]: r["te_event_type"]
           for r in target_encode(df, "event_type", "value",
                                  smoothing=0).collect()}
    # LOO means for x: row1 -> (20+30)/2, row2 -> (10+30)/2, ...
    assert out[1] == 25.0 and out[2] == 20.0 and out[3] == 15.0
    # singleton category with no smoothing: 0/0 -> NULL, not a crash
    assert out[4] is None
    # with smoothing, the singleton shrinks to the global prior
    sm = {r["event_id"]: r["te_event_type"]
          for r in target_encode(df, "event_type", "value",
                                 smoothing=10).collect()}
    assert sm[4] == 40.0                  # prior = mean(10,20,30,100)
