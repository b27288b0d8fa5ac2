"""Salted two-phase aggregation: result-identical to a plain groupBy,
skew-uniform by construction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows
from w_userflow_featurestore_spark.operators.skew import salted_agg


def _skewed(spark):
    # one hot key (user 1: 900 rows) + a cold tail
    data = [(i, 1 if i < 900 else i % 10 + 2, float(i % 7)) for i in range(1000)]
    return spark.createDataFrame(data, "event_id long, user_id long, value double")


def test_salted_agg_equals_plain_groupby(spark):
    df = _skewed(spark)
    salted = salted_agg(df, ["user_id"], {
        "n": ("event_id", "count"),
        "total": ("value", "sum"),
        "lo": ("value", "min"),
        "hi": ("value", "max"),
        "mean": ("value", "avg"),
    }, buckets=8)
    plain = df.groupBy("user_id").agg(
        F.count("event_id").alias("n"), F.sum("value").alias("total"),
        F.min("value").alias("lo"), F.max("value").alias("hi"),
        F.avg("value").alias("mean"))
    cols = ["user_id", "n", "total", "lo", "hi", "mean"]
    assert rows(salted, *cols) == rows(plain, *cols)


def test_salted_agg_rejects_non_algebraic(spark):
    with pytest.raises(ValueError, match="algebraic"):
        salted_agg(_skewed(spark), ["user_id"],
                   {"d": ("value", "count_distinct")})


def test_salted_join_equals_plain_join(spark):
    from w_userflow_featurestore_spark.operators.skew import salted_join
    big = spark.createDataFrame(
        [(i, i % 3) for i in range(300)], "row_id long, k long")
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "k long, tag string")
    got = salted_join(big, small, ["k"], buckets=4)
    assert got.count() == 300
    plain = big.join(small, "k")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, plain.collect()))


def test_salted_join_left_preserves_unmatched(spark):
    from w_userflow_featurestore_spark.operators.skew import salted_join
    big = spark.createDataFrame([(1, 10), (2, 99)], "row_id long, k long")
    small = spark.createDataFrame([(10, "hit")], "k long, tag string")
    rows = {r.row_id: r.tag
            for r in salted_join(big, small, ["k"], buckets=4,
                                 how="left").collect()}
    assert rows == {1: "hit", 2: None}
