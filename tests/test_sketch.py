"""Count-min sketch: mergeability, the one-sided error guarantee, and
empty-cell probes — the properties the sf-scale oracle can't isolate."""

from __future__ import annotations

from tests.conftest import rows
from w_userflow_featurestore_spark.operators.sketch import (
    cms_build, cms_lookup, cms_merge,
)


def _stream(spark, items):
    return spark.createDataFrame([(i,) for i in items], "item string")


def test_cms_never_underestimates_and_is_exact_when_sparse(spark):
    items = ["a"] * 50 + ["b"] * 30 + ["c"] * 7 + ["d"]
    sk = cms_build(_stream(spark, items), "item", depth=4, width=256)
    probes = _stream(spark, ["a", "b", "c", "d"])
    got = dict(rows(cms_lookup(sk, probes, "item", depth=4, width=256),
                    "item", "cms_n"))
    true = {"a": 50, "b": 30, "c": 7, "d": 1}
    assert all(got[k] >= v for k, v in true.items())   # one-sided
    # 4 items in 4x256 cells: collisions vanishingly unlikely -> exact
    assert got == true


def test_cms_merge_equals_sketch_of_concatenation(spark):
    a = ["x"] * 10 + ["y"] * 5
    b = ["y"] * 5 + ["z"] * 3
    merged = cms_merge(
        cms_build(_stream(spark, a), "item", depth=3, width=64),
        cms_build(_stream(spark, b), "item", depth=3, width=64))
    whole = cms_build(_stream(spark, a + b), "item", depth=3, width=64)
    assert rows(merged, "d", "cell", "n") == rows(whole, "d", "cell", "n")


def test_cms_unseen_probe_estimates_zero_on_empty_cells(spark):
    sk = cms_build(_stream(spark, ["only"]), "item", depth=4, width=4096)
    got = rows(cms_lookup(sk, _stream(spark, ["absent"]), "item",
                          depth=4, width=4096), "item", "cms_n")
    # 4 independent 1/4096 collision chances: all-empty is the
    # overwhelmingly likely deterministic outcome for this fixed salt
    assert got == [("absent", 0)]


def test_hll_union_of_slices_matches_whole(spark):
    """Datasketches HLL: union of per-slice sketches must estimate the
    SAME value as one sketch over the whole set (union is lossless for
    HLL state) — the property hll_union_rollup's 5% gate rides on."""
    from pyspark.sql import functions as F
    df = spark.range(0, 20000).select(
        (F.col("id") % 4).alias("slice"), (F.col("id") % 5000).alias("v"))
    sliced = (df.groupBy("slice").agg(F.hll_sketch_agg("v").alias("sk"))
                .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                      .alias("est")).collect()[0]["est"])
    whole = df.agg(F.hll_sketch_estimate(F.hll_sketch_agg("v"))
                    .alias("est")).collect()[0]["est"]
    assert sliced == whole                       # identical merged state
    assert abs(sliced - 5000) <= 0.05 * 5000     # and actually accurate


def test_quantile_rank_gate_well_defined_for_tiny_groups(spark):
    """Round-7 randomized-parity find: the old gate compared the sketch
    median (always an ACTUAL data value) against the INTERPOLATED exact
    [p40, p60] value band — for a 2-element group {a, b} that band is
    (a, b) exclusive of both endpoints, so a perfectly healthy sketch
    failed. The tie-aware rank-interval criterion must accept the
    sketch median for every group size >= 1."""
    import pyspark.sql.functions as F

    # replicate the gate arithmetic on a 2-value group directly
    df = spark.createDataFrame([(1, 10.0), (1, 99.0)], "g int, v double")
    agg = (df.groupBy("g")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.expr("approx_percentile(v, 0.5, 1000)").alias("a50")))
    checked = (df.join(F.broadcast(agg), "g")
                 .groupBy("g", "n")
                 .agg(F.sum((F.col("v") <= F.col("a50")).cast("long"))
                       .alias("n_le"),
                      F.sum((F.col("v") < F.col("a50")).cast("long"))
                       .alias("n_lt"))
                 .select(((F.col("n_le") * 10 >= F.col("n") * 4)
                          & (F.col("n_lt") * 10 <= F.col("n") * 6))
                         .alias("ok")))
    assert checked.collect()[0]["ok"] is True
    # and the full query emits rank_err_ok TRUE on every fixture group
    import __spark_entry__ as entrymod
    out = entrymod.queries()["quantile_sketch"](
        spark, "/root/testdata/sf0.001")
    assert out.where(~F.col("rank_err_ok")).count() == 0
    assert out.count() > 0
