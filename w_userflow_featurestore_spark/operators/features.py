"""Model-feature transforms: outlier winsorization and leakage-safe
target encoding.

The gold metrics aggregate per entity; the step between a feature
table and a trainable matrix usually needs two more transforms that
are easy to get subtly wrong at scale:

- winsorize: cap a numeric column at per-group percentile bounds.
  Exact percentiles come from ONE aggregate over the (tiny) group
  grain, broadcast back onto the scan — never a global sort of the
  fact table.
- target_encode: replace a category with the target mean of the OTHER
  rows in its category (leave-one-out) plus prior smoothing — the
  standard high-cardinality encoding, with the leakage protection
  (excluding the row's own target) built into the algebra:
  loo = (sum(category) - own) / (n(category) - 1). Sums are exact
  integer cents, the final division is one IEEE-exact op mirrored in
  the oracle, and singleton categories fall back to the global prior
  rather than dividing by zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from w_userflow_featurestore_spark.functions import fround, scaled_long


def winsorize(df: DataFrame, value_col: str, group_col: str,
              lo_pct: float = 0.01, hi_pct: float = 0.99) -> DataFrame:
    """Cap ``value_col`` to its per-``group_col`` [lo_pct, hi_pct]
    exact percentile band. One hash aggregate computes both bounds per
    group (percentile state scales with group rows, computed once, not
    per-row), the bounds broadcast-join back, and the clamp is a
    row-local projection. Adds ``<value_col>_w`` plus a clipped flag.
    """
    bounds = (df.groupBy(group_col)
                .agg(F.expr(f"percentile({value_col}, {lo_pct})")
                      .alias("_lo"),
                     F.expr(f"percentile({value_col}, {hi_pct})")
                      .alias("_hi")))
    c = F.col(value_col)
    capped = F.least(F.greatest(c, F.col("_lo")), F.col("_hi"))
    return (df.join(F.broadcast(bounds), group_col)
              .withColumn(f"{value_col}_w", fround(capped, 2))
              .withColumn("clipped",
                          ((c < F.col("_lo")) | (c > F.col("_hi")))
                          .cast("int"))
              .drop("_lo", "_hi"))


def target_encode(df: DataFrame, cat_col: str, target_col: str,
                  smoothing: int = 20) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing:

        loo_mean = (cat_sum - own) / (cat_n - 1)          [exact cents]
        encoded  = (loo_mean * (cat_n-1) + prior * s) / (cat_n-1 + s)
                 = (cat_sum - own + prior_cents * s) / (cat_n - 1 + s)

    computed entirely from exact integer cent sums with ONE double
    division at the end (engine-exact, oracle-mirrored). Excluding the
    row's own target is the leakage guard that separates this from a
    plain group mean; smoothing shrinks rare categories toward the
    global prior, and singletons (cat_n == 1) get pure prior. Adds
    ``te_<cat_col>`` (2-decimal) to each row.

    Scale shape: one hash aggregate at the category grain (tiny),
    a broadcast join back, a 1-row global prior — the fact table is
    scanned once and never shuffled.
    """
    cents = scaled_long(F.col(target_col))
    stats = (df.groupBy(cat_col)
               .agg(F.sum(cents).alias("_csum"),
                    F.count(F.lit(1)).alias("_cn")))
    prior = df.agg(F.sum(cents).alias("_gsum"),
                   F.count(F.lit(1)).alias("_gn"))
    enc = (F.col("_csum") - cents
           + F.floor(F.col("_gsum") / F.col("_gn")) * smoothing) \
        / (F.col("_cn") - 1 + smoothing) / 100.0
    return (df.join(F.broadcast(stats), cat_col)
              .crossJoin(F.broadcast(prior))
              .withColumn(f"te_{cat_col}", fround(enc, 2))
              .drop("_csum", "_cn", "_gsum", "_gn"))
