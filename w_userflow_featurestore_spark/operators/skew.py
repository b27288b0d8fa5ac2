"""Skew-resistant aggregation: salted two-phase groupBy.

At 100 TB a handful of hot keys (one bot user, one viral item) can pin a
single reducer for hours. AQE's skew-join splitting covers joins; for
AGGREGATIONS the standard fix is salting: split each key's rows across
``buckets`` synthetic sub-keys, partially aggregate on (key, salt) —
so the hot key's work spreads over ``buckets`` reducers — then combine
partials on the key alone. Algebraic aggregates (sum/count/min/max, and
avg as sum+count) combine losslessly, so the result is IDENTICAL to the
plain groupBy: the driver query for this operator uses a plain GROUP BY
as its oracle, making the equivalence part of the correctness gate.

Spark's hash partial aggregation already does map-side combining, which
handles most skew; explicit salting matters when the per-key state is
too big for a map-side combine (huge distinct sets) or when AQE is
unavailable. The operator exists so pipelines can opt in per-hot-table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# (partial aggregate, final combiner) per supported algebraic aggregate
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(df: DataFrame, keys: list[str],
               aggs: dict[str, tuple[Column | str, str]],
               buckets: int = 16) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output alias -> (column, fn) with fn in
    sum|count|min|max|avg. Salt = row id mod buckets (uniform by
    construction, no dependence on data distribution). Two shuffles, but
    the first is uniform even when the key distribution is not.
    """
    partials, finals = [], []
    for alias, (col, fn) in aggs.items():
        col = F.col(col) if isinstance(col, str) else col
        if fn == "avg":
            partials += [F.sum(col).alias(f"__s_{alias}"),
                         F.count(col).alias(f"__c_{alias}")]
            finals.append((F.sum(f"__s_{alias}")
                           / F.sum(f"__c_{alias}")).alias(alias))
        elif fn in _ALGEBRAIC:
            part, comb = _ALGEBRAIC[fn]
            partials.append(part(col).alias(f"__p_{alias}"))
            finals.append(comb(f"__p_{alias}").alias(alias))
        else:
            raise ValueError(f"not an algebraic aggregate: {fn!r} "
                             f"(distinct-style aggs need expand, not salt)")
    salted = df.withColumn(
        "__salt", (F.monotonically_increasing_id() % buckets).cast("int"))
    phase1 = salted.groupBy(*keys, "__salt").agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)


def salted_join(big: DataFrame, small: DataFrame, on: list[str],
                buckets: int = 16, how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join: salt the big side uniformly, REPLICATE
    the small side across all ``buckets`` salt values, join on
    (keys + salt). A hot join key's rows spread over ``buckets``
    reducers instead of pinning one; the price is a ``buckets``-x blowup
    of the small side, which is why the pattern only applies when the
    small side is modest but past the broadcast threshold (below it,
    broadcast wins; above it on BOTH sides, AQE skew-split is the tool).
    Result is row-identical to the plain join — the driver query's
    oracle is the unsalted JOIN, so equivalence sits in the correctness
    gate just like salted_agg's.
    """
    salted = big.withColumn(
        "__salt", (F.monotonically_increasing_id() % buckets).cast("int"))
    rep = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(buckets)])))
    return salted.join(rep, on + ["__salt"], how).drop("__salt")


def key_skew_profile(df: DataFrame, key_col: str,
                     top_k: int = 20) -> DataFrame:
    """Key-distribution skew profiler: the diagnostic you run BEFORE
    choosing a salting/broadcast strategy for a join or agg on
    ``key_col``. Emits the top-k hottest keys with exact counts, their
    share of all rows in basis points, and rank — the artifact that
    tells you whether AQE's skew split will fire and how many salt
    buckets a hot key needs.

    Scale shape: one hash aggregate (map-side partial combine absorbs
    the hot key's rows per task), a broadcast 1-row total, and a
    TakeOrdered top-k — no global sort, no collect. NULL keys count as
    a key (a null-heavy join column is the classic skew culprit).
    """
    counts = (df.groupBy(F.col(key_col).cast("string").alias("key"))
                .agg(F.count(F.lit(1)).alias("n_rows")))
    total = counts.groupBy().agg(F.sum("n_rows").alias("_total"))
    # orderBy+limit = TakeOrderedAndProject (distributed per-partition
    # top-k + driver merge of k*partitions rows) — NOT a global sort;
    # the rank window then runs on <= top_k rows, never the key universe
    top = (counts.orderBy(F.desc("n_rows"), F.asc_nulls_first("key"))
                 .limit(top_k))
    w = Window.orderBy(F.desc("n_rows"), F.asc_nulls_first("key"))
    return (top.crossJoin(F.broadcast(total))
               .select("key", "n_rows",
                       F.floor(F.col("n_rows") * 10000 / F.col("_total"))
                        .cast("long").alias("share_bp"),
                       F.row_number().over(w).cast("long").alias("rank")))
