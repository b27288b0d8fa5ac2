"""Point-in-time-correct AS-OF join — the feature-store serving primitive.

The reference serves daily-grain features, so its joins are all equi
(SURVEY.md §2.5: no range/as-of joins anywhere). But the defining
operation of a feature STORE is the point-in-time lookup: for every
observation (event, label, training example) at time t, attach the
latest feature value with feature_ts <= t — never a later one, or the
training set leaks the future. Spark has no ASOF JOIN; this implements
it as a composition of built-in operators.

Scale design — union + keyed window, NOT a range join:
the naive formulation (join on key AND l.ts >= r.ts, then max-by) builds
|left| x |right-per-key| intermediate pairs — quadratic per key, fatal
when a hot key has millions of feature updates. Instead both sides are
unioned and sorted once per key: right rows carry their payload, left
rows carry null, and ``last(payload, ignorenulls=True)`` over
(key ORDER BY ts, right-first) rows-between(unboundedPreceding,
currentRow) gives every left row the most recent right payload in ONE
shuffle + one sort — the same work as a sort-merge join of the two
inputs, independent of temporal fan-in. At 100 TB both sides shuffle
hash(key) once; AQE skew-split handles hot keys.

The DuckDB oracle is the native ``ASOF LEFT JOIN`` — semantics pinned
value-for-value at the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              suffix: str = "_r", strict: bool = False) -> DataFrame:
    """Backward as-of left join: each left row gets the right row with
    the greatest ``right_ts`` <= its ``left_ts`` (strictly < when
    ``strict``), matching on the ``on`` keys; right value columns are
    appended with ``suffix`` (the right timestamp too), NULL when no
    prior right row exists.
    """
    key_cols = list(on)
    r_payload = [c for c in right.columns if c not in key_cols]
    assert right_ts in r_payload, "right_ts must not be a join key"

    r2 = (right
          .withColumn("_t", F.col(right_ts))
          .withColumn("_side", F.lit(1))
          .withColumn("_p", F.struct(*[F.col(c) for c in r_payload]))
          .select(*key_cols, "_t", "_side", "_p"))
    l2 = (left
          .withColumn("_t", F.col(left_ts))
          .withColumn("_side", F.lit(0))
          .withColumn("_p", F.lit(None).cast(
              r2.schema["_p"].dataType))
          .select(*key_cols, "_t", "_side",
                  F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
                  "_p"))
    r2 = r2.withColumn("_l", F.lit(None).cast(l2.schema["_l"].dataType)) \
           .select(*key_cols, "_t", "_side", "_l", "_p")
    both = l2.select(*key_cols, "_t", "_side", "_l", "_p").unionByName(r2)

    # at equal _t a right row must precede (backward join includes it)
    # unless strict; _side orders right(1) before/after left(0) accordingly
    side_order = F.col("_side").desc() if not strict else F.col("_side").asc()
    # trailing _p tiebreak: two right rows with identical ts resolve to the
    # greatest payload struct (field-lexicographic) instead of racing
    w = (Window.partitionBy(*key_cols)
               .orderBy(F.col("_t").asc(), side_order, F.col("_p").asc())
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (both
               .withColumn("_m", F.last("_p", ignorenulls=True).over(w))
               .where(F.col("_side") == 0))
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in r_payload]
    return matched.select(*out_cols)
