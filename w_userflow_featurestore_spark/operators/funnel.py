"""Ordered funnel analysis: strictly-sequential step conversion.

The userflow metric the reference's domain implies but never builds —
its state machine classifies single sessions
(`src/spark/silver/silver_user_session_events.py:125-141` judges
enter/scroll/complete within one session), while a funnel asks whether
a user progressed through steps IN ORDER across a whole day of events:
a purchase only converts if it follows a click that itself followed a
view.

Semantics (strict sequence, earliest-completion): step k's time is the
earliest event of type k occurring AT OR AFTER the step-(k-1) time.
Equal timestamps count as progression (>=), matching the reference's
boundary-inclusive session-window treatment; simultaneous events order
deterministically by event id.

Scale design: one shuffle + one sort TOTAL for any number of steps.
Every step is a running-min window over the same entity partitioning
and (ts, id) ordering, so Catalyst plans a single Exchange + Sort and
chains the WindowExecs on top — no joins, no per-step passes over the
data, O(1) state per row. Because events arrive in ts order within the
window, each running min is constant once set, so the per-entity rollup
is a plain max per step. The daily rollup is one further hash aggregate
keyed by day.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from w_userflow_featurestore_spark.functions import fround

__all__ = ["funnel_progress", "funnel_daily"]


def funnel_progress(events: DataFrame, steps: list[str], *,
                    entity_cols: list[str] | None = None,
                    type_col: str = "event_type", ts_col: str = "ts",
                    id_col: str = "event_id") -> DataFrame:
    """Per-entity earliest strict-sequence completion time of each step.

    Returns one row per entity with ``<step>_ts`` columns; a NULL means
    the funnel stalled before that step (later columns are then NULL by
    construction).
    """
    if len(steps) != len(set(steps)):
        raise ValueError(f"funnel steps must be distinct: {steps}")
    entity_cols = entity_cols or ["user_id"]
    running = (Window.partitionBy(*entity_cols)
               .orderBy(ts_col, id_col)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df = events
    prev: Column | None = None
    for step in steps:
        qualifies = F.col(type_col) == step
        if prev is not None:
            qualifies = qualifies & (F.col(ts_col) >= prev)
        # running earliest qualifying time — visible to every later row
        df = df.withColumn(f"_{step}_ts",
                           F.min(F.when(qualifies, F.col(ts_col)))
                            .over(running))
        prev = F.col(f"_{step}_ts")
    return (df.groupBy(*entity_cols)
              .agg(*[F.max(f"_{step}_ts").alias(f"{step}_ts")
                     for step in steps]))


def funnel_daily(events: DataFrame, steps: list[str], *,
                 entity_col: str = "user_id", type_col: str = "event_type",
                 ts_col: str = "ts", id_col: str = "event_id") -> DataFrame:
    """Per-day funnel: entities reaching each step (strict sequence,
    within that entity-day) + step-over-step and overall conversion.

    The funnel grain is (day, entity): it resets at midnight, which
    keeps the whole computation partition-parallel by day and matches
    the grain every reference gold table uses (`days(datetime)`
    partitioning throughout `src/spark/gold/*.py`). Conversion ratios
    are zero-guarded (an empty first step yields NULL, the reference's
    guarded-ratio convention, e.g. `gold_webtoon_daily_metrics.py:88-101`).
    """
    prog = funnel_progress(
        events.withColumn("datetime", F.to_date(F.col(ts_col))),
        steps, entity_cols=["datetime", entity_col],
        type_col=type_col, ts_col=ts_col, id_col=id_col)
    first, last = steps[0], steps[-1]

    def conv(num: str, den: str, name: str) -> Column:
        return F.when(
            F.count(f"{den}_ts") > 0,
            fround(F.count(f"{num}_ts").cast("double")
                   / F.count(f"{den}_ts"), 4)).alias(name)

    return prog.groupBy("datetime").agg(
        *[F.count(f"{s}_ts").alias(f"reached_{s}") for s in steps],
        *[conv(steps[i], steps[i - 1],
               f"conv_{steps[i - 1]}_to_{steps[i]}")
          for i in range(1, len(steps))],
        conv(last, first, "conv_overall"))
