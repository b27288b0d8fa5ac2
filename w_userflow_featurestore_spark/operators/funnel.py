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

from w_userflow_featurestore_spark.functions import epoch_ms, fround

__all__ = ["funnel_progress", "funnel_daily"]


def funnel_progress(events: DataFrame, steps: list[str], *,
                    entity_cols: list[str] | None = None,
                    type_col: str = "event_type", ts_col: str = "ts",
                    id_col: str = "event_id",
                    salt_span_ms: int | None = None) -> DataFrame:
    """Per-entity earliest strict-sequence completion time of each step.

    Returns one row per entity with ``<step>_ts`` columns; a NULL means
    the funnel stalled before that step (later columns are then NULL by
    construction).

    ``salt_span_ms`` is the SKEW OPTION for 100x-hot entities: the
    per-entity window puts one entity's whole event history in one
    task, so a bot/power user with 10^8 events in a day becomes a
    straggler at scale. With a span, the computation decomposes into
    contiguous time blocks of ``salt_span_ms`` (window partitioned by
    (entity, block) — per-task rows bounded by the hottest BLOCK, not
    the hottest entity) and the per-block summaries are folded in
    block order by a bounded array aggregate. Output is IDENTICAL (see
    :func:`_funnel_progress_salted` for the exactness argument); the
    default stays unsalted — one window is cheaper when no entity is
    hot, and cap_group_rows already bounds skew where event caps are
    acceptable (operators/sampling.py).
    """
    if len(steps) != len(set(steps)):
        raise ValueError(f"funnel steps must be distinct: {steps}")
    entity_cols = entity_cols or ["user_id"]
    if salt_span_ms is not None:
        return _funnel_progress_salted(events, steps, entity_cols,
                                       type_col, ts_col, id_col,
                                       salt_span_ms)
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


def _funnel_progress_salted(events: DataFrame, steps: list[str],
                            entity_cols: list[str], type_col: str,
                            ts_col: str, id_col: str,
                            span_ms: int) -> DataFrame:
    """Time-block decomposition of the strict-sequence funnel.

    Why it is EXACT: each step time is the FIRST achievement and never
    improves afterwards (the running min's candidates only grow later
    in ts), so funnel state is (k achieved steps, their times). Blocks
    are contiguous ts ranges (``floor(epoch_ms/span)``), so every event
    of block b+1 is strictly later than anything in block b — the
    cross-block ``ts >= prev`` constraint holds automatically, and a
    block's effect depends only on the ENTRY step count k, not the
    entry times. Per (entity, block) we therefore precompute, for
    every possible k, the times the block would contribute to steps
    k..S-1 (the same running-min chain, started at step k with no
    lower bound); the per-entity fold then just walks blocks in order
    appending each block's contribution for its actual entry k. Ties
    (equal ts) land in one block and keep the (ts, id) order.

    Cost: one shuffle to (entity, block) windows + one hash agg per
    block + one agg to entities whose payload is <= blocks-per-range
    structs of S timestamps — per-task row counts bounded by the
    hottest block, never the hottest entity. The S(S+1)/2 running-min
    columns share one Exchange+Sort exactly like the unsalted chain.
    """
    S = len(steps)
    blk = F.floor(epoch_ms(F.col(ts_col)) / F.lit(span_ms))
    df = events.withColumn("_blk", blk)
    running = (Window.partitionBy(*entity_cols, "_blk")
               .orderBy(ts_col, id_col)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # entry state k: the chain over steps[k:], unconstrained first step
    for k in range(S):
        prev: Column | None = None
        for j, step in enumerate(steps[k:]):
            qualifies = F.col(type_col) == step
            if prev is not None:
                qualifies = qualifies & (F.col(ts_col) >= prev)
            df = df.withColumn(f"_b{k}_{j}",
                               F.min(F.when(qualifies, F.col(ts_col)))
                                .over(running))
            prev = F.col(f"_b{k}_{j}")
    per_block = (df.groupBy(*entity_cols, "_blk")
                   .agg(*[F.max(f"_b{k}_{j}").alias(f"_g{k}_{j}")
                          for k in range(S) for j in range(S - k)]))
    block_struct = F.struct(
        F.col("_blk").alias("b"),
        *[F.array(*[F.col(f"_g{k}_{j}") for j in range(S - k)])
          .alias(f"g{k}") for k in range(S)])
    per_entity = (per_block.groupBy(*entity_cols)
                  .agg(F.array_sort(F.collect_list(block_struct))
                       .alias("_blocks")))

    def fold(state: Column, b: Column) -> Column:
        # k = achieved steps so far (non-null prefix of state)
        k = F.size(F.filter(state, lambda x: x.isNotNull()))
        gained = F.lit(None).cast("array<timestamp>")
        for kk in range(S - 1, -1, -1):
            gained = F.when(k == kk, b[f"g{kk}"]).otherwise(gained)
        return F.transform(
            F.sequence(F.lit(0), F.lit(S - 1)),
            lambda i: F.when(i < k, F.try_element_at(state, i + 1))
                       .otherwise(F.try_element_at(gained, i - k + 1)))

    init = F.expr(f"array_repeat(CAST(NULL AS TIMESTAMP), {S})")
    final = F.aggregate(F.col("_blocks"), init, fold)
    return per_entity.select(
        *entity_cols,
        *[F.element_at(final, i + 1).alias(f"{step}_ts")
          for i, step in enumerate(steps)])


def funnel_daily(events: DataFrame, steps: list[str], *,
                 entity_col: str = "user_id", type_col: str = "event_type",
                 ts_col: str = "ts", id_col: str = "event_id",
                 salt_span_ms: int | None = None) -> DataFrame:
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
        type_col=type_col, ts_col=ts_col, id_col=id_col,
        salt_span_ms=salt_span_ms)
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
