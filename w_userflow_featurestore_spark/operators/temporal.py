"""Time-window operators: rolling (trailing N-day) feature windows and
tumbling / sliding event-time windows.

These are the feature-engineering shapes the reference's daily gold jobs
cannot express (each job sees one day in isolation — SURVEY.md §3.3):
trailing aggregates need state across days, and sub-day windows need
event-time bucketing. Both are first-class in Spark:

- rolling: pre-aggregate to the (key, day) grain FIRST (hash-agg shuffle
  on the key), then a RANGE-framed window over the tiny daily table —
  window state is O(distinct days per key), never O(events), so the same
  plan holds when a key has 10^9 raw events.
- tumbling/sliding: `F.window(ts, size, slide)` is a projection
  (TimeWindow expand) + hash-agg — the exact operator Structured
  Streaming uses for watermarked windowed aggregation, so a batch oracle
  here validates the streaming path's semantics too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from w_userflow_featurestore_spark.functions import epoch_ms, fround, scaled_long


def rolling_daily_features(events: DataFrame, key_col: str = "user_id",
                           ts_col: str = "ts", value_col: str = "value",
                           window_days: int = 7) -> DataFrame:
    """Per-(key, day) trailing-N-day event count / value sum / daily-avg.

    RANGE frame over integer epoch-day handles calendar gaps correctly
    (a key active on day 1 and day 40 does NOT smear day 1 into day 40's
    window, unlike a ROWS frame). Daily sums are integer-scaled before
    the frame sum so the rolling total is order-exact.
    """
    daily = (events.groupBy(F.col(key_col).alias("key"),
                            F.to_date(ts_col).alias("day"))
                   .agg(F.count(F.lit(1)).alias("n_events"),
                        F.sum(scaled_long(F.col(value_col))).alias("v_cents")))
    daily = daily.withColumn(
        "day_num", F.datediff("day", F.lit("1970-01-01")).cast("long"))
    w = (Window.partitionBy("key").orderBy("day_num")
               .rangeBetween(-(window_days - 1), 0))
    return daily.select(
        F.col("key").alias(key_col),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_events"),
        F.sum("n_events").over(w).alias(f"n_events_{window_days}d"),
        fround(F.sum("v_cents").over(w) / 100.0)
         .alias(f"sum_value_{window_days}d"),
        F.count(F.lit(1)).over(w).cast("long")
         .alias(f"active_days_{window_days}d"))


def session_window_rollup(events: DataFrame, key_col: str = "user_id",
                          ts_col: str = "ts", value_col: str = "value",
                          gap: str = "30 minutes") -> DataFrame:
    """Native Spark session windows: dynamic-gap sessionization as ONE
    groupBy(key, session_window(ts, gap)) hash-aggregate — the same
    operator Structured Streaming uses for stateful session aggregation,
    so this batch oracle pins the streaming path's merge semantics too
    (two events merge iff next.ts < prev.ts + gap, strictly; session end
    = last event + gap).

    Plan shape: one shuffle on the key, sessions merged inside the
    aggregate — an alternative to the gaps-and-islands window-lag form
    (operators.sessionize) with identical boundaries; that form stays the
    engine default because it feeds the downstream state machine columns.
    """
    return (events.groupBy(F.col(key_col).alias("key"),
                           F.session_window(ts_col, gap).alias("sw"))
                  .agg(F.count(F.lit(1)).alias("n_events"),
                       F.sum(scaled_long(F.col(value_col))).alias("vc"))
                  .select(F.col("key").alias(key_col),
                          epoch_ms(F.col("sw.start")).alias("session_start_ms"),
                          epoch_ms(F.col("sw.end")).alias("session_end_ms"),
                          "n_events",
                          fround(F.col("vc") / 100.0).alias("sum_value")))


def tumbling_window_counts(events: DataFrame, ts_col: str = "ts",
                           dim_col: str = "event_type",
                           value_col: str = "value",
                           size: str = "1 hour") -> DataFrame:
    """Fixed non-overlapping event-time buckets per dim: the batch twin
    of the streaming `groupBy(window(ts, size), dim).agg(...)` plan.
    Window start emitted as epoch-ms (cross-engine-stable)."""
    return (events.groupBy(F.window(ts_col, size).alias("w"),
                           F.col(dim_col).alias("dim"))
                  .agg(F.count(F.lit(1)).alias("n_events"),
                       F.sum(scaled_long(F.col(value_col))).alias("vc"))
                  .select(epoch_ms(F.col("w.start")).alias("window_start_ms"),
                          "dim", "n_events",
                          fround(F.col("vc") / 100.0).alias("sum_value")))


def sliding_window_counts(events: DataFrame, ts_col: str = "ts",
                          value_col: str = "value",
                          size: str = "1 hour",
                          slide: str = "30 minutes") -> DataFrame:
    """Overlapping windows (size/slide = 2 windows per event here):
    Spark expands each row into size/slide window copies BEFORE the
    hash-agg — shuffled rows scale by that factor, so keep the ratio
    small at scale (or pre-aggregate to slide-grain tumbling windows and
    roll them up, which AQE can't do for you)."""
    return (events.groupBy(F.window(ts_col, size, slide).alias("w"))
                  .agg(F.count(F.lit(1)).alias("n_events"),
                       F.sum(scaled_long(F.col(value_col))).alias("vc"))
                  .select(epoch_ms(F.col("w.start")).alias("window_start_ms"),
                          "n_events",
                          fround(F.col("vc") / 100.0).alias("sum_value")))


def time_decay_features(events: DataFrame, key_col: str = "user_id",
                        ts_col: str = "ts", value_col: str = "value",
                        half_life_days: int = 1,
                        max_age_days: int = 40) -> DataFrame:
    """Per-key exponentially time-decayed value sum — the recency-
    weighted engagement feature every feature store ships (recent
    activity counts full, day-old activity counts half, ...).

    Exactness at any scale: the decay is a power of two applied as an
    INTEGER right-shift of the cent-scaled value
    (``cents >> (age_days / half_life)``, ages past ``max_age_days``
    contribute 0), so every per-row contribution is an exact integer
    and the aggregate is immune to partial-aggregation order — a true
    ``exp(-age)`` weight would make the sum engine- and
    partitioning-dependent. The reference anchor "now" is the corpus
    max event date (broadcast 1-row aggregate), keeping the op
    deterministic and rerunnable (P9's injected-now rule).
    """
    ref = F.broadcast(
        events.agg(F.max(F.to_date(ts_col)).alias("__ref")))
    aged = (events.crossJoin(ref)
            .withColumn("__age",
                        F.least(F.datediff(F.col("__ref"),
                                           F.to_date(ts_col))
                                / F.lit(half_life_days),
                                F.lit(max_age_days)).cast("int"))
            .withColumn("__cents", scaled_long(F.col(value_col)))
            # F.shiftright only takes a literal bit count; the SQL form
            # shifts by a per-row column
            .withColumn("__dec", F.expr("shiftright(__cents, __age)")))
    return (aged.groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("__dec").alias("decayed_value_c")))


def churn_labels(events: DataFrame, key_col: str = "user_id",
                 ts_col: str = "ts", horizon_days: int = 7) -> DataFrame:
    """Per (key, active-day) churn label: 1 iff the key has NO event in
    the following ``horizon_days`` days — the standard label generator
    for churn/retention models, built leakage-safe from the event stream
    itself (the label looks strictly FORWARD of the feature date).

    One distinct + one RANGE-frame window, both partitioned by key: the
    frame is over integer epoch-days, so calendar gaps count correctly
    (an event 8 days later does not rescue day t). Note the last
    ``horizon_days`` of the stream label as churned by construction —
    at training time, cut those dates off (censoring), exactly as a
    production labeler must.
    """
    days = (events
            .select(F.col(key_col), F.to_date(ts_col).alias("activity_date"))
            .distinct())
    ed = F.datediff("activity_date", F.lit("1970-01-01"))
    w = (Window.partitionBy(key_col).orderBy(ed)
         .rangeBetween(1, horizon_days))
    return days.select(
        key_col,
        F.date_format("activity_date", "yyyy-MM-dd").alias("activity_date"),
        (F.count(F.lit(1)).over(w) == 0).cast("int").alias("churned"))


def daily_volume_anomaly(events: DataFrame, dim_col: str = "event_type",
                         ts_col: str = "ts", lo_bp: int = 5000,
                         hi_bp: int = 20000) -> DataFrame:
    """Day-over-day volume-shift flags per dimension value — the
    pipeline-health monitor a production feature store runs on every
    ingest (a collapsed event type means a broken client; a doubled one
    means a replay or a bot wave).

    ratio_bp = floor(today * 10000 / previous-observed-day) in exact
    integer math; is_anomaly flags ratios outside [lo_bp, hi_bp]. The
    first observed day per dimension has no baseline -> NULL ratio and
    NULL flag (never a false alarm). One hash aggregate to (day, dim)
    then a lag window over that tiny aggregate — raw events shuffle
    once, the window state is O(days x |dim|)."""
    daily = (events
             .groupBy(F.to_date(F.col(ts_col)).alias("datetime"),
                      F.col(dim_col))
             .agg(F.count(F.lit(1)).alias("n_events")))
    w = Window.partitionBy(dim_col).orderBy("datetime")
    prev = F.lag("n_events").over(w)
    ratio = F.floor(F.col("n_events") * 10000 / prev).cast("long")
    return (daily
            .withColumn("prev_n_events", prev)
            .withColumn("ratio_bp", ratio)
            .withColumn("is_anomaly",
                        F.when(prev.isNull(), F.lit(None).cast("int"))
                         .otherwise(((ratio < lo_bp) | (ratio > hi_bp))
                                    .cast("int"))))


def distribution_drift(events: DataFrame, dim_col: str = "event_type",
                       ts_col: str = "ts",
                       threshold_micro: int = 100_000) -> DataFrame:
    """Day-over-day DISTRIBUTION-shape drift per day — the feature-
    monitoring companion to daily_volume_anomaly (which watches volume;
    this watches the mix): a chi-square statistic between today's and
    the previous observed day's category distribution of ``dim_col``.

    chi2_micro = sum over categories of
        floor( 1e6 * (p_today - p_prev)^2 / p_prev )

    Each per-category term is computed in doubles built from EXACT
    integer counts — subtraction, multiplication, division are
    IEEE-correctly-rounded, so the term is bit-identical in any engine
    — then floor-quantized to micro-units and INTEGER-summed, removing
    the float-summation-order hazard entirely (the token_surprisal /
    pagerank quantization discipline). Categories absent on the
    previous day contribute no term (no division by zero) but are
    counted in ``n_new_categories`` — a new category appearing IS
    drift signal and the count exposes it. The first observed day has
    no baseline: NULL statistic, NULL flag.

    Scale shape: one hash aggregate to (day, category), lag windows
    over that tiny aggregate (state is O(days x |dim|)), no joins over
    raw events.
    """
    daily = (events
             .groupBy(F.to_date(F.col(ts_col)).alias("datetime"),
                      F.col(dim_col).alias("category"))
             .agg(F.count(F.lit(1)).alias("n")))
    return drift_from_daily_counts(daily, threshold_micro)


def drift_from_daily_counts(daily: DataFrame,
                            threshold_micro: int = 100_000) -> DataFrame:
    """distribution_drift's core over pre-aggregated (datetime,
    category, n) counts — shared by the batch operator and the
    streaming monitor's delta-ledger reader (duplicate (day, category)
    rows are summed first, so additive count deltas compose)."""
    daily = (daily.groupBy("datetime", "category")
                  .agg(F.sum("n").alias("n")))
    totals = (daily.groupBy("datetime")
                   .agg(F.sum("n").alias("n_day")))
    wd = Window.orderBy("datetime")
    prev_day = F.lag("datetime").over(wd)
    day_pairs = (totals
                 .select("datetime",
                         F.col("n_day"),
                         prev_day.alias("prev_date"),
                         F.lag("n_day").over(wd).alias("n_prev")))
    cur = daily.select("datetime", "category", "n")
    prv = daily.select(F.col("datetime").alias("prev_date"),
                       F.col("category"),
                       F.col("n").alias("n_p"))
    joined = (cur.join(day_pairs, "datetime")
                 .join(prv, ["prev_date", "category"], "left"))
    p_t = F.col("n") / F.col("n_day")
    p_p = F.col("n_p") / F.col("n_prev")
    term = F.floor((p_t - p_p) * (p_t - p_p) / p_p * 1e6).cast("long")
    per_day = (joined
               .groupBy("datetime")
               .agg(F.sum(F.when(F.col("n_p").isNotNull(), term))
                     .alias("chi2_micro"),
                    F.count(F.lit(1)).cast("long").alias("n_categories"),
                    F.sum(F.when(F.col("n_p").isNull()
                                 & F.col("prev_date").isNotNull(), 1)
                           .otherwise(0)).cast("long")
                     .alias("n_new_categories"),
                    F.first("prev_date").alias("_pd")))
    chi2 = F.when(F.col("_pd").isNull(), F.lit(None).cast("long")) \
            .otherwise(F.coalesce(F.col("chi2_micro"), F.lit(0)))
    return (per_day
            .select("datetime", chi2.alias("chi2_micro"), "n_categories",
                    "n_new_categories",
                    F.when(F.col("_pd").isNull(),
                           F.lit(None).cast("int"))
                     .otherwise((F.coalesce(F.col("chi2_micro"), F.lit(0))
                                 > threshold_micro)
                                .cast("int")).alias("is_drift")))


def feature_backfill(events: DataFrame, key_col: str = "user_id",
                     ts_col: str = "ts", value_col: str = "value",
                     end_day: str | None = None) -> DataFrame:
    """Dense per-(key, day) feature grid with gap-fill: every key gets
    one row for EVERY calendar day from its first activity to the
    corpus's last observed day (or ``end_day``), inactive days filled
    with count 0, last-observation-carried-forward value state, and
    days-since-last-activity — the feature-matrix densification step a
    training pipeline runs before sequence models (a missing row is NOT
    a zero-activity observation unless you materialize it).

    Output: key, day, n_events, sum_value_cents (that day, 0 when
    inactive), locf_value_cents (carried forward, exact integer cents),
    days_since_activity (0 on active days).

    Scale shape: raw events collapse to the (key, day) grain first (one
    hash agg — the only pass over the big table); the dense grid is a
    per-key ``sequence()`` explode bounded by calendar span, i.e.
    O(keys x days), the size of the output itself; the LOCF windows
    run per key over that grid. No per-row Python, no cross joins —
    the global end day rides in as a broadcast 1-row scalar.
    """
    daily = (events.groupBy(F.col(key_col).alias("key"),
                            F.to_date(ts_col).alias("day"))
                   .agg(F.count(F.lit(1)).alias("n_events"),
                        F.sum(scaled_long(F.col(value_col)))
                         .alias("sum_value_cents")))
    if end_day is None:
        end = daily.agg(F.max("day").alias("_end"))
        bounds = (daily.groupBy("key").agg(F.min("day").alias("_d0"))
                       .crossJoin(F.broadcast(end)))
    else:
        bounds = (daily.groupBy("key").agg(F.min("day").alias("_d0"))
                       .withColumn("_end", F.lit(end_day).cast("date")))
    # keys whose first activity postdates end_day get NO rows — guard
    # required because sequence(start, stop) REVERSES when start > stop
    # (a descending phantom grid, not an empty one)
    grid = (bounds.where(F.col("_d0") <= F.col("_end"))
                  .select("key",
                          F.explode(F.sequence("_d0", "_end")).alias("day")))
    g = grid.join(daily, ["key", "day"], "left")
    w = (Window.partitionBy("key").orderBy("day")
               .rowsBetween(Window.unboundedPreceding, 0))
    active_day = F.when(F.col("n_events").isNotNull(), F.col("day"))
    return g.select(
        F.col("key").alias(key_col),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("sum_value_cents", F.lit(0)).cast("long")
         .alias("sum_value_cents"),
        F.last("sum_value_cents", ignorenulls=True).over(w)
         .cast("long").alias("locf_value_cents"),
        F.datediff(F.col("day"),
                   F.last(active_day, ignorenulls=True).over(w))
         .cast("long").alias("days_since_activity"))


def rolling_active_users(events: DataFrame, key_col: str = "user_id",
                         ts_col: str = "ts",
                         window_days: int = 7) -> DataFrame:
    """Trailing-N-day DISTINCT actives per day (rolling DAU/WAU/MAU) —
    the one rolling metric a RANGE window CANNOT express, because
    count(DISTINCT) doesn't decompose over frame slides.

    The scalable form is contribution explode: each distinct
    (key, active_day) pair contributes key to the ``window_days``
    window-end days it falls inside, so the plan is
    dedup -> x N projection -> dedup -> count, all hash aggregates
    with partial combine — per-day state is O(distinct keys in
    window), never O(events), and no day ever holds the full history
    (the naive "self-join the day spine to a 7-day range" does a
    pair-explosion over raw events instead).

    Output days cover the observed range only (a window end beyond
    the last active day is meaningless); the leading ``window_days-1``
    days are partial windows, flagged ``is_complete_window`` so
    consumers can drop the ramp-up.
    """
    pairs = (events.select(F.col(key_col).alias("key"),
                           F.to_date(ts_col).alias("day"))
                   .distinct())
    bounds = pairs.groupBy().agg(F.min("day").alias("_d0"),
                                 F.max("day").alias("_d1"))
    contrib = (pairs.select(
        "key",
        F.explode(F.sequence(
            "day", F.date_add("day", window_days - 1))).alias("w_end")))
    dau = (pairs.groupBy(F.col("day").alias("w_end"))
                .agg(F.count(F.lit(1)).cast("long").alias("n_active_1d")))
    out = (contrib.distinct()
                  .groupBy("w_end")
                  .agg(F.count(F.lit(1)).cast("long")
                        .alias(f"n_active_{window_days}d")))
    return (out.crossJoin(F.broadcast(bounds))
               .where(F.col("w_end") <= F.col("_d1"))
               .join(dau, "w_end", "left")
               .select(
                   F.date_format("w_end", "yyyy-MM-dd").alias("day"),
                   F.coalesce("n_active_1d", F.lit(0)).cast("long")
                    .alias("n_active_1d"),
                   F.col(f"n_active_{window_days}d"),
                   (F.datediff("w_end", F.col("_d0"))
                    >= window_days - 1).cast("int")
                    .alias("is_complete_window")))
