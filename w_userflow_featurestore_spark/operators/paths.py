"""User-path analysis: event-transition (Markov) features.

Complements the funnel operator (which checks ONE prescribed sequence):
the transition matrix measures ALL observed consecutive event-type
pairs, the standard first-order-Markov representation of user flow —
"after a view, 40% click and 7% error" — consumed directly as session
features or as edge weights for path mining.

Scale design: consecutive pairs come from one `lead` window per
(day, entity) partition ordered by (ts, id) — a single shuffle over the
events, same key discipline as sessionization. The matrix itself is a
hash aggregate on (day, from, to) whose output is tiny (days x |types|^2),
so the row-probability normalization runs as an unordered window over
that aggregate, not over raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from w_userflow_featurestore_spark.functions import epoch_ms, fround

__all__ = ["transition_matrix"]


def transition_matrix(events: DataFrame, *, entity_col: str = "user_id",
                      type_col: str = "event_type", ts_col: str = "ts",
                      id_col: str = "event_id",
                      salt_span_ms: int | None = None) -> DataFrame:
    """Per-day counts and row-normalized probabilities of consecutive
    event-type transitions within each entity's (ts, id)-ordered stream.

    Returns (datetime, from_type, to_type, n_transitions, prob) where
    prob sums to 1 per (datetime, from_type). Simultaneous events order
    deterministically by event id, as everywhere in this engine.

    ``salt_span_ms`` is the SKEW OPTION for 100x-hot entities (same
    rationale as funnel_progress): the lead window runs per (entity,
    contiguous time block) so one task never holds more than the
    hottest BLOCK; the pairs that straddle a block boundary — each
    block's LAST event with the NEXT non-empty block's FIRST — are
    recovered from a per-block min_by/max_by aggregate, whose output is
    one row per (entity, block), so the stitching window is over block
    summaries, never raw events. Equal timestamps share a block (block
    = floor(epoch_ms/span)), so (ts, id) ordering is preserved and the
    output is IDENTICAL to the unsalted form.
    """
    day = F.to_date(F.col(ts_col))
    if salt_span_ms is not None:
        df = (events.withColumn("datetime", day)
              .withColumn("_blk", F.floor(epoch_ms(F.col(ts_col))
                                          / F.lit(salt_span_ms))))
        wb = (Window.partitionBy("datetime", entity_col, "_blk")
              .orderBy(ts_col, id_col))
        within = (df.select("datetime", entity_col,
                            F.col(type_col).alias("from_type"),
                            F.lead(type_col).over(wb).alias("to_type"))
                  .where(F.col("to_type").isNotNull()))
        order = F.struct(F.col(ts_col), F.col(id_col))
        per_block = (df.groupBy("datetime", entity_col, "_blk")
                     .agg(F.min_by(type_col, order).alias("first_type"),
                          F.max_by(type_col, order).alias("last_type")))
        wstitch = (Window.partitionBy("datetime", entity_col)
                   .orderBy("_blk"))
        boundary = (per_block
                    .select("datetime", entity_col,
                            F.col("last_type").alias("from_type"),
                            F.lead("first_type").over(wstitch)
                             .alias("to_type"))
                    .where(F.col("to_type").isNotNull()))
        pairs = within.unionByName(boundary)
    else:
        w = (Window.partitionBy("datetime", entity_col)
             .orderBy(ts_col, id_col))
        pairs = (events.withColumn("datetime", day)
                 .select("datetime", entity_col,
                         F.col(type_col).alias("from_type"),
                         F.lead(type_col).over(w).alias("to_type"),
                         F.col(ts_col), F.col(id_col))
                 .where(F.col("to_type").isNotNull()))
    counts = (pairs.groupBy("datetime", "from_type", "to_type")
              .agg(F.count(F.lit(1)).alias("n_transitions")))
    row_total = F.sum("n_transitions").over(
        Window.partitionBy("datetime", "from_type"))
    return counts.withColumn(
        "prob",
        fround(F.col("n_transitions").cast("double") / row_total, 4))


def behavior_diversity(events: DataFrame, key_col: str = "user_id",
                       dim_col: str = "event_type") -> DataFrame:
    """Per-key behavioral-diversity features over a categorical dim:
    event count, distinct behaviors, and Gini impurity
    ``1 - sum(p_i^2)`` (0 = always the same action, ->1 = uniform over
    many actions) — the bot/power-user signal that feeds curation and
    per-entity capping decisions.

    Gini instead of Shannon entropy ON PURPOSE: it is an exact rational
    of integer counts, ``(n^2 - sum c_i^2) / n^2``, so the value is
    bit-identical in any engine and under any aggregation order —
    entropy's ``log`` is libm-dependent and would break the value
    oracle. Two hash aggregates on (key, dim) then (key); partial
    combine absorbs hot keys.
    """
    per_dim = events.groupBy(key_col, dim_col) \
        .agg(F.count(F.lit(1)).alias("__c"))
    n = F.sum("__c")
    sq = F.sum(F.col("__c") * F.col("__c"))
    return (per_dim.groupBy(key_col)
            .agg(n.alias("n_events"),
                 F.count(F.lit(1)).cast("long").alias("n_behaviors"),
                 fround((n * n - sq).cast("double") / (n * n), 4)
                 .alias("gini_impurity")))


def path_ngrams(events: DataFrame, n: int = 3, k: int = 20, *,
                entity_col: str = "user_id", type_col: str = "event_type",
                ts_col: str = "ts", id_col: str = "event_id") -> DataFrame:
    """Top-``k`` behavioral n-grams: the most frequent length-``n``
    consecutive event-type sequences across entity streams — path
    mining one order above transition_matrix's bigrams (where funnels
    test a KNOWN sequence, this DISCOVERS the dominant ones).

    n-1 lead windows share one (entity)-partitioned sort, the n-gram
    is a row-local concat (no self-joins — the classic sequence-join
    formulation shuffles n times; this shuffles once), then a hash
    aggregate with map-side combine and a TakeOrdered top-k with the
    engine's deterministic tie-break. Per-task state is the window
    frame (n-1 rows), never the stream.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col, id_col)
    steps = [F.col(type_col)] + [F.lead(type_col, i).over(w)
                                 for i in range(1, n)]
    gram = F.concat_ws(">", *steps)
    # EVERY step must be non-null, not just the last lead: concat_ws
    # silently skips NULLs, so a stream (a, NULL, b) would otherwise
    # collapse to the phantom bigram-as-trigram 'a>b'. A NULL mid-path
    # (and a window running off the stream end) both disqualify the
    # gram — matching the SQL oracle's NULL-propagating `||` concat.
    full = steps[0].isNotNull()
    for s in steps[1:]:
        full = full & s.isNotNull()
    return (events
            .select(gram.alias("path"), full.alias("_full"))
            .where(F.col("_full"))
            .groupBy("path")
            .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
            .orderBy(F.desc("n_paths"), F.asc("path"))
            .limit(k))
