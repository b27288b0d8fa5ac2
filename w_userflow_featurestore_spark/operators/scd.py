"""Slowly-changing-dimension (SCD Type-2) history from an event stream.

The reference keeps only a *current* per-user state (the session state
machine collapses history into flags — silver_user_session_events.py);
a feature store serving point-in-time training sets also needs the
HISTORY of any mutable attribute: "what was this user's state at label
time?". SCD Type-2 is the canonical warehouse answer — one row per
(key, value-run) with [valid_from, valid_to) validity — and composes
directly with the AS-OF join family (operators/asof.py) for
leakage-free feature serving.

Spark-first plan: one shuffle on the key, then two window passes —
  1. lag(attr) over (key ORDER BY ts, tiebreak) marks change points
     (streaming window, O(1) state per row);
  2. on the *collapsed* change rows only, lead(valid_from) closes each
     interval and row_number versions it.
The second pass runs on |changes| rows (<< |events| for any attribute
that changes rarely), and both windows share the single key-hash
partitioning — Catalyst plans exactly one Exchange. No self-joins, no
collect, no state proportional to history length beyond the sort the
window already does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from w_userflow_featurestore_spark.functions import epoch_ms


def scd2_history(df: DataFrame, key_col: str = "user_id",
                 ts_col: str = "ts", attr_col: str = "event_type",
                 tiebreak_col: str = "event_id") -> DataFrame:
    """Collapse an observation stream into SCD Type-2 validity intervals.

    Each output row is a maximal run of consecutive identical
    ``attr_col`` values for a key: ``valid_from_ms`` (first observation
    of the run, epoch ms), ``valid_to_ms`` (start of the next run, NULL
    while current — half-open intervals, so AS-OF lookups need no +1
    fudge), ``version`` (1-based per key), ``is_current``.

    Ties (same key, same timestamp) are ordered by ``tiebreak_col`` so
    the run structure is deterministic across engines and reruns — a
    requirement for the DuckDB value oracle and for rerun-stable
    incremental rebuilds.
    """
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w_obs = Window.partitionBy(key_col).orderBy(*order)
    changes = (df.select(key_col, ts_col, tiebreak_col, attr_col)
                 .withColumn("_prev", F.lag(attr_col).over(w_obs))
                 .where(F.col("_prev").isNull()
                        | (F.col("_prev") != F.col(attr_col))))
    w_run = Window.partitionBy(key_col).orderBy(*order)
    return (changes.select(
                F.col(key_col),
                F.col(attr_col),
                epoch_ms(F.col(ts_col)).alias("valid_from_ms"),
                epoch_ms(F.lead(ts_col).over(w_run)).alias("valid_to_ms"),
                F.row_number().over(w_run).cast("long").alias("version"))
            .withColumn("is_current",
                        F.col("valid_to_ms").isNull().cast("int")))


def scd2_apply_batch(table, batch: DataFrame, key_col: str = "user_id",
                     ts_col: str = "ts", attr_col: str = "event_type",
                     tiebreak_col: str = "event_id",
                     txn: str | None = None) -> int:
    """Incrementally fold one in-order observation batch into an SCD2
    LogTable — Delta Live Tables' APPLY CHANGES / SCD TYPE 2, without
    reprocessing history.

    The table holds scd2_history's schema (key, attr, valid_from_ms,
    valid_to_ms, version, is_current). Per batch:

    - the batch collapses to its own runs (scd2_history on the batch —
      the only pass over batch rows);
    - current open intervals for the batch's keys are read back
      (semi-join; steady-state cost tracks the batch's key set, and
      at scale the is_current predicate rides manifest-stats pruning);
    - a run continuing the open interval's value MERGES into it
      (valid_from preserved, version unchanged); a changed value
      CLOSES the open interval at the first change timestamp and
      versions continue from the open version;
    - everything lands as ONE transactional merge on (key, version) —
      closed intervals update in place, new runs insert.

    In-order contract: observations must arrive in event-time order
    per key ACROSS batches (the CDC apply assumption); within a batch
    any order is fine. ``txn`` makes checkpoint-recovery replays
    exactly-once — re-applying a multi-run batch is NOT semantically
    idempotent, so the token, not luck, carries the guarantee.

    Returns the committed snapshot id.
    """
    runs = scd2_history(batch, key_col, ts_col, attr_col, tiebreak_col)
    if table.latest_snapshot_id() is None:
        return table.merge(runs, keys=[key_col, "version"], txn=txn)
    firsts = (runs.where(F.col("version") == 1)
                  .select(F.col(key_col),
                          F.col(attr_col).alias("_first_attr"),
                          F.col("valid_from_ms").alias("_first_from")))
    cur = (table.read().where(F.col("is_current") == 1)
                .join(runs.select(key_col).distinct(), key_col,
                      "left_semi")
                .select(F.col(key_col),
                        F.col(attr_col).alias("_open_attr"),
                        F.col("valid_from_ms").alias("_open_from"),
                        F.col("version").alias("_open_ver")))
    r = runs.join(firsts, key_col).join(cur, key_col, "left")
    has_open = F.col("_open_ver").isNotNull()
    merge_first = has_open & (F.col("_first_attr") == F.col("_open_attr"))
    ver_out = (F.when(~has_open, F.col("version"))
                .when(merge_first, F.col("_open_ver") + F.col("version") - 1)
                .otherwise(F.col("_open_ver") + F.col("version")))
    from_out = F.when(merge_first & (F.col("version") == 1),
                      F.col("_open_from")).otherwise(F.col("valid_from_ms"))
    batch_rows = r.select(
        F.col(key_col), F.col(attr_col),
        from_out.alias("valid_from_ms"), F.col("valid_to_ms"),
        ver_out.cast("long").alias("version"), F.col("is_current"))
    closers = (cur.join(firsts, key_col)
                  .where(F.col("_first_attr") != F.col("_open_attr"))
                  .select(F.col(key_col),
                          F.col("_open_attr").alias(attr_col),
                          F.col("_open_from").alias("valid_from_ms"),
                          F.col("_first_from").alias("valid_to_ms"),
                          F.col("_open_ver").cast("long").alias("version"),
                          F.lit(0).alias("is_current")))
    return table.merge(batch_rows.unionByName(closers),
                       keys=[key_col, "version"], txn=txn)
