"""Job-level control plane: layer runners, completeness gate, sequencing.

The reference orchestrates with Airflow: a Silver DAG every 10 minutes
(snapshot bookkeeping -> sessionize -> MERGE -> record snapshot,
reference airflow/dags/silver_dag.py) and a daily Gold DAG that first
gates on Silver completeness (>=140 parquet files in yesterday's
partition, gold_daily_dag.py:49-64) then runs five feature jobs in
sequence (episode before webtoon — a cross-job data dependency,
:146). This module is that control plane as a library: no scheduler
dependency, every step a plain function the caller can cron/airflow/
dagster however they like.

- ``run_silver``        — incremental-or-full events read (incremental
                          planner ledger) -> cleanse -> sessionize ->
                          idempotent MERGE into the session table;
                          ledger committed only after the write lands.
- ``completeness_gate`` — row-count-per-partition check generalizing the
                          reference's file-count proxy (counts are what
                          you actually mean; file counts were a stand-in).
- ``run_daily_features``— the feature jobs in dependency order, each
                          written with dynamic partition overwrite (the
                          reference's idempotent recovery unit).

Every step is re-runnable: a crashed run leaves the ledger uncommitted
(next run replays the increment) and partition overwrite converges.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from w_userflow_featurestore_spark.incremental import IncrementalPlanner
from w_userflow_featurestore_spark.operators import metrics as M
from w_userflow_featurestore_spark.operators.cleanse import (
    dedup_latest, drop_null_keys,
)
from w_userflow_featurestore_spark.operators.sessionize import sessionize
from w_userflow_featurestore_spark.sources import (
    merge_upsert, overwrite_partitions,
)


class CompletenessError(RuntimeError):
    """Raised when an upstream partition fails the completeness gate."""


def completeness_gate(df: DataFrame, partition_col: str, min_rows: int,
                      partitions: list | None = None) -> dict:
    """Require every (listed) partition to hold >= min_rows rows.

    Generalizes the reference's >=140-parquet-files S3 listing check
    (gold_daily_dag.py:49-64) to the quantity it proxied. One count
    aggregation — no driver-side file walking.
    """
    counts = df.groupBy(partition_col).agg(F.count(F.lit(1)).alias("n"))
    if partitions is not None:
        counts = counts.where(F.col(partition_col).isin(partitions))
    got = {r[partition_col]: r["n"] for r in counts.collect()}
    missing = {} if partitions is None else {
        p: 0 for p in partitions if p not in got}
    thin = {p: n for p, n in got.items() if n < min_rows} | missing
    if thin:
        raise CompletenessError(
            f"partitions below {min_rows} rows: {sorted(thin.items())}")
    return got


class QualityGateError(RuntimeError):
    """Raised when a content-constraint suite fails before a write."""


def quality_gate(df: DataFrame, rules: list[dict]) -> None:
    """Evaluate a quality_report constraint suite and REFUSE the write
    on any violation — the content-level upgrade of completeness_gate
    (which only counts rows, the reference's file-count proxy). One
    aggregation pass; the error carries every failing rule with its
    violation count so the on-call sees the whole blast radius at once,
    not just the first failed assert."""
    from w_userflow_featurestore_spark.operators.quality import (
        quality_report,
    )
    bad = [(r["rule"], r["n_violations"])
           for r in quality_report(df, rules).collect()
           if r["passed"] == 0]
    if bad:
        raise QualityGateError(f"constraints failed: {bad}")


@dataclass
class SilverResult:
    mode: str            # incremental | full | empty
    input_rows: int
    sessions_upserted: int


def _extend_with_open_tails(spark: SparkSession, increment: DataFrame,
                            silver_path: str, events_path: str,
                            table_format: str) -> DataFrame:
    """run_silver's continuation lookback (see its docstring): union the
    increment with the raw events of still-open tail sessions so
    re-sessionization merges across the increment boundary. One
    driver-side scalar (the earliest affected tail start — the bound
    that makes the re-read prunable) is the only collect."""
    from w_userflow_featurestore_spark.operators.sessionize import (
        DEFAULT_GAP_MS,
    )
    from w_userflow_featurestore_spark.sources import LogTable
    # Only the narrow "table doesn't exist yet" signals mean "first run,
    # no tails to look back at": a LogTable with zero commits raises
    # ValueError("... has no commits"), a missing parquet path raises
    # AnalysisException(PATH_NOT_FOUND). Anything else (corrupt log
    # JSON, transient FS error, concurrent-commit race) must PROPAGATE:
    # silently skipping the lookback would re-sessionize a spanning
    # session without its head — a fragment row under a new
    # content-derived id next to the stale tail, i.e. permanent silent
    # corruption instead of a visible failed run.
    try:
        if table_format == "log":
            tails = LogTable(spark, silver_path).read()
        else:
            tails = spark.read.parquet(silver_path)
    except FileNotFoundError:  # LogTable dir never created
        return increment
    except ValueError as exc:
        if "has no commits" not in str(exc):
            raise
        return increment
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" not in str(exc) and \
                "Path does not exist" not in str(exc):
            raise
        return increment
    first_new = (increment.groupBy("user_id")
                 .agg(F.min("ts").alias("_new_ts")))
    cand = (tails.join(first_new, "user_id")
                 .where(F.col("end_time") >=
                        F.col("_new_ts")
                        - F.expr(f"interval {DEFAULT_GAP_MS // 1000} seconds"))
                 .groupBy("user_id")
                 .agg(F.min("start_time").alias("_tail_start")))
    bound = cand.agg(F.min("_tail_start")).collect()[0][0]
    if bound is None:
        return increment
    if table_format == "log":
        hist = LogTable(spark, events_path).read(
            filters=[("ts", ">=", bound)])
    else:
        hist = (spark.read.parquet(events_path)
                     .where(F.col("ts") >= F.lit(bound)))
    # the global bound only PRUNES the scan; membership is per-user —
    # ts >= that user's own qualifying tail start. A global-min cut
    # would admit another user's mid-session events without their
    # session head and re-sessionize them into a phantom fragment.
    lookback = (hist.join(cand, "user_id")
                    .where(F.col("ts") >= F.col("_tail_start")))
    return increment.unionByName(
        lookback.select(*increment.columns))


def run_silver(spark: SparkSession, events_path: str, silver_path: str,
               ledger_path: str, now: str,
               table_format: str = "parquet") -> SilverResult:
    """Events -> classified sessions, MERGEd by session key.

    CONTINUATION-AWARE incremental sessionization: a session can span
    increments (its tail is still open when the increment is cut), and
    recomputing only the new rows would fragment it. Before
    sessionizing, the increment is extended with a LOOKBACK: silver
    sessions of the increment's users whose end_time is within the
    session gap of that user's first new event are identified, and the
    raw events from the earliest such tail's start_time onward (for
    those users only — a partition/stat-prunable time filter plus a
    user semi-join, never a full history re-read) are unioned back in.
    Re-sessionizing the union reproduces each tail session WITH its new
    events; because session ids are content-derived (user + session
    start second), the recomputed session carries the SAME id and the
    MERGE replaces the stale tail row in place — all rollup columns,
    including non-combinable ones like distinct item counts, come out
    exact. The reference sidesteps this only because its events carry
    client-assigned session ids (silver_user_session_events.py:146-186);
    this engine derives sessions, so the continuation logic is the
    price of gaps-and-islands semantics.

    ``table_format="log"`` binds both ends to the transactional LogTable
    format: the events increment comes from real snapshot lineage
    (LakehousePlanner) and the silver MERGE is a file-granular
    copy-on-write commit — the reference's actual Iceberg semantics
    (S6/S7/S9) rather than the parquet emulation.

    Durability note: the one-pass diagnostics below use
    ``localCheckpoint`` (EXECUTOR-local storage). On local[N] that is
    free; on a real cluster an executor loss between the checkpoint and
    the merge write fails the run — acceptable because the run is
    re-entrant (ledger uncommitted => the increment replays and the
    merge converges), but latency-sensitive cluster deployments should
    swap in a reliable ``checkpoint()`` dir or persist(DISK_ONLY_2).
    """
    if table_format == "log":
        from w_userflow_featurestore_spark.incremental import (
            LakehousePlanner,
        )
        from w_userflow_featurestore_spark.sources import LogTable
        planner = LakehousePlanner(LogTable(spark, events_path), ledger_path)
    else:
        planner = IncrementalPlanner(events_path, ledger_path)
    plan = planner.plan_read(spark)
    if plan.mode == "empty":
        plan.commit()
        return SilverResult("empty", 0, 0)
    raw = plan.df
    if plan.mode == "incremental":
        raw = _extend_with_open_tails(spark, raw, silver_path,
                                      events_path, table_format)
    events = drop_null_keys(
        dedup_latest(raw, key=["event_id"], order_by=["ts"]),
        ["event_id", "user_id", "ts"])
    # Diagnostics ride the data pass (A17 "counts in ONE pass"): observe()
    # attaches CollectMetrics nodes that are harvested by the single eager
    # materialization below — zero extra Spark actions, unlike a count()
    # which would re-run the dedup+sessionize subtree per diagnostic.
    obs_in, obs_out = Observation(), Observation()
    events = events.observe(obs_in, F.count(F.lit(1)).alias("rows"))
    sessions = sessionize(events, now=now).observe(
        obs_out, F.count(F.lit(1)).alias("rows"))
    # One materialization: collects both observations AND hands merge_upsert
    # a lineage-free input, so the merge's partition rewrite never recomputes
    # (or double-scans, which would double-count the metrics) this subtree.
    sessions = sessions.localCheckpoint(eager=True)
    merge_upsert(spark, silver_path, sessions,
                 keys=["session_id"], partition_by=["datetime"],
                 format=table_format if table_format == "log" else "auto")
    plan.commit()        # ledger moves only after the table write landed
    return SilverResult(plan.mode, int(obs_in.get["rows"]),
                        int(obs_out.get["rows"]))


def _ledger_current_version(ledger_dir: str) -> int | None:
    """The committed version the ``_current`` pointer names, or None
    before the first commit. Driver-local filesystem only — see
    :func:`read_split_ledger` for the pointer-vs-data storage
    contract shared by every versioned ledger in this module."""
    import json as _json
    import os as _os
    pointer = _os.path.join(ledger_dir, "_current")
    if not _os.path.exists(pointer):
        return None
    with open(pointer) as fh:
        return _json.load(fh)["version"]


def _ledger_commit(ledger_dir: str, version: int) -> None:
    """Move the ``_current`` pointer to ``version`` atomically
    (tmp + rename) — THE commit point: called only after the version's
    parquet write landed, so a crash at any earlier moment leaves the
    previous version live and the run re-entrant."""
    import json as _json
    import os as _os
    import uuid as _uuid
    pointer = _os.path.join(ledger_dir, "_current")
    tmp = pointer + f".{_uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as fh:
        _json.dump({"version": version}, fh)
    _os.replace(tmp, pointer)


@dataclass
class SplitLedgerResult:
    version: int         # committed ledger version after this run
    mode: str            # initial | incremental
    n_docs: int          # rows in the committed ledger


def read_split_ledger(spark: SparkSession, ledger_dir: str) -> DataFrame:
    """The CURRENT committed component ledger (doc_id, group_key) — the
    version the ``_current`` pointer names; uncommitted/crashed writes
    are invisible by construction.

    ``ledger_dir`` must be a DRIVER-LOCAL filesystem path: the
    ``_current`` pointer is read with ``open()`` / committed with
    ``os.replace()`` (the atomic-rename primitive object stores don't
    offer) while the version directories are Spark parquet writes to
    the same path string — the two coincide only on a local (or
    driver-mounted, e.g. NFS) filesystem, same as
    :class:`~w_userflow_featurestore_spark.incremental.IncrementalPlanner`'s
    file ledger. An object-store deployment (s3://, hdfs://) should
    keep the data versions remote and the pointer on a rename-capable
    store (or a catalog) — the versioned-pointer seam localizes that
    swap to ``_ledger_current_version`` / ``_ledger_commit``
    (round-8 ADVICE)."""
    import os as _os
    v = _ledger_current_version(ledger_dir)
    if v is None:
        raise FileNotFoundError(f"no committed ledger in {ledger_dir}")
    return spark.read.parquet(_os.path.join(ledger_dir, f"v{v}"))


def run_split_ledger_update(spark: SparkSession, ledger_dir: str,
                            batch_docs: DataFrame, batch_pairs: DataFrame,
                            id_col: str = "doc_id",
                            pair_a: str = "doc_a",
                            pair_b: str = "doc_b") -> SplitLedgerResult:
    """Ingest a batch into the persisted leakage-split component ledger
    — the state behind ``operators/sampling.py::
    incremental_leakage_split``, persisted with the silver watermark
    discipline (run_silver commits its read ledger only AFTER the table
    write lands): the new ledger is written to a fresh versioned
    directory, and the ``_current`` pointer moves to it atomically
    (tmp + rename) only after the parquet write completed. A crash at
    any earlier point leaves the previous version live and the run
    re-entrant — replaying the batch converges on the same content
    (merge_component_ledger is deterministic), and a half-written
    v{N+1} directory is simply overwritten by the replay.

    First run (no pointer) builds the ledger from the batch alone;
    later runs extend via :func:`~w_userflow_featurestore_spark.operators.sampling.merge_component_ledger`,
    so corpus-internal pairs are never recomputed. ``batch_pairs`` =
    pairs touching >= 1 batch doc (an LSH probe of the batch), per the
    star-collapse contract.

    Scale note: each commit rewrites the full (doc_id, group_key)
    ledger — ~16 bytes/doc, the deliberate cost of an always-consistent
    snapshot (the gram ledger pays the same via its re-aggregate). A
    deployment hot enough to feel that rewrite should bucket the ledger
    by hash(doc_id) and rewrite only buckets holding changed rows — the
    versioned-pointer seam here accommodates that without API change.

    ``ledger_dir`` must be driver-local — see
    :func:`read_split_ledger` for the pointer-vs-data storage contract.
    """
    import os as _os
    from w_userflow_featurestore_spark.operators.sampling import (
        component_ledger, merge_component_ledger,
    )
    base = _ledger_current_version(ledger_dir)
    if base is not None:
        prev = spark.read.parquet(_os.path.join(ledger_dir, f"v{base}"))
        merged = merge_component_ledger(prev, batch_docs, batch_pairs,
                                        id_col, pair_a, pair_b)
        mode = "incremental"
    else:
        base = 0
        merged = component_ledger(batch_docs, batch_pairs,
                                  id_col, pair_a, pair_b)
        mode = "initial"
    # one materialization: the rows-written count rides the write and
    # the frame is lineage-free before any directory is touched
    obs = Observation()
    merged = merged.observe(obs, F.count(F.lit(1)).alias("rows"))
    out = _os.path.join(ledger_dir, f"v{base + 1}")
    merged.write.mode("overwrite").parquet(out)
    n = int(obs.get["rows"])
    _ledger_commit(ledger_dir, base + 1)
    return SplitLedgerResult(base + 1, mode, n)


@dataclass
class NoveltyLedgerResult:
    version: int         # committed ledger version after this run
    mode: str            # initial | incremental
    n_shingles: int      # distinct shingle hashes in the committed ledger


def read_novelty_ledger(spark: SparkSession, ledger_dir: str) -> DataFrame:
    """The CURRENT committed shingle-df ledger (sh, n_docs) — the
    corpus-history state :func:`score_batch_novelty` probes. Same
    versioned-pointer commit protocol and driver-local storage contract
    as :func:`read_split_ledger`."""
    import os as _os
    v = _ledger_current_version(ledger_dir)
    if v is None:
        raise FileNotFoundError(f"no committed ledger in {ledger_dir}")
    return spark.read.parquet(_os.path.join(ledger_dir, f"v{v}"))


def score_batch_novelty(spark: SparkSession, ledger_dir: str,
                        batch_docs: DataFrame, n: int = 3,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Novelty-score an incoming batch against the corpus HISTORY in
    the persisted ledger — run BEFORE :func:`run_novelty_ledger_update`
    ingests the same batch: ``incremental_novelty`` counts batch
    occurrences itself, so a ledger that already contains the batch
    would double-count them (the score-then-ingest order is the
    pipeline contract, demonstrated in the runner test)."""
    from w_userflow_featurestore_spark.operators.dedup import (
        incremental_novelty,
    )
    return incremental_novelty(batch_docs,
                               read_novelty_ledger(spark, ledger_dir),
                               n, text_col, id_col)


def run_novelty_ledger_update(spark: SparkSession, ledger_dir: str,
                              batch_docs: DataFrame, n: int = 3,
                              text_col: str = "text",
                              id_col: str = "doc_id"
                              ) -> NoveltyLedgerResult:
    """Ingest a batch into the persisted shingle-df ledger — the state
    behind :func:`score_batch_novelty`, committed with the same
    versioned-pointer discipline as :func:`run_split_ledger_update`:
    the merged ledger lands in a fresh ``v{N+1}`` directory and the
    ``_current`` pointer moves only after the parquet write completed,
    so a crash leaves the previous version live and the replay
    converges (``merge_shingle_ledger`` is a deterministic
    re-aggregate; a half-written directory is simply overwritten).

    Batches must be doc-DISJOINT from prior ingests (the additivity
    precondition ``merge_shingle_ledger`` documents) — replaying the
    SAME batch would double its counts; production keys ingestion by
    snapshot range (``LakehousePlanner``) exactly to guarantee this.

    Scale note: each commit rewrites the full (sh, n_docs) ledger —
    ~16 bytes per distinct shingle, the same always-consistent-snapshot
    trade the component ledger makes; bucket by ``sh`` and rewrite
    changed buckets when the rewrite itself becomes hot.
    """
    import os as _os
    from w_userflow_featurestore_spark.operators.dedup import (
        merge_shingle_ledger, shingle_ledger,
    )
    batch = shingle_ledger(batch_docs, n, text_col, id_col)
    base = _ledger_current_version(ledger_dir)
    if base is not None:
        prev = spark.read.parquet(_os.path.join(ledger_dir, f"v{base}"))
        merged = merge_shingle_ledger(prev, batch)
        mode = "incremental"
    else:
        base = 0
        merged = batch
        mode = "initial"
    obs = Observation()
    merged = merged.observe(obs, F.count(F.lit(1)).alias("rows"))
    out = _os.path.join(ledger_dir, f"v{base + 1}")
    merged.write.mode("overwrite").parquet(out)
    n_rows = int(obs.get["rows"])
    _ledger_commit(ledger_dir, base + 1)
    return NoveltyLedgerResult(base + 1, mode, n_rows)


# feature jobs in dependency order; item_daily feeds top_item_per_day the
# way the reference's episode job feeds the webtoon job
# (gold_webtoon_daily_metrics.py:74-85, gold_daily_dag.py:146)
def run_daily_features(spark: SparkSession, silver_path: str, events: DataFrame,
                       out_dir: str, min_rows_per_day: int = 1,
                       table_format: str = "parquet",
                       for_date: str | None = None,
                       quality_rules: list[dict] | None = None) -> dict[str, int]:
    """All gold-grain feature tables, gated then written idempotently.
    ``table_format="log"`` makes each table a LogTable whose daily
    overwrite is one atomic remove+add commit (reference S10 on a real
    format); the silver input is read from either backend.

    Returns rows WRITTEN per table by THIS run (observed on the write
    action itself). Under dynamic partition overwrite that is the row
    count of the partitions this run produced — prior-day partitions
    remain in the table but are deliberately not re-counted (a total-
    table count would cost a full re-read per table; callers wanting
    totals can count the table on read).

    ``for_date`` (``YYYY-MM-DD``) = the reference's daily-DAG regime
    (gold_daily_dag.py runs per execution date): inputs are bounded to
    ``datetime <= for_date`` — a partition-pruned upper scan bound, so
    history-dependent metrics (user return intervals) see exactly the
    history they would have seen on that day — and only the
    ``for_date`` partition of each table is produced and overwritten.
    At 100 TB this is THE difference between a daily job that touches
    one day's partitions and one that rewrites the table: recompute
    cost tracks history size read-only, write cost tracks one day.
    Re-running any date converges (same inputs -> same partition)."""
    from w_userflow_featurestore_spark.sources import LogTable
    if LogTable.is_log_table(silver_path):
        sessions = LogTable(spark, silver_path).read()
    else:
        sessions = spark.read.parquet(silver_path)
    if for_date is not None:
        d = F.lit(for_date).cast("date")
        sessions = sessions.where(F.col("datetime") <= d)
        # raw-ts bound (not to_date(ts) <= d) so the predicate pushes
        # to the events parquet scan instead of hiding behind a cast
        events = events.where(
            F.col("ts") < F.date_add(d, 1).cast("timestamp"))
    import datetime as _dt
    completeness_gate(
        sessions, "datetime", min_rows_per_day,
        partitions=([_dt.date.fromisoformat(for_date)]
                    if for_date else None))
    if quality_rules:
        # content constraints on the silver input, same fail-fast spot
        # as the volume gate (before any gold partition is touched)
        quality_gate(sessions, quality_rules)

    item = M.item_daily(events)
    outputs: dict[str, DataFrame] = {
        "user_daily": M.user_daily_full(sessions, events),
        "item_daily": item,
        "top_item_per_day": M.top_item_per_day(item),   # consumes item_daily
        "entry_type_daily": M.entry_type_daily(sessions),
        "cohort_vs_global": M.cohort_vs_global(sessions),
    }
    written: dict[str, int] = {}
    for name, df in outputs.items():
        if for_date is not None:
            df = df.where(F.col("datetime")
                          == F.lit(for_date).cast("date"))
        # rows-written diagnostic rides the write action itself (observe,
        # not a post-hoc re-read+count of the table we just wrote)
        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        overwrite_partitions(df, f"{out_dir}/{name}", ["datetime"],
                             format="log" if table_format == "log"
                             else "auto")
        written[name] = int(obs.get["rows"])
    return written
