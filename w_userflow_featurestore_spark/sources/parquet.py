"""Batch sources/sinks over partitioned parquet.

The reference uses Iceberg for every table (scan S5, MERGE S9, dynamic
partition overwrite S10 — reference src/spark/silver/silver_user_session_events.py:67,146-186
and src/spark/gold/*_metrics.py writeTo(...).overwritePartitions()).
This module provides the same three idempotency primitives in a
format-agnostic way so the engine runs on plain parquet in tests and on
Iceberg/Delta in production (swap the writer, keep the call sites):

- ``read_table``            — pruned scan (S5): filters passed here reach the
                              parquet reader as PushedFilters / partition pruning.
- ``overwrite_partitions``  — dynamic partition overwrite (S10): replace only
                              the partitions present in the result.
- ``merge_upsert``          — MERGE INTO semantics (S9) as an anti-join +
                              union partition rewrite for formats without a
                              transactional MERGE.
"""

from __future__ import annotations

import datetime as _dt
import os
import re
from urllib.parse import unquote, urlparse

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Timestamp columns in the fixture tables. They are stored as parquet
# TIMESTAMP(NANOS); with spark.sql.legacy.parquet.nanosAsLong=true they
# arrive as nanosecond BIGINTs and are normalized here to TimestampType at
# microsecond precision — exactly what DuckDB's parquet reader yields, so
# oracle epoch math agrees to the microsecond.
_NANO_TS_COLS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}

#: (session id, table path) -> inferred StructType. Plan METADATA only
#: (what Spark's own footer inference would return), never row data or
#: results — the same class as _FANOUT_PARTS_MEMO below. Re-inferring
#: the schema costs a footer read + datasource resolution per call
#: (~40-80 ms driver time, measured round 13 guide §7.3); pinning the
#: memoized schema via .schema(...) skips it while producing the
#: IDENTICAL relation (fixture tables are immutable within a session;
#: a regenerated fixture needs a new session, as with Spark's own
#: FileStatusCache). Bounded: one StructType per table per process.
_SCHEMA_MEMO: dict[tuple[int, str], T.StructType] = {}


def read_table(spark: SparkSession, sf_dir: str, name: str,
               where: Column | None = None,
               columns: list[str] | None = None,
               ts_filter: tuple[str, str | None, str | None] | None = None,
               ) -> DataFrame:
    """Scan one fixture table, pushing filter + projection into the scan.

    Express pruning declaratively — Catalyst pushes both into the parquet
    reader (verify with .explain: PushedFilters / ReadSchema).

    CAVEAT — timestamp predicates: the nanos->timestamp conversion below
    is a projection, so a ``where`` on the converted column CANNOT reach
    the scan (Catalyst will not push a filter through
    ``timestamp_micros(x div 1000)``). For time-range pruning use
    ``ts_filter=(col, min_ts, max_ts)`` (inclusive ISO bounds, None =
    unbounded): it is applied to the RAW nano-epoch BIGINT *before* the
    conversion and shows up in PushedFilters — i.e. row-group min/max
    pruning keeps working. At 100 TB this is the difference between a
    pruned scan and a full one. (Tables already stored as TIMESTAMP_MICROS
    take the normal pushdown path; the nanos detour exists only because
    Spark's vectorized reader rejects parquet TIMESTAMP(NANOS).)
    """
    path = f"{sf_dir}/{name}.parquet"
    key = (id(spark), path)
    schema = _SCHEMA_MEMO.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    if ts_filter is not None:
        c, lo, hi = ts_filter
        raw = df.schema[c].dataType

        def bound(iso: str) -> Column:
            if isinstance(raw, T.LongType):
                epoch_ns = int(_dt.datetime.fromisoformat(iso)
                               .replace(tzinfo=_dt.timezone.utc)
                               .timestamp() * 1_000_000) * 1_000
                return F.lit(epoch_ns)
            if isinstance(raw, T.TimestampNTZType):
                # literal must match the column's NTZ type or the
                # comparison won't push down (and may not analyze)
                return F.lit(iso).cast("timestamp_ntz")
            return F.lit(iso).cast("timestamp")

        if lo is not None:
            df = df.where(F.col(c) >= bound(lo))
        if hi is not None:
            df = df.where(F.col(c) <= bound(hi))
    for c in _NANO_TS_COLS.get(name, []):
        if isinstance(df.schema[c].dataType, T.LongType):
            # integer `div` (not `/`): float division of 1.7e18-scale nanos
            # would lose sub-millisecond precision past double's 53-bit mantissa
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
        elif isinstance(df.schema[c].dataType, T.TimestampNTZType):
            # fixture encodings vary by generator version: TIMESTAMP(NANOS)
            # arrives as BIGINT (branch above), TIMESTAMP_MICROS with
            # isAdjustedToUTC=false arrives as TIMESTAMP_NTZ. Normalize to
            # TimestampType so epoch math (unix_millis etc.) analyzes; with
            # session tz pinned to UTC (conf.py) the NTZ->LTZ cast maps the
            # naive wall time to the identical instant DuckDB's reader
            # yields, so oracle epoch math still agrees to the microsecond.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    if where is not None:
        df = df.where(where)
    if columns:
        df = df.select(*columns)
    return df


#: (session id, analyzed-plan semanticHash) -> partition-count estimate.
#: Plan METADATA only (how many splits a scan yields), never row data or
#: query results — the same class of information Spark's own
#: FileStatusCache keeps per session. Bounded: one small int per distinct
#: plan shape per process.
_FANOUT_PARTS_MEMO: dict[tuple[int, int], int] = {}


def _conf_bytes(v: str) -> int:
    """Parse a Spark byte-size conf value ('128m', '4194304b', '1g')."""
    m = re.fullmatch(r"(\d+)([kmgtp]?)b?", v.strip().lower())
    if not m:
        raise ValueError(v)
    return int(m.group(1)) * 1024 ** "_kmgtp".index(m.group(2) or "_")


def _estimated_scan_splits(df: DataFrame) -> int | None:
    """Estimate the scan split count of a file-backed frame WITHOUT
    invoking the physical planner.

    ``df.rdd.getNumPartitions()`` answers this exactly but runs full
    physical planning + RDD DAG construction of the whole subtree —
    ~100 ms of driver time per call (measured, guide §7.3 class), paid
    inside every timed query that calls :func:`fan_out`. The estimate
    instead lists the frame's input files (analysis-only metadata call)
    and replays Spark's split formula (``FilePartition``: splits ≈
    ceil((Σ size_i + openCost·n_files) / maxSplitBytes)). Local-path
    files only — any remote URI, empty listing (e.g. a localCheckpoint
    or createDataFrame leaf) or stat failure returns None and the
    caller falls back to the exact path. The estimate ignores
    upstream exchanges (a post-shuffle frame reports its scan's
    splits); every call site hands in a scan+projection, and a wrong
    answer only toggles a round-robin spread of an input that small —
    never correctness.
    """
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — e.g. streaming frame
        return None
    if not files:
        return None
    sizes = []
    for uri in files:
        if uri.startswith("file:"):
            path = unquote(urlparse(uri).path)
        elif "://" in uri:
            return None                      # remote FS: can't stat cheaply
        else:
            path = uri
        try:
            sizes.append(os.path.getsize(path))
        except OSError:
            return None
    conf = df.sparkSession.conf
    try:
        max_part = _conf_bytes(conf.get(
            "spark.sql.files.maxPartitionBytes", "128m"))
        open_cost = _conf_bytes(conf.get(
            "spark.sql.files.openCostInBytes", "4m"))
    except ValueError:
        return None
    default_par = df.sparkSession.sparkContext.defaultParallelism
    try:
        # no default arg: Spark 4 validates a default against the conf's
        # requirement (rejects "0" / "" for this positive-int conf)
        min_num = int(conf.get("spark.sql.files.minPartitionNum")
                      or default_par)
    except Exception:  # noqa: BLE001 — unset optional conf
        min_num = default_par
    # FilePartition.maxSplitBytes: bytesPerCore over openCost-padded
    # totals, clamped to [openCost, maxPartitionBytes]
    padded = sum(sizes) + open_cost * len(sizes)
    split = min(max_part, max(open_cost, padded // max(min_num, 1)))
    # FilePartition.getFilePartitions: slice each file into <=split
    # pieces (size DESC), then pack — a partition closes when adding
    # the next piece's BYTES would exceed split; each packed piece
    # accrues openCost padding toward the running size.
    pieces: list[int] = []
    for s in sorted(sizes, reverse=True):
        while s > split:
            pieces.append(split)
            s -= split
        if s > 0:
            pieces.append(s)
    n, cur = 0, 0
    for p in pieces:
        if n == 0 or cur + p > split:
            n += 1
            cur = 0
        cur += p + open_cost
    return max(1, n)


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Spread a CPU-heavy narrow stage across all cores.

    Parallelism of a narrow (shuffle-free) stage is fixed by the scan's
    split count. At 100 TB a table is thousands of splits and this is a
    no-op; at test scale a 5 k-row table is ONE parquet split, so a
    compute-dense projection chain (shingling, md5 minhashing, vector
    quantization, Arrow decode) would otherwise run on a single core of
    local[32]. Round-robin repartition only when the input has fewer
    partitions than the target (default: sparkContext.defaultParallelism)
    — the shuffle moves the small input once, and the expensive
    expressions stay ABOVE the exchange (Catalyst's column pruning pushes
    attributes, not computation, through a Repartition), so the heavy
    work lands on every core.

    The partition count is read through a memoized file-size estimate
    (:func:`_estimated_scan_splits`) rather than
    ``df.rdd.getNumPartitions()``: the exact check runs the physical
    planner over the subtree on the driver (~100 ms/call, guide §7.3),
    which dominated sub-second queries that fan out two or three
    inputs. The decision is identical — both compare the scan's split
    count against the target — and the memo key is the analyzed plan's
    ``semanticHash``, so repeated constructions of the same query
    (bench warm-up + repeats) pay the estimate once.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        key = (id(spark), df.semanticHash())
    except Exception:  # noqa: BLE001 — unanalyzable: size it the slow way
        key = None
    if key is not None and key in _FANOUT_PARTS_MEMO:
        n = _FANOUT_PARTS_MEMO[key]
    else:
        n = _estimated_scan_splits(df)
        if n is None:
            n = df.rdd.getNumPartitions()
        if key is not None:
            _FANOUT_PARTS_MEMO[key] = n
    if n >= target:
        return df
    return df.repartition(target)


def write_partitioned(df: DataFrame, path: str, partition_by: list[str],
                      mode: str = "overwrite") -> None:
    """Write a day-partitioned table (all reference tables are
    PARTITIONED BY days(datetime); bronze_load_raw_data.py:62)."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def overwrite_partitions(df: DataFrame, path: str, partition_by: list[str],
                         format: str = "auto") -> None:
    """Dynamic partition overwrite (S10): replaces only partitions present
    in ``df`` — the gold layer's idempotent recovery unit
    (reference gold_user_daily_metrics.py:104 `.overwritePartitions()`).

    ``format="log"`` (or auto-detection of an existing LogTable at
    ``path``) routes to the transactional commit-log implementation —
    one atomic commit instead of an in-place directory rewrite.
    """
    from w_userflow_featurestore_spark.sources.lakehouse import LogTable
    if format == "log" or (format == "auto" and LogTable.is_log_table(path)):
        LogTable.create(df.sparkSession, path, partition_by) \
            .overwrite_partitions(df)
        return
    (df.write.mode("overwrite")
       .option("partitionOverwriteMode", "dynamic")
       .partitionBy(*partition_by)
       .parquet(path))


def write_bucketed(df: DataFrame, table: str, keys: list[str],
                   buckets: int = 32, path: str | None = None,
                   sort: bool = True, mode: str = "overwrite") -> None:
    """Write a bucketed (hash-clustered) parquet table.

    Bucketing pre-partitions data by ``hash(keys) % buckets`` at WRITE
    time, so every later join or aggregation on ``keys`` between
    co-bucketed tables plans with ZERO exchanges — the shuffle is paid
    once at ingest instead of per query. This is the standard layout for
    a 100 TB fact table that joins repeatedly on the same key (events x
    sessions on user_id, documents x signatures on doc_id): at that scale
    a sort-merge join's two full shuffles dominate the query, and
    bucketing removes both (sortBy additionally removes the per-query
    Sort). Spark only attaches bucketing metadata through the catalog, so
    this writes a TABLE (``saveAsTable``), not a bare path; pass ``path``
    to control file placement (external table).
    """
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def _delete_partition_dirs(target_path: str, partition_by: list[str],
                           part_rows: list[dict]) -> None:
    """Remove the Hive partition directories matching ``part_rows``.

    Matching parses each dir segment (unquote + null sentinel) and
    compares through :func:`lakehouse._part_matches` — the same
    formatting/coercion rules the pruning layer uses — instead of
    re-implementing Spark's dir-name escaping for the write direction.
    Local-filesystem paths only, like the rest of the plain-parquet
    fallback (the transactional LogTable format owns remote/production
    storage and deletes by commit, not by directory).
    """
    import shutil
    from urllib.parse import unquote

    from w_userflow_featurestore_spark.sources.lakehouse import _part_matches

    cands = [target_path]
    for col in partition_by:            # walk nested hive levels in order
        nxt = []
        for base in cands:
            try:
                segs = os.listdir(base)
            except FileNotFoundError:
                continue
            nxt.extend(os.path.join(base, seg) for seg in segs
                       if seg.startswith(f"{col}="))
        cands = nxt
    for d in cands:
        vals: dict = {}
        for seg in os.path.relpath(d, target_path).split(os.sep):
            c, v = seg.split("=", 1)
            vals[c] = (None if v == "__HIVE_DEFAULT_PARTITION__"
                       else unquote(v))
        for row in part_rows:
            if all(_part_matches(vals[c], row[c]) for c in partition_by):
                shutil.rmtree(d, ignore_errors=True)
                break


def merge_upsert(spark: SparkSession, target_path: str, staged: DataFrame,
                 keys: list[str], partition_by: list[str],
                 format: str = "auto") -> None:
    """MERGE INTO semantics (S9), format-dispatched.

    Reference: silver stages sessions as a temp view and MERGEs on the full
    session key — matched rows updated, new rows inserted
    (silver_user_session_events.py:146-186).

    ``format="log"`` (or auto-detection of a LogTable at ``target_path``)
    uses the transactional commit-log format: file-granular copy-on-write
    with an atomic commit (sources/lakehouse.py). The plain-parquet
    fallback gets the same end state idempotently by rewriting only the
    partitions the staged rows touch:

      new_target_partition = staged ∪ (target_partition ⟕anti staged on keys)

    The rewrite is scoped to affected partitions (same recovery unit as the
    reference's day partitions), so repeated runs converge.
    """
    from w_userflow_featurestore_spark.sources.lakehouse import LogTable
    if format == "log" or (format == "auto"
                           and LogTable.is_log_table(target_path)):
        LogTable.create(spark, target_path, partition_by) \
            .merge(staged, keys)
        return
    try:
        target = spark.read.parquet(target_path)
    except Exception:
        write_partitioned(staged, target_path, partition_by)
        return
    # restrict the rewrite to partitions present in the staged batch
    parts = staged.select(*partition_by).distinct()
    skey = staged.select(*keys).distinct()
    moves_possible = not set(partition_by) <= set(keys)
    if moves_possible:
        # A staged row may MOVE a key into a different partition; the
        # key's old row then lives in a partition the staged batch does
        # not mention, and scoping the rewrite to staged partitions
        # alone would leave it alive — a duplicate key after the merge
        # (LogTable.merge is immune by construction: its victim scan is
        # file-granular on keys, partition-blind). Partitions holding a
        # matched key therefore join the rewrite set. Skipped when the
        # merge key contains every partition column: key equality then
        # pins the partition, victim partitions are necessarily staged
        # partitions, and the reference's day-keyed MERGE keeps its
        # partition-scoped scan with no extra pass over the target.
        victim_parts = (target.join(skey.hint("broadcast"), on=keys,
                                    how="left_semi")
                        .select(*partition_by).distinct())
        parts = parts.unionByName(victim_parts).distinct()
    # eqNullSafe: a NULL partition value (__HIVE_DEFAULT_PARTITION__)
    # must still match its own partition, or its non-matched rows are
    # dropped by the dynamic overwrite of that directory
    pa = parts.hint("broadcast").alias("__parts")
    cond = None
    for c in partition_by:
        eq = F.col(f"__t.{c}").eqNullSafe(F.col(f"__parts.{c}"))
        cond = eq if cond is None else (cond & eq)
    affected = target.alias("__t").join(pa, on=cond, how="left_semi")
    kept = affected.join(skey, on=keys, how="left_anti")
    kept = kept.select(*staged.columns)
    # localCheckpoint breaks lineage so the overwrite of the target files
    # cannot race the scan feeding it (read-before-overwrite hazard). Only
    # the target-derived side needs it; when the staged plan does not read
    # the target itself (the common case — runner hands in an already-
    # checkpointed frame), staged rows skip the second materialization
    # instead of being copied through executor storage twice.
    plan = staged._jdf.queryExecution().optimizedPlan().toString()
    # Plan locations print canonicalized file: URIs, so a relative /
    # symlinked / trailing-slash target_path must be canonicalized before
    # the substring match — a false negative here skips the checkpoint of
    # a target-reading staged plan and re-opens the read-before-overwrite
    # hazard. Match both the raw spelling and the canonical one.
    canon = os.path.realpath(os.path.abspath(target_path)).rstrip("/")
    if target_path in plan or canon in plan:
        merged = kept.unionByName(staged).localCheckpoint(eager=True)
    else:
        merged = kept.localCheckpoint(eager=True).unionByName(staged)
    # Dynamic overwrite replaces only partitions PRESENT in the output —
    # it cannot express "replace with nothing". A victim partition whose
    # every row was matched (its keys all moved elsewhere) has zero
    # merged rows, so its stale files would survive the write; find
    # those BEFORE the overwrite (the `parts` plan still scans the
    # pre-write target files — only `kept` is lineage-cut) and drop the
    # directories after it lands. EXCEPT (subtract) is null-safe, so
    # the NULL partition participates. A crash between the write and
    # the sweep leaves the stale rows, and re-running the same merge
    # converges: the stale keys still match, re-electing the same empty
    # victims. Both frames are partition-count-sized; the sweep never
    # runs in the keys-contain-partition case (no moves -> no emptied
    # victims possible).
    emptied = []
    if moves_possible:
        emptied = [r.asDict() for r in parts.subtract(
            merged.select(*partition_by).distinct()).collect()]
    overwrite_partitions(merged, target_path, partition_by, format="parquet")
    if emptied:
        _delete_partition_dirs(target_path, partition_by, emptied)


def compact_partitions(spark: SparkSession, path: str,
                       partition_by: list[str],
                       target_file_bytes: int = 128 * 1024 * 1024,
                       partitions: list[dict] | None = None) -> int:
    """Small-file compaction: rewrite each partition of a day-partitioned
    table into ~``target_file_bytes``-sized files. Returns the number of
    partitions rewritten.

    Streaming sinks and frequent MERGE runs accrete many small files per
    partition (every micro-batch/upsert commits at least one); at 100 TB
    the resulting scan-task explosion and namenode/list pressure dominate
    read cost, so compaction is a standing maintenance job (the same role
    Iceberg's rewrite_data_files action plays for the reference's
    tables). Per-partition rewrite keeps the unit of work (and of
    failure/recovery) identical to the pipeline's — one day partition —
    and ``overwrite_partitions`` makes each rewrite idempotent; a crash
    mid-compaction leaves untouched partitions readable and compacted
    ones complete.

    ``partitions`` narrows the sweep (e.g. yesterday only, the steady-
    state mode); None compacts every partition.
    """
    df = spark.read.parquet(path)
    if partitions is None:
        partitions = [r.asDict()
                      for r in df.select(*partition_by).distinct().collect()]
    n = 0
    for part in partitions:
        pred = None
        for k, v in part.items():
            # eqNullSafe: `col == NULL` is never true, so a plain
            # equality would silently skip the __HIVE_DEFAULT_PARTITION__
            # (NULL) partition every sweep while still counting it
            c = F.col(k).eqNullSafe(F.lit(v))
            pred = c if pred is None else (pred & c)
        chunk = df.where(pred)
        # size the output by actual partition bytes via the scan stats
        stat_bytes = (chunk._jdf.queryExecution().optimizedPlan()
                      .stats().sizeInBytes())
        n_files = max(1, int(min(stat_bytes, 2**53)
                             // target_file_bytes))
        overwrite_partitions(chunk.repartition(n_files), path, partition_by)
        n += 1
    return n
