"""SparkSession construction with scale-oriented defaults.

The reference tunes AQE + shuffle partitions via spark-submit conf
(reference: airflow/dags/silver_dag.py:171-181, gold_daily_dag.py:23-33).
Here the same knobs live in one builder so every entry point — tests,
bench, driver — gets identical, scale-ready settings.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the local[N] test harness; on a real cluster the same
# code runs with whatever --conf the submitter provides (getOrCreate reuses).
_DEFAULTS = {
    # AQE: runtime re-planning, partition coalescing, skew-join splitting.
    # (reference enables the same flags: silver_dag.py:177-179, gold_daily_dag.py:29-31)
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Runtime Bloom-filter join pruning: on a selective shuffle join,
    # Spark builds a Bloom filter from the small side and pre-filters
    # the big side BEFORE its shuffle — a major IO/shuffle saver at
    # 100 TB. Injection conditions (scan-size and selectivity
    # estimates) only materialize at real scale; at fixture scale the
    # rule declines and the conf is inert, so enabling is pure upside.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Join strategy (guide §3.1/§9): let the planner choose shuffled-
    # hash over sort-merge when its build-side size conditions hold
    # (measured round 12: 1.2-1.7x on this engine's equi-join shapes —
    # the sort dominates small-to-mid per-partition builds), and let
    # AQE convert SMJ->SHJ at runtime from ACTUAL post-shuffle
    # partition sizes (64m per-partition build ceiling — conservative
    # against executor heaps; sort-merge remains the fallback whenever
    # either check fails, so the spill-graceful path is never lost).
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
    # Arrow for the few pandas-UDF extension ops (multimodal / ANN refine).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp semantics for oracle parity: DuckDB reads the
    # parquet TIMESTAMP as naive; interpreting it as UTC makes epoch math agree.
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.shuffle.partitions": "32",
    # The fixture parquet stores TIMESTAMP(NANOS) which Spark's vectorized
    # reader rejects; read as nanosecond longs and convert in the reader
    # (sources/parquet.py normalizes to TimestampType at micro precision,
    # matching what DuckDB's reader does).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Classic (non-ANSI) SQL semantics: NULL on bad casts etc. All divisions
    # in this library are explicitly guarded, so either mode is correct, but
    # classic matches the reference's Spark 3.5 behavior exactly.
    "spark.sql.ansi.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
    # Driver heap for self-built local[N] sessions. Local mode runs every
    # executor thread inside the driver JVM, so the default ~1g heap is the
    # whole engine's memory; 8g gives shuffle/window spill buffers headroom
    # in the 128 GiB sandbox. Honored only at JVM launch (pyspark passes it
    # to spark-submit) — a getOrCreate() against a live JVM ignores it, and
    # cluster submitters override it with their own --conf as usual.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(app_name: str = "w-userflow-featurestore-spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[N]`` where N = $SPARK_GRAFT_CPUS or '*'.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is None:
        master = "local[*]"
    builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
