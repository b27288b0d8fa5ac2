"""Physical-plan introspection — the audit surface for scale claims.

The reference tunes execution purely through spark-conf (AQE, shuffle
partitions, partition pruning — see `airflow/dags/silver_dag.py:176-181`,
`gold_daily_dag.py:28-33` in the reference); it never *verifies* the
resulting plan. At 100 TB a silently regressed plan (lost pushdown, an
extra shuffle, a sort-merge join that should broadcast) is the
difference between minutes and hours, so this engine makes plan shape a
testable property: every helper below reads Catalyst's chosen physical
plan off a DataFrame and answers one question a scale review would ask.

All helpers inspect `queryExecution().executedPlan()` — the plan AFTER
optimization but BEFORE adaptive re-planning kicks in at runtime, i.e.
the statically provable shape. AQE can only improve on it (coalesce
partitions, convert to broadcast at runtime), never add shuffles.
The one exception is `broadcast_hint_count`, which reads the ANALYZED
logical plan instead: explicit broadcast hints are resolved away during
planning (the physical plan shows only the resulting join strategy), so
the hint — the thing that audit checks for — is visible only upstream.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "physical_plan",
    "shuffle_count",
    "broadcast_join_count",
    "sort_merge_join_count",
    "pushed_filters",
    "read_schema_columns",
    "codegen_stage_count",
    "broadcast_hint_count",
    "assert_plan",
]


def physical_plan(df: DataFrame) -> str:
    """The executed-plan string (what ``df.explain()`` prints).

    Rendered under a raised ``spark.sql.maxMetadataStringLength`` so
    ``ReadSchema``/``PushedFilters`` print in full — at the default 100
    chars Spark truncates them with ``...``, which would make
    column-pruning assertions silently vacuous.
    """
    conf = df.sparkSession.conf
    key = "spark.sql.maxMetadataStringLength"
    prev = conf.get(key, None)
    conf.set(key, "10000")
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        conf.set(key, prev) if prev is not None else conf.unset(key)


def final_plan(df: DataFrame) -> str:
    """The FINAL adaptive plan — the plan AQE actually ran, after
    runtime re-optimization (``isFinalPlan=true``). Executes the query
    (test-scale only) because AQE finalizes per-stage at runtime: use
    this to pin claims like "AQE converts this sort-merge join to
    broadcast at this SF" that the static plan cannot show — e.g. a
    join deliberately left UNHINTED because its build side is
    SF-proportional (market_share's 3/5-of-customer frame). Only the
    "== Final Plan ==" section is returned — the string AQE renders
    also appends the initial plan, whose pre-conversion operators would
    otherwise false-positive a "no SortMergeJoin" assertion."""
    df.foreach(lambda _: None)      # cheapest full materialization
    plan = physical_plan(df)
    return plan.split("== Initial Plan ==")[0]


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of EXPLICIT broadcast hints (``F.broadcast``/``/*+ BROADCAST */``)
    in the analyzed logical plan.

    Distinguishes a hint the author FORCED from a broadcast the planner
    or AQE CHOSE: a hint overrides ``autoBroadcastJoinThreshold``, so a
    hint on an unbounded (dim- or aggregate-proportional) side is a
    scale bug even when the physical plan looks fine at test SF.
    """
    plan = df._jdf.queryExecution().analyzed().toString()
    return len(re.findall(r"ResolvedHint \(strategy=broadcast\)", plan))


def shuffle_count(df: DataFrame) -> int:
    """Number of DISTINCT shuffle exchanges in the plan.

    Counts ``Exchange hashpartitioning/rangepartitioning/SinglePartition``
    nodes; excludes ``BroadcastExchange`` (no shuffle — one-way broadcast)
    and ``ReusedExchange`` (a pointer to an exchange already counted).
    Every unit here is a full materialize-to-disk barrier at scale, so
    this is THE number a 100 TB review reads first.
    """
    plan = physical_plan(df)
    n = 0
    for line in plan.splitlines():
        s = line.lstrip(" +-:*()0-9")
        if s.startswith("Exchange "):
            n += 1
    return n


def broadcast_join_count(df: DataFrame) -> int:
    plan = physical_plan(df)
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))


def sort_merge_join_count(df: DataFrame) -> int:
    return len(re.findall(r"SortMergeJoin", physical_plan(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    """Every non-empty ``PushedFilters: [...]`` list in the plan's scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", physical_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Per-scan column lists actually read from parquet (pruning check).

    ``physical_plan`` renders with a 10k metadata limit, so scans print
    in full for any realistic width; the parse still tolerates a
    trailing ``...`` by keeping only complete ``name:type`` fields.
    """
    scans: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^\n]*)", physical_plan(df)):
        body = m.group(1).rstrip().removesuffix("...").rsplit(">", 1)[0]
        cols = [f.split(":")[0].strip()
                for f in body.split(",") if ":" in f]
        scans.append(cols)
    return scans


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans (wider = more JVM-fused work)."""
    return len(set(re.findall(r"\*\((\d+)\)", physical_plan(df))))


def assert_plan(df: DataFrame, *, max_shuffles: int | None = None,
                min_broadcast_joins: int = 0,
                max_sort_merge_joins: int | None = None,
                require_pushed: tuple[str, ...] = (),
                label: str = "") -> None:
    """One-call plan audit; raises AssertionError with the full plan text
    so a regression is diagnosable from the failure alone. ``label``
    prefixes the failure so looped pins name the query that broke."""
    problems = []
    if max_shuffles is not None and shuffle_count(df) > max_shuffles:
        problems.append(
            f"shuffles {shuffle_count(df)} > allowed {max_shuffles}")
    if broadcast_join_count(df) < min_broadcast_joins:
        problems.append(
            f"broadcast joins {broadcast_join_count(df)}"
            f" < required {min_broadcast_joins}")
    if (max_sort_merge_joins is not None
            and sort_merge_join_count(df) > max_sort_merge_joins):
        problems.append(
            f"sort-merge joins {sort_merge_join_count(df)}"
            f" > allowed {max_sort_merge_joins}")
    pushed = pushed_filters(df)
    for frag in require_pushed:
        if not any(frag in p for p in pushed):
            problems.append(f"filter not pushed to scan: {frag!r}")
    if problems:
        raise AssertionError(
            (f"{label}: " if label else "") + "; ".join(problems)
            + "\n--- plan ---\n" + physical_plan(df))
