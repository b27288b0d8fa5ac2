"""Declarative data-quality constraint checking (Deequ-style).

The reference's quality gate is a file-count proxy
(airflow/dags/gold_daily_dag.py:11,63 — ">=140 parquet files/day");
production feature stores run CONTENT constraints: completeness,
uniqueness, domain membership, bounds. This operator evaluates a whole
constraint suite in ONE aggregation pass over the table — the same
one-pass discipline as runner.py's observe() diagnostics — and emits
one row per constraint with its violation count, so the report is both
human-readable and joinable into alerting.

Scale shape: every constraint compiles to an algebraic aggregate
(conditional counts; uniqueness = count - countDistinct), so the whole
suite is a single hash-aggregate with map-side partial combine — one
scan of 100 TB regardless of how many rules run. The per-rule fan-out
happens on the 1-row aggregate via a row-local array explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> dict:
    return {"rule": f"{col}_not_null", "col": col, "kind": "not_null"}


def unique(col: str) -> dict:
    return {"rule": f"{col}_unique", "col": col, "kind": "unique"}


def bounds(col: str, lo=None, hi=None) -> dict:
    return {"rule": f"{col}_bounds", "col": col, "kind": "bounds",
            "lo": lo, "hi": hi}


def in_set(col: str, values: list) -> dict:
    return {"rule": f"{col}_in_set", "col": col, "kind": "in_set",
            "values": list(values)}


def min_rows(n: int) -> dict:
    return {"rule": "min_rows", "col": "*", "kind": "min_rows", "n": n}


def _violations(rule: dict):
    kind = rule["kind"]
    c = F.col(rule["col"]) if rule["col"] != "*" else None
    if kind == "not_null":
        return F.coalesce(F.sum(F.when(c.isNull(), 1)), F.lit(0))
    if kind == "unique":
        # duplicates among non-null values; NULLs are not_null's job
        return F.count(c) - F.countDistinct(c)
    if kind == "bounds":
        cond = F.lit(False)
        if rule["lo"] is not None:
            cond = cond | (c < rule["lo"])
        if rule["hi"] is not None:
            cond = cond | (c > rule["hi"])
        return F.coalesce(F.sum(F.when(cond, 1)), F.lit(0))
    if kind == "in_set":
        bad = c.isNotNull() & ~c.isin(rule["values"])
        return F.coalesce(F.sum(F.when(bad, 1)), F.lit(0))
    if kind == "min_rows":
        return F.greatest(F.lit(rule["n"]) - F.count(F.lit(1)), F.lit(0))
    raise ValueError(f"unknown constraint kind: {kind}")


def quality_report(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate ``rules`` in one scan; one output row per rule:
    (rule, col, n_violations, passed). A rule passes iff its violation
    count is zero — min_rows reports the shortfall as the count."""
    agged = df.agg(*[_violations(r).cast("long").alias(f"_m{i}")
                     for i, r in enumerate(rules)])
    entries = F.array(*[
        F.struct(F.lit(r["rule"]).alias("rule"),
                 F.lit(r["col"]).alias("col"),
                 F.col(f"_m{i}").alias("n_violations"))
        for i, r in enumerate(rules)])
    return (agged.select(F.explode(entries).alias("e"))
                 .select("e.rule", "e.col", "e.n_violations",
                         (F.col("e.n_violations") == 0).cast("int")
                          .alias("passed")))
