"""Cleansing operators: dedup, null-key filtering, dimension defaults.

Reference semantics (SURVEY.md §2.2-§2.3):
- D1 keep-latest dedup     — silver_user_session_events.py:87-92
- P3 not-null key filter   — silver_user_session_events.py:95-99
- P4 UNKNOWN/zero fills    — silver_user_session_events.py:103-108
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_latest(df: DataFrame, key: list[str], order_by: list[str]) -> DataFrame:
    """Keep exactly one row per ``key``, preferring the greatest ``order_by``.

    row_number() over (partition by key order by order_by desc) == 1 —
    reference silver_user_session_events.py:87-89 (event_id keyed, latest
    utimestamptz wins). At scale this is one shuffle on ``key``; when order
    is irrelevant prefer ``dropDuplicates(key)`` (no sort).
    """
    w = Window.partitionBy(*key).orderBy(*[F.col(c).desc() for c in order_by])
    return (df.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") == 1)
              .drop("__rn"))


def drop_null_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Drop rows where any required key is NULL (conjunctive isNotNull) —
    reference silver_user_session_events.py:95-99."""
    cond = reduce(lambda a, b: a & b, (F.col(k).isNotNull() for k in keys))
    return df.where(cond)


def fill_unknown(df: DataFrame, dims: list[str], token: str = "UNKNOWN") -> DataFrame:
    """NULL dimension values -> sentinel token — reference
    silver_user_session_events.py:103-108 (platform/country/... -> UNKNOWN)."""
    return df.fillna({d: token for d in dims})
