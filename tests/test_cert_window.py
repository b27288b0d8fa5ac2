"""Certification-window bookkeeping, enforced mechanically.

The correctness driver certifies ``__spark_entry__.QUERIES``
front-to-back and stops at 50 entries; queries past the window rely on
prior-round certificates. Round 4's advice flagged that the rotation
discipline lived only in a comment — these tests make it a tracked
requirement: the window composition for the CURRENT round is pinned, so
an accidental reorder (or an oracle-less query sneaking in) fails CI
instead of silently spending a certification slot.

When rotating for a new round, update ROUND_WINDOW_HEAD deliberately —
that edit is the bookkeeping record.
"""

from __future__ import annotations

import __spark_entry__ as entrymod

WINDOW = 50

# Round-5 window head: the queries that MUST be certified this round —
# least-recently-certified first, then oracle-changed, then new.
ROUND_WINDOW_HEAD = [
    # displaced round-2 certificate holders
    "dedup_latest", "above_avg_orders", "pricing_summary",
    "revenue_by_nation", "pack_sequences", "frequent_tokens",
    # implementation or oracle changed this round (curate.py
    # shingle-once rewrite; sessionize.py gap guard; pivot n_total =
    # true row count; top-item NULLS LAST tie-break)
    "ab_test", "behavior_trigrams", "curate_corpus", "sessions",
    "event_type_pivot", "top_item_per_day", "item_continuation",
    "cohort_vs_global",
    # new this round
    "promo_revenue", "volume_shipping", "minhash_accuracy",
    "large_volume_orders", "sole_return_supplier", "idle_customer_balance",
    "top_revenue_supplier", "bulk_part_suppliers", "duplicate_spans",
    "cluster_balanced_sample", "small_quantity_revenue",
    "bracket_revenue",
]


def test_window_head_holds_the_must_certify_queries():
    names = list(entrymod.QUERIES)
    assert names[:len(ROUND_WINDOW_HEAD)] == ROUND_WINDOW_HEAD
    assert len(names) >= WINDOW


def test_every_query_has_an_oracle():
    # rows-only queries are allowed by the driver contract but each one
    # permanently weakens a certification row — adding one must be a
    # deliberate decision recorded here (currently: none)
    names = set(entrymod.QUERIES)
    oracles = set(entrymod.oracle_sql())
    assert names == oracles


def test_no_duplicate_query_names():
    names = list(entrymod.QUERIES)
    assert len(names) == len(set(names))
