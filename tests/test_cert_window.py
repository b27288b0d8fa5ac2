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

# Round-6 window head: the queries that MUST be certified this round —
# least-recently-certified first, then implementation-changed, then new.
ROUND_WINDOW_HEAD = [
    # the 21 queries that held only round-3 certificates (round-5
    # verdict item #1: every query must hold a round-4-6 certificate)
    "funnel_daily", "event_transitions", "incremental_curate",
    "behavior_diversity", "contamination", "shipping_priority",
    "user_cohort_setops", "capped_user_events", "churn_labels",
    "time_decay_features", "weighted_sample", "stratified_sample",
    "dataset_split", "customers_no_orders", "big_spender_customers",
    "multimodal_decode", "multimodal_frames", "salted_user_agg",
    "salted_join", "top_docs_per_source", "duration_percentiles",
    # implementation changed this round (re-certify): volume_shipping's
    # nation-pair pre-prune, small_quantity_revenue's broadcast-hint
    # drop, duplicate_spans' shared postings/island-merge refactor
    "volume_shipping", "small_quantity_revenue", "duplicate_spans",
    # new this round
    "incremental_duplicate_spans", "market_share", "product_profit",
    "returned_item_customers", "corpus_shuffle", "token_budget_mix",
    "leakage_safe_split", "discount_band_revenue",
    "order_count_distribution",
]


# oldest round-4 certificate holders filling the remaining 17 slots;
# the 28 round-4 holders left in the tail (pii_scrub ..
# forecast_baseline) lead the round-7 window
ROUND_WINDOW_FILL = [
    "user_daily", "item_daily", "entry_type_daily", "binge_ratio",
    "retention_yesterday", "retention_today", "dim_gap_features",
    "exact_dedup", "minhash_signatures", "minhash_lsh_pairs",
    "dedup_components", "ngram_jaccard_pairs", "simhash",
    "simhash_near_pairs", "text_profile", "corpus_language_stats",
    "repetition_profile",
]


def test_window_head_holds_the_must_certify_queries():
    names = list(entrymod.QUERIES)
    assert names[:len(ROUND_WINDOW_HEAD)] == ROUND_WINDOW_HEAD
    assert names[len(ROUND_WINDOW_HEAD):WINDOW] == ROUND_WINDOW_FILL
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
