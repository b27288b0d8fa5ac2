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

# Round-7 window head: the queries that MUST be certified this round —
# least-recently-certified first, then implementation-changed, then new.
ROUND_WINDOW_HEAD = [
    # the 28 queries that held only round-4 certificates (round-6
    # verdict item #2: after round 7 every certificate is r5-r7)
    "pii_scrub", "fingerprint_pairs", "cardinality_sketch",
    "semantic_dedup", "line_dedup", "token_surprisal", "item_pagerank",
    "distribution_drift", "bpe_pair_counts", "quantile_sketch",
    "scd2_history", "feature_backfill", "negative_samples",
    "key_skew_profile", "frequency_sketch", "rolling_active_users",
    "quality_report", "user_value_ranks", "cohort_retention",
    "hll_union_rollup", "item_triangles", "attribution", "winsorize",
    "target_encode", "multimodal_resize", "multimodal_audio_windows",
    "order_priority_counts", "forecast_baseline",
    # implementation/module changed this round (re-certify):
    # operators/sampling.py changed (token_budget_mix bucketed prefix
    # sum, leakage_safe_split cast drop + component_ledger refactor),
    # so every sampling.py-backed query re-certifies per the module
    # rule; market_share (decimal widening), user_cohort_setops and
    # customers_no_orders (de-vacuated predicates) changed in the
    # entry file. Behavior-neutral docstring/annotation edits
    # (plans/__init__.py docstring, dedup.text_hash60 annotation) do
    # NOT spend slots — no code path changed.
    "token_budget_mix", "leakage_safe_split", "corpus_shuffle",
    "dataset_split", "split_summary", "stratified_sample",
    "weighted_sample", "capped_user_events", "source_balanced_sample",
    "market_share", "user_cohort_setops", "customers_no_orders",
    # new this round
    "incremental_leakage_split", "mixture_weights",
    "tokenizer_fertility", "split_leakage_audit",
]


# oldest round-5 certificate holders filling the remaining 6 slots;
# the round-5 holders left in the tail (ab_test .. hybrid_search)
# lead the round-8 window
ROUND_WINDOW_FILL = [
    "dedup_latest", "above_avg_orders", "pricing_summary",
    "revenue_by_nation", "pack_sequences", "frequent_tokens",
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
