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

# Round-8 window head: the queries that MUST be certified this round —
# least-recently-certified first, then implementation-changed, then new.
ROUND_WINDOW_HEAD = [
    # the 39 queries that held only round-5 certificates (round-7
    # verdict item #1: after round 8 every certificate is r6-r8)
    "ab_test", "behavior_trigrams", "curate_corpus", "sessions",
    "event_type_pivot", "top_item_per_day", "item_continuation",
    "cohort_vs_global", "promo_revenue", "minhash_accuracy",
    "large_volume_orders", "sole_return_supplier",
    "idle_customer_balance", "top_revenue_supplier",
    "bulk_part_suppliers", "cluster_balanced_sample", "bracket_revenue",
    "doc_chunks", "ann_cosine_topk", "ann_lsh_bucket", "ann_lsh_topk",
    "ann_ivf_topk", "ann_recall_gate", "vocab_coverage",
    "volume_anomaly", "embedding_near_pairs", "embedding_dedup",
    "asof_features", "interval_features", "event_rollup", "event_cube",
    "doc_fingerprints", "rolling_user_features", "event_time_windows",
    "event_sliding_windows", "session_windows", "training_set",
    "bm25_topk", "hybrid_search",
    # implementation changed this round (re-certify). FUNCTION
    # granularity: round 7's whole-module rule answered a cross-cutting
    # sampling.py refactor; round 8's sampling.py edits are local to
    # temperature_mix_weights (new raise_error guard in the plan) and
    # incremental_leakage_split (factored into merge_component_ledger),
    # and only 11 slots remain after the 39 r5 holders — spending 12 on
    # untouched hash-threshold projections would age an r5 certificate
    # past the 3-round cycle. hll_union_rollup (per-event-type rollup)
    # and market_share (three markets) are the round-7 verdict #6
    # widenings. Docstring-only edits (leakage_safe_split schema note)
    # do NOT spend slots — no code path changed.
    "hll_union_rollup", "market_share", "mixture_weights",
    "incremental_leakage_split",
    # new this round
    "bpe_merges", "bpe_encode", "bigram_surprisal",
    "perplexity_buckets", "dsir_importance", "quality_filter_verdict",
]


# oldest round-6 certificate holder filling the remaining slot (five
# went to new queries); the round-6 holders left in the tail
# (event_transitions .. repetition_profile) lead the round-9 window
ROUND_WINDOW_FILL = [
    "funnel_daily",
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
