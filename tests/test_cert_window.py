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

# Round-9 window head: the queries that MUST be certified this round —
# least-recently-certified first, then implementation-changed, then new.
ROUND_WINDOW_HEAD = [
    # the 39 queries whose latest certificate is round 6 (round-8
    # verdict item #2: after round 9 every certificate is r7-r9),
    # reconstructed from CORRECTNESS_r06 minus later re-certs, in their
    # round-6 certification order
    "event_transitions", "incremental_curate", "behavior_diversity",
    "contamination", "shipping_priority", "churn_labels",
    "time_decay_features", "big_spender_customers", "multimodal_decode",
    "multimodal_frames", "salted_user_agg", "salted_join",
    "top_docs_per_source", "duration_percentiles", "volume_shipping",
    "small_quantity_revenue", "duplicate_spans",
    "incremental_duplicate_spans", "product_profit",
    "returned_item_customers", "discount_band_revenue",
    "order_count_distribution", "user_daily", "item_daily",
    "entry_type_daily", "binge_ratio", "retention_yesterday",
    "retention_today", "dim_gap_features", "exact_dedup",
    "minhash_signatures", "minhash_lsh_pairs", "dedup_components",
    "ngram_jaccard_pairs", "simhash", "simhash_near_pairs",
    "text_profile", "corpus_language_stats", "repetition_profile",
    # implementation changed this round (re-certify; function
    # granularity per the round-8 precedent): market_share lost its
    # forced customer-side broadcast hint — the join strategy is now
    # AQE's call, a genuine plan change (round-8 ADVICE low #2);
    # quality_filter_verdict's projection gained the carry_cols
    # pass-through that quality_rule_report rides (its own output is
    # unchanged with the default, but the projection code path moved).
    # Plan-helper-only edits (plans.final_plan) and docstring edits
    # (runner ledger_dir contract) spend no slots — no query's code
    # path changed.
    "market_share", "quality_filter_verdict",
    # new this round: 9 new + 2 changed = all 11 spare slots
    "bpe_encode_persisted", "dsir_select", "dsir_select_tokens",
    "quality_rule_report", "ccnet_curate", "hard_negatives",
    "knn_label_agreement", "dedup_rate_report", "tokenizer_drift",
]


# no r7 fill this round — all 11 spare slots went to new+changed
# queries. The oldest r7 holders (pii_scrub, fingerprint_pairs,
# cardinality_sketch, semantic_dedup, line_dedup, token_surprisal, ...)
# lead the round-10 fill; their r7 certificates stay inside the 3-round
# cycle through round 10.
ROUND_WINDOW_FILL: list[str] = []

# Round-9 OVERFLOW (the round-8 verdict's sanctioned path: "keep
# round 9's new+changed count <= 11 OR flag the overflow in the window
# comment"): ten more queries landed after the 50 slots were spent —
# tfidf_top_terms, pmi_collocations, ngram_novelty,
# cross_source_overlap, quality_survivor_dedup, d4_select,
# curriculum_order, lang_id_confusion, ivf_recall_sweep,
# incremental_novelty. They hold NO driver certificate this round
# (selfcheck + per-pytest sf0.001 parity only) and MUST lead the
# round-10 window head, ahead of the changed/new block and the r7
# fill.
ROUND10_OVERFLOW_LEADS = [
    "tfidf_top_terms", "pmi_collocations", "ngram_novelty",
    "cross_source_overlap", "quality_survivor_dedup",
    "d4_select", "curriculum_order", "lang_id_confusion",
    "ivf_recall_sweep", "incremental_novelty",
]

# CYCLE-LENGTH NOTE for round 10: at 154 registered queries a 50-slot
# window can no longer complete a 3-round LRU rotation (3 x 50 = 150 <
# 154) — the steady-state cycle is now FOUR rounds, mathematically
# forced by coverage growth, not a discipline lapse. Round-10 window
# arithmetic under strict LRU: the 10 overflow leads above (never
# certified — oldest by definition), then 40 of the 46 remaining r7
# certificate holders; the 6 r7 holders that don't fit lead round 11
# alongside the r8 holders. The invariant the window test enforces is
# strict least-recently-certified ORDER — the cycle length follows
# from |queries| / WINDOW.


def test_overflow_queries_are_registered_past_the_window():
    names = list(entrymod.QUERIES)
    for q in ROUND10_OVERFLOW_LEADS:
        assert names.index(q) >= WINDOW


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
