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

# Round-11 window head: the queries that MUST be certified this round.
# Composition pinned by the round-10 verdict (Next round #1):
# the 10 ROUND11_LEADS (6 displaced r7 holders, 3 round-10 reshapes,
# 1 never-certified round-10 addition), then strict
# least-recently-certified.
ROUND_WINDOW_HEAD = [
    # the 10 round-11 leads, in the order the round-10 verdict pins:
    # (a) r7 holders displaced by the 4-round cycle, r7 order
    "dedup_latest", "above_avg_orders", "pricing_summary",
    "revenue_by_nation", "pack_sequences", "frequent_tokens",
    # (b) reshaped in round 10 (grain widened; r9 certificates no
    # longer describe the output): per-band ROLLUP, per-brand + ALL,
    # labeled x predicted
    "discount_band_revenue", "small_quantity_revenue",
    "corpus_language_stats",
    # (c) new in round 10, never driver-certified
    "span_removed_corpus",
    # then the first 40 of the 48 r8 certificate holders
    # (reconstructed from CORRECTNESS_r08 minus every r9 re-cert),
    # in their round-8 certification order — pre-reconstructed in
    # round 10's bookkeeping comment and unchanged since
    "ab_test", "behavior_trigrams", "curate_corpus", "sessions",
    "event_type_pivot", "top_item_per_day", "item_continuation",
    "cohort_vs_global", "promo_revenue", "minhash_accuracy",
    "large_volume_orders", "sole_return_supplier",
    "idle_customer_balance", "top_revenue_supplier",
    "bulk_part_suppliers", "cluster_balanced_sample",
    "bracket_revenue", "doc_chunks", "ann_cosine_topk",
    "ann_lsh_bucket", "ann_lsh_topk", "ann_ivf_topk",
    "ann_recall_gate", "vocab_coverage", "volume_anomaly",
    "embedding_near_pairs", "embedding_dedup", "asof_features",
    "interval_features", "event_rollup", "event_cube",
    "doc_fingerprints", "rolling_user_features", "event_time_windows",
    "event_sliding_windows", "session_windows", "training_set",
    "bm25_topk", "hybrid_search", "hll_union_rollup",
]


# no spare slots this round — the 10 leads + 40 r8 rotations consume
# all 50. Anything added or reshaped in round 11 lands as flagged
# ROUND12_LEADS overflow below.
ROUND_WINDOW_FILL: list[str] = []

# ROUND-12 LEADS (the sanctioned overflow path, fourth application):
# queries that must open the round-12 window, least-recently-certified
# first. (a) the 8 r8 certificate holders the 50-slot window could not
# fit this round, in their r8 certification order; (b) any query
# reshaped in round 11 (none); (c) any query NEW in round 11.
ROUND12_LEADS = [
    # (a) r8 holders displaced by the 4-round cycle, r8 order
    "mixture_weights", "incremental_leakage_split", "bpe_merges",
    "bpe_encode", "bigram_surprisal", "perplexity_buckets",
    "dsir_importance", "funnel_daily",
    # (c) NEW in round 11 (round-10 verdict #5: the incremental twin
    # of the ExactSubstr span REWRITE — the one sanctioned addition)
    "incremental_span_removed",
]

# CYCLE-LENGTH NOTE: at 154+ registered queries a 50-slot window
# cannot complete a 3-round LRU rotation (3 x 50 = 150 < 154) — the
# steady-state cycle is FOUR rounds, mathematically forced by coverage
# growth. The invariant the window test enforces is strict
# least-recently-certified ORDER — the cycle length follows from
# |queries| / WINDOW.
#
# ROUND-12 FILL, pre-reconstructed (the 47 remaining r9 certificate
# holders = CORRECTNESS_r09 keys minus the 3 reshaped queries that
# re-certify in round 11; the round-11 window head touches none of
# them, so this list is final). The ROUND12_LEADS above + the FIRST
# 50-len(leads) of these fill round 12's window; the remainder lead
# round 13 ahead of the r10 holders:
#   event_transitions, incremental_curate, behavior_diversity,
#   contamination, shipping_priority, churn_labels,
#   time_decay_features, big_spender_customers, multimodal_decode,
#   multimodal_frames, salted_user_agg, salted_join,
#   top_docs_per_source, duration_percentiles, volume_shipping,
#   duplicate_spans, incremental_duplicate_spans, product_profit,
#   returned_item_customers, order_count_distribution, user_daily,
#   item_daily, entry_type_daily, binge_ratio, retention_yesterday,
#   retention_today, dim_gap_features, exact_dedup,
#   minhash_signatures, minhash_lsh_pairs, dedup_components,
#   ngram_jaccard_pairs, simhash, simhash_near_pairs, text_profile,
#   repetition_profile, market_share, quality_filter_verdict,
#   bpe_encode_persisted, dsir_select, dsir_select_tokens,
#   quality_rule_report, ccnet_curate, hard_negatives,
#   knn_label_agreement, dedup_rate_report, tokenizer_drift


def test_round12_leads_are_registered_past_the_window():
    names = list(entrymod.QUERIES)
    for q in ROUND12_LEADS:
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
