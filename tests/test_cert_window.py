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

# Round-10 window head: the queries that MUST be certified this round.
# Composition pinned by the round-9 verdict (Next round #1):
# never-certified first, then strict least-recently-certified.
ROUND_WINDOW_HEAD = [
    # the 10 round-9 overflow queries — never driver-certified
    # (selfcheck + per-pytest sf0.001 parity + judge-run oracle_check
    # only), in the order the round-9 verdict pins
    "tfidf_top_terms", "pmi_collocations", "ngram_novelty",
    "cross_source_overlap", "quality_survivor_dedup",
    "d4_select", "curriculum_order", "lang_id_confusion",
    "ivf_recall_sweep", "incremental_novelty",
    # then the first 40 of the 46 remaining r7 certificate holders
    # (reconstructed from CORRECTNESS_r07 minus every later re-cert),
    # in their round-7 certification order
    "pii_scrub", "fingerprint_pairs", "cardinality_sketch",
    "semantic_dedup", "line_dedup", "token_surprisal",
    "item_pagerank", "distribution_drift", "bpe_pair_counts",
    "quantile_sketch", "scd2_history", "feature_backfill",
    "negative_samples", "key_skew_profile", "frequency_sketch",
    "rolling_active_users", "quality_report", "user_value_ranks",
    "cohort_retention", "item_triangles", "attribution",
    "winsorize", "target_encode", "multimodal_resize",
    "multimodal_audio_windows", "order_priority_counts",
    "forecast_baseline", "token_budget_mix", "leakage_safe_split",
    "corpus_shuffle", "dataset_split", "split_summary",
    "stratified_sample", "weighted_sample", "capped_user_events",
    "source_balanced_sample", "user_cohort_setops",
    "customers_no_orders", "tokenizer_fertility",
    "split_leakage_audit",
]


# no spare slots this round — the 10 overflow leads + 40 r7 rotations
# consume all 50. Anything added or reshaped in round 10 lands as
# flagged ROUND11_LEADS overflow below.
ROUND_WINDOW_FILL: list[str] = []

# ROUND-11 LEADS (the sanctioned overflow path, third application):
# queries that must open the round-11 window, least-recently-certified
# first. (a) the 6 r7 certificate holders the 50-slot window could not
# fit this round; (b) any query whose implementation is reshaped in
# round 10 (certificate invalidated — re-certify); (c) any query NEW
# in round 10 (never certified). Keep (b)+(c) minimal per the round-9
# verdict ("strengthen, don't grow").
ROUND11_LEADS = [
    # (a) r7 holders displaced by the 4-round cycle, r7 order
    "dedup_latest", "above_avg_orders", "pricing_summary",
    "revenue_by_nation", "pack_sequences", "frequent_tokens",
    # (b) reshaped in round 10 (round-9 verdict #3: widen the 1-row
    # certificates) — r9 holders whose OUTPUT GRAIN changed, so their
    # r9 certificates no longer describe the current query:
    # discount_band_revenue now emits one row per whole-percent
    # discount band + a ROLLUP total (was: one total row);
    # small_quantity_revenue one row per watchlist brand + 'ALL'
    # total (was: one Brand#13 row); corpus_language_stats slices by
    # labeled x predicted language (was: predicted only, 2 rows)
    "discount_band_revenue", "small_quantity_revenue",
    "corpus_language_stats",
    # (c) NEW in round 10 (round-9 verdict #5: the ExactSubstr span
    # REMOVAL — Lee et al. 2022's actual output, the rewritten corpus)
    "span_removed_corpus",
]

# CYCLE-LENGTH NOTE: at 154+ registered queries a 50-slot window
# cannot complete a 3-round LRU rotation (3 x 50 = 150 < 154) — the
# steady-state cycle is FOUR rounds, mathematically forced by coverage
# growth. The invariant the window test enforces is strict
# least-recently-certified ORDER — the cycle length follows from
# |queries| / WINDOW.
#
# ROUND-11 FILL, pre-reconstructed (the 48 r8 certificate holders =
# CORRECTNESS_r08 keys minus every r9 re-cert, in their r8
# certification order; the round-10 window head touches none of them,
# so this list is final). The 10 ROUND11_LEADS above + the FIRST 40 of
# these fill round 11's window; the last 8 lead round 12 ahead of the
# r9 holders:
#   ab_test, behavior_trigrams, curate_corpus, sessions,
#   event_type_pivot, top_item_per_day, item_continuation,
#   cohort_vs_global, promo_revenue, minhash_accuracy,
#   large_volume_orders, sole_return_supplier, idle_customer_balance,
#   top_revenue_supplier, bulk_part_suppliers, cluster_balanced_sample,
#   bracket_revenue, doc_chunks, ann_cosine_topk, ann_lsh_bucket,
#   ann_lsh_topk, ann_ivf_topk, ann_recall_gate, vocab_coverage,
#   volume_anomaly, embedding_near_pairs, embedding_dedup,
#   asof_features, interval_features, event_rollup, event_cube,
#   doc_fingerprints, rolling_user_features, event_time_windows,
#   event_sliding_windows, session_windows, training_set, bm25_topk,
#   hybrid_search, hll_union_rollup,
#   -- the 8 that do not fit (round-12 leads) --
#   mixture_weights, incremental_leakage_split, bpe_merges,
#   bpe_encode, bigram_surprisal, perplexity_buckets,
#   dsir_importance, funnel_daily


def test_round11_leads_are_registered_past_the_window():
    names = list(entrymod.QUERIES)
    for q in ROUND11_LEADS:
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
