"""Contamination-check semantics and broadcast plan shape."""

from __future__ import annotations

from w_userflow_featurestore_spark.operators.contamination import (
    contamination_check)
from w_userflow_featurestore_spark.plans import assert_plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_overlap_counts_and_flag(spark):
    corpus = _docs(spark, [
        # 6 words -> 2 distinct 5-grams; first one appears in eval doc
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "one two three four five six"),       # zero overlap
    ])
    eval_set = _docs(spark, [
        (100, "alpha beta gamma delta epsilon outro")])
    got = {r.doc_id: r for r in
           contamination_check(corpus, eval_set, n=5).collect()}
    assert (got[1].total_ngrams, got[1].hit_ngrams) == (2, 1)
    assert got[1].contamination_ratio == 0.5 and got[1].contaminated == 1
    assert (got[2].hit_ngrams, got[2].contaminated) == (0, 0)


def test_short_docs_compare_whole_text(spark):
    corpus = _docs(spark, [(1, "tiny doc"), (2, "other text")])
    eval_set = _docs(spark, [(100, "tiny doc")])
    got = {r.doc_id: r.hit_ngrams for r in
           contamination_check(corpus, eval_set, n=5).collect()}
    assert got == {1: 1, 2: 0}


def test_flag_threshold_boundary(spark):
    # 10 distinct grams, 1 hit, flag_ratio 0.1 -> 1 >= 10*0.1 flags
    words = [f"w{i}" for i in range(14)]           # 10 5-grams
    corpus = _docs(spark, [(1, " ".join(words))])
    eval_set = _docs(spark, [(100, " ".join(words[:5]) + " tailword")])
    (row,) = contamination_check(corpus, eval_set, n=5).collect()
    assert (row.total_ngrams, row.hit_ngrams) == (10, 1)
    assert row.contaminated == 1


def test_eval_side_broadcasts_corpus_never_shuffles_grams(spark):
    corpus = _docs(spark, [(1, "a b c d e f")])
    eval_set = _docs(spark, [(2, "a b c d e")])
    # gram join must be broadcast; the corpus side's only key shuffle is
    # the per-doc agg — the others are the distinct over the tiny
    # eval-side gram set and fan_out's small-input round-robin spread
    # (a no-op at real scan sizes), neither of which moves corpus grams
    assert_plan(contamination_check(corpus, eval_set),
                max_shuffles=3, min_broadcast_joins=1,
                max_sort_merge_joins=0)
