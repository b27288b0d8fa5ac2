"""Repetition-profile semantics and zero-shuffle plan shape."""

from __future__ import annotations

from w_userflow_featurestore_spark.operators.text import repetition_profile
from w_userflow_featurestore_spark.plans import assert_plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_counts_fractions_and_flag(spark):
    got = {r.doc_id: r for r in repetition_profile(_docs(spark, [
        (1, "a a a b c"),                       # heavy repetition
        (2, "one two three four five six seven eight nine ten"),
    ])).collect()}
    r1 = got[1]
    assert (r1.n_words, r1.n_distinct_words) == (5, 3)
    assert r1.distinct_word_ratio == 0.6
    assert r1.top_word_frac == 0.6              # "a" x3 / 5
    assert r1.top_bigram_frac == 0.5            # "a a" x2 / 4
    assert r1.repetitive == 1
    r2 = got[2]
    assert (r2.distinct_word_ratio, r2.top_word_frac) == (1.0, 0.1)
    assert r2.repetitive == 0


def test_single_word_doc_has_no_bigrams(spark):
    (row,) = repetition_profile(_docs(spark, [(1, "solo")])).collect()
    assert (row.n_words, row.top_bigram_frac) == (1, 0.0)
    assert row.top_word_frac == 1.0 and row.repetitive == 1


def test_flag_uses_unrounded_fractions(spark):
    # 9 distinct words + "x" dominant: top_word = 3/11 > 0.2 flags even
    # though every other signal is clean
    text = "x x x w1 w2 w3 w4 w5 w6 w7 w8"
    (row,) = repetition_profile(_docs(spark, [(1, text)])).collect()
    assert row.top_word_frac == 0.2727 and row.repetitive == 1


def test_plan_is_zero_shuffle_projection(spark):
    assert_plan(repetition_profile(_docs(spark, [(1, "a b c")])),
                max_shuffles=0, max_sort_merge_joins=0)
