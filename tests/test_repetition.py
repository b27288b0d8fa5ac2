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


def test_chunking_windows_and_overlap(spark):
    from w_userflow_featurestore_spark.operators.text import chunk_documents
    docs = _docs(spark, [(1, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9")])
    got = {r.chunk_id: r for r in
           chunk_documents(docs, chunk_tokens=4, overlap=2).collect()}
    # stride 2 -> starts 0,2,4,6: [0-3],[2-5],[4-7],[6-9]
    assert len(got) == 4
    assert got[0].chunk_text == "w0 w1 w2 w3"
    assert got[1].chunk_text == "w2 w3 w4 w5"
    assert got[3].chunk_text == "w6 w7 w8 w9"
    assert all(r.n_chunk_tokens == 4 for r in got.values())


def test_chunking_short_doc_and_ragged_tail(spark):
    from w_userflow_featurestore_spark.operators.text import chunk_documents
    docs = _docs(spark, [(1, "a b"), (2, "a b c d e f g h i")])  # 2 and 9
    got = {(r.doc_id, r.chunk_id): r for r in
           chunk_documents(docs, chunk_tokens=4, overlap=2).collect()}
    assert got[(1, 0)].chunk_text == "a b"         # whole short doc
    assert got[(1, 0)].n_chunk_tokens == 2
    # 9 words: starts 0,2,4,6 -> last chunk is the 3-word tail
    assert got[(2, 3)].chunk_text == "g h i"
    assert got[(2, 3)].n_chunk_tokens == 3
    assert len([k for k in got if k[0] == 2]) == 4


def test_chunking_plan_is_single_explode_no_shuffle(spark):
    from w_userflow_featurestore_spark.operators.text import chunk_documents
    # fan_out's round-robin spread is the only exchange (no-op at scale)
    assert_plan(chunk_documents(_docs(spark, [(1, "a b c")])),
                max_shuffles=1, max_sort_merge_joins=0)


def test_quality_filter_verdict_rule_attribution(spark):
    """Each rule fails in isolation on a doc constructed to violate
    exactly it, and keep is the conjunction. The short doc: 'banana
    fruit' has 2 words (< 20) but 1.0 distinct ratio and 0.5 top-word
    frac — top_word_max is exceeded too, so it fails length AND
    repetition; the repeated doc fails repetition alone."""
    from w_userflow_featurestore_spark.operators.text import (
        quality_filter_verdict,
    )
    fluent = ("the quick brown fox jumps over the lazy dog and then "
              "it runs far away to find a new home for the long cold "
              "winter that is coming soon")
    repeated = " ".join(["spam"] * 30)
    rows = [(1, fluent), (2, repeated), (3, "word another")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in quality_filter_verdict(df).collect()}
    assert got[1]["keep"] and all(
        got[1][f] for f in ("pass_length", "pass_quality",
                            "pass_repetition", "pass_lang"))
    assert not got[2]["pass_repetition"] and got[2]["pass_length"]
    assert not got[2]["keep"]
    assert not got[3]["pass_length"] and not got[3]["keep"]
