"""Sequence-packing semantics and partitioned-window plan shape."""

from __future__ import annotations

from w_userflow_featurestore_spark.operators.packing import pack_sequences
from w_userflow_featurestore_spark.plans import assert_plan


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string")


def test_offsets_packs_and_spans(spark):
    # stream en/src: 6 + 5 + 4 tokens with budget 8
    got = {r.doc_id: r for r in pack_sequences(_docs(spark, [
        (1, "en", "src", "a b c d e f"),
        (2, "en", "src", "g h i j k"),
        (3, "en", "src", "l m n o"),
        (9, "fr", "src", "x y"),               # independent stream
    ]), budget=8).collect()}
    assert (got[1].start_offset, got[1].pack_id, got[1].pack_offset,
            got[1].n_packs_spanned) == (0, 0, 0, 1)
    # doc 2 starts at 6, ends at token 10 -> spans packs 0 and 1
    assert (got[2].start_offset, got[2].pack_id, got[2].pack_offset,
            got[2].n_packs_spanned) == (6, 0, 6, 2)
    assert (got[3].start_offset, got[3].pack_id, got[3].pack_offset,
            got[3].n_packs_spanned) == (11, 1, 3, 1)
    assert (got[9].start_offset, got[9].pack_id) == (0, 0)


def test_exact_boundary_does_not_span(spark):
    # 8-token doc at offset 8 with budget 8 occupies exactly pack 1
    got = {r.doc_id: r for r in pack_sequences(_docs(spark, [
        (1, "en", "s", "a b c d e f g h"),
        (2, "en", "s", "i j k l m n o p"),
    ]), budget=8).collect()}
    assert (got[2].pack_id, got[2].pack_offset,
            got[2].n_packs_spanned) == (1, 0, 1)


def test_plan_partitions_by_stream_no_global_sort(spark):
    df = pack_sequences(_docs(spark, [(1, "en", "s", "a")]), budget=8)
    # one hash shuffle for the stream-key window; a global orderBy would
    # show a rangepartitioning exchange instead
    assert_plan(df, max_shuffles=1, max_sort_merge_joins=0)
    assert "rangepartitioning" not in df._jdf.queryExecution().executedPlan() \
        .toString().lower()
