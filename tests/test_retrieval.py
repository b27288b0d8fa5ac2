"""BM25 ranked retrieval: hand-computed scores, edge semantics, plan."""

from __future__ import annotations

import math

from w_userflow_featurestore_spark.operators.retrieval import bm25_topk
from w_userflow_featurestore_spark.plans import (
    assert_plan, physical_plan)

DOCS = [
    (1, "spark join spark window"),          # tf(spark)=2, dl=4
    (2, "join filter scan"),                 # tf(join)=1,  dl=3
    (3, "window scan filter sort"),          # no query term
    (4, ""),                                 # empty doc
]


def _expected(query, docs=DOCS, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in docs}
    dls = {i: len(w) for i, w in toks.items()}
    n, avgdl = len(docs), sum(dls.values()) / len(docs)
    dfs = {t: sum(t in w for w in toks.values()) for t in query}
    out = {}
    for i, w in toks.items():
        s, m = 0, 0
        for t in query:
            tf = w.count(t)
            if not tf:
                continue
            m += 1
            idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
            part = tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dls[i] / avgdl))
            s += math.floor(1e6 * idf * part)
        if m:
            out[i] = (m, s)
    return out


def _frame(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_hand_computation(spark):
    got = {r.doc_id: (r.matched_terms, r.score_micros)
           for r in bm25_topk(_frame(spark), ["spark", "join"]).collect()}
    assert got == _expected(["spark", "join"])


def test_bm25_ranking_and_limit(spark):
    rows = bm25_topk(_frame(spark), ["spark", "join"], k=1).collect()
    # doc 1 matches both terms incl. a rare one twice -> must rank first
    assert [r.doc_id for r in rows] == [1]


def test_bm25_unmatched_and_empty_docs_absent(spark):
    ids = {r.doc_id for r in bm25_topk(_frame(spark), ["spark"]).collect()}
    assert ids == {1}


def test_bm25_absent_term_scores_nothing(spark):
    assert bm25_topk(_frame(spark), ["zzz"]).count() == 0


def test_bm25_duplicate_query_terms_collapse(spark):
    one = bm25_topk(_frame(spark), ["spark"]).collect()
    two = bm25_topk(_frame(spark), ["spark", "spark"]).collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in two]


def test_bm25_plan_shape(spark):
    df = bm25_topk(_frame(spark), ["spark", "join"], k=10)
    # corpus-keyed shuffles: postings tf (computed twice — the skew-safe
    # df branch re-aggregates rather than window-by-term), tiny per-term
    # df agg, final per-doc sum, stats agg; df/stats sides broadcast,
    # and top-k must be a heap merge, not a global sort
    assert_plan(df, max_shuffles=5, min_broadcast_joins=2,
                max_sort_merge_joins=0)
    assert "TakeOrderedAndProject" in physical_plan(df)


def test_rrf_fuse_scores_and_missing_systems(spark):
    from w_userflow_featurestore_spark.operators.retrieval import rrf_fuse
    lex = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank long")
    sem = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank long")
    got = {r.doc_id: r for r in rrf_fuse([lex, sem], k=10).collect()}
    nanos = lambda rnk: 1_000_000_000 // (60 + rnk)  # noqa: E731
    assert got[2].rrf_nanos == nanos(2) + nanos(1)   # both systems
    assert got[2].n_systems == 2
    assert got[1].rrf_nanos == nanos(1) and got[1].n_systems == 1
    assert got[3].rrf_nanos == nanos(2)
    # doc in both systems outranks single-system docs at equal ranks
    order = sorted(got.values(), key=lambda r: (-r.rrf_nanos, r.doc_id))
    assert order[0].doc_id == 2


def test_rrf_fuse_topk_deterministic_tiebreak(spark):
    from w_userflow_featurestore_spark.operators.retrieval import rrf_fuse
    a = spark.createDataFrame([(9, 1), (4, 2)], "doc_id long, rank long")
    b = spark.createDataFrame([(4, 1), (9, 2)], "doc_id long, rank long")
    rows = rrf_fuse([a, b], k=1).collect()     # symmetric scores: tie
    assert [r.doc_id for r in rows] == [4]     # lower id wins
