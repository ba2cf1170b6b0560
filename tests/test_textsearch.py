"""Inverted-index retrieval (operators/textsearch.py): postings truth,
boolean AND/OR semantics vs set algebra, BM25 vs a straight-from-the-
formula Python reference."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from bdq_spark.operators.textsearch import (
    bm25_search,
    boolean_search,
    build_inverted_index,
    tokenize_docs,
)

DOCS = [
    Row(doc_id=1, text="spark joins hash tables fast"),
    Row(doc_id=2, text="hash hash hash collision"),
    Row(doc_id=3, text="merge sort joins runs; merge again"),
    Row(doc_id=4, text="nothing relevant here at all"),
    Row(doc_id=5, text="hash joins and merge joins compared"),
]


def _tok(text):
    import re

    return [t for t in re.split("[^a-z0-9]+", text.lower()) if t]


@pytest.fixture()
def index(spark):
    df = spark.createDataFrame(DOCS)
    postings, stats = build_inverted_index(df)
    return postings.localCheckpoint(), stats.localCheckpoint()


def test_postings_and_lengths_exact(spark, index):
    postings, stats = index
    py_tf: dict = {}
    py_dl: dict = {}
    for d in DOCS:
        toks = _tok(d.text)
        py_dl[d.doc_id] = len(toks)
        for t in toks:
            py_tf[(t, d.doc_id)] = py_tf.get((t, d.doc_id), 0) + 1
    assert {(r.token, r.doc_id): r.tf for r in postings.collect()} == py_tf
    assert {r.doc_id: r.dl for r in stats.collect()} == py_dl


def test_boolean_and_or(spark, index):
    postings, _ = index
    got_and = {r.doc_id for r in boolean_search(postings, ["hash", "joins"]).collect()}
    assert got_and == {1, 5}
    got_or = {
        r.doc_id
        for r in boolean_search(postings, ["hash", "merge"], mode="or").collect()
    }
    assert got_or == {1, 2, 3, 5}
    # duplicate query tokens must not change AND semantics
    dup = {
        r.doc_id
        for r in boolean_search(postings, ["hash", "hash", "joins"]).collect()
    }
    assert dup == got_and
    with pytest.raises(ValueError):
        boolean_search(postings, [])
    with pytest.raises(ValueError):
        boolean_search(postings, ["x"], mode="xor")


def _py_bm25(query, k1=1.2, b=0.75):
    tf: dict = {}
    dl: dict = {}
    for d in DOCS:
        toks = _tok(d.text)
        dl[d.doc_id] = len(toks)
        for t in toks:
            tf.setdefault(t, {}).setdefault(d.doc_id, 0)
            tf[t][d.doc_id] += 1
    n = len(DOCS)
    avgdl = sum(dl.values()) / n
    scores: dict = {}
    for t in query:
        if t not in tf:
            continue
        df_t = len(tf[t])
        idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
        for doc, f in tf[t].items():
            part = idf * f / (f + k1 * ((1 - b) + b * dl[doc] / avgdl))
            scores[doc] = scores.get(doc, 0.0) + round(part, 9)
    return {d: round(s, 6) for d, s in scores.items()}


def test_bm25_matches_python_reference(spark, index):
    postings, stats = index
    got = {
        r.doc_id: r.score
        for r in bm25_search(postings, stats, ["hash", "merge"], top_k=10).collect()
    }
    want = _py_bm25(["hash", "merge"])
    assert got == want
    # rarer term dominates: doc 3 (two merges, rare term) must beat
    # doc 1 (one hash, common term)
    assert got[3] > got[1]


def test_bm25_top_k_and_tie_order(spark, index):
    postings, stats = index
    rows = bm25_search(postings, stats, ["joins"], top_k=2).collect()
    assert len(rows) == 2
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # absent query token: no crash, empty result
    assert bm25_search(postings, stats, ["zzzmissing"], top_k=5).count() == 0


def test_phrase_search_counts(spark):
    from bdq_spark.operators.textsearch import (
        build_positional_index,
        phrase_search,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="hash join beats hash join here"),
            Row(doc_id=2, text="join hash is reversed"),
            Row(doc_id=3, text="hash, join! punctuation still adjacent"),
            Row(doc_id=4, text="hash x join not adjacent"),
        ]
    )
    idx = build_positional_index(docs)
    got = {r.doc_id: r.n_occ for r in phrase_search(idx, ["hash", "join"]).collect()}
    assert got == {1: 2, 3: 1}
    # three-token phrase
    got3 = {
        r.doc_id: r.n_occ
        for r in phrase_search(idx, ["hash", "join", "beats"]).collect()
    }
    assert got3 == {1: 1}
    import pytest as _p

    with _p.raises(ValueError):
        phrase_search(idx, [])
