"""Contamination-check semantics: exact copies, partial overlap,
clean docs, hashed vs raw join keys, threshold flagging."""

import pytest

from bdq_spark.operators import contamination_check


@pytest.fixture()
def corpora(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "machine learning models need large clean datasets"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [
            # verbatim copy of train doc 1 -> ratio 1.0
            (100, "the quick brown fox jumps over the lazy dog"),
            # shares a prefix with train doc 2: 4 of its 6 shingles
            (101, "machine learning models need large clean pastures today"),
            # disjoint vocabulary -> ratio 0.0
            (102, "seven purple umbrellas floated silently downstream"),
            # short doc (< n words): single full-string shingle, not in train
            (103, "hello world"),
        ],
        "doc_id long, text string",
    )
    return train, test


def test_overlap_ratios_and_flag(spark, corpora):
    train, test = corpora
    out = {
        r.doc_id: r
        for r in contamination_check(train, test, threshold=0.8).collect()
    }
    assert out[100].overlap_ratio == 1.0 and out[100].contaminated
    assert out[100].n_shingles == out[100].n_overlap == 7
    assert 0.0 < out[101].overlap_ratio < 0.8 and not out[101].contaminated
    assert out[102].overlap_ratio == 0.0 and not out[102].contaminated
    assert out[103].n_shingles == 1 and out[103].n_overlap == 0
    assert len(out) == 4


def test_hashed_and_raw_keys_agree(spark, corpora):
    train, test = corpora
    hashed = sorted(
        map(tuple, contamination_check(train, test, hash_join_keys=True).collect())
    )
    raw = sorted(
        map(tuple, contamination_check(train, test, hash_join_keys=False).collect())
    )
    assert hashed == raw


def test_threshold_validation(spark, corpora):
    train, test = corpora
    with pytest.raises(ValueError, match="threshold"):
        contamination_check(train, test, threshold=1.5)


def test_planted_near_dups_detected(spark):
    """documents.parquet contains planted near-dup pairs; splitting the
    corpus must surface cross-split planted copies as contaminated."""
    from bdq_spark.operators import hash_split
    from bdq_spark.sources import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    split = hash_split(docs, {"train": 0.8, "test": 0.2}, ["doc_id"])
    train = split.filter(F.col("split") == "train").drop("split")
    test = split.filter(F.col("split") == "test").drop("split")
    out = contamination_check(train, test, n=3, threshold=0.8)
    rows = out.collect()
    assert len(rows) == test.count()
    # at least one planted near-dup pair straddles the 80/20 split
    assert any(r.contaminated for r in rows)
    # but contamination is the exception, not the rule
    frac = sum(r.contaminated for r in rows) / len(rows)
    assert frac < 0.5


def test_weighted_overlap_discounts_boilerplate(spark):
    """A test doc sharing only a common boilerplate phrase scores far
    lower weighted than flat; a doc copying rare content scores higher."""
    boiler = "all rights reserved contact us for details"
    train = spark.createDataFrame(
        [(i, f"{boiler} article number {i} about topic {i}") for i in range(20)]
        + [(99, "the secret benchmark answer is forty two exactly")],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [
            (200, f"{boiler} totally new original writing here today"),
            (201, "the secret benchmark answer is forty two exactly"),
        ],
        "doc_id long, text string",
    )
    flat = {
        r.doc_id: r for r in contamination_check(train, test, threshold=0.5).collect()
    }
    wtd = {
        r.doc_id: r
        for r in contamination_check(
            train, test, threshold=0.5, weighted=True
        ).collect()
    }
    # boilerplate doc: weighted ratio well below flat ratio
    assert wtd[200].overlap_ratio < flat[200].overlap_ratio
    # counts are identical between modes
    assert (wtd[200].n_shingles, wtd[200].n_overlap) == (
        flat[200].n_shingles, flat[200].n_overlap
    )
    # verbatim rare copy: both modes saturate
    assert flat[201].overlap_ratio == 1.0 and wtd[201].overlap_ratio == 1.0
    assert wtd[201].contaminated


def test_weighted_and_flat_agree_when_df_uniform(spark):
    """With every train shingle appearing in exactly one doc, weights are
    constant, so hit-weight ratio == flat ratio for fully-hit or
    fully-missed docs."""
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    flat = contamination_check(train, test).collect()[0]
    wtd = contamination_check(train, test, weighted=True).collect()[0]
    assert flat.overlap_ratio == wtd.overlap_ratio == 1.0


def test_contamination_spans_exact_intervals(spark):
    """Hand-checkable span geometry: one leaked passage in the middle of
    a test doc -> exactly one merged span covering its tokens."""
    from bdq_spark.operators import contamination_spans

    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    # tokens 0..11; "quick brown fox jumps over" occupies tokens 3..7
    test = spark.createDataFrame(
        [
            (10, "aaa bbb ccc quick brown fox jumps over ddd eee fff ggg"),
            (11, "nothing here matches anything in training at all"),
        ],
        "doc_id long, text string",
    )
    spans = {r.doc_id: r for r in contamination_spans(train, test).collect()}
    assert set(spans) == {10}
    s = spans[10]
    # hit 3-grams start at pos 3,4,5 -> island covers [3, 5+2] = [3, 7]
    assert (s.span_start, s.span_end, s.span_n_tokens) == (3, 7, 5)


def test_contamination_spans_merge_and_short_docs(spark):
    from bdq_spark.operators import contamination_spans

    train = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta"), (3, "hi yo")],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [
            # two hits with a gap > n stay separate islands:
            # "alpha beta gamma" at 0..2, "delta epsilon zeta" at 7..9
            (20, "alpha beta gamma x1 x2 x3 x4 delta epsilon zeta"),
            # short doc (< n tokens) matching a short train doc entirely
            (21, "hi yo"),
        ],
        "doc_id long, text string",
    )
    spans = sorted(
        (r.doc_id, r.span_start, r.span_end) for r in
        contamination_spans(train, test).collect()
    )
    assert spans == [(20, 0, 2), (20, 7, 9), (21, 0, 1)]

    # min_span_tokens prunes the 2-token span
    pruned = sorted(
        (r.doc_id, r.span_start, r.span_end) for r in
        contamination_spans(train, test, min_span_tokens=3).collect()
    )
    assert pruned == [(20, 0, 2), (20, 7, 9)]
