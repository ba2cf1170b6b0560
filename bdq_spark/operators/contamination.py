"""Benchmark / eval-set contamination detection.

Before training, every eval or benchmark document must be checked for
n-gram overlap against the training corpus (decontamination) — a
cross-corpus variant of near-dup detection: for each TEST document,
what fraction of its distinct word n-grams appears anywhere in TRAIN?

Spark-first shape (contrast the pairwise Jaccard join in
:mod:`bdq_spark.operators.dedup`, which is quadratic in candidates):

- both corpora are shingled with the shared
  :func:`bdq_spark.operators.dedup.shingle` (distinct word n-grams per
  doc);
- TRAIN collapses to a distinct shingle SET — doc identity is
  irrelevant, so the big side sheds its id column and its duplicates
  before the join;
- one LEFT JOIN test-shingles → train-set marks hits, then a per-doc
  aggregate computes the overlap ratio.  Cost: one shuffle per shingle
  stream + the join — linear, never pairwise.
- ``hash_join_keys=True`` (default) joins on ``xxhash64(shingle)``
  instead of the raw string: 8-byte fixed keys shrink shuffle width on
  a 100 TB corpus; a false hit needs a 64-bit collision between a test
  and train shingle (~2^-64 per pair — negligible, and it only nudges
  the ratio up by one shingle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Window

from bdq_spark.operators.dedup import positional_shingles, shingle

__all__ = ["contamination_check", "contamination_spans"]


def contamination_check(
    train: DataFrame,
    test: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    hash_join_keys: bool = True,
    weighted: bool = False,
) -> DataFrame:
    """Per test-document n-gram overlap against the train corpus.

    Output, one row per test document with >= 1 shingle:
    ``(id_column, n_shingles, n_overlap, overlap_ratio, contaminated)``
    where ``overlap_ratio = n_overlap / n_shingles`` (rounded to 6
    decimals) and ``contaminated = overlap_ratio >= threshold``.

    ``weighted=True`` scores by train-corpus IDF instead of flat counts:
    each test shingle weighs ``ln(1 + N / (1 + df))`` (``N`` = train doc
    count, ``df`` = train docs containing the shingle; unseen shingles
    get df=0, the HIGHEST weight) and ``overlap_ratio`` becomes
    weight-of-hit-shingles / weight-of-all-shingles.  Shared boilerplate
    then barely moves the score while copied rare content dominates it —
    the standard fix for flat overlap over-firing on formulaic text.
    ``n_shingles``/``n_overlap`` stay unweighted counts in both modes.
    The extra cost is keeping per-shingle df on the train side (one
    aggregate) and one broadcast single-row N — still strictly linear.
    """
    if not 0.0 <= threshold <= 1.0:
        raise ValueError("threshold must be in [0, 1]")

    test_sh = shingle(test, text_column, id_column, n=n)
    train_sh = shingle(train, text_column, id_column, n=n)

    key = (
        (lambda c: F.xxhash64(c)) if hash_join_keys else (lambda c: c)
    )
    probe = test_sh.select(
        F.col("id"), key(F.col("shingle")).alias("__k")
    )

    if weighted:
        # shingle() output is distinct per doc, so count(*) == doc freq
        train_set = train_sh.select(
            key(F.col("shingle")).alias("__k")
        ).groupBy("__k").agg(F.count(F.lit(1)).alias("__df"))
        n_train = train.select(
            F.count(F.lit(1)).alias("__n_train")
        )
        hit = F.col("__df").isNotNull()
        weight = F.log(
            F.lit(1.0)
            + F.col("__n_train") / (F.lit(1.0) + F.coalesce(F.col("__df"), F.lit(0)))
        )
        scored = (
            probe.join(train_set, "__k", "left")
            .join(F.broadcast(n_train))
            .groupBy(F.col("id").alias(id_column))
            .agg(
                F.count(F.lit(1)).alias("n_shingles"),
                F.sum(hit.cast("long")).alias("n_overlap"),
                F.sum(F.when(hit, weight).otherwise(F.lit(0.0))).alias("__w_hit"),
                F.sum(weight).alias("__w_all"),
            )
        )
        ratio_expr = F.col("__w_hit") / F.col("__w_all")
        return scored.select(
            id_column,
            "n_shingles",
            "n_overlap",
            F.round(ratio_expr, 6).alias("overlap_ratio"),
            (ratio_expr >= F.lit(threshold)).alias("contaminated"),
        )

    train_set = train_sh.select(
        key(F.col("shingle")).alias("__k")
    ).distinct()

    ratio = F.round(
        F.col("n_overlap") / F.col("n_shingles"), 6
    ).alias("overlap_ratio")
    return (
        probe.join(
            train_set.withColumn("__hit", F.lit(1)), "__k", "left"
        )
        .groupBy(F.col("id").alias(id_column))
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_overlap"),
        )
        .select(
            id_column,
            "n_shingles",
            "n_overlap",
            ratio,
            (F.col("n_overlap") / F.col("n_shingles") >= F.lit(threshold)).alias(
                "contaminated"
            ),
        )
    )


def contamination_spans(
    train: DataFrame,
    test: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    n: int = 3,
    hash_join_keys: bool = True,
    min_span_tokens: int = 0,
) -> DataFrame:
    """WHICH token spans of each test document appear in the train
    corpus — the actionable decontamination report (a per-doc score says
    "drop or keep"; spans say "these exact passages leaked", enabling
    span-masking instead of whole-doc removal).

    Every positional n-gram of a test doc that exists anywhere in train
    marks tokens ``[pos, pos+n-1]`` as contaminated; overlapping and
    adjacent marks merge into maximal spans (gaps-and-islands over hit
    positions: a new island starts when ``pos > previous_pos + n``).

    Output, one row per maximal span: ``(id_column, span_start,
    span_end, span_n_tokens)`` with 0-based inclusive token indices.
    ``min_span_tokens`` drops short spans (chance n-gram hits).

    Scale shape: identical to :func:`contamination_check` — the train
    side collapses to a distinct shingle set before the join (no doc
    ids, no duplicates), the join is linear in test shingles, and the
    islands window repartitions by doc id only the HIT positions
    (usually a tiny fraction of the corpus).
    """
    pos_sh = positional_shingles(test, text_column, id_column, n=n)
    key = (
        (lambda c: F.xxhash64(c)) if hash_join_keys else (lambda c: c)
    )
    train_set = (
        shingle(train, text_column, id_column, n=n)
        .select(key(F.col("shingle")).alias("__k"))
        .distinct()
    )
    hits = (
        pos_sh.select(
            "id", "pos", "n_tokens", key(F.col("shingle")).alias("__k")
        )
        .join(train_set, "__k")
        .select("id", "pos", "n_tokens")
    )

    w = Window.partitionBy("id").orderBy("pos")
    prev = F.lag("pos").over(w)
    new_island = (prev.isNull() | (F.col("pos") > prev + n)).cast("int")
    island = F.sum(new_island).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    span_end = F.least(
        F.max("pos") + F.lit(n - 1), F.max("n_tokens") - F.lit(1)
    ).cast("long")
    return (
        hits.withColumn("__isl", island)
        .groupBy(F.col("id").alias(id_column), F.col("__isl"))
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            span_end.alias("span_end"),
        )
        .withColumn(
            "span_n_tokens", F.col("span_end") - F.col("span_start") + 1
        )
        .filter(F.col("span_n_tokens") >= F.lit(min_span_tokens))
        .select(id_column, "span_start", "span_end", "span_n_tokens")
    )
