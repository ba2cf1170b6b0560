"""Sequence-packing invariants: coverage, budget respected, oversize
isolation, determinism under repartitioning, packing efficiency."""

import pytest
from pyspark.sql import functions as F

from bdq_spark.operators import pack_documents


@pytest.fixture()
def docs(spark):
    # token counts spread over [1, 1500] with a few oversize outliers
    return spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 97) % 1500 + 1).alias("n_tokens"),
    ).union(
        spark.createDataFrame(
            [(9001, 5000), (9002, 2049)], "doc_id long, n_tokens long"
        )
    )


BUDGET = 2048


def test_coverage_budget_and_oversize(spark, docs):
    packed = pack_documents(docs, "n_tokens", BUDGET, "doc_id", n_shards=8)
    rows = packed.collect()
    assert len(rows) == docs.count()  # every doc exactly once
    assert {r.doc_id for r in rows} == {r.doc_id for r in docs.collect()}

    per_pack = (
        packed.groupBy("pack_id")
        .agg(
            F.sum("n_tokens").alias("tok"),
            F.count("*").alias("n"),
            F.max(F.col("oversize").cast("int")).alias("has_over"),
        )
        .collect()
    )
    for p in per_pack:
        if p.has_over:
            assert p.n == 1  # oversize docs are isolated single-doc packs
        else:
            assert p.tok <= BUDGET
    assert {r.doc_id for r in rows if r.oversize} == {9001, 9002}


def test_deterministic_across_partitionings(spark, docs):
    a = sorted(map(tuple, pack_documents(docs, "n_tokens", BUDGET, "doc_id").collect()))
    b = sorted(
        map(
            tuple,
            pack_documents(
                docs.repartition(23), "n_tokens", BUDGET, "doc_id"
            ).collect(),
        )
    )
    assert a == b


def test_packing_efficiency(spark, docs):
    """FFD should land near the token-sum lower bound despite sharding."""
    normal = docs.filter(F.col("n_tokens") <= BUDGET)
    total_tokens = normal.agg(F.sum("n_tokens")).first()[0]
    lower_bound = -(-total_tokens // BUDGET)  # ceil
    n_packs = (
        pack_documents(normal, "n_tokens", BUDGET, "doc_id", n_shards=8)
        .select("pack_id")
        .distinct()
        .count()
    )
    # 8 shards can each waste a partial bin; allow FFD slack on top
    assert n_packs <= lower_bound * 1.25 + 8


def test_refine_merges_tail_bins(spark):
    """A skewed corpus where every shard ends with a near-half-empty
    tail bin: the global refinement must merge those tails into
    strictly fewer bins than sharded-FFD alone, without ever breaking
    the budget or moving a doc out of its bin-mates' pack."""
    # 16 shards x docs of 600 tokens: per shard FFD makes bins of 3
    # (1800 <= 2048) and leaves a tail bin of 1-2 docs (<= 1200 tokens)
    docs = spark.range(0, 16 * 3 + 8).select(
        F.col("id").alias("doc_id"), F.lit(600).alias("n_tokens")
    )
    unrefined = pack_documents(
        docs, "n_tokens", BUDGET, "doc_id", n_shards=16, refine=False
    )
    refined = pack_documents(
        docs, "n_tokens", BUDGET, "doc_id", n_shards=16, refine=True
    )
    n_unref = unrefined.select("pack_id").distinct().count()
    n_ref = refined.select("pack_id").distinct().count()
    assert n_ref < n_unref

    per_pack = refined.groupBy("pack_id").agg(F.sum("n_tokens").alias("tok"))
    assert per_pack.filter(F.col("tok") > BUDGET).count() == 0
    # coverage preserved
    assert refined.count() == docs.count()
    assert refined.select("doc_id").distinct().count() == docs.count()

    # refinement is deterministic too
    again = sorted(map(tuple, pack_documents(
        docs.repartition(13), "n_tokens", BUDGET, "doc_id",
        n_shards=16, refine=True,
    ).collect()))
    assert again == sorted(map(tuple, refined.collect()))


def test_validation(spark, docs):
    with pytest.raises(ValueError, match="budget"):
        pack_documents(docs, "n_tokens", 0, "doc_id")
    with pytest.raises(ValueError, match="n_shards"):
        pack_documents(docs, "n_tokens", BUDGET, "doc_id", n_shards=0)
    with pytest.raises(ValueError, match="not in DataFrame"):
        pack_documents(docs, "missing", BUDGET, "doc_id")
