"""IVF ANN tests — determinism, recall vs brute force, probe scaling."""

import pytest
from pyspark.sql import functions as F

from bdq_spark.operators.ivf import (
    assign_ivf_cells,
    knn_ivf,
    load_ivf_index,
    save_ivf_index,
    train_ivf_centroids,
)
from bdq_spark.operators.similarity import knn_bruteforce


@pytest.fixture()
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def test_centroids_deterministic(spark, embeddings):
    import numpy as np

    c1 = train_ivf_centroids(embeddings, n_clusters=8)
    c2 = train_ivf_centroids(embeddings, n_clusters=8)
    assert np.array_equal(c1, c2)
    assert c1.shape == (8, 64)
    # centroids are unit-norm (cosine geometry)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_assignment_covers_corpus(spark, embeddings):
    cents = train_ivf_centroids(embeddings, n_clusters=8)
    cells = assign_ivf_cells(embeddings, cents)
    assert cells.count() == embeddings.count()  # n_probe=1: one cell each
    spread = cells.groupBy("cluster").count().count()
    assert spread >= 4  # vectors actually distribute over cells

    probed = assign_ivf_cells(embeddings.limit(10), cents, n_probe=3)
    assert probed.count() == 30  # one row per probe


def test_knn_ivf_recall_and_self_match(spark, embeddings):
    queries = embeddings.limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = knn_bruteforce(embeddings, queries, k=5)
    approx = knn_ivf(embeddings, queries, k=5, n_clusters=8, n_probe=2)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    # a vector always lands in its own best cell -> self-match guaranteed
    assert all((q, q) in a for q in [r.query_id for r in queries.collect()])
    recall = len(e & a) / len(e)
    assert recall >= 0.4, f"IVF recall too low: {recall}"

    # probing every cell == exact brute force
    full = knn_ivf(embeddings, queries, k=5, n_clusters=8, n_probe=8)
    f = {(r.query_id, r.neighbor_id) for r in full.collect()}
    assert f == e


def test_ivf_index_persistence(spark, embeddings, tmp_path):
    import numpy as np

    cents = train_ivf_centroids(embeddings, n_clusters=8)
    path = str(tmp_path / "ivf_index")
    save_ivf_index(spark, cents, path)
    loaded = load_ivf_index(spark, path)
    assert np.allclose(cents, loaded)

    queries = embeddings.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    fresh = knn_ivf(embeddings, queries, k=5, n_clusters=8, n_probe=2)
    reused = knn_ivf(embeddings, queries, k=5, n_probe=2, centroids=loaded)
    assert sorted(map(tuple, fresh.collect())) == sorted(
        map(tuple, reused.collect())
    )

    with pytest.raises(ValueError, match="empty IVF index"):
        empty = str(tmp_path / "empty_index")
        spark.createDataFrame(
            [], "cluster int, centroid array<double>"
        ).write.parquet(empty)
        load_ivf_index(spark, empty)


def test_knn_ivf_quantized_full_probe_equals_bruteforce(spark):
    """n_probe == n_clusters probes every cell, so the quantized IVF
    twin must reproduce exact brute force row for row (the same
    invariant the float IVF and the md5 LSH twin pin)."""
    from bdq_spark.operators.ivf import knn_ivf_quantized
    from bdq_spark.operators.similarity import knn_bruteforce

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ivf = sorted(
        map(tuple, knn_ivf_quantized(
            emb, queries, k=5, n_clusters=4, n_probe=4, iters=1
        ).collect())
    )
    bf = sorted(map(tuple, knn_bruteforce(emb, queries, k=5).collect()))
    assert ivf == bf


def test_knn_ivf_quantized_candidates_have_no_duplicates(spark):
    """One cell per corpus vector + distinct probe cells => the scored
    candidate relation must already be duplicate-free (the operator
    relies on this instead of a dropDuplicates)."""
    from bdq_spark.operators.ivf import knn_ivf_quantized

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = knn_ivf_quantized(emb, queries, k=10**9, n_clusters=8,
                            n_probe=3, iters=2)
    total = out.count()
    distinct = out.select("query_id", "neighbor_id").distinct().count()
    assert total == distinct


def test_knn_ivf_quantized_deterministic(spark):
    from bdq_spark.operators.ivf import knn_ivf_quantized

    emb = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    ).repartition(13)
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, knn_ivf_quantized(emb, queries, k=7).collect()))
    b = sorted(map(tuple, knn_ivf_quantized(emb, queries, k=7).collect()))
    assert a == b and len(a) == 4 * 7
