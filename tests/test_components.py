"""Connected-components tests: golden graphs and a union-find
property check on random edge lists."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bdq_spark.operators import connected_components


def _collect(df):
    return {r.id: (r.cluster_id, r.is_keeper) for r in df.collect()}


def test_chain_triangle_and_disjoint(spark):
    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),      # chain -> component 1
            (10, 11), (11, 12), (10, 12),  # triangle -> component 10
            (20, 21),                     # pair -> component 20
        ],
        "id_a long, id_b long",
    )
    out = _collect(connected_components(pairs))
    assert {k: v[0] for k, v in out.items()} == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }
    keepers = {k for k, v in out.items() if v[1]}
    assert keepers == {1, 10, 20}


def test_convergence_bound_raises(spark):
    # a 6-node path needs more than 1 round
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iterations=1)
    # and converges with a sane bound
    out = _collect(connected_components(pairs))
    assert {v[0] for v in out.values()} == {0}


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for x in list(parent):
        root = find(x)
        comp[x] = root
    # normalize root to the min id of each component
    mins = {}
    for x, r in comp.items():
        mins[r] = min(mins.get(r, x), x)
    return {x: mins[r] for x, r in comp.items()}


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_matches_union_find(spark, edges):
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == _union_find(edges)


def test_apply_dedup_clusters_end_to_end(spark):
    from pyspark.sql import functions as F

    from bdq_spark.operators import apply_dedup_clusters
    from bdq_spark.operators.dedup import ngram_jaccard_pairs
    from bdq_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.8)
    clusters = connected_components(pairs)
    kept = apply_dedup_clusters(docs, clusters)

    n_docs = docs.count()
    n_non_keepers = clusters.filter(~F.col("is_keeper")).count()
    assert clusters.count() > 0  # planted near-dups exist even at sf0.001
    assert kept.count() == n_docs - n_non_keepers
    # every cluster still has exactly its keeper present
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    for r in clusters.collect():
        assert (r.id in kept_ids) == r.is_keeper
