"""Connected components over a pair/edge relation — the step that turns
near-duplicate PAIRS (from n-gram Jaccard, MinHash-LSH, SimHash or
embedding cosine) into duplicate CLUSTERS with a canonical keeper, so a
dedup decision can actually be executed.

Algorithm: iterative min-label propagation.  Every node starts labeled
with its own id; each round, every node adopts the minimum label among
itself and its neighbors; at fixpoint each component is labeled by its
minimum member id.  Rounds needed = the graph diameter, which for
near-dup clusters (dense blobs of mutually-similar docs, diameter 2-3)
means 2-4 rounds — the regime where this simple scheme beats the
alternating large-star/small-star construction (Kiveris et al., "CC in
MapReduce and Beyond", SoCC'14) that wins on pathological long chains.

Scale mechanics, per round:

- one shuffle: edges join labels on src, then min-aggregate per dst,
  merged with the current label (all partial-combinable);
- a LAZY ``localCheckpoint`` after every round — without checkpointing
  the plan DOUBLES per iteration and the job dies of lineage, the
  classic Spark iterative-algorithm failure mode;
- early termination via a changed-label count, which doubles as the
  action that materializes the round's checkpoint blocks — exactly one
  job per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "apply_dedup_clusters"]


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Label every node appearing in ``pairs`` with its component's
    minimum member id.

    Output: ``(id, cluster_id, is_keeper)`` — one row per distinct node;
    ``is_keeper`` marks the minimum-id member, giving a deterministic
    survivor per duplicate cluster.  Raises if ``max_iterations`` rounds
    don't reach the fixpoint (pathologically long chains — raise the
    bound or pre-split the graph).
    """
    # checkpoint the INPUT first: the union below reads the pair relation
    # twice (both edge directions), and the upstream pair producers
    # (LSH banding, Jaccard verify) are the expensive part of the whole
    # clustering query — without this they would execute twice
    directed = pairs.select(
        F.col(id_a).alias("a"), F.col(id_b).alias("b")
    ).localCheckpoint(eager=True)
    edges = (
        directed.union(
            directed.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.a == labels.id)
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("comp").alias("__n_comp"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("__n_comp"), F.col("comp"))
                ).alias("comp"),
                (F.col("__n_comp") < F.col("comp")).alias("__changed"),
            )
            # LAZY checkpoint: the changed-count below is the round's one
            # and only action — it materializes and stores the checkpoint
            # blocks as a side effect, halving the per-round job count
            # (an eager checkpoint + separate count was two full jobs)
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            return labels.select(
                "id",
                F.col("comp").alias("cluster_id"),
                (F.col("id") == F.col("comp")).alias("is_keeper"),
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds "
        "(graph diameter exceeds the bound)"
    )


def apply_dedup_clusters(
    df: DataFrame,
    clusters: DataFrame,
    id_column: str = "doc_id",
) -> DataFrame:
    """Execute the dedup decision: drop every non-keeper cluster member
    from ``df``; rows never seen in a pair (the vast majority of a real
    corpus) pass through untouched.

    One LEFT ANTI join against the (small) non-keeper id set — the
    cluster relation is proportional to the DUPLICATE population, not
    the corpus, so this is broadcast-sized in practice.
    """
    non_keepers = clusters.filter(~F.col("is_keeper")).select(
        F.col("id").alias(id_column)
    )
    return df.join(non_keepers, id_column, "left_anti")
