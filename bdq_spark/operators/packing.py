"""Token-budget sequence packing for LLM training pipelines.

Before batching, training corpora are PACKED: documents are grouped
into fixed-token-budget sequences so attention windows waste no
padding.  Bin packing is inherently sequential, so the scale design
splits it in two:

- **shard** (distributed): documents are hash-assigned to
  ``n_shards`` deterministic shards (reusing the md5 bucket from
  :mod:`bdq_spark.operators.splits` — stable across runs/engines).
  Shard count bounds per-task memory: a shard holds ``~N/n_shards``
  (id, token_count) pairs — two longs per doc, so even 10^10 docs at
  ``n_shards=10_000`` is ~16 MB per task.
- **pack** (per-shard, exact): first-fit-decreasing inside one
  ``applyInPandas`` group per shard.  FFD is within 11/9·OPT + 6/9
  bins of optimal per shard; sharding costs at most one partially
  filled bin per shard versus global packing.
- **refine** (global, metadata-only): the first-fit invariant says at
  most ONE bin per shard ends up half-empty or worse, so the cross-
  shard "tail" is at most ``n_shards`` bins.  The refinement re-packs
  those WHOLE bins (bin-level FFD over their fills — documents never
  move between bins individually, so only pack ids are rewritten via a
  broadcast mapping join), recovering most of the sharding penalty at
  the cost of one aggregation over the assignment relation.

Documents larger than the budget become single-doc packs flagged
``oversize`` (the caller decides to split or drop them — packing never
silently truncates).

Output is the assignment relation ``(doc id, token count, shard,
pack_id, oversize)`` — one row per input document, ``pack_id`` globally
unique.  Downstream, the actual sequence assembly is a groupBy(pack_id)
away and stays distributed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bdq_spark.operators.splits import hash_bucket_column

__all__ = ["pack_documents"]

#: pack_id = shard * _SHARD_SPAN + local bin index; one shard can hold
#: at most _SHARD_SPAN bins (2^40 — unreachable in practice)
_SHARD_SPAN = 1 << 40


#: above this many remapped bins the rewrite switches from a literal
#: CASE map to a broadcast join (keeps the expression tree bounded)
_LITERAL_MAP_LIMIT = 1024


def _merge_tail_bins(packed: DataFrame, budget: int) -> DataFrame:
    """Cross-shard refinement: re-pack the half-empty tail bins.

    By the first-fit invariant each shard leaves at most ONE bin at
    <= ``budget/2`` fill, so the candidate set is bounded by the shard
    count — bounded metadata, like the IVF centroid sample.  The tail
    fills are collected (<= ``n_shards`` (pack_id, fill) pairs), the
    bin-level FFD runs in plain Python on the driver, and only the
    resulting remap touches the plan:

    - no remap (the common case — tails don't combine, or <= 1 tail
      bin): ``packed`` is returned UNTOUCHED, zero extra operators;
    - small remap: a literal map expression — whole-stage codegen, no
      join, no shuffle;
    - large remap (> ``_LITERAL_MAP_LIMIT`` entries): broadcast join.

    Bins merge whole (the merged group keeps the id of its first
    member, ordered (fill desc, pack_id asc) for determinism);
    documents never move between bins individually.
    """
    tail = (
        packed.filter(~F.col("oversize"))
        .groupBy("pack_id")
        .agg(F.sum("__tokens").alias("__fill"))
        .filter(F.col("__fill") * 2 <= F.lit(budget))
        .collect()  # <= one bin per shard by the first-fit invariant
    )
    bins = sorted(
        ((int(r["__fill"]), int(r["pack_id"])) for r in tail),
        key=lambda t: (-t[0], t[1]),
    )
    space: list = []  # (remaining budget, surviving pack_id)
    remap: dict[int, int] = {}
    for fill, pid in bins:
        for i, (rem, tid) in enumerate(space):
            if rem >= fill:
                space[i] = (rem - fill, tid)
                remap[pid] = tid
                break
        else:
            space.append((budget - fill, pid))
    if not remap:
        return packed

    if len(remap) <= _LITERAL_MAP_LIMIT:
        # explicit long casts: small int literals would otherwise type
        # the map <int,int> and downcast the 2^40-spanned pack_id lookup
        lit_map = F.create_map(
            *[F.lit(v).cast("long") for kv in remap.items() for v in kv]
        )
        return packed.withColumn(
            "pack_id",
            F.coalesce(lit_map[F.col("pack_id")], F.col("pack_id")),
        )

    mapping = packed.sparkSession.createDataFrame(
        list(remap.items()), "pack_id long, __new_pack_id long"
    )
    return (
        packed.join(F.broadcast(mapping), "pack_id", "left")
        .withColumn("pack_id", F.coalesce("__new_pack_id", "pack_id"))
        .drop("__new_pack_id")
        .select("__id", "__tokens", "shard", "pack_id", "oversize")
    )


def pack_documents(
    df: DataFrame,
    token_column: str,
    budget: int,
    id_column: str,
    n_shards: int = 64,
    refine: bool = True,
) -> DataFrame:
    """Assign every document to a pack whose token sum is <= ``budget``.

    Returns ``(id_column, token_column, shard int, pack_id long,
    oversize boolean)`` with exactly one row per input document.
    Deterministic: same inputs produce the same packs regardless of
    partitioning (shard assignment is an md5 bucket of the id; packing
    order inside a shard is (tokens desc, id asc)).

    ``refine=True`` (default) merges each shard's half-empty tail bin
    with other shards' tails (:func:`_merge_tail_bins`) — strictly
    fewer or equal bins, never a budget violation.  Refine runs one
    bounded driver-side action (collecting <= ``n_shards`` tail fills,
    the eager-peek convention of O1's contracted counts); the packing
    itself is localCheckpoint'ed so it executes exactly once.
    """
    if budget <= 0:
        raise ValueError("budget must be > 0")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    for c in (token_column, id_column):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")

    base = df.select(
        F.col(id_column).alias("__id"),
        F.col(token_column).cast("long").alias("__tokens"),
        (hash_bucket_column([id_column]) % n_shards).cast("int").alias("shard"),
    )

    id_type = base.schema["__id"].dataType.simpleString()
    out_schema = (
        f"__id {id_type}, __tokens long, shard int, "
        "pack_id long, oversize boolean"
    )

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(
            ["__tokens", "__id"], ascending=[False, True]
        ).reset_index(drop=True)
        bin_space: list[int] = []  # remaining budget per bin
        assigned: list[int] = []
        oversize: list[bool] = []
        for tokens in pdf["__tokens"]:
            t = int(tokens) if tokens is not None and tokens == tokens else 0
            if t > budget:
                bin_space.append(-1)  # full: nothing else joins this bin
                assigned.append(len(bin_space) - 1)
                oversize.append(True)
                continue
            # first-fit over open bins (tokens are descending, so bins
            # fill front-to-back; scan cost stays near-linear)
            for i, space in enumerate(bin_space):
                if space >= t:
                    bin_space[i] = space - t
                    assigned.append(i)
                    break
            else:
                bin_space.append(budget - t)
                assigned.append(len(bin_space) - 1)
            oversize.append(False)
        pdf["pack_id"] = [shard * _SHARD_SPAN + b for b in assigned]
        pdf["oversize"] = oversize
        return pdf[["__id", "__tokens", "shard", "pack_id", "oversize"]]

    packed = base.groupBy("shard").applyInPandas(pack_shard, schema=out_schema)
    if refine and n_shards > 1:
        # refine peeks at the tail fills (a bounded driver-side action);
        # localCheckpoint materializes the FFD output on the executors at
        # that first action so the caller's own action re-reads the
        # stored blocks instead of re-running the packing
        packed = packed.localCheckpoint(eager=False)
        packed = _merge_tail_bins(packed, budget)
    return packed.withColumnRenamed("__id", id_column).withColumnRenamed(
        "__tokens", token_column
    )
