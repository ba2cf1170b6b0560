"""Fact → dimension referential-integrity check.

Parity target: `/root/reference/bdq/dataframe.py:114-140` (O4 in
SURVEY.md §2.1); README example `/root/reference/README.md:195-213`.

Scale notes (100 TB):

- Both sides are ``distinct()``-projected onto the key columns *before*
  the anti-join (`/root/reference/bdq/dataframe.py:118-119`) — this is the
  load-bearing optimization at scale: the join inputs shrink from row
  count to key cardinality.  The distinct is a map-side partial aggregate,
  so the shuffle carries unique keys only.
- The anti-join output (broken key combos) is usually tiny; AQE broadcasts
  it for the sampling inner-join back to the fact table, so sampling costs
  one more fact scan but no extra shuffle of the fact table.
- Per-key sampling is bounded by ``row_number() <= N`` *before*
  ``collect_list``, which caps the collected array size — the OOM guard
  the reference builds in (`/root/reference/bdq/dataframe.py:131-138`).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["fact_dim_broken_relationship"]


def fact_dim_broken_relationship(
    fact_df: DataFrame,
    fk_columns: List[str],
    dim_df: DataFrame,
    pk_columns: List[str],
    sample_broken_records: int = 3,
) -> DataFrame:
    """Find fact FK combinations with no matching dimension PK.

    Returns the distinct broken FK combos (columns = ``fk_columns``), or —
    when ``sample_broken_records`` is truthy — one row per broken combo
    with a ``sample_records`` array of up to N offending fact rows
    (``collect_list(struct('*'))``).

    Join is positional: ``pk_columns[i] == fk_columns[i]``; lengths must
    match (`/root/reference/bdq/dataframe.py:115-116`).
    """
    if len(pk_columns) != len(fk_columns):
        raise ValueError("pk_columns count must match fk_columns count")

    fact_keys = fact_df.select(*fk_columns).distinct().alias("f")
    dim_keys = dim_df.select(*pk_columns).distinct().alias("d")

    on = [
        F.col(f"d.{pk}") == F.col(f"f.{fk}")
        for pk, fk in zip(pk_columns, fk_columns)
    ]
    broken = fact_keys.join(dim_keys, on, "left_anti").select("f.*")

    if not sample_broken_records:
        return broken

    per_key = Window.partitionBy(*fk_columns).orderBy(F.lit(1))
    return (
        fact_df.alias("fact")
        .join(broken.alias("broken"), fk_columns, "inner")
        .select("fact.*")
        .withColumn("__row_number", F.row_number().over(per_key))
        .filter(F.col("__row_number") <= sample_broken_records)
        .drop("__row_number")
        .groupBy(*fk_columns)
        .agg(F.collect_list(F.struct("*")).alias("sample_records"))
    )
