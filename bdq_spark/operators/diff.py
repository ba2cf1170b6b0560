"""Full data diff between two DataFrames keyed on business-key columns.

Parity targets: `/root/reference/bdq/dataframe.py:20-112` (O1-O3 in
SURVEY.md §2.1); README example `/root/reference/README.md:88-115`.

Result contract (dict, same keys/shapes as the reference):

- ``added`` / ``added_count`` — full rows present only in *df2* ("added in
  df2 relative to df1" — the reference's direction quirk, preserved);
- ``removed`` / ``removed_count`` — full rows present only in *df1*;
- ``changed`` / ``changed_count`` — key columns + a
  ``map<string, struct<before:string, after:string>>`` of per-column
  differences (null-safe compare, both sides cast to string);
- ``not_changed`` / ``not_changed_count`` — same shape, empty map.

Deviations from the reference (SURVEY.md §7.0 sanctioned bug-fix): with
``cache_results=True`` the reference unpersists ``changed`` before
returning it (`/root/reference/bdq/dataframe.py:81-83`); here all four
DataFrames stay cached until
:func:`uncache_compare_dataframes_results`.

Scale notes (100 TB):

- Exactly ONE shuffle: the full-outer join on the key columns.  The three
  way split (added/removed/shared) and the per-column change map are all
  narrow transformations over the join output, and the four counts reuse
  the cached join when ``cache_results=True`` — so the diff costs one join
  materialization, not four.
- The change map is built with ``when``/``array_compact``/
  ``map_from_arrays`` — pure codegen'd expressions, no UDF, no extra pass
  per column.
- Join-key null handling matches the reference: Spark's ``join(on=[cols])``
  USING-join never matches null keys, so null-keyed rows land in
  added/removed — acceptable for business keys which are non-null by
  construction (enforce with :func:`bdq_spark.operators.pk` checks).
"""

from __future__ import annotations

from typing import Callable, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "compare_dataframes",
    "uncache_compare_dataframes_results",
    "display_compare_dataframes_results",
]


def compare_dataframes(
    df1: DataFrame,
    df2: DataFrame,
    key_columns: List[str],
    cache_results: bool = False,
) -> dict:
    """Diff ``df2`` against ``df1`` on ``key_columns``; see module doc."""
    if not key_columns:
        raise ValueError("key_columns must be a non-empty list")

    left = df1.alias("df1")
    right = df2.alias("df2")
    k0 = key_columns[0]

    joined = left.join(right, key_columns, "full_outer")
    removed = joined.filter(F.col(f"df2.{k0}").isNull()).select("df1.*")
    added = joined.filter(F.col(f"df1.{k0}").isNull()).select("df2.*")
    shared = joined.filter(
        F.col(f"df1.{k0}").isNotNull() & F.col(f"df2.{k0}").isNotNull()
    )

    value_columns = [c for c in df1.columns if c not in key_columns]
    map_keys, map_values = [], []
    for name in value_columns:
        differs = ~F.col(f"df1.{name}").eqNullSafe(F.col(f"df2.{name}"))
        map_keys.append(F.when(differs, F.lit(name)))
        map_values.append(
            F.when(
                differs,
                F.struct(
                    F.col(f"df1.{name}").cast("string").alias("before"),
                    F.col(f"df2.{name}").cast("string").alias("after"),
                ),
            )
        )

    change_map = F.map_from_arrays(
        F.array_compact(F.array(*map_keys)),
        F.array_compact(F.array(*map_values)),
    ).alias("changed")
    compared = shared.select(*key_columns, change_map)

    if cache_results:
        added = added.cache()
        removed = removed.cache()
        compared = compared.cache()

    has_changes = F.col("changed").isNotNull() & (F.size("changed") > 0)
    changed = compared.filter(has_changes)
    not_changed = compared.filter(~has_changes)

    if cache_results:
        changed = changed.cache()
        not_changed = not_changed.cache()

    # the four eager counts (part of the reference's API contract,
    # `/root/reference/bdq/dataframe.py:70-79`) are computed in ONE pass:
    # classify each joined row and count by class — a single aggregation
    # job instead of four separate materializations of the join.  At
    # scale this is 1 shuffle instead of 4.
    any_change = F.lit(False)
    for name in value_columns:
        any_change = any_change | ~F.col(f"df1.{name}").eqNullSafe(
            F.col(f"df2.{name}")
        )
    status = (
        F.when(F.col(f"df1.{k0}").isNull(), F.lit("added"))
        .when(F.col(f"df2.{k0}").isNull(), F.lit("removed"))
        .when(any_change, F.lit("changed"))
        .otherwise(F.lit("not_changed"))
    )
    count_row = joined.agg(
        *[
            F.sum(F.when(status == s, 1).otherwise(0)).alias(s)
            for s in ("added", "removed", "changed", "not_changed")
        ]
    ).first()

    return {
        "added": added,
        "added_count": count_row["added"] or 0,
        "removed": removed,
        "removed_count": count_row["removed"] or 0,
        "changed": changed,
        "changed_count": count_row["changed"] or 0,
        "not_changed": not_changed,
        "not_changed_count": count_row["not_changed"] or 0,
    }


def uncache_compare_dataframes_results(results: dict) -> None:
    """Unpersist every DataFrame value in a diff-result dict
    (`/root/reference/bdq/dataframe.py:86-89`)."""
    for value in results.values():
        if isinstance(value, DataFrame):
            value.unpersist()


def display_compare_dataframes_results(
    df_diff: dict,
    show_added_records: bool = True,
    show_removed_records: bool = True,
    show_changed_records: bool = True,
    show_not_changed_records: bool = False,
    display_function: Optional[Callable[[DataFrame], None]] = None,
) -> None:
    """Print the four counts and show each requested section
    (`/root/reference/bdq/dataframe.py:91-112`)."""

    def _show(df: DataFrame) -> None:
        if display_function is not None:
            display_function(df)
        else:
            df.show(truncate=False)

    sections = [
        ("Added", "added", show_added_records),
        ("Removed", "removed", show_removed_records),
        ("Changed", "changed", show_changed_records),
        ("Not changed", "not_changed", show_not_changed_records),
    ]
    for title, key, enabled in sections:
        print(f"{title} records count:", df_diff[f"{key}_count"])
        if enabled:
            _show(df_diff[key])
