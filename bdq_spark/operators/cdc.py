"""CDC apply — merge a change feed (inserts/updates/deletes) into a
snapshot, the batch "MERGE INTO" the reference's Delta-based pipelines
perform with ``step_spark_table`` sinks (cite:
`/root/reference/bdq/spark_pipeline.py:515` — the delta default whose
managed-table modes this library reproduces; the MERGE semantics
themselves are re-expressed relationally here because no Delta runtime
ships in this environment).

Semantics (standard CDC upsert):

1. collapse the change feed to the LATEST change per key (ties on the
   ordering column break deterministically by preferring deletes, so a
   same-timestamp insert+delete converges to absence);
2. keys whose latest op is delete disappear;
3. keys whose latest op is insert/update take the change row's values;
4. all other base rows pass through unchanged.

Scale shape: one window over the change feed (small relative to the
base), then ONE left-anti join of the base against the touched keys
plus a union — the base table is never shuffled beyond the anti-join,
and when the touched-key set is small Catalyst broadcasts it, making
the apply a map-side pass over the snapshot.  This is the relational
core of what table formats (Delta/Iceberg/Hudi) execute as MERGE.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["latest_changes", "apply_cdc", "scd2_from_changes"]

#: recognized operation codes (case-insensitive): insert/update/upsert
#: land the row, delete removes it
_UPSERT_OPS = ("i", "u", "insert", "update", "upsert")
_DELETE_OPS = ("d", "delete")


def latest_changes(
    changes: DataFrame,
    keys: List[str],
    order_by: List[str],
    op_column: str = "op",
) -> DataFrame:
    """Collapse a change feed to the single latest change per key.

    Ordering: ``order_by`` columns DESCENDING (latest first); exact
    ties prefer the delete so insert+delete at the same version
    converges to absence (the safe direction for replayed feeds).
    """
    if not keys or not order_by:
        raise ValueError("keys and order_by must be non-empty")
    is_delete = F.lower(F.col(op_column)).isin(*_DELETE_OPS)
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_by],
        is_delete.cast("int").desc(),
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    keys: List[str],
    order_by: List[str],
    op_column: str = "op",
    columns: Optional[List[str]] = None,
    strict: bool = False,
) -> DataFrame:
    """Apply a CDC feed to a snapshot; returns the new snapshot.

    ``changes`` must carry the key columns, the ``op_column``
    (insert/update/delete, case-insensitive, 1-letter codes accepted)
    and the data columns; ``order_by`` orders multiple changes to one
    key (commit version, timestamp).  ``columns`` fixes the output
    column set (default: the base table's columns — change-feed
    metadata like the op/version columns never leaks into the result).

    Unknown op codes are treated as upserts by default (the forgiving
    direction — data lands and can be re-deleted, versus silently
    vanishing).  ``strict=True`` instead fails the job on the first
    unrecognized code (a runtime check over the feed: op validity is
    data, not schema, so it cannot be decided at plan-build time).
    """
    out_cols = columns or base.columns
    missing = [c for c in out_cols if c not in changes.columns]
    if missing:
        raise ValueError(
            f"changes is missing output columns {missing}; pass columns= "
            "to restrict the result schema"
        )
    if strict:
        known = F.lower(F.col(op_column)).isin(
            *(_UPSERT_OPS + _DELETE_OPS)
        )
        # a filter (not a dropped projection) so Catalyst can't prune
        # the check away; one codegen pass over the small feed
        changes = changes.filter(
            F.when(known, F.lit(True)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("apply_cdc: unknown op code: "),
                        F.col(op_column).cast("string"),
                    )
                )
            )
        )
    latest = latest_changes(changes, keys, order_by, op_column)
    is_delete = F.lower(F.col(op_column)).isin(*_DELETE_OPS)
    upserts = latest.filter(~is_delete).select(*out_cols)
    touched = latest.select(*keys)
    untouched = base.join(touched, keys, "left_anti").select(*out_cols)
    return untouched.unionByName(upserts)


def scd2_from_changes(
    changes: DataFrame,
    keys: List[str],
    version_column: str,
    op_column: str = "op",
) -> DataFrame:
    """Build a Slowly-Changing-Dimension TYPE 2 history from a change
    feed — the warehouse pattern layered over the same feeds
    :func:`apply_cdc` merges: instead of keeping only the latest row
    per key, every change version becomes a VALIDITY INTERVAL
    ``[valid_from, valid_to)`` so joins can be done "as of" any point
    in the key's history.

    Semantics (standard SCD2 from a versioned feed):

    - each upsert (I/U) row opens an interval at its version;
    - an interval closes at the NEXT change of the same key (upsert or
      delete) — ``valid_to`` is that change's version, NULL while open;
    - delete rows close their predecessor's interval but emit no row
      themselves, so a deleted key has no current row; a later
      re-insert opens a fresh interval;
    - ``is_current`` marks the open interval.

    Determinism: (keys, version) pairs are expected unique per the
    feed contract; exact ties order delete-last so a same-version
    upsert+delete converges to "closed immediately" (the same safe
    direction as :func:`latest_changes`).

    Scale shape: ONE window over the change feed (lead of the version
    within key) — the feed, not any base table, is the only input, and
    the window key is the natural feed partitioning.  Output is append-
    friendly: re-running on a feed prefix yields a prefix of the
    history (the open intervals simply close later).
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    is_delete = F.lower(F.col(op_column)).isin(*_DELETE_OPS)
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_column), is_delete.cast("int")
    )
    hist = changes.withColumn(
        "valid_to", F.lead(F.col(version_column)).over(w)
    ).filter(~is_delete)
    return (
        hist.withColumn("valid_from", F.col(version_column))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(op_column)
    )
