"""As-of (most-recent-match) join — a time-series primitive the
reference lacks entirely (SURVEY.md §2.3 notes "no theta/range/as-of
joins"; joins in `/root/reference/bdq/dataframe.py` are equi-only), but
one every event/feature pipeline needs: attach to each left row the
single newest right row at-or-before its timestamp (or oldest
at-or-after, ``direction="forward"``), per key.

Spark-first design — the union+window formulation, NOT a join:

- Tag both inputs, union them, and run ONE window per key ordered by
  ``(time, tag)`` with ``last(right_payload, ignorenulls=True)`` over
  ``rowsBetween(unboundedPreceding, currentRow)``.  Each left row then
  carries the latest preceding right payload.
- Cost is a single hash shuffle on the key columns and a per-key sort —
  the same price as the window dedup in
  :func:`bdq_spark.operators.latest.get_latest_records`.  There is no
  join, so there is no candidate blow-up: a left row never meets more
  than the one right row it matches, regardless of how many right rows
  share its key (contrast a range-predicate join, whose candidate set is
  O(|L_k| x |R_k|) per key before filtering).
- Skew degrades linearly (a hot key is one big sorted run, not a
  quadratic pair set), and AQE can split oversized partitions.
- Ties at equal timestamps resolve INCLUSIVELY (a right row at exactly
  the left timestamp matches), matching DuckDB's ``ASOF JOIN ... ON
  l.t >= r.t`` — the tag orders right rows before left rows within a
  timestamp.

``tolerance`` (seconds) bounds the match age like pandas
``merge_asof(tolerance=...)``: a match older (backward) / farther ahead
(forward) than the bound is dropped, leaving nulls.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: List[str],
    left_time: str,
    right_time: Optional[str] = None,
    direction: str = "backward",
    tolerance_seconds: Optional[float] = None,
    suffix: str = "_right",
    join_type: str = "left",
) -> DataFrame:
    """For each left row, attach the newest right row with
    ``right_time <= left_time`` (``direction="backward"``) or the oldest
    with ``right_time >= left_time`` (``"forward"``), matching on the
    ``on`` key columns.

    Output: every left column (original names), then every non-key right
    column, renamed with ``suffix`` on collision with a left name.
    ``join_type="left"`` keeps unmatched left rows with nulls;
    ``"inner"`` drops them.  Right rows with a null time never match;
    left rows with a null time never receive a match.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction!r} (backward|forward)")
    if join_type not in ("left", "inner"):
        raise ValueError(f"unknown join_type: {join_type!r} (left|inner)")
    right_time = right_time or left_time
    missing = [c for c in on if c not in left.columns or c not in right.columns]
    if missing:
        raise ValueError(f"key columns missing from an input: {missing}")

    right_payload_cols = [c for c in right.columns if c not in on]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in right_payload_cols
    }

    l_tagged = left.select(
        *[F.col(c) for c in on],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None)
        .cast(
            right.select(
                F.struct(*[F.col(c) for c in right_payload_cols]).alias("s")
            ).schema["s"].dataType
        )
        .alias("__r"),
    )
    r_tagged = right.filter(F.col(right_time).isNotNull()).select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None)
        .cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("s")
            ).schema["s"].dataType
        )
        .alias("__l"),
        F.struct(*[F.col(c) for c in right_payload_cols]).alias("__r"),
    )

    # backward: scan time ascending, right rows first within a timestamp
    # so an equal-time right row is visible to the left row (inclusive).
    # forward is the mirror image: scan descending.  Null-time left rows
    # must sort BEFORE every right row in scan order (desc sorts nulls
    # last by default, which would hand them a spurious match).
    t_order = (
        F.col("__t").asc_nulls_first()
        if direction == "backward"
        else F.col("__t").desc_nulls_first()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(t_order, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
    )

    if tolerance_seconds is not None:
        m_time = F.col("__match").getField(right_time) if right_time in (
            right_payload_cols
        ) else None
        if m_time is None:
            raise ValueError(
                "tolerance_seconds requires right_time to be a right payload "
                "column (not one of the key columns)"
            )
        age = (
            F.unix_micros(F.col("__t")) - F.unix_micros(m_time)
            if direction == "backward"
            else F.unix_micros(m_time) - F.unix_micros(F.col("__t"))
        )
        matched = matched.withColumn(
            "__match",
            F.when(age <= F.lit(tolerance_seconds * 1_000_000), F.col("__match")),
        )

    if join_type == "inner":
        matched = matched.filter(F.col("__match").isNotNull())

    return matched.select(
        *[F.col("__l").getField(c).alias(c) for c in left.columns],
        *[
            F.col("__match").getField(c).alias(out_names[c])
            for c in right_payload_cols
        ],
    )
