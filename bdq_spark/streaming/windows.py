"""Event-time windowed aggregation + watermark helpers.

All helpers accept BOTH batch and streaming DataFrames: ``F.window`` /
``F.session_window`` are event-time operators that Catalyst evaluates
identically in either mode; the watermark is applied only when the input
is streaming (batch frames have no late-data concept).  That makes every
operator testable against a DuckDB oracle in batch mode and deployable
unchanged behind ``writeStream``.

Scale notes: windowed aggregations shuffle on (keys, window); state-store
size in streaming mode is bounded by the watermark horizon.  Session
windows use Spark's native merging session-window state — no
``applyInPandasWithState`` needed for this shape.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_watermark",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "dedup_within_watermark",
    "interval_join",
]

AggSpec = Sequence[Column]


def with_watermark(df: DataFrame, ts_column: str, delay: str) -> DataFrame:
    """Apply a watermark when streaming; no-op on batch frames."""
    if df.isStreaming:
        return df.withWatermark(ts_column, delay)
    return df


def _windowed(
    df: DataFrame,
    window_col: Column,
    ts_column: str,
    group_by: Optional[List[str]],
    aggs: AggSpec,
    watermark: Optional[str],
) -> DataFrame:
    if not aggs:
        raise ValueError("aggs must be a non-empty sequence of aggregate Columns")
    src = with_watermark(df, ts_column, watermark) if watermark else df
    keys = [window_col.alias("window"), *(group_by or [])]
    out = src.groupBy(*keys).agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *(group_by or []),
        *[c for c in out.columns if c not in ("window", *(group_by or []))],
    )


def tumbling_window_agg(
    df: DataFrame,
    ts_column: str,
    duration: str,
    aggs: AggSpec,
    group_by: Optional[List[str]] = None,
    watermark: Optional[str] = None,
) -> DataFrame:
    """Fixed non-overlapping event-time windows (e.g. ``'1 day'``)."""
    return _windowed(
        df, F.window(F.col(ts_column), duration), ts_column, group_by, aggs, watermark
    )


def sliding_window_agg(
    df: DataFrame,
    ts_column: str,
    duration: str,
    slide: str,
    aggs: AggSpec,
    group_by: Optional[List[str]] = None,
    watermark: Optional[str] = None,
) -> DataFrame:
    """Overlapping windows of ``duration`` advancing every ``slide``."""
    return _windowed(
        df,
        F.window(F.col(ts_column), duration, slide),
        ts_column,
        group_by,
        aggs,
        watermark,
    )


def session_window_agg(
    df: DataFrame,
    ts_column: str,
    gap: str,
    aggs: AggSpec,
    group_by: Optional[List[str]] = None,
    watermark: Optional[str] = None,
) -> DataFrame:
    """Dynamic sessions closed after ``gap`` of event-time inactivity."""
    return _windowed(
        df,
        F.session_window(F.col(ts_column), gap),
        ts_column,
        group_by,
        aggs,
        watermark,
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: List[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: Optional[str] = None,
    how: str = "inner",
) -> DataFrame:
    """Event-time interval join: pair rows sharing ``keys`` where
    ``right_ts`` falls in ``[left_ts + lower, left_ts + upper]``.

    Batch: a plain equi-join with the range predicate (Catalyst
    evaluates the interval bound as a post-join filter on the hash
    join — one shuffle on the keys).  Streaming x streaming: the SAME
    plan becomes Spark's watermarked stream-stream join; the time-range
    condition is exactly what lets the engine expire state (rows older
    than the watermark + ``upper`` horizon are dropped from the join
    state store) — without it a stream-stream join is unbounded.  Pass
    ``watermark`` (e.g. ``'1 hour'``) when either side is streaming.

    Column names are disambiguated with ``l_`` / ``r_`` prefixes on the
    two timestamp columns; key columns come out once (coalesced across
    sides, so right-only rows of an outer join keep their keys).

    ``how`` is restricted to inner/left/right/full — the semi/anti
    family would silently drop the right-side columns this operator
    promises to emit.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    allowed_how = {
        "inner", "left", "left_outer", "leftouter",
        "right", "right_outer", "rightouter",
        "full", "outer", "full_outer", "fullouter",
    }
    if how not in allowed_how:
        raise ValueError(
            f"how={how!r} not supported; use inner/left/right/full"
        )
    # accept the full Spark interval literal grammar (compound and
    # fractional units) while still refusing arbitrary SQL fragments —
    # the bound is interpolated into F.expr below
    _unit = r"-?\d+(\.\d+)?\s+[a-zA-Z]+"
    for bound in (lower, upper):
        if not re.fullmatch(rf"{_unit}(\s+{_unit})*", bound.strip()):
            raise ValueError(
                f"interval bound {bound!r} must look like '30 seconds' "
                "or '1 hour 30 minutes'"
            )
    if watermark:
        left = with_watermark(left, left_ts, watermark)
        right = with_watermark(right, right_ts, watermark)
    lts, rts = F.col(f"__l.{left_ts}"), F.col(f"__r.{right_ts}")
    cond = (
        (rts >= lts + F.expr(f"INTERVAL {lower}"))
        & (rts <= lts + F.expr(f"INTERVAL {upper}"))
    )
    for k in keys:
        cond = cond & (F.col(f"__l.{k}") == F.col(f"__r.{k}"))
    out = left.alias("__l").join(right.alias("__r"), cond, how)
    other_l = [
        F.col(f"__l.{c}").alias(f"l_{c}")
        for c in left.columns
        if c not in keys and c != left_ts
    ]
    other_r = [
        F.col(f"__r.{c}").alias(f"r_{c}")
        for c in right.columns
        if c not in keys and c != right_ts
    ]
    return out.select(
        # coalesce so right-only rows of outer joins keep their keys
        *[
            F.coalesce(F.col(f"__l.{k}"), F.col(f"__r.{k}")).alias(k)
            for k in keys
        ],
        lts.alias(f"l_{left_ts}"),
        rts.alias(f"r_{right_ts}"),
        *other_l,
        *other_r,
    )


def dedup_within_watermark(
    df: DataFrame,
    subset: List[str],
    ts_column: str,
    delay: str,
) -> DataFrame:
    """Drop duplicates on ``subset`` arriving within the watermark horizon.

    Streaming: ``dropDuplicatesWithinWatermark`` (state expires after
    ``delay`` — bounded memory, unlike plain streaming dropDuplicates).
    Batch: plain ``dropDuplicates`` (the horizon is the whole dataset).
    """
    if df.isStreaming:
        return df.withWatermark(ts_column, delay).dropDuplicatesWithinWatermark(subset)
    return df.dropDuplicates(subset)
