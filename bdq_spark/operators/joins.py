"""Skew-resistant join strategies.

Extension beyond the reference surface (the reference delegates all join
execution to Catalyst — SURVEY.md §2.3 — which is right until one join
key is a heavy hitter).  At 100 TB a single hot key (the NULL-surrogate
user, the default tenant, an empty-string join key) puts its entire row
set into ONE shuffle partition; AQE's skew-join splitting only rescues
sort-merge joins whose skewed side can be sub-split, and broadcast is
out when the other side is also large.

``salted_join`` implements the classic salting scheme declaratively:

- the LEFT (skewed) side gets a uniform random salt in ``[0, buckets)``;
- the RIGHT side is replicated once per salt value (``explode`` of a
  ``sequence`` — a narrow transformation, no shuffle of its own);
- the equi-join runs on ``keys + salt``, spreading each hot key over
  ``buckets`` partitions.

The result is row-for-row identical to the plain join (every left row
still meets every matching right row exactly once — through its own
salt's replica), so correctness is oracle-checkable against the
unsalted SQL.  Cost: the right side's shuffle volume grows ``buckets``×
— use it when the left is skewed and MUCH larger than the right.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "range_join", "key_skew_report"]

_ALLOWED = {"inner", "left", "left_outer", "left_semi", "left_anti"}

_SALT = "__bdq_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: List[str],
    how: str = "inner",
    salt_buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join on ``on`` with the left side salted across
    ``salt_buckets`` shuffle partitions per key.

    ``how`` is restricted to left-preserving joins (``inner``, ``left``/
    ``left_outer``, ``left_semi``, ``left_anti``): right-preserving
    variants would multiply unmatched right rows by the replication
    factor.  The salt is internal; output columns equal the plain
    ``left.join(right, on, how)``.
    """
    if how not in _ALLOWED:
        raise ValueError(
            f"how={how!r} not supported by salted_join; allowed: "
            f"{sorted(_ALLOWED)} (right-preserving joins would duplicate "
            "unmatched right rows)"
        )
    if salt_buckets < 1:
        raise ValueError("salt_buckets must be >= 1")
    if isinstance(on, str):
        on = [on]
    if not on:
        raise ValueError("on must name at least one join column")
    for side, df in (("left", left), ("right", right)):
        missing = [c for c in on if c not in df.columns]
        if missing:
            raise ValueError(f"{side} side is missing join columns: {missing}")

    salted_left = left.withColumn(
        _SALT, F.floor(F.rand(seed) * salt_buckets).cast("int")
    )
    replicated_right = right.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    out = salted_left.join(replicated_right, on + [_SALT], how)
    if how in ("left_semi", "left_anti"):
        # semi/anti keep only left columns; the salt rides on the left
        return out.drop(_SALT)
    return out.drop(_SALT)


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lower: str,
    upper: str,
    on: List[str] | None = None,
    band_width: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Interval join: each left row joined to every right row whose
    ``[lower, upper]`` interval contains ``left.point`` (inclusive, SQL
    BETWEEN semantics), optionally also matching equi-keys ``on``.

    Catalyst executes a raw ``l.p BETWEEN r.lo AND r.hi`` join as a
    BroadcastNestedLoopJoin — O(|L| x |R|) work unless one side is tiny.
    This operator makes it a plain equi-join via BANDING:

    - pick a band width ``w`` (defaults to the right side's mean interval
      width, one small driver-side aggregate);
    - each right interval is exploded into the bands it overlaps
      (``sequence(floor(lo/w), floor(hi/w))`` — a narrow transformation);
    - each left point lives in exactly ONE band (``floor(p/w)``), so the
      equi-join on ``on + [band]`` meets every true pair exactly once —
      no post-join dedup shuffle — and the BETWEEN filter removes
      same-band false candidates.

    Cost model: right shuffle volume grows by the bands-per-interval
    factor (≈ ``width/w + 1``), while candidate pairs shrink from
    |L| x |R| to pairs sharing a band.  Pick ``w`` near the typical
    interval width; a too-small ``w`` over-replicates the right side, a
    too-large one over-matches candidates.  Join type is inner.

    ``point``/``lower``/``upper`` must be numeric (cast timestamps to
    ``unix_micros`` first).  Null points/bounds and empty intervals
    (``lower > upper``) never match.  Right payload columns colliding
    with left names are renamed with ``suffix``.
    """
    on = [on] if isinstance(on, str) else list(on or [])
    for side, df, needed in (
        ("left", left, on + [point]),
        ("right", right, on + [lower, upper]),
    ):
        missing = [c for c in needed if c not in df.columns]
        if missing:
            raise ValueError(f"{side} side is missing columns: {missing}")
    if band_width is None:
        row = right.select(
            F.avg(F.col(upper) - F.col(lower)).alias("w")
        ).first()
        band_width = float(row["w"] or 1.0)
        if band_width <= 0:
            band_width = 1.0
    if band_width <= 0:
        raise ValueError("band_width must be > 0")

    band = "__bdq_band"
    w = F.lit(float(band_width))
    out_names = {
        c: (c + suffix if c in left.columns else c)
        for c in right.columns
        if c not in on
    }

    l_banded = left.filter(F.col(point).isNotNull()).withColumn(
        band, F.floor(F.col(point) / w)
    )
    r_banded = (
        right.filter(
            F.col(lower).isNotNull()
            & F.col(upper).isNotNull()
            & (F.col(lower) <= F.col(upper))
        )
        .select(
            *[F.col(c) for c in on],
            *[F.col(c).alias(out_names[c]) for c in right.columns if c not in on],
            F.explode(
                F.sequence(
                    F.floor(F.col(lower) / w), F.floor(F.col(upper) / w)
                )
            ).alias(band),
        )
    )
    return (
        l_banded.join(r_banded, on + [band])
        .filter(
            F.col(point).between(
                F.col(out_names[lower]), F.col(out_names[upper])
            )
        )
        .drop(band)
    )


def key_skew_report(
    df: DataFrame,
    keys: List[str],
    top_n: int = 20,
) -> DataFrame:
    """Heavy-hitter diagnostic for a prospective shuffle key — the
    measurement you run BEFORE deciding between a plain join,
    :func:`salted_join`, or a broadcast.

    Output: the ``top_n`` heaviest key values with ``(keys..., n_rows,
    row_share, skew_factor)`` where ``row_share`` is the key's fraction
    of all rows and ``skew_factor`` is ``n_rows / mean-rows-per-key`` —
    a skew_factor near 1 means uniform keys; a key with skew_factor
    10_000 means the partition holding it gets 10_000x the average work,
    the shape where salting pays.

    Cost: one partial-combinable count aggregation + a
    ``TakeOrderedAndProject`` of ``top_n`` rows (never a full sort).
    NULL keys group together (SQL GROUP BY semantics) — deliberately, a
    NULL-surrogate hot key is the most common real-world skew.
    Deterministic: ties in count break by key value ascending.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    # lazy checkpoint: the per-key counts feed BOTH the totals aggregate
    # (broadcast side) and the top-k — without it the whole input
    # scan+aggregate subtree executes twice (verified: no ReusedExchange
    # in the plan).  The broadcast job materializes it; the main query
    # reads the stored blocks.
    counts = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows")
    ).localCheckpoint(eager=False)
    totals = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("__n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *keys,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("row_share"),
            F.round(
                F.col("n_rows") / (F.col("__total") / F.col("__n_keys")), 6
            ).alias("skew_factor"),
        )
        .orderBy(F.col("n_rows").desc(), *[F.col(k).asc_nulls_first() for k in keys])
        .limit(top_n)
    )
