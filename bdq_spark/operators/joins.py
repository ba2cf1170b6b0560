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

__all__ = ["salted_join"]

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
