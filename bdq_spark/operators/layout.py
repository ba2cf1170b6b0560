"""Z-order data layout for multi-dimensional scan locality.

Extension surface (no reference counterpart — grusin-db/bdq has no
layout management; the public analogue is Delta Lake's ``OPTIMIZE
ZORDER BY`` and the classic Morton-order literature): at 100 TB, scan
cost is dominated by how much data a filter can SKIP.  Parquet
row-group min/max statistics prune perfectly when the table is sorted
by the filtered column — but a single sort key only serves one
predicate family.  Interleaving the bits of several dimensions into
one Morton (Z-order) key gives every participating dimension partial
locality: a range predicate on ANY of them maps to a bounded number of
Z-key ranges, so each output file's bounding box stays small in every
dimension and min/max pruning works for all of them at once.

Exactness design (so the registered entry is value-hashable): the
usual normalization step (rank or quantile bucketing) is replaced by
INTEGER min/max bucketing —

    bucket = (v - min) * nbuckets // (max - min + 1)

over integer-typed dimension expressions (epoch days, money cents,
...).  Everything is int64 arithmetic: any engine recomputes the same
buckets, the same interleaved key, bit for bit.  The cost is skew
sensitivity (a dimension with hot ranges fills few buckets — the known
trade-off of linear Z-ordering vs rank-based; Delta's OPTIMIZE makes
the same choice with range boundaries), which is the documented
contract, not a surprise.

Scale shape: one min/max aggregate over the dimension expressions
(single reduced row — a bounded driver materialization in the
``ivf.py`` collect class), then the key is a pure codegen projection,
then ONE range-partitioned sort — exactly the shuffle a layout rewrite
must pay, and nothing else.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_layout"]


def _interleave(buckets: Sequence[Column], bits: int) -> Column:
    """Morton-interleave ``len(buckets)`` integer bucket columns of
    ``bits`` bits each: bit ``i`` of dimension ``j`` lands at position
    ``i * ndims + j`` — a sum of ``bits x ndims`` shift/mask terms that
    whole-stage codegen folds into straight-line long arithmetic."""
    nd = len(buckets)
    out = F.lit(0).cast("long")
    for j, b in enumerate(buckets):
        for i in range(bits):
            out = out + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)), i * nd + j
            )
    return out


def zorder_key(
    df: DataFrame,
    dims: Sequence[Tuple[str, Column]],
    bits: int = 8,
    key_name: str = "zkey",
) -> DataFrame:
    """Append the exact Z-order key column for ``dims`` (name, integer
    expression) pairs.

    Each dimension expression must already be integral (cast dates to
    epoch days, money to cents, ... at the call site — the caller
    knows the exact integerization its domain needs); non-integral
    types raise rather than silently rounding.  ``bits`` per dimension
    caps ``bits * len(dims)`` at 63 so the key stays a positive int64.
    """
    if not dims:
        raise ValueError("need at least one dimension")
    if not 1 <= bits <= 16:
        raise ValueError("bits must be in [1, 16]")
    if bits * len(dims) > 63:
        raise ValueError(
            f"bits * ndims = {bits * len(dims)} exceeds int64 key space"
        )
    names = [n for n, _ in dims]
    probe = df.select(*[e.alias(n) for n, e in dims])
    for f in probe.schema.fields:
        if f.dataType.simpleString() not in ("int", "bigint", "smallint",
                                             "tinyint"):
            raise ValueError(
                f"dimension {f.name!r} is {f.dataType.simpleString()}, "
                "not integral — integerize it at the call site"
            )

    # one reduced row of exact bounds (bounded driver materialization,
    # same class as the IVF centroid collect)
    bounds = probe.agg(
        *[F.min(n).alias(f"lo_{n}") for n in names],
        *[F.max(n).alias(f"hi_{n}") for n in names],
    ).first()
    nb = 1 << bits
    buckets = []
    for n, e in dims:
        lo = int(bounds[f"lo_{n}"])
        hi = int(bounds[f"hi_{n}"])
        span = hi - lo + 1
        # floor((v - lo) * nb / span) rides through a double division
        # (Spark long/long is double), so EXACTNESS needs two bounds:
        # the numerator must stay below 2^53 (span <= 2^(52-bits)) and
        # the quotient's ulp must stay below 1/span (span <= 2^44) —
        # then the correctly-rounded division cannot cross an integer
        # and the floor is the true rational floor in every engine
        if span > min(1 << 44, 1 << (52 - bits)):
            raise ValueError(f"dimension {n!r} span {span} too large")
        buckets.append(
            F.floor(
                ((e.cast("long") - F.lit(lo)) * nb) / F.lit(span)
            ).cast("long")
        )
    return df.withColumn(key_name, _interleave(buckets, bits))


def zorder_layout(
    df: DataFrame,
    dims: Sequence[Tuple[str, Column]],
    bits: int = 8,
    num_partitions: Optional[int] = None,
    key_name: str = "zkey",
) -> DataFrame:
    """The layout rewrite: Z-key, range-partition on it, sort within
    partitions — write the result with ``partition-file = z-run`` and
    every output file covers a small bounding box in EVERY dimension,
    so parquet min/max pruning serves range predicates on any of them.
    One shuffle (the range exchange) — the unavoidable cost of
    re-clustering — and nothing else.
    """
    keyed = zorder_key(df, dims, bits=bits, key_name=key_name)
    if num_partitions is not None:
        keyed = keyed.repartitionByRange(num_partitions, key_name)
    else:
        keyed = keyed.repartitionByRange(key_name)
    return keyed.sortWithinPartitions(key_name)
