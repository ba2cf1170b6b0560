"""Deterministic, key-stable dataset splitting and sampling.

Training-data pipelines need train/val/test assignment that is (a)
reproducible across runs and engines — no RNG, no seed files — and (b)
stable per KEY, so re-ingesting, re-partitioning, or deduplicating a
100 TB corpus never migrates an example across the split boundary (the
classic eval-leakage bug with ``randomSplit``, which reshuffles
assignment every run and every repartition).

Mechanism: bucket = first 8 hex chars of ``md5(salt <US> key...)`` as an
integer, mod 1e6; cumulative weight thresholds map buckets to named
splits.  Everything is a built-in column expression — JVM-side, zero
shuffle, streams through the scan — and the exact same arithmetic is
expressible in ANSI SQL (DuckDB oracle-checked), so the split is
portable across engines.  md5 is used as a uniform hash, not for
security.  The reference has no sampling/splitting surface at all
(SURVEY.md §2.3); this is a §2.4-class extension.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket_column",
    "hash_split_column",
    "hash_split",
    "deterministic_sample",
    "deterministic_sample_by",
    "weighted_mixture",
    "temperature_mixture",
    "fixed_size_sample",
]

#: bucket-space resolution; fractions are honored to 1e-6
N_BUCKETS = 1_000_000

#: ASCII unit separator between salt and key parts (collision guard)
_SEP = "\x1f"

#: rendering for NULL key parts (mirrors the surrogate-key convention)
_NULL = "@~<null>~@"


def hash_bucket_column(key_columns: List[str], salt: str = "") -> Column:
    """Uniform bucket in ``[0, N_BUCKETS)`` from the md5 of the rendered
    key, deterministic across runs, partitionings, and engines."""
    if not key_columns:
        raise ValueError("key_columns must name at least one column")
    parts: List[Column] = [F.lit(salt)]
    for c in key_columns:
        parts.append(F.lit(_SEP))
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit(_NULL)))
    rendered = F.concat(*parts)
    return (
        F.conv(F.substring(F.md5(rendered), 1, 8), 16, 10).cast("long")
        % N_BUCKETS
    )


def hash_split_column(
    key_columns: List[str], weights: Dict[str, float], salt: str = ""
) -> Column:
    """Named-split label column from normalized ``weights`` (e.g.
    ``{"train": 0.9, "val": 0.05, "test": 0.05}``).  Insertion order of
    ``weights`` defines the bucket layout — keep it fixed for stability."""
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be >= 0")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to > 0")

    bucket = hash_bucket_column(key_columns, salt=salt)
    names = list(weights)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name] / total
        threshold = int(round(acc * N_BUCKETS))
        cond = bucket < F.lit(threshold)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def hash_split(
    df: DataFrame,
    weights: Dict[str, float],
    key_columns: List[str],
    split_column: str = "split",
    salt: str = "",
) -> DataFrame:
    """Attach a key-stable split label column; no shuffle, no RNG."""
    return df.withColumn(
        split_column, hash_split_column(key_columns, weights, salt=salt)
    )


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_columns: List[str],
    salt: str = "",
) -> DataFrame:
    """Key-stable ~``fraction`` sample: a key is in or out forever (and
    in every engine), unlike ``df.sample`` which redraws per run.
    Nested samples with the same salt: a 1% sample is a subset of a 10%
    sample (bucket < threshold nests)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    threshold = int(round(fraction * N_BUCKETS))
    return df.filter(
        hash_bucket_column(key_columns, salt=salt) < F.lit(threshold)
    )


def deterministic_sample_by(
    df: DataFrame,
    stratum_column: str,
    fractions: Dict[str, float],
    key_columns: List[str],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Key-stable stratified sampling — ``df.sampleBy`` without the RNG:
    each stratum keeps ~its fraction, rebalancing a skewed corpus (e.g.
    downsample the dominant language) reproducibly across runs and
    engines.  Strata missing from ``fractions`` keep ``default_fraction``
    (0 = drop).  Same nesting property as :func:`deterministic_sample`
    per stratum; the stratum value participates via the column, not the
    hash, so a row's bucket is stable even if its stratum is re-labeled.
    """
    for frac in list(fractions.values()) + [default_fraction]:
        if not 0.0 <= frac <= 1.0:
            raise ValueError("fractions must be in [0, 1]")
    if stratum_column not in df.columns:
        raise ValueError(f"column {stratum_column!r} not in DataFrame")

    bucket = hash_bucket_column(key_columns, salt=salt)
    threshold = F.lit(int(round(default_fraction * N_BUCKETS)))
    for value, frac in fractions.items():
        threshold = F.when(
            F.col(stratum_column).eqNullSafe(F.lit(value)),
            F.lit(int(round(frac * N_BUCKETS))),
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def weighted_mixture(
    df: DataFrame,
    stratum_column: str,
    weights: Dict[str, float],
    key_columns: List[str],
    default_weight: float = 1.0,
    salt: str = "",
    copy_column: str = "copy_idx",
) -> DataFrame:
    """Data-recipe mixture sampling: each stratum's rows are emitted with
    expected multiplicity = its weight — fractional weights DOWN-sample
    (like :func:`deterministic_sample_by`), weights > 1 UP-sample by
    repeating rows with a distinct ``copy_column`` index (0-based), so a
    training-order shuffle downstream spreads the copies instead of
    clustering them.  This is the domain/language re-weighting step of
    an LLM data recipe ("web x0.5, wiki x3") expressed as one
    deterministic pass.

    A row of weight ``w`` yields ``floor(w)`` copies plus one more iff
    its md5 bucket falls under ``frac(w)`` — key-stable, so re-running,
    re-partitioning, or changing OTHER strata's weights never changes
    which rows carry the fractional extra copy.  Pure expressions + one
    ``explode`` of a ``sequence`` literal-bounded by ``ceil(max weight)``
    — no shuffle, no RNG, linear output; engine-portable (same md5
    arithmetic as :func:`hash_split`, DuckDB oracle-checked).
    """
    for w in list(weights.values()) + [default_weight]:
        if w < 0:
            raise ValueError("weights must be >= 0")
    if stratum_column not in df.columns:
        raise ValueError(f"column {stratum_column!r} not in DataFrame")

    def parts(w: float):
        base = int(w)
        return base, int(round((w - base) * N_BUCKETS))

    bucket = hash_bucket_column(key_columns, salt=salt)
    d_base, d_thresh = parts(default_weight)
    base_expr = F.lit(d_base)
    thresh_expr = F.lit(d_thresh)
    for value, w in weights.items():
        v_base, v_thresh = parts(w)
        cond = F.col(stratum_column).eqNullSafe(F.lit(value))
        base_expr = F.when(cond, F.lit(v_base)).otherwise(base_expr)
        thresh_expr = F.when(cond, F.lit(v_thresh)).otherwise(thresh_expr)
    copies = base_expr + F.when(bucket < thresh_expr, 1).otherwise(0)
    return (
        df.withColumn("__copies", copies)
        .filter(F.col("__copies") > 0)
        .withColumn(
            copy_column,
            F.explode(F.sequence(F.lit(0), F.col("__copies") - 1)),
        )
        .drop("__copies")
    )


def temperature_mixture(
    df: DataFrame,
    stratum_column: str,
    key_columns: List[str],
    alpha: float = 0.5,
    target_total: Optional[int] = None,
    salt: str = "",
    copy_column: str = "copy_idx",
) -> DataFrame:
    """Temperature-based mixture sampling: re-weight strata so stratum
    ``s`` contributes in proportion to ``n_s**alpha`` (the multilingual
    up/down-sampling recipe of XLM/mBERT — ``alpha=1`` keeps natural
    proportions, ``alpha=0`` equalizes strata, values between trade the
    two).  Unlike :func:`weighted_mixture` the recipe is derived FROM
    THE DATA: per-row multiplicity is

        m_s = T * n_s**(alpha-1) / sum_t(n_t**alpha)

    where ``T`` (``target_total``) defaults to the input row count, so
    the expected output size equals the input.  Rare strata get
    ``m_s > 1`` (key-stable fractional copies with ``copy_column``
    indices, exactly the :func:`weighted_mixture` mechanics); dominant
    strata get ``m_s < 1`` (deterministic md5 down-sampling).

    Fully lazy and collect-free: stratum counts are a small aggregate
    broadcast back onto the rows; multiplicities are rounded to 6 dp so
    the sampling decisions are float-portable across engines.  One
    shuffle (the stratum count), one broadcast join, one explode.
    """
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    if stratum_column not in df.columns:
        raise ValueError(f"column {stratum_column!r} not in DataFrame")
    # lazy checkpoint: the stratum counts feed BOTH the scalar totals
    # (broadcast side) and the multiplicity table — without it the
    # input scan+aggregate subtree executes twice
    counts = df.groupBy(stratum_column).agg(
        F.count(F.lit(1)).alias("__n")
    ).localCheckpoint(eager=False)
    tot = counts.agg(
        F.sum("__n").alias("__total"),
        F.sum(F.pow(F.col("__n").cast("double"), F.lit(alpha))).alias("__s"),
    )
    t_expr = (
        F.lit(float(target_total))
        if target_total is not None
        else F.col("__total").cast("double")
    )
    mult = counts.crossJoin(F.broadcast(tot)).select(
        F.col(stratum_column).alias("__stratum"),
        F.round(
            t_expr
            * F.pow(F.col("__n").cast("double"), F.lit(alpha - 1.0))
            / F.col("__s"),
            6,
        ).alias("__m"),
    )
    bucket = hash_bucket_column(key_columns, salt=salt)
    base = F.floor(F.col("__m")).cast("int")
    thresh = F.round((F.col("__m") - base) * N_BUCKETS, 0).cast("long")
    copies = base + F.when(bucket < thresh, 1).otherwise(0)
    return (
        df.join(
            F.broadcast(mult),
            F.col(stratum_column).eqNullSafe(F.col("__stratum")),
        )
        .withColumn("__copies", copies)
        .filter(F.col("__copies") > 0)
        .withColumn(
            copy_column,
            F.explode(F.sequence(F.lit(0), F.col("__copies") - 1)),
        )
        .drop("__stratum", "__m", "__copies")
    )


def fixed_size_sample(
    df: DataFrame,
    n_per_stratum: int,
    key_columns: List[str],
    stratum_column: Optional[str] = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic EXACT-size sample: the ``n_per_stratum`` rows with
    the smallest md5 hash per stratum (or globally when
    ``stratum_column`` is None) — the eval-set construction shape,
    where "give me exactly 1000 docs per language, the same 1000 every
    run" matters more than an approximate fraction.

    Because the hash order is a fixed pseudo-random permutation of the
    keys, this IS a uniform sample, and it NESTS: the n=100 sample is a
    subset of the n=1000 sample (same ordering, shorter prefix) —
    growing an eval set never discards previously selected members.
    Ties (duplicate keys) break by the full hash then the key columns,
    so the result is total-order deterministic.

    Cost: one window (rank over hash within stratum).  The global
    (``stratum_column=None``) variant does NOT pay a single-partition
    sort of the whole table: it pre-selects per-HASH-BUCKET top-n first
    (a parallel window over ~``spark.sql.shuffle.partitions`` balanced
    buckets of the same hash), then ranks only the ``buckets * n``
    survivors globally — the global smallest-n rows are necessarily
    among their bucket's smallest n, so the result is identical to the
    naive global window (property-tested), while the single-partition
    stage touches a bounded row count at any table size.
    """
    if n_per_stratum <= 0:
        raise ValueError("n_per_stratum must be positive")
    rendered = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL))
        for c in key_columns
    ]
    h = F.md5(F.concat(F.lit(salt), *sum([[F.lit(_SEP), r] for r in rendered], [])))
    order = [h] + [F.col(c) for c in key_columns]
    if stratum_column is not None:
        w = Window.partitionBy(stratum_column).orderBy(*order)
        return (
            df.withColumn("__rank", F.row_number().over(w))
            .filter(F.col("__rank") <= n_per_stratum)
            .drop("__rank")
        )
    spark = df.sparkSession
    try:
        n_buckets = int(
            spark.conf.get("spark.sql.shuffle.partitions", "200")
        )
    except ValueError:  # e.g. "auto" on AQE-managed platforms
        n_buckets = max(spark.sparkContext.defaultParallelism, 16)
    bucket = F.pmod(F.xxhash64(h), F.lit(n_buckets))
    w_bucket = Window.partitionBy(bucket).orderBy(*order)
    pre = (
        df.withColumn("__brank", F.row_number().over(w_bucket))
        .filter(F.col("__brank") <= n_per_stratum)
        .drop("__brank")
    )
    w_global = Window.partitionBy().orderBy(*order)
    return (
        pre.withColumn("__rank", F.row_number().over(w_global))
        .filter(F.col("__rank") <= n_per_stratum)
        .drop("__rank")
    )
