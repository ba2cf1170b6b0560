"""Single-pass column profiler — data-quality summary statistics.

Extension beyond the reference surface (the reference checks specific
rules — PK uniqueness `bdq/dataframe.py:184-195`, FK integrity
`bdq/dataframe.py:114-140` — but has no whole-table profile).  This is
the standard first step of any data-quality or training-data pipeline:
per-column null rates, cardinalities, ranges and moments.

Scale design (100 TB):

- ONE aggregation job for the whole profile: every statistic of every
  column is an expression in a single ``df.agg(...)`` — one scan, full
  map-side partial aggregation, a 1-row result.  No per-column jobs, no
  driver loop over columns (`describe()`-style implementations run one
  pass per statistic family).
- Distinct counts default to HyperLogLog++ (``approx_count_distinct``,
  configurable rsd) — exact distinct over many columns needs an
  ``Expand`` of the input (rows × columns blow-up in the shuffle), which
  is exactly what you don't want at 100 TB.  ``approx_distinct=False``
  is available where the blow-up is affordable.
- Percentiles use ``percentile_approx`` (t-digest-style mergeable
  sketch), numeric moments use built-in ``avg``/``stddev`` — everything
  partial-aggregates, nothing collects.

The 1-row aggregate is reshaped to one-row-per-column with an
``inline(array(struct(...)))`` projection — plan-side, zero extra jobs.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile_table", "numeric_correlations", "numeric_histogram", "profile_drift", "group_quantiles"]

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: Optional[List[str]] = None,
    approx_distinct: bool = True,
    rsd: float = 0.05,
    percentiles: Sequence[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Per-column profile computed in ONE aggregation pass.

    Output (one row per profiled column, input order preserved)::

        column string, dtype string, n_rows long, n_nulls long,
        null_rate double, n_distinct long, min_value string,
        max_value string, mean double, stddev double,
        percentiles array<double>

    ``n_distinct`` excludes NULL (SQL ``COUNT(DISTINCT c)`` semantics;
    approximate by default, see module docstring).  ``min_value`` /
    ``max_value`` are the values cast to string so the schema is
    column-type-agnostic; ``mean``/``stddev``/``percentiles`` are NULL
    for non-numeric columns.
    """
    if not 0 < rsd < 1:
        raise ValueError("rsd must be in (0, 1)")
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = list(fields)
    unknown = [c for c in columns if c not in fields]
    if unknown:
        raise ValueError(f"columns not in DataFrame: {unknown}")

    pct = F.array(*[F.lit(float(p)) for p in percentiles])
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for i, c in enumerate(columns):
        col = F.col(c)
        is_num = isinstance(fields[c], _NUMERIC_TYPES)
        aggs.append(
            F.count(F.when(col.isNull(), F.lit(1))).alias(f"__{i}_nulls")
        )
        distinct = (
            F.approx_count_distinct(col, rsd)
            if approx_distinct
            else F.count_distinct(col)
        )
        aggs.append(distinct.alias(f"__{i}_distinct"))
        aggs.append(F.min(col).cast("string").alias(f"__{i}_min"))
        aggs.append(F.max(col).cast("string").alias(f"__{i}_max"))
        if is_num:
            dbl = col.cast("double")
            aggs.append(F.avg(dbl).alias(f"__{i}_mean"))
            aggs.append(F.stddev(dbl).alias(f"__{i}_stddev"))
            aggs.append(F.percentile_approx(dbl, pct).alias(f"__{i}_pct"))

    one_row = df.agg(*aggs)

    null_dbl = F.lit(None).cast("double")
    null_arr = F.lit(None).cast("array<double>")
    structs = []
    for i, c in enumerate(columns):
        is_num = isinstance(fields[c], _NUMERIC_TYPES)
        n_rows = F.col("__n_rows")
        n_nulls = F.col(f"__{i}_nulls")
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(fields[c].simpleString()).alias("dtype"),
                n_rows.alias("n_rows"),
                n_nulls.alias("n_nulls"),
                F.when(n_rows > 0, n_nulls / n_rows)
                .otherwise(null_dbl)
                .alias("null_rate"),
                F.col(f"__{i}_distinct").alias("n_distinct"),
                F.col(f"__{i}_min").alias("min_value"),
                F.col(f"__{i}_max").alias("max_value"),
                (F.col(f"__{i}_mean") if is_num else null_dbl).alias("mean"),
                (F.col(f"__{i}_stddev") if is_num else null_dbl).alias("stddev"),
                (F.col(f"__{i}_pct") if is_num else null_arr).alias("percentiles"),
            )
        )
    return one_row.select(F.inline(F.array(*structs)))


def numeric_correlations(
    df: DataFrame,
    columns: List[str],
    precision: int = 18,
    scale: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlation matrix in ONE aggregation pass.

    Output: one row per unordered column pair ``(col_x, col_y, n,
    corr)`` with ``col_x < col_y`` lexicographically and ``corr``
    rounded to 6 dp.

    Why not ``df.stat.corr``: that API computes one pair per JOB (k²/2
    scans of a 100 TB table).  Here every pair's moments — Σx, Σx²,
    Σxy — are expressions in a single ``agg``, so the whole matrix
    costs one scan with full map-side partial aggregation, and the
    result never touches the driver.

    Determinism: the moment sums run over exact ``decimal(precision,
    scale)`` casts (float addition is not associative — double sums
    change with partition order), then the closed-form correlation is
    evaluated in double from those exact sums.  Rows where ANY profiled
    column is NULL are excluded (pairwise-complete would make n differ
    per pair; listwise keeps the matrix consistent — the standard
    trade).
    """
    if len(columns) < 2:
        raise ValueError("need at least two columns")
    dec = f"decimal({precision},{scale})"
    # decimal multiplication doubles precision/scale and would overflow
    # the 38-digit cap when summed; bound the product scale explicitly
    prod = f"decimal(38,{2 * scale})"
    clean = df.na.drop(subset=columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(columns):
        x = F.col(c).cast(dec)
        aggs.append(F.sum(x).alias(f"__s{i}"))
        aggs.append(F.sum((x * x).cast(prod)).alias(f"__ss{i}"))
    pairs = [
        (i, j)
        for i in range(len(columns))
        for j in range(i + 1, len(columns))
    ]
    for i, j in pairs:
        x = F.col(columns[i]).cast(dec)
        y = F.col(columns[j]).cast(dec)
        aggs.append(F.sum((x * y).cast(prod)).alias(f"__sp{i}_{j}"))
    one = clean.agg(*aggs)

    n = F.col("__n").cast("double")
    structs = []
    for i, j in pairs:
        sx = F.col(f"__s{i}").cast("double")
        sy = F.col(f"__s{j}").cast("double")
        sxx = F.col(f"__ss{i}").cast("double")
        syy = F.col(f"__ss{j}").cast("double")
        sxy = F.col(f"__sp{i}_{j}").cast("double")
        cov = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        corr = F.when(
            (vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)
        )  # NULL for zero-variance columns (corr undefined)
        a, b = sorted((columns[i], columns[j]))
        # flip is sign-free: corr(x,y) == corr(y,x)
        structs.append(
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.col("__n").alias("n"),
                F.round(corr, 6).alias("corr"),
            )
        )
    return one.select(F.inline(F.array(*structs)))


def numeric_histogram(
    df: DataFrame,
    column: str,
    bins: int = 20,
    scale: int = 2,
) -> DataFrame:
    """Equi-width histogram of a numeric column in two passes (bounds,
    then bucket counts) with NO driver collect: the 1-row min/max
    aggregate is broadcast back onto the scan and the bucket index is
    computed in scaled-INTEGER arithmetic — ``(value - min) * bins``
    over the scaled span — so bucket boundaries are bit-identical
    across engines (double-only bucketing puts edge values in different
    buckets depending on the engine's rounding).

    ``scale`` is the column's decimal resolution (2 for money).  Output:
    one row per non-empty bucket — ``(bucket, lo, hi, n_rows)`` with
    ``lo``/``hi`` rounded to 6 dp; the top bucket is closed (max lands
    in ``bins - 1``).  NULLs are excluded.  A zero-width column (all
    values equal) degenerates to a single bucket 0.
    """
    if bins <= 0:
        raise ValueError("bins must be positive")
    mul = 10 ** scale
    scaled = F.round(F.col(column).cast("double") * mul).cast("long")
    src = df.filter(F.col(column).isNotNull()).select(
        scaled.alias("__v")
    ).localCheckpoint(eager=False)
    bounds = src.agg(
        F.min("__v").alias("__lo"), F.max("__v").alias("__hi")
    )
    span = F.col("__hi") - F.col("__lo")
    idx = F.when(span <= 0, F.lit(0)).otherwise(
        F.least(
            F.lit(bins - 1),
            F.floor((F.col("__v") - F.col("__lo")) * bins / span),
        )
    ).cast("int")
    return (
        src.crossJoin(F.broadcast(bounds))
        .select(
            idx.alias("bucket"),
            F.col("__lo").alias("__lo"),
            F.col("__hi").alias("__hi"),
        )
        .groupBy("bucket", "__lo", "__hi")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "bucket",
            F.round(
                (F.col("__lo") + F.col("bucket") * (F.col("__hi") - F.col("__lo")) / bins)
                / mul,
                6,
            ).alias("lo"),
            F.round(
                (F.col("__lo") + (F.col("bucket") + 1) * (F.col("__hi") - F.col("__lo")) / bins)
                / mul,
                6,
            ).alias("hi"),
            "n_rows",
        )
    )


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    null_rate_delta: float = 0.01,
    distinct_ratio_low: float = 0.5,
    distinct_ratio_high: float = 2.0,
) -> DataFrame:
    """Distribution-drift report between two :func:`profile_table`
    outputs (yesterday's profile vs today's) — the monitoring step that
    turns profiling into a quality GATE, completing the library's
    compare family: ``compare_schemas`` (structure), ``compare_dataframes``
    (rows), ``profile_drift`` (distributions).

    Joined FULL OUTER on column name, so added/removed columns surface
    as drift too.  Flags per column:

    - ``null_rate_drift`` — |null_rate_new - null_rate_old| >
      ``null_rate_delta``;
    - ``distinct_drift`` — distinct-count ratio outside
      [``distinct_ratio_low``, ``distinct_ratio_high``] (cardinality
      collapse/explosion — the classic broken-join symptom);
    - ``range_drift`` — min or max moved (new categories, outliers);
    - ``presence_drift`` — column exists on only one side;
    - ``drifted`` — any of the above.

    Both inputs are tiny (one row per column); everything is a single
    join of 1-row-per-column relations — cost is nil at any data scale
    because the heavy lifting already happened in the profile pass.
    """
    o = old.select(
        F.col("column"),
        F.col("null_rate").alias("null_rate_old"),
        F.col("n_distinct").alias("n_distinct_old"),
        F.col("min_value").alias("min_old"),
        F.col("max_value").alias("max_old"),
    )
    n = new.select(
        F.col("column"),
        F.col("null_rate").alias("null_rate_new"),
        F.col("n_distinct").alias("n_distinct_new"),
        F.col("min_value").alias("min_new"),
        F.col("max_value").alias("max_new"),
    )
    j = o.join(n, "column", "full_outer")
    present_both = (
        F.col("null_rate_old").isNotNull() | F.col("n_distinct_old").isNotNull()
    ) & (
        F.col("null_rate_new").isNotNull() | F.col("n_distinct_new").isNotNull()
    )
    null_drift = (
        F.abs(
            F.coalesce(F.col("null_rate_new"), F.lit(0.0))
            - F.coalesce(F.col("null_rate_old"), F.lit(0.0))
        )
        > null_rate_delta
    )
    ratio = F.col("n_distinct_new") / F.nullif(
        F.col("n_distinct_old").cast("double"), F.lit(0.0)
    )
    distinct_drift = F.coalesce(
        (ratio < distinct_ratio_low) | (ratio > distinct_ratio_high),
        F.lit(True),  # 0 -> nonzero (or vice versa) is drift
    ) & present_both
    range_drift = (
        ~F.col("min_new").eqNullSafe(F.col("min_old"))
        | ~F.col("max_new").eqNullSafe(F.col("max_old"))
    ) & present_both
    presence_drift = ~present_both
    drifted = (
        (null_drift & present_both)
        | distinct_drift
        | range_drift
        | presence_drift
    )
    return j.select(
        "column",
        F.round("null_rate_old", 6).alias("null_rate_old"),
        F.round("null_rate_new", 6).alias("null_rate_new"),
        "n_distinct_old",
        "n_distinct_new",
        "min_old",
        "min_new",
        "max_old",
        "max_new",
        (null_drift & present_both).alias("null_rate_drift"),
        distinct_drift.alias("distinct_drift"),
        range_drift.alias("range_drift"),
        presence_drift.alias("presence_drift"),
        drifted.alias("drifted"),
    )


def group_quantiles(
    df: DataFrame,
    value_column: str,
    group_by: List[str],
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
    approx: bool = False,
    rsd_accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quantiles of a numeric column in one aggregation.

    ``approx=False`` (default) uses Spark's EXACT ``percentile`` with
    linear interpolation — engine-portable values (DuckDB's
    ``quantile_cont`` computes the identical formula, which is what the
    driver entry value-hash-checks), but the aggregate buffers each
    group's values: right for bounded-cardinality groups, wrong for a
    100 TB table with millions of rows per group.  ``approx=True``
    switches to ``percentile_approx`` (mergeable t-digest-style sketch,
    ``rsd_accuracy`` knob) — the scale path, engine-specific values.

    Output: one row per group with ``q_<pct>`` columns rounded to 6 dp.
    """
    if not quantiles:
        raise ValueError("quantiles must be non-empty")
    if any(not 0 <= q <= 1 for q in quantiles):
        raise ValueError("quantiles must be in [0, 1]")
    val = F.col(value_column).cast("double")
    aggs = []
    for q in quantiles:
        name = f"q_{int(round(q * 100))}"
        expr = (
            F.percentile_approx(val, F.lit(float(q)), F.lit(rsd_accuracy))
            if approx
            else F.percentile(val, F.lit(float(q)))
        )
        aggs.append(F.round(expr, 6).alias(name))
    return df.groupBy(*group_by).agg(*aggs)
