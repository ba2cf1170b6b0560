"""Mergeable approximate-analytics sketches (HLL, count-min, KMV theta).

Extension surface (no reference counterpart — grusin-db/bdq core is
dataframe utilities only): at 100 TB, exact ``COUNT(DISTINCT)`` and
exact heavy-hitter counting are shuffle-bound — every distinct value
crosses the wire.  Production OLAP engines (Druid, Trino/DataSketches,
BigQuery) answer these with MERGEABLE sketches whose per-partition
state is tiny and whose merge is associative, so the plan degrades to
one map-side-combined shuffle of O(sketch) rows per group instead of
O(distinct values).  This module implements the three classics:

- **HyperLogLog** (Flajolet et al. 2007): ``m = 2^b`` registers, each
  the max leading-zero rank of hashes routed to that bucket; merge is
  per-register ``max``; estimate is the bias-corrected harmonic mean
  with the small-range linear-counting fallback.
- **Count-min** (Cormode & Muthukrishnan 2005): a ``depth x width``
  grid of counters; each item increments one cell per row; a point
  estimate is the min over rows — always an OVERestimate, with error
  ``<= e*N/width`` at probability ``1 - e^-depth``.  Merge is
  cell-wise ``+``.
- **KMV / theta** (Beyer et al. 2007; Dasgupta et al. 2016): the k
  smallest distinct hash values; ``est = (k-1) / U_(k)``; union merges
  hash sets and re-truncates; intersection counts common retained
  hashes below the combined theta.

Engine-exactness (the md5-twin recipe shared with this repo's
LSH/minhash/k-means oracles): the base hash is the first 60 bits of the
md5 hex digest (:func:`bdq_spark.operators.dedup._md5_base_hash`), all
register/cell/hash state is int64 (bucket split by bit ops, scaled
harmonic sums via ``pow(2.0, n)`` — exact powers of two — cast back to
int64), and the few float steps (one division each, plus ``ln`` in
linear counting) are single operations on exactly-representable
operands — so a DuckDB oracle replays the WHOLE sketch (routing,
registers, estimate branches) and value-hashes it.

HLL rank note: both Spark and DuckDB expose ``bin(x)`` returning the
minimal binary string of a BIGINT, so ``leading_zeros + 1`` over the
``V``-bit hash suffix is ``V + 1 - length(bin(w))`` for ``w > 0`` and
``V + 1`` for ``w = 0`` — no float log anywhere.

Scale shape (the 100 TB design):

- HLL registers: ONE shuffle of at most ``m`` rows per group after
  map-side partial ``max`` — each executor emits ``<= m`` rows no
  matter how many billions it scanned.  Finalization is ONE further
  agg folding the ``<= m`` registers per group into an array and
  closing the estimate in pure expressions (no join back onto the
  register lineage — that would rescan the table).
- Count-min cells: ONE shuffle of at most ``depth * width`` rows after
  map-side partial ``sum``.  Lookups broadcast the (tiny) item list.
- KMV: ``distinct -> orderBy -> limit k`` — Spark plans the tail as
  TakeOrderedAndProject (per-partition top-k heap + driver merge of
  ``k``-row slices), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bdq_spark.operators.dedup import _md5_base_hash

_HASH_BITS = 60  # bits of _md5_base_hash


def _hll_alpha(m: int) -> float:
    """Flajolet bias-correction constant (closed form, m >= 128).  Both
    the Spark path and the DuckDB oracle evaluate the same literal
    arithmetic ``0.7213 / (1.0 + 1.079 / m)`` in IEEE double, so the
    constant is bit-identical across engines."""
    if m < 128:
        raise ValueError("use m >= 128 so the closed-form alpha applies")
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    col: str,
    group_cols: tuple[str, ...] = (),
    b: int = 8,
) -> DataFrame:
    """HyperLogLog register table: ``group_cols + (bucket, register)``.

    ``bucket`` is the top ``b`` bits of the 60-bit md5 hash (bit shift —
    no float path); ``register`` is the max over rows of (leading zeros
    of the remaining ``60 - b`` bits) + 1.  NULLs are ignored (SQL
    ``COUNT(DISTINCT)`` semantics).  Registers MERGE by per-bucket max:
    ``hll_registers(a.unionAll(b))`` equals the per-bucket max of the
    two register tables (tested), which is what makes the sketch a
    partial-aggregable accumulator at 100 TB.
    """
    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16]: {b}")
    v = _HASH_BITS - b  # suffix bits
    h = _md5_base_hash(F.col(col).cast("string"))
    bucket = F.shiftright(h, v)
    w = h.bitwiseAND(F.lit((1 << v) - 1))
    rank = F.when(w == 0, F.lit(v + 1)).otherwise(
        F.lit(v + 1) - F.length(F.bin(w))
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(*group_cols, bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("register"))
    )


def _pow2_long(n: Column) -> Column:
    """Exact ``2^n`` as int64 for ``0 <= n <= 62`` via ``pow(2.0, n)``:
    powers of two are exact doubles, and the long cast is exact below
    2^63 — identical in Spark and DuckDB (shiftleft can't take a column
    shift amount, so this is the portable form)."""
    return F.pow(F.lit(2.0), n).cast("long")


def hll_estimate(
    registers: DataFrame,
    b: int = 8,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Finalize HLL registers into one row per group:
    ``(group_cols..., est, zeros, rmax)``.

    Exactness: with ``Rmax = max(register)`` (``<= 60 - b + 1``), the
    harmonic denominator is scaled by ``2^Rmax`` so it is an exact
    int64 sum ``S = sum(2^(Rmax - M_j)) + zeros * 2^Rmax`` (at most
    ``m * 2^(61-b)`` = 2^61 for b=8), and the raw estimate is ONE
    double division of exact operands ``alpha * m^2 * 2^Rmax / S``.
    Small-range correction: when ``zeros > 0`` and the raw estimate is
    ``<= 2.5m``, linear counting ``m * ln(m / zeros)`` applies (exact
    integer operands; libm ``ln`` differences are sub-ulp and vanish
    under the round-4 output).
    """
    m = 1 << b
    # ONE pass over the register table: fold the <= m registers per
    # group into an array (bounded driver-free state), then finalize in
    # pure expressions.  The alternative (max-agg rmax, join back, sum)
    # recomputes the register lineage — at 100 TB that is a second full
    # table scan for no reason.
    folded = registers.groupBy(*group_cols).agg(
        F.collect_list("register").alias("_regs"),
        F.count(F.lit(1)).alias("present"),
    )
    s = folded.select(
        *group_cols,
        F.col("present"),
        F.array_max("_regs").alias("rmax"),
        F.col("_regs"),
    ).select(
        *group_cols,
        F.col("present"),
        F.col("rmax"),
        F.aggregate(
            F.col("_regs"),
            F.lit(0).cast("long"),
            lambda acc, r: acc + _pow2_long(F.col("rmax") - r),
        ).alias("s_present"),
    )
    zeros = F.lit(m) - F.col("present")
    s_total = (F.col("s_present") + zeros * _pow2_long(F.col("rmax"))).cast(
        "double"
    )
    est_raw = (
        F.lit(_hll_alpha(m) * m * m) * F.pow(F.lit(2.0), F.col("rmax")) / s_total
    )
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((zeros > 0) & (est_raw <= F.lit(2.5 * m)), lc).otherwise(
        est_raw
    )
    return s.select(
        *group_cols,
        F.round(est, 4).alias("est"),
        zeros.alias("zeros"),
        F.col("rmax"),
    )


def hll_distinct(
    df: DataFrame,
    col: str,
    group_cols: tuple[str, ...] = (),
    b: int = 8,
) -> DataFrame:
    """Convenience: registers + finalize in one call."""
    return hll_estimate(hll_registers(df, col, group_cols, b), b, group_cols)


def countmin_cells(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min grid as rows ``(r, cell, cnt)``.

    Row ``r``'s hash of item ``x`` is the 60-bit md5 of ``"r:x"`` mod
    ``width`` — row independence from domain separation, exactly
    reproducible in any engine with md5.  One shuffle of at most
    ``depth * width`` rows after map-side partial sum.
    """
    with_r = df.where(F.col(col).isNotNull()).select(
        F.col(col).cast("string").alias("item"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
    )
    cell = F.pmod(
        _md5_base_hash(
            F.concat_ws(":", F.col("r").cast("string"), F.col("item"))
        ),
        F.lit(width),
    )
    return (
        with_r.select("r", cell.alias("cell"))
        .groupBy("r", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_lookup(
    cells: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point estimates for a (tiny, broadcast) item list: the min over
    rows of each item's cell count.  Output: ``items.* + (cms_est,)``.
    By construction ``cms_est >= true count`` for every item that was
    counted into ``cells``."""
    keep = [c for c in items.columns if c != col]
    probes = items.select(
        F.col(col).cast("string").alias("item"),
        *keep,
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
    )
    cell = F.pmod(
        _md5_base_hash(
            F.concat_ws(":", F.col("r").cast("string"), F.col("item"))
        ),
        F.lit(width),
    )
    probes = probes.withColumn("cell", cell)
    return (
        cells.join(F.broadcast(probes), ["r", "cell"])
        .groupBy("item", *keep)
        .agg(F.min("cnt").alias("cms_est"))
        .withColumnRenamed("item", col)
    )


def kmv_sketch(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """The k smallest DISTINCT 60-bit md5 hashes of ``col`` as a one-
    column (``h``) DataFrame.  ``distinct -> orderBy -> limit`` — Spark
    plans the tail as TakeOrderedAndProject (per-partition heap of k,
    driver merge of k-row slices), never a global sort."""
    return (
        df.where(F.col(col).isNotNull())
        .select(_md5_base_hash(F.col(col).cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_estimate_col(k: int) -> Column:
    """Aggregation column for a FULL k-row sketch: ``(k-1) * 2^60 /
    h_(k)``; use inside ``sketch.agg(...)``.  ``(k-1) * 2^60`` is an
    exact double whenever ``k - 1`` fits in 53 mantissa bits (always,
    for practical k — the 2^60 factor only shifts the exponent); the
    int64 -> double conversion of ``h_(k)`` is IEEE round-to-nearest in
    both engines, so the single division is engine-identical."""
    return F.round(
        F.lit(float(k - 1) * float(1 << _HASH_BITS)) / F.max("h").cast("double"),
        4,
    )


def kmv_set_ops(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = 64
) -> DataFrame:
    """Union + intersection estimates from two k-row KMV sketches.

    Union: re-truncate the merged hash set to its k smallest; same
    estimator.  Intersection (theta style): with ``thetaU = min(max_a,
    max_b)``, count hashes retained by BOTH sketches strictly below
    ``thetaU``; ``est = |common| * 2^60 / thetaU``.  Driver-free: the
    sketches are k-row DataFrames, every join is broadcast.  Output:
    one row ``(est_union, est_intersect)``.
    """
    union_est = (
        sketch_a.unionAll(sketch_b)
        .distinct()
        .orderBy("h")
        .limit(k)
        .agg(kmv_estimate_col(k).alias("est_union"))
    )
    theta = (
        sketch_a.agg(F.max("h").alias("ta"))
        .crossJoin(F.broadcast(sketch_b.agg(F.max("h").alias("tb"))))
        .select(F.least("ta", "tb").alias("theta"))
    )
    inter_est = (
        sketch_a.join(sketch_b, "h")
        .crossJoin(F.broadcast(theta))
        .where(F.col("h") < F.col("theta"))
        .groupBy("theta")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .select(
            F.round(
                F.col("n_common").cast("double")
                * F.lit(float(1 << _HASH_BITS))
                / F.col("theta").cast("double"),
                4,
            ).alias("est_intersect")
        )
    )
    return union_est.crossJoin(F.broadcast(inter_est))


def sampled_quantiles(
    df: DataFrame,
    value_col: str,
    key_columns: list,
    k: int = 256,
    probs: tuple = (0.25, 0.5, 0.75, 0.95),
    salt: str = "",
) -> DataFrame:
    """Distributed quantile ESTIMATION from the deterministic bottom-k
    hash sample — the sampling member of the sketch family: because
    :func:`bdq_spark.operators.splits.fixed_size_sample`'s hash order
    is a fixed pseudo-random permutation of the keys, its k rows are a
    uniform sample, and nearest-rank quantiles within the sorted sample
    estimate the population quantiles with standard sampling error
    (~1/sqrt(k) in rank space) — while touching only a per-partition
    top-k (TakeOrderedAndProject), never a global sort of the table.

    Engine-exact: the sample membership is a deterministic hash order,
    the in-sample quantile is pure integer indexing
    (``sorted[floor(p * (n-1))]``, 0-based), and the sample is bounded
    (one ``collect_list`` of <= k values inside a 1-row aggregate) — so
    a SQL oracle replays the WHOLE estimator.  Output: one row,
    ``sample_n`` + one ``p<nn>`` column per requested quantile.
    """
    from bdq_spark.operators.splits import fixed_size_sample

    if not 0 < k:
        raise ValueError("k must be positive")
    samp = fixed_size_sample(df, k, key_columns, salt=salt)
    agg = samp.agg(
        F.sort_array(F.collect_list(value_col)).alias("v"),
        F.count(F.lit(1)).alias("n"),
    )
    cols = []
    names = []
    from decimal import Decimal

    for p in probs:
        # name from the FULL fractional digits (0.5 -> p50, 0.975 ->
        # p975) — the old [:2] truncation mislabeled 3-decimal probs
        # (0.975 -> p97) and collided (0.25 vs 0.255 -> both p25).
        # Normalize through Decimal at 9 fractional places so float
        # arithmetic noise (0.1 + 0.2 -> '0.30000000000000004' ->
        # p30000000000000004) and scientific-notation reprs (1e-05)
        # both derive the intended name instead of garbage/rejection.
        if not 0 < p < 1:
            raise ValueError(f"prob {p!r} must be in (0, 1)")
        d = Decimal(str(p)).quantize(Decimal("1e-9")).normalize()
        if d <= 0 or d >= 1:
            raise ValueError(
                f"prob {p!r} rounds to {d} at 9 decimal places; "
                "quantile probs must stay inside (0, 1) at that "
                "precision to derive a column name"
            )
        s = format(d, "f")  # plain notation, trailing zeros stripped
        name = "p" + s[2:].ljust(2, "0")
        names.append(name)
        idx = F.floor(F.lit(float(p)) * (F.col("n") - 1)).cast("int")
        cols.append(F.col("v")[idx].alias(name))
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate quantile column names: {names}")
    return agg.select(F.col("n").alias("sample_n"), *cols)


def countmin_join_size(cells_a: DataFrame, cells_b: DataFrame) -> DataFrame:
    """Join-cardinality estimation from two count-min sketches (Cormode
    & Muthukrishnan's inner-product estimator — the sketch trick query
    optimizers use to size an equi-join WITHOUT running it): with both
    grids built over the join key at the same (depth, width), row r's
    estimate is ``sum_cell cntA * cntB`` and the final estimate is the
    MIN over rows — always an OVERestimate of ``|A join B| = sum_k
    fA(k) * fB(k)`` (collisions only add).  All arithmetic is exact
    int64 (products of counts), so the estimate is engine-exact and a
    SQL oracle replays it.  Cost: one (depth x width)-row join — the
    sketches, never the tables.  Returns one row ``(est,)``."""
    a = cells_a.select("r", "cell", F.col("cnt").alias("cnt_a"))
    b = cells_b.select("r", "cell", F.col("cnt").alias("cnt_b"))
    per_row = (
        a.join(b, ["r", "cell"])
        .groupBy("r")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("ip"))
    )
    return per_row.agg(F.min("ip").alias("est"))
