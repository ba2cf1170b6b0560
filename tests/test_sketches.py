"""Mergeable sketches: HLL / count-min / KMV (operators/sketches.py).

Strategy mirrors the md5-twin suites (LSH, k-means): every hash-derived
quantity is recomputed with plain-Python hashlib and compared exactly,
plus the statistical guarantees each sketch publishes are asserted on
known-cardinality inputs.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bdq_spark.operators.sketches import (
    countmin_cells,
    countmin_lookup,
    hll_distinct,
    hll_estimate,
    hll_registers,
    kmv_estimate_col,
    kmv_set_ops,
    kmv_sketch,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)


def _py_hll(values, b=8):
    """Independent straight-from-the-paper HLL over distinct values."""
    m, v = 1 << b, 60 - b
    regs: dict[int, int] = {}
    for val in set(values):
        h = _h60(val)
        bucket, w = h >> v, h & ((1 << v) - 1)
        rank = v + 1 if w == 0 else v + 1 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rank)
    rmax = max(regs.values())
    s = sum(2 ** (rmax - r) for r in regs.values()) + (m - len(regs)) * 2**rmax
    raw = (0.7213 / (1.0 + 1.079 / m)) * m * m * (2.0**rmax) / float(s)
    zeros = m - len(regs)
    est = m * math.log(m / zeros) if zeros > 0 and raw <= 2.5 * m else raw
    return round(est, 4), zeros, rmax


def test_hll_matches_python_reference(spark):
    df = spark.createDataFrame([Row(x=f"user-{i % 977}") for i in range(5000)])
    got = hll_distinct(df, "x", b=8).collect()[0]
    est, zeros, rmax = _py_hll([f"user-{i % 977}" for i in range(5000)])
    assert (got.est, got.zeros, got.rmax) == (est, zeros, rmax)


@pytest.mark.parametrize("n_distinct", [40, 400, 4000, 20000])
def test_hll_relative_error_bound(spark, n_distinct):
    # 1.04/sqrt(256) = 6.5% std error; allow 4 sigma
    df = spark.createDataFrame([Row(x=f"k{i}") for i in range(n_distinct)])
    est = hll_distinct(df, "x", b=8).collect()[0].est
    assert abs(est - n_distinct) / n_distinct < 4 * 1.04 / 16.0


def test_hll_registers_merge_by_max(spark):
    """The 100 TB property: sketching a union == max-merging sketches."""
    a = spark.createDataFrame([Row(x=f"a{i}") for i in range(300)])
    b = spark.createDataFrame(
        [Row(x=f"a{i}") for i in range(150, 300)]
        + [Row(x=f"b{i}") for i in range(200)]
    )
    merged = (
        hll_registers(a, "x")
        .unionAll(hll_registers(b, "x"))
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )
    direct = hll_registers(a.unionAll(b), "x")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    # and the merged registers finalize to the same estimate
    got = hll_estimate(merged).collect()[0]
    want = hll_estimate(direct).collect()[0]
    assert got == want


def test_hll_grouped_and_nulls(spark):
    rows = [Row(g="x", v=str(i)) for i in range(100)] + [
        Row(g="y", v=str(i)) for i in range(50)
    ] + [Row(g="y", v=None)]
    df = spark.createDataFrame(rows)
    out = {r.g: r for r in hll_distinct(df, "v", ("g",), b=8).collect()}
    ex, zx, rx = _py_hll([str(i) for i in range(100)])
    ey, zy, ry = _py_hll([str(i) for i in range(50)])
    assert (out["x"].est, out["x"].zeros, out["x"].rmax) == (ex, zx, rx)
    assert (out["y"].est, out["y"].zeros, out["y"].rmax) == (ey, zy, ry)


def test_hll_rejects_bad_precision(spark):
    df = spark.createDataFrame([Row(x="a")])
    with pytest.raises(ValueError):
        hll_registers(df, "x", b=3)
    with pytest.raises(ValueError):
        hll_registers(df, "x", b=17)


def test_countmin_overestimates_and_python_cells(spark):
    rows = [Row(t=f"tok{i % 37}") for i in range(2000)]
    df = spark.createDataFrame(rows)
    cells = countmin_cells(df, "t", depth=4, width=64)
    # python recompute of every cell
    py: dict[tuple[int, int], int] = {}
    for r in rows:
        for d in range(4):
            cell = _h60(f"{d}:{r.t}") % 64
            py[(d, cell)] = py.get((d, cell), 0) + 1
    got = {(r.r, r.cell): r.cnt for r in cells.collect()}
    assert got == py
    exact = df.groupBy("t").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = countmin_lookup(cells, exact, "t", depth=4, width=64).collect()
    truth = {r.t: r.exact_cnt for r in exact.collect()}
    assert len(est) == 37
    for r in est:
        assert r.cms_est >= truth[r.t]  # sketch guarantee
        # width 64 against 2000 increments: generous deterministic bound
        assert r.cms_est - truth[r.t] <= 2000


def test_countmin_exact_when_wide(spark):
    """With width >> distinct items, collisions are absent and the
    sketch is exact — a sharp end-to-end check of cell routing."""
    rows = [Row(t=f"tok{i % 11}") for i in range(550)]
    df = spark.createDataFrame(rows)
    cells = countmin_cells(df, "t", depth=4, width=4096)
    exact = df.groupBy("t").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = countmin_lookup(cells, exact, "t", depth=4, width=4096).collect()
    for r in est:
        assert r.cms_est == 50


def test_kmv_matches_python_and_bound(spark):
    vals = [f"u{i}" for i in range(1000)]
    df = spark.createDataFrame([Row(x=v) for v in vals for _ in (0, 1)])
    sk = kmv_sketch(df, "x", k=64)
    hs = sorted(_h60(v) for v in vals)[:64]
    assert [r.h for r in sk.orderBy("h").collect()] == hs
    est = df.agg(F.lit(1)).crossJoin(
        sk.agg(kmv_estimate_col(64).alias("est"))
    ).collect()[0].est
    py_est = round(63.0 * float(1 << 60) / float(hs[-1]), 4)
    assert est == py_est
    assert abs(est - 1000) / 1000 < 4 / math.sqrt(62)  # ~4 sigma


def test_kmv_set_ops_sane(spark):
    a_vals = [f"u{i}" for i in range(600)]  # 0..599
    b_vals = [f"u{i}" for i in range(300, 900)]  # 300..899, overlap 300
    a = spark.createDataFrame([Row(x=v) for v in a_vals])
    b = spark.createDataFrame([Row(x=v) for v in b_vals])
    sa, sb = kmv_sketch(a, "x", k=64), kmv_sketch(b, "x", k=64)
    row = kmv_set_ops(sa, sb, k=64).collect()[0]
    assert abs(row.est_union - 900) / 900 < 0.5
    assert 0 < row.est_intersect < 900
    # union estimate equals a direct sketch of the union (merge law)
    direct = (
        kmv_sketch(a.unionAll(b), "x", k=64)
        .agg(kmv_estimate_col(64).alias("e"))
        .collect()[0]
        .e
    )
    assert row.est_union == direct


def test_kmv_plan_uses_take_ordered(spark):
    """The k-smallest tail must plan as TakeOrderedAndProject (per-
    partition heap), never a global Sort + Limit."""
    df = spark.createDataFrame([Row(x=f"u{i}") for i in range(100)])
    explained = kmv_sketch(df, "x", k=16)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        explained.explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_sampled_quantiles_bounds_and_determinism(spark):
    """Rank-space error: with k=256 the sample quantile's true rank is
    within ~4/sqrt(k) = 25 percentile points at 4 sigma — assert a
    10-point band on a smooth synthetic distribution, and exact
    determinism across repartitionings."""
    from bdq_spark.operators.sketches import sampled_quantiles

    rows = [Row(id=i, x=(i * i) % 10007) for i in range(5000)]
    df = spark.createDataFrame(rows)
    got = sampled_quantiles(df, "x", ["id"], k=256, salt="sq").collect()[0]
    assert got.sample_n == 256
    xs = sorted(r.x for r in rows)
    for p, v in (("p25", got.p25), ("p50", got.p50), ("p75", got.p75)):
        frac = float(p[1:]) / 100
        true_rank = sum(1 for x in xs if x <= v) / len(xs)
        assert abs(true_rank - frac) < 0.10, (p, v, true_rank)
    again = (
        sampled_quantiles(df.repartition(13), "x", ["id"], k=256, salt="sq")
        .collect()[0]
    )
    assert again == got


def test_countmin_join_size_overestimates(spark):
    from bdq_spark.operators.sketches import countmin_cells, countmin_join_size

    a = spark.createDataFrame([Row(k=i % 13) for i in range(500)])
    b = spark.createDataFrame([Row(k=i % 7) for i in range(200)])
    est = countmin_join_size(
        countmin_cells(a, "k", depth=4, width=512),
        countmin_cells(b, "k", depth=4, width=512),
    ).collect()[0].est
    exact = a.join(b, "k").count()
    assert est >= exact
    # wide grid vs tiny key domain: no collisions, estimate is exact
    est_wide = countmin_join_size(
        countmin_cells(a, "k", depth=4, width=8192),
        countmin_cells(b, "k", depth=4, width=8192),
    ).collect()[0].est
    assert est_wide == exact


def test_hll_rollup_merge_equals_direct_grouped(spark):
    """The rollup-table pattern: per-(group, slice) registers merged by
    max across slices equal the direct per-group sketch — grouped merge
    law (the global law is test_hll_registers_merge_by_max)."""
    rows = [
        Row(g="a", day=d, v=f"u{i}")
        for d in range(3)
        for i in range(d * 50, d * 50 + 120)  # overlapping user ranges
    ] + [Row(g="b", day=d, v=f"w{i}") for d in range(2) for i in range(80)]
    df = spark.createDataFrame(rows)
    rollup = hll_registers(df, "v", ("g", "day"), b=8)
    merged = rollup.groupBy("g", "bucket").agg(
        F.max("register").alias("register")
    )
    direct = hll_registers(df, "v", ("g",), b=8)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    got = hll_estimate(merged, group_cols=("g",)).collect()
    want = hll_estimate(direct, group_cols=("g",)).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


# ---------------------------------------------------------------------------
# hypothesis properties — input diversity beyond the fixed recomputes
# (derandomized profile from conftest; tight example counts because
# every example runs Spark jobs)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_VALS = st.lists(
    st.text(alphabet="abcdefg0123456789", min_size=0, max_size=8),
    min_size=1,
    max_size=60,
)


@settings(max_examples=8, deadline=None)
@given(vals=_VALS)
def test_hll_property_matches_python(spark, vals):
    df = spark.createDataFrame([Row(x=v) for v in vals], "x string")
    got = hll_distinct(df, "x", b=8).collect()[0]
    est, zeros, rmax = _py_hll(vals)
    assert (got.est, got.zeros, got.rmax) == (est, zeros, rmax)


@settings(max_examples=8, deadline=None)
@given(vals=_VALS, k=st.integers(min_value=1, max_value=16))
def test_kmv_property_matches_python(spark, vals, k):
    df = spark.createDataFrame([Row(x=v) for v in vals], "x string")
    got = [r.h for r in kmv_sketch(df, "x", k=k).orderBy("h").collect()]
    want = sorted({_h60(v) for v in vals})[:k]
    assert got == want


@settings(max_examples=6, deadline=None)
@given(vals=_VALS)
def test_countmin_property_cells_exact(spark, vals):
    df = spark.createDataFrame([Row(t=v) for v in vals], "t string")
    got = {
        (r.r, r.cell): r.cnt
        for r in countmin_cells(df, "t", depth=2, width=32).collect()
    }
    py: dict = {}
    for v in vals:
        for d in range(2):
            c = _h60(f"{d}:{v}") % 32
            py[(d, c)] = py.get((d, c), 0) + 1
    assert got == py


def test_sampled_quantiles_names_three_decimal_probs(spark):
    """ADVICE r7: 0.975 must label as p975 (not p97), and near-duplicate
    probs must not silently collide into one column name.  ADVICE r8:
    names derive from a 9-place Decimal normalization, so a prob
    computed as 0.1 + 0.2 labels p30 (not p30000000000000004) and
    scientific-notation reprs (1e-05) get their plain-notation name
    instead of being rejected."""
    import pytest

    from bdq_spark.operators.sketches import sampled_quantiles

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("x")
    )
    out = sampled_quantiles(df, "x", ["k"], k=64,
                            probs=(0.25, 0.255, 0.5, 0.975))
    assert out.columns == ["sample_n", "p25", "p255", "p50", "p975"]
    row = out.collect()[0]
    assert row["p25"] <= row["p50"] <= row["p975"]
    noisy = sampled_quantiles(df, "x", ["k"], k=64,
                              probs=(0.1 + 0.2, 1e-05))
    assert noisy.columns == ["sample_n", "p30", "p00001"]
    with pytest.raises(ValueError, match="0, 1"):
        sampled_quantiles(df, "x", ["k"], k=8, probs=(1.5,))
    with pytest.raises(ValueError, match="9 decimal"):
        # rounds to 0 at 9 places — no representable name
        sampled_quantiles(df, "x", ["k"], k=8, probs=(1e-12,))
    with pytest.raises(ValueError, match="duplicate"):
        # distinct floats that collapse at 9 places must not silently
        # share a column name
        sampled_quantiles(df, "x", ["k"], k=8, probs=(0.3, 0.1 + 0.2))
