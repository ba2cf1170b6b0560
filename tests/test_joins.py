"""Salted-join tests: row parity with the plain join, skew spreading."""

import pytest
from pyspark.sql import functions as F

from bdq_spark.operators import salted_join


@pytest.fixture()
def skewed(spark):
    # 10_000 fact rows, 90% on key 7 (heavy hitter), dim of 20 keys
    fact = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 20)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 20).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    return fact, dim


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_matches_plain_join(spark, skewed, how):
    fact, dim = skewed
    dim_partial = dim.filter(F.col("k") < 15)  # leave some keys unmatched
    plain = fact.join(dim_partial, ["k"], how)
    salted = salted_join(fact, dim_partial, ["k"], how, salt_buckets=8)
    assert salted.columns == plain.columns
    p = {tuple(r) for r in plain.collect()}
    s = {tuple(r) for r in salted.collect()}
    assert s == p


def test_salted_join_spreads_hot_key(spark, skewed):
    fact, dim = skewed
    out = salted_join(fact, dim, ["k"], "inner", salt_buckets=8)
    # the hot key's rows must land in multiple partitions of the join
    # shuffle; measure via the internal salted distribution
    salted = fact.withColumn(
        "__s", F.floor(F.rand(42) * 8).cast("int")
    ).filter(F.col("k") == 7)
    counts = [r["count"] for r in salted.groupBy("__s").count().collect()]
    assert len(counts) == 8  # all 8 salt buckets used
    assert max(counts) < 0.95 * sum(counts)  # no single bucket dominates
    assert out.count() == fact.count()  # inner join, dim complete


def test_salted_join_validation(spark, skewed):
    fact, dim = skewed
    with pytest.raises(ValueError, match="not supported"):
        salted_join(fact, dim, ["k"], "right")
    with pytest.raises(ValueError, match="salt_buckets"):
        salted_join(fact, dim, ["k"], salt_buckets=0)
    with pytest.raises(ValueError, match="missing join columns"):
        salted_join(fact, dim, ["nope"])


# ---------------------------------------------------------------------------
# range_join
# ---------------------------------------------------------------------------

from bdq_spark.operators import range_join  # noqa: E402


@pytest.fixture()
def points_intervals(spark):
    # deterministic pseudo-random points and variable-width intervals,
    # including touching boundaries, empty and null intervals
    points = spark.range(0, 500).select(
        F.col("id").alias("pid"),
        ((F.col("id") * 37) % 1000 + (F.col("id") % 7) / 10.0).alias("p"),
    )
    intervals = spark.range(0, 80).select(
        F.col("id").alias("iid"),
        ((F.col("id") * 53) % 950).cast("double").alias("lo"),
        (((F.col("id") * 53) % 950) + (F.col("id") % 5) * 25).cast("double").alias("hi"),
    )
    return points, intervals


def test_range_join_matches_naive(spark, points_intervals):
    points, intervals = points_intervals
    naive = points.join(
        intervals, F.col("p").between(F.col("lo"), F.col("hi"))
    ).select("pid", "iid")
    for w in (10.0, 50.0, 500.0, None):  # None = auto band width
        banded = range_join(points, intervals, "p", "lo", "hi", band_width=w)
        got = {(r.pid, r.iid) for r in banded.select("pid", "iid").collect()}
        want = {(r.pid, r.iid) for r in naive.collect()}
        assert got == want, f"band_width={w}"


def test_range_join_boundaries_inclusive(spark):
    points = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 9.99), (4, 20.01), (5, None)],
        "pid long, p double",
    )
    intervals = spark.createDataFrame(
        [(100, 10.0, 20.0), (200, 30.0, 25.0), (300, None, 50.0)],
        "iid long, lo double, hi double",
    )
    out = range_join(points, intervals, "p", "lo", "hi", band_width=5.0)
    assert {(r.pid, r.iid) for r in out.select("pid", "iid").collect()} == {
        (1, 100),  # lower boundary inclusive
        (2, 100),  # upper boundary inclusive
    }  # empty (lo>hi) and null intervals / null points never match


def test_range_join_with_equi_keys_and_collisions(spark):
    points = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 15.0), ("b", 3, 5.0)],
        "grp string, pid long, p double",
    )
    intervals = spark.createDataFrame(
        [("a", 0.0, 10.0, "lowA"), ("b", 10.0, 20.0, "hiB"), ("c", 0.0, 99.0, "allC")],
        "grp string, lo double, hi double, p string",  # 'p' collides with left
    )
    out = range_join(points, intervals, "p", "lo", "hi", on=["grp"], band_width=10.0)
    rows = {(r.grp, r.pid, r.p_right) for r in out.collect()}
    assert rows == {("a", 1, "lowA")}  # pid 2 out of a's range, b/c keys don't pair
    assert "p_right" in out.columns and "lo" in out.columns


def test_range_join_validation(spark, points_intervals):
    points, intervals = points_intervals
    with pytest.raises(ValueError, match="missing columns"):
        range_join(points, intervals, "nope", "lo", "hi")
    with pytest.raises(ValueError, match="band_width"):
        range_join(points, intervals, "p", "lo", "hi", band_width=-1.0)


def test_key_skew_report(spark):
    from bdq_spark.operators.joins import key_skew_report

    rows = [(1, "hot") for _ in range(80)]
    rows += [(i, "cold") for i in range(2, 22)]  # 20 keys x 1 row
    df = spark.createDataFrame(rows, "k long, v string")
    got = key_skew_report(df, ["k"], top_n=3).collect()
    assert [r.k for r in got] == [1, 2, 3]  # ties broken by key asc
    top = got[0]
    assert top.n_rows == 80
    assert top.row_share == pytest.approx(0.8, abs=1e-6)
    # mean rows/key = 100/21; skew = 80 / (100/21) = 16.8
    assert top.skew_factor == pytest.approx(16.8, abs=1e-4)
    with pytest.raises(ValueError, match="keys"):
        key_skew_report(df, [])


def test_key_skew_report_null_key_groups(spark):
    from bdq_spark.operators.joins import key_skew_report

    df = spark.createDataFrame(
        [(None, 1)] * 5 + [(2, 1), (3, 1)], "k string, v int"
    )
    got = key_skew_report(df, ["k"], top_n=1).collect()
    assert got[0].k is None and got[0].n_rows == 5
