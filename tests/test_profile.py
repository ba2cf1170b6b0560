"""Single-pass column profiler tests."""

import pytest
from pyspark.sql import functions as F

from bdq_spark.operators import profile_table


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "a", None),
            (2, 20.0, "b", "x"),
            (3, None, "a", "y"),
            (4, 40.0, None, "y"),
        ],
        "id:int, v:double, s:string, t:string",
    )


def test_profile_shape_and_stats(spark, sample):
    rows = {r.column: r for r in profile_table(sample, approx_distinct=False).collect()}
    assert list(rows) == ["id", "v", "s", "t"]

    assert rows["id"].dtype == "int"
    assert rows["id"].n_rows == 4
    assert rows["id"].n_nulls == 0
    assert rows["id"].null_rate == 0.0
    assert rows["id"].n_distinct == 4
    assert rows["id"].min_value == "1"
    assert rows["id"].max_value == "4"
    assert rows["id"].mean == 2.5

    assert rows["v"].n_nulls == 1
    assert rows["v"].null_rate == 0.25
    assert rows["v"].n_distinct == 3  # NULL excluded, COUNT(DISTINCT) semantics
    assert abs(rows["v"].mean - (70.0 / 3)) < 1e-9
    assert rows["v"].percentiles is not None and len(rows["v"].percentiles) == 3

    # non-numeric: moments/percentiles NULL, min/max lexicographic
    assert rows["s"].mean is None
    assert rows["s"].stddev is None
    assert rows["s"].percentiles is None
    assert rows["s"].min_value == "a"
    assert rows["s"].max_value == "b"
    assert rows["s"].n_distinct == 2


def test_profile_job_count_independent_of_columns(spark, sample):
    """The whole profile is ONE aggregation pass — the number of Spark
    jobs must not grow with the number of profiled columns (a
    per-column implementation would launch one job per column)."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs_for(columns, tag):
        # count within a DEDICATED job group: the default group also
        # collects unrelated async jobs (context cleaner, neighbouring
        # tests' stream teardown), which made this flaky in-suite
        sc.setJobGroup(tag, tag)
        try:
            profile_table(
                sample, columns=columns, approx_distinct=False
            ).collect()
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return len(tracker.getJobIdsForGroup(tag) or [])

    assert jobs_for(["id"], "prof_one") == jobs_for(
        ["id", "v", "s", "t"], "prof_four"
    )


def test_profile_column_subset_and_validation(spark, sample):
    got = profile_table(sample, columns=["v", "id"]).collect()
    assert [r.column for r in got] == ["v", "id"]
    with pytest.raises(ValueError, match="not in DataFrame"):
        profile_table(sample, columns=["nope"])
    with pytest.raises(ValueError, match="rsd"):
        profile_table(sample, rsd=1.5)


def test_profile_empty_dataframe(spark):
    df = spark.createDataFrame([], "a:int, b:string")
    rows = {r.column: r for r in profile_table(df, approx_distinct=False).collect()}
    assert rows["a"].n_rows == 0
    assert rows["a"].null_rate is None
    assert rows["a"].n_distinct == 0
    assert rows["a"].min_value is None


def test_profile_approx_distinct_close(spark):
    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 100).alias("m")
    )
    rows = {r.column: r for r in profile_table(df, rsd=0.02).collect()}
    assert abs(rows["id"].n_distinct - 10_000) / 10_000 < 0.1
    assert abs(rows["m"].n_distinct - 100) / 100 < 0.1


def test_numeric_correlations_matches_numpy(spark):
    import numpy as np

    from bdq_spark.operators.profile import numeric_correlations

    rng = [(float(i % 7), float((i * 3) % 11), float(100 - i % 13)) for i in range(500)]
    df = spark.createDataFrame(rng, "x double, y double, z double")
    got = {
        (r.col_x, r.col_y): (r.n, r.corr)
        for r in numeric_correlations(df, ["x", "y", "z"]).collect()
    }
    arr = np.array(rng)
    ref = np.corrcoef(arr, rowvar=False)
    cols = ["x", "y", "z"]
    assert len(got) == 3
    for i in range(3):
        for j in range(i + 1, 3):
            key = tuple(sorted((cols[i], cols[j])))
            n, corr = got[key]
            assert n == 500
            assert corr == pytest.approx(ref[i, j], abs=2e-6)


def test_numeric_correlations_null_listwise_and_constant(spark):
    from bdq_spark.operators.profile import numeric_correlations

    df = spark.createDataFrame(
        [(1.0, 2.0, 5.0), (2.0, 4.0, 5.0), (3.0, None, 5.0), (4.0, 8.0, 5.0)],
        "x double, y double, c double",
    )
    got = {
        (r.col_x, r.col_y): r for r in numeric_correlations(df, ["x", "y", "c"]).collect()
    }
    # the null row is dropped listwise -> n == 3 for every pair
    assert {r.n for r in got.values()} == {3}
    assert got[("x", "y")].corr == pytest.approx(1.0, abs=1e-9)
    # zero-variance column -> corr undefined -> NULL, not NaN
    assert got[("c", "x")].corr is None
    with pytest.raises(ValueError, match="two columns"):
        numeric_correlations(df, ["x"])


def test_numeric_histogram_buckets(spark):
    from bdq_spark.operators.profile import numeric_histogram

    vals = [float(x) for x in range(0, 100)]  # 0..99, 10 bins of width 9.9
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = sorted(numeric_histogram(df, "x", bins=10, scale=0).collect())
    assert sum(r.n_rows for r in rows) == 100
    assert rows[0].bucket == 0 and rows[0].lo == pytest.approx(0.0)
    assert rows[-1].bucket == 9 and rows[-1].hi == pytest.approx(99.0)
    # max value lands in the last (closed) bucket
    assert rows[-1].n_rows >= 1
    # constant column degenerates to one bucket
    const = spark.createDataFrame([(5.0,)] * 7, "x double")
    got = numeric_histogram(const, "x", bins=10).collect()
    assert len(got) == 1 and got[0].bucket == 0 and got[0].n_rows == 7
    # NULLs excluded
    withnull = spark.createDataFrame([(1.0,), (None,), (2.0,)], "x double")
    assert sum(r.n_rows for r in numeric_histogram(withnull, "x", bins=2).collect()) == 2
    with pytest.raises(ValueError, match="bins"):
        numeric_histogram(df, "x", bins=0)


def test_profile_drift_flags(spark):
    from bdq_spark.operators.profile import profile_drift, profile_table

    old = spark.createDataFrame(
        [(i, float(i % 50), "x") for i in range(100)],
        "id long, v double, only_old string",
    )
    new_rows = [(i, float(i % 5), None) for i in range(100)]  # cardinality collapse + nulls
    new = spark.createDataFrame(new_rows, "id long, v double, only_new string")
    po = profile_table(old, approx_distinct=False)
    pn = profile_table(new, approx_distinct=False)
    rows = {r.column: r for r in profile_drift(po, pn).collect()}
    assert not rows["id"].drifted                       # identical column
    v = rows["v"]
    assert v.distinct_drift                             # 50 -> 5 distinct
    assert v.range_drift                                # max 49.0 -> 4.0
    assert v.drifted
    assert rows["only_old"].presence_drift and rows["only_old"].drifted
    assert rows["only_new"].presence_drift
    # null-rate drift: only_new column is all-null on the new side only
    assert rows["only_new"].null_rate_new == pytest.approx(1.0)


def test_profile_drift_null_rate_threshold(spark):
    from bdq_spark.operators.profile import profile_drift, profile_table

    old = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c"), (4, "d")],
                                "id long, s string")
    new = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c"), (4, None)],
                                "id long, s string")
    po, pn = (profile_table(d, approx_distinct=False) for d in (old, new))
    strict = {r.column: r for r in profile_drift(po, pn, null_rate_delta=0.1).collect()}
    loose = {r.column: r for r in profile_drift(po, pn, null_rate_delta=0.5).collect()}
    assert strict["s"].null_rate_drift       # 0 -> 0.25 > 0.1
    assert not loose["s"].null_rate_drift    # 0.25 < 0.5


def test_group_quantiles_exact_and_approx(spark):
    import numpy as np

    from bdq_spark.operators.profile import group_quantiles

    vals = [(i % 2, float(i)) for i in range(101)]
    df = spark.createDataFrame(vals, "g int, v double")
    got = {r.g: r for r in group_quantiles(df, "v", ["g"], (0.5,)).collect()}
    a = np.percentile([v for g, v in vals if g == 0], 50)
    b = np.percentile([v for g, v in vals if g == 1], 50)
    assert got[0].q_50 == pytest.approx(a)
    assert got[1].q_50 == pytest.approx(b)
    approx = {r.g: r for r in group_quantiles(df, "v", ["g"], (0.5,), approx=True).collect()}
    assert abs(approx[0].q_50 - a) <= 2.0  # sketch within tolerance
    with pytest.raises(ValueError, match="quantiles"):
        group_quantiles(df, "v", ["g"], ())
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        group_quantiles(df, "v", ["g"], (1.5,))
