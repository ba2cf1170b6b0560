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
