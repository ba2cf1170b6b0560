"""FK-integrity and PK-validation goldens — fixtures F3/F4, expected
values from /root/reference/README.md:195-213 and
/root/reference/tests/validate_*_test.py."""

from pyspark.sql import functions as F

from bdq_spark.functions import surrogate_key_hash
from bdq_spark.operators import (
    fact_dim_broken_relationship,
    validate_primary_key_candidate,
    validate_primary_key_candidate_combinations,
)
from bdq_spark.schema import get_column_names_combinations


def _fact_dim(spark):
    # F3: /root/reference/tests/fact_dim_broken_relationship_test.py:5-31
    fact_rows = [
        ("Grzegorz", "IT", "EU"),
        ("Mark", "IT", "EU"),
        ("Justin", "IT  ", "EU    "),  # trailing-space keys
        ("Alice", "HR", "EU"),
        ("Bob", "HR", "EU"),
        ("Sunny", "HR", "EU"),
    ] + [(f"AliceN{i}", "IT", "USA") for i in range(5)]  # missing dim
    fact = spark.createDataFrame(fact_rows, "Name:string, Dept:string, Country:string")
    dim = spark.createDataFrame(
        [("IT", "EU", "IT dept"), ("HR", "EU", "HR dept")],
        "department:string, cntry:string, comment:string",
    )
    return fact, dim


def test_broken_relationship_raw_columns(spark):
    fact, dim = _fact_dim(spark)
    broken = fact_dim_broken_relationship(
        fact, ["Dept", "Country"], dim, ["department", "cntry"],
        sample_broken_records=0,
    )
    got = {(r.Dept, r.Country) for r in broken.collect()}
    # README.md:195-204 -> trailing-space key AND missing (IT, USA)
    assert got == {("IT  ", "EU    "), ("IT", "USA")}


def test_broken_relationship_sampling_caps_records(spark):
    fact, dim = _fact_dim(spark)
    sampled = fact_dim_broken_relationship(
        fact, ["Dept", "Country"], dim, ["department", "cntry"],
        sample_broken_records=2,
    ).collect()
    by_key = {(r.Dept, r.Country): r.sample_records for r in sampled}
    assert set(by_key) == {("IT  ", "EU    "), ("IT", "USA")}
    assert len(by_key[("IT", "USA")]) == 2  # 5 offenders capped at 2
    assert len(by_key[("IT  ", "EU    ")]) == 1
    # samples carry full fact rows
    assert by_key[("IT  ", "EU    ")][0].Name == "Justin"


def test_broken_relationship_surrogate_keys_rtrim(spark):
    # hashing with rtrim=True heals the trailing-space mismatch -> only 1 broken
    fact, dim = _fact_dim(spark)
    fact = fact.withColumn(
        "dept_fk", surrogate_key_hash(["Dept", "Country"], rtrim=True)
    )
    dim = dim.withColumn(
        "dept_pk", surrogate_key_hash(["department", "cntry"], rtrim=True)
    )
    broken = fact_dim_broken_relationship(
        fact, ["dept_fk"], dim, ["dept_pk"], sample_broken_records=3
    ).collect()
    assert len(broken) == 1
    names = {s.Name for s in broken[0].sample_records}
    assert names <= {f"AliceN{i}" for i in range(5)}


def test_broken_relationship_validates_lengths(spark):
    fact, dim = _fact_dim(spark)
    import pytest

    with pytest.raises(ValueError):
        fact_dim_broken_relationship(fact, ["Dept"], dim, ["department", "cntry"])


def _pk_df(spark):
    # F4: spark.range(0,100) derived columns
    return spark.range(0, 100).selectExpr(
        "id",
        "cast(id / 10 as int) + 1 as type",
        "id % 10 as reminder",
        "'A' as static",
        "id % 2 as round_robin",
    )


def test_validate_primary_key_candidate_goldens(spark):
    df = _pk_df(spark)
    ok = validate_primary_key_candidate(df, ["id"])
    assert ok["record_count"] == 100
    assert ok["failed_records"] == 0

    bad = validate_primary_key_candidate(df, ["type"])
    assert bad["failed_records"] == 100  # every row is in a duplicate group
    # fixed failed_df: the offending groups, not the input df
    groups = bad["failed_df"].collect()
    assert all(r.cnt == 10 for r in groups)
    assert len(groups) == 10


def test_validate_pk_combinations_minimal_set(spark):
    # golden: /root/reference/tests/validate_primary_key_candidate_combinations_test.py:16
    df = _pk_df(spark)
    combos = list(
        get_column_names_combinations(["id", "type", "reminder", "static", "round_robin"])
    )
    solutions = validate_primary_key_candidate_combinations(
        df, combos, max_workers=8
    )
    assert sorted(solutions) == [("id",), ("type", "reminder")]
