"""SparkPipeline tests — semantics from
/root/reference/tests/spark_pipeline_test.py plus table-sink, state-store,
metrics and failure-path coverage."""

import pytest
from pyspark.sql import functions as F

from bdq_spark.plans import SparkPipeline


def test_step_spark_temp_view_pipeline(spark):
    ppn = SparkPipeline("sample", spark=spark)

    @ppn.step_spark_temp_view()
    def raw_data_single_source(step):
        return spark.range(1, 10)

    @ppn.step_spark_temp_view(outputs="raw_nice_name")
    def raw_data_single_source_with_custom_name(step):
        return spark.range(100, 110)

    @ppn.step_spark_temp_view(outputs=["raw_data1", "raw_data2"])
    def raw_data_multi_source(step):
        return [spark.range(1000, 2000), spark.range(2000, 3000)]

    @ppn.step_spark_temp_view(
        depends_on=[
            raw_data_single_source,
            raw_data_single_source_with_custom_name,
            "raw_data1",
            "raw_data2",
        ]
    )
    def combine_data(step):
        return (
            spark.table("raw_data_single_source")
            .union(spark.table("raw_nice_name"))
            .union(spark.table("raw_data1"))
            .union(spark.table("raw_data2"))
        )

    @ppn.step_spark_temp_view(depends_on=combine_data, outputs=["odd", "even"])
    def split_data(step):
        df = spark.table("combine_data")
        return [df.filter("id % 2 == 1"), df.filter("id % 2 == 0")]

    results = ppn(max_concurrent_steps=10)

    assert list(ppn.skipped_steps) == []
    assert list(ppn.error_steps) == []
    assert set(ppn.success_steps.values()) == {
        raw_data_single_source,
        raw_data_single_source_with_custom_name,
        raw_data_multi_source,
        combine_data,
        split_data,
    }
    assert results == ppn.success_steps
    assert ppn.is_success

    # golden row contents (odd/even split over the union of the 4 ranges)
    total = 9 + 10 + 1000 + 1000
    odd = spark.table("odd").collect()
    even = spark.table("even").collect()
    assert len(odd) + len(even) == total
    assert all(r.id % 2 == 1 for r in odd)
    assert all(r.id % 2 == 0 for r in even)


def test_step_failure_propagates_and_skips(spark):
    ppn = SparkPipeline("failing", spark=spark)

    @ppn.step_python()
    def good(step):
        return 1

    @ppn.step_python(depends_on=[good])
    def bad(step):
        raise RuntimeError("boom")

    @ppn.step_python(depends_on=[bad])
    def never(step):
        return 3

    with pytest.raises(ValueError, match="have failed"):
        ppn()

    assert list(ppn.error_steps) == ["bad"]
    assert list(ppn.skipped_steps) == ["never"]
    assert list(ppn.success_steps) == ["good"]
    assert not ppn.is_success
    assert isinstance(ppn.steps["bad"].exception, RuntimeError)
    assert ppn.steps["bad"].traceback


def test_step_output_count_validation(spark):
    ppn = SparkPipeline("badcount", spark=spark)

    @ppn.step_spark(outputs=["a", "b"])
    def wrong(step):
        return spark.range(3)  # 1 df, 2 outputs declared

    with pytest.raises(ValueError, match="have failed"):
        ppn()
    assert "expected" in str(ppn.steps["wrong"].exception)


def test_duplicate_output_rejected(spark):
    ppn = SparkPipeline("dup", spark=spark)

    @ppn.step_python(outputs="same")
    def one(step):
        return 1

    with pytest.raises(ValueError, match="already created"):

        @ppn.step_python(outputs="same")
        def two(step):
            return 2


def test_unresolved_string_dependency(spark):
    ppn = SparkPipeline("unres", spark=spark)
    with pytest.raises(ValueError, match="unresolved"):

        @ppn.step_python(depends_on=["nope"])
        def s(step):
            return 1


def test_step_spark_requires_dataframe(spark):
    ppn = SparkPipeline("notdf", spark=spark)

    @ppn.step_spark()
    def notdf(step):
        return 42

    with pytest.raises(ValueError, match="have failed"):
        ppn()


def test_step_spark_table_write_and_multi_output(spark, tmp_path):
    ppn = SparkPipeline("tbl", spark=spark)

    @ppn.step_spark_table(outputs=["t_odd", "t_even"], mode="overwrite", format="parquet")
    def write_tables(step):
        df = spark.range(0, 20)
        return [df.filter("id % 2 == 1"), df.filter("id % 2 == 0")]

    ppn()
    # fixed multi-output bug: both tables written and both returned
    assert spark.table("t_odd").count() == 10
    assert spark.table("t_even").count() == 10
    result = ppn.steps["write_tables"].result
    assert len(result) == 2

    # append mode accumulates
    ppn2 = SparkPipeline("tbl2", spark=spark)

    @ppn2.step_spark_table(outputs="t_odd", mode="append", format="parquet")
    def append_more(step):
        return spark.range(100, 105)

    ppn2()
    assert spark.table("t_odd").count() == 15


def test_state_store_and_metrics(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS bdq_state")
    ppn = SparkPipeline("metered", spark=spark, state_store_database="bdq_state")

    @ppn.step_spark_table(outputs="metered_out", mode="overwrite", format="parquet")
    @ppn.spark_metric(name="row_cnt", expr="count(1)")
    @ppn.spark_metric(name="id_sum", expr="sum(id)")
    def metered_out(step):
        return spark.range(0, 10)

    ppn()
    m = ppn.metrics
    assert m["metered_out.spark_metric.row_cnt"] == 10
    assert m["metered_out.spark_metric.id_sum"] == 45

    # state persisted: a fresh pipeline object sees last run's metrics
    ppn_reload = SparkPipeline("metered", spark=spark, state_store_database="bdq_state")
    last = ppn_reload.last_run_metrics
    assert last["metered_out.spark_metric.row_cnt"] == 10
    assert ppn_reload._state_store_data["pipeline_name"] == "metered"


def test_state_store_requires_enabled_for_metrics(spark):
    ppn = SparkPipeline("nostore", spark=spark)

    with pytest.raises(ValueError, match="state store"):

        @ppn.step_spark_table(outputs="x1", format="parquet")
        @ppn.spark_metric(name="cnt", expr="count(1)")
        def x1(step):
            return spark.range(3)


def test_step_python_arbitrary_values(spark):
    ppn = SparkPipeline("pyvals", spark=spark)

    @ppn.step_python(outputs=["a", "b"])
    def produce(step):
        return ["hello", {"k": 1}]

    @ppn.step_python(depends_on=[produce])
    def consume(step):
        return produce.result[0] + " world"

    ppn()
    assert consume.result == ["hello world"]
