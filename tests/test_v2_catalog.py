"""step_spark_table + CatalogPersistedStateStore against a REAL V2
catalog — Spark's JDBCTableCatalog over embedded Derby (in the pyspark
distribution, so no extra installs).

Round-1 debt: the reference defaults ``format="delta"`` and writes
through V2 ``writeTo`` (`/root/reference/bdq/spark_pipeline.py:515,540`);
our local tests only ever exercised the V1 session-catalog fallback.
The JDBC catalog is a true TableCatalog implementation: ``writeTo``
create/replace/append resolve through V2 plans, and it REJECTS the V1
writer and explicit ``USING`` clauses — exactly the shape of a
format-owning lakehouse catalog, which is what makes it a good stand-in
for Delta/Iceberg here (delta-spark is not installable in this
environment).
"""

import datetime

import pytest

from bdq_spark.plans.pipeline import SparkPipeline
from bdq_spark.plans.statestore import CatalogPersistedStateStore

CAT = "v2testcat"


@pytest.fixture(scope="module")
def v2cat(spark):
    spark.conf.set(
        f"spark.sql.catalog.{CAT}",
        "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog",
    )
    spark.conf.set(
        f"spark.sql.catalog.{CAT}.url", "jdbc:derby:memory:v2tests;create=true"
    )
    spark.conf.set(
        f"spark.sql.catalog.{CAT}.driver", "org.apache.derby.jdbc.EmbeddedDriver"
    )
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {CAT}.ns")
    return CAT


def _run_table_step(spark, pipeline_name, table, mode, build_df):
    ppn = SparkPipeline(pipeline_name, spark=spark)

    @ppn.step_spark_table(outputs=table, mode=mode, format=None)
    def write(step):
        return build_df()

    ppn()
    return ppn


def test_v2_overwrite_create_or_replace(spark, v2cat):
    tbl = f"{CAT}.ns.t_overwrite"
    _run_table_step(spark, "v2_ow1", tbl, "overwrite", lambda: spark.range(7))
    assert spark.table(tbl).count() == 7
    # second run replaces, not appends
    _run_table_step(spark, "v2_ow2", tbl, "overwrite", lambda: spark.range(3))
    assert spark.table(tbl).count() == 3


def test_v2_create_fails_on_existing(spark, v2cat):
    tbl = f"{CAT}.ns.t_create"
    _run_table_step(spark, "v2_c1", tbl, "create", lambda: spark.range(4))
    assert spark.table(tbl).count() == 4
    with pytest.raises(ValueError, match="have failed"):
        _run_table_step(spark, "v2_c2", tbl, "create", lambda: spark.range(4))


def test_v2_replace_requires_existing(spark, v2cat):
    tbl = f"{CAT}.ns.t_replace"
    with pytest.raises(ValueError, match="have failed"):
        _run_table_step(spark, "v2_r1", tbl, "replace", lambda: spark.range(2))
    _run_table_step(spark, "v2_r2", tbl, "create", lambda: spark.range(2))
    _run_table_step(spark, "v2_r3", tbl, "replace", lambda: spark.range(9))
    assert spark.table(tbl).count() == 9


def test_v2_append_accumulates_and_autocreates(spark, v2cat):
    tbl = f"{CAT}.ns.t_append"
    # auto_create_table=True (default): first append creates via V2
    _run_table_step(spark, "v2_a1", tbl, "append", lambda: spark.range(5))
    assert spark.table(tbl).count() == 5
    _run_table_step(spark, "v2_a2", tbl, "append", lambda: spark.range(5))
    assert spark.table(tbl).count() == 10


def test_v2_rejects_explicit_format_clearly(spark, v2cat):
    """A format-owning catalog refuses USING; the error must surface
    as-is (not silently fall back to a V1 writer that can't work)."""
    ppn = SparkPipeline("v2_fmt", spark=spark)

    @ppn.step_spark_table(outputs=f"{CAT}.ns.t_fmt", mode="overwrite",
                          format="parquet")
    def write(step):
        return spark.range(2)

    with pytest.raises(ValueError, match="have failed"):
        ppn()
    err = str(ppn.steps["write"].exception)
    assert "JDBC" in err or "USING" in err.upper()


def test_v2_statestore_roundtrip(spark, v2cat):
    store = CatalogPersistedStateStore(
        catalog_name=CAT,
        database_name="ns",
        table_name="pipeline_state",
        schema="run_id string, payload string, ts timestamp",
        event_ts_column="ts",
        json_encoded_columns=["payload"],
        spark=spark,
    )
    assert store.load() == {}
    t1 = datetime.datetime(2024, 1, 1, 12, 0)
    store.save({"run_id": "r1", "payload": {"n": 1, "when": t1}, "ts": t1})
    store.save(
        {
            "run_id": "r2",
            "payload": {"n": 2, "when": t1},
            "ts": datetime.datetime(2024, 1, 2, 12, 0),
        }
    )
    latest = store.load()
    assert latest["run_id"] == "r2"
    assert latest["payload"]["n"] == 2
    assert latest["payload"]["when"] == t1  # datetime JSON envelope survives
