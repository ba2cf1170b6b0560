"""State store + SparkUILogger tests."""

from datetime import datetime

import pytest

from bdq_spark.plans import CatalogPersistedStateStore, SparkUILogger


@pytest.fixture()
def store(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS bdq_state")
    spark.sql("DROP TABLE IF EXISTS bdq_state.t_store_test")
    return CatalogPersistedStateStore(
        catalog_name=None,
        database_name="bdq_state",
        table_name="t_store_test",
        schema="pipeline_name string, start_ts timestamp, metrics string",
        event_ts_column="start_ts",
        json_encoded_columns=["metrics"],
        spark=spark,
    )


def test_state_store_roundtrip_latest_wins(spark, store):
    assert store.load() == {}

    ts1 = datetime(2024, 1, 1, 12, 0)
    ts2 = datetime(2024, 6, 1, 12, 0)
    store.save({"pipeline_name": "p", "start_ts": ts1, "metrics": {"n": 1}})
    store.save({"pipeline_name": "p", "start_ts": ts2, "metrics": {"n": 2}})

    got = store.load()
    assert got["metrics"] == {"n": 2}  # latest by start_ts
    assert got["start_ts"] == ts2


def test_state_store_datetime_json_envelope(spark, store):
    ts = datetime(2024, 3, 15, 9, 30, 45)
    store.save(
        {"pipeline_name": "p", "start_ts": ts, "metrics": {"when": ts, "x": [1, 2]}}
    )
    got = store.load()
    # datetime round-trips through the {'_isoformat': ...} envelope
    assert got["metrics"]["when"] == ts
    assert got["metrics"]["x"] == [1, 2]


def test_state_store_validates_json_columns(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS bdq_state")
    with pytest.raises(ValueError, match="does not exist in schema"):
        CatalogPersistedStateStore(
            catalog_name=None,
            database_name="bdq_state",
            table_name="t_bad",
            schema="a string",
            event_ts_column="a",
            json_encoded_columns=["nope"],
            spark=spark,
        )


def test_state_store_schema_evolution(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS bdq_state")
    spark.sql("DROP TABLE IF EXISTS bdq_state.t_evolve")
    s1 = CatalogPersistedStateStore(
        catalog_name=None,
        database_name="bdq_state",
        table_name="t_evolve",
        schema="pipeline_name string, start_ts timestamp, metrics string",
        event_ts_column="start_ts",
        json_encoded_columns=["metrics"],
        spark=spark,
    )
    s1.save(
        {
            "pipeline_name": "p",
            "start_ts": datetime(2024, 1, 1),
            "metrics": {"n": 1},
        }
    )
    # new field added: old rows survive with NULL for the new column
    s2 = CatalogPersistedStateStore(
        catalog_name=None,
        database_name="bdq_state",
        table_name="t_evolve",
        schema="pipeline_name string, start_ts timestamp, metrics string, extra int",
        event_ts_column="start_ts",
        json_encoded_columns=["metrics"],
        spark=spark,
    )
    got = s2.load()
    assert got["metrics"] == {"n": 1}
    assert got["extra"] is None


def test_state_store_recovers_from_interrupted_migration(spark):
    """Crash between 'main table dropped' and 'rewrite finished' leaves
    only the __migration staging table; the next startup must restore
    state from it instead of silently creating an empty table."""
    spark.sql("CREATE DATABASE IF NOT EXISTS bdq_state")
    spark.sql("DROP TABLE IF EXISTS bdq_state.t_crash")
    spark.sql("DROP TABLE IF EXISTS bdq_state.t_crash__migration")
    s1 = CatalogPersistedStateStore(
        catalog_name=None,
        database_name="bdq_state",
        table_name="t_crash",
        schema="pipeline_name string, start_ts timestamp, metrics string",
        event_ts_column="start_ts",
        json_encoded_columns=["metrics"],
        spark=spark,
    )
    s1.save(
        {
            "pipeline_name": "p",
            "start_ts": datetime(2024, 1, 1),
            "metrics": {"n": 7},
        }
    )
    # simulate the crash window: staging holds the state, main is gone
    spark.table("bdq_state.t_crash").write.saveAsTable(
        "bdq_state.t_crash__migration"
    )
    spark.sql("DROP TABLE bdq_state.t_crash")

    s2 = CatalogPersistedStateStore(
        catalog_name=None,
        database_name="bdq_state",
        table_name="t_crash",
        schema="pipeline_name string, start_ts timestamp, metrics string",
        event_ts_column="start_ts",
        json_encoded_columns=["metrics"],
        spark=spark,
    )
    assert s2.load()["metrics"] == {"n": 7}  # restored, not reset
    assert not spark.catalog.tableExists("bdq_state.t_crash__migration")


def test_state_store_clean():
    assert CatalogPersistedStateStore.clean("My Pipeline-1!") == "My_Pipeline_1_"


def test_ui_logger_stack(spark):
    sc = spark.sparkContext
    with SparkUILogger("outer", spark=spark):
        assert sc.getLocalProperty("spark.job.description") == "outer"
        with SparkUILogger("inner", spark=spark):
            assert sc.getLocalProperty("spark.job.description") == "outer.inner"
        assert sc.getLocalProperty("spark.job.description") == "outer"
    assert sc.getLocalProperty("spark.job.description") is None


def test_ui_logger_decorator(spark):
    sc = spark.sparkContext
    captured = []

    @SparkUILogger.tag(desc="tagged_fn")
    def work():
        captured.append(sc.getLocalProperty("spark.job.description"))
        return 7

    assert work() == 7
    assert captured == ["tagged_fn"]
