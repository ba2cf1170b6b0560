"""Data sources & sinks — parquet loaders, partitioned/bucketed writers."""

from bdq_spark.sources.readers import (
    read_csv,
    read_json,
    schema_drift_report,
    split_corrupt,
)
from bdq_spark.sources.sinks import write_bucketed, write_partitioned
from bdq_spark.sources.testdata import TABLES, load_table, load_tables, register_views

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "write_partitioned",
    "write_bucketed",
    "read_csv",
    "read_json",
    "split_corrupt",
    "schema_drift_report",
]
