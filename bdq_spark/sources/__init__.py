"""Data sources & sinks — parquet loaders, partitioned/bucketed writers."""

from bdq_spark.sources.sinks import write_bucketed, write_partitioned
from bdq_spark.sources.testdata import TABLES, load_table, load_tables, register_views

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "write_partitioned",
    "write_bucketed",
]
