"""Parquet sources for the driver-generated TPC-H-ish testdata.

The reference has no file readers of its own (everything comes from catalog
tables / temp views, `/root/reference/bdq/__init__.py:6`); the rebuild adds
plain ``spark.read.parquet`` sources so every operator can run against
`/root/testdata/sf*/` (see TESTDATA.md).

Scale notes:

- ``spark.read.parquet`` is a V2 file scan: Catalyst pushes filters and
  prunes columns into the scan (verify via ``PushedFilters`` /
  ``ReadSchema`` in ``.explain``), so callers should filter/select on the
  returned DataFrame rather than materializing it.
- No ``.cache()`` here — the caller decides lifetime; caching 100 TB scans
  by default would be a footgun.
"""

from __future__ import annotations

import os
from typing import Dict

from pyspark.sql import DataFrame, SparkSession

__all__ = ["TABLES", "load_table", "load_tables", "register_views"]

#: Tables the driver generates at every scale factor (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table as a lazy DataFrame.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    timestamp type (microseconds) cannot represent; Spark 4 rejects the
    file outright.  We read nanos as a bigint
    (``spark.sql.legacy.parquet.nanosAsLong``, runtime-settable) and
    truncate to a microsecond TimestampType column, so downstream
    operators see an ordinary timestamp.  Truncation (not rounding)
    matches DuckDB's ``epoch_ms`` behavior on TIMESTAMP_NS.
    """
    df = _read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    try:
        return spark.read.parquet(path)
    except Exception:
        pass
    # retry with nanos-as-long for TIMESTAMP(NANOS) files (events.parquet)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> Dict[str, DataFrame]:
    """Read all testdata tables; returns {name: DataFrame}."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every table as a temp view (``spark.sql`` entry point)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(f"{prefix}{name}")
