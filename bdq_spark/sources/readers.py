"""CSV / JSON sources with explicit schemas and bad-record quarantine.

The reference reads only catalog tables; real quality pipelines ingest
semi-structured files.  These helpers encode the scale-safe defaults:

- **explicit schema always** — schema inference is a full extra pass
  over the data (at 100 TB, an extra 100 TB scan) and silently changes
  types between runs; callers pass a DDL string or StructType;
- **PERMISSIVE + corrupt-record column** — malformed rows land in a
  quarantine column instead of failing the job hours in, and
  :func:`split_corrupt` turns them into a (clean, quarantined) pair the
  rule engine can report on;
- **schema-drift report** — :func:`schema_drift_report` reuses
  ``compare_schemas`` (O12) to diff a file's actual columns against the
  expected contract before the data enters the pipeline.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bdq_spark.schema import compare_schemas

__all__ = ["read_csv", "read_json", "split_corrupt", "schema_drift_report"]

CORRUPT_COLUMN = "_corrupt_record"


def _with_corrupt_field(schema: Union[str, T.StructType]) -> T.StructType:
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if CORRUPT_COLUMN not in schema.names:
        schema = schema.add(T.StructField(CORRUPT_COLUMN, T.StringType(), True))
    return schema


def read_csv(
    spark: SparkSession,
    path: str,
    schema: Union[str, T.StructType],
    header: bool = True,
    delimiter: str = ",",
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """CSV with an explicit schema and quarantined malformed rows."""
    return (
        spark.read.schema(_with_corrupt_field(schema))
        .option("header", header)
        .option("sep", delimiter)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COLUMN)
        .csv(path)
    )


def read_json(
    spark: SparkSession,
    path: str,
    schema: Union[str, T.StructType],
    multi_line: bool = False,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """JSON-lines (or multiline) with explicit schema + quarantine."""
    return (
        spark.read.schema(_with_corrupt_field(schema))
        .option("multiLine", multi_line)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COLUMN)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> Tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (clean, quarantined).

    Clean rows lose the corrupt column; quarantined rows keep only the
    raw record for triage.  Both are pure filters on the scan.
    """
    if CORRUPT_COLUMN not in df.columns:
        raise ValueError(f"DataFrame has no {CORRUPT_COLUMN} column")
    # Spark forbids queries referencing ONLY the corrupt-record column of
    # a raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); the documented
    # pattern is to materialize the parsed frame first
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COLUMN).isNull()).drop(CORRUPT_COLUMN)
    bad = df.filter(F.col(CORRUPT_COLUMN).isNotNull()).select(CORRUPT_COLUMN)
    return clean, bad


def schema_drift_report(
    df: DataFrame, expected: Union[str, T.StructType]
) -> dict:
    """Diff the frame's schema against an expected contract (O12 reuse).

    Direction matches ``compare_schemas``: columns only in the actual
    frame report as ``added``; only in the contract as ``removed``.
    """
    if isinstance(expected, str):
        expected = T.StructType.fromDDL(expected)
    actual = T.StructType(
        [f for f in df.schema.fields if f.name != CORRUPT_COLUMN]
    )
    return compare_schemas(actual, expected)
