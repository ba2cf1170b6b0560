"""Partitioned / bucketed table sinks for co-located scale-out layouts.

The reference's only sinks are catalog-table writes through
``DataFrameWriterV2`` (`/root/reference/bdq/spark_pipeline.py:540`).
These helpers add the two physical-layout tools that matter at 100 TB:

- **partitioned writes** — directory partitioning by low-cardinality
  columns gives partition PRUNING: a filter on the partition column
  skips whole directories at plan time (visible as ``PartitionFilters``
  in ``.explain``);
- **bucketed writes** — ``bucketBy`` pre-shuffles data by join/agg key at
  write time; two tables bucketed the same way join WITHOUT a shuffle
  (and without a sort when also ``sortBy``-ed), which converts every
  repeated join on that key from O(data) shuffle to zero.

Bucketing requires ``saveAsTable`` (metastore-tracked); plain paths
cannot carry bucket metadata.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame

__all__ = ["write_partitioned", "write_bucketed"]


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: List[str],
    format: str = "parquet",
    mode: str = "overwrite",
    max_records_per_file: Optional[int] = None,
) -> None:
    """Write a path-based table partitioned by ``partition_by``.

    ``max_records_per_file`` caps file sizes (skew guard: one giant
    partition value otherwise produces one giant file).  Choose
    low-cardinality columns — every distinct tuple becomes a directory,
    and millions of tiny directories destroy listing performance.
    """
    writer = df.write.format(format).mode(mode).partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: List[str],
    num_buckets: int,
    sort_by: Optional[List[str]] = None,
    format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write a metastore table bucketed (and optionally sorted) by key.

    Joining two tables bucketed identically on the join key lets Spark
    plan a SortMergeJoin with NO Exchange on either side; aggregations on
    the bucket key likewise skip their shuffle.  ``num_buckets`` should
    roughly match target parallelism (buckets are the unit of task
    assignment for bucket-aware scans).
    """
    writer = (
        df.write.format(format)
        .mode(mode)
        .bucketBy(num_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)
