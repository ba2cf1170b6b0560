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

__all__ = ["write_partitioned", "write_bucketed", "compact_parquet"]


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


def compact_parquet(
    spark,
    path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 1,
) -> dict:
    """Compact a small-files parquet directory into ~``target_bytes``
    files — the standard lake-maintenance pass (streaming sinks and
    over-parallel writes leave thousands of tiny files; at 100 TB the
    NameNode/listing overhead and per-file open cost dominate scans
    long before the data does).

    File census via the Hadoop FileSystem API (portable to HDFS/S3A/
    local); the rewrite is ``repartition(ceil(bytes / target))`` —
    a full shuffle, the price of making downstream scans cheap forever
    after.  Writes to ``out_path`` (never in place: an in-place rewrite
    that fails mid-job loses data).  Returns
    ``{files_before, bytes_before, files_after}``.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(path)
    fs = src.getFileSystem(conf)
    if not fs.exists(src):
        raise ValueError(f"no parquet files under {path}")
    files_before, bytes_before = 0, 0
    it = fs.listFiles(src, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            files_before += 1
            bytes_before += st.getLen()
    if files_before == 0:
        raise ValueError(f"no parquet files under {path}")
    n_out = max(min_files, -(-bytes_before // target_bytes))
    (
        spark.read.parquet(path)
        .repartition(int(n_out))
        .write.mode("overwrite")
        .parquet(out_path)
    )
    dst = jvm.org.apache.hadoop.fs.Path(out_path)
    files_after = 0
    it = fs.listFiles(dst, True)
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            files_after += 1
    return {
        "files_before": files_before,
        "bytes_before": int(bytes_before),
        "files_after": files_after,
    }
