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

__all__ = [
    "write_partitioned",
    "write_bucketed",
    "compact_parquet",
    "write_zonemap",
    "zonemap_candidate_files",
    "read_zonemap",
    "write_bloom_index",
    "bloom_candidate_files",
    "read_bloom",
    "indexed_candidate_files",
    "read_indexed",
]


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


def write_zonemap(
    spark,
    df: DataFrame,
    path: str,
    stats_cols: List[str],
    num_files: Optional[int] = None,
) -> dict:
    """Write ``df`` as parquet plus a FILE-LEVEL min/max index — the
    data-skipping half of what a lakehouse table format keeps in its
    transaction log (Delta/Iceberg per-file stats), for plain parquet
    directories.  Row-group statistics already skip WITHIN a file;
    the zonemap skips whole files BEFORE the scan is even planned,
    which at 100 TB is the difference between listing+opening every
    file of a table and touching only the handful whose range overlaps
    the predicate.  Pairs with
    :func:`bdq_spark.operators.layout.zorder_layout`: Z-ordered files
    have tight bounding boxes in every interleaved dimension, so the
    zonemap prunes range predicates on ANY of them.

    The stats census is a DISTRIBUTED second scan of the written files
    (``input_file_name`` group-by — no driver-side footer reads, works
    on any Hadoop-FS path); only the final per-file min/max table
    (one row per file — bounded by the file count the layout chose)
    lands on the driver to serialize as ``_ZONEMAP.json``.

    ``stats_cols`` must be numeric (int/long/double) — the manifest is
    JSON and the overlap test is numeric comparison.  Returns the
    manifest dict ``{file: {col: [min, max]}}``.
    """
    from pyspark.sql import functions as F

    probe = df.select(*stats_cols)
    for f in probe.schema.fields:
        t = f.dataType.simpleString()
        if t not in ("int", "bigint", "smallint", "tinyint", "float",
                     "double"):
            raise ValueError(
                f"zonemap column {f.name!r} is {t}; only numeric columns "
                "are supported — integerize (epoch days, cents) upstream"
            )
    w = df.write.mode("overwrite")
    if num_files is not None:
        df = df.coalesce(num_files)
        w = df.write.mode("overwrite")
    w.parquet(path)

    census = (
        spark.read.parquet(path)
        .withColumn("__file", F.input_file_name())
        .groupBy("__file")
        .agg(
            *[F.min(c).alias(f"lo_{c}") for c in stats_cols],
            *[F.max(c).alias(f"hi_{c}") for c in stats_cols],
        )
        .collect()
    )
    manifest = {
        r["__file"]: {
            c: [r[f"lo_{c}"], r[f"hi_{c}"]] for c in stats_cols
        }
        for r in census
    }
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    out = jvm.org.apache.hadoop.fs.Path(path, "_ZONEMAP.json")
    fs = out.getFileSystem(conf)
    stream = fs.create(out, True)
    import json

    stream.write(bytearray(json.dumps(manifest, indent=1).encode()))
    stream.close()
    return manifest


def zonemap_candidate_files(spark, path: str, predicates: dict) -> dict:
    """Resolve ``predicates`` (``{col: (lo, hi)}`` inclusive ranges;
    ``None`` bounds are open) against ``_ZONEMAP.json``: returns
    ``{"files": [...], "total": n}`` — the files whose min/max range
    overlaps EVERY predicate, i.e. the only files that can contain
    matches (interval-overlap pruning is lossless by construction;
    the correctness proof is the oracle on the read path)."""
    import json

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    mpath = jvm.org.apache.hadoop.fs.Path(path, "_ZONEMAP.json")
    fs = mpath.getFileSystem(conf)
    if not fs.exists(mpath):
        raise ValueError(f"no _ZONEMAP.json under {path}")
    stream = fs.open(mpath)
    try:
        # py4j passes byte[] buffers by value (mutations don't come
        # back), so drain server-side via commons-io (ships w/ Hadoop)
        data = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    manifest = json.loads(data.decode())
    keep = []
    for fname, stats in manifest.items():
        ok = True
        for col, (lo, hi) in predicates.items():
            if col not in stats:
                raise ValueError(f"column {col!r} not in zonemap")
            fmin, fmax = stats[col]
            if fmin is None:  # all-NULL file can't match a range
                ok = False
                break
            if (hi is not None and fmin > hi) or (
                lo is not None and fmax < lo
            ):
                ok = False
                break
        if ok:
            keep.append(fname)
    return {"files": sorted(keep), "total": len(manifest)}


def read_zonemap(spark, path: str, predicates: dict) -> DataFrame:
    """Scan only the files the zonemap cannot rule out, then apply the
    predicates exactly (pruning is a superset filter — the real
    predicate still runs, so results are identical to a full scan, just
    cheaper).  Empty candidate set returns an empty DataFrame with the
    table's schema."""
    from pyspark.sql import functions as F

    cand = zonemap_candidate_files(spark, path, predicates)
    full = spark.read.parquet(path)
    out = (
        spark.read.parquet(*cand["files"])
        if cand["files"]
        else full.limit(0)
    )
    for col, (lo, hi) in predicates.items():
        if lo is not None:
            out = out.filter(F.col(col) >= lo)
        if hi is not None:
            out = out.filter(F.col(col) <= hi)
    return out


def _fs_write_json(spark, path: str, name: str, payload: dict) -> None:
    """Write a JSON sidecar next to the data files via the Hadoop FS
    API (works on any Hadoop-FS scheme, not just local paths)."""
    import json

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    out = jvm.org.apache.hadoop.fs.Path(path, name)
    fs = out.getFileSystem(conf)
    stream = fs.create(out, True)
    stream.write(bytearray(json.dumps(payload, indent=1).encode()))
    stream.close()


def _fs_read_json(spark, path: str, name: str) -> dict:
    import json

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    mpath = jvm.org.apache.hadoop.fs.Path(path, name)
    fs = mpath.getFileSystem(conf)
    if not fs.exists(mpath):
        raise ValueError(f"no {name} under {path}")
    stream = fs.open(mpath)
    try:
        # py4j passes byte[] buffers by value (mutations don't come
        # back), so drain server-side via commons-io (ships w/ Hadoop)
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return json.loads(data.decode())


def write_bloom_index(
    spark,
    path: str,
    bloom_cols: List[str],
    bits: int = 8192,
    hashes: int = 5,
) -> dict:
    """Build a FILE-LEVEL Bloom-filter sidecar (``_BLOOM.json``) over an
    EXISTING parquet directory — the EQUALITY-predicate complement of
    :func:`write_zonemap`: min/max ranges prune range predicates on
    clustered columns, but an equality probe on a column the layout was
    NOT sorted by (the classic "point lookup by id on a time-partitioned
    table") overlaps every file's range.  A per-file Bloom filter
    answers "can this file contain value v?" with no false negatives,
    so pruning stays lossless; false positives only cost extra reads
    (rate ~ (1 - e^(-hashes * n / bits))^hashes).  This is what
    Delta/Iceberg/Hudi keep as optional per-file bloom metadata, for
    plain parquet directories.

    Position function (the md5-twin recipe, python-replayable in
    :func:`bloom_candidate_files`): position_j(v) = first 60 md5 bits
    of ``"j:" + str(v)`` mod ``bits``, j in [0, hashes).

    The census is DISTRIBUTED (``input_file_name`` + explode of the
    ``hashes`` positions, distinct, per-file collect_set — each file
    contributes at most ``bits`` positions regardless of row count);
    only the bounded per-file position sets land on the driver.  The
    sidecar stores each file's filter as a base64 LSB-first BITMAP
    (``bits/8`` bytes before encoding) so candidate resolution reads
    O(files * bits/8) regardless of key population — an int-list
    encoding made the sidecar itself grow with the data and candidate
    resolution measured linear.  Returns the manifest dict.
    """
    from pyspark.sql import functions as F

    from bdq_spark.operators.dedup import _md5_base_hash

    base = spark.read.parquet(path).withColumn("__file", F.input_file_name())
    columns: dict = {}
    for c in bloom_cols:
        rows = (
            base.select("__file", F.col(c).cast("string").alias("v"))
            .where(F.col("v").isNotNull())
            .select(
                "__file",
                F.explode(F.sequence(F.lit(0), F.lit(hashes - 1))).alias("j"),
                "v",
            )
            .select(
                "__file",
                F.pmod(
                    _md5_base_hash(
                        F.concat_ws(":", F.col("j").cast("string"), F.col("v"))
                    ),
                    F.lit(bits),
                ).alias("p"),
            )
            .distinct()
            .groupBy("__file")
            .agg(F.collect_set("p").alias("ps"))
            .collect()
        )
        columns[c] = {r["__file"]: _pack_bits(r["ps"], bits) for r in rows}
    # The COMPLETE file census goes in the manifest: a column's per-file
    # map omits files with zero non-null values for that column, so the
    # candidate universe must not be derived from any single column's
    # keys — a file all-NULL in one indexed column can still match an
    # equality probe on another (lossless-pruning contract).
    all_files = sorted(
        r["__file"] for r in base.select("__file").distinct().collect()
    )
    manifest = {
        "bits": bits,
        "hashes": hashes,
        "files": all_files,
        "columns": columns,
    }
    _fs_write_json(spark, path, "_BLOOM.json", manifest)
    return manifest


def _pack_bits(positions, bits: int) -> str:
    """Pack set positions into a base64 LSB-first bitmap — ~20x smaller
    than a JSON int list and O(bits/8) to test, so the sidecar READ
    path stays flat as the key population grows (an int-list sidecar
    made candidate resolution itself linear in table size — measured as
    a 1.0 scale exponent before this packing)."""
    import base64

    buf = bytearray((bits + 7) // 8)
    for p in positions:
        buf[p >> 3] |= 1 << (p & 7)
    return base64.b64encode(bytes(buf)).decode()


def _bit_set(packed: bytes, p: int) -> bool:
    return bool(packed[p >> 3] & (1 << (p & 7)))


def _bloom_positions(value, j_count: int, bits: int) -> list:
    import hashlib

    return [
        int(hashlib.md5(f"{j}:{value}".encode()).hexdigest()[:15], 16) % bits
        for j in range(j_count)
    ]


def bloom_candidate_files(spark, path: str, equals: dict) -> dict:
    """Resolve equality predicates (``{col: value}``, ANDed) against
    ``_BLOOM.json``: a file survives iff, for every predicate, ALL
    ``hashes`` positions of the value are set in that file's filter.
    No false negatives (every position of every present value was set
    by the census), so pruning is lossless; the read path re-applies
    the exact predicate anyway.  Returns ``{"files": [...], "total":
    n}``."""
    manifest = _fs_read_json(spark, path, "_BLOOM.json")
    bits, hashes = manifest["bits"], manifest["hashes"]
    cols = manifest["columns"]
    for col in equals:
        if col not in cols:
            raise ValueError(f"column {col!r} not in bloom index")
    import base64

    all_files = manifest.get("files")
    if all_files is None:
        # pre-r8 manifest (no file census): reconstruct the universe as
        # the UNION of every column's keys — never a single column's,
        # since a column's map omits its all-NULL files
        union = set()
        for m in cols.values():
            union.update(m)
        all_files = sorted(union)
    keep = []
    for fname in all_files:
        ok = True
        for col, value in equals.items():
            # a file absent from the PROBED column's map has zero
            # non-null values there, so it cannot satisfy col = value —
            # pruning it is lossless for THIS predicate only
            packed = base64.b64decode(cols[col].get(fname, ""))
            if not packed or not all(
                _bit_set(packed, p)
                for p in _bloom_positions(value, hashes, bits)
            ):
                ok = False
                break
        if ok:
            keep.append(fname)
    return {"files": keep, "total": len(all_files)}


def read_bloom(spark, path: str, equals: dict) -> DataFrame:
    """Scan only the files the Bloom index cannot rule out, then apply
    the equality predicates exactly (pruning is a superset filter, so
    results are identical to a full scan).  Empty candidate set returns
    an empty DataFrame with the table's schema."""
    from pyspark.sql import functions as F

    cand = bloom_candidate_files(spark, path, equals)
    full = spark.read.parquet(path)
    out = (
        spark.read.parquet(*cand["files"]) if cand["files"] else full.limit(0)
    )
    for col, value in equals.items():
        out = out.filter(F.col(col) == value)
    return out


def indexed_candidate_files(
    spark, path: str, ranges: Optional[dict] = None,
    equals: Optional[dict] = None,
) -> dict:
    """Resolve range predicates against ``_ZONEMAP.json`` AND equality
    predicates against ``_BLOOM.json`` and INTERSECT the candidate
    sets — a file survives only if no index can rule it out.  Both
    prunings are individually lossless, so the intersection is too.
    Either index may be absent if its predicate kind is unused.
    Returns ``{"files": [...], "total": n}``."""
    if not ranges and not equals:
        raise ValueError("need at least one of ranges / equals")
    files = None
    total = 0
    if ranges:
        z = zonemap_candidate_files(spark, path, ranges)
        files, total = set(z["files"]), z["total"]
    if equals:
        b = bloom_candidate_files(spark, path, equals)
        files = set(b["files"]) if files is None else files & set(b["files"])
        total = max(total, b["total"])
    return {"files": sorted(files), "total": total}


def read_indexed(
    spark, path: str, ranges: Optional[dict] = None,
    equals: Optional[dict] = None,
) -> DataFrame:
    """Scan only the files that BOTH sidecar indexes admit, then apply
    every predicate exactly (superset pruning — results identical to a
    full scan).  The one-call read path over a directory laid out with
    :func:`write_zonemap` (+ optionally Z-order) and
    :func:`write_bloom_index`."""
    from pyspark.sql import functions as F

    cand = indexed_candidate_files(spark, path, ranges, equals)
    full = spark.read.parquet(path)
    out = (
        spark.read.parquet(*cand["files"]) if cand["files"] else full.limit(0)
    )
    for col, (lo, hi) in (ranges or {}).items():
        if lo is not None:
            out = out.filter(F.col(col) >= lo)
        if hi is not None:
            out = out.filter(F.col(col) <= hi)
    for col, value in (equals or {}).items():
        out = out.filter(F.col(col) == value)
    return out
