"""Exactly-once CDC ingest: MERGE-per-micro-batch into a catalog table.

The production shape the pieces were built for: a streaming change feed
drives ``foreachBatch`` (:func:`bdq_spark.plans.step_spark_for_each_batch`
or plain ``writeStream.foreachBatch``), and every micro-batch is MERGED
into a catalog snapshot table via :func:`bdq_spark.operators.cdc.apply_cdc`
— what Delta/Iceberg pipelines execute as ``MERGE INTO`` per batch,
re-expressed over plain catalog tables (cite:
`/root/reference/bdq/spark_pipeline.py:515` for the reference's
Delta-default sink this stands in for).

Exactly-once reasoning (the guarantees, stated honestly):

- **replay convergence** — after a crash, Structured Streaming replays
  the last uncommitted batch.  ``apply_cdc`` is replay-idempotent
  (latest-change-per-key with delete-wins ties:
  ``apply(apply(base, c), c) == apply(base, c)``, property-tested in
  ``tests/test_cdc.py``), so merging a replayed batch into an
  already-merged snapshot is a no-op and the snapshot converges.
- **no torn snapshots** — the merged snapshot is written to a durable
  STAGING table first, then promoted over the main table, and staging is
  dropped only after the promotion succeeds (the same crash-window
  protocol as :class:`~bdq_spark.plans.CatalogPersistedStateStore`).
  A leftover staging table at batch start means a previous promotion was
  interrupted — it is promoted first, before the new batch merges.
  Staging also breaks the self-read cycle (Spark rejects overwriting a
  table its own plan reads).
- catalog registration is the commit point of a ``saveAsTable`` write —
  the same assumption the state store documents; a sink needing
  byte-level write atomicity should sit on a transactional table format.

Scale shape: per batch, the change feed collapses with one window over
the SMALL batch, the base table pays one anti-join against the touched
keys (broadcast when small), and the snapshot rewrite is the unavoidable
cost of a non-transactional table format — on Delta/Iceberg the same
batch function body becomes a genuine MERGE and the staging dance
disappears.

:func:`cdc_merge_sink` (catalog table) pays that rewrite over the FULL
snapshot each batch — O(table) per trigger, fine for small dimensions,
a scale-killer for a steady trickle into a 100 TB table.
:func:`cdc_merge_sink_partitioned` is the scale path: the snapshot is a
path-based parquet table hash-partitioned on the key into a fixed number
of buckets, each micro-batch derives its TOUCHED buckets from the batch
keys (a bounded ``distinct`` ≤ ``num_buckets``), reads only those
partitions (directory pruning), merges, and rewrites ONLY the touched
partitions — per-batch cost is O(touched buckets), not O(table), which
is exactly what Delta's MERGE file-pruning buys on a transactional
format.
"""

from __future__ import annotations

import posixpath
from typing import Callable, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bdq_spark.operators.cdc import apply_cdc

__all__ = [
    "cdc_merge_sink",
    "cdc_merge_sink_partitioned",
    "recover_snapshot",
    "BUCKET_COLUMN",
]


def cdc_merge_sink(
    spark: SparkSession,
    table: str,
    keys: List[str],
    order_by: List[str],
    op_column: str = "op",
    columns: Optional[List[str]] = None,
    strict: bool = False,
) -> Callable:
    """Build a ``foreachBatch`` function that merges each micro-batch of
    CDC changes into the catalog table ``table``.

    The returned callable accepts ``(batch_df, batch_id, ...)`` so it
    slots into both ``writeStream.foreachBatch`` (2 args) and
    ``step_spark_for_each_batch`` (4 args).  On the first batch the
    snapshot is created from the change feed itself; the default column
    set is the feed's columns minus ``op_column`` and the ``order_by``
    columns — matching ``apply_cdc``'s contract that change-feed
    metadata never leaks into the result (pass ``columns`` to keep a
    version column on purpose).

    See the module docstring for the exactly-once protocol.
    """
    out_cols = columns
    staging = f"{table}__staging"

    def _promote() -> None:
        spark.table(staging).write.mode("overwrite").option(
            "overwriteSchema", "true"
        ).saveAsTable(table)

    def merge(batch_df: DataFrame, batch_id: int, *_ignored) -> None:
        # finish an interrupted promotion first: a surviving staging
        # table is a COMPLETE post-merge snapshot whose promotion
        # crashed — the replayed batch must merge into it, not into
        # the stale (or torn) main table
        if spark.catalog.tableExists(staging):
            _promote()
            spark.sql(f"DROP TABLE IF EXISTS {staging}")

        # an empty micro-batch (e.g. the trailing availableNow trigger)
        # must not pay a full snapshot rewrite
        if batch_df.isEmpty():
            return

        cols = out_cols or [
            c
            for c in batch_df.columns
            if c != op_column and c not in order_by
        ]
        if spark.catalog.tableExists(table):
            base = spark.table(table).select(*cols)
        else:
            base = batch_df.select(*cols).limit(0)
        snap = apply_cdc(
            base,
            batch_df,
            keys,
            order_by,
            op_column=op_column,
            columns=cols,
            strict=strict,
        )
        snap.write.mode("overwrite").option(
            "overwriteSchema", "true"
        ).saveAsTable(staging)
        _promote()
        spark.sql(f"DROP TABLE IF EXISTS {staging}")

    return merge


#: partition column the partitioned sink adds to the stored snapshot
#: (``pmod(xxhash64(*keys), num_buckets)``) — strip it when reading the
#: snapshot as a logical table
BUCKET_COLUMN = "__cdc_bucket"

#: staging-complete commit marker: promotion only ever runs on a staging
#: dir that carries this file, so a crash mid-staging-write can never be
#: promoted as if it were a complete batch
_TOUCHED_MARKER = "_TOUCHED"


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path-class) for ``path`` via the Hadoop FS API —
    portable to HDFS/S3A/local, same pattern as
    :func:`bdq_spark.sources.sinks.compact_parquet`."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jvm.org.apache.hadoop.fs.Path


def _promote_staging(spark: SparkSession, path: str, staging: str) -> None:
    """Promote a COMPLETE staging dir: for every bucket listed in its
    ``_TOUCHED`` marker, replace the main table's partition dir with the
    staged one (delete + rename — rename is the atomic unit on HDFS /
    local; on object stores it is a copy, the documented non-atomicity
    any path-based format shares).

    Idempotent by construction, so it doubles as crash recovery: a
    staged bucket dir that is GONE was already renamed into place by an
    interrupted earlier promotion and is skipped; one still present is
    (re-)promoted.  The staging dir (and with it the marker) is removed
    only after every touched bucket is in place — the same
    commit-point-last ordering as the catalog protocol above.
    """
    fs, Path = _hadoop_fs(spark, path)
    marker = Path(posixpath.join(staging, _TOUCHED_MARKER))
    if not fs.exists(marker):  # torn staging write: discard, never promote
        fs.delete(Path(staging), True)
        return
    stream = fs.open(marker)
    try:
        touched = [
            int(b) for b in bytes(stream.readAllBytes()).decode().split(",") if b
        ]
    finally:
        stream.close()
    fs.mkdirs(Path(path))
    for b in touched:
        part = f"{BUCKET_COLUMN}={b}"
        src = Path(posixpath.join(staging, part))
        dst = Path(posixpath.join(path, part))
        if not fs.exists(src):
            continue  # already renamed into place by an interrupted run
        if fs.exists(dst):
            fs.delete(dst, True)
        if not fs.rename(src, dst):
            raise IOError(f"cdc promote: rename {src} -> {dst} failed")
    fs.delete(Path(staging), True)


def recover_snapshot(spark: SparkSession, path: str) -> bool:
    """Maintenance entry point: heal a partitioned CDC snapshot whose
    writer crashed, WITHOUT constructing the merge closure — finish a
    complete-but-unpromoted staging dir (its ``_TOUCHED`` marker
    present) or discard a torn one.  The merge function performs the
    same recovery on its next batch; this exposes it for operational
    use (cron vacuum, pre-read validation).  Returns True if a staging
    dir was found and resolved, False if there was nothing to do.
    Idempotent and safe to run while no writer is active."""
    staging = path.rstrip("/") + "__staging"
    fs, Path = _hadoop_fs(spark, path)
    if not fs.exists(Path(staging)):
        return False
    _promote_staging(spark, path, staging)
    return True


def cdc_merge_sink_partitioned(
    spark: SparkSession,
    path: str,
    keys: List[str],
    order_by: List[str],
    op_column: str = "op",
    columns: Optional[List[str]] = None,
    strict: bool = False,
    num_buckets: int = 64,
    evolve_schema: bool = False,
) -> Callable:
    """Build a ``foreachBatch`` function that merges each micro-batch of
    CDC changes into the path-based parquet snapshot at ``path``,
    rewriting ONLY the key-hash partitions the batch touches.

    Schema drift (only when ``columns`` is not fixed by the caller): by
    default a feed whose column set diverges from the snapshot's FAILS
    with a clear error — silent narrowing would strip a column from
    rewritten buckets while untouched buckets keep it, a torn schema.
    With ``evolve_schema=True`` the output column set becomes snapshot
    ∪ batch (snapshot order first): a NEW feed column backfills as NULL
    on existing rows, and a feed MISSING a snapshot column upserts NULL
    there — full-row replace semantics, stated rather than implied.

    The snapshot is partitioned by ``BUCKET_COLUMN =
    pmod(xxhash64(*keys), num_buckets)``.  Per batch: the touched
    buckets are a bounded ``distinct`` over the batch keys (≤
    ``num_buckets`` values to the driver), the base rows come from a
    pruned read of just those partition dirs, :func:`apply_cdc` merges,
    and the result is staged then promoted partition-by-partition
    (see :func:`_promote_staging` for the crash protocol; a bucket the
    merge empties is staged as an empty partition dir so its deletion
    promotes too).  Untouched buckets' files are never opened, read, or
    rewritten — per-batch cost is O(touched data), not O(table).

    ``num_buckets`` is a layout constant for the table's lifetime —
    changing it re-keys the directory layout, so pick it like you would
    a bucketed table's bucket count (≈ table size / healthy partition
    size).  Read the snapshot back with
    ``spark.read.parquet(path).drop(BUCKET_COLUMN)``.
    """
    if columns is not None:
        missing_keys = [k for k in keys if k not in columns]
        if missing_keys:
            raise ValueError(
                "cdc_merge_sink_partitioned: columns= must include the "
                f"key columns (missing {missing_keys}) — the snapshot "
                "cannot be bucketed without them"
            )
    out_cols = columns
    staging = path.rstrip("/") + "__staging"

    def bucket_of(df: DataFrame):
        return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(num_buckets))

    def merge(batch_df: DataFrame, batch_id: int, *_ignored) -> None:
        fs, Path = _hadoop_fs(spark, path)
        # finish (or discard) an interrupted previous batch first
        if fs.exists(Path(staging)):
            _promote_staging(spark, path, staging)
        if batch_df.isEmpty():
            return

        batch_cols = [
            c
            for c in batch_df.columns
            if c != op_column and c not in order_by
        ]
        cols = out_cols or batch_cols
        # glob for actual data files: an all-deleted table leaves only
        # EMPTY bucket dirs, which parquet schema inference rejects
        has_data = fs.exists(Path(path)) and fs.globStatus(
            Path(posixpath.join(path, f"{BUCKET_COLUMN}=*", "*.parquet"))
        )
        base_pad: dict = {}
        evolve_all = False
        if has_data:
            # bucket placement hashes the key BYTES, so the key TYPES
            # must stay exactly as the first batch fixed them: a feed
            # that later widens a key (int -> bigint) would hash the
            # same value to a DIFFERENT bucket, strand the stale row in
            # the old partition, and duplicate the key.  Pin every
            # batch to the snapshot's key types before hashing.
            snap_types = {
                f.name: f.dataType
                for f in spark.read.parquet(path).schema.fields
                if f.name in keys
            }
            batch_df = batch_df.withColumns(
                {k: F.col(k).cast(t) for k, t in snap_types.items()}
            )
            if out_cols is None:
                snap_fields = {
                    f.name: f.dataType
                    for f in spark.read.parquet(path).schema.fields
                    if f.name != BUCKET_COLUMN
                }
                batch_types = dict(
                    (f.name, f.dataType) for f in batch_df.schema.fields
                )
                new_cols = [c for c in batch_cols if c not in snap_fields]
                missing = [c for c in snap_fields if c not in batch_cols]
                if (new_cols or missing) and not evolve_schema:
                    raise ValueError(
                        "cdc_merge_sink_partitioned: feed columns "
                        f"diverge from the snapshot (new: {new_cols}, "
                        f"missing: {missing}); pass columns= to fix the "
                        "set or evolve_schema=True to union them"
                    )
                if new_cols or missing:
                    cols = list(snap_fields) + new_cols
                    # NULL-pad both sides: the base lacks the new feed
                    # columns, the feed lacks dropped/late columns
                    base_pad = {
                        c: F.lit(None).cast(batch_types[c])
                        for c in new_cols
                    }
                    batch_df = batch_df.withColumns(
                        {
                            c: F.lit(None).cast(snap_fields[c])
                            for c in missing
                        }
                    )
                    # an evolving batch rewrites EVERY bucket: leaving
                    # old-schema files in untouched partitions makes
                    # later default reads nondeterministic (parquet
                    # schema inference samples one file unless
                    # mergeSchema is set) — pay one full rewrite per
                    # schema change and stay homogeneous
                    evolve_all = True
        touched = sorted(
            r[0]
            for r in batch_df.select(
                bucket_of(batch_df).alias("b")
            ).distinct().collect()  # bounded: ≤ num_buckets rows
        )
        if evolve_all:
            on_disk = [
                int(st.getPath().getName().split("=", 1)[1])
                for st in fs.globStatus(
                    Path(posixpath.join(path, f"{BUCKET_COLUMN}=*"))
                )
            ]
            touched = sorted(set(touched) | set(on_disk))
        if has_data:
            # mergeSchema: the one batch that EVOLVES the schema reads
            # a snapshot whose files do not all agree yet
            base = (
                spark.read.option("mergeSchema", "true")
                .parquet(path)
                .filter(F.col(BUCKET_COLUMN).isin(touched))
            )
            if base_pad:
                base = base.withColumns(base_pad)
            base = base.select(*cols)
        else:
            base = batch_df.select(*cols).limit(0)
        snap = apply_cdc(
            base,
            batch_df,
            keys,
            order_by,
            op_column=op_column,
            columns=cols,
            strict=strict,
        )
        (
            snap.withColumn(BUCKET_COLUMN, bucket_of(snap))
            .repartition(max(len(touched), 1), BUCKET_COLUMN)
            .write.mode("overwrite")
            .partitionBy(BUCKET_COLUMN)
            .parquet(staging)
        )
        # a bucket whose keys were ALL deleted produces no staged rows,
        # hence no partition dir — stage an EMPTY dir so promotion still
        # replaces (deletes) the main table's copy of that bucket
        for b in touched:
            part = Path(posixpath.join(staging, f"{BUCKET_COLUMN}={b}"))
            if not fs.exists(part):
                fs.mkdirs(part)
        # commit point of the staging write: the marker both records the
        # touched-bucket list and gates promotion/recovery
        out = fs.create(
            Path(posixpath.join(staging, _TOUCHED_MARKER)), True
        )
        try:
            out.write(",".join(str(b) for b in touched).encode())
        finally:
            out.close()
        _promote_staging(spark, path, staging)

    return merge
