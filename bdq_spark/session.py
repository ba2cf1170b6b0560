"""Lazy SparkSession helpers.

The reference (`/root/reference/bdq/__init__.py:3-10`) eagerly calls
``SparkSession.builder.getOrCreate()`` and instantiates Databricks
``DBUtils`` at import time, which makes the package un-importable off
Databricks. Here session acquisition is lazy and Databricks-free: callers
either pass a session explicitly or we pick up the active one, building a
local[*] session only as a last resort.

Scale note: the builder defaults below are tuned for correctness at any
scale — AQE on (runtime re-plan, skew-join splitting, partition
coalescing), shuffle partitions sized by the driver via
``SPARK_GRAFT_CPUS``; on a real cluster these come from spark-submit conf
and `get_spark` never overrides an already-running session's conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "builder_defaults"]


def builder_defaults(builder: SparkSession.Builder) -> SparkSession.Builder:
    """Apply scale-aware defaults to a builder (no-op for running sessions)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    return (
        builder.config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )


def get_spark(spark: SparkSession | None = None) -> SparkSession:
    """Return an explicit session, else the active one, else build local[*]."""
    if spark is not None:
        return spark
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    return (
        builder_defaults(SparkSession.builder.master(f"local[{cpus}]"))
        .appName("bdq_spark")
        .getOrCreate()
    )
