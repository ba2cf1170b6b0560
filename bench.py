#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries and prints ONE JSON line.

Env: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default all cores).

Each query is materialized with the ``noop`` sink — full computation, no
driver-side row transfer — so the number measures the engine, not py4j.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bdq_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    # warm up JVM/codegen/scan paths so the first timed query measures the
    # engine rather than one-time initialization
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    timings: dict[str, float] = {}
    for name, fn in queries.items():
        start = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - start, 4)
        # operators may cache intermediates (minhash signatures, shingle
        # sets); drop them so later queries aren't timed under the
        # accumulated memory/GC pressure of earlier ones, and take the
        # stop-the-world GC hit between queries rather than inside one
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                # query-count-independent figures: the suite GROWS between
                # rounds, so compare mean_query_time (or per-query entries)
                # across rounds, not the raw total
                "n_queries": len(timings),
                "mean_query_time": round(total / max(len(timings), 1), 4),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
