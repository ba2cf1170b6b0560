"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Conventions used throughout:

- every computed column is aliased identically in the Spark query and the
  DuckDB oracle (the driver sorts columns by name before hashing);
- timestamps in outputs are projected as ``unix_millis`` bigints (Spark)
  / ``epoch_ms`` (DuckDB) to dodge ns-vs-us precision differences
  (TESTDATA: ``events.ts`` is ns, others ms);
- double aggregations are computed over ``decimal`` casts and cast back to
  double, so the result is independent of Spark's partial-aggregation
  order (float addition is not associative; decimal is exact).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bdq_spark import entry_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return entry_queries.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return entry_queries.QUERIES


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per queries() key (subset: ops with a
    SQL-expressible semantics; the rest get rows-only checks)."""
    return entry_queries.ORACLE_SQL
