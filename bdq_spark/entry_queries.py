"""Driver-facing query registry: Spark queries + DuckDB oracle SQL.

Each entry exercises one operator from SURVEY.md §2 (or a headline
analytical query) end-to-end against the driver testdata.  Conventions:

- identical column aliases in Spark and SQL (driver hashes by sorted
  column name);
- timestamps output as ``unix_millis`` / ``epoch_ms`` bigints (ns-vs-us
  parquet precision differs between engines);
- money/quantity aggregations go through exact ``decimal`` arithmetic and
  are cast back to ``double`` at the end, so results don't depend on
  floating-point summation order (all testdata doubles are exact
  2-decimal values — verified);
- every query takes ``(spark, sf_dir)`` and returns a lazy DataFrame.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bdq_spark.functions import surrogate_key_hash, surrogate_key_string
from bdq_spark.operators import (
    compare_dataframes,
    fact_dim_broken_relationship,
    get_latest_records,
    get_latest_records_with_pk_confict_detection_flag,
    validate_primary_key_candidate,
)
from bdq_spark.sources import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: Dict[str, QueryFn] = {}
ORACLE_SQL: Dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def wrap(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return wrap


def _dec(col: str, prec: int = 12, scale: int = 2):
    return F.col(col).cast(f"decimal({prec},{scale})")


# ---------------------------------------------------------------------------
# O6 — get_latest_records: latest event per user (flagship)
# ---------------------------------------------------------------------------

@_register(
    "latest_events",
    """
    SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type, value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    latest = get_latest_records(ev, ["user_id"], ["ts", "event_id"])
    return latest.select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        "event_type",
        "value",
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver smoke entry: latest event per user at sf0.001."""
    return latest_events(spark, sf_dir)


# ---------------------------------------------------------------------------
# O7 — latest records with PK-conflict flag (day-truncated ts => real ties)
# ---------------------------------------------------------------------------

@_register(
    "latest_events_conflict",
    """
    WITH d AS (
      SELECT DISTINCT user_id, event_type, value,
             date_trunc('day', ts) AS ts_day
      FROM events),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY user_id ORDER BY ts_day DESC) AS rn,
             dense_rank() OVER (PARTITION BY user_id ORDER BY ts_day DESC) AS dr
      FROM d),
    kept AS (SELECT * FROM r WHERE dr = 1),
    conflicts AS (SELECT DISTINCT user_id FROM kept WHERE rn <> 1)
    SELECT k.user_id, k.event_type, k.value,
           epoch_ms(k.ts_day) AS ts_day_ms,
           (c.user_id IS NOT NULL) AS has_pk_conflict
    FROM kept k LEFT JOIN conflicts c ON k.user_id = c.user_id
    """,
)
def latest_events_conflict(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", F.date_trunc("day", F.col("ts")).alias("ts_day")
    )
    out = get_latest_records_with_pk_confict_detection_flag(ev, ["user_id"], ["ts_day"])
    return out.select(
        "user_id",
        "event_type",
        "value",
        F.unix_millis("ts_day").alias("ts_day_ms"),
        F.col("__has_pk_conflict").alias("has_pk_conflict"),
    )


# ---------------------------------------------------------------------------
# O1 — compare_dataframes: diff two deterministic perturbations of orders
# ---------------------------------------------------------------------------

_COMPARE_ORACLE = """
WITH df1 AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
df2 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderdate,
         CASE WHEN o_orderkey % 11 = 0 THEN 'X-PERTURBED'
              ELSE o_orderpriority END AS o_orderpriority
  FROM orders WHERE o_orderkey % 5 <> 0)
SELECT COALESCE(df1.o_orderkey, df2.o_orderkey) AS o_orderkey,
       CASE WHEN df1.o_orderkey IS NULL THEN 'added'
            WHEN df2.o_orderkey IS NULL THEN 'removed'
            WHEN (df1.o_custkey       IS DISTINCT FROM df2.o_custkey)
              OR (df1.o_orderstatus   IS DISTINCT FROM df2.o_orderstatus)
              OR (df1.o_totalprice    IS DISTINCT FROM df2.o_totalprice)
              OR (df1.o_orderdate     IS DISTINCT FROM df2.o_orderdate)
              OR (df1.o_orderpriority IS DISTINCT FROM df2.o_orderpriority)
            THEN 'changed' ELSE 'not_changed' END AS diff_status
FROM df1 FULL OUTER JOIN df2 ON df1.o_orderkey = df2.o_orderkey
"""


@_register("compare_orders_diff", _COMPARE_ORACLE)
def compare_orders_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    df1 = orders.filter(F.col("o_orderkey") % 3 != 0)
    df2 = (
        orders.filter(F.col("o_orderkey") % 5 != 0)
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 10.0)
            .otherwise(F.col("o_totalprice")),
        )
        .withColumn(
            "o_orderpriority",
            F.when(F.col("o_orderkey") % 11 == 0, F.lit("X-PERTURBED"))
            .otherwise(F.col("o_orderpriority")),
        )
    )
    diff = compare_dataframes(df1, df2, ["o_orderkey"])
    parts = [
        diff["added"].select("o_orderkey", F.lit("added").alias("diff_status")),
        diff["removed"].select("o_orderkey", F.lit("removed").alias("diff_status")),
        diff["changed"].select("o_orderkey", F.lit("changed").alias("diff_status")),
        diff["not_changed"].select(
            "o_orderkey", F.lit("not_changed").alias("diff_status")
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# O4 — fact_dim_broken_relationship: lineitem.l_partkey -> filtered part
# ---------------------------------------------------------------------------

@_register(
    "fk_broken_lineitem_part",
    """
    SELECT DISTINCT l_partkey FROM lineitem l
    WHERE NOT EXISTS (
      SELECT 1 FROM part p
      WHERE p.p_partkey % 97 <> 0 AND p.p_partkey = l.l_partkey)
    """,
)
def fk_broken_lineitem_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    dim = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 97 != 0)
    return fact_dim_broken_relationship(
        lineitem, ["l_partkey"], dim, ["p_partkey"], sample_broken_records=0
    )


@_register(
    "fk_broken_sampled",
    """
    SELECT l_partkey, CAST(LEAST(count(*), 3) AS BIGINT) AS n_samples
    FROM lineitem l
    WHERE NOT EXISTS (
      SELECT 1 FROM part p
      WHERE p.p_partkey % 97 <> 0 AND p.p_partkey = l.l_partkey)
    GROUP BY l_partkey
    """,
)
def fk_broken_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    dim = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 97 != 0)
    sampled = fact_dim_broken_relationship(
        lineitem, ["l_partkey"], dim, ["p_partkey"], sample_broken_records=3
    )
    return sampled.select(
        "l_partkey", F.size("sample_records").cast("bigint").alias("n_samples")
    )


# ---------------------------------------------------------------------------
# O8 — validate_primary_key_candidate
# ---------------------------------------------------------------------------

_PK_ORACLE = """
SELECT (SELECT count(*) FROM lineitem) AS record_count,
       CAST(COALESCE((SELECT sum(cnt) FROM (
         SELECT count(*) AS cnt FROM lineitem GROUP BY {keys}
         HAVING count(*) > 1) g), 0) AS BIGINT) AS failed_records
"""


@_register("pk_validate_lineitem_orderkey", _PK_ORACLE.format(keys="l_orderkey"))
def pk_validate_lineitem_orderkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "lineitem")
    res = validate_primary_key_candidate(df, ["l_orderkey"])
    return spark.createDataFrame(
        [(res["record_count"], res["failed_records"])],
        "record_count: long, failed_records: long",
    )


@_register(
    "pk_validate_lineitem_composite",
    _PK_ORACLE.format(keys="l_orderkey, l_linenumber"),
)
def pk_validate_lineitem_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "lineitem")
    res = validate_primary_key_candidate(df, ["l_orderkey", "l_linenumber"])
    return spark.createDataFrame(
        [(res["record_count"], res["failed_records"])],
        "record_count: long, failed_records: long",
    )


# ---------------------------------------------------------------------------
# O10/O11 — surrogate keys on customer
# ---------------------------------------------------------------------------

@_register(
    "surrogate_key_string_customer",
    """
    SELECT c_custkey,
           '[' || COALESCE(upper(c_name), '@~<null>~@') || ', '
               || COALESCE(upper(c_mktsegment), '@~<null>~@') || ']' AS sk
    FROM customer
    """,
)
def surrogate_key_string_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "customer")
    return df.select(
        "c_custkey", surrogate_key_string(["c_name", "c_mktsegment"]).alias("sk")
    )


@_register("surrogate_key_hash_customer")  # rows-only: DuckDB lacks sha224
def surrogate_key_hash_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "customer")
    return df.select(
        "c_custkey",
        F.hex(surrogate_key_hash(["c_name", "c_mktsegment"])).alias("sk_hex"),
    )


# ---------------------------------------------------------------------------
# Headline analytical queries (scan/filter/agg/join coverage + bench)
# ---------------------------------------------------------------------------

@_register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
                AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                    * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2))))
                AS DOUBLE) AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(3,2)")
    price = _dec("l_extendedprice")
    disc = F.col("l_discount").cast("decimal(3,2)")
    tax = F.col("l_tax").cast("decimal(3,2)")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_register(
    "top_customers_by_revenue",
    """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    # aggregate orders first (shrinks the join's big side to one row per
    # customer), then join — at 100 TB this is agg-then-join, not join-then-agg
    rev = orders.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        rev.join(customer, rev.o_custkey == customer.c_custkey)
        .select("c_custkey", "c_name", "revenue", "n_orders")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(10)
    )


@_register(
    "order_priority_check",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").alias("o")
    l = load_table(spark, sf_dir, "lineitem").alias("l")
    filtered = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    cond = (F.col("l.l_orderkey") == F.col("o.o_orderkey")) & (
        F.col("l.l_shipdate") > F.col("o.o_orderdate")
    )
    return (
        filtered.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@_register(
    "customers_per_region",
    """
    SELECT r_name, count(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def customers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # nation/region are tiny dims: broadcast both so the fact never shuffles
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Extension — exact dedup by business key (latest wins)
# ---------------------------------------------------------------------------

@_register(
    "dedup_events_by_user_type",
    """
    SELECT user_id, event_type, event_id, epoch_ms(ts) AS ts_ms, value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def dedup_events_by_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    latest = get_latest_records(ev, ["user_id", "event_type"], ["ts", "event_id"])
    return latest.select(
        "user_id", "event_type", "event_id", F.unix_millis("ts").alias("ts_ms"), "value"
    )
