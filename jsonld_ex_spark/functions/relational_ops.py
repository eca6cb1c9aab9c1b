"""Relational coverage queries (SURVEY.md §2.2: scans, filters, joins,
aggregations, windows, sorts/limits, set ops) over the TPC-H-ish tables.

Monetary aggregates are cast to DECIMAL(18,2) before summing so results
are bit-exact across Spark and DuckDB (double summation order is not),
then emitted as integer cents (``CAST(x * 100 AS BIGINT)``): Spark
renders DECIMAL(38,2) with trailing zeros ('248095.00') while DuckDB's
.df() downcasts DECIMAL to float64 ('248095.0'), so a DECIMAL output
column hash-mismatches in the gate even when the values are identical.
BIGINT cents render identically everywhere (CLAUDE.md: integer
quantization for cross-engine exactness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _sql(spark: SparkSession, sf_dir: str, tables: list[str], sql: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # timestamp literals
    for t in tables:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return spark.sql(sql)


_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty_c,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_base_price_c,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

_Q_JOIN = """
SELECT n.n_name AS nation, r.r_name AS region,
       count(*) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
"""

_Q_WINDOW = """
SELECT o_custkey, o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS totalprice_c,
       row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100 AS BIGINT) AS running_spend_c
FROM orders
"""

_Q_TOPK = """
SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS spend_c
FROM orders
GROUP BY o_custkey
ORDER BY spend_c DESC, o_custkey ASC
LIMIT 10
"""

_Q_EVENTS = """
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value_c
FROM events
GROUP BY event_type
"""

_Q_SETOPS = """
SELECT user_id FROM events WHERE event_type = 'purchase'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error'
"""


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, ["lineitem"], _Q1)


def join_customer_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join; nation/region are broadcast by Catalyst (tiny dims)."""
    return _sql(spark, sf_dir, ["customer", "nation", "region"], _Q_JOIN)


def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, ["orders"], _Q_WINDOW)


def topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, ["orders"], _Q_TOPK)


def events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, ["events"], _Q_EVENTS)


def purchasers_without_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, ["events"], _Q_SETOPS)


def queries():
    return {
        "tpch_q1": tpch_q1,
        "join_customer_geo": join_customer_geo,
        "window_running_spend": window_running_spend,
        "topk_customers": topk_customers,
        "events_by_type": events_by_type,
        "purchasers_without_errors": purchasers_without_errors,
    }


def oracle_sql():
    return {
        "tpch_q1": _Q1,
        "join_customer_geo": _Q_JOIN,
        "window_running_spend": _Q_WINDOW,
        "topk_customers": _Q_TOPK,
        "events_by_type": _Q_EVENTS,
        "purchasers_without_errors": _Q_SETOPS,
    }
