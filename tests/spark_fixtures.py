"""Shared SparkSession + Spark↔DuckDB comparison helpers for tests.

compare_with_oracle mirrors the driver's correctness gate: row count,
column names, and order-insensitive value comparison (columns sorted by
name, rows sorted by all columns).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .appName("jsonld_ex_spark-tests")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def duck_con(sf_dir: str = SF_DIR):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def compare_with_oracle(spark_df, oracle_sql: str, sf_dir: str = SF_DIR):
    con = duck_con(sf_dir)
    oracle = con.execute(oracle_sql)
    o_cols = [d[0] for d in oracle.description]
    o_rows = oracle.fetchall()
    s_cols = spark_df.columns
    assert sorted(s_cols) == sorted(o_cols), f"columns differ: {s_cols} vs {o_cols}"
    s_rows = [tuple(r[c] for c in sorted(s_cols)) for r in spark_df.collect()]
    o_idx = [o_cols.index(c) for c in sorted(o_cols)]
    o_rows = [tuple(r[i] for i in o_idx) for r in o_rows]
    assert len(s_rows) == len(o_rows), f"row count {len(s_rows)} vs {len(o_rows)}"
    s_sorted = sorted((tuple(map(_norm, r)) for r in s_rows), key=repr)
    o_sorted = sorted((tuple(map(_norm, r)) for r in o_rows), key=repr)
    mismatches = [(a, b) for a, b in zip(s_sorted, o_sorted) if a != b]
    assert not mismatches, f"{len(mismatches)} mismatching rows; first: {mismatches[:3]}"
