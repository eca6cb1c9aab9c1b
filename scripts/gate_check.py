"""Driver-faithful gate check: run queries() vs oracle_sql() at sf0.01,
compare row count, column names, and a canonical STRING-RENDERED value
hash (the driver hashes rendered values, so Decimal('1.00') vs float 1.0
mismatches — exactly the failure mode the local _norm-based test missed).

Usage: python scripts/gate_check.py [query ...]   (default: all)
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402

import os

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        tuple(repr(v) if isinstance(v, (list, dict)) else str(v) for v in r)
        for r in pdf.itertuples(index=False, name=None)
    )
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> None:
    only = set(sys.argv[1:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("gate-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name in sorted(queries):
        if only and name not in only:
            continue
        try:
            sdf = queries[name](spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERR {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(sdf)} rows, no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERR {type(e).__name__}: {e}")
            failures += 1
            continue
        rows_ok = len(sdf) == len(odf)
        cols_ok = sorted(sdf.columns) == sorted(odf.columns)
        hash_ok = cols_ok and canon(sdf) == canon(odf)
        status = "OK" if (rows_ok and cols_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name}: {status} rows={len(sdf)}/{len(odf)} cols={cols_ok} hash={hash_ok}"
        )
        if not hash_ok and cols_ok and rows_ok and len(sdf) > 0:
            c = sorted(sdf.columns)
            s0 = sorted(tuple(str(v) for v in r) for r in sdf[c].itertuples(index=False, name=None))
            o0 = sorted(tuple(str(v) for v in r) for r in odf[c].itertuples(index=False, name=None))
            diffs = [(a, b) for a, b in zip(s0, o0) if a != b][:2]
            for a, b in diffs:
                print(f"    spark : {a}\n    oracle: {b}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
