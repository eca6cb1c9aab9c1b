"""Round-5 verdict item 10: REPLICATED-SCALE SOAK of the priciest gate
queries — evidence that the shared-checkpoint + capped-shuffle sizing
holds when the triple table grows past one locality domain.

The sandbox has no sf0.5 testdata, so the soak input is sf0.1 with
``lineitem`` replicated 4x under shifted order keys (4x conversations,
4x turns, same skewed entity distribution — built by
scripts/make_soak_input.py-style DuckDB COPY; transcripts derive from
lineitem only, and the synthesis SQL is engine-portable, so the DuckDB
oracle agrees by construction at the replicated scale too).

For each query, at BOTH scales: run the Spark query, hash it
driver-faithfully (string renderings, sorted columns/rows — identical
to scripts/gate_check.py), run the DuckDB oracle, compare, and record
wall-clock.  PASS = every hash matches at both scales AND total soak
wall-clock grows sub-linearly (< 4x the sf0.1 wall — the VM is noisy,
so the interesting signal is "far from 4x", not a tight bound).

Usage: python scripts/soak_check.py [--soak-dir /tmp/soak_sf]
       [--queries a,b,c] [--out BENCH/SOAK_R5.md] [--title "..."]
Round 6 adds the UPDATE-path soak (verdict item 10): the mutation
queries re-run at 4x input (documents replicated 4x too) — commit
wall-clock must stay sublinear as the rewrite set grows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

# The five priciest r4-bench gate queries whose DUCKDB oracles stay
# tractable at 4x: kg_entity_triangles is excluded because its ORACLE
# (not the Spark plan) spills >70 GB of DuckDB temp at the replicated
# scale (observed; the 4x-denser >=2-conv co-occurrence graph blows up
# an intermediate on the DuckDB side) — the Spark side is the
# degree-ordered O(sqrt E) plan and scales fine (bench extras).
QUERIES = [
    "kg_path_conv_turns",
    "kg_entity_components",
    "kg_frame_tool_turns",
    "kg_list_walk",
    "kg_triples_delta_snapshot",
]
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--soak-dir", default="/tmp/soak_sf")
    ap.add_argument("--base-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", default=",".join(QUERIES))
    ap.add_argument("--out", default="BENCH/SOAK_R5.md")
    ap.add_argument("--title", default="Round-5 replicated-scale soak (4x sf0.1 conversations)")
    args = ap.parse_args()
    queries = [q for q in args.queries.split(",") if q]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from bench import make_spark
    from gate_check import canon

    spark = make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entrymod.queries()
    omap = entrymod.oracle_sql()

    results: dict[str, dict] = {}
    for label, sf_dir in (("sf0.1", args.base_dir), ("soak4x", args.soak_dir)):
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        for name in queries:
            t0 = time.perf_counter()
            pdf = qmap[name](spark, sf_dir).toPandas()
            secs = time.perf_counter() - t0
            opdf = con.execute(omap[name]).df()
            ok = (
                len(pdf) == len(opdf)
                and sorted(pdf.columns) == sorted(opdf.columns)
                and canon(pdf) == canon(opdf)
            )
            results.setdefault(name, {})[label] = {
                "sec": round(secs, 1), "rows": len(pdf), "hash_ok": bool(ok),
            }
            print(f"{label} {name}: {'OK' if ok else 'MISMATCH'} "
                  f"rows={len(pdf)} sec={secs:.1f}", flush=True)
        con.close()

    base_total = sum(r["sf0.1"]["sec"] for r in results.values())
    soak_total = sum(r["soak4x"]["sec"] for r in results.values())
    growth = soak_total / base_total if base_total else float("inf")
    all_ok = all(r[s]["hash_ok"] for r in results.values() for s in r)
    out = {
        "queries": results,
        "base_total_sec": round(base_total, 1),
        "soak_total_sec": round(soak_total, 1),
        "wall_growth_at_4x_input": round(growth, 2),
        "sub_linear": growth < 4.0,
        "all_hashes_ok": all_ok,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open(args.out, "w") as f:
        f.write(f"# {args.title}\n\n")
        f.write("Input: lineitem replicated 4x under shifted order keys "
                "(4x conversations/turns; same skew).  Hashes checked "
                "driver-faithfully vs DuckDB at BOTH scales.\n\n```json\n")
        f.write(json.dumps(out, indent=1))
        f.write("\n```\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
