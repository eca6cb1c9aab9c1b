"""spark-submit entrypoint: SPARQL-Update-style mutation of a snapshot
triple table — the production deployment of operators/graph_update.

    scripts/make_pyfiles.sh
    spark-submit --py-files dist/jsonld_ex_spark.zip jobs/update_graph.py \
        --table /data/triple_snapshots \
        --delete '?turn <https://sparkld.dev/vocab#tool> ?tn' \
        --insert '?turn <https://sparkld.dev/vocab#redacted> "true"' \
        --where  '?turn <https://sparkld.dev/vocab#tool> ?tn'

Forms:
* --delete/--insert/--where   — DELETE { D } INSERT { I } WHERE { W }
  (either template may be omitted; omitting --where with only --delete
  runs DELETE WHERE { D }, the SPARQL shorthand).
* --insert-parquet PATH       — INSERT DATA from a parquet triple table
  (standard 7-column schema); no patterns allowed.

Every mutation is ONE atomic snapshot commit (sources/snapshot_table):
readers see the pre- or post-update graph, never a torn state, and the
pre-update snapshot stays readable for time travel/audit.  Prints ONE
JSON metrics line with the committed snapshot id and row counts.
"""

from __future__ import annotations

import argparse
import json
import time

from query_graph import parse_pattern  # same term grammar (jobs/ is on
# sys.path when spark-submit runs this script)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--table", required=True, help="snapshot table dir")
    p.add_argument("--delete", action="append", default=[])
    p.add_argument("--insert", action="append", default=[])
    p.add_argument("--where", action="append", default=[])
    p.add_argument("--insert-parquet", default=None, dest="insert_parquet")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("jsonld-ex-spark:update_graph")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from jsonld_ex_spark.operators.graph_update import (
        delete_insert,
        delete_where,
        insert_data,
    )
    from jsonld_ex_spark.sources.snapshot_table import (
        current_snapshot_id,
        read_snapshot,
    )

    t0 = time.perf_counter()
    # a fresh table (bootstrap INSERT DATA) has no snapshot to count
    before = (
        read_snapshot(spark, args.table).count()
        if current_snapshot_id(args.table) else 0
    )
    if args.insert_parquet:
        if args.delete or args.insert or args.where:
            raise SystemExit("--insert-parquet takes no patterns (INSERT DATA)")
        snap = insert_data(spark.read.parquet(args.insert_parquet), args.table)
        kind = "insert_data"
    else:
        delete = [parse_pattern(t) for t in args.delete]
        insert = [parse_pattern(t) for t in args.insert]
        where = [parse_pattern(t) for t in args.where]
        for pat in delete + insert + where:
            if len(pat) == 4:
                raise SystemExit(
                    f"update patterns are triples, not quads: {' '.join(pat)!r} "
                    "(graph-scoped update is out of scope — deletion matches "
                    "the lexical triple across all graphs)"
                )
        if not delete and not insert:
            raise SystemExit("need --delete and/or --insert (or --insert-parquet)")
        if not where:
            if insert:
                raise SystemExit("--insert requires --where (bindings drive the template)")
            snap = delete_where(spark, args.table, delete)
            kind = "delete_where"
        else:
            snap = delete_insert(spark, args.table, delete, insert, where)
            kind = "modify"
    after = read_snapshot(spark, args.table).count()
    print(
        json.dumps(
            {
                "job": "update_graph",
                "kind": kind,
                "snapshot_id": snap,
                "current": current_snapshot_id(args.table),
                "rows_before": before,
                "rows_after": after,
                "sec": round(time.perf_counter() - t0, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
