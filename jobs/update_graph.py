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
  runs DELETE WHERE { D }, the SPARQL shorthand).  Patterns may be
  QUADS ('?s <p> ?o <graph-iri>' / '... ?g') for graph-scoped
  matching; --with-graph IRI scopes every TRIPLE pattern to that
  named graph (SPARQL WITH).
* --insert-parquet PATH       — INSERT DATA from a parquet triple table
  (standard 7-column schema); no patterns allowed.
* --sparql 'UPDATE TEXT'      — a full SPARQL Update string (INSERT
  DATA / DELETE DATA / DELETE WHERE / [WITH g] DELETE-INSERT-WHERE /
  LOAD <uri> [INTO GRAPH <g>] / CLEAR / ADD / COPY / MOVE), parsed by
  operators/sparql_text.py;
  mutually exclusive with every other operation flag.
* --clear-graph IRI|DEFAULT   — SPARQL CLEAR GRAPH (DROP: identical).
* --copy/--move/--add-graph 'SRC DST' (IRI or DEFAULT) — SPARQL
  COPY/MOVE/ADD graph management.

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


def graph_arg(tok: str) -> str | None:
    """Normalize a CLI graph token to the bare-IRI form the library
    expects: accept both the bare IRI and the ``<iri>`` form every
    pattern flag uses — passing ``'<urn:g1>'`` through verbatim would
    literal-compare against the bare-IRI graph column, silently
    matching nothing (round-5 review).  ``DEFAULT`` → None (the
    default graph)."""
    tok = tok.strip()
    if tok == "DEFAULT":
        return None
    if tok.startswith("<") and tok.endswith(">"):
        tok = tok[1:-1]
    return tok


def with_graph_arg(tok: str) -> str:
    """``--with-graph`` normalizer: SPARQL ``WITH`` takes an IRI only
    (there is no WITH DEFAULT), and _scope_to_graph wraps the bare IRI
    in <> itself — so strip a <>-wrapped form and reject DEFAULT."""
    g = graph_arg(tok)
    if g is None:
        raise SystemExit("--with-graph takes an IRI (SPARQL WITH has no DEFAULT form)")
    return g


def src_dst(flag: str, val: str) -> tuple[str | None, str | None]:
    parts = val.split()
    if len(parts) != 2:
        raise SystemExit(f"{flag} takes 'SRC DST' (IRI or DEFAULT), got {val!r}")
    return graph_arg(parts[0]), graph_arg(parts[1])


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--table", required=True, help="snapshot table dir")
    p.add_argument("--delete", action="append", default=[])
    p.add_argument("--insert", action="append", default=[])
    p.add_argument("--where", action="append", default=[])
    p.add_argument("--insert-parquet", default=None, dest="insert_parquet")
    p.add_argument("--with-graph", default=None, dest="with_graph",
                   help="scope triple patterns to this named graph (SPARQL WITH)")
    p.add_argument("--clear-graph", default=None, dest="clear_graph",
                   help="CLEAR GRAPH <iri> (or DEFAULT)")
    p.add_argument("--copy-graph", default=None, dest="copy_graph",
                   help="'SRC DST' — COPY SRC TO DST (IRI or DEFAULT)")
    p.add_argument("--move-graph", default=None, dest="move_graph",
                   help="'SRC DST' — MOVE SRC TO DST (IRI or DEFAULT)")
    p.add_argument("--add-graph", default=None, dest="add_graph",
                   help="'SRC DST' — ADD SRC TO DST (IRI or DEFAULT)")
    p.add_argument("--sparql", default=None,
                   help="a full SPARQL Update string (INSERT DATA / DELETE "
                        "DATA / DELETE WHERE / WITH-DELETE-INSERT-WHERE / "
                        "CLEAR / ADD / COPY / MOVE); mutually exclusive "
                        "with the per-flag surface")
    args = p.parse_args()

    if args.sparql:
        if (args.delete or args.insert or args.where or args.insert_parquet or
                args.with_graph or args.clear_graph or args.copy_graph or
                args.move_graph or args.add_graph):
            raise SystemExit(
                "--sparql carries the whole update; it takes no other "
                "operation flags"
            )
        # validate before the SparkSession so bad input fails fast
        from jsonld_ex_spark.operators.sparql_text import parse_sparql_update

        try:
            parse_sparql_update(args.sparql)
        except ValueError as exc:
            raise SystemExit(f"--sparql: {exc}")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("jsonld-ex-spark:update_graph")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from jsonld_ex_spark.operators.graph_update import (
        add_graph,
        clear_graph,
        copy_graph,
        delete_insert,
        delete_where,
        insert_data,
        move_graph,
    )
    from jsonld_ex_spark.sources.snapshot_table import (
        current_snapshot_id,
        read_snapshot,
    )

    mgmt = [f for f in (args.clear_graph, args.copy_graph,
                        args.move_graph, args.add_graph) if f is not None]
    t0 = time.perf_counter()
    # a fresh table (bootstrap INSERT DATA) has no snapshot to count
    before = (
        read_snapshot(spark, args.table).count()
        if current_snapshot_id(args.table) else 0
    )
    if mgmt:
        if len(mgmt) > 1 or args.delete or args.insert or args.where \
                or args.insert_parquet or args.with_graph:
            raise SystemExit("graph management takes exactly ONE operation and no patterns")
        if args.clear_graph is not None:
            snap = clear_graph(spark, args.table, graph_arg(args.clear_graph))
            kind = "clear_graph"
        elif args.copy_graph is not None:
            snap = copy_graph(spark, args.table, *src_dst("--copy-graph", args.copy_graph))
            kind = "copy_graph"
        elif args.move_graph is not None:
            snap = move_graph(spark, args.table, *src_dst("--move-graph", args.move_graph))
            kind = "move_graph"
        else:
            snap = add_graph(spark, args.table, *src_dst("--add-graph", args.add_graph))
            kind = "add_graph"
    elif args.sparql:
        from jsonld_ex_spark.operators.sparql_text import run_sparql_update

        res = run_sparql_update(spark, args.table, args.sparql)
        snap, kind = res["snapshot"], f"sparql_{res['kind']}"
    elif args.insert_parquet:
        if args.delete or args.insert or args.where:
            raise SystemExit("--insert-parquet takes no patterns (INSERT DATA)")
        snap = insert_data(spark.read.parquet(args.insert_parquet), args.table)
        kind = "insert_data"
    else:
        delete = [parse_pattern(t) for t in args.delete]
        insert = [parse_pattern(t) for t in args.insert]
        where = [parse_pattern(t) for t in args.where]
        scope = with_graph_arg(args.with_graph) if args.with_graph else None
        if not delete and not insert:
            raise SystemExit("need --delete and/or --insert (or --insert-parquet)")
        if not where:
            if insert:
                raise SystemExit("--insert requires --where (bindings drive the template)")
            snap = delete_where(spark, args.table, delete, with_graph=scope)
            kind = "delete_where"
        else:
            snap = delete_insert(
                spark, args.table, delete, insert, where,
                with_graph=scope,
            )
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
