"""spark-submit entrypoint: graph-pattern query over a persisted triple
table — the production deployment of the BGP layer.

    scripts/make_pyfiles.sh
    spark-submit --py-files dist/jsonld_ex_spark.zip jobs/query_graph.py \
        --triples /data/triple_table \
        --output  /tmp/matches \
        --pattern '?turn <https://sparkld.dev/vocab#role> "tool"' \
        --pattern '?turn <https://sparkld.dev/vocab#mentions> ?entity' \
        [--optional '?turn <https://sparkld.dev/vocab#tool> ?toolname'] \
        [--construct '?entity <https://sparkld.dev/vocab#mentionedBy> ?turn'] \
        [--filter 'idx gt 5'] [--filter 'entity regex E00..$'] \
    [--exists '?turn <...#tool> ?tn'] [--not-exists '?turn <...#tool> ?tn'] \
    [--describe '<iri>' ... | --describe '?var'] \
        [--order-by 'entity asc' --limit 100]

Or hand the job a FULL SPARQL query string (parsed by
operators/sparql_text.py — prefixes, paths, OPTIONAL/UNION/MINUS/
EXISTS, FILTER/BIND function library, aggregates, paging, ASK/
CONSTRUCT/DESCRIBE):

    spark-submit ... jobs/query_graph.py --triples T --output O \
        --sparql 'PREFIX v: <https://sparkld.dev/vocab#>
                  SELECT ?t ?e WHERE { ?t v:role "tool" ; v:mentions ?e }'

Each --pattern/--optional/--exists/--not-exists/--construct is one
whitespace-separated triple pattern — or QUAD pattern with a 4th graph
term (<iri> scopes to a named graph, ?g binds it) (?var, <iri>, "literal" terms; literals must not contain
spaces — use the Python API for arbitrary literals).  --filter is
'var op value' with op in gt/ge/lt/le/eq/ne/regex (an all-digit value
compares numerically).  --order-by 'col asc|desc' (repeatable; must be
a total order) with --limit selects a deterministic top-k via
TakeOrderedAndProject.  With --construct the matches are instantiated
into new triples and written via write_triples (subject-bucketed,
ready to be queried again); otherwise the binding table is written as
parquet.  Pattern constants AND filters reach the triple scan as
pushed predicates below the joins (tests/test_bgp.py).

--describe switches to SPARQL DESCRIBE (Concise Bounded Description:
the node's triples plus its blank-node closure — an rdf:list spine
comes back whole), written as parquet rows (root, subj, pred, obj,
obj_is_iri).  Roots are IRIs (repeatable; no other query flags apply)
or exactly one ?var bound by --pattern (then --filter/--optional/
--exists/--not-exists restrict which nodes get described).

Prints ONE JSON metrics line.
"""

from __future__ import annotations

import argparse
import json
import time


def parse_pattern(text: str) -> tuple[str, ...]:
    parts = text.split()
    if len(parts) not in (3, 4):
        raise SystemExit(
            f"pattern must have 3 (triple) or 4 (quad: s p o g — SPARQL "
            f"GRAPH clause) whitespace-separated terms: {text!r}"
        )
    return tuple(parts)


def parse_filter(text: str) -> tuple[str, str, object]:
    import re

    parts = text.split(None, 2)
    if len(parts) != 3:
        raise SystemExit(f"filter must be 'var op value': {text!r}")
    var, op, value = parts
    if op != "regex":
        # quoting opts into LEXICAL comparison against an all-digit
        # literal: --filter 'idx eq "7"' compares strings
        if len(value) >= 2 and value[0] == '"' and value[-1] == '"':
            return (var, op, value[1:-1])
        # strict integer only ('--5'.lstrip('-').isdigit() was true
        # but int('--5') raised an unhandled traceback)
        if re.fullmatch(r"-?[0-9]+", value):
            return (var, op, int(value))
    return (var, op, value)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--triples", required=True, help="persisted triple table (write_triples output)")
    p.add_argument("--output", required=True)
    p.add_argument("--pattern", action="append", default=[])
    p.add_argument("--describe", action="append", default=[],
                   help="DESCRIBE mode: a root IRI (repeatable), or ONE "
                        "?var bound by --pattern (CBD: the node's triples "
                        "+ its blank-node closure)")
    p.add_argument("--optional", action="append", default=[])
    p.add_argument("--exists", action="append", default=[],
                   help="FILTER EXISTS pattern (semi-join; repeatable)")
    p.add_argument("--not-exists", action="append", default=[], dest="not_exists",
                   help="FILTER NOT EXISTS pattern (anti-join; repeatable)")
    p.add_argument("--construct", action="append", default=[])
    p.add_argument("--filter", action="append", default=[], dest="filters",
                   help="'var op value' (gt/ge/lt/le/eq/ne/regex; digits compare numerically)")
    p.add_argument("--order-by", action="append", default=[], dest="order_by",
                   help="'col asc|desc' (repeatable; requires --limit)")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--sparql", default=None,
                   help="a full SPARQL query string (SELECT/ASK/CONSTRUCT/"
                        "DESCRIBE — operators/sparql_text.py); mutually "
                        "exclusive with every pattern/filter flag")
    args = p.parse_args()

    sparql_form = None
    if args.sparql:
        if (args.pattern or args.describe or args.optional or args.exists or
                args.not_exists or args.construct or args.filters or
                args.order_by or args.limit is not None):
            raise SystemExit(
                "--sparql carries the whole query; it takes no other "
                "query flags"
            )
        # parse (and so validate) BEFORE the SparkSession is built —
        # a malformed query fails fast with the parser's positioned error
        from jsonld_ex_spark.operators.sparql_text import parse_sparql

        try:
            sparql_form = parse_sparql(args.sparql)["form"]
        except ValueError as exc:
            raise SystemExit(f"--sparql: {exc}")
    elif not args.pattern and not args.describe:
        raise SystemExit("need --pattern (SELECT/CONSTRUCT), --describe or --sparql")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("jsonld-ex-spark:query_graph")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from jsonld_ex_spark.operators.bgp import (
        bgp_construct,
        bgp_describe,
        bgp_order_limit,
        bgp_select,
    )

    patterns = [parse_pattern(t) for t in args.pattern]
    optional = [[parse_pattern(t)] for t in args.optional]
    exists = [[parse_pattern(t)] for t in args.exists]
    not_exists = [[parse_pattern(t)] for t in args.not_exists]

    filters = [parse_filter(t) for t in args.filters] or None
    order_by = []
    for t in args.order_by:
        parts = t.split()
        if len(parts) != 2:
            raise SystemExit(f"order-by must be 'col asc|desc': {t!r}")
        order_by.append((parts[0], parts[1]))
    if order_by and args.limit is None:
        raise SystemExit("--order-by requires --limit")

    t0 = time.perf_counter()
    triples = spark.read.parquet(args.triples)
    if args.sparql:
        from jsonld_ex_spark.operators.sparql_text import sparql_query

        out = sparql_query(triples, args.sparql)
        if sparql_form == "construct":
            from jsonld_ex_spark.operators.triples import write_triples

            write_triples(out, args.output, mode="overwrite")
        else:
            out.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
        print(json.dumps({
            "job": "query_graph", "kind": f"sparql_{sparql_form}", "rows": n,
            "sec": round(time.perf_counter() - t0, 3),
        }))
        spark.stop()
        return
    if args.construct and (filters or order_by or exists or not_exists):
        raise SystemExit(
            "--filter/--order-by/--exists/--not-exists apply to SELECT "
            "queries, not --construct"
        )
    if args.describe:
        if args.construct or order_by:
            raise SystemExit("--describe is incompatible with --construct/--order-by")
        vars_ = [d for d in args.describe if d.startswith("?")]
        if vars_ and (len(args.describe) != 1 or not patterns):
            raise SystemExit(
                "--describe takes either root IRIs or exactly ONE ?var "
                "bound by --pattern"
            )
        if vars_:
            # bgp_describe dedupes the roots itself — no CLI-side
            # dropDuplicates (an adjacent Deduplicate pair costs an
            # extra shuffle Catalyst does not collapse)
            roots = bgp_select(
                triples, patterns, project=[vars_[0][1:]],
                optional=optional or None, filters=filters,
                exists=exists or None, not_exists=not_exists or None,
            )
            out = bgp_describe(triples, roots)
        else:
            if patterns or filters or optional or exists or not_exists:
                # the IRI form has nothing to apply them to — rejecting
                # beats silently writing a superset of what was asked
                raise SystemExit(
                    "--describe with root IRIs takes no --pattern/--filter/"
                    "--optional/--exists/--not-exists (use --describe '?var' "
                    "to describe pattern-bound nodes)"
                )
            iris = [d[1:-1] if d.startswith("<") and d.endswith(">") else d
                    for d in args.describe]
            out = bgp_describe(triples, iris)
        out.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
        kind = "description"
    elif args.construct:
        template = [parse_pattern(t) for t in args.construct]
        out = bgp_construct(triples, patterns, template, optional=optional or None)
        from jsonld_ex_spark.operators.triples import write_triples

        write_triples(out, args.output, mode="overwrite")
        n = spark.read.parquet(args.output).count()
        kind = "constructed_triples"
    else:
        out = bgp_select(
            triples, patterns, optional=optional or None, filters=filters,
            exists=exists or None, not_exists=not_exists or None,
        )
        if order_by:
            out = bgp_order_limit(out, order_by, args.limit)
        out.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
        kind = "bindings"
    print(
        json.dumps(
            {
                "job": "query_graph",
                "kind": kind,
                "rows": n,
                "patterns": len(patterns),
                "optional": len(optional),
                "construct": len(args.construct),
                "sec": round(time.perf_counter() - t0, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
