"""spark-submit entrypoint: SHACL-lite data-quality gate for a
persisted triple table — run after build_triples, before downstream
consumers, and fail the pipeline when violations appear.

    scripts/make_pyfiles.sh
    spark-submit --py-files dist/jsonld_ex_spark.zip jobs/validate_graph.py \
        --triples /data/triple_table \
        [--shapes /path/to/shapes.json] \
        [--fail-on-violation]

Default shapes: the conversation-graph rules from
operators/kg_queries._kg_shapes (cardinality / datatype / node-kind /
value-set).  --shapes takes a JSON list of shape dicts with the same
fields.  Prints ONE JSON metrics line; exit code 1 with
--fail-on-violation when any rule has violations.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--triples", required=True)
    p.add_argument("--shapes", default=None)
    p.add_argument("--fail-on-violation", action="store_true")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("jsonld-ex-spark:validate_graph")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from jsonld_ex_spark.operators.shapes import validate_shapes

    if args.shapes:
        with open(args.shapes) as f:
            shapes = json.load(f)
        for s in shapes:  # JSON arrays -> the tuple the value_in rule expects
            if s.get("rule") == "value_in":
                s["values"] = tuple(s["values"])
    else:
        from jsonld_ex_spark.operators.kg_queries import _kg_shapes

        shapes = _kg_shapes()

    t0 = time.perf_counter()
    report = validate_shapes(spark.read.parquet(args.triples), shapes).collect()
    rows = [
        {"rule_id": r["rule_id"], "n_checked": r["n_checked"],
         "n_violations": r["n_violations"]}
        for r in report
    ]
    total_bad = sum(r["n_violations"] for r in rows)
    print(
        json.dumps(
            {
                "job": "validate_graph",
                "rules": rows,
                "total_violations": total_bad,
                "sec": round(time.perf_counter() - t0, 3),
            }
        )
    )
    spark.stop()
    if args.fail_on_violation and total_bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
