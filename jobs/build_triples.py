"""spark-submit entrypoint: transcript table → partitioned triple table.

Launch (north_star contract):

    scripts/make_pyfiles.sh                      # → dist/jsonld_ex_spark.zip
    spark-submit --py-files dist/jsonld_ex_spark.zip jobs/build_triples.py \
        --input  /root/testdata/sf0.01           # parquet dir OR iceberg table \
        --output /tmp/kg/triples \
        --ledger /tmp/kg/ledger \
        --run-id run-$(date +%s) \
        --buckets 64

Resumable: re-running with the same --ledger skips completed
conversation buckets (per-partition lineage, idempotent bucket writes)
and prints per-run triple-count metrics as one JSON line.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="testdata sf dir (synthesizes transcripts from lineitem), "
                        "parquet path of a transcript table, or iceberg table name")
    p.add_argument("--output", required=True)
    p.add_argument("--ledger", required=True)
    p.add_argument("--run-id", required=True)
    p.add_argument("--buckets", type=int, default=64)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("jsonld-ex-spark:build_triples")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from jsonld_ex_spark.operators.kg_pipeline import conversation_triples
    from jsonld_ex_spark.sources.transcripts import transcripts_df
    from jsonld_ex_spark.streaming.lineage import run_with_lineage

    import os

    if os.path.isdir(args.input) and os.path.exists(f"{args.input}/lineitem.parquet"):
        transcripts = transcripts_df(spark, args.input)
    elif "/" in args.input:
        transcripts = spark.read.parquet(args.input)
    else:
        transcripts = spark.read.table(args.input)

    metrics = run_with_lineage(
        transcripts, spark, conversation_triples,
        out_path=args.output, ledger_path=args.ledger,
        run_id=args.run_id, n_buckets=args.buckets,
    )
    print(json.dumps({"run_id": args.run_id, **{k: int(v) if v is not None else 0 for k, v in metrics.items() if k != "resumed"}, "resumed": bool(metrics["resumed"])}))
    spark.stop()


if __name__ == "__main__":
    main()
