"""spark-submit entrypoint: corpus curation over a documents table.

    scripts/make_pyfiles.sh
    spark-submit --py-files dist/jsonld_ex_spark.zip jobs/curate_corpus.py \
        --input  /root/testdata/sf0.01 \
        --output /tmp/corpus

Writes three datasets and prints ONE JSON metrics line:
  <output>/decisions/  per-document keep/drop + auditable reason
  <output>/clusters/   near-dup cluster assignment (connected components)
  <output>/kept/       the curated documents: reason = ok, canonical in
                       its near-dup cluster, and selected by the
                       deterministic stratified sampler
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="dir containing documents.parquet")
    p.add_argument("--output", required=True)
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("jsonld-ex-spark:curate_corpus")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from jsonld_ex_spark.functions.corpus_ops import corpus_filter, sample_stratified
    from jsonld_ex_spark.functions.dedup_ops import dedup_clusters

    decisions = corpus_filter(spark, args.input)
    clusters = dedup_clusters(spark, args.input)
    sampled = sample_stratified(spark, args.input)

    decisions.write.mode("overwrite").parquet(f"{args.output}/decisions")
    clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")

    docs = spark.read.parquet(f"{args.input}/documents.parquet")
    kept = (
        docs.join(spark.read.parquet(f"{args.output}/decisions"), "doc_id")
        .join(spark.read.parquet(f"{args.output}/clusters"), "doc_id")
        .join(sampled.select("doc_id", "sampled"), "doc_id")
        .where(F.col("keep") & F.col("is_canonical") & F.col("sampled"))
        .drop("reason", "keep", "cluster_id", "is_canonical", "sampled")
    )
    kept.write.mode("overwrite").parquet(f"{args.output}/kept")

    n_docs = docs.count()
    n_kept = spark.read.parquet(f"{args.output}/kept").count()
    reasons = {
        r["reason"]: r["n"]
        for r in spark.read.parquet(f"{args.output}/decisions")
        .groupBy("reason").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(json.dumps({"n_docs": n_docs, "n_kept": n_kept, "drop_reasons": reasons}))
    spark.stop()


if __name__ == "__main__":
    main()
