"""Checkpoint-resume with per-partition lineage + triple-count metrics.

north_star: "checkpoint-resumable with per-partition lineage and
triple-count metrics".  Design (SURVEY.md §4.5): batch-first over
snapshots — no Spark streaming state store.

* Work is partitioned into conversation buckets:
  ``bucket = pmod(xxhash64(conv_id), n_buckets)`` — deterministic, so a
  re-run maps every conversation to the same bucket.
* The lineage ledger is a small table ``(bucket, n_convs, n_triples,
  run_id)`` appended once per completed bucket batch.  On resume, the
  driver reads the ledger, anti-joins completed buckets, and processes
  only the remainder; already-written buckets are untouched
  (idempotent: triple output is partitioned by the same bucket and
  written with spark.sql.sources.partitionOverwriteMode=dynamic +
  mode('overwrite'), so re-processing a bucket that crashed between
  the triple write and the ledger append REPLACES its partition
  atomically instead of appending duplicates).
* Triple-count metrics come from a read-back of ONLY this run's
  partitions (static IN filter on the partition column → partition
  pruning), never a scan of the historical output.

At 10^12-turn scale the ledger stays tiny (n_buckets rows per run) and
lives next to the Iceberg table; snapshot ids take the place of run_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEDGER_SCHEMA = "bucket INT, n_convs LONG, n_triples LONG, run_id STRING"


def bucket_of(conv_col: str = "conv_id", n_buckets: int = 64):
    return F.pmod(F.xxhash64(conv_col), F.lit(n_buckets)).cast("int")


def completed_buckets(spark: SparkSession, ledger_path: str) -> DataFrame:
    try:
        return spark.read.parquet(ledger_path).select("bucket").distinct()
    except Exception:  # noqa: BLE001 — first run: no ledger yet
        return spark.createDataFrame([], "bucket INT")


def remaining_transcripts(
    transcripts: DataFrame, spark: SparkSession, ledger_path: str, n_buckets: int = 64
) -> DataFrame:
    """Filter the input to conversations in not-yet-completed buckets
    (broadcast anti-join against the tiny ledger)."""
    done = completed_buckets(spark, ledger_path)
    t = transcripts.withColumn("_bucket", bucket_of("conv_id", n_buckets))
    return (
        t.join(F.broadcast(done), t["_bucket"] == done["bucket"], "left_anti")
        .drop("_bucket")
    )


def write_bucketed(triples: DataFrame, out_path: str, spark: SparkSession) -> None:
    """Write triples partitioned by ``_bucket`` with DYNAMIC partition
    overwrite: only the partitions present in ``triples`` are replaced,
    everything else is untouched.  This is what makes a mid-run crash
    recoverable without duplicates — a bucket that was written but never
    ledgered is simply re-processed on resume and its partition is
    replaced atomically (job-level commit), not appended to."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        triples.write.mode("overwrite").partitionBy("_bucket").parquet(out_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def run_with_lineage(
    transcripts: DataFrame,
    spark: SparkSession,
    triples_fn,
    out_path: str,
    ledger_path: str,
    run_id: str,
    n_buckets: int = 64,
) -> dict:
    """Execute the pipeline over the remaining buckets, write triples
    partitioned by bucket (dynamic partition overwrite — see
    write_bucketed), append per-bucket lineage rows, return metrics.
    """
    todo = remaining_transcripts(transcripts, spark, ledger_path, n_buckets)
    if todo.isEmpty():
        return {"buckets_processed": 0, "n_triples": 0, "resumed": True}

    triples = triples_fn(todo).withColumn("_bucket", bucket_of("conv_id", n_buckets))
    write_bucketed(triples, out_path, spark)

    # Per-bucket stats: read back ONLY this run's partitions (static IN
    # filter on the partition column → partition pruning at the scan;
    # the ledger is ≤ n_buckets rows, so collecting its bucket ids is a
    # tiny driver-side list, not a table materialization).  Counting the
    # durably-written files — never the whole historical output — keeps
    # resume O(this run) at 10^12-turn scale and counts exactly what a
    # reader will see, including a re-written previously-partial bucket.
    done_ids = [r["bucket"] for r in completed_buckets(spark, ledger_path).collect()]
    written = spark.read.parquet(out_path).withColumnRenamed("_bucket", "bucket")
    if done_ids:
        written = written.where(~F.col("bucket").isin(done_ids))
    new_stats = (
        written.groupBy("bucket")
        .agg(
            F.countDistinct("conv_id").alias("n_convs"),
            F.count(F.lit(1)).alias("n_triples"),
        )
        .withColumn("run_id", F.lit(run_id))
    )
    new_stats.write.mode("append").parquet(ledger_path)
    agg = new_stats.agg(F.count(F.lit(1)), F.sum("n_triples")).collect()[0]
    return {"buckets_processed": agg[0], "n_triples": agg[1] or 0, "resumed": False}
