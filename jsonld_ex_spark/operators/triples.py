"""Triple-table sink: salted repartitioning, dedup, partitioned writes.

north_rule requirements covered here:
* salted repartitioning on subject hash — hot entities (Zipf mentions)
  concentrate a few subjects; a plain repartition("subj") puts all of a
  hot subject's triples in one task.  We salt with
  ``xxhash64(subj, salt_id)`` where salt_id = pmod(xxhash64(pred, obj),
  n_salts) so the hot subject's rows spread over n_salts tasks while
  staying deterministic (no rand(): retries produce identical layout).
* subject-hash bucket column for the sink layout — downstream
  subject-grouped reads prune by bucket (Iceberg/parquet partition
  column); AQE remains the runtime backstop for residual skew.
* exact dedup on the triple key (dropDuplicates — Catalyst partial/final
  hash aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLE_KEY = ["subj", "pred", "obj", "obj_dt", "obj_lang", "graph"]


def salted_repartition(triples: DataFrame, n_salts: int = 16, partitions: int | None = None) -> DataFrame:
    """Deterministically spread hot subjects across ``n_salts`` shuffle keys."""
    salt = F.pmod(F.xxhash64("pred", "obj"), F.lit(n_salts))
    key = F.xxhash64(F.col("subj"), salt)
    if partitions:
        return triples.repartition(partitions, key)
    return triples.repartition(key)


def with_subject_bucket(triples: DataFrame, n_buckets: int = 256) -> DataFrame:
    """Stable subject-hash bucket column for partitioned sink layout."""
    return triples.withColumn("subj_bucket", F.pmod(F.xxhash64("subj"), F.lit(n_buckets)))


def dedup_triples(triples: DataFrame) -> DataFrame:
    return triples.dropDuplicates(TRIPLE_KEY)


def write_triples(triples: DataFrame, path: str, n_buckets: int = 64, mode: str = "append") -> None:
    """Partitioned parquet sink (Iceberg writeTo(...).append() on a real
    cluster — the sandbox has no catalog, parquet keeps the same layout)."""
    (
        with_subject_bucket(salted_repartition(triples), n_buckets)
        .write.mode(mode)
        .partitionBy("subj_bucket")
        .parquet(path)
    )
