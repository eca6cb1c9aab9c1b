"""Input-partitioning helpers shared across operator families.

`spread_input` is the r7 single-split-input fix (optimization guide
§2.5: "one huge unsplittable file … repartition immediately after the
read"): the test corpus ships each table as ONE parquet file under the
128 MB split size, so every CPU-heavy per-row stage before the first
exchange runs single-threaded (measured: the sf0.1 shingle tokenize
stage alone was 7.8 s on one core).  The guard on the actual scan
partition count makes it a no-op on a properly-split production table
— no extra exchange at scale; the key is a deterministic column hash
(never rand() — SPARK-38388 row-loss under retries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_input(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition an UNDER-PARTITIONED input to the cluster's
    parallelism before a CPU-heavy per-row stage (tokenization, shingle
    explosion, vector math, per-document JSON-LD kernels).  Returns
    ``df`` untouched when the scan already has at least
    defaultParallelism partitions."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *[F.col(k) for k in keys])
