"""Approximate-nearest-neighbor search over the embeddings table.

Similarity is the quantized-integer dot product (round(x*1000) per
element) so scores are bit-exact across Spark and the DuckDB oracle.

* ann_topk_bruteforce — exact top-k per query via full pair scan +
  window rank (the correctness baseline).
* ann_lsh_topk — sign-LSH: 8 deterministic hyperplanes (the first 8
  vectors of the table itself), 8-bit bucket signature, top-k within
  the query's bucket only.  The bucket join is the scale path: at
  100 TB the pair scan is infeasible; bucketing turns it into a
  co-partitioned equi-join on the signature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

Q = 1000
TOP_K = 5
N_QUERIES = 10  # vec_id < N_QUERIES are the query vectors
N_PLANES = 8


def _qvecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return e.select(
        "vec_id",
        F.expr(f"transform(embedding, x -> cast(round(cast(x as double) * {Q}) as long))").alias("qv"),
    )


_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 as long), (acc, v) -> acc + v)"


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _qvecs(spark, sf_dir)
    queries = q.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    cand = q.select(F.col("vec_id").alias("cand_id"), F.col("qv").alias("c_qv"))
    scored = (
        F.broadcast(queries)
        .crossJoin(cand)
        .where(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.expr(_DOT.format(a="q_qv", b="c_qv")).alias("qdot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "qdot", "rank")
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed top-k: candidates restricted to the same 8-bit
    hyperplane-sign bucket as the query (deterministic planes)."""
    q = _qvecs(spark, sf_dir)
    planes = q.where(F.col("vec_id") < N_PLANES).select(
        F.col("vec_id").alias("plane_id"), F.col("qv").alias("p_qv")
    )
    signed = (
        q.crossJoin(F.broadcast(planes))
        .select(
            "vec_id", "qv", "plane_id",
            (F.expr(_DOT.format(a="qv", b="p_qv")) > 0).cast("int").alias("bit"),
        )
        .groupBy("vec_id", "qv")
        .agg(
            F.sum(F.col("bit") * F.pow(F.lit(2), F.col("plane_id")).cast("long")).alias("bucket")
        )
    )
    queries = signed.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv"), "bucket"
    )
    cand = signed.select(F.col("vec_id").alias("cand_id"), F.col("qv").alias("c_qv"), "bucket")
    scored = (
        queries.join(cand, on="bucket")
        .where(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id", "cand_id", "bucket",
            F.expr(_DOT.format(a="q_qv", b="c_qv")).alias("qdot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "bucket", "qdot", "rank")
    )


def queries():
    return {
        "ann_topk_bruteforce": ann_topk_bruteforce,
        "ann_lsh_topk": ann_lsh_topk,
    }


_QVECS_CTE = f"""
q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {Q}) AS BIGINT)) AS qv
  FROM embeddings
)
"""


def oracle_sql():
    return {
        "ann_topk_bruteforce": f"""
            WITH {_QVECS_CTE},
            scored AS (
              SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
                     CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS qdot
              FROM q a JOIN q b ON a.vec_id < {N_QUERIES} AND a.vec_id <> b.vec_id
            )
            SELECT query_id, cand_id, qdot, rank FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, cand_id ASC) AS rank
              FROM scored
            ) WHERE rank <= {TOP_K}""",
        "ann_lsh_topk": f"""
            WITH {_QVECS_CTE},
            planes AS (SELECT vec_id AS plane_id, qv AS p_qv FROM q WHERE vec_id < {N_PLANES}),
            signed AS (
              SELECT q.vec_id, q.qv,
                     CAST(sum(CASE WHEN list_dot_product(q.qv, planes.p_qv) > 0
                              THEN CAST(power(2, planes.plane_id) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
              FROM q CROSS JOIN planes
              GROUP BY q.vec_id, q.qv
            ),
            scored AS (
              SELECT a.vec_id AS query_id, b.vec_id AS cand_id, a.bucket,
                     CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS qdot
              FROM signed a JOIN signed b ON a.bucket = b.bucket
              WHERE a.vec_id < {N_QUERIES} AND a.vec_id <> b.vec_id
            )
            SELECT query_id, cand_id, bucket, qdot, rank FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, cand_id ASC) AS rank
              FROM scored
            ) WHERE rank <= {TOP_K}""",
    }
