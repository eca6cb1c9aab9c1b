"""Key-skew diagnostics.

The north rule's named hazard is hot-entity skew: a handful of entity
keys carrying a disproportionate share of 10^12 mention rows decides
whether shuffles finish.  Before choosing a mitigation (salting,
AQE skew-join, broadcast), a pipeline needs to MEASURE skew — this
operator profiles the heavy hitters of any key column with one
partial-aggregated groupBy plus a single-row broadcast join (no
driver-side collect, no window over the full table).

All outputs are integers (ppm share, not float fractions) so the
profile is engine-portable and hash-exact under the driver gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, key_col: str, top_n: int = 20) -> DataFrame:
    """Top-``top_n`` heavy hitters of ``key_col``: (key, n, ppm, rank).

    ``ppm`` is the key's share of all rows in parts-per-million
    (integer floor — both engines truncate identically for
    non-negative operands); ``rank`` breaks count ties on the key so
    output is deterministic.  The total-row count joins back as a
    broadcast single row, and the rank window runs over at most the
    aggregated key domain — at 10^12 input rows the only full-data
    work is the map-side-combined count."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("_total"))
    ranked = (
        counts.join(F.broadcast(total))
        .withColumn("ppm", F.expr("(n * 1000000) div _total"))
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("n"), F.asc("key"))),
        )
        .filter(F.col("rank") <= top_n)
        .select("key", "n", "ppm", "rank")
    )
    return ranked


def skew_entity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: heavy-hitter profile of mention surface forms — the
    synthesized corpus plants 7 hot entities (sources/transcripts.py
    HOT_ENTITIES), and the profile surfaces exactly that skew."""
    from jsonld_ex_spark.operators.kg_queries import kg_mentions

    return key_skew_profile(kg_mentions(spark, sf_dir), "surface_norm", top_n=20)


def _skew_oracle() -> str:
    from jsonld_ex_spark.plans.oracles import kg_mentions_oracle

    return f"""
WITH m AS ({kg_mentions_oracle()}),
counts AS (SELECT surface_norm AS key, count(*) AS n FROM m GROUP BY surface_norm),
tot AS (SELECT sum(n) AS _total FROM counts),
ranked AS (
  SELECT key, CAST(n AS BIGINT) AS n,
         CAST((n * 1000000) // _total AS BIGINT) AS ppm,
         row_number() OVER (ORDER BY n DESC, key ASC) AS rank
  FROM counts CROSS JOIN tot
)
SELECT key, n, ppm, rank FROM ranked WHERE rank <= 20"""


def queries():
    return {"skew_entity_profile": skew_entity_profile}


def oracle_sql():
    return {"skew_entity_profile": _skew_oracle()}
