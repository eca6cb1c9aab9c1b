"""Entity-link scoring + cross-conversation co-occurrence.

north_star components: "batched mention detection and entity-link
scoring in Arrow/pandas UDFs" and the skew-aware cross-conversation
join patterns (SURVEY.md §2.2 joins).

Scoring is a vectorized Arrow pandas UDF over whole columns (numpy —
no per-row Python), deterministic so the DuckDB oracle reproduces it
exactly: integer-scaled features (mention position, turn length,
role prior) combined into a score in [0, 1000].

Co-occurrence is the classic hot-key self-join: entity mentions are
Zipf-skewed by construction, so the naive mentions⋈mentions on conv_id
is fine (conv_id is uniform) but the per-entity aggregate afterwards is
the skewed shuffle — handled by two-stage (salted partial, final)
aggregation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from jsonld_ex_spark.operators.kg_pipeline import MENTION_RE
from jsonld_ex_spark.sources.transcripts import entity_dict_df, transcripts_df

SCORE_SCALE = 1000


def _link_score(position: pd.Series, text_len: pd.Series, is_user: pd.Series) -> pd.Series:
    """Vectorized link-confidence score (deterministic, integer-exact).

    score = 1000 - 500·(position/text_len) rounded down, +100 if the
    mention appears in a user turn, capped at 1000.
    """
    base = 1000 - (500 * position) // text_len.clip(lower=1)
    boosted = base + 100 * is_user.astype("int64")
    return boosted.clip(upper=SCORE_SCALE).astype("int64")


def link_score_udf():
    # wrapped lazily: pandas_udf parses the return type against the
    # active session, which doesn't exist at import time
    return pandas_udf(_link_score, "long")


def mention_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positioned mention candidates: JVM regexp + position arithmetic.

    Per-row ``array_distinct`` replaces the post-explode
    ``dropDuplicates`` shuffle: (conv_id, turn_idx) is unique by
    construction and position/text_len/role are functions of the row +
    surface (instr finds the FIRST occurrence either way), so the
    emitted rows are identical with one fewer exchange (guide §2.4)."""
    t = transcripts_df(spark, sf_dir)
    return (
        t.select(
            "conv_id", "turn_idx", "role",
            F.length("text").alias("text_len"),
            F.explode(
                F.array_distinct(F.expr(f"regexp_extract_all(text, '{MENTION_RE}', 0)"))
            ).alias("surface_norm"),
            F.col("text"),
        )
        .withColumn("position", F.instr("text", F.col("surface_norm")) - F.lit(1))
        .drop("text")
    )


def kg_link_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mentions ⋈ broadcast dict, scored by the Arrow pandas UDF."""
    cands = mention_candidates(spark, sf_dir)
    dict_df = entity_dict_df(spark)
    score = link_score_udf()
    return (
        cands.join(F.broadcast(dict_df), on="surface_norm", how="inner")
        .select(
            "conv_id", "turn_idx", "entity_id", "canonical_iri",
            score(
                F.col("position"), F.col("text_len"),
                (F.col("role") == "user").cast("long"),
            ).alias("score"),
        )
    )


def kg_entity_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-conversation entity co-occurrence: pairs of entities
    mentioned in the same conversation, counted corpus-wide.

    Shuffle shape: self-join on conv_id (uniform key — safe), then the
    skewed pair-count aggregate runs as partial+final hash aggregation
    (Catalyst map-side combine defuses the hot pairs; AQE is the
    backstop at real scale)."""
    m = (
        transcripts_df(spark, sf_dir)
        .select(
            "conv_id",
            F.explode(F.expr(f"regexp_extract_all(text, '{MENTION_RE}', 0)")).alias("surface_norm"),
        )
        .dropDuplicates(["conv_id", "surface_norm"])
    )
    a, b = m.alias("a"), m.alias("b")
    return (
        a.join(b, on="conv_id")
        .where(F.col("a.surface_norm") < F.col("b.surface_norm"))
        .groupBy(F.col("a.surface_norm").alias("ent_a"), F.col("b.surface_norm").alias("ent_b"))
        .agg(F.count(F.lit(1)).alias("n_convs"))
        .where(F.col("n_convs") >= 2)
    )


def queries():
    return {
        "kg_link_scores": kg_link_scores,
        "kg_entity_cooccurrence": kg_entity_cooccurrence,
    }
