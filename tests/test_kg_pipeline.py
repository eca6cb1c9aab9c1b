"""End-to-end KG pipeline correctness vs the DuckDB relational oracle.

This is the repo-local mirror of the driver's gate: every kg_* query is
compared row-for-row (order-insensitive) against pure-SQL oracles at
sf0.001.  kg_triples is the load-bearing one: it validates transcript
synthesis + doc assembly + expand + flatten + toRdf + skolemization in
one shot.
"""

from __future__ import annotations

import pytest

from jsonld_ex_spark.operators import kg_queries
from jsonld_ex_spark.operators.kg_pipeline import kg_triples
from jsonld_ex_spark.plans import oracles

from tests.spark_fixtures import compare_with_oracle, spark  # noqa: F401

pytestmark = pytest.mark.spark


def test_transcripts_match_oracle(spark):  # noqa: F811
    compare_with_oracle(kg_queries.kg_transcripts(spark, "/root/testdata/sf0.001"),
                        oracles.transcripts_oracle())


def test_mentions_match_oracle(spark):  # noqa: F811
    compare_with_oracle(kg_queries.kg_mentions(spark, "/root/testdata/sf0.001"),
                        oracles.kg_mentions_oracle())


def test_entity_links_match_oracle(spark):  # noqa: F811
    compare_with_oracle(kg_queries.kg_entity_links(spark, "/root/testdata/sf0.001"),
                        oracles.kg_entity_links_oracle())


def test_triples_match_oracle(spark):  # noqa: F811
    compare_with_oracle(kg_triples(spark, "/root/testdata/sf0.001"),
                        oracles.kg_triples_oracle())


def test_triple_stats_match_oracle(spark):  # noqa: F811
    compare_with_oracle(kg_queries.kg_triple_stats(spark, "/root/testdata/sf0.001"),
                        oracles.kg_triple_stats_oracle())


def test_turn_order_invariant(spark):  # noqa: F811
    df = kg_queries.kg_turn_order(spark, "/root/testdata/sf0.001")
    bad = df.where("expected_idx <> turn_idx").count()
    assert bad == 0
    compare_with_oracle(df, oracles.kg_turn_order_oracle())


def test_skolem_ids_stable_across_runs(spark):  # noqa: F811
    """north_star: deterministic skolemization — two independent runs
    produce the identical triple set (incl. blank-node labels)."""
    a = sorted(map(tuple, kg_triples(spark, "/root/testdata/sf0.001").collect()))
    b = sorted(map(tuple, kg_triples(spark, "/root/testdata/sf0.001").collect()))
    assert a == b


def test_triple_stats_persisted_equals_recomputed(spark, tmp_path):  # noqa: F811
    """Production form: write_triples → kg_triple_stats_from_table must
    equal the self-contained gate form exactly (the persisted table is
    the real downstream input; the gate recomputes only because gated
    queries must be self-contained)."""
    from jsonld_ex_spark.operators.triples import write_triples

    sf = "/root/testdata/sf0.001"
    path = str(tmp_path / "triples")
    write_triples(kg_triples(spark, sf), path, mode="overwrite")
    persisted = sorted(
        map(tuple, kg_queries.kg_triple_stats_from_table(spark, path).collect())
    )
    recomputed = sorted(map(tuple, kg_queries.kg_triple_stats(spark, sf).collect()))
    assert persisted == recomputed
    # and the persisted plan is scan→agg: no Python stage, column-pruned
    plan = kg_queries.kg_triple_stats_from_table(spark, path)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "Python" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "obj" not in read_schema  # only (pred, subj) read


def test_graph_fingerprints_detect_duplicate_conversations(spark):  # noqa: F811
    """Two conversations with IDENTICAL turn content but different
    conv_ids must fingerprint identically (graph-level dedup catches
    them); changing one character must change the fingerprint."""
    from datetime import datetime

    from jsonld_ex_spark.operators.kg_pipeline import conversation_triples
    from jsonld_ex_spark.operators.kg_queries import graph_fingerprints

    def turns(conv_id, text1):
        return [
            (conv_id, 0, "user", text1, None, datetime(2024, 1, 1, 0, 0, 0)),
            (conv_id, 1, "assistant", "reply with ENT_0042", "search", datetime(2024, 1, 1, 0, 1, 0)),
        ]

    rows = turns("convA", "hello world") + turns("convB", "hello world") + turns("convC", "hello mars")
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    fp = {r["conv_id"]: r for r in graph_fingerprints(conversation_triples(df)).collect()}
    assert fp["convA"]["graph_md5"] == fp["convB"]["graph_md5"]
    assert fp["convC"]["graph_md5"] != fp["convA"]["graph_md5"]
    assert fp["convA"]["group_size"] == 2 and fp["convC"]["group_size"] == 1
    assert fp["convB"]["canonical_conv_id"] == "convA"


def test_entity_dict_is_bijective(spark):  # noqa: F811
    """Guards the r7 kg_entity_links aggregate-before-join rewrite: it
    is only equivalent to the old aggregate-after-join form while the
    entity dictionary maps surfaces and entities 1:1 in BOTH directions
    (per-surface groups == per-entity groups; countDistinct(conv) is
    not mergeable across alias surfaces).  If aliases are ever added,
    this fails loudly instead of the query silently changing shape."""
    from pyspark.sql import functions as F

    from jsonld_ex_spark.sources.transcripts import entity_dict_df

    d = entity_dict_df(spark)
    n = d.count()
    assert d.select("surface_norm").distinct().count() == n
    assert d.select("entity_id", "canonical_iri").distinct().count() == n
