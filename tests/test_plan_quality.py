"""Physical-plan quality gates (100 TB readiness).

Asserts the plans we designed for are the plans Catalyst actually picks:
filter/column pushdown into the parquet scan, broadcast hash join for
the entity dictionary, exactly ONE wide shuffle feeding the Python
stage, and no Python UDFs anywhere except the single fused mapInPandas.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonld_ex_spark.operators import kg_queries
from jsonld_ex_spark.operators.kg_pipeline import kg_triples
from jsonld_ex_spark.sources.transcripts import transcripts_df

from tests.spark_fixtures import spark  # noqa: F401

pytestmark = pytest.mark.spark
SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):  # noqa: F811
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .where(F.col("l_shipdate") <= "1998-01-01")
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: scan reads only the referenced columns
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema


def test_entity_links_uses_broadcast_hash_join(spark):  # noqa: F811
    plan = _plan(kg_queries.kg_entity_links(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pipeline_has_single_wide_shuffle_before_python(spark):  # noqa: F811
    plan = _plan(kg_triples(spark, SF))
    # exactly one hashpartitioning exchange on conv_id feeds the python
    # stage (the window in transcript synthesis partitions by l_orderkey)
    exchanges = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(exchanges) <= 2, plan  # window(l_orderkey) + groupBy(conv_id)
    conv_exchanges = [l for l in exchanges if "conv_id" in l]
    assert len(conv_exchanges) == 1, exchanges
    # partial aggregation happens map-side before that shuffle
    assert plan.count("HashAggregate") >= 2 or "ObjectHashAggregate" in plan
    # one python stage, Arrow-based
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python anywhere


def test_transcript_synthesis_is_pure_catalyst(spark):  # noqa: F811
    plan = _plan(transcripts_df(spark, SF))
    assert "Python" not in plan and "MapInPandas" not in plan
    assert "Window" in plan


def test_text_ops_stay_jvm_side(spark):  # noqa: F811
    from jsonld_ex_spark.functions import text_ops

    for name, fn in text_ops.queries().items():
        plan = _plan(fn(spark, SF))
        assert "Python" not in plan, f"{name} fell off the JVM path"


def test_lsh_and_ivf_plans_are_jvm_only_no_cartesian(spark):  # noqa: F811
    """The similarity operators must stay entirely JVM-side (zero Python
    stages — the round-1 numpy GEMM is gone) and never degenerate into a
    CartesianProduct: the plane/centroid side is a broadcast, the
    candidate join is a bucket/cell equi-join."""
    from jsonld_ex_spark.functions.ann_ops import ann_ivf_topk, ann_lsh_topk
    from jsonld_ex_spark.functions.dedup_ops import dedup_embedding_cosine

    for fn in (dedup_embedding_cosine, ann_lsh_topk, ann_ivf_topk):
        plan = _plan(fn(spark, SF))
        assert "BatchEvalPython" not in plan, fn.__name__
        assert "MapInPandas" not in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, fn.__name__


def test_jsonld_doc_triples_is_shuffle_free(spark):  # noqa: F811
    """The generic doc→triples operator is a pure map: scan → JSON build
    (JVM) → one MapInPandas.  No shuffle may appear — partitioning of
    the input corpus is preserved end-to-end."""
    from jsonld_ex_spark.operators.jsonld_ops import jsonld_doc_triples

    plan = _plan(jsonld_doc_triples(spark, SF))
    assert plan.count("MapInPandas") == 1
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan
