"""Streaming pipeline: availableNow run over a transcript directory must
produce exactly the batch pipeline's triples (incl. skolem ids)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from jsonld_ex_spark.operators.kg_pipeline import conversation_triples
from jsonld_ex_spark.sources.transcripts import transcripts_df
from jsonld_ex_spark.streaming.stream_pipeline import stream_triples

from tests.spark_fixtures import spark  # noqa: F401

pytestmark = pytest.mark.spark
SF = "/root/testdata/sf0.001"


def test_stream_equals_batch(spark):  # noqa: F811
    tmp = tempfile.mkdtemp()
    try:
        t = transcripts_df(spark, SF)
        # conversation-complete files: partition by conv hash into several files
        t.repartition(4, "conv_id").write.parquet(f"{tmp}/in")

        q = stream_triples(spark, f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt")
        q.awaitTermination(300)

        streamed = sorted(map(tuple, spark.read.parquet(f"{tmp}/out").collect()))
        batch = sorted(map(tuple, conversation_triples(t).collect()))
        assert streamed == batch
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
