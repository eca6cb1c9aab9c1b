"""The pipeline over a REAL transcript table (parquet with the
input_hint schema) — the 10^12-turn production path, where the
synthesis stage is replaced by a plain scan — must produce exactly the
same triples as the synthesized path."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from jsonld_ex_spark.operators.kg_pipeline import conversation_triples
from jsonld_ex_spark.sources.transcripts import transcripts_df

from tests.spark_fixtures import spark  # noqa: F401

pytestmark = pytest.mark.spark
SF = "/root/testdata/sf0.001"


def test_pipeline_on_materialized_transcript_table(spark):  # noqa: F811
    tmp = tempfile.mkdtemp()
    try:
        transcripts_df(spark, SF).write.parquet(f"{tmp}/transcripts")
        real_table = spark.read.parquet(f"{tmp}/transcripts")
        assert [f.name for f in real_table.schema.fields] == [
            "conv_id", "turn_idx", "role", "text", "tool", "ts",
        ]
        a = sorted(map(tuple, conversation_triples(real_table).collect()))
        b = sorted(map(tuple, conversation_triples(transcripts_df(spark, SF)).collect()))
        assert a == b
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
