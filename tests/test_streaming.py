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


def _write_events(spark, path: str, rows: list[tuple]) -> None:
    """rows: (event_id, ts_str, user_id, event_type, value)."""
    df = spark.createDataFrame(
        [(i, t, u, e, v, "{}") for i, t, u, e, v in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr("event_id", "cast(ts as timestamp) ts", "user_id", "event_type", "value", "props")
    df.coalesce(1).write.parquet(path)


def test_watermarked_window_late_data(spark):  # noqa: F811
    """Append-mode windowed agg with a 5-min watermark over three
    micro-batches (one file each; a sleep between writes keeps the file
    modification order = batch order):
    * batch0: two 'click's in window 10:00-10:10 + a 'view' at 10:29.
    * batch1 (watermark now 10:24): a 'view' at 10:26 — merges into the
      still-open 10:20-10:30 window ACROSS micro-batches; the click
      window (end 10:10 < watermark) finalizes and its state is evicted.
    * batch2 (watermark 10:25): a 'click' at 10:04 — LATE beyond the
      watermark with evicted state → DROPPED (Spark evicts state and
      applies the late filter one batch after the watermark passes, so
      the drop needs the eviction to have happened in a prior batch);
      a 'tick' at 10:41 advances the watermark so 10:20-10:30 flushes.
    Final sink: click window (2, 300) — late row not counted; view
    window (2, 800) — cross-batch merge."""
    import time
    import uuid

    tmp = tempfile.mkdtemp()
    name = f"wwin_{uuid.uuid4().hex[:8]}"
    try:
        from jsonld_ex_spark.streaming.stream_pipeline import stream_windowed_event_counts

        _write_events(spark, f"{tmp}/in/f1", [
            (1, "2024-01-01 10:00:30", 1, "click", 1.0),
            (2, "2024-01-01 10:02:00", 2, "click", 2.0),
            (3, "2024-01-01 10:29:00", 3, "view", 3.0),
        ])
        time.sleep(1.2)
        _write_events(spark, f"{tmp}/in/f2", [
            (5, "2024-01-01 10:26:00", 5, "view", 5.0),    # merges into 10:20-10:30
        ])
        time.sleep(1.2)
        _write_events(spark, f"{tmp}/in/f3", [
            (4, "2024-01-01 10:04:00", 4, "click", 4.0),   # late: < watermark, state evicted
            (6, "2024-01-01 10:41:00", 6, "tick", 6.0),    # advances watermark
        ])
        q = stream_windowed_event_counts(spark, f"{tmp}/in/*", f"{tmp}/ckpt", name)
        q.awaitTermination(300)
        got = {
            (r["window_start"].strftime("%H:%M"), r["event_type"]): (r["n_events"], r["total_value_c"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        assert got[("10:00", "click")] == (2, 300)  # late 10:04 row NOT counted
        assert got[("10:20", "view")] == (2, 800)   # 10:26 + 10:29 merged
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stateful_running_totals_across_microbatches(spark):  # noqa: F811
    """applyInPandasWithState keeps per-user state across micro-batches:
    user 7 appears in both files; the second emission must carry the
    cumulative totals, not restart from zero."""
    import uuid

    tmp = tempfile.mkdtemp()
    name = f"wtot_{uuid.uuid4().hex[:8]}"
    try:
        from jsonld_ex_spark.streaming.stream_pipeline import stream_user_running_totals

        _write_events(spark, f"{tmp}/in/f1", [
            (1, "2024-01-01 10:00:00", 7, "click", 1.25),
            (2, "2024-01-01 10:01:00", 7, "click", 2.00),
            (3, "2024-01-01 10:02:00", 8, "view", 10.00),
        ])
        import time

        time.sleep(1.2)  # file mtime order == micro-batch order
        _write_events(spark, f"{tmp}/in/f2", [
            (4, "2024-01-01 11:00:00", 7, "purchase", 0.75),
        ])
        q = stream_user_running_totals(spark, f"{tmp}/in/*", f"{tmp}/ckpt", name)
        q.awaitTermination(300)
        rows = spark.sql(f"SELECT * FROM {name} ORDER BY n_events").collect()
        by_user = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append((r["n_events"], r["total_value_c"]))
        assert by_user[8] == [(1, 1000)]
        assert by_user[7] == [(2, 325), (3, 400)]  # cumulative across batches
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stateful_state_survives_stream_restart(spark):  # noqa: F811
    """Stop the stream, add data, start a NEW query over the SAME
    checkpoint: per-user state must resume cumulatively (needs the
    parquet/foreachBatch sink — the memory sink refuses checkpoint
    recovery)."""
    import uuid

    tmp = tempfile.mkdtemp()
    name = f"wres_{uuid.uuid4().hex[:8]}"
    try:
        from jsonld_ex_spark.streaming.stream_pipeline import stream_user_running_totals

        _write_events(spark, f"{tmp}/in/f1", [
            (1, "2024-01-01 10:00:00", 7, "click", 1.25),
            (2, "2024-01-01 10:01:00", 7, "click", 2.00),
        ])
        q1 = stream_user_running_totals(spark, f"{tmp}/in/*", f"{tmp}/ckpt", name, output_dir=f"{tmp}/out")
        q1.awaitTermination(300)
        _write_events(spark, f"{tmp}/in/f2", [
            (3, "2024-01-01 11:00:00", 7, "purchase", 0.75),
        ])
        q2 = stream_user_running_totals(spark, f"{tmp}/in/*", f"{tmp}/ckpt", name, output_dir=f"{tmp}/out")
        q2.awaitTermination(300)
        rows = sorted(map(tuple, spark.read.parquet(f"{tmp}/out").collect()))
        assert rows == [(7, 2, 325), (7, 3, 400)]  # cumulative across restart
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_sessions_equal_batch_sessions(spark):  # noqa: F811
    """The streaming engine's finalized sessions must equal the batch
    gaps-and-islands sessions restricted to the watermark cutoff — the
    same session definition computed by two independent engines (the
    state store vs SQL window functions)."""
    from pyspark.sql import functions as F

    from jsonld_ex_spark.functions.relational_ops import user_sessions_batch
    from jsonld_ex_spark.streaming.stream_pipeline import stream_user_sessions

    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in stream_user_sessions(spark, SF).collect()
    }
    events = spark.read.parquet(f"{SF}/events.parquet")
    wm = events.agg(F.max("ts")).first()[0] - __import__("datetime").timedelta(minutes=30)
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in user_sessions_batch(spark, SF).collect()
        if r["session_end"] <= wm
    }
    assert streamed == batch and len(streamed) > 0


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
