"""Structured Streaming increment: availableNow drain with checkpointed
exactly-once across calls, and watermarked windowed aggregation."""

from pyspark.sql import functions as F

from delta_lake_spark.queries.relational import _events
from delta_lake_spark.streaming.incremental import (
    run_windowed_stream,
    stream_table_to_table,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _write_chunk(spark, events, path, lo, hi):
    events.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi)).write.mode(
        "append"
    ).parquet(path)


def test_incremental_stream_exactly_once(spark, tmp_path):
    events = _events(spark, SF_DIR).select(
        "event_id", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, user_id long, event_type string, value double"

    _write_chunk(spark, events, src, 0, 400)
    stream_table_to_table(spark, src, dst, ckpt, schema=schema)
    assert spark.read.parquet(dst).count() == 400

    # second drain sees ONLY the new files (checkpointed bookkeeping —
    # no status column, no MERGE-away, unlike the reference's hand-rolled
    # lifecycle)
    _write_chunk(spark, events, src, 400, 650)
    stream_table_to_table(spark, src, dst, ckpt, schema=schema)
    got = spark.read.parquet(dst)
    assert got.count() == 650
    assert got.select("event_id").distinct().count() == 650


def test_windowed_counts_match_batch(spark, tmp_path):
    events = _events(spark, SF_DIR)
    src = str(tmp_path / "wsrc")
    events.write.parquet(src)

    streamed = run_windowed_stream(
        spark,
        src,
        str(tmp_path / "wckpt"),
        schema="event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
        query_name="t_windowed",
    )
    batch = windowed_event_counts(events)
    s = {(r.window_start, r.event_type): r.n for r in streamed.collect()}
    b = {(r.window_start, r.event_type): r.n for r in batch.collect()}
    assert s == b and len(s) > 0
