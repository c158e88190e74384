"""Structured Streaming smoke: the true streaming variant of the
windowed aggregation (readStream → watermark → memory sink), driven to
completion synchronously per the batch-equivalence contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from weather_etl_pipeline_spark.streaming.windows import (
    stream_events_windowed,
    stream_tumbling_hourly,
)


def test_streaming_matches_batch_counts(spark, tmp_path):
    q = stream_events_windowed(spark, SF_SMOKE, checkpoint_dir=str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.sql(
        "SELECT window.start AS window_start, event_type, n_events FROM stream_out"
    )
    batch = stream_tumbling_hourly(spark, SF_SMOKE).select(
        "window_start", "event_type", "n_events"
    )
    # append mode only emits windows the watermark has closed; every
    # emitted window must match the batch result exactly, and most
    # windows must have been emitted (only the tail stays open)
    s = {(r["window_start"], r["event_type"]): r["n_events"] for r in streamed.collect()}
    b = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch.collect()}
    assert s, "streaming emitted nothing"
    assert all(b[k] == v for k, v in s.items())
    assert len(s) >= len(b) * 0.8
