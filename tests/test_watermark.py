"""Watermark late-data semantics: an event older than the watermark
horizon arriving in a later micro-batch is dropped from an append-mode
windowed aggregation — the behavior the reference's batch re-runs have
no answer to (SURVEY.md §2.8)."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    df.coalesce(1).write.mode("append").parquet(path)


def test_watermark_drops_late_data(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    ck = str(tmp_path / "ck")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    # batch 1: two events in window [00:00, 01:00) and one far ahead at
    # 03:30 that will advance the watermark past the first window
    _write_batch(
        spark,
        src,
        [
            (1, base + dt.timedelta(minutes=10), 1.0),
            (2, base + dt.timedelta(minutes=20), 1.0),
            (3, base + dt.timedelta(hours=3, minutes=30), 1.0),
        ],
    )

    schema = "event_id long, ts timestamp, value double"
    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("start"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE event for the (now closed) first window, plus a
        # fresh event that keeps the query progressing
        _write_batch(
            spark,
            src,
            [
                (4, base + dt.timedelta(minutes=40), 1.0),  # late — must drop
                (5, base + dt.timedelta(hours=4, minutes=10), 1.0),
            ],
        )
        q.processAllAvailable()
        time.sleep(0.5)
        q.processAllAvailable()
    finally:
        q.stop()

    emitted = {
        r["start"]: r["n"] for r in spark.sql("SELECT * FROM late_out").collect()
    }
    # the first window must have been emitted with ONLY the two on-time
    # events; the late event_id=4 did not resurrect or grow it
    assert emitted.get(base) == 2, emitted


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: the streaming twin of exact dedup
    (dedup_exact_keep_first) for at-least-once ingestion. A duplicate
    key arriving in a later micro-batch inside the watermark horizon is
    dropped; state is evicted once the watermark passes, so memory is
    bounded — the 100 TB streaming-ingest posture."""
    src = str(tmp_path / "dedup_src")
    ck = str(tmp_path / "dedup_ck")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    _write_batch(
        spark,
        src,
        [
            (1, base + dt.timedelta(minutes=10), 1.0),
            (2, base + dt.timedelta(minutes=20), 2.0),
        ],
    )
    schema = "event_id long, ts timestamp, value double"
    stream = spark.readStream.schema(schema).parquet(src)
    dedup = stream.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a replayed duplicate of event 1 (same key, jittered
        # ts — the at-least-once redelivery shape) plus a fresh event
        _write_batch(
            spark,
            src,
            [
                (1, base + dt.timedelta(minutes=15), 99.0),  # dup — must drop
                (3, base + dt.timedelta(minutes=30), 3.0),
            ],
        )
        q.processAllAvailable()
        out = spark.sql(
            "SELECT event_id, value FROM dedup_out ORDER BY event_id"
        ).collect()
    finally:
        q.stop()
    by_id = {}
    for r in out:
        by_id.setdefault(r["event_id"], []).append(r["value"])
    assert sorted(by_id) == [1, 2, 3]
    assert all(len(v) == 1 for v in by_id.values()), by_id
    # first occurrence wins — the redelivered value never surfaces
    assert by_id[1] == [1.0]
