"""Event-time windows (extension surface X-stream).

The reference approximates streaming with scheduled batch re-runs
(SURVEY.md §2.8 — no watermarks/windows exist there); the Spark-native
upgrade is Structured Streaming. Every window shape is implemented as a
BATCH plan over the static events table (so the DuckDB oracle can verify
the semantics) and the streaming variant is the same plan behind
``readStream`` + ``withWatermark`` (see ``stream_events`` below, tested
in pytest with the memory sink).

Window semantics notes (both engines must agree):
- tumbling/sliding windows are epoch-aligned: start = floor(epoch/slide)
  — the DuckDB twin uses the same epoch arithmetic;
- session windows: an event landing at exactly prev_ts + gap still
  MERGES into the session (Spark's session end is inclusive for the
  next event); a new session starts only when the silence is strictly
  longer than the gap. The oracle is the classic gaps-and-islands
  formulation with the same strict-> comparison (pinned by a
  hypothesis property test against a naive reference).

Scale: windowed aggregation shuffles on (window, key) — the state is
bounded by watermark horizon × key cardinality in streaming; in batch,
map-side partial aggregation applies as usual. Exact decimal sums keep
the cross-engine hash stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import davg, dsum, spark_dsum
from ..registry import register

# --- tumbling window ----------------------------------------------------------


@register(
    "stream_tumbling_hourly",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND((value) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
    headline=True,
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # string-twin expressions (round 14): identical parsed trees, fewer
    # py4j round trips — see functions/exact.py string-twin note
    return (
        ev.groupBy(F.expr("window(ts, '1 hour') AS w"), "event_type")
        .agg(
            F.expr("COUNT(1)").alias("n_events"),
            F.expr(spark_dsum("value")).alias("sum_value"),
        )
        .selectExpr(
            "w.start AS window_start", "event_type", "n_events", "sum_value"
        )
    )


# --- sliding window -----------------------------------------------------------
# 1 h width, 30 min slide → each event lands in 2 windows. The oracle
# replays the same assignment: window starts are the two 30-min grid
# points in (ts - 1h, ts].


@register(
    "stream_sliding_windows",
    oracle="""
SELECT make_timestamp(((CAST(floor(epoch(ts) / 1800) AS BIGINT) - k.k) * 1800) * 1000000) AS window_start,
       COUNT(*) AS n_events,
       FLOOR((CAST(SUM(CAST(ROUND((value) * 100, 0) AS BIGINT)) AS DOUBLE)
             / 100.0 / COUNT(value)) * 1000000.0 + 0.5) / 1000000.0 AS avg_value
FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS k) k
GROUP BY 1
""",
)
def stream_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            davg("value").alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
    )


# --- session window -----------------------------------------------------------

_GAP_MIN = 30

_SESSION_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         -- STRICT > : Spark's session_window merges an event landing at
         -- exactly prev_ts + gap (inclusive session end)
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL {_GAP_MIN} MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL {_GAP_MIN} MINUTE AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND((value) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM sessions
GROUP BY user_id, sess_id
"""


@register("stream_session_windows", oracle=_SESSION_ORACLE, headline=True)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.expr(f"session_window(ts, '{_GAP_MIN} minutes') AS w"),
            "user_id",
        )
        .agg(
            F.expr("COUNT(1)").alias("n_events"),
            F.expr(spark_dsum("value")).alias("sum_value"),
        )
        .selectExpr(
            "user_id",
            "w.start AS session_start",
            "w.end AS session_end",
            "n_events",
            "sum_value",
        )
    )


def _staged_events_stream(spark: SparkSession, sf_dir: str,
                          checkpoint_dir: str | None, prefix: str) -> DataFrame:
    """Shared readStream recipe: stage the events file, declare the raw
    nanos schema, convert to proper timestamps — single definition so
    every streaming operator reads time identically to the batch path."""
    import os

    from ..catalog import convert_nanos_cols, raw_nanos_schema
    from .staging import stage_events_dir

    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = raw_nanos_schema(spark, src)
    stage = stage_events_dir(src, checkpoint_dir, prefix)
    return convert_nanos_cols(
        spark.readStream.schema(raw_schema).parquet(stage), "events"
    )


# --- stream-stream interval join ---------------------------------------------


def stream_stream_purchases_after_signup(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
):
    """Watermarked stream-stream join: signups ⋈ purchases of the same
    user within the following hour — the streaming twin of the batch
    ``range_join_purchases_after_signup`` operator (state on both sides
    is bounded by the watermark + the join's time-range condition, which
    is what lets Spark evict: an unbounded-condition stream-stream join
    would keep state forever).

    Returns the StreamingQuery writing matches to the ``ss_join`` view.
    """
    ev = _staged_events_stream(spark, sf_dir, checkpoint_dir, "stream_ssjoin_")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("s_id"),
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("s_ts"),
        )
        .withWatermark("s_ts", "2 hours")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = signups.join(
        purchases,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    writer = (
        joined.writeStream.outputMode("append").format("memory").queryName("ss_join")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


# --- true streaming variant (pytest-driven; not oracle-checkable) ------------


def stream_events_windowed(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
):
    """readStream → watermark → tumbling agg → memory sink.

    Returns the StreamingQuery; caller runs processAllAvailable() and
    reads the ``stream_out`` view. Late data beyond 10 min of watermark
    is dropped — the semantics the reference's batch re-runs emulate.
    """
    stream = _staged_events_stream(spark, sf_dir, checkpoint_dir, "stream_events_")
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_out")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
