"""Stream-stream join (Structured Streaming's hardest operator).

Joining two UNBOUNDED streams means both sides must buffer state: a
signup arriving now can match a purchase arriving minutes later, and
vice versa. Three things make the state bounded — all three are
REQUIRED or the buffers grow forever and the job eventually OOMs:

1. a watermark on BOTH inputs (how late each side may arrive);
2. a time-RANGE condition in the join predicate (how far apart matched
   events may be) — Spark derives each side's state-eviction horizon
   from watermark + range, so an unconstrained equi-join on streams
   keeps every row forever;
3. append output mode — results emit once both watermarks pass the
   point where no further match is possible.

At scale this is the canonical two-sided shuffle on the equi key with
watermark-evicted per-key interval state; the batch twin of this exact
join is ``range_join_purchases_after_signup`` (same predicate, same
semantics), which is what the test compares against.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_SCHEMA = "event_id long, user_id long, ts timestamp"


def stream_join_purchases_after_signup(
    spark: SparkSession,
    signup_path: str,
    purchase_path: str,
    checkpoint_dir: str,
    window_seconds: int = 3600,
    lateness: str = "30 minutes",
    query_name: str = "ss_join_out",
    how: str = "inner",
) -> StreamingQuery:
    """Purchases within ``window_seconds`` after each signup, streamed
    from two file sources into a memory sink (append mode).

    ``how="left_outer"`` additionally emits unmatched signups with NULL
    purchase columns — but only once the PURCHASE-side watermark passes
    signup_ts + window (before that, a match could still arrive, so the
    row sits in state; this deferred-null emission is the part of outer
    stream joins that surprises everyone).
    """
    s = (
        spark.readStream.schema(_SCHEMA)
        .parquet(signup_path)
        .withWatermark("ts", lateness)
        .alias("s")
    )
    p = (
        spark.readStream.schema(_SCHEMA)
        .parquet(purchase_path)
        .withWatermark("ts", lateness)
        .alias("p")
    )
    joined = s.join(
        p,
        F.expr(
            f"""s.user_id = p.user_id
            AND p.ts > s.ts
            AND p.ts <= s.ts + INTERVAL {window_seconds} SECOND"""
        ),
        how,
    ).select(
        F.col("s.user_id").alias("user_id"),
        F.col("s.event_id").alias("signup_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("s.ts").alias("signup_ts"),
        F.col("p.ts").alias("purchase_ts"),
    )
    return (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
