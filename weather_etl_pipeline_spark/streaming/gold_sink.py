"""Streaming → lakehouse gold sink via ``foreachBatch`` upsert.

The production pattern the reference's scheduled batch re-runs
approximate (SURVEY.md §2.8): a watermarked streaming aggregation whose
update-mode micro-batches are MERGED into a Hive-partitioned parquet
gold zone. Plain parquet has no MERGE, so the upsert is:

1. restrict to the partitions the micro-batch touches;
2. read the current gold rows of those partitions, anti-join away the
   keys being updated, union the fresh aggregates;
3. rewrite ONLY the touched partitions (dynamic partition overwrite —
   the same conf that backs the batch pipeline's per-partition
   ``COPY ... OVERWRITE`` semantics).

Cost per micro-batch is proportional to the touched partitions, never
the whole zone — at 100 TB with hourly partitions an update touches
the trailing watermark window's hours only. With a transactional table
format (Delta/Iceberg) steps 2-3 collapse into ``MERGE INTO``; the
hook (`upsert_partitions`) is the single place to swap that in.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_partitions(
    spark: SparkSession,
    gold_dir: str,
    updates: DataFrame,
    keys: list[str],
    part_col: str,
) -> None:
    """Key-level upsert of ``updates`` into a parquet zone partitioned by
    ``part_col``: touched partitions are rewritten as (existing rows
    whose key is not updated) ∪ (updates)."""
    if not updates.columns:
        return
    touched = [r[0] for r in updates.select(part_col).distinct().collect()]
    if not touched:
        return
    merged = updates
    if os.path.isdir(gold_dir) and any(
        e.startswith(f"{part_col}=") for e in os.listdir(gold_dir)
    ):
        existing = spark.read.parquet(gold_dir).filter(
            F.col(part_col).isin(touched)
        )
        kept = existing.join(
            updates.select(*keys).distinct(), on=keys, how="left_anti"
        )
        merged = kept.select(*updates.columns).unionByName(updates)
    (
        merged.write.mode("overwrite")
        .partitionBy(part_col)
        .parquet(gold_dir)
    )


def stream_gold_hourly(
    events: DataFrame, spark: SparkSession, gold_dir: str, checkpoint_dir: str
):
    """Watermarked hourly per-user rollup streamed into the gold zone.

    ``events`` is any streaming DataFrame with (user_id, ts, value).
    Update output mode: each micro-batch carries only the (user, hour)
    aggregates that changed; foreachBatch merges them into the lake.
    Returns the started StreamingQuery.
    """
    agg = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "value_cents"
            ),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd-HH").alias("hour_part"),
            F.col("w.start").alias("hour_start"),
            "user_id",
            "n_events",
            "value_cents",
        )
    )

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        upsert_partitions(
            spark,
            gold_dir,
            batch_df,
            keys=["hour_part", "user_id"],
            part_col="hour_part",
        )

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
