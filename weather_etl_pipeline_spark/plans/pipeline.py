"""Medallion layer runners: bronze → silver → gold (reference main.py).

The reference's shipped orchestration (``main.py:27-40``): ingest →
bronze landing → silver incremental → gold full-refresh. Each layer
here is one declarative Spark job over ALL pending partitions (not the
reference's sequential per-partition loop), with the reference's
validation gates preserved:

- empty-partition guard → ``ValidationError`` (reference silver.py:42-47);
- null-aggregate guard → ``ValidationError`` (reference gold.py:53-59);
- missing-input guard → empty work-list, no error (reference gold.py:26-28).

Layout mirrors the reference lake: ``<root>/data`` (bronze),
``<root>/silver``, ``<root>/gold``, plus ``<root>/pipeline_metadata``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import WEATHER_SILVER, assert_schema
from ..sources.parquet_io import scan_zone, write_partitions
from .incremental import (
    available_partitions,
    filter_to_partitions,
    pending_partitions,
)
from .metadata import mark_processed, processed_partitions


class ValidationError(ValueError):
    """A validation gate failed (reference raises ValueError)."""


@dataclass
class LakePaths:
    root: str

    @property
    def bronze(self) -> str:
        return os.path.join(self.root, "data")

    @property
    def silver(self) -> str:
        return os.path.join(self.root, "silver")

    @property
    def gold(self) -> str:
        return os.path.join(self.root, "gold")

    @property
    def metadata(self) -> str:
        return os.path.join(self.root, "pipeline_metadata")


def _zone_or_empty(spark: SparkSession, path: str) -> DataFrame | None:
    """Missing-input guard: reference gold.py:26-28 warns and returns an
    empty set when the upstream zone doesn't exist yet."""
    if not os.path.exists(path):
        return None
    return scan_zone(spark, path)


# --- silver: clean/cast/rename + null filter (reference silver.py:26-60) -----


def clean_bronze(bronze: DataFrame) -> DataFrame:
    """The silver projection (reference silver.py:28-35): re-type and
    rename every column, parse the ISO-minute time string, drop rows
    with null temperature (silver.py:39)."""
    return bronze.filter(F.col("temperature_2m").isNotNull()).select(
        F.to_timestamp("time", "yyyy-MM-dd'T'HH:mm").alias("timestamp"),
        F.col("temperature_2m").cast("double").alias("temperature"),
        F.col("wind_speed_10m").cast("double").alias("wind_speed"),
        F.col("wind_direction_10m").cast("int").alias("wind_direction"),
        F.col("weather_code").cast("int").alias("weather_code"),
        F.col("city").cast("string").alias("city"),
        F.col("date").cast("date").alias("date"),
    )


def run_silver(spark: SparkSession, paths: LakePaths) -> int:
    """Incremental silver pass; returns #partitions processed."""
    bronze = _zone_or_empty(spark, paths.bronze)
    if bronze is None:
        return 0
    todo = pending_partitions(
        available_partitions(bronze),
        processed_partitions(spark, paths.metadata, "silver"),
    )
    todo_rows = todo.collect()  # tiny: #cities × #dates
    if not todo_rows:
        return 0
    todo_df = spark.createDataFrame(todo_rows, todo.schema)

    cleaned = clean_bronze(filter_to_partitions(bronze, todo_df))
    assert_schema(cleaned, WEATHER_SILVER, "silver projection")
    # empty-partition guard (reference silver.py:42-47): every pending
    # partition must survive cleaning with ≥1 row. One aggregation
    # checks all partitions at once.
    produced = cleaned.groupBy("city", "date").count()
    missing = todo_df.join(produced, ["city", "date"], "left_anti").collect()
    if missing:
        bad = [(r["city"], str(r["date"])) for r in missing]
        raise ValidationError(f"no rows after cleaning for partitions: {bad}")

    write_partitions(cleaned, paths.silver)
    mark_processed(spark, paths.metadata, "silver", todo_df)
    return len(todo_rows)


# --- gold: per-partition aggregate (reference gold.py:69-95) -----------------


def aggregate_silver(silver: DataFrame) -> DataFrame:
    """The gold aggregation (reference gold.py:70-81)."""
    return silver.groupBy("city", "date").agg(
        F.avg("temperature").alias("avg_temp"),
        F.max("temperature").alias("max_temp"),
        F.min("temperature").alias("min_temp"),
        F.count(F.lit(1)).alias("record_count"),
    )


def run_gold(
    spark: SparkSession, paths: LakePaths, full_refresh: bool = False
) -> int:
    """Gold pass; full_refresh recomputes every available partition
    (the reference's shipped mode, main.py:36)."""
    silver = _zone_or_empty(spark, paths.silver)
    if silver is None:
        return 0
    avail = available_partitions(silver)
    if full_refresh:
        todo = avail
    else:
        todo = pending_partitions(
            avail, processed_partitions(spark, paths.metadata, "gold")
        )
    todo_rows = todo.collect()
    if not todo_rows:
        return 0
    todo_df = spark.createDataFrame(todo_rows, todo.schema)

    agg = aggregate_silver(filter_to_partitions(silver, todo_df))
    # validation gates (reference gold.py:45-59) in one cached pass
    agg = agg.cache()
    try:
        produced = agg.select("city", "date")
        missing = todo_df.join(produced, ["city", "date"], "left_anti").collect()
        if missing:
            bad = [(r["city"], str(r["date"])) for r in missing]
            raise ValidationError(f"no gold rows for partitions: {bad}")
        n_null = agg.filter(F.col("avg_temp").isNull()).count()
        if n_null:
            raise ValidationError(f"{n_null} gold rows with NULL avg_temp")
        write_partitions(agg, paths.gold)
    finally:
        agg.unpersist()
    mark_processed(spark, paths.metadata, "gold", todo_df)
    return len(todo_rows)


def run_pipeline(
    spark: SparkSession,
    paths: LakePaths,
    bronze_df: DataFrame | None = None,
    gold_full_refresh: bool = True,
) -> dict[str, int]:
    """Full run (reference main.py:27-40): optional bronze landing →
    silver incremental → gold (full-refresh by default, matching the
    reference's shipped orchestration)."""
    if bronze_df is not None:
        from ..sources.parquet_io import append_partitions

        append_partitions(bronze_df, paths.bronze)
    n_silver = run_silver(spark, paths)
    n_gold = run_gold(spark, paths, full_refresh=gold_full_refresh)
    return {"silver_partitions": n_silver, "gold_partitions": n_gold}
