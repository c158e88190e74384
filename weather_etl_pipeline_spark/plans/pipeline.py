"""Weather medallion runners: bronze → silver → gold (reference main.py).

The reference's shipped orchestration (``main.py:27-40``): ingest →
bronze landing → silver incremental → gold full-refresh. Both layers
are instances of the generic incremental engine (plans/layers.py) with
the reference's transforms and validation gates:

- silver: clean/cast/rename projection + null filter (silver.py:26-60)
  with the empty-partition gate (silver.py:42-47);
- gold: per-partition aggregate (gold.py:69-95) with the
  empty-partition and null-average gates (gold.py:45-59);
- missing upstream zone → 0 partitions, no error (gold.py:26-28).

Layout mirrors the reference lake: ``<root>/data`` (bronze),
``<root>/silver``, ``<root>/gold``, plus ``<root>/pipeline_metadata``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import WEATHER_SILVER, assert_schema
from .layers import (
    Layer,
    ValidationError,
    require_all_partitions_nonempty,
    require_no_nulls,
    run_layer,
)

__all__ = [
    "LakePaths",
    "ValidationError",
    "aggregate_silver",
    "clean_bronze",
    "run_gold",
    "run_pipeline",
    "run_silver",
]


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


def clean_bronze(bronze: DataFrame) -> DataFrame:
    """The silver projection (reference silver.py:28-35): re-type and
    rename every column, parse the ISO-minute time string, drop rows
    with null temperature (silver.py:39)."""
    out = bronze.filter(F.col("temperature_2m").isNotNull()).select(
        F.to_timestamp("time", "yyyy-MM-dd'T'HH:mm").alias("timestamp"),
        F.col("temperature_2m").cast("double").alias("temperature"),
        F.col("wind_speed_10m").cast("double").alias("wind_speed"),
        F.col("wind_direction_10m").cast("int").alias("wind_direction"),
        F.col("weather_code").cast("int").alias("weather_code"),
        F.col("city").cast("string").alias("city"),
        F.col("date").cast("date").alias("date"),
    )
    assert_schema(out, WEATHER_SILVER, "silver projection")
    return out


def aggregate_silver(silver: DataFrame) -> DataFrame:
    """The gold aggregation (reference gold.py:70-81)."""
    return silver.groupBy("city", "date").agg(
        F.avg("temperature").alias("avg_temp"),
        F.max("temperature").alias("max_temp"),
        F.min("temperature").alias("min_temp"),
        F.count(F.lit(1)).alias("record_count"),
    )


def _silver_layer() -> Layer:
    layer = Layer(name="silver", transform=clean_bronze)
    layer.validations = (require_all_partitions_nonempty(layer),)
    return layer


def _gold_layer() -> Layer:
    layer = Layer(name="gold", transform=aggregate_silver)
    layer.validations = (
        require_all_partitions_nonempty(layer),
        require_no_nulls("avg_temp"),
    )
    return layer


def run_silver(spark: SparkSession, paths: LakePaths) -> int:
    """Incremental silver pass; returns #partitions processed."""
    return run_layer(
        spark, _silver_layer(), paths.bronze, paths.silver, paths.metadata
    )


def run_gold(
    spark: SparkSession, paths: LakePaths, full_refresh: bool = False
) -> int:
    """Gold pass; full_refresh recomputes every available partition
    (the reference's shipped mode, main.py:36)."""
    return run_layer(
        spark,
        _gold_layer(),
        paths.silver,
        paths.gold,
        paths.metadata,
        full_refresh=full_refresh,
    )


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
