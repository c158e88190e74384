"""pipeline_metadata watermark table (reference ops D-ddl / U-upsert).

The reference keeps a DuckDB table ``pipeline_metadata(layer, city,
date, processed_at)`` with composite PK ``(layer, city, date)`` and
maintains it with ``INSERT OR REPLACE`` (reference ``metadata.py:1-10``,
``silver.py:57-60``, ``gold.py:92-95``).

Spark has no PK enforcement and this container has no Delta jars, so
the upsert is replicated as read → union → keep-latest-per-key →
atomic swap:

- keep-latest = ``row_number() over (partition by key order by
  processed_at desc)`` — deterministic replace-by-key;
- atomic swap = write to a temp dir then rename, so a crashed writer
  never leaves a half-written metadata table;
- the table is tiny (one row per (layer, city, date) partition —
  thousands at most), so the full rewrite is cheap at any scale; with
  Delta available this becomes ``MERGE INTO`` unchanged at the call
  sites.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schemas import METADATA_KEY, PIPELINE_METADATA


def read_metadata(spark: SparkSession, meta_path: str) -> DataFrame:
    if not os.path.exists(meta_path):
        return spark.createDataFrame([], PIPELINE_METADATA)
    return spark.read.parquet(meta_path)


def upsert_metadata(
    spark: SparkSession, meta_path: str, new_rows: DataFrame
) -> None:
    """INSERT OR REPLACE by (layer, city, date); latest processed_at wins."""
    current = read_metadata(spark, meta_path)
    merged = current.unionByName(new_rows.select(*PIPELINE_METADATA.fieldNames()))
    w = Window.partitionBy(*METADATA_KEY).orderBy(F.col("processed_at").desc())
    deduped = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    _atomic_overwrite(deduped, meta_path)


def mark_processed(
    spark: SparkSession, meta_path: str, layer: str, partitions: DataFrame
) -> None:
    """Record (layer, city, date) rows as processed now.

    ``partitions`` must have columns city (string), date (date).
    """
    rows = partitions.select(
        F.lit(layer).alias("layer"),
        F.col("city").cast("string").alias("city"),
        F.col("date").cast("date").alias("date"),
        F.current_timestamp().alias("processed_at"),
    )
    upsert_metadata(spark, meta_path, rows)


def processed_partitions(
    spark: SparkSession, meta_path: str, layer: str
) -> DataFrame:
    """(city, date) pairs already processed for a layer — reference
    silver.py:15-20."""
    return (
        read_metadata(spark, meta_path)
        .filter(F.col("layer") == layer)
        .select("city", "date")
    )


def _atomic_overwrite(df: DataFrame, path: str) -> None:
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)
