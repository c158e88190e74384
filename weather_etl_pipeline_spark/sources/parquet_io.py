"""Partitioned parquet I/O (reference ops Q-scan / K-praw / K-part).

The reference's lake is three zones of Hive-partitioned parquet
(``city=<c>/date=<d>/*.parquet``) written per-partition with
``COPY ... (PARTITION_BY (city, date), OVERWRITE TRUE)``
(reference ``silver.py:50-54``, ``gold.py:86-90``) and scanned with
``read_parquet('zone/**', hive_partitioning=true)``
(reference ``silver.py:5``, ``gold.py:6``).

Spark-native equivalents:

- scan: ``spark.read.parquet(zone)`` — partition discovery, partition
  pruning, predicate pushdown and column pruning are all Catalyst
  built-ins (SURVEY.md §4);
- sink: ``partitionBy(...).mode("overwrite")`` with
  ``partitionOverwriteMode=dynamic`` — replaces ONLY the partitions
  present in the written DataFrame, which is exactly the reference's
  per-partition ``OVERWRITE TRUE`` semantics. Static mode would
  truncate the whole zone (the #1 semantic trap in SURVEY.md §4).

Scale: one job writes all new partitions (vs the reference's
sequential per-partition loop, ``silver.py:73``) — the write
parallelizes across executors and partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_PARTITION_COLS = ("city", "date")


def scan_zone(spark: SparkSession, zone_path: str) -> DataFrame:
    """Hive-partitioned scan with native partition-column inference."""
    return spark.read.parquet(zone_path)


def write_partitions(
    df: DataFrame,
    zone_path: str,
    partition_cols: tuple[str, ...] = DEFAULT_PARTITION_COLS,
) -> None:
    """Dynamic-overwrite partitioned write: replaces exactly the
    partitions present in ``df``, leaves siblings intact."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        df.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(zone_path)
    )


def append_partitions(
    df: DataFrame,
    zone_path: str,
    partition_cols: tuple[str, ...] = DEFAULT_PARTITION_COLS,
) -> None:
    """Append-mode landing write (bronze: reference bronze.py:12-17)."""
    df.write.mode("append").partitionBy(*partition_cols).parquet(zone_path)
