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


def compact_partitions(
    spark: SparkSession,
    zone_path: str,
    dest_path: str,
    partition_cols: tuple[str, ...] = DEFAULT_PARTITION_COLS,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: tuple[str, ...] = (),
) -> int:
    """Small-file compaction: rewrite each Hive partition into
    ~``target_file_bytes``-sized files at ``dest_path``. Returns the
    number of partitions compacted.

    The lakehouse maintenance job every streaming/incremental sink
    needs: micro-batch and per-ingest writes accumulate many small
    files per partition, and at scale the scan cost becomes
    file-open-bound (driver listing + one task per tiny file) instead
    of byte-bound. Compaction = read the zone, re-bin rows so each
    partition writes ceil(bytes/target) files, dynamic-overwrite in
    ONE job. The destination is a separate staging zone because Spark
    (correctly) refuses to overwrite a path it is reading — production
    swaps staging into place via the metadata/catalog pointer (or uses
    Delta OPTIMIZE, which does the same dance transactionally); an
    incremental variant pre-filters to recently-touched partitions
    from the metadata table, same plan.

    Two mechanisms, two jobs for one reason each:

    - **file size** — ``maxRecordsPerFile`` derived from each
      partition's observed bytes-per-row (file metadata columns, no
      driver-side listing; the global option takes the densest
      partition's value so no file overshoots the byte target). Task
      count alone can't control file size: AQE coalesces small
      shuffles into one task, and a task writes one arbitrarily-large
      file per Hive partition it holds.
    - **write parallelism** — rows shuffle on (partition cols, _bin)
      with ceil(bytes/target) bins per partition, so a huge partition's
      write fans out across executors instead of serializing in one
      task; each task's output still lands in coherent
      ~target-size files via the record cap.

    ``sort_cols`` additionally clusters rows across and inside the
    output files: ``repartitionByRange`` (Spark's sampled range
    partitioner — one sampling pass for balanced cut points) replaces
    the hash binning so each file covers a disjoint sort-key range, and
    ``sortWithinPartitions`` orders rows within it. Parquet min/max
    row-group stats on those columns become tight, so later point and
    range scans skip whole files and row groups instead of reading
    everything. This is the data-layout half of compaction — Delta
    OPTIMIZE ZORDER's simpler cousin; single-dimension clustering is
    the right call when one column dominates the filter workload.
    (Hash binning would interleave ranges across files and un-tighten
    every file's stats.)
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(zone_path)
    pcols = list(partition_cols)
    # per-partition on-disk bytes + row counts from the scan's file
    # metadata — distributed, no FileSystem calls on the driver
    fsizes = (
        df.select(*pcols, F.col("_metadata.file_path").alias("_fp"),
                  F.col("_metadata.file_size").alias("_fsz"))
        .dropDuplicates(["_fp"])
        .groupBy(*pcols)
        .agg(F.sum("_fsz").alias("_bytes"))
    )
    rows = df.groupBy(*pcols).agg(F.count(F.lit(1)).alias("_rows"))
    plan = (
        fsizes.join(rows, pcols)
        .withColumn(
            "_nbins",
            F.greatest(
                F.lit(1), F.ceil(F.col("_bytes") / F.lit(target_file_bytes))
            ).cast("int"),
        )
        .withColumn(
            "_max_rows",
            F.greatest(
                F.lit(1),
                F.floor(
                    F.lit(target_file_bytes) * F.col("_rows") / F.col("_bytes")
                ),
            ),
        )
        .select(*pcols, "_nbins", "_max_rows")
    )
    # the driver only needs two SCALARS from the plan — the partition
    # count and the global min rows-per-file — so collect one aggregate
    # row, never the per-partition list (a 100k-partition lake would
    # make that a fat driver array; the per-partition _nbins stays
    # distributed and reaches the binning via the broadcast join below)
    agg = plan.agg(
        F.count(F.lit(1)).alias("_n"), F.min("_max_rows").alias("_mr")
    ).collect()[0]
    n_parts = int(agg["_n"])
    if n_parts == 0:
        return 0
    max_records = int(agg["_mr"])
    if sort_cols:
        keys = pcols + list(sort_cols)
        binned = df.repartitionByRange(*keys).sortWithinPartitions(*keys)
    else:
        binned = (
            df.join(F.broadcast(plan.select(*pcols, "_nbins")), pcols)
            .withColumn(
                "_bin",
                F.pmod(
                    F.xxhash64(*[F.col(c) for c in df.columns]), F.col("_nbins")
                ),
            )
            .repartition(*(pcols + ["_bin"]))
            .drop("_nbins", "_bin")
        )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        binned.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records)
        .partitionBy(*pcols)
        .parquet(dest_path)
    )
    return n_parts
