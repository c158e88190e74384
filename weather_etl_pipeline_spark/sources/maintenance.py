"""Lake maintenance: small-file compaction (OPTIMIZE-style).

The reference lands one parquet file per partition per run
(``bronze.py:12-17``) — after N incremental runs a partition holds N
small files and scan cost is dominated by per-file open/footer
overhead. ``compact_zone`` rewrites fragmented partitions down to
``ceil(partition_bytes / target_file_bytes)`` files each:

- file listing happens driver-side through the Hadoop FS API (cheap:
  metadata only);
- a partition is fragmented only when it holds MORE files than its own
  target — so re-running on a compacted zone is a true no-op, including
  for large partitions that legitimately need several files;
- all fragmented partitions are rewritten in ONE Spark job (semi-join
  against the fragmented-partition list, per-partition salt to hit each
  partition's target file count, one dynamic-partition-overwrite
  write) — the same single-job-over-the-work-list principle as
  plans/incremental.py; untouched partitions keep their files
  byte-for-byte;
- Hive-escaped directory values (%xx for ':', '=', '#', …) and the
  null partition sentinel are decoded back to real column values.

This is the hand-rolled form of Delta's OPTIMIZE; with Delta jars
present the call site swaps for ``OPTIMIZE ... WHERE partition``.
"""

from __future__ import annotations

import math
import urllib.parse
from collections import defaultdict
from functools import reduce

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .fs import _fs_and_path
from .parquet_io import scan_zone, write_partitions

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def partition_file_stats(
    spark: SparkSession, zone_path: str
) -> dict[str, tuple[int, int]]:
    """{relative partition dir: (n_files, total_bytes)} via Hadoop FS."""
    fs, root = _fs_and_path(spark, zone_path)
    stats: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    it = fs.listFiles(root, True)  # recursive
    root_str = fs.makeQualified(root).toString()
    while it.hasNext():
        f = it.next()
        p = f.getPath().toString()
        name = p.rsplit("/", 1)[-1]
        if not name.endswith(".parquet"):
            continue
        rel = p[len(root_str) :].lstrip("/").rsplit("/", 1)[0]
        stats[rel][0] += 1
        stats[rel][1] += int(f.getLen())
    return {k: (v[0], v[1]) for k, v in stats.items()}


def _partition_predicate(rel: str):
    """Directory name → column predicate, undoing Hive escaping."""
    preds = []
    for piece in rel.split("/"):
        col, raw = piece.split("=", 1)
        if raw == _HIVE_NULL:
            preds.append(F.col(col).isNull())
        else:
            preds.append(F.col(col) == urllib.parse.unquote(raw))
    return reduce(lambda a, b: a & b, preds)


def compact_zone(
    spark: SparkSession,
    zone_path: str,
    partition_cols: tuple[str, ...],
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
) -> int:
    """Rewrite fragmented partitions in one job; returns #compacted."""
    stats = partition_file_stats(spark, zone_path)
    targets = {
        rel: max(1, math.ceil(total / target_file_bytes))
        for rel, (_, total) in stats.items()
    }
    frag = {
        rel: targets[rel]
        for rel, (n_files, _) in stats.items()
        if n_files > targets[rel]
    }
    if not frag:
        return 0
    zone = scan_zone(spark, zone_path)
    frag_pred = reduce(
        lambda a, b: a | b, (_partition_predicate(rel) for rel in frag)
    )
    frag_rows = zone.filter(frag_pred)
    # per-partition salt in [0, n_target): one write hits every
    # partition's own target file count
    salt_expr = F.lit(1)
    for rel, n_target in frag.items():
        salt_expr = F.when(
            _partition_predicate(rel),
            F.pmod(F.xxhash64(*zone.columns), F.lit(n_target)),
        ).otherwise(salt_expr)
    total_tasks = sum(frag.values())
    compacted = (
        frag_rows.withColumn("_salt", salt_expr)
        .repartition(total_tasks, *partition_cols, "_salt")
        .drop("_salt")
    )
    write_partitions(compacted, zone_path, partition_cols)
    return len(frag)
