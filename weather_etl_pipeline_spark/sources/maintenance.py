"""Lake maintenance: small-file compaction (OPTIMIZE-style).

The reference lands one parquet file per partition per run
(``bronze.py:12-17``) — after N incremental runs a partition holds N
small files and scan cost is dominated by per-file open/footer
overhead. ``compact_zone`` rewrites each partition's files into
``ceil(partition_bytes / target_file_bytes)`` files:

- file listing happens driver-side through the Hadoop FS API (cheap:
  metadata only);
- only partitions exceeding the file-count threshold are rewritten —
  repartition(n) within the partition's own data, written back via
  dynamic partition overwrite, so untouched partitions keep their
  files byte-for-byte;
- idempotent: re-running on a compacted zone is a no-op.

This is the hand-rolled form of Delta's OPTIMIZE; with Delta jars
present the call site swaps for ``OPTIMIZE ... WHERE partition``.
"""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .fs import _fs_and_path
from .parquet_io import scan_zone, write_partitions

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


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


def compact_zone(
    spark: SparkSession,
    zone_path: str,
    partition_cols: tuple[str, ...],
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    min_files_to_compact: int = 2,
) -> int:
    """Rewrite fragmented partitions; returns #partitions compacted."""
    stats = partition_file_stats(spark, zone_path)
    frag = {
        rel: st for rel, st in stats.items() if st[0] >= min_files_to_compact
    }
    if not frag:
        return 0
    zone = scan_zone(spark, zone_path)
    # rebuild each fragmented partition's predicate from its dir path
    # (rel like "city=Delhi/date=2026-02-13")
    for rel, (n_files, total_bytes) in frag.items():
        preds = None
        for piece in rel.split("/"):
            col, val = piece.split("=", 1)
            p = F.col(col) == val
            preds = p if preds is None else (preds & p)
        part_df = zone.filter(preds)
        n_target = max(1, math.ceil(total_bytes / target_file_bytes))
        write_partitions(
            part_df.repartition(n_target), zone_path, partition_cols
        )
    return len(frag)
