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
    lease_ttl_s: float | None = 900.0,
    _fence=None,
) -> int:
    """Rewrite fragmented partitions in one job; returns #compacted.

    Holds the zone's single-writer lease by default (sources/lease.py)
    — a compactor racing another compactor (or any writer that takes
    the zone's lease) fails up front. Plain ingest writes do NOT take
    the lease — concurrent dynamic-partition-overwrite appends to
    DIFFERENT partitions are legitimate parallelism — so schedule
    compaction off the ingest path (as the maintenance cadence already
    does), or wrap the ingest writer in ``writer_lease`` explicitly
    when the same zone must interleave both. ``lease_ttl_s=None`` opts
    out (used by optimize_table, which already holds the lease)."""
    if lease_ttl_s is not None:
        from .lease import fence_for, writer_lease

        with writer_lease(
            spark, zone_path, owner="compact_zone", ttl_s=lease_ttl_s
        ) as token:
            return compact_zone(
                spark,
                zone_path,
                partition_cols,
                target_file_bytes,
                lease_ttl_s=None,
                _fence=fence_for(spark, zone_path, token),
            )
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
    if _fence is not None:
        # fence before the dynamic-overwrite rewrite: the rewrite
        # replaces each fragmented partition with the content READ
        # ABOVE — a compactor whose lease lapsed could otherwise erase
        # rows a successor appended to those partitions after the read
        # (missing rows, which no orphan scan detects). Mirrors the
        # store builds' pre-destructive-overwrite fence.
        _fence()
    write_partitions(compacted, zone_path, partition_cols)
    return len(frag)


def _tree_bytes(spark: SparkSession, path: str) -> int:
    """Total on-disk bytes under ``path`` (Hadoop FS metadata, no scan)."""
    fs, root = _fs_and_path(spark, path)
    total = 0
    it = fs.listFiles(root, True)
    while it.hasNext():
        total += int(it.next().getLen())
    return total


def optimize_table(
    spark: SparkSession,
    table_path: str,
    *,
    zorder_by: list[str] | None = None,
    partition_cols: tuple[str, ...] = (),
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    zorder_bits: int = 8,
    lease_ttl_s: float | None = 900.0,
    _fence=None,
) -> dict:
    """The ONE lake-maintenance entry point — the hand-rolled form of
    Delta's ``OPTIMIZE [table] [ZORDER BY (cols)]`` (with Delta jars
    present the call site swaps for that statement, same probe posture
    as sources/formats.py):

    - ``zorder_by=None``: small-file compaction of fragmented hive
      partitions (compact_zone — a no-op on an already-compacted zone).
    - ``zorder_by=[cols]``: clustered rewrite — compaction and
      multi-column clustering in ONE pass. The whole table is rewritten
      to ceil(bytes/target) files, range-partitioned and sorted on the
      interleaved z-value (zorder.zvalue_column), so parquet min/max
      footers prune scans on ANY clustered column; with
      ``partition_cols`` the range runs on (partitions…, z) and the
      hive layout is preserved, so partition pruning composes with the
      z-clustering inside each partition.

    The z-order rewrite swaps directories rather than overwriting in
    place (Spark cannot overwrite a path that feeds the running plan):
    the new layout is fully written to ``<path>.__optimize_tmp__``,
    then <path> → ``.__optimize_old__`` → deleted. Crash recovery is
    mechanical and loud, mirroring the metadata swap's refuse-don't-
    tear posture: a leftover tmp dir means the rewrite never committed
    (delete it and re-run); a missing live dir with an ``__optimize_
    old__`` present means the crash hit between the two renames
    (rename old back, re-run). Data is never deleted before the new
    layout is durable.

    Returns a small report dict (mode, files, bytes) for the caller's
    maintenance log.
    """
    from ..catalog import temp_col
    from .fs import delete, path_exists, rename
    from .lease import fence_for, writer_lease
    from .zorder import zvalue_column

    if lease_ttl_s is not None:
        # ONE lease across whichever mode runs; the inner compact_zone
        # call opts out (same resource — the lease is not reentrant)
        with writer_lease(
            spark, table_path, owner="optimize_table", ttl_s=lease_ttl_s
        ) as token:
            return optimize_table(
                spark,
                table_path,
                zorder_by=zorder_by,
                partition_cols=partition_cols,
                target_file_bytes=target_file_bytes,
                zorder_bits=zorder_bits,
                lease_ttl_s=None,
                _fence=fence_for(spark, table_path, token),
            )

    if not zorder_by:
        n = compact_zone(
            spark,
            table_path,
            tuple(partition_cols),
            target_file_bytes,
            lease_ttl_s=None,
            _fence=_fence,
        )
        return {"mode": "compact", "compacted_partitions": n}

    # leftover guard FIRST — before any read or the quantile sketch:
    # in the crash-between-renames state the live dir is MISSING, so a
    # later read would fail with a generic PATH_NOT_FOUND instead of
    # this curated recovery message, and in the tmp-leftover state the
    # re-run would burn a full table sketch before refusing
    base = table_path.rstrip("/")
    tmp, old = base + ".__optimize_tmp__", base + ".__optimize_old__"
    if path_exists(spark, tmp) or path_exists(spark, old):
        raise ValueError(
            f"previous optimize_table left {tmp} or {old} behind — a "
            "crashed rewrite needs manual recovery (see docstring) "
            "before another run"
        )
    total = _tree_bytes(spark, table_path)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = (
        scan_zone(spark, table_path)
        if partition_cols
        else spark.read.parquet(table_path)
    )
    zc = temp_col(df, "z")
    staged = df.withColumn(zc, zvalue_column(df, list(zorder_by), zorder_bits))
    range_cols = [F.col(c) for c in partition_cols] + [F.col(zc)]
    writer = (
        staged.repartitionByRange(n_files, *range_cols)
        .sortWithinPartitions(*partition_cols, zc)
        .drop(zc)
        .write.mode("overwrite")
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    # COPY top-level underscore sidecars (commit markers like the
    # curation lake's _batch_commits) into the new layout BEFORE the
    # swap: spark.read ignores _-prefixed entries, so the rewrite
    # itself never carries them, but replay/pruning contracts key on
    # them surviving every lake rewrite. Copying pre-publish (not
    # renaming post-publish) keeps the recovery states exactly the two
    # the docstring documents — a crash anywhere leaves EITHER the old
    # layout fully intact (sidecars included) or the new layout live
    # WITH its sidecars already inside; there is no committed-but-
    # sidecar-less window. _SUCCESS is skipped (the fresh write has
    # its own); copy failure aborts before anything was staged aside.
    from .fs import copy_tree, list_dir

    for name in list_dir(spark, table_path):
        if name.startswith("_") and name not in ("_SUCCESS", "_temporary"):
            copy_tree(spark, f"{table_path}/{name}", f"{tmp}/{name}")
    if _fence is not None:
        # fence immediately before the swap's first rename: the new
        # layout under tmp is a snapshot of the table AS READ — an
        # optimizer whose lease lapsed mid-rewrite must not replace
        # the live table (a successor may have appended rows after the
        # read; the checked rename cannot see that, only a moved path).
        # On abort, DELETE the just-written tmp first: the live layout
        # is untouched and tmp is this run's private garbage — leaving
        # it would trip the leftover guard above and brick every later
        # optimize with a spurious "crashed rewrite" refusal.
        from .lease import LeaseLostError

        try:
            _fence()
        except LeaseLostError:
            delete(spark, tmp)
            raise
    if not rename(spark, table_path, old):
        raise IOError(f"optimize_table: could not stage {table_path} aside")
    if not rename(spark, tmp, table_path):
        rename(spark, old, table_path)  # roll back to the intact layout
        raise IOError(f"optimize_table: could not commit {tmp}")
    delete(spark, old)
    return {
        "mode": "zorder",
        "zorder_by": list(zorder_by),
        "n_files": n_files,
        "bytes": total,
    }
