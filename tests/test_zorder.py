"""Z-order layout rewrite: the data-skipping PRECONDITION, asserted
engine-independently from the written parquet footers.

A scan with a range filter can skip a file iff the filter range misses
the file's [min, max] for that column. We count candidate files (those
whose range intersects the filter) straight from pyarrow footer stats:
a z-ordered layout must prune on EVERY clustered column, while the
single-column-sorted control layout prunes only its own sort column.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from weather_etl_pipeline_spark.catalog import load_table
from weather_etl_pipeline_spark.sources.zorder import zorder_write

SF = "/root/testdata/sf0.01"
N_FILES = 8


def _candidate_files(path: str, col: str, lo: float, hi: float) -> int:
    """Files whose footer [min, max] for ``col`` intersects [lo, hi]."""
    n = 0
    for p in sorted(Path(path).glob("*.parquet")):
        md = pq.ParquetFile(p).metadata
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema != col or c.statistics is None:
                    continue
                s = c.statistics
                if s.min is not None:
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is None or (fmax >= lo and fmin <= hi):
            n += 1  # no stats = not skippable = candidate
    return n


def test_zorder_prunes_every_clustered_column(spark, tmp_path):
    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", "value", "event_type"
    ).filter(F.col("value").isNotNull())

    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    zorder_write(ev, ["user_id", "value"], zpath, n_files=N_FILES)
    # control: single-column sort on user_id, same file count
    (
        ev.repartitionByRange(N_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )

    # same rows either way
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(spath).count()
        == ev.count()
    )

    lo_u, hi_u = 10, 30  # narrow user_id band
    stats = ev.agg(
        F.expr("percentile(value, 0.45)").alias("lo"),
        F.expr("percentile(value, 0.55)").alias("hi"),
    ).collect()[0]
    lo_v, hi_v = float(stats["lo"]), float(stats["hi"])

    z_u = _candidate_files(zpath, "user_id", lo_u, hi_u)
    z_v = _candidate_files(zpath, "value", lo_v, hi_v)
    s_u = _candidate_files(spath, "user_id", lo_u, hi_u)
    s_v = _candidate_files(spath, "value", lo_v, hi_v)

    # the control prunes its own sort column hard but not the other
    assert s_u < N_FILES
    assert s_v == N_FILES, "control layout unexpectedly clustered on value"
    # z-order prunes BOTH dimensions strictly
    assert z_u < N_FILES, f"zorder did not prune user_id ({z_u}/{N_FILES})"
    assert z_v < N_FILES, f"zorder did not prune value ({z_v}/{N_FILES})"


def test_zorder_rejects_bit_overflow(spark):
    import pytest

    from weather_etl_pipeline_spark.sources.zorder import zvalue_column

    ev = load_table(spark, SF, "events")
    with pytest.raises(ValueError, match="int64"):
        zvalue_column(ev, ["user_id"] * 9, bits=8)


def test_zorder_plan_is_one_range_exchange(spark):
    """Scale contract: the z-value is pure projection (sketch happens
    driver-side before the plan exists) and the ONLY shuffle is the
    repartitionByRange on the z key — a second exchange or a UDF node
    appearing here would silently double the rewrite cost at lake
    scale."""
    from weather_etl_pipeline_spark.catalog import temp_col
    from weather_etl_pipeline_spark.sources.zorder import zvalue_column

    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    zc = temp_col(ev, "z")
    staged = (
        ev.withColumn(zc, zvalue_column(ev, ["user_id", "value"]))
        .repartitionByRange(8, zc)
        .sortWithinPartitions(zc)
        .drop(zc)
    )
    plan = staged._jdf.queryExecution().executedPlan().toString()
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 1 and "rangepartitioning" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_zorder_rejects_unsupported_dtype(spark):
    import pytest

    from weather_etl_pipeline_spark.sources.zorder import zvalue_column

    ev = load_table(spark, SF, "events")
    with pytest.raises(ValueError, match="numeric/timestamp/date"):
        zvalue_column(ev, ["event_type"])  # string column


def test_zorder_timestamp_column_clusters(spark, tmp_path):
    """Timestamps are first-class z-order dimensions (epoch-seconds
    rank); the written footers must carry tight ts ranges per file."""
    ev = load_table(spark, SF, "events").select("event_id", "ts", "user_id")
    path = str(tmp_path / "zt")
    zorder_write(ev, ["ts", "user_id"], path, n_files=N_FILES)
    assert spark.read.parquet(path).count() == ev.count()


def test_optimize_table_zorder_prunes_point_lookup_same_results(spark, tmp_path):
    """Round-9 maintenance promotion: optimize_table(zorder_by=...) on
    an ingest-ordered events lake must (a) leave query RESULTS
    byte-identical, (b) make a (user_id, value) point-lookup-shaped
    filter (the registered filter-query shape) a footer-prunable read
    on BOTH columns — strictly fewer candidate files than the ingest
    layout — and (c) clean up its swap dirs."""
    from weather_etl_pipeline_spark.sources.maintenance import optimize_table

    ev = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).filter(F.col("value").isNotNull())
    lake = str(tmp_path / "events_lake")
    # ingest order: time-sorted arrival, N small files — the layout a
    # streaming sink leaves behind
    (
        ev.repartitionByRange(N_FILES, "ts")
        .sortWithinPartitions("ts")
        .write.parquet(lake)
    )

    def lookup():
        # the filter_point_lookup shape on (user_id, value)
        df = spark.read.parquet(lake)
        return sorted(
            tuple(r)
            for r in df.filter(
                (F.col("user_id").between(10, 30))
                & (F.col("value") > 0)
            )
            .select("event_id", "user_id", "value")
            .collect()
        )

    before_rows = lookup()
    stats = ev.agg(
        F.expr("percentile(value, 0.45)").alias("lo"),
        F.expr("percentile(value, 0.55)").alias("hi"),
    ).collect()[0]
    lo_v, hi_v = float(stats["lo"]), float(stats["hi"])
    before_u = _candidate_files(lake, "user_id", 10, 30)
    before_v = _candidate_files(lake, "value", lo_v, hi_v)

    report = optimize_table(
        spark,
        lake,
        zorder_by=["user_id", "value"],
        target_file_bytes=max(1, _tree_bytes_of(lake) // N_FILES),
    )
    assert report["mode"] == "zorder"

    after_rows = lookup()
    assert after_rows == before_rows  # same results, new layout
    assert after_rows, "vacuous: the lookup matched nothing"
    after_u = _candidate_files(lake, "user_id", 10, 30)
    after_v = _candidate_files(lake, "value", lo_v, hi_v)
    # ingest (time) order clusters NEITHER column → ~all files are
    # candidates; the z-order must prune BOTH
    assert after_u < before_u, (before_u, after_u)
    assert after_v < before_v, (before_v, after_v)
    # swap hygiene: no tmp/old leftovers
    assert not Path(lake + ".__optimize_tmp__").exists()
    assert not Path(lake + ".__optimize_old__").exists()


def _tree_bytes_of(path: str) -> int:
    return sum(p.stat().st_size for p in Path(path).rglob("*.parquet"))


def test_optimize_table_refuses_crashed_rewrite_leftovers(spark, tmp_path):
    """Review fix (round 9): the leftover guard runs BEFORE any read or
    quantile sketch, so both crash states refuse with the curated
    recovery message — including the between-renames state where the
    live dir is MISSING (a later read would otherwise fail with a
    generic PATH_NOT_FOUND)."""
    import pytest

    from weather_etl_pipeline_spark.sources.maintenance import optimize_table

    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    lake = str(tmp_path / "lake")
    ev.coalesce(2).write.parquet(lake)

    # state 1: tmp leftover (crash after staging, before the swap)
    Path(lake + ".__optimize_tmp__").mkdir()
    with pytest.raises(ValueError, match="manual recovery"):
        optimize_table(spark, lake, zorder_by=["user_id", "value"])
    Path(lake + ".__optimize_tmp__").rmdir()

    # state 2: old leftover with the live dir missing (crash between
    # the two renames) — still the curated message, not PATH_NOT_FOUND
    import shutil

    shutil.move(lake, lake + ".__optimize_old__")
    with pytest.raises(ValueError, match="manual recovery"):
        optimize_table(spark, lake, zorder_by=["user_id", "value"])
    shutil.move(lake + ".__optimize_old__", lake)
    # recovered state optimizes fine
    report = optimize_table(spark, lake, zorder_by=["user_id", "value"])
    assert report["mode"] == "zorder"
