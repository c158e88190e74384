"""Crash/concurrency consistency of the metadata atomic swap.

The reference keeps its watermark table in DuckDB with a composite PK
and INSERT OR REPLACE (reference metadata.py:3-8) — the engine gives it
atomicity for free.  Without Delta jars, our parquet swap must provide
the same two guarantees by construction (plans/metadata.py::
_atomic_overwrite):

1. **Never a torn table.** A writer killed at ANY point between the
   temp write and the final rename leaves the previous table readable
   and complete — the swap publishes by rename, never by in-place
   mutation.
2. **One row per key, or a loud error.** Two interleaved upserts either
   both land (second merges over first) or one fails with IOError from
   a checked rename — but the published table is always well-formed
   with one row per (layer, *key).  (A lost update — B read before A
   published — is the documented non-transactional limitation; what is
   ruled out is silent corruption.)
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from weather_etl_pipeline_spark.plans import metadata as M


def _rows(spark, city: str, day: str, ts: str):
    return spark.createDataFrame(
        [("silver", city, day, ts)],
        "layer string, city string, date string, processed_at string",
    ).select(
        "layer",
        "city",
        F.col("date").cast("date").alias("date"),
        F.col("processed_at").cast("timestamp").alias("processed_at"),
    )


def _assert_well_formed(spark, path, expect_keys=None):
    meta = M.read_metadata(spark, path)
    assert meta is not None, "metadata table unreadable after failure"
    got = meta.groupBy("layer", "city", "date").count().collect()
    assert all(r["count"] == 1 for r in got), "duplicate key published"
    if expect_keys is not None:
        keys = {(r.layer, r.city, str(r.date)) for r in got}
        assert keys == expect_keys
    return meta


def test_crash_before_publish_leaves_previous_table(spark, tmp_path, monkeypatch):
    """Kill the writer between temp-write and rename: old table intact."""
    path = str(tmp_path / "meta")
    M.upsert_metadata(spark, path, _rows(spark, "rome", "2026-01-01", "2026-01-01 10:00:00"))

    real_rename = M.rename
    calls = {"n": 0}

    def dying_rename(s, src, dst):
        calls["n"] += 1
        raise RuntimeError("simulated kill mid-swap")

    monkeypatch.setattr(M, "rename", dying_rename)
    with pytest.raises(RuntimeError, match="simulated kill"):
        M.upsert_metadata(
            spark, path, _rows(spark, "oslo", "2026-01-02", "2026-01-02 10:00:00")
        )
    monkeypatch.setattr(M, "rename", real_rename)

    meta = _assert_well_formed(
        spark, path, {("silver", "rome", "2026-01-01")}
    )
    assert meta.count() == 1
    # leftover __tmp_* junk must not break the next upsert
    M.upsert_metadata(
        spark, path, _rows(spark, "oslo", "2026-01-02", "2026-01-02 10:00:00")
    )
    _assert_well_formed(
        spark,
        path,
        {("silver", "rome", "2026-01-01"), ("silver", "oslo", "2026-01-02")},
    )


def test_publish_rename_failure_rolls_back(spark, tmp_path, monkeypatch):
    """Second rename (tmp -> path) returns False: old table restored."""
    path = str(tmp_path / "meta")
    M.upsert_metadata(spark, path, _rows(spark, "rome", "2026-01-01", "2026-01-01 10:00:00"))

    real_rename = M.rename

    def failing_publish(s, src, dst):
        if "__tmp_" in src:  # the publish step
            return False
        return real_rename(s, src, dst)

    monkeypatch.setattr(M, "rename", failing_publish)
    with pytest.raises(IOError, match="could not publish"):
        M.upsert_metadata(
            spark, path, _rows(spark, "oslo", "2026-01-02", "2026-01-02 10:00:00")
        )
    monkeypatch.setattr(M, "rename", real_rename)
    meta = _assert_well_formed(spark, path, {("silver", "rome", "2026-01-01")})
    assert meta.count() == 1


def test_overlapping_writer_fenced_out_by_lease(spark, tmp_path):
    """Default mode (single-writer lease ON): a second upsert that
    overlaps a live one fails UP FRONT with LeaseHeldError — the
    prevention upgrade over the legacy detect-at-swap IOError — and
    proceeds cleanly once the first writer releases."""
    from weather_etl_pipeline_spark.sources.lease import (
        LeaseHeldError,
        acquire_lease,
        release_lease,
    )

    path = str(tmp_path / "meta")
    M.upsert_metadata(spark, path, _rows(spark, "base", "2026-01-01", "2026-01-01 09:00:00"))

    # writer A mid-upsert (holds the lease); writer B must not touch
    token = acquire_lease(spark, path, owner="writer-A", ttl_s=60)
    with pytest.raises(LeaseHeldError):
        M.upsert_metadata(
            spark, path, _rows(spark, "oslo", "2026-01-02", "2026-01-02 10:00:00")
        )
    # fenced-out writer changed NOTHING
    _assert_well_formed(spark, path, {("silver", "base", "2026-01-01")})
    release_lease(spark, path, token)
    M.upsert_metadata(
        spark, path, _rows(spark, "oslo", "2026-01-02", "2026-01-02 10:00:00")
    )
    _assert_well_formed(
        spark,
        path,
        {("silver", "base", "2026-01-01"), ("silver", "oslo", "2026-01-02")},
    )


def test_interleaved_writers_never_tear(spark, tmp_path, monkeypatch):
    """Two genuinely overlapping upserts in LEGACY mode (lease opted
    out): both land or one errors loudly, and the published table is
    always well-formed — the detection guarantee that remains the
    backstop on filesystems where the lease is best-effort.

    A barrier inside rename() forces both writers into the swap window
    at once — the adversarial schedule, not a lucky one.
    """
    path = str(tmp_path / "meta")
    M.upsert_metadata(spark, path, _rows(spark, "base", "2026-01-01", "2026-01-01 09:00:00"))

    real_rename = M.rename
    gate = threading.Barrier(2, timeout=60)
    in_swap = threading.local()

    def barrier_rename(s, src, dst):
        # first rename each writer performs: wait until BOTH are here
        if not getattr(in_swap, "seen", False):
            in_swap.seen = True
            try:
                gate.wait()
            except threading.BrokenBarrierError:
                pass  # partner already failed — proceed alone
        return real_rename(s, src, dst)

    monkeypatch.setattr(M, "rename", barrier_rename)

    errs: list[Exception] = []

    def writer(city: str, day: str):
        try:
            M.upsert_metadata(
                spark,
                path,
                _rows(spark, city, day, f"{day} 10:00:00"),
                lease_ttl_s=None,  # legacy detect-only mode under test
            )
        except Exception as e:  # noqa: BLE001 — collected and asserted below
            errs.append(e)
            gate.abort()

    t1 = threading.Thread(target=writer, args=("rome", "2026-01-02"))
    t2 = threading.Thread(target=writer, args=("oslo", "2026-01-03"))
    t1.start(), t2.start()
    t1.join(120), t2.join(120)
    monkeypatch.setattr(M, "rename", real_rename)

    # invariant: every raised error is the checked-rename IOError (loud,
    # diagnosable), never silent corruption
    assert all(isinstance(e, IOError) for e in errs), errs
    meta = _assert_well_formed(spark, path)
    keys = {(r.city,) for r in meta.select("city").collect()}
    # the pre-existing base row must never be lost: every writer's merge
    # includes it and a failed swap rolls back to the table that had it
    assert ("base",) in keys
    assert len(errs) <= 1
