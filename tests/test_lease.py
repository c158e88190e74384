"""Single-writer lease (sources/lease.py) — the prevention half of
the swap-family concurrency story (the detection half lives in
test_metadata_crash_consistency / test_curation_chaos).

Covers both implementations: the O_EXCL local path every real run in
this container takes, and the Hadoop create-if-absent path (forced
via _impl="hadoop" on file: URIs) a cluster deployment takes. The
thread-contention tests are the ones that killed the first
(sideline-rename) design of this module: a breaker holding a stale
read could rename away a lease a faster breaker had just re-created
(ABA). The generation design arbitrates only via atomic creates of
never-reused names, so those tests must show exactly one winner.
"""

from __future__ import annotations

import json
import os
import threading
import time

import pytest

from weather_etl_pipeline_spark.sources.lease import (
    LeaseHeldError,
    acquire_lease,
    lease_path_for,
    release_lease,
    writer_lease,
)

IMPLS = ["auto", "hadoop"]


def _resource(tmp_path, impl):
    # hadoop impl gets an explicit file: URI so the FS resolution is
    # exercised the way a cluster path would be
    p = str(tmp_path / "store")
    return f"file://{p}" if impl == "hadoop" else p


@pytest.mark.parametrize("impl", IMPLS)
def test_acquire_excludes_second_writer(spark, tmp_path, impl):
    res = _resource(tmp_path, impl)
    token = acquire_lease(spark, res, owner="w1", ttl_s=60, _impl=impl)
    with pytest.raises(LeaseHeldError) as ei:
        acquire_lease(spark, res, owner="w2", ttl_s=60, _impl=impl)
    assert "w1" in str(ei.value)
    assert release_lease(spark, res, token, _impl=impl) is True
    # released → a new writer acquires cleanly
    t2 = acquire_lease(spark, res, owner="w2", ttl_s=60, _impl=impl)
    assert release_lease(spark, res, t2, _impl=impl) is True


@pytest.mark.parametrize("impl", IMPLS)
def test_expired_lease_is_broken(spark, tmp_path, impl):
    res = _resource(tmp_path, impl)
    acquire_lease(spark, res, owner="dead", ttl_s=0.05, _impl=impl)
    time.sleep(0.1)  # intentionally never released — simulated crash
    t2 = acquire_lease(spark, res, owner="next", ttl_s=60, _impl=impl)
    assert release_lease(spark, res, t2, _impl=impl) is True


def test_torn_lease_file_is_breakable(spark, tmp_path):
    # a present-but-empty lease proves the create crashed before the
    # payload write — the would-be holder never proceeded, so it must
    # not fence out the next writer for a full TTL
    res = str(tmp_path / "store")
    open(lease_path_for(res, 7), "wb").close()
    token = acquire_lease(spark, res, ttl_s=60)
    gen, my_uuid = token.split(":", 1)
    assert int(gen) == 8  # supersedes, never reuses, the torn gen
    payload = json.loads(open(lease_path_for(res, 8), "rb").read())
    assert payload["token"] == my_uuid
    release_lease(spark, res, token)


def test_release_wrong_token_is_noop(spark, tmp_path):
    res = str(tmp_path / "store")
    token = acquire_lease(spark, res, owner="w1", ttl_s=60)
    gen = token.split(":", 1)[0]
    assert release_lease(spark, res, f"{gen}:not-the-uuid") is False
    assert release_lease(spark, res, "garbage-token") is False
    # lease intact: second writer still fenced out
    with pytest.raises(LeaseHeldError):
        acquire_lease(spark, res, ttl_s=60)
    assert release_lease(spark, res, token) is True


def test_overstaying_holder_must_not_release(spark, tmp_path):
    # the hold guarantee ends at expires: a holder that outlived its
    # TTL may be racing a successor's takeover and must touch nothing
    res = str(tmp_path / "store")
    t1 = acquire_lease(spark, res, owner="slow", ttl_s=0.05)
    time.sleep(0.1)
    assert release_lease(spark, res, t1) is False
    # the stale file is still swept by the next acquirer's break path
    t2 = acquire_lease(spark, res, owner="next", ttl_s=60)
    assert release_lease(spark, res, t2) is True


def test_stale_holder_release_cannot_evict_new_holder(spark, tmp_path):
    # crash → TTL expiry → superseded by w2 → the ORIGINAL holder's
    # deferred release must not delete w2's live lease
    res = str(tmp_path / "store")
    t1 = acquire_lease(spark, res, owner="w1", ttl_s=0.05)
    time.sleep(0.1)
    t2 = acquire_lease(spark, res, owner="w2", ttl_s=60)
    assert release_lease(spark, res, t1) is False
    with pytest.raises(LeaseHeldError):  # w2 still holds
        acquire_lease(spark, res, ttl_s=60)
    assert release_lease(spark, res, t2) is True


def _race(spark, res, n=16):
    results: list[str | None] = [None] * n
    barrier = threading.Barrier(n)

    def worker(i: int) -> None:
        barrier.wait()
        try:
            results[i] = acquire_lease(spark, res, owner=f"t{i}", ttl_s=60)
        except LeaseHeldError:
            results[i] = None

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return [r for r in results if r is not None]


def test_thread_contention_exactly_one_winner(spark, tmp_path):
    res = str(tmp_path / "store")
    winners = _race(spark, res)
    assert len(winners) == 1
    assert release_lease(spark, res, winners[0]) is True


def test_break_contention_exactly_one_winner(spark, tmp_path):
    # N threads all find the SAME expired lease: generation
    # arbitration (atomic create of gen max+1) admits exactly one
    res = str(tmp_path / "store")
    acquire_lease(spark, res, owner="dead", ttl_s=0.05)
    time.sleep(0.1)
    winners = _race(spark, res)
    assert len(winners) == 1
    release_lease(spark, res, winners[0])


def test_thread_contention_hadoop_impl_one_winner(spark, tmp_path):
    # the cluster-path arbitration (write-temp → exists-check → rename
    # → payload read-back) under a genuine thread race; fewer threads
    # than the local race — each contender is several JVM round-trips
    res = f"file://{tmp_path}/store"
    results: list[str | None] = [None] * 8
    barrier = threading.Barrier(8)

    def worker(i: int) -> None:
        barrier.wait()
        try:
            results[i] = acquire_lease(
                spark, res, owner=f"t{i}", ttl_s=60, _impl="hadoop"
            )
        except LeaseHeldError:
            results[i] = None

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [r for r in results if r is not None]
    assert len(winners) == 1
    assert release_lease(spark, res, winners[0], _impl="hadoop") is True


def test_repeated_break_contention_never_two_winners(spark, tmp_path):
    # hammer the ABA shape that broke the sideline design: rounds of
    # (expire → 16-way break race), asserting one winner per round
    res = str(tmp_path / "store")
    for _ in range(5):
        acquire_lease(spark, res, owner="dead", ttl_s=0.05)
        time.sleep(0.1)
        winners = _race(spark, res)
        assert len(winners) == 1
        release_lease(spark, res, winners[0])


@pytest.mark.parametrize("impl", IMPLS)
def test_context_manager_releases_on_exception(spark, tmp_path, impl):
    res = _resource(tmp_path, impl)
    with pytest.raises(RuntimeError, match="mid-write"):
        with writer_lease(spark, res, ttl_s=60, _impl=impl):
            raise RuntimeError("mid-write failure")
    # released on the exception path → immediately re-acquirable
    with writer_lease(spark, res, ttl_s=60, _impl=impl):
        pass


def test_superseded_generations_are_swept(spark, tmp_path):
    res = str(tmp_path / "store")
    acquire_lease(spark, res, owner="dead", ttl_s=0.05)
    time.sleep(0.1)
    token = acquire_lease(spark, res, owner="next", ttl_s=60)
    gen = int(token.split(":", 1)[0])
    assert gen == 2
    import os

    names = [n for n in os.listdir(tmp_path) if ".__lease" in n]
    assert names == [os.path.basename(lease_path_for(res, 2))]
    release_lease(spark, res, token)
    # release leaves a TOMBSTONE, not nothing: the numeric trace is
    # what stops a later acquirer from ever re-targeting gen 2
    names = [n for n in os.listdir(tmp_path) if ".__lease" in n]
    assert len(names) == 1 and ".__lease.r" in names[0]


def test_generation_numbers_never_reused_after_release(spark, tmp_path):
    # the reuse hole the tombstone closes: acquire→release→acquire must
    # target max_ever+1, never reset to 1 and never re-create gen 1
    res = str(tmp_path / "store")
    t1 = acquire_lease(spark, res, ttl_s=60)
    release_lease(spark, res, t1)
    t2 = acquire_lease(spark, res, ttl_s=60)
    assert int(t2.split(":", 1)[0]) == int(t1.split(":", 1)[0]) + 1
    release_lease(spark, res, t2)


def test_aged_tombstones_are_swept(spark, tmp_path):
    import os

    res = str(tmp_path / "store")
    t1 = acquire_lease(spark, res, ttl_s=60)
    release_lease(spark, res, t1)
    tomb = [n for n in os.listdir(tmp_path) if ".__lease.r" in n]
    assert len(tomb) == 1
    past = time.time() - 1000  # the sweep bar is max(ttl, DEFAULT_TTL_S)
    os.utime(tmp_path / tomb[0], (past, past))
    t2 = acquire_lease(spark, res, ttl_s=60)  # sweeps aged tombstones
    assert tomb[0] not in os.listdir(tmp_path)
    # a FRESH tombstone must survive the sweep (it may still be the
    # high-water mark a stalled contender needs)
    release_lease(spark, res, t2)
    t3 = acquire_lease(spark, res, ttl_s=60)
    assert any(".__lease.r" in n for n in os.listdir(tmp_path))
    release_lease(spark, res, t3)


def test_cross_process_exclusion(spark, tmp_path):
    """The deployment scenario the lease exists for: a SECOND OS
    process (not a thread) holding the lease fences this one out —
    O_EXCL is a kernel primitive, so in-process locks play no part."""
    import subprocess
    import sys

    res = str(tmp_path / "store")
    code = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "from weather_etl_pipeline_spark.sources.lease import acquire_lease;"
        f"acquire_lease(None, {res!r}, owner='other-process', ttl_s=60);"
        "print('HELD', flush=True);"
        "import time; time.sleep(30)"
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.PIPE, text=True
    )
    try:
        assert proc.stdout.readline().strip() == "HELD"
        with pytest.raises(LeaseHeldError) as ei:
            acquire_lease(spark, res, ttl_s=60)
        assert "other-process" in str(ei.value)
    finally:
        proc.kill()
        proc.wait()
    # the killed process never released: the lease survives its death
    # and fences until TTL — exactly the crash semantics documented
    with pytest.raises(LeaseHeldError):
        acquire_lease(spark, res, ttl_s=60)


# --------------------------------------------------- writer-entry-point wiring


def test_signature_store_mutators_respect_foreign_lease(spark, tmp_path):
    from weather_etl_pipeline_spark.operators.dedup_store import (
        append_signature_batch,
        build_signature_store,
    )

    sig = str(tmp_path / "sig")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    build_signature_store(spark, docs, sig)
    token = acquire_lease(spark, sig, owner="other-writer", ttl_s=60)
    batch = spark.createDataFrame(
        [(3, "iota kappa lambda mu")], "doc_id long, text string"
    )
    with pytest.raises(LeaseHeldError):
        append_signature_batch(spark, batch, sig, watermark_hi=3)
    with pytest.raises(LeaseHeldError):
        build_signature_store(spark, docs, sig)
    release_lease(spark, sig, token)
    append_signature_batch(spark, batch, sig, watermark_hi=3)  # now clean
    # opt-out still works under a held lease (externally serialized)
    t2 = acquire_lease(spark, sig, owner="other-writer", ttl_s=60)
    batch2 = spark.createDataFrame(
        [(4, "nu xi omicron pi")], "doc_id long, text string"
    )
    append_signature_batch(
        spark, batch2, sig, watermark_hi=4, lease_ttl_s=None
    )
    release_lease(spark, sig, t2)


def test_ivf_mutators_respect_foreign_lease(spark, tmp_path):
    from weather_etl_pipeline_spark.operators.ivf_store import (
        append_ivf_batch,
        build_ivf_index,
    )

    ivf = str(tmp_path / "ivf")
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, e array<double>"
    )
    build_ivf_index(spark, emb, ivf)
    token = acquire_lease(spark, ivf, owner="other-writer", ttl_s=60)
    batch = spark.createDataFrame([(3, [1.0, 1.0])], "vec_id long, e array<double>")
    with pytest.raises(LeaseHeldError):
        append_ivf_batch(spark, batch, ivf, watermark_hi=3)
    with pytest.raises(LeaseHeldError):
        build_ivf_index(spark, emb, ivf)
    release_lease(spark, ivf, token)
    append_ivf_batch(spark, batch, ivf, watermark_hi=3)


def test_optimize_table_respects_foreign_lease(spark, tmp_path):
    from weather_etl_pipeline_spark.sources.maintenance import optimize_table

    table = str(tmp_path / "tbl")
    spark.range(100).write.parquet(table)
    token = acquire_lease(spark, table, owner="ingest", ttl_s=60)
    with pytest.raises(LeaseHeldError):
        optimize_table(spark, table, zorder_by=["id"])
    release_lease(spark, table, token)
    report = optimize_table(spark, table, zorder_by=["id"])
    assert report["mode"] == "zorder"
    # the dir swap must not have disturbed lease bookkeeping: a fresh
    # acquire/release cycle works and leaves only release tombstones
    # behind (never a live generation file)
    import os

    t2 = acquire_lease(spark, table, ttl_s=60)
    release_lease(spark, table, t2)
    live = [n for n in os.listdir(tmp_path) if ".__lease.g" in n]
    assert live == []


def test_crash_orphaned_temps_are_swept_by_age(spark, tmp_path):
    import os

    res = str(tmp_path / "store")
    stale = tmp_path / ".store.__lease.g00000000000000000009.tmp_deadbeef"
    fresh = tmp_path / ".store.__lease.g00000000000000000009.tmp_cafecafe"
    stale.write_bytes(b"{}")
    fresh.write_bytes(b"{}")
    past = time.time() - 1000  # past DEFAULT_TTL_S, the sweep's age bar
    os.utime(stale, (past, past))  # crashed creator from a TTL+ ago
    token = acquire_lease(spark, res, ttl_s=60)
    names = set(os.listdir(tmp_path))
    assert stale.name not in names  # swept: older than the TTL
    assert fresh.name in names  # kept: could be an in-flight create
    release_lease(spark, res, token)


def test_lease_file_is_a_sibling_not_a_child(tmp_path):
    # the swap family renames/copies the resource DIR; the lease must
    # live beside it so a mid-hold swap can't move or delete it
    assert lease_path_for("/a/b/store", 1) == (
        "/a/b/store.__lease.g" + "1".zfill(20)
    )
    assert lease_path_for("/a/b/store/", 1) == lease_path_for("/a/b/store", 1)


def test_ttl_must_be_positive(spark, tmp_path):
    with pytest.raises(ValueError, match="ttl_s"):
        acquire_lease(spark, str(tmp_path / "s"), ttl_s=0)


# ---------------------------------------------------------- round 12: fencing


@pytest.mark.parametrize("impl", IMPLS)
def test_lease_is_live_tracks_hold_and_expiry(spark, tmp_path, impl):
    from weather_etl_pipeline_spark.sources.lease import lease_is_live

    res = _resource(tmp_path, impl)
    token = acquire_lease(spark, res, ttl_s=60, _impl=impl)
    assert lease_is_live(spark, res, token, _impl=impl) is True
    assert lease_is_live(spark, res, "9999:deadbeef", _impl=impl) is False
    assert lease_is_live(spark, res, "not-a-token", _impl=impl) is False
    release_lease(spark, res, token, _impl=impl)
    assert lease_is_live(spark, res, token, _impl=impl) is False


def test_lease_is_live_false_after_ttl_and_after_supersede(spark, tmp_path):
    from weather_etl_pipeline_spark.sources.lease import lease_is_live

    res = str(tmp_path / "store")
    token = acquire_lease(spark, res, ttl_s=0.05)
    time.sleep(0.1)
    # expired but not yet superseded: live check must already fail —
    # the hold guarantee ends at `expires`, not at takeover
    assert lease_is_live(spark, res, token) is False
    t2 = acquire_lease(spark, res, ttl_s=60)  # successor breaks it
    assert lease_is_live(spark, res, token) is False
    assert lease_is_live(spark, res, t2) is True
    release_lease(spark, res, t2)


def test_fence_for_raises_lease_lost_after_lapse(spark, tmp_path):
    from weather_etl_pipeline_spark.sources.lease import (
        LeaseLostError,
        fence_for,
    )

    res = str(tmp_path / "store")
    token = acquire_lease(spark, res, ttl_s=0.05)
    fence = fence_for(spark, res, token)
    time.sleep(0.1)
    with pytest.raises(LeaseLostError, match="expired or was superseded"):
        fence()


def test_fence_for_passes_while_held(spark, tmp_path):
    from weather_etl_pipeline_spark.sources.lease import fence_for

    res = str(tmp_path / "store")
    token = acquire_lease(spark, res, ttl_s=60)
    fence_for(spark, res, token)()  # no raise
    release_lease(spark, res, token)


def test_sweep_fault_does_not_fail_acquire(spark, tmp_path, monkeypatch):
    """ADVICE r11 (medium): a transient FS fault in the post-create
    hygiene (tombstone sweep / superseded-generation delete) must not
    escape acquire_lease AFTER the lease file exists — that would
    fence the resource for the full TTL with no token in any caller's
    hands. The Hadoop path raises Py4JJavaError (not OSError), so the
    guard must be exception-broad."""
    from weather_etl_pipeline_spark.sources import lease as lease_mod

    class FakePy4JError(Exception):
        pass

    def _boom(*a, **k):
        raise FakePy4JError("transient FS fault during hygiene")

    monkeypatch.setattr(lease_mod, "_sweep_stale_sidecars", _boom)
    res = str(tmp_path / "store")
    token = acquire_lease(spark, res, ttl_s=60)  # must NOT raise
    assert token
    release_lease(spark, res, token)


def test_delete_gen_fault_does_not_fail_acquire(spark, tmp_path, monkeypatch):
    from weather_etl_pipeline_spark.sources import lease as lease_mod

    res = str(tmp_path / "store")
    # leave a stale generation behind so the new acquire has something
    # to clean up (the _delete_gen loop actually runs)
    acquire_lease(spark, res, ttl_s=0.05)
    time.sleep(0.1)

    def _boom(*a, **k):
        raise Exception("py4j-shaped fault mid superseded-gen delete")

    monkeypatch.setattr(lease_mod, "_delete_gen", _boom)
    token = acquire_lease(spark, res, ttl_s=60)  # must NOT raise
    assert token
    release_lease(spark, res, token)


def test_overrun_hold_logs_release_warning(spark, tmp_path, caplog):
    """ADVICE r11 (low): a guarded mutation that outruns its TTL always
    leaves a stale lease behind (release refuses past expiry). That is
    by design, but it must be VISIBLE — the warning is how operators
    learn their ttl_s is chronically undersized."""
    import logging

    res = str(tmp_path / "store")
    with caplog.at_level(
        logging.WARNING, logger="weather_etl_pipeline_spark.sources.lease"
    ):
        with writer_lease(spark, res, ttl_s=0.05):
            time.sleep(0.1)  # outrun the TTL
    assert any("not released" in r.message for r in caplog.records)
    # clean exit within the TTL logs nothing
    caplog.clear()
    with caplog.at_level(
        logging.WARNING, logger="weather_etl_pipeline_spark.sources.lease"
    ):
        with writer_lease(spark, res, ttl_s=60):
            pass
    assert not caplog.records


def test_append_early_fence_aborts_cleanly_and_retry_succeeds(spark, tmp_path):
    """A lease that lapses BEFORE the append's first data write aborts
    at the EARLY fence (LeaseLostError) with nothing written — the
    watermark is unadvanced, no journal intent is set, and a retry
    under a fresh lease simply succeeds."""
    from weather_etl_pipeline_spark.operators.dedup_store import (
        append_signature_batch,
        build_signature_store,
        read_store_watermark,
    )
    from weather_etl_pipeline_spark.sources.lease import LeaseLostError

    sig = str(tmp_path / "sig")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    build_signature_store(spark, docs, sig)
    assert read_store_watermark(spark, sig) == 2
    batch = spark.createDataFrame(
        [(3, "iota kappa lambda mu nu xi")], "doc_id long, text string"
    )
    # 50ms TTL lapses during the entry-point meta read — the early
    # fence fires before the intent record or any data write
    with pytest.raises(LeaseLostError):
        append_signature_batch(spark, batch, sig, watermark_hi=3, lease_ttl_s=0.05)
    assert read_store_watermark(spark, sig) == 2
    # nothing was written ⇒ the retry is clean, not a torn-state refusal
    append_signature_batch(spark, batch, sig, watermark_hi=3)
    assert read_store_watermark(spark, sig) == 3


def test_append_late_fence_abort_is_a_crash_equivalent(spark, tmp_path):
    """A lease that lapses AFTER the data writes aborts at the LATE
    (pre-commit) fence; the torn journal then makes the retry refuse
    loudly — identical to a mid-append crash, which is the documented
    recovery class (rebuild). Driven deterministically by injecting a
    fence that passes its early call and raises at the commit call."""
    from weather_etl_pipeline_spark.operators.dedup_store import (
        append_signature_batch,
        build_signature_store,
        read_store_watermark,
    )
    from weather_etl_pipeline_spark.sources.lease import LeaseLostError

    sig = str(tmp_path / "sig")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    build_signature_store(spark, docs, sig)
    batch = spark.createDataFrame(
        [(3, "iota kappa lambda mu nu xi")], "doc_id long, text string"
    )
    calls = {"n": 0}

    def fence():
        calls["n"] += 1
        if calls["n"] > 1:  # early call passes; commit call raises
            raise LeaseLostError(sig, "test-token")

    with pytest.raises(LeaseLostError):
        append_signature_batch(
            spark, batch, sig, watermark_hi=3, lease_ttl_s=None, _fence=fence
        )
    assert calls["n"] == 2
    # commit never happened, but data was written: watermark unadvanced
    # AND the journal intent is set with orphan rows above it
    assert read_store_watermark(spark, sig) == 2
    with pytest.raises(ValueError, match="torn append"):
        append_signature_batch(spark, batch, sig, watermark_hi=3)


def test_ivf_append_early_fence_aborts_cleanly(spark, tmp_path):
    from weather_etl_pipeline_spark.operators.ivf_store import (
        _read_meta,
        append_ivf_batch,
        build_ivf_index,
    )
    from weather_etl_pipeline_spark.sources.lease import LeaseLostError

    ivf = str(tmp_path / "ivf")
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, e array<double>"
    )
    build_ivf_index(spark, emb, ivf)
    assert _read_meta(spark, ivf)[0] == 2
    batch = spark.createDataFrame(
        [(3, [1.0, 1.0])], "vec_id long, e array<double>"
    )
    with pytest.raises(LeaseLostError):
        append_ivf_batch(spark, batch, ivf, watermark_hi=3, lease_ttl_s=0.05)
    assert _read_meta(spark, ivf)[0] == 2  # commit never happened
    append_ivf_batch(spark, batch, ivf, watermark_hi=3)  # clean retry
    assert _read_meta(spark, ivf)[0] == 3


def test_build_fences_before_destructive_overwrite(spark, tmp_path):
    """A rebuild whose lease lapsed must abort BEFORE erasing the
    store's data dirs: rows missing BELOW the watermark are the one
    torn state the orphan-above scan cannot see. Injected fence raises
    on its first call; the store's data must be untouched after."""
    from weather_etl_pipeline_spark.operators.dedup_store import (
        build_signature_store,
        probe_signature_store,
    )
    from weather_etl_pipeline_spark.sources.lease import LeaseLostError

    sig = str(tmp_path / "sig")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "eta theta iota kappa")],
        "doc_id long, text string",
    )
    build_signature_store(spark, docs, sig)

    def fence():
        raise LeaseLostError(sig, "test-token")

    with pytest.raises(LeaseLostError):
        build_signature_store(spark, docs, sig, lease_ttl_s=None, _fence=fence)
    # the probe still finds doc 1's exact twin ⇒ bands/codes survived
    dup = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    hits = probe_signature_store(spark, dup, sig).collect()
    assert {(r["new_id"], r["old_id"]) for r in hits} == {(9, 1)}


def test_optimize_table_fences_before_the_swap(spark, tmp_path):
    """An optimize whose lease lapsed must abort BEFORE staging the
    live table aside: its rewritten layout is a snapshot of the table
    as read, and swapping it in would erase rows a successor appended
    after the read. Injected fence raises at the swap; the live table
    must be untouched AND the just-written tmp must be deleted — a
    leftover tmp would trip the crashed-rewrite guard and brick every
    later optimize with a spurious manual-recovery refusal."""
    import os

    from weather_etl_pipeline_spark.sources.maintenance import optimize_table
    from weather_etl_pipeline_spark.sources.lease import LeaseLostError

    table = str(tmp_path / "tbl")
    spark.range(100).write.parquet(table)
    before = sorted(r["id"] for r in spark.read.parquet(table).collect())

    def fence():
        raise LeaseLostError(table, "test-token")

    with pytest.raises(LeaseLostError):
        optimize_table(
            spark, table, zorder_by=["id"], lease_ttl_s=None, _fence=fence
        )
    # live table untouched and fully readable
    assert sorted(r["id"] for r in spark.read.parquet(table).collect()) == before
    # the abort happened before the first rename AND cleaned its own
    # garbage: no recovery-state leftovers of either kind
    assert not os.path.exists(table + ".__optimize_old__")
    assert not os.path.exists(table + ".__optimize_tmp__")
    # the next optimize therefore runs clean, no manual recovery
    report = optimize_table(spark, table, zorder_by=["id"], lease_ttl_s=None)
    assert report["mode"] == "zorder"


def test_hadoop_readback_transient_none_retries_and_wins(
    spark, tmp_path, monkeypatch
):
    """A transient not-found on the post-rename confirmation read must
    not demote the actual winner: _hadoop_try_create retries the read
    once before concluding. Pre-fix, a single spurious None made the
    winner return False with its lease file LIVE on disk — the
    resource fenced for a full TTL with nobody holding the token."""
    from weather_etl_pipeline_spark.sources import lease as lease_mod

    real_read = lease_mod._hadoop_read
    calls = {"n": 0}

    def flaky_read(spark_, path):
        calls["n"] += 1
        if calls["n"] == 1:
            return None  # transient metadata fault on the first read-back
        return real_read(spark_, path)

    monkeypatch.setattr(lease_mod, "_hadoop_read", flaky_read)
    res = f"file://{tmp_path}/store"
    token = acquire_lease(spark, res, owner="w1", ttl_s=60, _impl="hadoop")
    assert calls["n"] >= 2  # the retry actually ran
    from weather_etl_pipeline_spark.sources.lease import lease_is_live

    assert lease_is_live(spark, res, token, _impl="hadoop")
    assert release_lease(spark, res, token, _impl="hadoop")


def test_hadoop_readback_persistent_none_disowns_instead_of_fencing(
    spark, tmp_path, monkeypatch
):
    """When the confirmation read persistently reports not-found,
    _hadoop_try_create must DELETE the file it renamed into place
    before returning False: otherwise its lease file stays live on
    disk while no caller holds the token, fencing the resource for the
    full TTL. After the fault clears, the next acquire must succeed
    immediately — no orphan in the way."""
    from weather_etl_pipeline_spark.sources import lease as lease_mod
    from weather_etl_pipeline_spark.sources.lease import lease_path_for

    monkeypatch.setattr(lease_mod, "_hadoop_read", lambda s, p: None)
    res = f"file://{tmp_path}/store"
    path = lease_path_for(res, 1)
    assert (
        lease_mod._hadoop_try_create(spark, path, b'{"expires": 9e18}') is False
    )
    # the orphan was disowned, not left fencing
    gen_name = "store.__lease.g" + "0" * 19 + "1"
    assert not os.path.exists(os.path.join(str(tmp_path), gen_name))
    monkeypatch.undo()
    token = acquire_lease(spark, res, owner="next", ttl_s=60, _impl="hadoop")
    assert release_lease(spark, res, token, _impl="hadoop")
