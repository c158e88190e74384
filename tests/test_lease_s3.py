"""S3 conditional-PUT lease backend (sources/lease_s3.py) under moto.

This is the closure of the long-documented object-store caveat: the
Hadoop path can only EMULATE create-if-absent on S3A (HEAD-then-PUT,
a narrowed-but-open window), while ``put_object(IfNoneMatch="*")``
publishes name and payload in one atomic call. moto 5 enforces real
If-None-Match / If-Match semantics (verified by the raw-primitive
tests below before anything lease-level runs), so these tests exercise
the same wire contract AWS S3 does — no SparkSession involved; the
backend is pure boto3 by design.

Reference parity: the reference (ingestion.py:7-45, gold.py:13-125)
is a cron-sequenced single writer on local disk; the lease exists
because this engine's curation service admits concurrent deploys onto
object storage.
"""

from __future__ import annotations

import json
import threading
import time

import pytest

moto = pytest.importorskip("moto", reason="moto not installed (env gate)")
boto3 = pytest.importorskip("boto3", reason="boto3 not installed (env gate)")

from weather_etl_pipeline_spark.sources import lease, lease_s3
from weather_etl_pipeline_spark.sources.lease import (
    LeaseHeldError,
    LeaseLostError,
    acquire_lease,
    fence_for,
    lease_is_live,
    lease_path_for,
    prune_dead_sidecars,
    release_lease,
    writer_lease,
)

BUCKET = "lease-test-bucket"
RES = f"s3://{BUCKET}/stores/sig_store"


@pytest.fixture()
def s3():
    """moto-backed client injected into the backend; reset after, so a
    cached mocked client never leaks into other tests."""
    with moto.mock_aws():
        c = boto3.client("s3", region_name="us-east-1")
        c.create_bucket(Bucket=BUCKET)
        lease_s3.set_client(c)
        try:
            yield c
        finally:
            lease_s3.set_client(None)


# ------------------------------------------------------------- raw primitives


def test_conditional_put_is_atomic_create_with_content(s3):
    path = f"s3://{BUCKET}/k/one"
    assert lease_s3.try_create(path, b"alpha") is True
    # loser's put carries DIFFERENT content and must not tear the winner
    assert lease_s3.try_create(path, b"beta") is False
    assert lease_s3.read(path) == b"alpha"


def test_read_absent_and_delete_idempotent(s3):
    assert lease_s3.read(f"s3://{BUCKET}/nope") is None
    lease_s3.delete(f"s3://{BUCKET}/nope")  # no raise on absent key
    assert lease_s3.read(f"s3://{BUCKET}/nope") is None


def test_list_with_mtime_filters_basename_and_subdirs(s3):
    parent = f"s3://{BUCKET}/stores"
    lease_s3.try_create(f"{parent}/sig.__lease.g1", b"x")
    lease_s3.try_create(f"{parent}/sig.__lease.r1", b"x")
    lease_s3.try_create(f"{parent}/other_file", b"x")
    # deeper-path key sharing the prefix is foreign (sidecars are flat)
    lease_s3.try_create(f"{parent}/sig.__lease.gdir/nested", b"x")
    got = lease_s3.list_with_mtime(parent, "sig.__lease.g")
    assert [n for n, _ in got] == ["sig.__lease.g1"]
    assert all(isinstance(m, float) and m > 0 for _, m in got)
    assert lease_s3.list_names(parent, "sig.__lease.r") == ["sig.__lease.r1"]


def test_conflict_409_resolved_by_read_back(s3):
    """S3 can refuse to arbitrate racing conditional PUTs with 409
    ConditionalRequestConflict — NOT a loss. try_create must then
    claim victory iff the durable payload is ours."""
    from botocore.exceptions import ClientError

    path = f"s3://{BUCKET}/k/conflicted"

    class Conflicting:
        """put_object raises 409 after the write actually landed (the
        'our request was the one that won but got the conflict reply'
        shape); everything else delegates to the real mocked client."""

        def __init__(self, inner, land_body):
            self._inner = inner
            self._land = land_body

        def put_object(self, **kw):
            if self._land is not None:
                self._inner.put_object(
                    Bucket=kw["Bucket"], Key=kw["Key"], Body=self._land
                )
            raise ClientError(
                {"Error": {"Code": "ConditionalRequestConflict"}}, "PutObject"
            )

        def __getattr__(self, name):
            return getattr(self._inner, name)

    real = lease_s3._get_client()
    try:
        lease_s3.set_client(Conflicting(real, b"mine"))
        assert lease_s3.try_create(path, b"mine") is True  # ours landed
        lease_s3.set_client(Conflicting(real, None))  # theirs landed
        assert lease_s3.try_create(path, b"not-mine") is False
    finally:
        lease_s3.set_client(real)


def test_tombstone_copies_before_conditional_delete(s3):
    src = f"s3://{BUCKET}/stores/sig.__lease.g7"
    dst = f"s3://{BUCKET}/stores/sig.__lease.r7_abc"
    lease_s3.try_create(src, b"payload")
    assert lease_s3.tombstone(src, dst) is True
    assert lease_s3.read(src) is None
    assert lease_s3.read(dst) == b"payload"
    # absent source → clean refusal, nothing created
    assert lease_s3.tombstone(src, dst + "2") is False
    assert lease_s3.read(dst + "2") is None


def test_tombstone_crash_between_copy_and_delete_never_regresses(s3):
    """The docstring's crash-shape claim, exercised: a crash after the
    tombstone copy but before the source delete leaves BOTH files; the
    release reports failure, the generation reads as a normal lease
    (live until TTL), and once it expires the next acquire supersedes
    to a HIGHER generation — numbering never regresses."""
    from botocore.exceptions import ClientError

    tok = acquire_lease(None, RES, owner="crasher", ttl_s=2.0)

    class DeleteCrashes:
        def __init__(self, inner):
            self._inner = inner

        def delete_object(self, **kw):
            if "IfMatch" in kw:  # only the tombstone's conditional delete
                raise ClientError(
                    {"Error": {"Code": "InternalError"}}, "DeleteObject"
                )
            return self._inner.delete_object(**kw)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    real = lease_s3._get_client()
    try:
        lease_s3.set_client(DeleteCrashes(real))
        with pytest.raises(ClientError):
            release_lease(None, RES, tok)
    finally:
        lease_s3.set_client(real)
    gen = int(tok.split(":")[0])
    # both files present: generation still live, tombstone durable
    assert lease_s3.read(lease_path_for(RES, gen)) is not None
    assert lease_s3.list_names(f"s3://{BUCKET}/stores", "sig_store.__lease.r")
    # still inside TTL → the torn release did not break mutual exclusion
    with pytest.raises(LeaseHeldError):
        acquire_lease(None, RES, ttl_s=30.0)
    time.sleep(2.1)  # past the TTL: normal expired-lease takeover
    t2 = acquire_lease(None, RES, ttl_s=30.0)
    assert int(t2.split(":")[0]) == gen + 1


def test_tombstone_refuses_when_source_changes_midflight(s3):
    """If the source generation's bytes change between head_object and
    the conditional delete (impossible for real generations — names are
    never rewritten — so this pins the belt-and-braces contract), the
    IfMatch delete must refuse: tombstone() returns False and the
    changed source survives."""
    src = f"s3://{BUCKET}/stores/x.__lease.g9"
    dst = f"s3://{BUCKET}/stores/x.__lease.r9_zz"
    lease_s3.try_create(src, b"original")
    real = lease_s3._get_client()

    class SwapsSource:
        def __init__(self, inner):
            self._inner = inner

        def copy_object(self, **kw):
            out = self._inner.copy_object(**kw)
            # a foreign writer rewrites the source after our head+copy
            self._inner.put_object(
                Bucket=BUCKET, Key="stores/x.__lease.g9", Body=b"changed"
            )
            return out

        def __getattr__(self, name):
            return getattr(self._inner, name)

    try:
        lease_s3.set_client(SwapsSource(real))
        assert lease_s3.tombstone(src, dst) is False
    finally:
        lease_s3.set_client(real)
    assert lease_s3.read(src) == b"changed"  # the foreign write survives
    assert lease_s3.read(dst) == b"original"  # aged sweep's problem now


def test_tombstone_copy_pinned_to_headed_etag(s3):
    """The copy itself is pinned via CopySourceIfMatch: if the source
    changed between head_object and copy_object, the copy 412s and
    tombstone() reports the lost race WITHOUT publishing a tombstone
    that carries a different writer's bytes. moto does not evaluate
    CopySourceIfMatch (verified: a mismatched ETag copy succeeds), so
    the 412 is injected by a wrapper — but the parameter itself is
    asserted on the wire call, pinning that we actually send it."""
    from botocore.exceptions import ClientError

    src = f"s3://{BUCKET}/stores/y.__lease.g3"
    dst = f"s3://{BUCKET}/stores/y.__lease.r3_zz"
    lease_s3.try_create(src, b"original")
    real = lease_s3._get_client()
    seen = {}

    class CopyRefuses:
        def __init__(self, inner):
            self._inner = inner

        def copy_object(self, **kw):
            seen["CopySourceIfMatch"] = kw.get("CopySourceIfMatch")
            raise ClientError(
                {"Error": {"Code": "PreconditionFailed"}}, "CopyObject"
            )

        def __getattr__(self, name):
            return getattr(self._inner, name)

    try:
        lease_s3.set_client(CopyRefuses(real))
        assert lease_s3.tombstone(src, dst) is False
    finally:
        lease_s3.set_client(real)
    # the condition was sent, and it was the HEAD'd ETag
    assert seen["CopySourceIfMatch"] == real.head_object(
        Bucket=BUCKET, Key="stores/y.__lease.g3"
    )["ETag"]
    assert lease_s3.read(dst) is None  # nothing published on the 412
    assert lease_s3.read(src) == b"original"


def test_tombstone_falls_back_when_conditional_delete_unsupported(s3):
    """Conditional DELETE (IfMatch) is a narrower capability than
    conditional PUT — absent on non-directory-bucket AWS and on
    S3-compatible stores (MinIO, Ceph) this backend auto-activates on.
    A 501 NotImplemented there must NOT escape release (the tombstone
    copy already succeeded; raising would leave the generation live
    until TTL on every release). Identity is ETag-pinned by the copy,
    so the fallback is a plain unconditional delete — and the endpoint
    capability is logged once per bucket, not once per release."""
    from botocore.exceptions import ClientError

    calls = {"conditional": 0, "plain": 0}

    class NoConditionalDelete:
        def __init__(self, inner):
            self._inner = inner

        def delete_object(self, **kw):
            if "IfMatch" in kw:
                calls["conditional"] += 1
                raise ClientError(
                    {"Error": {"Code": "NotImplemented"}}, "DeleteObject"
                )
            calls["plain"] += 1
            return self._inner.delete_object(**kw)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    real = lease_s3._get_client()
    lease_s3._COND_DELETE_WARNED.discard(BUCKET)
    try:
        lease_s3.set_client(NoConditionalDelete(real))
        # primitive level: fallback succeeds and the move is complete
        src = f"s3://{BUCKET}/stores/z.__lease.g5"
        dst = f"s3://{BUCKET}/stores/z.__lease.r5_ab"
        lease_s3.try_create(src, b"payload")
        assert lease_s3.tombstone(src, dst) is True
        assert lease_s3.read(src) is None
        assert lease_s3.read(dst) == b"payload"
        assert calls == {"conditional": 1, "plain": 1}
        # lease level: the full acquire→release cycle works on such an
        # endpoint — release returns True and the next acquire gets the
        # successor generation immediately (no TTL stall regression)
        tok = acquire_lease(None, RES, owner="w1", ttl_s=30.0)
        assert release_lease(None, RES, tok) is True
        t2 = acquire_lease(None, RES, owner="w2", ttl_s=30.0)
        assert int(t2.split(":")[0]) == int(tok.split(":")[0]) + 1
        release_lease(None, RES, t2)
        assert BUCKET in lease_s3._COND_DELETE_WARNED  # warned exactly once
    finally:
        lease_s3.set_client(real)
        lease_s3._COND_DELETE_WARNED.discard(BUCKET)


# ----------------------------------------------------------- lease lifecycle


def test_acquire_blocks_second_writer_and_releases_to_tombstone(s3):
    tok = acquire_lease(None, RES, owner="w1", ttl_s=30.0)
    assert lease_is_live(None, RES, tok)
    with pytest.raises(LeaseHeldError) as ei:
        acquire_lease(None, RES, owner="w2", ttl_s=30.0)
    assert ei.value.owner == "w1"
    assert release_lease(None, RES, tok) is True
    # generation file renamed aside, numbering trace survives
    keys = [o["Key"] for o in s3.list_objects_v2(Bucket=BUCKET)["Contents"]]
    assert not any(".__lease.g" in k for k in keys)
    assert any(".__lease.r" in k for k in keys)
    # re-release is a no-op refusal
    assert release_lease(None, RES, tok) is False


def test_generation_numbers_monotonic_across_release(s3):
    t1 = acquire_lease(None, RES, ttl_s=30.0)
    release_lease(None, RES, t1)
    t2 = acquire_lease(None, RES, ttl_s=30.0)
    g1, g2 = int(t1.split(":")[0]), int(t2.split(":")[0])
    assert g2 == g1 + 1  # tombstone kept the high-water mark visible


def test_stale_lease_superseded_and_garbage_collected(s3):
    t1 = acquire_lease(None, RES, owner="slow", ttl_s=0.2)
    time.sleep(0.3)
    t2 = acquire_lease(None, RES, owner="fast", ttl_s=30.0)
    assert int(t2.split(":")[0]) > int(t1.split(":")[0])
    assert not lease_is_live(None, RES, t1)
    assert lease_is_live(None, RES, t2)
    # superseded generation swept by the winner
    assert lease_s3.read(lease_path_for(RES, int(t1.split(":")[0]))) is None
    # the overstaying holder's release refuses (successor live)
    assert release_lease(None, RES, t1) is False
    assert lease_is_live(None, RES, t2)


def test_torn_lease_is_immediately_stale(s3):
    # a torn payload can't occur via the conditional PUT (content is
    # atomic with the name) — simulate an out-of-band corrupt file
    lease_s3.try_create(lease_path_for(RES, 5), b"")
    tok = acquire_lease(None, RES, ttl_s=30.0)
    assert int(tok.split(":")[0]) == 6


def test_fence_aborts_after_out_of_band_loss(s3):
    tok = acquire_lease(None, RES, ttl_s=30.0)
    fence = fence_for(None, RES, tok)
    fence()  # live → no raise
    lease_s3.delete(lease_path_for(RES, int(tok.split(":")[0])))
    with pytest.raises(LeaseLostError):
        fence()


def test_writer_lease_context_manager(s3):
    with writer_lease(None, RES, ttl_s=30.0) as tok:
        assert lease_is_live(None, RES, tok)
        with pytest.raises(LeaseHeldError):
            acquire_lease(None, RES, ttl_s=30.0)
    assert not lease_is_live(None, RES, tok)
    acquire_lease(None, RES, ttl_s=30.0)  # free again


def test_contention_exactly_one_winner(s3):
    """N threads race one acquire each: exactly one token, the rest
    LeaseHeldError (or a lost-create retry ending in LeaseHeldError).
    The arbitration is moto's If-None-Match evaluation — the same
    contract AWS enforces server-side."""
    winners, losers, unexpected = [], [], []
    barrier = threading.Barrier(8)

    def contender():
        barrier.wait()
        try:
            winners.append(acquire_lease(None, RES, ttl_s=30.0))
        except LeaseHeldError:
            losers.append(1)
        except Exception as e:  # pragma: no cover - diagnostic
            unexpected.append(e)

    threads = [threading.Thread(target=contender) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert unexpected == []
    assert len(winners) == 1 and len(losers) == 7
    assert lease_is_live(None, RES, winners[0])


def test_prune_dead_sidecars_on_s3(s3):
    # dead: expired payload; live: fresh one — only the dead goes
    dead = json.dumps(
        {"token": "x", "owner": "old", "acquired": 0.0, "expires": 1.0}
    ).encode()
    lease_s3.try_create(lease_path_for(RES, 1), dead)
    live_tok = acquire_lease(None, RES, ttl_s=30.0)  # sweeps gen 1 itself
    lease_s3.try_create(lease_path_for(RES, 1), dead)  # re-plant the dead one
    deleted = prune_dead_sidecars(None, RES, grace_s=0.0)
    assert any(n.endswith("1") for n in deleted)
    assert lease_is_live(None, RES, live_tok)  # live generation untouched
    # release → tombstone; a zero-grace prune sweeps the aged tombstone
    release_lease(None, RES, live_tok)
    time.sleep(0.05)
    prune_dead_sidecars(None, RES, grace_s=0.0)
    assert lease_s3.list_names(f"s3://{BUCKET}/stores", "sig_store.__lease") == []


def test_acquire_list_call_budget(s3):
    """Pin the uncontended acquire's LIST budget at 2: ONE shared-stem
    listing for generations+tombstones (g- and r-sidecars share
    '.__lease.', and its (name, mtime) pairs are reused by the hygiene
    sweep — tombstone mtimes never change), plus the sweep's payload-
    temp listing (dot-prefixed stem the shared listing can't cover). A
    regression here silently raises the per-mutation HTTP cost of
    every leased store write."""
    calls = {"list": 0}
    real = lease_s3._get_client()

    class Counting:
        def get_paginator(self, name):
            if name == "list_objects_v2":
                calls["list"] += 1
            return real.get_paginator(name)

        def __getattr__(self, name):
            return getattr(real, name)

    try:
        lease_s3.set_client(Counting())
        tok = acquire_lease(None, RES, ttl_s=30.0)
    finally:
        lease_s3.set_client(real)
    assert calls["list"] == 2, calls
    assert lease_is_live(None, RES, tok)


def test_s3a_scheme_and_hadoop_force(s3):
    """s3a:// (the Spark connector spelling) addresses the same bucket
    through boto3; _impl='hadoop' opts out of the backend entirely."""
    res_a = f"s3a://{BUCKET}/stores/sig_store_a"
    tok = acquire_lease(None, res_a, ttl_s=30.0)
    assert lease_is_live(None, res_a, tok)
    # the object landed under the plain bucket key, connector-agnostic
    assert lease_s3.read(f"s3://{BUCKET}/stores/sig_store_a.__lease.g" + "0" * 19 + "1")
    assert release_lease(None, res_a, tok)
    from weather_etl_pipeline_spark.sources.lease import _impl_s3

    assert _impl_s3(res_a, "auto") is True
    assert _impl_s3(res_a, "hadoop") is False
    assert _impl_s3("/tmp/local/path", "auto") is False
