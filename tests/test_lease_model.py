"""Model-based (hypothesis.stateful) exploration of the lease protocol.

The hand-written suites pin specific scenarios (contention storms,
crash shapes, fencing); this machine lets hypothesis search operation
ORDERINGS — acquire / release / crash-without-release / TTL-expiry /
zero-grace prune in arbitrary sequence — against two invariants that
must survive every ordering:

- **single holder**: at most one token is ever live, and an acquire
  that raises LeaseHeldError does so only while the model also says a
  live holder exists;
- **generation monotonicity**: every successful acquire returns a
  generation strictly greater than every generation ever issued across
  releases (tombstones) and crashes (stale supersede). A ZERO-grace
  prune is the documented exception — ``grace_s`` is exactly the
  protection against the numbering-reset ABA, and grace 0 is the
  caller asserting no contender can be mid-acquire — so the model
  lowers its high-water mark to the surviving live generation (or 0)
  after each such prune; hypothesis originally FOUND this: the machine
  with an unconditional monotonicity invariant produces
  acquire→release→prune(0)→acquire issuing g1 after g3, which is
  correct per the grace contract and is why prune_dead_sidecars
  defaults grace_s to a full writer TTL.

TTL expiry is simulated by rewriting the live payload's ``expires``
into the past (equivalent to clock passage; generation files are
created-once in the real protocol, so the rewrite stands in for time,
not for any real writer behavior). Both backends run the same machine:
the local O_EXCL-link one and the boto3 conditional-PUT one under moto
— the protocol's guarantees must not depend on which primitive
arbitrates. Sequential by design: concurrency is the hand-written
contention tests' job; orderings are hypothesis's.
"""

from __future__ import annotations

import json
import time

import pytest
from hypothesis import settings
from hypothesis.stateful import (
    RuleBasedStateMachine,
    invariant,
    precondition,
    rule,
)

from weather_etl_pipeline_spark.sources import lease_s3
from weather_etl_pipeline_spark.sources.lease import (
    LeaseHeldError,
    LeaseLostError,
    acquire_lease,
    fence_for,
    lease_is_live,
    lease_path_for,
    prune_dead_sidecars,
    release_lease,
)

TTL = 3600.0  # effectively forever — expiry only happens via force_expire


class _LeaseMachine(RuleBasedStateMachine):
    """Backend-agnostic machine; subclasses provide resource() and
    overwrite_payload(). Model state: the currently-live token (or
    None), the set of dead tokens (released/expired), and the highest
    generation ever issued."""

    def __init__(self):
        super().__init__()
        self.res = self.resource()
        self.live: str | None = None
        self.dead: list[str] = []
        self.max_gen = 0

    # -- backend hooks -----------------------------------------------
    def resource(self) -> str:  # pragma: no cover - abstract
        raise NotImplementedError

    def overwrite_payload(self, path: str, payload: bytes) -> None:
        raise NotImplementedError  # pragma: no cover - abstract

    # -- rules ---------------------------------------------------------
    @rule()
    def acquire(self):
        try:
            tok = acquire_lease(None, self.res, ttl_s=TTL)
        except LeaseHeldError:
            # refusal is legal ONLY while the model has a live holder
            assert self.live is not None
            return
        assert self.live is None, "second live holder issued"
        gen = int(tok.split(":")[0])
        assert gen > self.max_gen, (
            f"generation regressed: issued {gen}, high-water {self.max_gen}"
        )
        self.max_gen = gen
        self.live = tok

    @precondition(lambda self: self.live is not None)
    @rule()
    def release(self):
        assert release_lease(None, self.res, self.live) is True
        self.dead.append(self.live)
        self.live = None

    @precondition(lambda self: self.live is not None)
    @rule()
    def crash_holder(self):
        """Holder vanishes without release; its generation file stays
        live until TTL — here immediately forced stale, the state a
        crashed writer leaves after its TTL lapses."""
        tok = self.live
        gen = int(tok.split(":")[0])
        payload = json.dumps(
            {
                "token": tok.split(":", 1)[1],
                "owner": "crashed",
                "acquired": 0.0,
                "expires": 1.0,  # long past
            }
        ).encode()
        self.overwrite_payload(lease_path_for(self.res, gen), payload)
        self.dead.append(tok)
        self.live = None

    @precondition(lambda self: self.dead)
    @rule()
    def stale_release_refused(self):
        """A dead token's deferred release must refuse and must not
        disturb whatever is live now."""
        assert release_lease(None, self.res, self.dead[-1]) is False

    @rule()
    def prune_zero_grace(self):
        prune_dead_sidecars(None, self.res, grace_s=0.0)
        # grace 0 may sweep every dead generation AND tombstone —
        # whether a same-instant tombstone survives is mtime-timing
        # dependent, so the model keeps only the guaranteed floor: the
        # live generation (never prunable) or a full reset. The
        # single_holder invariant below is what must hold regardless.
        self.max_gen = int(self.live.split(":")[0]) if self.live else 0

    @precondition(lambda self: self.dead)
    @rule()
    def dead_fence_raises(self):
        with pytest.raises(LeaseLostError):
            fence_for(None, self.res, self.dead[-1])()

    # -- invariants ----------------------------------------------------
    @invariant()
    def single_holder(self):
        if self.live is not None:
            assert lease_is_live(None, self.res, self.live)
        for tok in self.dead:
            assert not lease_is_live(None, self.res, tok)

    @invariant()
    def no_foreign_live_generation(self):
        """Nothing on storage is live except the model's holder: a
        fresh probe acquire must succeed iff the model says free. The
        probe itself then releases to keep the state aligned (its own
        acquire/release legality is asserted like any other)."""
        if self.live is None:
            tok = acquire_lease(None, self.res, ttl_s=TTL)
            gen = int(tok.split(":")[0])
            assert gen > self.max_gen
            self.max_gen = gen
            assert release_lease(None, self.res, tok) is True
            self.dead.append(tok)


_SETTINGS = settings(
    max_examples=40, stateful_step_count=30, deadline=None
)


class LocalLeaseMachine(_LeaseMachine):
    def resource(self) -> str:
        import tempfile

        self._dir = tempfile.mkdtemp(prefix="lease_model_")
        return f"{self._dir}/store"

    def overwrite_payload(self, path: str, payload: bytes) -> None:
        with open(path, "wb") as f:
            f.write(payload)


TestLocalLeaseModel = LocalLeaseMachine.TestCase
TestLocalLeaseModel.settings = _SETTINGS


moto = pytest.importorskip("moto", reason="moto not installed (env gate)")
boto3 = pytest.importorskip("boto3", reason="boto3 not installed (env gate)")

_BUCKET = "lease-model-bucket"


class S3LeaseMachine(_LeaseMachine):
    def __init__(self):
        self._mock = moto.mock_aws()
        self._mock.start()
        self._client = boto3.client("s3", region_name="us-east-1")
        self._client.create_bucket(Bucket=_BUCKET)
        lease_s3.set_client(self._client)
        self._n = int(time.time() * 1e6) % 10**9
        super().__init__()

    def resource(self) -> str:
        return f"s3://{_BUCKET}/stores/store_{self._n}"

    def overwrite_payload(self, path: str, payload: bytes) -> None:
        bucket, key = lease_s3.parse_s3(path)
        self._client.put_object(Bucket=bucket, Key=key, Body=payload)

    def teardown(self):
        lease_s3.set_client(None)
        self._mock.stop()


TestS3LeaseModel = S3LeaseMachine.TestCase
TestS3LeaseModel.settings = _SETTINGS
# ~1 min of moto round trips per machine: nightly profile; the local
# machine keeps the protocol model in the default run (round 15)
TestS3LeaseModel.pytestmark = [pytest.mark.slow]


# --- two-actor machine (round 14) -------------------------------------------
# The single-actor machine explores orderings of ONE writer's lifecycle
# against storage; this one interleaves TWO named actors — and, via
# ``contended_acquire``, drives the protocol through the one window a
# sequential machine cannot otherwise reach: another contender's acquire
# landing BETWEEN this actor's free listing and its create. That window
# is exactly where the backend's create-if-absent arbitration (O_EXCL
# link / conditional PUT + 409 resolution) is load-bearing; the seeded-
# bug test below proves the machine fails when that arbitration is
# widened to claim victory on a lost create.

import hypothesis.strategies as st
from hypothesis.stateful import run_state_machine_as_test

_ACTORS = ("A", "B")


class _TwoActorMachine(RuleBasedStateMachine):
    """Backend hooks: resource(), overwrite_payload(), and
    create_hook() -> (module, attr) naming the backend's create-if-
    absent primitive (patched by contended_acquire to interpose the
    other actor inside the list→create window)."""

    def __init__(self):
        super().__init__()
        self.res = self.resource()
        self.held: dict[str, str] = {}  # actor -> live token
        self.fences: dict = {}  # actor -> fence closure for that token
        self.dead: list[tuple[str, object]] = []  # (token, its fence)
        self.max_gen = 0

    # -- backend hooks -------------------------------------------------
    def resource(self) -> str:  # pragma: no cover - abstract
        raise NotImplementedError

    def overwrite_payload(self, path: str, payload: bytes) -> None:
        raise NotImplementedError  # pragma: no cover - abstract

    def create_hook(self):  # pragma: no cover - abstract
        raise NotImplementedError

    # -- helpers -------------------------------------------------------
    def _admit(self, actor: str, tok: str) -> None:
        gen = int(tok.split(":")[0])
        assert gen > self.max_gen, (
            f"generation regressed: issued {gen}, high-water {self.max_gen}"
        )
        self.max_gen = gen
        self.held[actor] = tok
        self.fences[actor] = fence_for(None, self.res, tok)

    def _retire(self, actor: str) -> None:
        self.dead.append((self.held.pop(actor), self.fences.pop(actor)))

    # -- rules ---------------------------------------------------------
    @rule(actor=st.sampled_from(_ACTORS))
    def acquire(self, actor):
        try:
            tok = acquire_lease(None, self.res, owner=actor, ttl_s=TTL)
        except LeaseHeldError:
            # refusal is legal ONLY while someone (either actor) holds
            assert self.held, "refused with no live holder"
            return
        assert not self.held, "second live holder issued"
        self._admit(actor, tok)

    @rule(actor=st.sampled_from(_ACTORS))
    def contended_acquire(self, actor):
        """The race window: the OTHER actor's acquire lands between
        this actor's free listing and its create. Correct protocol —
        the interloper's create wins the never-used generation name,
        this actor's create loses, its retry reads the fresh live
        lease, and it raises LeaseHeldError. (When a holder already
        exists the outer acquire refuses at the listing and the
        interposer never fires — also a legal refusal.)"""
        other = "B" if actor == "A" else "A"
        mod, name = self.create_hook()
        real = getattr(mod, name)
        fired = []

        def interpose(path, payload):
            if not fired:
                fired.append(True)
                tok = acquire_lease(None, self.res, owner=other, ttl_s=TTL)
                assert not self.held, "interloper won under a live holder"
                self._admit(other, tok)
            return real(path, payload)

        setattr(mod, name, interpose)
        try:
            with pytest.raises(LeaseHeldError):
                acquire_lease(None, self.res, owner=actor, ttl_s=TTL)
        finally:
            setattr(mod, name, real)

    @precondition(lambda self: self.held)
    @rule()
    def release(self):
        actor = sorted(self.held)[0]
        assert release_lease(None, self.res, self.held[actor]) is True
        self._retire(actor)

    @precondition(lambda self: self.held)
    @rule()
    def crash_holder(self):
        actor = sorted(self.held)[0]
        tok = self.held[actor]
        gen = int(tok.split(":")[0])
        payload = json.dumps(
            {
                "token": tok.split(":", 1)[1],
                "owner": "crashed",
                "acquired": 0.0,
                "expires": 1.0,
            }
        ).encode()
        self.overwrite_payload(lease_path_for(self.res, gen), payload)
        self._retire(actor)

    @precondition(lambda self: self.held)
    @rule()
    def fence_live_passes(self):
        """A live holder's fence must be a no-op — the streaming
        mutators call it before every commit write."""
        actor = sorted(self.held)[0]
        self.fences[actor]()

    @precondition(lambda self: self.dead)
    @rule()
    def stale_release_refused(self):
        assert release_lease(None, self.res, self.dead[-1][0]) is False

    @precondition(lambda self: self.dead)
    @rule()
    def dead_fence_raises(self):
        with pytest.raises(LeaseLostError):
            self.dead[-1][1]()

    @rule()
    def prune_zero_grace(self):
        prune_dead_sidecars(None, self.res, grace_s=0.0)
        self.max_gen = (
            int(next(iter(self.held.values())).split(":")[0])
            if self.held
            else 0
        )

    # -- invariants ----------------------------------------------------
    @invariant()
    def single_holder(self):
        assert len(self.held) <= 1, "two live holders in the model"
        for tok in self.held.values():
            assert lease_is_live(None, self.res, tok)
        for tok, _ in self.dead:
            assert not lease_is_live(None, self.res, tok)

    @invariant()
    def no_foreign_live_generation(self):
        if not self.held:
            tok = acquire_lease(None, self.res, ttl_s=TTL)
            gen = int(tok.split(":")[0])
            assert gen > self.max_gen
            self.max_gen = gen
            assert release_lease(None, self.res, tok) is True
            self.dead.append((tok, fence_for(None, self.res, tok)))


class LocalTwoActorMachine(_TwoActorMachine):
    def resource(self) -> str:
        import tempfile

        self._dir = tempfile.mkdtemp(prefix="lease_model2_")
        return f"{self._dir}/store"

    def overwrite_payload(self, path: str, payload: bytes) -> None:
        with open(path, "wb") as f:
            f.write(payload)

    def create_hook(self):
        from weather_etl_pipeline_spark.sources import lease as lease_mod

        return lease_mod, "_local_try_create"


TestLocalTwoActorModel = LocalTwoActorMachine.TestCase
TestLocalTwoActorModel.settings = _SETTINGS


class S3TwoActorMachine(_TwoActorMachine):
    def __init__(self):
        self._mock = moto.mock_aws()
        self._mock.start()
        self._client = boto3.client("s3", region_name="us-east-1")
        self._client.create_bucket(Bucket=_BUCKET)
        lease_s3.set_client(self._client)
        self._n = int(time.time() * 1e6) % 10**9
        super().__init__()

    def resource(self) -> str:
        return f"s3://{_BUCKET}/stores/store2_{self._n}"

    def overwrite_payload(self, path: str, payload: bytes) -> None:
        bucket, key = lease_s3.parse_s3(path)
        self._client.put_object(Bucket=bucket, Key=key, Body=payload)

    def create_hook(self):
        return lease_s3, "try_create"

    def teardown(self):
        lease_s3.set_client(None)
        self._mock.stop()


TestS3TwoActorModel = S3TwoActorMachine.TestCase
TestS3TwoActorModel.settings = _SETTINGS
TestS3TwoActorModel.pytestmark = [pytest.mark.slow]


@pytest.mark.parametrize(
    "machine",
    ["local", pytest.param("s3", marks=pytest.mark.slow)],
)
def test_two_actor_machine_has_teeth(machine, monkeypatch):
    """Seed the mutual-exclusion bug the arbitration exists to prevent
    — a create-if-absent that claims victory even when the name
    already existed (the 'widened 409 victory claim' shape: resolving
    a conflict reply as ours without the payload check) — and prove
    the two-actor machine FAILS on it. Without this, a green model run
    proves only that the model never reached the race window."""
    cls = LocalTwoActorMachine if machine == "local" else S3TwoActorMachine
    probe = cls()
    try:
        mod, name = probe.create_hook()
    finally:
        if hasattr(probe, "teardown"):
            probe.teardown()
    real = getattr(mod, name)

    def widened_victory(path, payload):
        real(path, payload)  # may lose — claim victory regardless
        return True

    monkeypatch.setattr(mod, name, widened_victory)
    with pytest.raises((AssertionError, pytest.fail.Exception)):
        run_state_machine_as_test(
            cls,
            settings=settings(
                max_examples=60, stateful_step_count=20, deadline=None
            ),
        )
