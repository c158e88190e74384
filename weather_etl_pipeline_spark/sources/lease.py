"""Single-writer lease for the store / metadata swap family.

The swap-family writers (``plans/metadata._atomic_overwrite``, the
signature/IVF store appends, ``optimize_table``'s directory swap) are
crash-safe and DETECT concurrent-writer interference loudly — checked
renames, orphan-refusal scans — but they do not PREVENT it. On
rename-atomic filesystems (local, HDFS) a lost race surfaces as a
clean IOError; on object stores (S3A), where rename is copy+delete,
two interleaved writers can tear state that only the next append's
orphan scan notices. This module is the prevention half: a TTL lease
that makes "two writers mutate the same store" impossible to start,
instead of merely guaranteed-to-be-caught.

Reference parity: the reference pipeline (ingestion.py:7-45 →
gold.py:13-125) is a single cron-sequenced writer and needs no lock;
this engine's streaming curation service admits concurrent deploys,
so the single-writer assumption the reference gets from cron must be
enforced by the engine itself.

Design: monotonic lease GENERATIONS
-----------------------------------
A lease is a file ``<resource>.__lease.g<N>`` — a SIBLING of the
resource (deliberately outside the resource directory, so the
metadata swap's dir-rename-aside and ``optimize_table``'s sidecar
copy never move, copy, or delete it mid-hold). The live lease is the
one with the HIGHEST generation; acquiring means atomically creating
generation ``max+1`` with create-if-absent:

- current max generation live (not past its ``expires``) →
  :class:`LeaseHeldError`;
- current max stale, torn, or absent → try to create gen ``max+1``.
  Exactly one contender's create succeeds; losers re-read the fresh
  lease and fail with LeaseHeldError.

The crucial property: arbitration is ONLY ever an atomic
create-if-absent of a fresh, never-reclaimed name. There is no
delete-then-recreate of a contended name and no rename of a file
whose content may have changed since it was read — the ABA interleave
that breaks naive sideline/replace lock-file protocols (a breaker
holding a stale read renames away the lease a faster breaker just
re-created) cannot be expressed here at all. Superseded generations
are garbage, deleted best-effort by the new holder; they are never
consulted once a higher generation exists, so their deletion races
nothing. Release leaves a TOMBSTONE (rename to ``.__lease.r<N>_…``)
rather than deleting, so the numeric high-water mark survives and
generation numbers never regress — a plain delete would let numbering
reset and a contender holding a stale read re-create a released name
while a fresh g1 holder exists. Tombstones (and crash-orphaned
payload temps) are swept by later acquirers once older than the TTL.

- The payload is one JSON object ``{token, owner, acquired,
  expires}``; wall-clock epoch seconds. The TTL therefore assumes
  writer clocks agree to well within ``ttl_s`` — pick (longest
  expected write) + (max plausible clock skew), not a tight bound. A
  skewed clock can at worst break a live-but-expired-looking lease,
  the standard TTL-lease failure mode; the swap family's checked
  renames and orphan refusals remain the backstop for that case.
- An EMPTY or unparseable lease file is stale immediately: the holder
  only proceeds after its write+close succeeded, so a torn payload
  proves the would-be holder never started writing.
- ``release_lease`` deletes only the caller's own generation after
  verifying the on-disk token — after a crash, TTL expiry, and a
  takeover, the original holder's deferred release is a no-op on the
  new holder's higher generation.

Atomic create-if-absent: local paths (scheme "" or ``file:``) use
``os.open(O_CREAT|O_EXCL)`` — kernel-atomic, covering every
environment this repo actually runs in. ``s3/s3a/s3n`` URLs use the
boto3 conditional-PUT backend (:mod:`.lease_s3`) when boto3 is
importable: ``put_object(IfNoneMatch="*")`` publishes name AND
payload in one atomic call, which CLOSES the object-store race
outright (release's tombstone rename becomes copy + If-Match delete
there). Remaining schemes go through Hadoop's
``FileSystem.create(path, overwrite=false)``: atomic on HDFS/ABFS;
on S3A-without-boto3 best-effort (a HEAD-then-PUT emulation), so
there the lease narrows the unguarded window from "the whole write"
to one create call rather than closing it. The orphan-refusal scans
stay on regardless, exactly as before.
"""

from __future__ import annotations

import json
import logging
import os
import time
import uuid
from contextlib import contextmanager
from urllib.parse import urlparse

from pyspark.sql import SparkSession

_LOG = logging.getLogger(__name__)

DEFAULT_TTL_S = 900.0
# schemes whose FileSystem.rename refuses an existing destination
# (atomic arbitration): the double-winner confirmation read is skipped
# there. Anything NOT listed gets the defensive jittered re-read.
_ATOMIC_NOCLOBBER_RENAME_SCHEMES = frozenset({"hdfs", "abfs", "abfss"})
# one stem, two sidecar kinds: the S3 backend lists BOTH in one
# shared-prefix call, so the g/r separators MUST stay single-character
# suffixes of the same stem — derive, never restate (a divergent edit
# would drop tombstones from that listing and regress max_ever,
# reopening the generation-reuse ABA the tombstones exist to prevent)
_LEASE_STEM = ".__lease."
_GEN_SEP = _LEASE_STEM + "g"
_TOMB_SEP = _LEASE_STEM + "r"  # released-generation tombstone (see _list_gens)


class LeaseHeldError(RuntimeError):
    """Another writer holds a live lease on the resource."""

    def __init__(self, resource: str, owner: str, expires: float):
        self.resource = resource
        self.owner = owner
        self.expires = expires
        super().__init__(
            f"lease on {resource} held by {owner!r} "
            f"(expires in {max(0.0, expires - time.time()):.1f}s); "
            "a second writer must wait for release or TTL expiry"
        )


class LeaseLostError(RuntimeError):
    """The caller's lease expired or was superseded mid-mutation.

    Raised by a :func:`fence_for` check placed immediately before a
    commit-point write: past this point the write would land unfenced
    while a successor may already be mutating, so the mutation must
    abort instead — its own crash-consistency story (intent journal /
    checked rename / orphan refusal) then treats the abort exactly
    like a crash before commit."""

    def __init__(self, resource: str, token: str):
        self.resource = resource
        self.token = token
        super().__init__(
            f"lease {token!r} on {resource} expired or was superseded "
            "mid-mutation; aborting before the commit-point write "
            "(raise ttl_s above the worst-case guarded operation)"
        )


def _parse_token(token: str) -> tuple[int, str] | None:
    """(generation, uuid) from a ``gen:uuid`` lease token, None if
    malformed — shared by release_lease and lease_is_live so the token
    grammar lives in one place."""
    try:
        gen_s, my_uuid = token.split(":", 1)
        return int(gen_s), my_uuid
    except ValueError:
        return None


def lease_path_for(resource: str, gen: int) -> str:
    """Sibling lease-file path for ``resource`` at generation ``gen``."""
    return f"{resource.rstrip('/')}{_GEN_SEP}{gen:020d}"


def _local_path(path: str) -> str | None:
    """OS path if ``path`` is local (scheme '' or file:), else None."""
    parsed = urlparse(path)
    if parsed.scheme in ("", "file"):
        return parsed.path or path
    return None


def _split_parent(resource: str) -> tuple[str, str]:
    r = resource.rstrip("/")
    i = r.rfind("/")
    return (r[:i] if i > 0 else "/", r[i + 1 :])


# ---------------------------------------------------------------- local impl


def _local_try_create(path: str, payload: bytes) -> bool:
    """Atomic create-if-absent WITH CONTENT: write a private temp,
    ``os.link`` it into place (fails if the target exists), unlink the
    temp. A bare O_CREAT|O_EXCL + write is NOT enough — a reader can
    observe the empty file between the two syscalls, parse it as a
    torn (stale) lease, and supersede a live holder; the contention
    test caught exactly that. link() publishes name and payload in
    one atomic step. Filesystems without hardlinks (FAT, some network
    mounts) fall back to O_EXCL with a single write — a microscopic
    residual window, flagged here rather than hidden."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{os.path.dirname(path)}/.{os.path.basename(path)}.tmp_{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
        return True
    except FileExistsError:
        return False
    except OSError:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            os.write(fd, payload)
            os.fsync(fd)
        finally:
            os.close(fd)
        return True
    finally:
        _local_delete(tmp)


def _local_read(path: str) -> bytes | None:
    try:
        with open(path, "rb") as f:
            return f.read()
    except FileNotFoundError:
        return None


def _local_list(parent: str, prefix: str) -> list[str]:
    try:
        return [n for n in os.listdir(parent) if n.startswith(prefix)]
    except FileNotFoundError:
        return []


def _local_delete(path: str) -> None:
    try:
        os.remove(path)
    except FileNotFoundError:
        pass


# --------------------------------------------------------------- hadoop impl


def _hadoop_try_create(spark: SparkSession, path: str, payload: bytes) -> bool:
    """Atomic create-if-absent WITH CONTENT for Hadoop schemes: write
    the payload to a private temp sibling, then rename it to the
    target. On HDFS rename refuses (returns false) when the
    destination exists, so name and payload publish in one atomic
    step — the same no-torn-window property the local impl gets from
    os.link. A direct create(path, overwrite=false) + write would
    expose an empty target mid-create, which a concurrent reader
    would break as a torn lease.

    Two schemes need extra care: RawLocalFileSystem's rename maps to
    POSIX rename(2), which silently OVERWRITES an existing target,
    and S3A's rename is copy+delete. For both, the exists pre-check
    plus a post-rename read-back (did OUR payload survive?) shrink
    the race to a near-simultaneous double-rename; on HDFS/ABFS the
    rename itself is the arbiter and the read-back merely confirms.

    Residual double-winner window on overwrite-rename schemes: A
    renames and passes its read-back BEFORE B's overwriting rename
    lands, then B's read-back also matches — both return True. The
    jittered SECOND read-back below catches any overwrite that lands
    within the jitter (the common near-simultaneous case); an
    overwrite slower than the jitter remains possible on those
    schemes only, which is why the orphan-refusal detection layer
    stays on as the backstop and the 'exactly one holder' invariant
    is documented as scheme-dependent (COVERAGE.md)."""
    from .fs import _fs_and_path, delete, path_exists, rename

    parent, base = _split_parent(path)
    tmp = f"{parent}/.{base}.tmp_{uuid.uuid4().hex[:8]}"
    fs, htmp = _fs_and_path(spark, tmp)
    out = fs.create(htmp, False)
    try:
        out.write(bytearray(payload))
    finally:
        out.close()
    if path_exists(spark, path) or not rename(spark, tmp, path):
        delete(spark, tmp)
        return False

    def _confirm() -> bool:
        """Did OUR payload survive at ``path``? A None read-back
        (FileNotFoundException) on a file we JUST renamed into place is
        either a transient listing/metadata fault or an out-of-band
        delete — retry once, and on persistent None DELETE the path
        before reporting loss: otherwise the actual winner returns
        False with its lease file live, and the resource is fenced for
        a full TTL with nobody holding the token (the exact failure
        acquire-hygiene exists to prevent). The delete can race a
        contender whose overwriting rename lands between our two
        failed reads — residual only on overwrite-rename schemes,
        where the orphan-refusal detection layer stays on as the
        documented backstop. A non-None mismatch means a contender's
        rename genuinely overwrote us: their live lease, touch
        nothing."""
        back = _hadoop_read(spark, path)
        if back is None:
            time.sleep(0.05)
            back = _hadoop_read(spark, path)
        if back is None:
            delete(spark, path)
            return False
        return back == payload

    if not _confirm():
        return False
    # second confirmation read after a short jitter, only on schemes
    # whose rename can OVERWRITE an existing destination (local FS,
    # S3A's copy+delete, GCS, anything unknown): it demotes a
    # near-simultaneous double winner (B's rename landing just after
    # A's first read-back) to a loss for A, so at most one contender's
    # create returns True. HDFS/ABFS rename refuses an existing
    # destination — the rename itself arbitrated, so they skip the
    # 50ms jitter that would otherwise tax every lease cycle.
    if urlparse(path).scheme.lower() in _ATOMIC_NOCLOBBER_RENAME_SCHEMES:
        return True
    time.sleep(0.05)
    return _confirm()


def _hadoop_read(spark: SparkSession, path: str) -> bytes | None:
    from py4j.protocol import Py4JJavaError

    from .fs import _fs_and_path

    fs, hpath = _fs_and_path(spark, path)
    try:
        stream = fs.open(hpath)
    except Py4JJavaError as e:
        if "FileNotFoundException" in str(e.java_exception.getClass().getName()):
            return None
        raise
    try:
        # commons-io ships on Spark's classpath; byte-at-a-time
        # fallback keeps this working if a distro ever strips it
        try:
            jvm = spark._jvm
            data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            return bytes(data)
        except Exception:
            buf = bytearray()
            b = stream.read()
            while b != -1:
                buf.append(b)
                b = stream.read()
            return bytes(buf)
    finally:
        stream.close()


# ------------------------------------------------------------------- the API


def _impl_local(lease_like_path: str, _impl: str) -> str | None:
    return _local_path(lease_like_path) if _impl != "hadoop" else None


def _impl_s3(lease_like_path: str, _impl: str) -> bool:
    """True iff ``path`` should use the boto3 conditional-request
    backend: an s3/s3a/s3n URL with boto3 importable (or forced via
    ``_impl="s3"``). ``_impl="hadoop"`` forces the Hadoop emulation
    even on S3 URLs — the documented HEAD-then-PUT narrowing — for
    environments where the S3A connector is configured but boto3's
    credential chain is not."""
    if _impl == "hadoop":
        return False
    from . import lease_s3

    scheme = urlparse(lease_like_path).scheme.lower()
    if scheme not in lease_s3.S3_SCHEMES:
        return False
    return _impl == "s3" or lease_s3.available()


def _list_gens(
    spark: SparkSession, resource: str, _impl: str
) -> tuple[list[int], int, list[tuple[str, float]] | None]:
    """(sorted live generations, max generation number EVER observed —
    live or released-tombstone, tombstone (name, mtime) listing on the
    S3 backend else None — the shared-stem LIST already paid for the
    mtimes, so acquire's hygiene sweep reuses them instead of
    re-LISTing the same prefix). The tombstone max is what makes
    generation numbers monotonic across release: if release simply
    deleted its file, a contender holding a stale read could create a
    just-released generation name while a third writer holds a fresh
    g1 after the numbering reset — two holders. Tombstones keep the
    high-water mark visible, so a released name is never re-targeted
    (reuse now requires a TTL-scale stall across the tombstone sweep,
    the same exposure class as every other TTL assumption here)."""
    parent, base = _split_parent(resource)
    prefix = base + _GEN_SEP
    tomb_prefix = base + _TOMB_SEP
    local_parent = _impl_local(parent, _impl)
    tomb_listing: list[tuple[str, float]] | None = None
    if local_parent is not None:
        names = _local_list(local_parent, prefix) + _local_list(
            local_parent, tomb_prefix
        )
    elif _impl_s3(parent, _impl):
        from . import lease_s3

        # g- and r-sidecars share the lease stem: ONE LIST call on the
        # acquire hot path, partitioned client-side (the startswith
        # filters below drop anything else under the stem); tombstone
        # mtimes ride along for acquire's sweep — they never change
        # after creation, so reuse is exact, not merely best-effort
        shared = lease_s3.list_with_mtime(parent, base + _LEASE_STEM)
        names = [
            n
            for n, _ in shared
            if n.startswith(prefix) or n.startswith(tomb_prefix)
        ]
        tomb_listing = [
            (n, m) for n, m in shared if n.startswith(tomb_prefix)
        ]
    else:
        from .fs import list_dir

        names = [
            n
            for n in list_dir(spark, parent)
            if n.startswith(prefix) or n.startswith(tomb_prefix)
        ]
    gens, max_ever = [], 0
    for n in names:
        try:
            if n.startswith(tomb_prefix):
                max_ever = max(max_ever, int(n[len(tomb_prefix) :].split("_")[0]))
            else:
                g = int(n[len(prefix) :])
                gens.append(g)
                max_ever = max(max_ever, g)
        except ValueError:
            continue  # foreign file that happens to share the prefix
    return sorted(gens), max_ever, tomb_listing


def _read_payload(
    spark: SparkSession, resource: str, gen: int, _impl: str
) -> dict | None:
    """Parsed payload of generation ``gen``, or None if the file is
    gone. A present but empty/corrupt file parses as immediately
    stale, per the torn-create argument in the module docstring."""
    path = lease_path_for(resource, gen)
    local = _impl_local(path, _impl)
    if local is not None:
        raw = _local_read(local)
    elif _impl_s3(path, _impl):
        from . import lease_s3

        raw = lease_s3.read(path)
    else:
        raw = _hadoop_read(spark, path)
    if raw is None:
        return None
    try:
        d = json.loads(raw.decode("utf-8"))
        if not isinstance(d, dict) or "expires" not in d:
            raise ValueError
        return d
    except (ValueError, UnicodeDecodeError):
        return {"token": None, "owner": "<torn>", "expires": 0.0}


def _sweep_stale_sidecars(
    spark: SparkSession,
    resource: str,
    older_than_s: float,
    _impl: str,
    _tomb_listing: list[tuple[str, float]] | None = None,
) -> None:
    """Best-effort removal of crash-orphaned payload temps
    (``.{base}.__lease.g*.tmp_*``) and aged release tombstones
    (``{base}.__lease.r*``). Only files older than the TTL are
    touched: an in-flight contender's temp is at most seconds old, and
    a tombstone younger than the TTL may still be the high-water mark
    a stalled contender needs to avoid generation reuse — past one
    TTL both are dead weight (a contender stalled across a whole TTL
    is already outside the hold guarantee, like every other TTL
    assumption here)."""
    parent, base = _split_parent(resource)
    tmp_prefix = f".{base}{_GEN_SEP}"
    tomb_prefix = f"{base}{_TOMB_SEP}"
    cutoff = time.time() - older_than_s

    def _is_sidecar(n: str) -> bool:
        return (n.startswith(tmp_prefix) and ".tmp_" in n) or n.startswith(
            tomb_prefix
        )

    local_parent = _impl_local(parent, _impl)
    try:
        if local_parent is not None:
            for n in _local_list(local_parent, tmp_prefix) + _local_list(
                local_parent, tomb_prefix
            ):
                if not _is_sidecar(n):
                    continue
                p = f"{local_parent}/{n}"
                try:
                    if os.stat(p).st_mtime < cutoff:
                        _local_delete(p)
                except FileNotFoundError:
                    pass
        elif _impl_s3(parent, _impl):
            # the conditional-PUT create writes no payload temps of its
            # own, but the bucket may hold temps stranded by the Hadoop
            # fallback (pre-boto3 deployments, forced _impl="hadoop")
            # — sweep both kinds, like the other backends. Tombstones:
            # acquire passes the (name, mtime) pairs its shared-stem
            # _list_gens LIST already fetched (exact reuse — tombstone
            # mtimes never change after creation), so only the
            # dot-prefixed temp stem needs its own LIST here.
            from . import lease_s3

            tombs = (
                _tomb_listing
                if _tomb_listing is not None
                else lease_s3.list_with_mtime(parent, tomb_prefix)
            )
            for n, mtime in lease_s3.list_with_mtime(parent, tmp_prefix) + tombs:
                if _is_sidecar(n) and mtime < cutoff:
                    lease_s3.delete(f"{parent}/{n}")
        else:
            from .fs import _fs_and_path, delete

            fs, hparent = _fs_and_path(spark, parent)
            if not fs.exists(hparent):
                return
            for st in fs.listStatus(hparent):
                n = st.getPath().getName()
                if _is_sidecar(n) and st.getModificationTime() / 1000.0 < cutoff:
                    delete(spark, f"{parent}/{n}")
    except Exception:
        # hygiene only — never let a sweep fault fail an acquire. The
        # guard is deliberately broad: the local path raises OSError,
        # but the Hadoop path (exists → listStatus → delete via py4j)
        # raises Py4JJavaError, and a transient FS fault here escaping
        # AFTER the new lease file was created would make acquire_lease
        # raise while a live lease exists with no token in any caller's
        # hands — the resource would be fenced for the full TTL.
        pass


def _delete_gen(spark: SparkSession, resource: str, gen: int, _impl: str) -> None:
    path = lease_path_for(resource, gen)
    local = _impl_local(path, _impl)
    if local is not None:
        _local_delete(local)
    elif _impl_s3(path, _impl):
        from . import lease_s3

        lease_s3.delete(path)
    else:
        from .fs import delete

        delete(spark, path)


def acquire_lease(
    spark: SparkSession,
    resource: str,
    owner: str | None = None,
    ttl_s: float = DEFAULT_TTL_S,
    _impl: str = "auto",
) -> str:
    """Acquire the single-writer lease on ``resource``; returns the
    lease token to pass to :func:`release_lease`. Raises
    :class:`LeaseHeldError` (fail-fast, no blocking — Structured
    Streaming's retry IS the wait loop) if a live lease exists.

    Bounded retries: a create that loses means another contender just
    acquired the very generation we targeted, so the next iteration
    reads a fresh live lease and raises LeaseHeldError; repeated
    looping beyond that requires a sustained release storm and ends
    in a loud error, never a silent spin.
    """
    if ttl_s <= 0:
        raise ValueError(f"ttl_s must be positive, got {ttl_s}")
    my_uuid = uuid.uuid4().hex

    for _ in range(8):
        gens, max_ever, tombs = _list_gens(spark, resource, _impl)
        if gens:
            cur = _read_payload(spark, resource, gens[-1], _impl)
            if cur is not None and time.time() < float(cur["expires"]):
                raise LeaseHeldError(
                    resource, str(cur.get("owner")), float(cur["expires"])
                )
        # supersede whatever came before — stale, torn, vanished-since-
        # listing, or released. Targeting past max_ever (tombstones
        # included) is what keeps generation numbers monotonic, so
        # every arbitration is a create of a NEVER-used name.
        target = max_ever + 1
        payload = json.dumps(
            {
                "token": my_uuid,
                "owner": owner or f"pid-{os.getpid()}",
                "acquired": time.time(),
                "expires": time.time() + float(ttl_s),
            }
        ).encode("utf-8")
        path = lease_path_for(resource, target)
        local = _impl_local(path, _impl)
        if local is not None:
            created = _local_try_create(local, payload)
        elif _impl_s3(path, _impl):
            from . import lease_s3

            created = lease_s3.try_create(path, payload)
        else:
            created = _hadoop_try_create(spark, path, payload)
        if created:
            # EVERYTHING after a successful create is best-effort
            # hygiene: once the lease file exists, nothing may prevent
            # returning the token — a raise here would fence the
            # resource for the full TTL with no holder able to release.
            try:
                # superseded generations are garbage from the moment a
                # higher one exists; cleanup races nothing
                for g in gens:
                    _delete_gen(spark, resource, g, _impl)
                # sweep age uses the LONGEST plausible TTL, not this
                # writer's: a short-TTL streaming appender must not
                # sweep a tombstone that is still the high-water mark
                # for a long-TTL maintenance writer stalled mid-acquire
                _sweep_stale_sidecars(
                    spark,
                    resource,
                    max(float(ttl_s), DEFAULT_TTL_S),
                    _impl,
                    _tomb_listing=tombs,
                )
            except Exception:
                pass  # same rationale as the sweep's own guard
            return f"{target}:{my_uuid}"
    raise LeaseHeldError(resource, "<unresolved contention>", time.time())


def release_lease(
    spark: SparkSession, resource: str, token: str, _impl: str = "auto"
) -> bool:
    """Release iff our generation's file still carries our token AND
    the lease is still live. False (and no deletion) when the lease
    was superseded after TTL expiry — the new holder's generation must
    survive — and ALSO when our own lease has expired but not yet been
    superseded: past the TTL a successor may be mid-takeover, and the
    hold guarantee (like every TTL lease's) ends at ``expires``, so an
    overstaying holder must touch nothing and let the breaker sweep
    the stale file.

    Release RENAMES the generation file to a tombstone
    (``.__lease.r<N>_<uuid>``) rather than deleting it: the numeric
    trace must survive so the next acquirer targets a HIGHER
    generation — deletion would let numbering reset and a contender
    holding a stale read re-create the released name (see _list_gens).
    Tombstones are swept by the next acquirer once older than its TTL."""
    parsed = _parse_token(token)
    if parsed is None:
        return False
    gen, _ = parsed
    # the refusal conditions (gone / foreign token / past TTL) are
    # exactly the liveness rule — one definition, one payload read
    if not lease_is_live(spark, resource, token, _impl=_impl):
        return False
    src = lease_path_for(resource, gen)
    dst = f"{resource.rstrip('/')}{_TOMB_SEP}{gen:020d}_{uuid.uuid4().hex[:8]}"
    local = _impl_local(src, _impl)
    if local is not None:
        try:
            os.rename(local, _impl_local(dst, _impl))
        except FileNotFoundError:
            return False  # concurrent release/break got there first
    elif _impl_s3(src, _impl):
        from . import lease_s3

        # copy-then-If-Match-delete: the tombstone (high-water mark)
        # is durable before the source goes, same crash shape as rename
        if not lease_s3.tombstone(src, dst):
            return False
    else:
        from .fs import rename

        if not rename(spark, src, dst):
            return False
    return True


def lease_is_live(
    spark: SparkSession, resource: str, token: str, _impl: str = "auto"
) -> bool:
    """True iff ``token``'s generation file still carries our token
    and has not passed its TTL — the cheap fencing check a long
    mutation runs immediately BEFORE its commit-point write. Without
    it, a hold that outlives its TTL (GC pause, data skew, slow object
    store) degrades to detect-only exactly when writes are slowest: a
    successor can acquire mid-write and the original writer's final
    commit lands unfenced. One payload read; no listing."""
    parsed = _parse_token(token)
    if parsed is None:
        return False
    gen, my_uuid = parsed
    cur = _read_payload(spark, resource, gen, _impl)
    return (
        cur is not None
        and cur.get("token") == my_uuid
        and time.time() < float(cur["expires"])
    )


def fence_for(spark: SparkSession, resource: str, token: str, _impl: str = "auto"):
    """Zero-arg fencing callback for a held lease: raises
    :class:`LeaseLostError` unless ``token`` is still the live holder.
    Mutators call it immediately before their commit-point write (the
    meta/watermark write or directory swap) so a hold that outlived
    its TTL aborts like a pre-commit crash instead of committing
    unfenced against a successor's concurrent mutation. Cost: one
    payload read (~µs local, one py4j round-trip on Hadoop schemes) —
    free at batch granularity."""

    def _check() -> None:
        if not lease_is_live(spark, resource, token, _impl=_impl):
            raise LeaseLostError(resource, token)

    return _check


@contextmanager
def writer_lease(
    spark: SparkSession,
    resource: str,
    owner: str | None = None,
    ttl_s: float = DEFAULT_TTL_S,
    _impl: str = "auto",
):
    """``with writer_lease(spark, store): <mutate>`` — acquire around
    the mutation, release on every exit path (a crash that skips the
    finally leaves the lease to TTL expiry, which is the design).

    A failed release is LOGGED, not raised: release_lease refuses once
    the TTL has lapsed (a successor may be mid-takeover), so a guarded
    mutation that chronically outruns its TTL leaves a stale lease
    behind every run and makes every next writer pay a break+supersede
    round. Correctness is unaffected, but a systematically slow job
    becomes a perpetual lease-breaking workload — the warning names
    the overrun so operators size ttl_s above the worst-case guarded
    operation instead of discovering tombstone churn in FS listings."""
    token = acquire_lease(spark, resource, owner=owner, ttl_s=ttl_s, _impl=_impl)
    t0 = time.time()
    try:
        yield token
    finally:
        if not release_lease(spark, resource, token, _impl=_impl):
            held = time.time() - t0
            _LOG.warning(
                "lease on %s not released (held %.1fs, ttl %.1fs): the "
                "hold outlived its TTL or was superseded; raise ttl_s "
                "above the worst-case guarded operation to avoid "
                "per-run break+supersede churn",
                resource,
                held,
                ttl_s,
            )


def prune_dead_sidecars(
    spark: SparkSession,
    resource: str,
    grace_s: float = DEFAULT_TTL_S,
    _impl: str = "auto",
    _names: list[str] | None = None,
) -> list[str]:
    """Delete ``resource``'s DEAD lease sidecars — generation files
    whose payload has been expired (or torn) for at least ``grace_s``,
    plus release tombstones and payload temps older than ``grace_s``
    (via the same :func:`_sweep_stale_sidecars` acquire_lease uses) —
    while leaving any LIVE or freshly-expired generation untouched.
    Returns the deleted generation-file names (the tombstone sweep is
    best-effort and unreported, as in acquire).

    This is the safe form of "the resource is retired, clear its lock
    files". Two hazards bound what may be deleted:

    - a blanket delete of every ``.__lease.*`` sibling would remove a
      still-LIVE generation held by a laggard writer that started
      before the caller decided the resource was settled — a third
      writer could then acquire while the laggard still believes it
      holds, exactly the mutual exclusion the lease exists for;
    - deleting a FRESH tombstone (or the freshly-expired max
      generation) resets the generation high-water mark: a stalled
      contender holding a pre-delete listing would target a
      just-vacated generation name while a post-delete contender
      creates g1 — two holders via the numbering-reset ABA the
      tombstone design exists to prevent (the module docstring prices
      tombstone removal at "older than the TTL"; acquire's own sweep
      waits ``max(ttl_s, DEFAULT_TTL_S)`` for the same reason).

    Hence ``grace_s``: a sidecar is swept only once it has been dead
    for a full grace period — one writer-TTL, after which a stalled
    contender is outside the hold guarantee like every other TTL
    assumption here. Callers that know the resource's writer TTL pass
    it (the `weather-etl-curate --retain-batches` retention sweep
    passes its effective stream TTL); the default is
    the module-wide conservative TTL. ``_names``: optional pre-listed
    sidecar file names of ``resource``'s parent dir, so a caller
    sweeping many resources under one dir (the lakelock retention
    pass) pays ONE directory listing, not one per resource."""
    from .fs import delete as fs_delete

    parent, base = _split_parent(resource)
    gen_prefix = base + _GEN_SEP
    local_parent = _impl_local(parent, _impl)
    if _names is not None:
        names = [n for n in _names if n.startswith(gen_prefix)]
    elif local_parent is not None:
        names = _local_list(local_parent, gen_prefix)
    elif _impl_s3(parent, _impl):
        from . import lease_s3

        names = lease_s3.list_names(parent, gen_prefix)
    else:
        from .fs import list_dir

        names = [n for n in list_dir(spark, parent) if n.startswith(gen_prefix)]
    now = time.time()
    deleted: list[str] = []
    for n in sorted(names):
        try:
            gen = int(n[len(gen_prefix) :])
        except ValueError:
            continue  # foreign file sharing the prefix — not ours
        payload = _read_payload(spark, resource, gen, _impl)
        # None = vanished between list and read (already gone). A torn/
        # corrupt payload parses as expires 0.0 — dead for longer than
        # any grace. A freshly-expired payload waits out the grace.
        dead = payload is None or (
            float(payload.get("expires", 0.0)) + float(grace_s) <= now
        )
        if dead:
            p = f"{parent}/{n}"
            local = _impl_local(p, _impl)
            if local is not None:
                _local_delete(local)
            elif _impl_s3(p, _impl):
                from . import lease_s3

                lease_s3.delete(p)
            else:
                fs_delete(spark, p)
            deleted.append(n)
    # tombstones + crash-orphaned temps: same aged sweep as acquire
    # (mtime-based, TTL-graced — never a fresh high-water mark). When
    # the caller pre-listed the dir, skip the sweep's own listing
    # entirely unless the names show something to sweep — the common
    # steady state (all sidecars long gone) then costs zero FS calls.
    tomb_prefix, tmp_prefix = base + _TOMB_SEP, f".{base}{_GEN_SEP}"
    if _names is None or any(
        n.startswith(tomb_prefix) or (n.startswith(tmp_prefix) and ".tmp_" in n)
        for n in _names
    ):
        try:
            _sweep_stale_sidecars(spark, resource, float(grace_s), _impl)
        except Exception:
            pass  # best-effort, like acquire's own sweep
    return deleted
