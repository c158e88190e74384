"""boto3 conditional-request backend for :mod:`.lease` on ``s3://`` URLs.

S3 added conditional writes (``If-None-Match: *`` on PutObject, and
``If-Match`` on PutObject/DeleteObject) in 2024; boto3 exposes them as
the ``IfNoneMatch`` / ``IfMatch`` parameters. They change the lease's
arbitration story on object stores qualitatively:

- **create-if-absent WITH CONTENT is one atomic call**:
  ``put_object(..., IfNoneMatch="*")`` either publishes name AND
  payload together or fails with 412 — no temp file, no rename, no
  empty-file torn window, no post-rename read-back. This is the
  primitive the Hadoop path can only emulate (HEAD-then-PUT via S3A
  rename, see ``lease._hadoop_try_create``), and the module docstring's
  long-standing caveat — "on S3 with a real conditional PUT it is
  closed" — is exactly what this backend delivers.
- **release's tombstone rename** (S3 has no rename) becomes
  copy-to-tombstone + ``delete_object(IfMatch=<etag>)``: the source
  generation file is removed only if it still holds the exact bytes we
  verified, so a racing writer's file can never be deleted by a stale
  releaser.

The backend is pure boto3 — no SparkSession, no JVM round-trips — so
an uncontended acquire costs two LISTs (one shared-stem listing for
generations+tombstones, reused with its mtimes by the hygiene sweep;
one for crash-orphaned payload temps) plus the conditional PUT, with
per-file hygiene deletes on top; the fencing read
(:func:`lease.lease_is_live`) is a single GET. The budget is pinned by
``test_acquire_list_call_budget``.

Scheme handling: ``s3://``, ``s3a://`` and ``s3n://`` all address the
same bucket namespace (s3a/s3n are Hadoop-connector spellings), so a
store written by Spark through S3A is leased through boto3 against the
identical object keys. When boto3 is not importable the lease module
falls back to the Hadoop emulation exactly as before — this backend is
an upgrade, not a new requirement.

Concurrency corner (AWS-documented): two conditional PUTs racing on
the same key can yield ``409 ConditionalRequestConflict`` for one of
them, meaning S3 refused to evaluate the condition — NOT that the
caller lost. :func:`try_create` resolves a 409 by re-reading the key:
our payload present → we won; anything else → loss. Tests cover the
412, 409 and plain-success paths against moto's S3 implementation
(which enforces real If-None-Match/If-Match semantics).

Reference parity: the reference pipeline (ingestion.py:7-45,
gold.py:13-125) is cron-sequenced onto a local disk and needs none of
this; the engine's curated stores live on object storage at fleet
scale, where create-if-absent must come from the store itself.
"""

from __future__ import annotations

import logging
from urllib.parse import urlparse

_LOG = logging.getLogger(__name__)

#: Hadoop-connector spellings of the same bucket namespace.
S3_SCHEMES = frozenset({"s3", "s3a", "s3n"})

_client = None  # lazily-created module default; tests inject their own


def available() -> bool:
    """True iff boto3 is importable (the backend can run at all)."""
    try:
        import boto3  # noqa: F401

        return True
    except ImportError:
        return False


def set_client(client) -> None:
    """Inject an S3 client (tests pass a moto-backed one; services may
    pass a client with custom credentials/endpoint). ``None`` resets to
    lazy default creation."""
    global _client
    _client = client


def _get_client():
    global _client
    if _client is None:
        import boto3

        _client = boto3.client("s3")
    return _client


def parse_s3(path: str) -> tuple[str, str]:
    """(bucket, key) from an s3/s3a/s3n URL. Raises on other schemes —
    callers dispatch by scheme before reaching here."""
    p = urlparse(path)
    if p.scheme.lower() not in S3_SCHEMES:
        raise ValueError(f"not an S3 URL: {path}")
    return p.netloc, p.path.lstrip("/")


def _error_code(exc) -> str:
    return getattr(exc, "response", {}).get("Error", {}).get("Code", "")


def try_create(path: str, payload: bytes) -> bool:
    """Atomic create-if-absent WITH CONTENT via conditional PUT.

    412 PreconditionFailed → the key exists → clean loss. 409
    ConditionalRequestConflict → S3 refused to arbitrate under
    concurrent conditional writes; resolve by reading the key back —
    exactly one contender's payload is durable, and each contender
    claims victory iff it is theirs."""
    from botocore.exceptions import ClientError

    bucket, key = parse_s3(path)
    try:
        _get_client().put_object(
            Bucket=bucket, Key=key, Body=payload, IfNoneMatch="*"
        )
        return True
    except ClientError as e:
        code = _error_code(e)
        if code == "PreconditionFailed":
            return False
        if code == "ConditionalRequestConflict":
            return read(path) == payload
        raise


def read(path: str) -> bytes | None:
    from botocore.exceptions import ClientError

    bucket, key = parse_s3(path)
    try:
        return _get_client().get_object(Bucket=bucket, Key=key)["Body"].read()
    except ClientError as e:
        if _error_code(e) in ("NoSuchKey", "404", "NoSuchBucket"):
            return None
        raise


def list_with_mtime(parent: str, prefix: str) -> list[tuple[str, float]]:
    """[(basename, mtime_epoch_s)] of keys directly under ``parent``
    whose basename starts with ``prefix``. Paginates — a long-lived
    store parent can exceed one LIST page. The basename filter drops
    keys in sub-'directories' (lease sidecars are always flat siblings
    of the resource, so anything with a deeper path is foreign)."""
    from botocore.exceptions import ClientError

    bucket, parent_key = parse_s3(parent)
    parent_key = parent_key.rstrip("/")
    key_prefix = f"{parent_key}/{prefix}" if parent_key else prefix
    out: list[tuple[str, float]] = []
    try:
        paginator = _get_client().get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=bucket, Prefix=key_prefix):
            for obj in page.get("Contents", []):
                base = obj["Key"][len(parent_key) + 1 if parent_key else 0 :]
                if "/" in base:
                    continue
                out.append((base, obj["LastModified"].timestamp()))
    except ClientError as e:
        if _error_code(e) == "NoSuchBucket":
            return []
        raise
    return out


def list_names(parent: str, prefix: str) -> list[str]:
    return [n for n, _ in list_with_mtime(parent, prefix)]


def delete(path: str) -> None:
    """Idempotent delete (S3 DeleteObject succeeds on absent keys)."""
    bucket, key = parse_s3(path)
    _get_client().delete_object(Bucket=bucket, Key=key)


def tombstone(src: str, dst: str) -> bool:
    """S3 spelling of release's rename-to-tombstone: copy the
    generation file to the tombstone name, then conditionally delete
    the source with ``IfMatch`` of the bytes the copy preserved.

    Ordering is crash-shaped like the rename it replaces: the
    tombstone (the generation high-water mark) is durable FIRST, so a
    crash between the two calls leaves both files — the next acquirer
    sees the generation as a normal expired/released lease and the
    numbering never regresses. The copy is pinned to the HEAD'd ETag
    (``CopySourceIfMatch``) so the tombstone can only ever hold the
    bytes this releaser verified — if the source changed under us, the
    copy 412s and we report the lost race WITHOUT publishing a
    tombstone carrying a different writer's content. The conditional
    delete means a stale releaser can never remove a file whose
    content changed under it (generation names are never rewritten by
    design, so both conditions are belt-and-braces, priced at zero).
    412/404 on the delete → the source moved under us → report False,
    keep the copied tombstone (harmless: aged-sweep removes it like
    any other).

    Endpoint portability: conditional DELETE (``IfMatch`` on
    DeleteObject) is a much newer and narrower S3 capability than
    conditional PUT — long restricted to directory buckets on AWS and
    commonly absent on S3-compatible stores (MinIO, Ceph RGW) that
    this backend auto-activates on for any s3:// URL. A 501
    NotImplemented there is NOT a lost race: the tombstone copy
    already succeeded, and raising would leave the generation file
    live until TTL on every release (a regression vs the Hadoop
    rename path). Identity was HEAD-verified and generation names are
    never rewritten, so on such endpoints we log once and fall back
    to an unconditional delete."""
    from botocore.exceptions import ClientError

    src_bucket, src_key = parse_s3(src)
    dst_bucket, dst_key = parse_s3(dst)
    c = _get_client()
    try:
        head = c.head_object(Bucket=src_bucket, Key=src_key)
    except ClientError as e:
        if _error_code(e) in ("NoSuchKey", "404"):
            return False
        raise
    try:
        c.copy_object(
            Bucket=dst_bucket,
            Key=dst_key,
            CopySource={"Bucket": src_bucket, "Key": src_key},
            CopySourceIfMatch=head["ETag"],
        )
    except ClientError as e:
        # source vanished between head and copy (a successor's hygiene
        # pass deleting our superseded generation) OR changed under us
        # (CopySourceIfMatch 412): the same lost race the local backend
        # reports as FileNotFoundError→False and the Hadoop backend as
        # rename→False — never a raise out of release, and never a
        # tombstone published with bytes we did not verify
        if _error_code(e) in ("NoSuchKey", "404", "PreconditionFailed"):
            return False
        raise
    try:
        c.delete_object(Bucket=src_bucket, Key=src_key, IfMatch=head["ETag"])
        return True
    except ClientError as e:
        code = _error_code(e)
        if code in ("PreconditionFailed", "NoSuchKey", "404"):
            _LOG.warning(
                "lease tombstone: source %s changed or vanished during "
                "release; leaving it for the aged sweep",
                src,
            )
            return False
        if code in ("NotImplemented", "501", "MethodNotAllowed"):
            # endpoint lacks conditional DELETE (non-directory-bucket
            # AWS, MinIO, Ceph): fall back to unconditional delete —
            # the copy above already pinned identity via the ETag
            _log_conditional_delete_unsupported(src_bucket)
            c.delete_object(Bucket=src_bucket, Key=src_key)
            return True
        raise


#: buckets already warned about missing conditional-DELETE support,
#: so a long-lived service logs the endpoint capability once per
#: bucket rather than once per release
_COND_DELETE_WARNED: set[str] = set()


def _log_conditional_delete_unsupported(bucket: str) -> None:
    if bucket not in _COND_DELETE_WARNED:
        _COND_DELETE_WARNED.add(bucket)
        _LOG.warning(
            "s3 endpoint for bucket %r does not support conditional "
            "DELETE (IfMatch); falling back to unconditional delete — "
            "safe because the tombstone copy is ETag-pinned and "
            "generation names are never rewritten",
            bucket,
        )
