"""Functional drive of the `weather-etl-curate` console entry point —
the packaging smoke pins its import; this pins its behavior: bootstrap
builds both stores, the stream consumes a parquet drop dir, accepted
docs land in the lake, and a duplicate drop is quarantined (the stores
actually persist across the run)."""

from __future__ import annotations

import pytest


@pytest.mark.parametrize("family", ["minhash"])
@pytest.mark.slow  # multi-batch CLI loop ~40-70s; bootstrap/refusal tests keep CLI coverage in the default profile
def test_curate_cli_end_to_end(spark, tmp_path, family):
    # NB: reuses the session fixture's JVM — the CLI calls get_spark,
    # which returns the active session; --timeout drains then stops
    # the query but must NOT stop the shared session, so we drive the
    # inner main with a monkeypatch-free import and a pre-made session.
    from weather_etl_pipeline_spark.streaming import curation_cli

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    root = tmp_path / "root"

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today", [1.0, 0.0]),
        (2, "this is a second document and it is about the engine of a spark cluster", [0.0, 1.0]),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, e array<double>"
    ).coalesce(1).write.parquet(str(in_dir / "drop1"))

    rc = curation_cli.main(
        [
            "--root",
            str(root),
            "--in",
            str(in_dir / "drop1"),
            "--bootstrap",
            "--timeout",
            "30",
        ]
    )
    assert rc == 0
    lake = spark.read.parquet(str(root / "lake"))
    assert {r["doc_id"] for r in lake.collect()} == {1, 2}

    # second run, new checkpoint-visible drop: doc 3 duplicates doc 1's
    # text exactly — the persisted signature store must quarantine it
    spark.createDataFrame(
        [
            (3, rows[0][1], [1.0, 0.0]),
            (4, "here is one more document and it is not like any of the others at all", [0.5, 0.5]),
        ],
        "doc_id long, text string, e array<double>",
    ).coalesce(1).write.parquet(str(in_dir / "drop1"), mode="append")
    rc = curation_cli.main(
        ["--root", str(root), "--in", str(in_dir / "drop1"), "--timeout", "30"]
    )
    assert rc == 0
    ids = {
        r["doc_id"]
        for r in spark.read.parquet(str(root / "lake")).collect()
    }
    assert 4 in ids and 3 not in ids, ids


@pytest.mark.slow  # multi-batch CLI loop ~40-70s; bootstrap/refusal tests keep CLI coverage in the default profile
def test_retain_batches_flag_prunes_committed_evidence(spark, tmp_path):
    """--retain-batches wires prune_replay_evidence into the service:
    after a second batch commits, the first batch's replay evidence is
    pruned by the CLI's final retention sweep (keep_last=0), while the
    frontier batch's evidence survives. Without the flag (the first
    run) nothing is pruned — evidence for batch 0 must exist before the
    second run for the assertion to be non-vacuous."""
    import os

    from weather_etl_pipeline_spark.streaming import curation_cli

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    root = tmp_path / "root"
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today", [1.0, 0.0]),
            (2, "this is a second document about the engine of a spark cluster", [0.0, 1.0]),
        ],
        "doc_id long, text string, e array<double>",
    ).coalesce(1).write.parquet(str(in_dir / "d"))
    assert (
        curation_cli.main(
            ["--root", str(root), "--in", str(in_dir / "d"),
             "--bootstrap", "--timeout", "30"]
        )
        == 0
    )

    def batch_dirs() -> set[str]:
        rej = root / "rejects"
        return {
            f"{stage}/{d}"
            for stage in os.listdir(rej)
            if not stage.startswith("_")
            for d in os.listdir(rej / stage)
            if d.startswith("batch_id=")
        }

    before = batch_dirs()
    assert any(d.endswith("batch_id=0") for d in before), before

    spark.createDataFrame(
        [(3, "here is one more document and it is not like any of the others", [0.5, 0.5])],
        "doc_id long, text string, e array<double>",
    ).coalesce(1).write.parquet(str(in_dir / "d"), mode="append")
    assert (
        curation_cli.main(
            ["--root", str(root), "--in", str(in_dir / "d"),
             "--timeout", "30", "--retain-batches", "0",
             "--retention-interval", "5"]
        )
        == 0
    )
    after = batch_dirs()
    assert not any(d.endswith("batch_id=0") for d in after), after
    assert any(d.endswith("batch_id=1") for d in after), after  # frontier kept


def test_bootstrap_refused_over_existing_store(spark, tmp_path):
    """Re-running the CLI with --bootstrap against a root that already
    has store meta must REFUSE: an empty rebuild preserves the
    watermark but erases the data and untrains the IVF index, so
    probes would skip and every duplicate of the prior corpus would be
    silently admitted. The stores must be untouched by the refusal."""
    from weather_etl_pipeline_spark.operators.dedup_store import (
        read_store_watermark,
    )
    from weather_etl_pipeline_spark.streaming import curation_cli

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    root = tmp_path / "root"
    spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today", [1.0, 0.0])],
        "doc_id long, text string, e array<double>",
    ).coalesce(1).write.parquet(str(in_dir / "d"))
    assert (
        curation_cli.main(
            ["--root", str(root), "--in", str(in_dir / "d"),
             "--bootstrap", "--timeout", "30"]
        )
        == 0
    )
    wm = read_store_watermark(spark, str(root / "sig_store"))
    assert wm == 1
    with pytest.raises(SystemExit, match="bootstrap refused"):
        curation_cli.main(
            ["--root", str(root), "--in", str(in_dir / "d"),
             "--bootstrap", "--timeout", "30"]
        )
    # refusal touched nothing: watermark intact, session still alive
    assert read_store_watermark(spark, str(root / "sig_store")) == wm
    assert spark.range(1).count() == 1


def test_bootstrap_builds_honor_lease_ttl_flag(spark, tmp_path, monkeypatch):
    """--lease-ttl must reach the bootstrap store builds, not just the
    stream: pre-fix they used the builders' 900s default, so a
    bootstrap crashed mid-build left a lease stalling the next CLI run
    for up to 900s instead of the stream-sized TTL the flag promises."""
    from weather_etl_pipeline_spark.operators import dedup_store, ivf_store
    from weather_etl_pipeline_spark.streaming import curation_cli

    seen = {}

    class _Abort(RuntimeError):
        pass

    def fake_sig(spark_, docs, path, family="minhash", lease_ttl_s=900.0, **kw):
        seen["sig"] = lease_ttl_s

    def fake_ivf(spark_, emb, path, assign_m=1, lease_ttl_s=900.0, **kw):
        seen["ivf"] = lease_ttl_s
        raise _Abort  # stop before the stream starts — builds are the subject

    monkeypatch.setattr(dedup_store, "build_signature_store", fake_sig)
    monkeypatch.setattr(ivf_store, "build_ivf_index", fake_ivf)

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    import pytest as _pytest

    with _pytest.raises(_Abort):
        curation_cli.main(
            ["--root", str(tmp_path / "root"), "--in", str(in_dir),
             "--bootstrap", "--lease-ttl", "7.5", "--timeout", "1"]
        )
    assert seen == {"sig": 7.5, "ivf": 7.5}

    # and without the flag, the builds get the stream default (120s),
    # not the builders' 900s maintenance default
    from weather_etl_pipeline_spark.streaming.curation_loop import (
        _STREAM_LEASE_TTL_S,
    )

    seen.clear()
    with _pytest.raises(_Abort):
        curation_cli.main(
            ["--root", str(tmp_path / "root2"), "--in", str(in_dir),
             "--bootstrap", "--timeout", "1"]
        )
    assert seen == {"sig": _STREAM_LEASE_TTL_S, "ivf": _STREAM_LEASE_TTL_S}


def test_retain_batches_rejects_negative(tmp_path, capsys):
    """--retain-batches -1 would make prune_replay_evidence's
    committed[:max(0, len - keep_last)] slice prune EVERY committed
    batch — including the audit window the flag exists to keep. The
    parser must reject it up front (argparse exits 2), before any
    session or store is touched."""
    import pytest as _pytest

    from weather_etl_pipeline_spark.streaming import curation_cli

    with _pytest.raises(SystemExit) as ei:
        curation_cli.main(
            ["--root", str(tmp_path / "r"), "--in", str(tmp_path / "in"),
             "--retain-batches", "-1"]
        )
    assert ei.value.code == 2
    assert "must be >= 0" in capsys.readouterr().err
    # boundary: 0 (prune all but frontier) still parses
    assert curation_cli._nonnegative_int("0") == 0


def test_trigger_defaults_to_amortized_micro_batches(spark, tmp_path, monkeypatch):
    """Round-14 item 3: the service DEFAULTS to a 30s processing-time
    trigger (per-batch cost is fixed-stage-dominated — the sweeps
    measured per-doc cost falling 15× from 200→5000-doc batches, so
    arriving files must accumulate, not fire per availability check).
    Pins: (a) default run sets processingTime=30000ms and no
    maxFilesPerTrigger; (b) --trigger-interval 0 suppresses the
    trigger; (c) --max-files-per-trigger reaches the reader option.
    Captured at the DataStreamWriter/Reader layer; the stream itself
    is aborted before start (wiring is the subject, not the loop)."""
    from pyspark.sql.streaming.readwriter import (
        DataStreamReader,
        DataStreamWriter,
    )

    from weather_etl_pipeline_spark.streaming import curation_cli

    seen: dict = {}

    class _Abort(Exception):
        pass

    real_trigger = DataStreamWriter.trigger
    real_option = DataStreamReader.option

    def spy_trigger(self, **kw):
        seen["trigger"] = kw
        return real_trigger(self, **kw)

    def spy_option(self, key, value):
        seen.setdefault("reader_opts", {})[key] = value
        return real_option(self, key, value)

    def abort_start(self, *a, **k):
        seen["started"] = True
        raise _Abort

    monkeypatch.setattr(DataStreamWriter, "trigger", spy_trigger)
    monkeypatch.setattr(DataStreamReader, "option", spy_option)
    monkeypatch.setattr(DataStreamWriter, "start", abort_start)

    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def run(extra):
        seen.clear()
        with pytest.raises(_Abort):
            curation_cli.main(
                ["--root", str(tmp_path / "root"), "--in", str(in_dir),
                 "--bootstrap", "--timeout", "1", *extra]
            )
        # the bootstrap-refusal guard would fire on a second --bootstrap
        import shutil

        shutil.rmtree(tmp_path / "root", ignore_errors=True)

    # (a) default: 30s processingTime, no reader cap
    run([])
    assert seen["trigger"] == {"processingTime": "30000 milliseconds"}
    assert "maxFilesPerTrigger" not in seen.get("reader_opts", {})
    # (b) explicit 0 restores fire-per-availability (no trigger call)
    run(["--trigger-interval", "0"])
    assert "trigger" not in seen
    # (c) the reader cap flag reaches maxFilesPerTrigger, and a custom
    # interval overrides the default
    run(["--trigger-interval", "5", "--max-files-per-trigger", "7"])
    assert seen["trigger"] == {"processingTime": "5000 milliseconds"}
    assert seen["reader_opts"]["maxFilesPerTrigger"] == 7


@pytest.mark.slow  # multi-batch CLI loop ~40-70s; bootstrap/refusal tests keep CLI coverage in the default profile
def test_audit_cli_reports_curation_state(spark, tmp_path, capsys):
    """`weather-etl-audit` (round 14): JSON report over a curate root —
    store watermarks, per-batch rows, IVF cell stats (the skew
    surface), anomalies drive the exit code. Driven over a real
    one-batch curate run plus a bootstrap-only (empty-store) root."""
    import json as _json

    from weather_etl_pipeline_spark.streaming import audit_cli, curation_cli

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    root = tmp_path / "root"
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today", [1.0, 0.0]),
            (2, "a second document about the engine of a spark cluster for everyone", [0.0, 1.0]),
        ],
        "doc_id long, text string, e array<double>",
    ).coalesce(1).write.parquet(str(in_dir / "drop"))
    assert curation_cli.main(
        ["--root", str(root), "--in", str(in_dir / "drop"),
         "--bootstrap", "--timeout", "30"]
    ) == 0
    capsys.readouterr()
    rc = audit_cli.main(["--root", str(root)])
    report = _json.loads(capsys.readouterr().out)
    assert rc == 0 and report["anomalies"] == []
    assert report["sig_watermark"] == 2 and report["ivf_watermark"] == 2
    assert report["ivf_cells"]["trained"] is True
    assert report["ivf_cells"]["total_vectors"] == 2
    [batch] = report["batches"].values()
    assert batch["lake_rows"] == 2 and batch["marker"] is True

    # bootstrap-only root: empty stores, no batches — still a clean run
    from weather_etl_pipeline_spark.operators.dedup_store import (
        build_signature_store,
    )
    from weather_etl_pipeline_spark.operators.ivf_store import build_ivf_index

    root2 = tmp_path / "root2"
    build_signature_store(
        spark, spark.createDataFrame([], "doc_id long, text string"),
        str(root2 / "sig_store"),
    )
    build_ivf_index(
        spark, spark.createDataFrame([], "vec_id long, e array<double>"),
        str(root2 / "ivf_index"),
    )
    capsys.readouterr()
    rc2 = audit_cli.main(["--root", str(root2)])
    report2 = _json.loads(capsys.readouterr().out)
    assert rc2 == 0 and report2["batches"] == {}
    assert report2["ivf_cells"] == {"trained": False}
