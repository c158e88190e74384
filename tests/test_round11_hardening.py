"""Round-11 hardening regressions — one test per advisor finding.

Each test pins a failure mode the round-10 advisor flagged:
  1. ``one_row_df`` arity mismatch must raise (not zip-truncate under -O)
  2. ``_run_concurrently`` must not drop sibling exceptions
  3. meta lost on a store that still holds data must REFUSE the
     "empty rebuild" advice (following it wipes the watermark and
     re-admits duplicates of the whole lake)
  4. a probe against an IVF index whose meta n_cells disagrees with the
     centroids table must fail loudly (torn two-write commit)
"""

import shutil

import pytest


def test_one_row_df_arity_mismatch_raises(spark):
    """advisor r10: a bare assert is stripped under ``python -O``;
    a mismatched tuple must raise ValueError, never zip-truncate."""
    from weather_etl_pipeline_spark.functions.jvmrows import one_row_df

    with pytest.raises(ValueError, match="2 values for 3 schema fields"):
        one_row_df(spark, (1, "x"), "a long, b string, c int")
    # matched arity still works
    row = one_row_df(spark, (1, "x", 2), "a long, b string, c int").collect()
    assert [tuple(r) for r in row] == [(1, "x", 2)]


def test_run_concurrently_chains_sibling_errors():
    """advisor r10: errs[0] alone masked sibling failures — a torn
    ANN-append ValueError hidden behind a transient lake-write error
    hides the rebuild signal. All failures must survive in the chain."""
    from weather_etl_pipeline_spark.streaming.curation_loop import (
        _run_concurrently,
    )

    def boom_io():
        raise IOError("transient lake write")

    def boom_torn():
        raise ValueError("torn ANN append — rebuild required")

    with pytest.raises((IOError, ValueError)) as exc_info:
        _run_concurrently(boom_io, boom_torn)
    # the primary propagates; every sibling failure rides along as a
    # PEP 678 note (NOT __cause__ — that would fabricate causality
    # between merely-concurrent failures in the rendered traceback)
    e = exc_info.value
    notes = list(getattr(e, "__notes__", []))
    rendered = [str(e)] + notes
    assert any("transient lake write" in s for s in rendered), rendered
    assert any("rebuild required" in s for s in rendered), rendered
    assert e.__cause__ is None

    # single failure: raised as-is, no spurious notes
    with pytest.raises(ValueError) as one:
        _run_concurrently(lambda: None, boom_torn)
    assert not getattr(one.value, "__notes__", [])


def _tiny_batch(spark, doc_id: int):
    text = (
        "the corpus document number one talks about the weather "
        "in useful detail for a curious reader with patience"
    )
    return spark.createDataFrame(
        [(doc_id, text + f" tail{doc_id}", [float(doc_id), 1.0, 0.0], "crawl")],
        "doc_id long, text string, e array<double>, src string",
    )


def test_meta_lost_with_data_refuses_empty_rebuild(spark, tmp_path):
    """advisor r10: a crash mid meta-overwrite deletes meta on a store
    that still holds data; the old PATH_NOT_FOUND diagnosis advised an
    empty rebuild ("empty input is fine"), which would reset the
    watermark and re-admit duplicates of everything already curated.
    The loop must now detect the orphaned data and refuse."""
    from weather_etl_pipeline_spark.operators.dedup_store import (
        build_signature_store,
    )
    from weather_etl_pipeline_spark.operators.ivf_store import build_ivf_index
    from weather_etl_pipeline_spark.streaming.curation_loop import (
        process_curation_batch,
    )

    sig, ivf = str(tmp_path / "sig"), str(tmp_path / "ivf")
    lake, rej = str(tmp_path / "lake"), str(tmp_path / "rej")
    build_signature_store(
        spark, spark.createDataFrame([], "doc_id long, text string"), sig
    )
    build_ivf_index(
        spark, spark.createDataFrame([], "vec_id long, e array<double>"), ivf
    )
    # one accepted batch so both stores hold data
    process_curation_batch(
        spark, _tiny_batch(spark, 1), 1, sig, ivf, lake, rej
    )
    assert spark.read.parquet(lake).count() == 1

    # crash simulation: meta vanishes mid-overwrite, data survives
    shutil.rmtree(tmp_path / "sig" / "meta")
    with pytest.raises(ValueError, match="meta lost on a store"):
        process_curation_batch(
            spark, _tiny_batch(spark, 2), 2, sig, ivf, lake, rej
        )
    # the refusal must NOT suggest the empty rebuild
    with pytest.raises(ValueError, match="Do NOT rebuild empty"):
        process_curation_batch(
            spark, _tiny_batch(spark, 2), 2, sig, ivf, lake, rej
        )

    # genuinely-never-built stores keep the original actionable advice
    sig2, ivf2 = str(tmp_path / "sig2"), str(tmp_path / "ivf2")
    with pytest.raises(ValueError, match="pre-built before the"):
        process_curation_batch(
            spark, _tiny_batch(spark, 3), 3, sig2, ivf2, lake, rej
        )


def test_ivf_probe_refuses_torn_ncells(spark, tmp_path):
    """advisor r10: the large-k probe trusted meta n_cells as the
    centroid count; meta and the centroids table are two separate
    overwrites, so a crash between them can tear them out of sync. A
    probe against that state must raise, not silently diverge from
    the build's assignment arithmetic."""
    from weather_etl_pipeline_spark.operators.ivf_store import (
        _VEC_ASSIGN_MIN_K,
        _write_meta,
        build_ivf_index,
        probe_ivf_index,
    )

    ivf = str(tmp_path / "ivf")
    emb = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 1.0]) for i in range(1, 13)],
        "vec_id long, e array<double>",
    )
    build_ivf_index(spark, emb, ivf, k=4)
    q = spark.createDataFrame(
        [(100, [1.0, 1.0, 1.0])], "query_id long, qe array<double>"
    )
    # sanity: the healthy index probes fine
    assert probe_ivf_index(spark, q, ivf, topk=3).count() == 3

    # tear: meta claims a large-k index while centroids still hold 4
    _write_meta(spark, ivf, 12, 1, n_cells=_VEC_ASSIGN_MIN_K)
    with pytest.raises(ValueError, match="torn"):
        probe_ivf_index(spark, q, ivf, topk=3).count()


def test_store_meta_write_is_atomic_swap(spark, tmp_path, monkeypatch):
    """Round-11 hardening: store meta goes through the write-then-rename
    swap (plans/metadata._atomic_overwrite), so a failed PUBLISH leaves
    the previous meta intact — pre-swap, mode("overwrite") deleted meta
    before rebuilding it, and a crash there orphaned a store full of
    data (the advisor's round-10 hazard). Failure injection: the swap's
    rename returns False once; the write must raise AND the old
    watermark must still be readable."""
    from weather_etl_pipeline_spark.operators import dedup_store as ds
    from weather_etl_pipeline_spark.plans import metadata as md

    store = str(tmp_path / "sig")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    ds.build_signature_store(spark, docs, store)
    assert ds.read_store_watermark(spark, store) == 1

    real_rename = md.rename
    state = {"armed": True}

    def flaky_rename(spark_, src, dst):
        # fail only the PUBLISH step (tmp -> meta), once
        if state["armed"] and "__tmp_" in src:
            state["armed"] = False
            return False
        return real_rename(spark_, src, dst)

    monkeypatch.setattr(md, "rename", flaky_rename)
    with pytest.raises(IOError, match="could not publish"):
        ds._write_meta(spark, store, 99)
    # old meta survived the failed swap — watermark unchanged, store
    # not orphaned
    assert ds.read_store_watermark(spark, store) == 1
    # next write (rename healthy again) succeeds
    ds._write_meta(spark, store, 2)
    assert ds.read_store_watermark(spark, store) == 2


def test_ivf_probe_refuses_torn_ncells_small_k(spark, tmp_path):
    """Round-11 review follow-up: the torn-index guard must cover the
    SMALL-k (broadcast) probe branch too — a rebuild crash can leave
    meta recording a small stale n_cells over a different centroids
    table, and the branch choice + dedupe gate would silently use the
    wrong arithmetic. The guard is plan-embedded (zero extra jobs) and
    surfaces as Spark's USER_RAISED_EXCEPTION at execution."""
    from weather_etl_pipeline_spark.operators.ivf_store import (
        _write_meta,
        build_ivf_index,
        probe_ivf_index,
    )

    ivf = str(tmp_path / "ivf")
    emb = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 1.0]) for i in range(1, 13)],
        "vec_id long, e array<double>",
    )
    build_ivf_index(spark, emb, ivf, k=4)
    q = spark.createDataFrame(
        [(100, [1.0, 1.0, 1.0])], "query_id long, qe array<double>"
    )
    assert probe_ivf_index(spark, q, ivf, topk=3).count() == 3

    # tear: meta claims 3 cells, centroids hold 4 — still small-k
    _write_meta(spark, ivf, 12, 1, n_cells=3)
    with pytest.raises(Exception, match="IVF index torn"):
        probe_ivf_index(spark, q, ivf, topk=3).count()


def test_meta_lost_detection_on_scheme_qualified_paths(spark, tmp_path):
    """Round-11 review: the orphaned-store guard walked os.path, so a
    scheme-qualified store (file:/, hdfs://, s3a://) read as "no data"
    and the loop fell back to the DESTRUCTIVE empty-rebuild advice.
    Pin the Hadoop-FS walk: the same orphan scenario addressed via a
    file: URI must still refuse."""
    from weather_etl_pipeline_spark.operators.dedup_store import (
        build_signature_store,
    )
    from weather_etl_pipeline_spark.operators.ivf_store import build_ivf_index
    from weather_etl_pipeline_spark.streaming.curation_loop import (
        process_curation_batch,
    )

    # scheme-qualified addresses for both stores; lake/rejects local
    sig = f"file:{tmp_path}/sig"
    ivf = f"file:{tmp_path}/ivf"
    lake, rej = str(tmp_path / "lake"), str(tmp_path / "rej")
    build_signature_store(
        spark, spark.createDataFrame([], "doc_id long, text string"), sig
    )
    build_ivf_index(
        spark, spark.createDataFrame([], "vec_id long, e array<double>"), ivf
    )
    process_curation_batch(
        spark, _tiny_batch(spark, 1), 1, sig, ivf, lake, rej
    )
    assert spark.read.parquet(lake).count() == 1

    shutil.rmtree(tmp_path / "sig" / "meta")
    with pytest.raises(ValueError, match="meta lost on a store"):
        process_curation_batch(
            spark, _tiny_batch(spark, 2), 2, sig, ivf, lake, rej
        )
