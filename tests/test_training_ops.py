"""Invariant tests for the round-4 training-data operators.

Oracle hash-matches (diffcheck) prove cross-engine value equality;
these tests pin the SEMANTIC invariants the hashes can't express.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_etl_pipeline_spark.operators.arrayfns import emb_quantize_int8
from weather_etl_pipeline_spark.operators.curation import (
    _SEQ_LEN,
    pack_training_sequences,
)

SF = "/root/testdata/sf0.001"


def test_pack_training_sequences_tiling(spark):
    out = pack_training_sequences(spark, SF).cache()
    # offsets live inside a sequence; a doc spans exactly the sequences
    # its token interval covers
    bad = out.filter(
        (F.col("offset_in_seq") < 0)
        | (F.col("offset_in_seq") >= _SEQ_LEN)
        | (F.col("first_seq") > F.col("last_seq"))
        | (
            F.col("last_seq")
            != F.floor(
                (F.col("first_seq") * _SEQ_LEN + F.col("offset_in_seq")
                 + F.col("n_tok") - 1) / _SEQ_LEN
            )
        )
    ).count()
    assert bad == 0
    # per-(lang, source) streams tile without gaps: total tokens in a
    # shard == last doc's end position
    shard = out.groupBy("lang", "source").agg(
        F.sum("n_tok").alias("total"),
        F.max(
            F.col("first_seq") * _SEQ_LEN + F.col("offset_in_seq") + F.col("n_tok")
        ).alias("end_pos"),
    )
    assert shard.filter(F.col("total") != F.col("end_pos")).count() == 0
    out.unpersist()


def test_emb_quantize_int8_bounds(spark):
    out = emb_quantize_int8(spark, SF).cache()
    # reconstruction error of round-to-nearest is bounded by scale/2
    # (hround gives both sides 1e-6 slack); scale is positive
    bad = out.filter(
        (F.col("scale") <= 0)
        | (F.col("max_abs_err") > F.col("scale") / 2 + F.lit(1e-6))
    ).count()
    assert bad == 0
    # symmetric quantization saturates at the max|x| dimension only:
    # every vector has at least one code at ±127
    assert out.filter(F.col("n_saturated") < 1).count() == 0
    out.unpersist()


def test_corpus_mixture_resample_invariants(spark):
    from weather_etl_pipeline_spark.operators.scaleops import (
        _MIX_SCALE,
        _MIX_TARGET,
        corpus_mixture_resample,
    )

    # sf0.01 (500 docs), not the suite's sf0.001: with ~50 docs the
    # binomial noise of hash sampling is the same size as the mixture
    # band and the assertion would flake across testdata regeneration
    sf = "/root/testdata/sf0.01"
    rows = {
        r["lang"]: r
        for r in corpus_mixture_resample(spark, sf).collect()
    }
    # every target language with surviving docs appears, no others
    assert set(rows) <= set(_MIX_TARGET)
    # exactly one binding language is kept at 100%
    full = [lang for lang, r in rows.items() if r["rate_ppm"] == _MIX_SCALE]
    assert len(full) == 1
    # rates never exceed 100%
    assert all(0 < r["rate_ppm"] <= _MIX_SCALE for r in rows.values())
    # realized mixture tracks the target: kept counts are proportional
    # to target weights up to hash-sampling noise (few-hundred-doc
    # strata -> allow a generous band; determinism is the real check,
    # exactness is the oracle's job)
    total_kept = sum(r["n_kept"] for r in rows.values())
    for lang, r in rows.items():
        want = _MIX_TARGET[lang] / 100
        got = r["n_kept"] / total_kept
        assert abs(got - want) < 0.15, (lang, got, want)
    # deterministic: a rerun keeps the identical documents
    again = {
        r["lang"]: r for r in corpus_mixture_resample(spark, sf).collect()
    }
    assert {k: (v["n_kept"], v["rate_ppm"]) for k, v in rows.items()} == {
        k: (v["n_kept"], v["rate_ppm"]) for k, v in again.items()
    }


def test_quality_percentile_gate_invariants(spark):
    from weather_etl_pipeline_spark.operators.curation import (
        quality_percentile_gate,
    )

    out = quality_percentile_gate(spark, SF).collect()
    assert out, "gate returned no shards"
    for r in out:
        # a p75 gate keeps at least a quarter of the shard (>= threshold
        # includes ties) and can't keep more than the shard
        assert 0 < r["n_kept"] <= r["n_total"]
        assert r["n_kept"] >= r["n_total"] * 0.25 - 1
    # per-shard upper bounds are tie-sensitive in tiny sf0.001 shards;
    # the meaningful global invariant is that the gate actually gates
    assert sum(r["n_kept"] for r in out) < sum(r["n_total"] for r in out)


def test_incremental_minhash_matches_full_corpus_restriction(spark):
    """The incremental query must equal the full-corpus portable pair
    set restricted to (new-batch, corpus) pairs — same signatures, same
    verify — and every id must land in its split bucket."""
    from weather_etl_pipeline_spark.operators.dedup import (
        _INC_NEW_PCT,
        dedup_incremental_minhash,
        dedup_minhash_portable,
    )

    sf = "/root/testdata/sf0.01"
    bucket = lambda d: (d * 2654435761) % 4294967296 % 100  # noqa: E731
    inc = {
        (r["new_id"], r["old_id"], r["jaccard_shingles"])
        for r in dedup_incremental_minhash(spark, sf).collect()
    }
    for new_id, old_id, _ in inc:
        assert bucket(new_id) >= _INC_NEW_PCT
        assert bucket(old_id) < _INC_NEW_PCT
    full = dedup_minhash_portable(spark, sf).collect()
    want = set()
    for r in full:
        a, b, j = r["doc_a"], r["doc_b"], r["jaccard_shingles"]
        # full-corpus pairs are doc_a < doc_b; orient to (new, old)
        if bucket(a) >= _INC_NEW_PCT and bucket(b) < _INC_NEW_PCT:
            want.add((a, b, j))
        elif bucket(b) >= _INC_NEW_PCT and bucket(a) < _INC_NEW_PCT:
            want.add((b, a, j))
    assert inc == want


def test_signature_store_probe_matches_inline_incremental(spark, tmp_path):
    """The persisted signature store is the amortized form of
    dedup_incremental_minhash: build once over the corpus split, probe
    with the batch split, and the pair set must equal the inline query
    (same portable signatures, same corpus-side cap, same verify)."""
    from weather_etl_pipeline_spark.catalog import load_table
    from weather_etl_pipeline_spark.operators.dedup import (
        _INC_NEW_PCT,
        dedup_incremental_minhash,
    )
    from weather_etl_pipeline_spark.operators.dedup_store import (
        build_signature_store,
        probe_signature_store,
    )

    sf = "/root/testdata/sf0.01"
    docs = load_table(spark, sf, "documents")
    bucket = (F.col("doc_id") * 2654435761) % 4294967296 % 100
    store = str(tmp_path / "sigstore")
    build_signature_store(spark, docs.filter(bucket < _INC_NEW_PCT), store)
    probed = {
        (r["new_id"], r["old_id"], r["jaccard_shingles"])
        for r in probe_signature_store(
            spark, docs.filter(bucket >= _INC_NEW_PCT), store
        ).collect()
    }
    inline = {
        (r["new_id"], r["old_id"], r["jaccard_shingles"])
        for r in dedup_incremental_minhash(spark, sf).collect()
    }
    assert probed == inline
    assert probed, "no pairs at sf0.01 — vacuous equality"


@pytest.mark.parametrize("family", ["minhash", "simhash"])
def test_signature_store_probe_plan_never_shuffles_store(spark, tmp_path, family):
    """Scale contract of the probe — BOTH families (the store machinery
    is shared, so the contract is pinned once per family): the store
    side is scanned pruned and joined via broadcast of the batch — no
    Exchange may feed from the store scans (a store shuffle would make
    probe cost corpus-bound, the exact term the store exists to
    amortize)."""
    from weather_etl_pipeline_spark.catalog import load_table
    from weather_etl_pipeline_spark.operators.dedup import _INC_NEW_PCT
    from weather_etl_pipeline_spark.operators.dedup_store import (
        build_signature_store,
        probe_signature_store,
    )

    sf = "/root/testdata/sf0.01"
    docs = load_table(spark, sf, "documents")
    bucket = (F.col("doc_id") * 2654435761) % 4294967296 % 100
    store = str(tmp_path / "sigstore")
    build_signature_store(
        spark, docs.filter(bucket < _INC_NEW_PCT), store, family=family
    )
    out = probe_signature_store(
        spark, docs.filter(bucket >= _INC_NEW_PCT), store, family=family
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    # every join touching the store must be a broadcast join; the only
    # allowed exchanges are broadcast exchanges and the batch side's own
    # narrow repartition
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    # and the bands scan must be PARTITION-PRUNED by the batch's
    # (band, sig_shard) work-list — an empty PartitionFilters would
    # mean probes scan the whole store at every corpus size
    assert re.search(r"PartitionFilters: \[[^\]]*sig_shard", plan), plan


@pytest.mark.parametrize("family", ["minhash", "simhash"])
def test_signature_store_append_equals_rebuild(spark, tmp_path, family):
    """The ingest loop's accept step, BOTH families: appending a
    batch's signatures must leave the store probe-equivalent to a full
    rebuild over the union corpus (ranks stay valid because ingest ids
    are monotonic — the contract the op asserts), and a non-monotonic
    append must be refused."""
    import pytest as _pytest

    from weather_etl_pipeline_spark.catalog import load_table
    from weather_etl_pipeline_spark.operators.dedup_store import (
        append_signature_batch,
        build_signature_store,
        probe_signature_store,
    )

    sf = "/root/testdata/sf0.01"
    docs = load_table(spark, sf, "documents")  # doc_ids 0..499
    part_a = docs.filter(F.col("doc_id") < 350)
    part_b = docs.filter((F.col("doc_id") >= 350) & (F.col("doc_id") < 475))
    probe = docs.filter(F.col("doc_id") >= 475)

    appended = str(tmp_path / "appended")
    build_signature_store(spark, part_a, appended, family=family)
    append_signature_batch(spark, part_b, appended, family=family)
    rebuilt = str(tmp_path / "rebuilt")
    build_signature_store(
        spark, docs.filter(F.col("doc_id") < 475), rebuilt, family=family
    )

    got_a = {
        tuple(r)
        for r in probe_signature_store(
            spark, probe, appended, family=family
        ).collect()
    }
    got_r = {
        tuple(r)
        for r in probe_signature_store(
            spark, probe, rebuilt, family=family
        ).collect()
    }
    assert got_a == got_r
    assert got_a, "vacuous equality — probe found no pairs"

    # contract enforcement: re-appending older ids must refuse
    with _pytest.raises(ValueError, match="monotonic"):
        append_signature_batch(spark, part_a, appended, family=family)


@pytest.mark.parametrize("family", ["minhash", "simhash"])
def test_signature_store_torn_append_is_benign_and_detected(
    spark, tmp_path, family
):
    """The append crash-consistency claims, exercised for BOTH
    families: a crash after the codes write but before the bands write
    (the write order makes this the only mid-append torn state besides
    bands-complete) leaves probe output IDENTICAL to the pre-append
    store — the new docs are simply not yet searchable — and the next
    append refuses loudly instead of duplicating rows."""
    import pytest as _pytest

    from weather_etl_pipeline_spark.catalog import load_table
    from weather_etl_pipeline_spark.operators.dedup_store import (
        _FAMILIES,
        _codes_path,
        append_signature_batch,
        build_signature_store,
        probe_signature_store,
        N_ID_SHARDS,
    )

    sf = "/root/testdata/sf0.01"
    docs = load_table(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    batch_b = docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 450))
    probe = docs.filter(F.col("doc_id") >= 450)

    store = str(tmp_path / "store")
    build_signature_store(spark, corpus, store, family=family)
    before = {
        (r["new_id"], r["old_id"])
        for r in probe_signature_store(
            spark, probe, store, family=family
        ).collect()
    }

    # simulate the crash: the append's INTENT journal entry (pending_hi
    # in meta — written before any data write), then batch_b's CODES
    # only (the first of the three data writes), leaving bands and the
    # commit meta untouched
    from weather_etl_pipeline_spark.operators.dedup_store import (
        _read_sig_meta,
        _write_meta,
    )

    wm0, has_data0, _, _ = _read_sig_meta(spark, store)
    hi_b = batch_b.agg(F.max("doc_id")).collect()[0][0]
    _write_meta(spark, store, wm0, has_data=has_data0, pending_hi=int(hi_b))
    shb, _ = _FAMILIES[family]["tables"](batch_b)
    (
        shb.withColumn("id_shard", F.pmod("doc_id", F.lit(N_ID_SHARDS)))
        .write.mode("append")
        .partitionBy("id_shard")
        .parquet(_codes_path(store))
    )
    shb.unpersist()

    after = {
        (r["new_id"], r["old_id"])
        for r in probe_signature_store(
            spark, probe, store, family=family
        ).collect()
    }
    assert after == before, "torn codes-only append changed probe output"

    with _pytest.raises(ValueError, match="torn append"):
        append_signature_batch(spark, batch_b, store, family=family)


def test_torn_state_refuses_even_for_empty_batch_appends(spark, tmp_path):
    """Round-10 journal hardening: the all-duplicates (empty-batch)
    append path only advances the watermark — but it must still run
    the torn recovery first. Pre-fix it sat in front of the check, so
    an empty append after a crashed one would clear the intent journal
    and advance the watermark PAST the crashed attempt's orphan rows,
    silently legitimizing them. Pinned for BOTH stores."""
    import pytest as _pytest

    from weather_etl_pipeline_spark.operators import dedup_store as dstore
    from weather_etl_pipeline_spark.operators import ivf_store as istore

    # --- signature store
    store = str(tmp_path / "sig")
    corpus = spark.createDataFrame(
        [(1, "one two three four five"), (2, "six seven eight nine ten")],
        "doc_id long, text string",
    )
    dstore.build_signature_store(spark, corpus, store)
    # crashed append: intent journal + orphan codes row, no commit
    wm, has_data, _, _ = dstore._read_sig_meta(spark, store)
    dstore._write_meta(spark, store, wm, has_data=has_data, pending_hi=50)
    shb, _ = dstore._FAMILIES["minhash"]["tables"](
        spark.createDataFrame(
            [(50, "orphan words from a crashed append run")],
            "doc_id long, text string",
        )
    )
    (
        shb.withColumn("id_shard", F.pmod("doc_id", F.lit(dstore.N_ID_SHARDS)))
        .write.mode("append")
        .partitionBy("id_shard")
        .parquet(dstore._codes_path(store))
    )
    shb.unpersist()
    empty = spark.createDataFrame([], "doc_id long, text string")
    with _pytest.raises(ValueError, match="torn append"):
        dstore.append_signature_batch(spark, empty, store, watermark_hi=60)
    assert dstore.read_store_watermark(spark, store) == wm  # unmoved

    # --- IVF index
    index = str(tmp_path / "ivf")
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, e array<double>"
    )
    istore.build_ivf_index(spark, emb, index, k=2)
    iwm, m, tr, _, _, _ = istore._read_meta_full(spark, index)
    istore._write_meta(spark, index, iwm, m, tr, pending_hi=50)
    spark.createDataFrame(
        [(50, [0.5, 0.5], 0)], "vec_id long, e array<double>, cell int"
    ).write.mode("append").partitionBy("cell").parquet(f"{index}/cells")
    iempty = spark.createDataFrame([], "vec_id long, e array<double>")
    with _pytest.raises(ValueError, match="torn append"):
        istore.append_ivf_batch(spark, iempty, index, watermark_hi=60)
    assert istore.read_ivf_watermark(spark, index) == iwm  # unmoved


def test_rebuild_clears_stale_partitions_under_dynamic_overwrite(
    spark, tmp_path
):
    """Round-10 review fix: the session runs with
    partitionOverwriteMode=dynamic (the lake's append-shaped overwrites
    need it), under which a store REBUILD only replaced partition dirs
    present in the new corpus — dirs the shrunk corpus no longer
    touches kept the OLD store's rows, and because rebuilds preserve
    the watermark floor those deleted docs/vectors stayed inside the
    probes' committed filter. Builds now force static overwrite
    per-write. Repro for both stores: rebuild with a disjoint corpus,
    then probe for the DELETED content — zero hits required."""
    from weather_etl_pipeline_spark.operators.dedup_store import (
        build_signature_store,
        probe_signature_store,
    )
    from weather_etl_pipeline_spark.operators.ivf_store import (
        build_ivf_index,
        probe_ivf_index,
    )

    # --- signature store: old text's band/code shards are untouched by
    # the new corpus, but a probe for the old text hashes straight into
    # them
    store = str(tmp_path / "sig")
    old_text = "alpha beta gamma delta epsilon zeta"
    build_signature_store(
        spark,
        spark.createDataFrame([(1, old_text)], "doc_id long, text string"),
        store,
    )
    build_signature_store(  # compaction rebuild: doc 1 was deleted
        spark,
        spark.createDataFrame(
            [(10, "completely different words live here now today")],
            "doc_id long, text string",
        ),
        store,
    )
    hits = probe_signature_store(
        spark,
        spark.createDataFrame([(99, old_text)], "doc_id long, text string"),
        store,
    ).collect()
    assert hits == [], f"deleted doc resurfaced from stale shards: {hits}"

    # --- IVF: the rebuild's k-means leaves cell 1 effectively untouched
    # (two identical vectors -> duplicate seeds -> everything assigns to
    # cell 0), so under dynamic overwrite the old cell-1 rows survived
    # and a nprobe=k probe returned the deleted vector
    index = str(tmp_path / "ivf")
    build_ivf_index(
        spark,
        spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, e array<double>"
        ),
        index,
        k=2,
    )
    build_ivf_index(  # rebuild: vectors 1 and 2 deleted
        spark,
        spark.createDataFrame(
            [(10, [1.0, 0.0]), (11, [1.0, 0.0])], "vec_id long, e array<double>"
        ),
        index,
        k=2,
    )
    got = probe_ivf_index(
        spark,
        spark.createDataFrame(
            [(99, [0.0, 1.0])], "query_id long, qe array<double>"
        ),
        index,
        topk=5,
        nprobe=2,
    ).collect()
    assert all(
        r["neighbor_id"] in (10, 11) for r in got
    ), f"deleted vector resurfaced from a stale cell: {got}"


def test_pending_journal_without_orphans_recovers_and_proceeds(spark, tmp_path):
    """The journal's OTHER recovery leg: a crash after the intent write
    but before any data write leaves pending set with zero orphan rows
    — the retry's recovery scan finds nothing and the append must
    PROCEED (refusing here would turn every pre-write crash into a
    rebuild). Pinned for both stores."""
    from weather_etl_pipeline_spark.operators import dedup_store as dstore
    from weather_etl_pipeline_spark.operators import ivf_store as istore

    store = str(tmp_path / "sig")
    corpus = spark.createDataFrame(
        [(1, "one two three four five")], "doc_id long, text string"
    )
    dstore.build_signature_store(spark, corpus, store)
    wm, has_data, _, _ = dstore._read_sig_meta(spark, store)
    dstore._write_meta(spark, store, wm, has_data=has_data, pending_hi=50)
    batch = spark.createDataFrame(
        [(50, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    dstore.append_signature_batch(spark, batch, store)  # must not raise
    assert dstore.read_store_watermark(spark, store) == 50
    assert dstore._read_sig_meta(spark, store)[2] is None  # journal clear
    hits = dstore.probe_signature_store(
        spark,
        spark.createDataFrame(
            [(99, "alpha beta gamma delta epsilon")], "doc_id long, text string"
        ),
        store,
    ).collect()
    assert {(r["new_id"], r["old_id"]) for r in hits} == {(99, 50)}

    index = str(tmp_path / "ivf")
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, e array<double>"
    )
    istore.build_ivf_index(spark, emb, index, k=2)
    iwm, m, tr, _, _, ncells = istore._read_meta_full(spark, index)
    istore._write_meta(spark, index, iwm, m, tr, pending_hi=50, n_cells=ncells)
    istore.append_ivf_batch(
        spark,
        spark.createDataFrame([(50, [1.0, 0.1])], "vec_id long, e array<double>"),
        index,
    )  # must not raise
    assert istore.read_ivf_watermark(spark, index) == 50
    assert istore._read_meta_full(spark, index)[3] is None  # journal clear
    got = istore.probe_ivf_index(
        spark,
        spark.createDataFrame(
            [(99, [1.0, 0.1])], "query_id long, qe array<double>"
        ),
        index,
        topk=1,
    ).collect()
    assert [r["neighbor_id"] for r in got] == [50]


def test_signature_store_collapse_first_recall_past_bucket_cap(spark, tmp_path):
    """Round-9 recall fix: a corpus whose one text has MORE exact twins
    than _LSH_BUCKET_CAP must still probe-match ALL of them. Pre-fix,
    the store banded raw docs, twins filled the capped bucket prefix
    (probe filters rn <= cap), and members past the cap silently
    escaped candidacy; collapse-first stores one rep per distinct text
    and expands verified matches through the persisted star edges."""
    from weather_etl_pipeline_spark.operators.dedup import _LSH_BUCKET_CAP
    from weather_etl_pipeline_spark.operators.dedup_store import (
        build_signature_store,
        probe_signature_store,
    )

    n_twins = _LSH_BUCKET_CAP + 6  # strictly past the per-bucket cap
    twin = "alpha beta gamma delta epsilon zeta"
    corpus = spark.createDataFrame(
        [(i, twin) for i in range(n_twins)]
        + [(500, "totally unrelated words about weather stations")],
        "doc_id long, text string",
    )
    store = str(tmp_path / "dupheavy")
    build_signature_store(spark, corpus, store)
    hits = probe_signature_store(
        spark,
        spark.createDataFrame([(1000, twin)], "doc_id long, text string"),
        store,
    ).collect()
    assert {r["old_id"] for r in hits} == set(range(n_twins))
    assert all(r["jaccard_shingles"] == 1.0 for r in hits)


def test_signature_store_rebuild_preserves_committed_watermark(spark, tmp_path):
    """Round-9 watermark-floor fix: a compaction REBUILD from the
    accepted corpus must never regress the meta watermark below a
    committed watermark_hi (a batch whose max doc was quarantined) —
    regression would let a crash-redelivered batch past the ingest
    loop's replay short-circuit and self-dup its own accepted docs."""
    from weather_etl_pipeline_spark.operators.dedup_store import (
        append_signature_batch,
        build_signature_store,
        read_store_watermark,
    )

    accepted = spark.createDataFrame(
        [(1, "one two three four"), (2, "five six seven eight")],
        "doc_id long, text string",
    )
    store = str(tmp_path / "wmfloor")
    build_signature_store(spark, accepted, store)
    # a later batch committed up to doc 99, but its tail was all dups
    append_signature_batch(
        spark, accepted.limit(0), store, watermark_hi=99
    )
    assert read_store_watermark(spark, store) == 99
    # compaction rebuild from the accepted corpus (max doc_id = 2):
    # default preserves the existing watermark...
    build_signature_store(spark, accepted, store)
    assert read_store_watermark(spark, store) == 99
    # ...and an explicit floor above it wins
    build_signature_store(spark, accepted, store, watermark_hi=120)
    assert read_store_watermark(spark, store) == 120


def test_signature_store_floored_empty_rebuild_probes_and_appends(
    spark, tmp_path
):
    """Round-10 advisor fix: a compaction rebuild from an EMPTY accepted
    corpus under a preserved watermark leaves watermark >= 0 with ZERO
    band/code data files. Probe and append must branch on the meta
    has_data flag, not the watermark — pre-fix both died on
    schema-inference of the file-less dirs. The follow-on append must
    bootstrap ranks from zero and flip has_data so the store becomes
    searchable again."""
    from weather_etl_pipeline_spark.operators.dedup_store import (
        append_signature_batch,
        build_signature_store,
        probe_signature_store,
        read_store_watermark,
    )

    store = str(tmp_path / "flooredempty")
    empty = spark.createDataFrame([], "doc_id long, text string")
    # the advisor's exact scenario: empty rebuild with a committed floor
    build_signature_store(spark, empty, store, watermark_hi=99)
    assert read_store_watermark(spark, store) == 99

    probe = spark.createDataFrame(
        [(1000, "some words to probe with here")], "doc_id long, text string"
    )
    assert probe_signature_store(spark, probe, store).count() == 0

    batch = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    append_signature_batch(spark, batch, store)
    assert read_store_watermark(spark, store) == 100
    # the appended doc is now searchable: an exact twin probes back
    hits = probe_signature_store(
        spark,
        spark.createDataFrame(
            [(2000, "alpha beta gamma delta epsilon zeta")],
            "doc_id long, text string",
        ),
        store,
    ).collect()
    assert [(r["new_id"], r["old_id"], r["jaccard_shingles"]) for r in hits] == [
        (2000, 100, 1.0)
    ]


# --- persisted IVF index (round 8: the signature-store pattern for ANN) -------


def test_ivf_index_probe_matches_inline(spark, tmp_path):
    """The persisted IVF index is the amortized form of
    simsearch_ivf_kmeans: build once over the corpus, probe with the
    inline op's query set, and the top-k table must be identical (same
    Lloyd arithmetic, same cell assignment, same cosine/tie-break)."""
    from weather_etl_pipeline_spark.catalog import load_table
    from weather_etl_pipeline_spark.functions.vectors import as_double
    from weather_etl_pipeline_spark.operators.ivf import simsearch_ivf_kmeans
    from weather_etl_pipeline_spark.operators.ivf_store import (
        build_ivf_index,
        probe_ivf_index,
        read_ivf_watermark,
    )

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    index = str(tmp_path / "ivf")
    # k pinned to the inline op's default: the parity claim is same-k
    # same-arithmetic (build's k default is auto-sqrt(n), which sizes
    # for the corpus rather than matching the fixed inline default)
    from weather_etl_pipeline_spark.operators.ivf import _K as _INLINE_K

    build_ivf_index(spark, emb, index, k=_INLINE_K)
    assert read_ivf_watermark(spark, index) >= 0
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    probed = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rk"])
        for r in probe_ivf_index(spark, queries, index).collect()
    }
    inline = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rk"])
        for r in simsearch_ivf_kmeans(spark, sf).collect()
    }
    assert probed == inline
    assert probed, "no neighbors at sf0.01 — vacuous equality"


def test_ivf_index_probe_plan_is_pruned_and_broadcast(spark, tmp_path):
    """Scale contract of the probe: the cells scan is PARTITION-PRUNED
    to the batch's probe-cell set and joined via broadcast of the batch
    — no shuffle may feed from the index scan (the only exchange is the
    final per-query top-k window over bounded candidates)."""
    import re

    from weather_etl_pipeline_spark.catalog import load_table
    from weather_etl_pipeline_spark.functions.vectors import as_double
    from weather_etl_pipeline_spark.operators.ivf_store import (
        build_ivf_index,
        probe_ivf_index,
    )

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    index = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, index)
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    out = probe_ivf_index(spark, queries, index)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert re.search(r"PartitionFilters: \[[^\]]*cell", plan), plan
    # every shuffle exchange is BATCH-side: the query-id dedupe/window
    # (hashpartitioning on query_id) or the k-row centroid fold
    # (SinglePartition). An exchange keyed on vec_id or cell would mean
    # the INDEX is being shuffled — the corpus-bound term the persisted
    # index exists to amortize.
    for line in plan.splitlines():
        if "BroadcastExchange" in line or "Exchange" not in line:
            continue
        assert "query_id" in line or "SinglePartition" in line, (
            "index-side shuffle:\n" + line + "\n" + plan
        )


def test_ivf_index_empty_corpus_bootstrap(spark, tmp_path):
    """An index built over an empty corpus (meta=-1, zero data files)
    must probe to an empty result instead of failing on schema
    inference — the ANN twin of the signature store's bootstrap path."""
    from weather_etl_pipeline_spark.operators.ivf_store import (
        build_ivf_index,
        probe_ivf_index,
        read_ivf_watermark,
    )

    index = str(tmp_path / "ivf")
    build_ivf_index(
        spark, spark.createDataFrame([], "vec_id long, e array<double>"), index
    )
    assert read_ivf_watermark(spark, index) == -1
    queries = spark.createDataFrame(
        [(0, [0.0] * 64)], "query_id long, qe array<double>"
    )
    assert probe_ivf_index(spark, queries, index).count() == 0


def test_ivf_vectorized_assign_matches_hof(spark):
    """The numpy/BLAS assignment (the large-k build path) must agree
    with the codegen'd HOF fold on real data — same argmin, same
    tie-toward-lower-cell rule (paths are ULP-different in d2, so this
    pins agreement where it matters: the chosen cell)."""
    from weather_etl_pipeline_spark.catalog import load_table
    from weather_etl_pipeline_spark.functions.vectors import as_double
    from weather_etl_pipeline_spark.operators.ivf import _assign, kmeans_centroids
    from weather_etl_pipeline_spark.operators.ivf_store import _assign_np

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    ).cache()
    cent = kmeans_centroids(emb)
    hof = {r["vec_id"]: r["cell"] for r in _assign(emb, cent).collect()}
    cent_rows = sorted(
        (int(r["cell"]), [float(x) for x in r["centroid"]])
        for r in cent.collect()
    )
    vec = {r["vec_id"]: r["cell"] for r in _assign_np(emb, cent_rows).collect()}
    emb.unpersist()
    assert vec == hof
    assert len(vec) > 0


def test_ivf_vectorized_probe_finds_exact_twin(spark, tmp_path):
    """End-to-end large-k path (k >= _VEC_ASSIGN_MIN_K: vectorized
    Lloyd's, vectorized query-cell ranking): a query that is the exact
    copy of a stored vector must land in that vector's cell and rank it
    top-1 at cosine 1.0 — build/probe assignment arithmetic must agree
    EXACTLY for this to hold."""
    from weather_etl_pipeline_spark.catalog import load_table
    from weather_etl_pipeline_spark.functions.vectors import as_double
    from weather_etl_pipeline_spark.operators.ivf_store import (
        _VEC_ASSIGN_MIN_K,
        build_ivf_index,
        probe_ivf_index,
    )

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    index = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, index, k=_VEC_ASSIGN_MIN_K)
    twins = emb.filter(F.col("vec_id").isin([5, 17, 123])).select(
        (F.col("vec_id") + 1_000_000).alias("query_id"), F.col("e").alias("qe")
    )
    top1 = {
        r["query_id"]: (r["neighbor_id"], r["cos_sim"])
        for r in probe_ivf_index(spark, twins, index, topk=1).collect()
    }
    assert top1 == {
        1_000_005: (5, 1.0),
        1_000_017: (17, 1.0),
        1_000_123: (123, 1.0),
    }


def test_simhash_store_probe_matches_exhaustive_recompute(spark, tmp_path):
    """Independent oracle for the simhash store probe: recompute the
    whole probe in plain Python from the per-doc signatures — corpus
    buckets per 16-bit chunk (first-_LSH_BUCKET_CAP by doc_id, the
    stored rank), batch chunk lookups, exact hamming at the pigeonhole
    radius — and the pair sets must be identical. Same bridge form as
    the dedup_simhash oracle bridge (test_oracle_bridges.py); the
    signatures themselves are the already-bridge-anchored simhash_df."""
    from weather_etl_pipeline_spark.catalog import load_table
    from weather_etl_pipeline_spark.operators.dedup import (
        _LSH_BUCKET_CAP,
        _SH_CHUNKS,
        simhash_df,
    )
    from weather_etl_pipeline_spark.operators.dedup_store import (
        build_signature_store,
        probe_signature_store,
    )

    sf = "/root/testdata/sf0.01"
    docs = load_table(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    batch = docs.filter(F.col("doc_id") >= 400)
    store = str(tmp_path / "store")
    build_signature_store(spark, corpus, store, family="simhash")
    got = {
        (r["new_id"], r["old_id"], r["hamming"])
        for r in probe_signature_store(
            spark, batch, store, family="simhash"
        ).collect()
    }

    def sigs(df):
        return {
            r["doc_id"]: r["simhash"]
            for r in simhash_df(
                df.select("doc_id", "text").filter(F.col("text").isNotNull())
            ).collect()
        }

    corpus_sigs, batch_sigs = sigs(corpus), sigs(batch)
    buckets: dict = {}
    for doc_id in sorted(corpus_sigs):
        sig = corpus_sigs[doc_id]
        for c in range(_SH_CHUNKS):
            key = (c, (sig >> (16 * c)) & 0xFFFF)
            buckets.setdefault(key, [])
            if len(buckets[key]) < _LSH_BUCKET_CAP:
                buckets[key].append(doc_id)
    want = set()
    for new_id, sig in batch_sigs.items():
        for c in range(_SH_CHUNKS):
            for old_id in buckets.get((c, (sig >> (16 * c)) & 0xFFFF), ()):
                h = bin(sig ^ corpus_sigs[old_id]).count("1")
                if h <= _SH_CHUNKS - 1:
                    want.add((new_id, old_id, h))
    assert got == want
    assert got, "no pairs at sf0.01 — vacuous equality"


def test_ivf_append_is_probe_visible_and_guarded(spark, tmp_path):
    """append_ivf_batch: appended vectors are assigned with the INDEX's
    centroids (no re-clustering) and become probe-visible; appending is
    equivalent to having built over the union corpus with the same
    centroids (pin: an exact-twin query of an appended vector finds it
    at cosine 1.0). Non-monotonic and torn-state appends refuse."""
    import pytest as _pytest

    from weather_etl_pipeline_spark.catalog import load_table
    from weather_etl_pipeline_spark.functions.vectors import as_double
    from weather_etl_pipeline_spark.operators.ivf_store import (
        _cells_path,
        append_ivf_batch,
        build_ivf_index,
        probe_ivf_index,
        read_ivf_watermark,
    )

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    corpus = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    index = str(tmp_path / "ivf")
    build_ivf_index(spark, corpus, index)
    # pre-append: a twin of an appended-later vector finds nothing at 1.0
    twin = batch.limit(1).select(
        (F.col("vec_id") + 1_000_000).alias("query_id"), F.col("e").alias("qe")
    )
    twin_src = batch.limit(1).collect()[0]["vec_id"]
    pre = probe_ivf_index(spark, twin, index, topk=1).collect()
    assert not any(r["neighbor_id"] == twin_src for r in pre)

    append_ivf_batch(spark, batch, index)
    assert read_ivf_watermark(spark, index) == emb.agg(
        F.max("vec_id")
    ).collect()[0][0]
    post = probe_ivf_index(spark, twin, index, topk=1).collect()
    assert [(r["neighbor_id"], r["cos_sim"]) for r in post] == [(twin_src, 1.0)]

    # non-monotonic refusal
    with _pytest.raises(ValueError, match="monotonic"):
        append_ivf_batch(spark, corpus, index)

    # torn-state refusal: simulate the mid-append crash — the intent
    # journal entry (pending_hi, written before any data write), then
    # an orphan cells row above the watermark, no commit meta
    from weather_etl_pipeline_spark.operators.ivf_store import (
        _read_meta_full,
        _write_meta,
    )

    wm0, m0, tr0, _, _, _ = _read_meta_full(spark, index)
    _write_meta(spark, index, wm0, m0, tr0, pending_hi=wm0 + 2_000_000)
    orphan = batch.limit(1).select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"), "e", F.lit(0).alias("cell")
    )
    orphan.write.mode("append").partitionBy("cell").parquet(_cells_path(index))
    with _pytest.raises(ValueError, match="torn append"):
        append_ivf_batch(
            spark,
            batch.select((F.col("vec_id") + 3_000_000).alias("vec_id"), "e"),
            index,
        )


def test_ivf_probe_full_nprobe_equals_bruteforce(spark, tmp_path):
    """nprobe = k (probe every cell) degenerates to exact brute force:
    recall@5 against an INDEPENDENT numpy cosine ground truth must be
    exactly 1.0 — an end-to-end correctness pin for the whole probe
    (cell ranking, pruning, scoring, top-k tie-break). The partial
    nprobe curve is tooling, not a contract (tools/ivf_recall.py:
    0.33/0.51/0.78/1.00 at nprobe 1/2/4/8, sf0.1)."""
    import numpy as np

    from weather_etl_pipeline_spark.catalog import load_table
    from weather_etl_pipeline_spark.functions.vectors import as_double
    from weather_etl_pipeline_spark.operators.ivf_store import (
        build_ivf_index,
        probe_ivf_index,
    )

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["e"] for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    qidx = np.argsort(ids)[:16]
    sims = Xn[qidx] @ Xn.T
    truth = {}
    for row, qi in enumerate(qidx):
        order = [j for j in np.argsort(-sims[row], kind="stable") if j != qi]
        truth[int(ids[qi])] = {int(ids[j]) for j in order[:5]}
    index = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, index, k=8)
    queries = emb.filter(
        F.col("vec_id").isin([int(ids[i]) for i in qidx])
    ).select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))
    got = probe_ivf_index(spark, queries, index, topk=5, nprobe=8).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # cosine ties at rank 5 could legitimately differ in membership;
    # compare against truth allowing tie-equivalent swaps via recall
    hits = sum(len(by_q.get(q, set()) & t) for q, t in truth.items())
    total = sum(len(t) for t in truth.values())
    assert hits == total, f"recall {hits}/{total} at nprobe=k"


def test_ivf_multi_assignment_contract(spark, tmp_path):
    """Round-9 multi-assignment (assign_m): the storage-for-recall IVF
    dial. Contract: (a) probe output has no duplicate (query, neighbor)
    rows even though vectors live in m cells; (b) at equal nprobe an
    m=2 probe's hit set is a SUPERSET of m=1's (extra visibility, never
    less); (c) nprobe=k remains exactly brute force; (d) appends
    inherit m from meta, so appended vectors are visible from both
    their cells."""
    from weather_etl_pipeline_spark.catalog import load_table
    from weather_etl_pipeline_spark.functions.vectors import as_double
    from weather_etl_pipeline_spark.operators.ivf_store import (
        append_ivf_batch,
        build_ivf_index,
        probe_ivf_index,
        _read_meta,
    )

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    m1 = str(tmp_path / "m1")
    m2 = str(tmp_path / "m2")
    # k pinned at 8: the nprobe=8 legs below rely on nprobe == k being
    # exactly brute force (build's default k is auto-sqrt(n) now)
    build_ivf_index(spark, emb, m1, k=8, assign_m=1)
    build_ivf_index(spark, emb, m2, k=8, assign_m=2)
    assert _read_meta(spark, m2)[1] == 2

    got1 = probe_ivf_index(spark, queries, m1, nprobe=2).collect()
    got2 = probe_ivf_index(spark, queries, m2, nprobe=2).collect()
    # (a) no duplicate pairs
    pairs2 = [(r["query_id"], r["neighbor_id"]) for r in got2]
    assert len(pairs2) == len(set(pairs2))
    # (b) m=2 sees every m=1 candidate cell's vectors and more: compare
    # as recall against the full-probe truth rather than raw pair sets
    # (top-k can displace), via hit counts against nprobe=k
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in probe_ivf_index(spark, queries, m2, nprobe=8).collect()
    }
    hits1 = len({(r["query_id"], r["neighbor_id"]) for r in got1} & full)
    hits2 = len(set(pairs2) & full)
    assert hits2 >= hits1
    # (c) nprobe=k == brute force: identical result from both indexes
    fullm1 = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rk"])
        for r in probe_ivf_index(spark, queries, m1, nprobe=8).collect()
    }
    fullm2 = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rk"])
        for r in probe_ivf_index(spark, queries, m2, nprobe=8).collect()
    }
    assert fullm1 == fullm2
    assert fullm1, "vacuous equality"
    # (d) append inherits m: the appended vector is found via BOTH its
    # cells — probe from the exact position of the appended vector at
    # nprobe=1 must surface it as its own (excluded) twin's neighbor
    hi = emb.agg(F.max("vec_id")).collect()[0][0]
    new_vec = emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + hi + 1).alias("vec_id"), "e"
    )
    append_ivf_batch(spark, new_vec, m2)
    assert _read_meta(spark, m2)[1] == 2
    probe0 = probe_ivf_index(
        spark,
        emb.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
        ),
        m2,
        nprobe=1,
    ).collect()
    # vec 0's exact twin (cos 1.0) must rank first
    assert any(
        r["neighbor_id"] == hi + 1 and r["rk"] == 1 for r in probe0
    ), probe0


def test_ivf_build_clamps_k_to_corpus(spark, tmp_path):
    """A bootstrap-sized corpus with the production k default must
    build (k clamps to the corpus size) and probe correctly — the
    unclamped seed loop IndexError'd mid-iteration."""
    from weather_etl_pipeline_spark.catalog import load_table
    from weather_etl_pipeline_spark.functions.vectors import as_double
    from weather_etl_pipeline_spark.operators.ivf_store import (
        build_ivf_index,
        probe_ivf_index,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    ).filter(F.col("vec_id") < 10)
    index = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, index, k=64)
    twin = emb.filter(F.col("vec_id") == 3).select(
        F.lit(999).alias("query_id"), F.col("e").alias("qe")
    )
    got = probe_ivf_index(spark, twin, index, topk=1, nprobe=10).collect()
    assert [(r["neighbor_id"], r["cos_sim"]) for r in got] == [(3, 1.0)]


def test_knn_topk_scan_equals_bruteforce(spark):
    """The BLAS-kernel scan variant must reproduce the fold baseline
    row-for-row (same ranks, same bit-exact cosines) — the kernel only
    PRUNES; the emitted scores come from the identical exact fold."""
    from weather_etl_pipeline_spark.operators.simsearch import (
        simsearch_knn_bruteforce,
        simsearch_knn_topk_scan,
    )

    sf = "/root/testdata/sf0.01"
    base = {tuple(r) for r in simsearch_knn_bruteforce(spark, sf).collect()}
    scan = {tuple(r) for r in simsearch_knn_topk_scan(spark, sf).collect()}
    assert scan == base and len(base) > 0


def test_knn_topk_scan_plan_shape(spark):
    """Scale contract of the scan variant: the corpus reaches the Arrow
    kernel with NO exchange before it (single pass over the source
    partitioning), and the pruned survivors ride broadcast joins — the
    only hash exchange in the plan belongs to the final tiny window."""
    from weather_etl_pipeline_spark.operators.simsearch import (
        simsearch_knn_topk_scan,
    )

    plan = (
        simsearch_knn_topk_scan(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    python_pos = plan.find("MapInPandas")
    assert python_pos != -1
    # kernel input side: the parquet scan feeds the python node directly —
    # in the printed tree the node's input subtree follows it, so any
    # shuffle exchange between them would appear before the first scan
    between = plan[python_pos : plan.find("Scan parquet", python_pos)]
    assert "Exchange hashpartitioning" not in between
    assert "Exchange rangepartitioning" not in between
    assert "Exchange SinglePartition" not in between
    assert plan.count("BroadcastHashJoin") >= 2


@pytest.mark.parametrize("kind", ["sig", "ivf"])
def test_store_rebuild_fails_loud_on_corrupt_meta(spark, tmp_path, kind):
    """Review fix (round 9): the watermark-floor read may skip ONLY a
    missing meta (fresh build). A present-but-unreadable meta must
    raise — silently treating a corrupt store as fresh would regress
    the committed watermark and re-open the ingest loop's replay
    self-dup window with no error anywhere."""
    import pytest as _pytest

    from weather_etl_pipeline_spark.operators.dedup_store import (
        build_signature_store,
    )
    from weather_etl_pipeline_spark.operators.ivf_store import build_ivf_index

    store = tmp_path / "store"
    (store / "meta").mkdir(parents=True)
    (store / "meta" / "part-00000.parquet").write_bytes(b"not parquet at all")
    if kind == "sig":
        docs = spark.createDataFrame(
            [(1, "one two three four")], "doc_id long, text string"
        )
        with _pytest.raises(Exception):
            build_signature_store(spark, docs, str(store))
    else:
        emb = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, e array<double>"
        )
        with _pytest.raises(Exception):
            build_ivf_index(spark, emb, str(store))


def test_ivf_probe_kernel_matches_hof_join(spark, tmp_path, monkeypatch):
    """Round-14 scoring kernel: probe_ivf_index scores candidates with
    a per-cell BLAS matmul + exact re-score (skew-proof — a cell
    holding a whole appended batch melts the per-candidate HOF cosine,
    measured 85s → ~2s at @x10/5000 in the curation sweep). The kernel
    only prunes, so its output must be BIT-IDENTICAL to the HOF-join
    fallback, duplicates-free under multi-assign, and self-match-free —
    pinned here by running the same probes with the kernel gated off
    (_VEC_SCORE_MAX_QCELLS=0 forces the fallback branch)."""
    import weather_etl_pipeline_spark.operators.ivf_store as istore
    from weather_etl_pipeline_spark.catalog import load_table
    from weather_etl_pipeline_spark.functions.vectors import as_double
    from weather_etl_pipeline_spark.operators.ivf_store import (
        build_ivf_index,
        probe_ivf_index,
    )

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    queries = emb.filter(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    for m in (1, 2):
        index = str(tmp_path / f"m{m}")
        build_ivf_index(spark, emb, index, k=8, assign_m=m)
        for topk, nprobe in ((1, 1), (5, 2)):
            kern = sorted(
                tuple(r)
                for r in probe_ivf_index(
                    spark, queries, index, topk=topk, nprobe=nprobe
                ).collect()
            )
            monkeypatch.setattr(istore, "_VEC_SCORE_MAX_QCELLS", 0)
            hof = sorted(
                tuple(r)
                for r in probe_ivf_index(
                    spark, queries, index, topk=topk, nprobe=nprobe
                ).collect()
            )
            monkeypatch.undo()
            assert kern == hof, (m, topk, nprobe)
            assert all(q != n for q, n, _, _ in kern)  # no self-matches
            pairs = [(q, n) for q, n, _, _ in kern]
            assert len(pairs) == len(set(pairs))  # no dup pairs


def test_ivf_probe_over_cap_takes_hof_fallback(spark, tmp_path, monkeypatch):
    """Round-15 judge item: the driver-collect cap must actually GATE —
    a probe whose (query, cell) work-list exceeds _VEC_SCORE_MAX_QCELLS
    must take the HOF-join path (never collect past the cap), and the
    fallback's output must match the kernel's. Pinned by setting the
    cap just below the work-list size and asserting the kernel function
    is never invoked."""
    import weather_etl_pipeline_spark.operators.ivf_store as istore
    from weather_etl_pipeline_spark.catalog import load_table
    from weather_etl_pipeline_spark.functions.vectors import as_double
    from weather_etl_pipeline_spark.operators.ivf_store import (
        build_ivf_index,
        probe_ivf_index,
    )

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    queries = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    index = str(tmp_path / "idx")
    build_ivf_index(spark, emb, index, k=8)
    kern = sorted(
        tuple(r) for r in probe_ivf_index(spark, queries, index, topk=3).collect()
    )
    # 16 queries x nprobe=1 = 16 work-list rows; cap of 15 is over-cap
    monkeypatch.setattr(istore, "_VEC_SCORE_MAX_QCELLS", 15)

    def _boom(*a, **kw):  # the kernel must not run over the cap
        raise AssertionError("kernel invoked past _VEC_SCORE_MAX_QCELLS")

    monkeypatch.setattr(istore, "_scored_cells_np", _boom)
    hof = sorted(
        tuple(r) for r in probe_ivf_index(spark, queries, index, topk=3).collect()
    )
    assert kern == hof


def test_ivf_cell_stats_surfaces_append_skew(spark, tmp_path):
    """Round-14 maintenance surface: cell-population stats expose the
    skew that out-of-distribution appends create (the probe kernel
    bounds its COST; this is how an operator SEES it and schedules the
    rebuild). Build a balanced index, append a batch that all assigns
    to one cell, assert the stats move and the rebuild hint fires."""
    import numpy as np

    from weather_etl_pipeline_spark.operators.ivf_store import (
        _SKEW_REBUILD_RATIO,
        append_ivf_batch,
        build_ivf_index,
        ivf_cell_stats,
    )

    rng = np.random.RandomState(7)
    # 16 well-separated clusters of 8 -> k=16 cells, ~8 each. k must
    # comfortably exceed the rebuild ratio: skew = max/(total/k) is
    # bounded by k, so a small-k index can NEVER trip the 8x hint —
    # which is itself correct behavior (at k=4 a "crowded" cell is at
    # most 4x mean and the quantizer is too coarse to rebalance).
    centers = np.eye(16) * 10.0
    rows = []
    i = 0
    for c in range(16):
        for _ in range(8):
            v = centers[c] + rng.randn(16) * 0.1
            rows.append((i, [float(x) for x in v]))
            i += 1
    emb = spark.createDataFrame(rows, "vec_id long, e array<double>")
    index = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, index, k=16)
    base = ivf_cell_stats(spark, index)
    assert base["trained"] and base["total_vectors"] == 128
    assert base["skew_ratio"] < 2.0 and not base["rebuild_recommended"]

    # untrained/empty index path
    empty = str(tmp_path / "empty")
    build_ivf_index(
        spark, spark.createDataFrame([], "vec_id long, e array<double>"), empty
    )
    assert ivf_cell_stats(spark, empty) == {"trained": False}

    # out-of-distribution append into ONE cluster's cell: with base
    # mean 8 and k=16, +136 gives max 144 vs mean 16.5 = 8.7x > ratio
    skew_rows = [
        (1000 + j, [float(x) for x in centers[0] + rng.randn(16) * 0.1])
        for j in range(136)
    ]
    append_ivf_batch(
        spark,
        spark.createDataFrame(skew_rows, "vec_id long, e array<double>"),
        index,
    )
    skewed = ivf_cell_stats(spark, index)
    assert skewed["max_cell"] >= 8 * _SKEW_REBUILD_RATIO
    assert skewed["skew_ratio"] >= base["skew_ratio"] * 2
    assert skewed["rebuild_recommended"] is True
    assert skewed["top_cells"][0][1] == skewed["max_cell"]
