"""Oracle bridges for the three rows-only registry entries.

``dedup_minhash_lsh``, ``dedup_simhash`` and ``simsearch_ivf_kmeans``
use hash/iteration machinery DuckDB can't replay (xxhash64, multi-pass
Lloyd's), so the driver records only a rows-only check for them. Each
has an oracle-EXACT portable twin; these tests close the loop so every
registry entry is anchored to an oracle:

- minhash: the fast path's OUTPUT is asserted equal to the portable
  twin's (which the driver verifies against DuckDB row-for-row) — the
  exact verify makes the output hash-independent wherever the two
  candidate generations agree, and at sf0.01 they agree everywhere.
- simhash: output pairs are hash-family-DEPENDENT by definition
  (hamming is a property of the signatures), so instead of the twin the
  anchor is an exhaustive independent oracle: all O(n²) signature pairs
  recomputed driver-side and compared against the emitted set.
- IVF: the fast path restricted to the portable configuration (k=8
  seeds, one Lloyd iteration) must reproduce the portable twin's
  oracle-verified assignment; the search-side top-k is anchored by the
  brute-force-recall tests in test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_minhash_fast_path_equals_portable_twin(spark):
    from weather_etl_pipeline_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_minhash_portable,
    )

    fast = {
        (r["doc_a"], r["doc_b"], r["jaccard_shingles"])
        for r in dedup_minhash_lsh(spark, SF).collect()
    }
    portable = {
        (r["doc_a"], r["doc_b"], r["jaccard_shingles"])
        for r in dedup_minhash_portable(spark, SF).collect()
    }
    # full tuple equality INCLUDING the verified jaccard: the exact
    # shingle-set verify is hash-independent, so the outputs coincide
    # wherever both hash families surface the same candidates — which
    # at sf0.01 is everywhere. (A pair candidate under only one family
    # is possible in principle; it would fail here and force a look.)
    assert fast == portable
    assert fast, "vacuous equality — no pairs at sf0.01"


def test_simhash_output_matches_exhaustive_signature_oracle(spark):
    """The emitted pair set must equal an independent driver-side
    recomputation of the full spec over the collected signatures:
    candidates = pairs among the first _LSH_BUCKET_CAP members (by
    doc_id) of any shared 16-bit chunk bucket, output = candidates
    within hamming <= 3. On this corpus the cap BINDS (the synthetic
    templates cluster signatures), so this also pins the capped
    semantics, not just the happy path. The oracle is a from-scratch
    Python reimplementation — no Spark machinery shared."""
    from weather_etl_pipeline_spark.operators.dedup import (
        _LSH_BUCKET_CAP,
        _SH_CHUNKS,
        _collapse_exact,
        dedup_simhash,
        simhash_df,
    )
    from weather_etl_pipeline_spark.catalog import load_table
    from collections import defaultdict

    reps, _ = _collapse_exact(load_table(spark, SF, "documents"))
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_df(reps).collect()}

    buckets = defaultdict(list)
    for d in sorted(sigs):
        for c in range(_SH_CHUNKS):
            buckets[(c, (sigs[d] >> (16 * c)) & 0xFFFF)].append(d)
    expected = set()
    for members in buckets.values():
        capped = members[:_LSH_BUCKET_CAP]  # deterministic first-CAP by id
        for i, a in enumerate(capped):
            for b in capped[i + 1 :]:
                h = bin(sigs[a] ^ sigs[b]).count("1")
                if h <= _SH_CHUNKS - 1:
                    expected.add((a, b, h))
    # the star-edge half of the output contract, recomputed from
    # scratch (plain Python over the raw rows, NOT _collapse_exact):
    # one (rep=min id, member, 0) edge per exact-duplicate member.
    # Empty on today's dup-free sf0.01 fixtures, but the driver
    # regenerates testdata between rounds — without this the oracle
    # would cover only half the spec.
    by_text: dict = {}
    for r in (
        load_table(spark, SF, "documents").select("doc_id", "text").collect()
    ):
        if r["text"] is not None:
            by_text.setdefault(r["text"], []).append(r["doc_id"])
    for ids in by_text.values():
        ids = sorted(set(ids))
        expected |= {(ids[0], m, 0) for m in ids[1:]}
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup_simhash(spark, SF).collect()
    }
    assert got == expected
    assert got, "vacuous equality — no pairs at sf0.01"


def test_ivf_fast_path_reproduces_portable_assignment(spark):
    """build_ivf's Lloyd machinery, run at the portable configuration
    (first-8 seeds, ONE iteration), must land every vector in the same
    cell as the oracle-verified portable twin. The twins differ only in
    centroid-mean bookkeeping (driver floats vs distributed scale-12
    decimal); a divergence would mean the quantization moved an
    assignment boundary across a data point."""
    from weather_etl_pipeline_spark.catalog import load_table
    from weather_etl_pipeline_spark.functions.vectors import as_double
    from weather_etl_pipeline_spark.operators.ivf import (
        _assign,
        kmeans_centroids,
        simsearch_ivf_portable,
    )

    emb = (
        load_table(spark, SF, "embeddings")
        .select("vec_id", as_double(F.col("embedding")).alias("e"))
        .cache()
    )
    cent = kmeans_centroids(emb, iters=1, init="first")
    fast = {
        r["vec_id"]: r["cell"]
        for r in _assign(emb, cent).select("vec_id", "cell").collect()
    }
    portable = {
        r["vec_id"]: r["cell"]
        for r in simsearch_ivf_portable(spark, SF).collect()
    }
    assert fast == portable
    assert fast, "vacuous equality — no embeddings at sf0.01"
