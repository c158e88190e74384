"""Property-based tests (hypothesis): operator semantics vs driver-side
reference implementations on randomized inputs. Spark round-trips are
expensive, so examples are few but adversarially shrunk."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# --- as-of join vs naive reference -------------------------------------------

_events = st.lists(
    st.tuples(
        st.integers(0, 2),  # user
        st.integers(0, 3600),  # ts offset seconds
        st.sampled_from(["purchase", "error"]),
    ),
    min_size=1,
    max_size=25,
)


@given(_events)
@settings(**_SETTINGS)
def test_asof_join_matches_naive(spark, ev):
    from weather_etl_pipeline_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, u, base + dt.timedelta(seconds=s), kind)
        for i, (u, s, kind) in enumerate(ev)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    left = df.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = df.filter(F.col("event_type") == "error").select("user_id", "ts")
    got = {
        r["event_id"]: r["asof_ts"]
        for r in asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="ts", carry="ts"
        ).collect()
    }
    # naive reference
    for i, u, ts, kind in rows:
        if kind != "purchase":
            continue
        cands = [t for (_, u2, t, k2) in rows if u2 == u and k2 == "error" and t <= ts]
        expected = max(cands) if cands else None
        assert got[i] == expected, (i, got[i], expected)


# --- session windows vs naive gaps-and-islands -------------------------------


@given(
    st.lists(st.integers(0, 7200), min_size=1, max_size=30),
)
@settings(**_SETTINGS)
def test_session_window_matches_naive(spark, offsets):
    gap = 600  # 10 minutes
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(seconds=s)) for i, s in enumerate(sorted(offsets))]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = sorted(
        (r["start"], r["end"], r["n"])
        for r in df.groupBy(F.session_window("ts", f"{gap} seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("start"), F.col("w.end").alias("end"), "n")
        .collect()
    )
    # naive reference
    # Spark merges an event landing exactly at prev_ts + gap (inclusive
    # boundary) — a new session starts only when the silence is STRICTLY
    # longer than the gap
    sessions = []
    cur = [rows[0][1], rows[0][1], 1]
    for _, ts in rows[1:]:
        if (ts - cur[1]).total_seconds() > gap:
            sessions.append((cur[0], cur[1] + dt.timedelta(seconds=gap), cur[2]))
            cur = [ts, ts, 1]
        else:
            cur[1] = ts
            cur[2] += 1
    sessions.append((cur[0], cur[1] + dt.timedelta(seconds=gap), cur[2]))
    assert got == sorted(sessions)


# --- metadata upsert uniqueness under arbitrary op sequences -----------------


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["silver", "gold"]),
            st.sampled_from(["Delhi", "London"]),
            st.integers(0, 2),
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_metadata_upsert_unique_under_any_sequence(spark, tmp_path_factory, ops):
    from weather_etl_pipeline_spark.plans.metadata import (
        mark_processed,
        read_metadata,
    )

    meta = str(tmp_path_factory.mktemp("meta") / "pipeline_metadata")
    for layer, city, day in ops:
        parts = spark.createDataFrame(
            [(city, dt.date(2026, 2, 10 + day))], "city string, date date"
        )
        mark_processed(spark, meta, layer, parts)
    rows = read_metadata(spark, meta).collect()
    keys = [(r["layer"], r["city"], r["date"]) for r in rows]
    assert len(keys) == len(set(keys)), "duplicate (layer, city, date) keys"
    assert set(keys) == {
        (layer, city, dt.date(2026, 2, 10 + day)) for layer, city, day in ops
    }


@given(st.lists(st.integers(0, 7200), min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_sliding_window_assignment_matches_naive(spark, offsets):
    """Every event lands in exactly width/slide epoch-aligned windows
    whose start is in (ts - width, ts]."""
    width, slide = 3600, 1800
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(seconds=s)) for i, s in enumerate(offsets)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = sorted(
        (r["start"], r["n"])
        for r in df.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("start"), "n")
        .collect()
    )
    # naive: epoch-aligned grid
    from collections import Counter

    counts = Counter()
    for _, ts in rows:
        epoch = int((ts - dt.datetime(1970, 1, 1)).total_seconds())
        last_start = (epoch // slide) * slide
        for k in range(width // slide):
            start = last_start - k * slide
            if start + width > epoch:
                counts[dt.datetime(1970, 1, 1) + dt.timedelta(seconds=start)] += 1
    assert got == sorted(counts.items())


@given(
    st.lists(
        st.tuples(
            st.integers(0, 1),  # user
            st.integers(0, 5),  # COARSE ts offset → frequent exact ties
            st.sampled_from(["purchase", "error"]),
            st.integers(0, 100),  # carry payload
        ),
        min_size=2,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_asof_join_tied_right_rows_deterministic(spark, ev):
    """Right rows tied on (key, ts) collapse to max(carry) — output is
    shuffle-order independent and matches the naive max reference."""
    from weather_etl_pipeline_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, u, base + dt.timedelta(minutes=m), kind, float(payload))
        for i, (u, m, kind, payload) in enumerate(ev)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, payload double",
    )
    left = df.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = df.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "payload"
    )
    got = {
        r["event_id"]: r["asof_payload"]
        for r in asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="ts", carry="payload"
        ).collect()
    }
    for i, u, ts, kind, _ in rows:
        if kind != "purchase":
            continue
        cands = [
            (t, p)
            for (_, u2, t, k2, p) in rows
            if u2 == u and k2 == "error" and t <= ts
        ]
        if not cands:
            expected = None
        else:
            t_max = max(t for t, _ in cands)
            expected = max(p for t, p in cands if t == t_max)
        assert got[i] == expected, (i, got[i], expected)


def test_two_level_exact_agg_matches_single_level(spark):
    """partial_by_partition must produce bit-identical sums/avgs/counts
    to the plain single-level aggregation, on any partitioning."""
    from weather_etl_pipeline_spark.functions.exact import (
        partial_by_partition,
        scaled_long,
        unscale,
    )
    from pyspark.sql import functions as F

    rows = [(i % 7, round((i * 37 % 1000) / 100 + 0.01 * (i % 3), 2)) for i in range(5000)]
    df = spark.createDataFrame(rows, "k int, v double").repartition(13)
    two = (
        partial_by_partition(df, ["k"])
        .sum_scaled(scaled_long("v"), 2, "s", round_to=None)
        .avg_scaled(scaled_long("v"), F.col("v"), 2, "a")
        .count("n")
        .finish()
    )
    one = df.groupBy("k").agg(
        unscale(F.sum(scaled_long("v")), 2, None).alias("s"),
        F.round(
            F.sum(scaled_long("v")).cast("double") / 100.0 / F.count("v"), 6
        ).alias("a"),
        F.count(F.lit(1)).alias("n"),
    )
    t = {r["k"]: (r["s"], r["a"], r["n"]) for r in two.collect()}
    o = {r["k"]: (r["s"], r["a"], r["n"]) for r in one.collect()}
    assert t == o


# --- row-level sessionization vs naive reference ------------------------------


@given(st.lists(st.integers(0, 7200), min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_sessionize_rows_matches_naive(spark, offsets):
    from weather_etl_pipeline_spark.operators.windows import _SESS_GAP_MIN

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=off), 7, "click", 1.0, None)
        for i, off in enumerate(sorted(offsets))
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.createOrReplaceTempView("events_prop")
    # run the same plan the registered query uses, against this tiny df
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = _SESS_GAP_MIN * 60 * 1_000_000
    new_sess = F.when(
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us)
        | F.lag("ts").over(w).isNull(),
        1,
    ).otherwise(0)
    got = {
        r["event_id"]: r["sess"]
        for r in df.select(
            "event_id", F.sum(new_sess).over(wr).alias("sess")
        ).collect()
    }
    # naive single-threaded reference
    want = {}
    sess = 0
    prev = None
    for i, off in enumerate(sorted(offsets)):
        ts = base + dt.timedelta(seconds=off)
        if prev is None or (ts - prev).total_seconds() > _SESS_GAP_MIN * 60:
            sess += 1
        want[i] = sess
        prev = ts
    assert got == want


# --- hround vs decimal half-up model ------------------------------------------


@given(
    st.lists(
        st.integers(-10**9, 10**9).map(lambda n: n / 10**6),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_hround_matches_decimal_half_up(spark, vals):
    """hround(x, 2) must agree with exact decimal ROUND_HALF_UP for every
    6-decimal-representable input whose double repr is exact enough to
    carry the half — the contract ~50 oracle twins rely on."""
    from decimal import ROUND_HALF_UP, Decimal

    from weather_etl_pipeline_spark.functions.exact import hround

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r["r"] for r in df.select(hround(F.col("x"), 2).alias("r")).collect()]
    for v, g in zip(vals, got):
        # model: the double nearest to v, scaled, floored at +0.5 — i.e.
        # replicate hround in exact decimal arithmetic over the DOUBLE
        # input (not the pre-double rational), which is what both
        # engines actually compute
        d = Decimal(v) * 100 + Decimal("0.5")
        want = float(d.to_integral_value(rounding="ROUND_FLOOR")) / 100
        assert g == want, (v, g, want)


# --- exact-dup collapse (the round-7 LSH front door) -------------------------
# _collapse_exact is the recall-critical primitive in front of every
# banded dedup structure: reps = one row per distinct non-null text
# (min doc_id survivor), star edges = (rep, member) once per member.
# Adversarial inputs: duplicate texts, NULL texts, and REPLICATED ROWS
# (same doc_id appearing k times — the @xN/ingest-double-write shape
# whose equality-filter regression the @x1000 sweep caught).

_corpus = st.lists(
    st.tuples(
        st.integers(0, 9),  # doc_id (collisions = replicated rows)
        st.sampled_from(["alpha beta gamma", "delta epsilon zeta", None]),
        st.integers(1, 3),  # row replication factor
    ),
    min_size=1,
    max_size=12,
)


@given(_corpus)
@settings(**_SETTINGS)
def test_collapse_exact_matches_reference(spark, corpus):
    from weather_etl_pipeline_spark.operators.dedup import _collapse_exact

    rows = [
        (doc_id, text) for doc_id, text, k in corpus for _ in range(k)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    reps_df, edges_df = _collapse_exact(docs)
    reps = {(r["doc_id"], r["text"]) for r in reps_df.collect()}
    edges = sorted(
        (r["doc_a"], r["doc_b"]) for r in edges_df.collect()
    )

    # driver-side reference: min-id rep per distinct non-null text,
    # one star edge per distinct non-rep member
    by_text: dict = {}
    for doc_id, text in rows:
        if text is not None:
            by_text.setdefault(text, set()).add(doc_id)
    want_reps = {(min(ids), t) for t, ids in by_text.items()}
    want_edges = sorted(
        (min(ids), m)
        for ids in by_text.values()
        for m in ids
        if m != min(ids)
    )
    assert reps == want_reps
    # exact list equality: replicated input rows must NOT duplicate
    # reps or edges
    assert edges == want_edges
    assert reps_df.count() == len(want_reps)


# --- signature store: append ≡ rebuild under random splits/duplication -------
# The deterministic store tests pin one split point on real data; this
# drives the contract over randomized corpora: arbitrary split
# position, duplicated TEXTS across the corpus/batch boundary (the
# collision-adversarial case for capped buckets), and duplicate texts
# WITHIN the batch. Probe(store(corpus)+append(mid)) must equal
# probe(store(corpus+mid)) exactly, for both families.

_store_words = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
)
_store_docs = st.lists(
    st.lists(_store_words, min_size=3, max_size=6),  # >=3 tokens: minhash gate
    min_size=4,
    max_size=10,
)


@given(_store_docs, st.data())
@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow  # hypothesis-randomized store equivalence ~1 min; deterministic twin in test_training_ops stays default
def test_store_append_equals_rebuild_randomized(spark, docs, data):
    import pytest as _pytest

    from weather_etl_pipeline_spark.operators.dedup_store import (
        append_signature_batch,
        build_signature_store,
        probe_signature_store,
    )

    family = data.draw(st.sampled_from(["minhash", "simhash"]))
    cut = data.draw(st.integers(1, len(docs) - 1)) if len(docs) > 1 else 1
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    schema = "doc_id long, text string"
    corpus = spark.createDataFrame(rows[:cut], schema)
    mid = spark.createDataFrame(rows[cut:], schema)
    # probe batch: fresh ids, texts drawn from the SAME pool so exact
    # twins across every boundary are likely
    probe_rows = [
        (1000 + j, " ".join(data.draw(st.lists(_store_words, min_size=3, max_size=6))))
        for j in range(2)
    ] + [(2000, rows[0][1])]  # guaranteed twin of a corpus doc
    probe = spark.createDataFrame(probe_rows, schema)

    import tempfile

    appended = tempfile.mkdtemp(prefix="prop_store_a_")
    rebuilt = tempfile.mkdtemp(prefix="prop_store_r_")
    build_signature_store(spark, corpus, appended, family=family)
    append_signature_batch(spark, mid, appended, family=family)
    build_signature_store(
        spark, corpus.unionByName(mid), rebuilt, family=family
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
    # the guaranteed twin must be found (hamming 0 / jaccard 1.0 vs doc 0)
    assert any(r[0] == 2000 and r[1] == 0 for r in got_a)
    # contract: stale re-append refuses
    with _pytest.raises(ValueError, match="monotonic"):
        append_signature_batch(spark, corpus, appended, family=family)
