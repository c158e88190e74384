"""Scale-toolkit tests: bucketed zero-exchange joins, salted-join
equivalence, and the stateful streaming accumulator's convergence to
its batch twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from weather_etl_pipeline_spark.catalog import load_table
from weather_etl_pipeline_spark.sources.bucketing import (
    bucketed_join,
    salted_join,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", 8)
    write_bucketed(li, "lineitem_b", "l_orderkey", 8)
    # disable broadcast so the fact-fact (at-scale) join strategy shows:
    # at test scale AQE would happily broadcast the 1500-row orders side
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(
            spark, "lineitem_b", "orders_b", ("l_orderkey", "o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() == li.count()  # FK: every lineitem has its order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_salted_join_equivalence(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey")
    salted = salted_join(li, orders, "l_orderkey", n_salts=4)
    assert salted.count() == plain.count()
    a = plain.agg(F.sum("l_quantity"), F.sum("o_totalprice")).collect()[0]
    b = salted.agg(F.sum("l_quantity"), F.sum("o_totalprice")).collect()[0]
    assert a[0] == b[0]


def test_stateful_stream_converges_to_batch(spark, tmp_path):
    from weather_etl_pipeline_spark.streaming.stateful import (
        stream_user_totals,
        user_totals_batch,
    )

    q = stream_user_totals(spark, SF_SMOKE, checkpoint_dir=str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM user_totals").collect()
    }
    batch = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in user_totals_batch(spark, SF_SMOKE).collect()
    }
    assert set(streamed) == set(batch)
    for uid, (n, total) in batch.items():
        sn, st = streamed[uid]
        assert sn == n
        assert abs(st - total) < 1e-6


def test_partitioned_lake_prunes_partitions(spark, tmp_path):
    """A date-partitioned lake + date filter must prune at the directory
    level (PartitionFilters), not scan-and-discard."""
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    lake = str(tmp_path / "events_lake")
    ev.write.partitionBy("event_date").parquet(lake)
    df = spark.read.parquet(lake).filter(F.col("event_date") == "2024-01-02")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters")[1][:200]
    assert "event_date" in seg, "date predicate must prune partitions"
    n_days = ev.select("event_date").distinct().count()
    assert df.count() > 0 and df.count() < ev.count() / max(n_days - 1, 1) * 2


def test_compact_zone_merges_small_files(spark, tmp_path):
    """N appends -> N files per partition; compaction rewrites each
    fragmented partition to few files with identical data, and leaves
    already-compact partitions untouched."""
    from weather_etl_pipeline_spark.sources.maintenance import (
        compact_zone,
        partition_file_stats,
    )

    zone = str(tmp_path / "zone")
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    two_days = ev.filter(
        F.col("event_date").isin([F.lit("2024-01-01").cast("date"), F.lit("2024-01-02").cast("date")])
    )
    for _ in range(4):  # simulate 4 incremental runs appending small files
        two_days.coalesce(1).write.partitionBy("event_date").mode("append").parquet(zone)
    before = partition_file_stats(spark, zone)
    assert all(n >= 4 for n, _ in before.values())
    total_before = spark.read.parquet(zone).count()

    n_compacted = compact_zone(spark, zone, ("event_date",), target_file_bytes=1 << 30)
    assert n_compacted == len(before)
    after = partition_file_stats(spark, zone)
    assert set(after) == set(before)
    assert all(n == 1 for n, _ in after.values())
    assert spark.read.parquet(zone).count() == total_before
    # idempotent: second run is a no-op
    assert compact_zone(spark, zone, ("event_date",), target_file_bytes=1 << 30) == 0


def test_compact_zone_hive_escaped_partition_values(spark, tmp_path):
    """Partition values with characters Hive escapes (%xx dirs) must be
    decoded when rebuilding predicates — otherwise those partitions are
    never compacted while being reported as compacted."""
    from weather_etl_pipeline_spark.sources.maintenance import (
        compact_zone,
        partition_file_stats,
    )

    zone = str(tmp_path / "esc_zone")
    df = spark.createDataFrame(
        [(i, v) for i in range(20) for v in ["A:B", "plain", "x=y"]],
        "id long, grp string",
    )
    for _ in range(3):
        df.coalesce(1).write.partitionBy("grp").mode("append").parquet(zone)
    before = partition_file_stats(spark, zone)
    assert len(before) == 3 and all(n == 3 for n, _ in before.values())

    n = compact_zone(spark, zone, ("grp",), target_file_bytes=1 << 30)
    assert n == 3
    after = partition_file_stats(spark, zone)
    assert all(nf == 1 for nf, _ in after.values()), after
    back = spark.read.parquet(zone)
    assert back.count() == 3 * 20 * 3
    assert set(r["grp"] for r in back.select("grp").distinct().collect()) == {
        "A:B", "plain", "x=y"
    }


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE's runtime skew handling: a join where 80% of the probe side
    hits one key gets its hot partition split (SortMergeJoin(skew=true))
    — the automatic tier below explicit salting."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big = (
            spark.range(300_000)
            .withColumn(
                "key", F.when(F.col("id") % 5 != 0, F.lit(7)).otherwise(F.col("id"))
            )
            .withColumn("pad", F.lpad(F.lit("x"), 128, "y"))
        )
        small = spark.range(60_000).select(
            F.col("id").alias("key"), (F.col("id") * 2).alias("v")
        )
        j = big.join(small, "key")
        rows = len(j.collect())
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert rows == 252_000
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the skewed partition"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """At 100 TB a selective dimension-side filter should prune the fact
    scan BEFORE the shuffle. Spark's runtime bloom-filter injection does
    exactly that for non-broadcast joins: the filtered side aggregates a
    bloom filter, the big side gains a might_contain() predicate below
    the exchange. Assert injection happens and results are unchanged."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # the app-side scan threshold exists to avoid overhead on small
        # inputs; zero it so the local test corpus qualifies
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}

    def build():
        li = load_table(spark, SF_SMOKE, "lineitem")
        orders = load_table(spark, SF_SMOKE, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        filtered = build()
        plan = filtered._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        with_bloom = {(r["o_orderpriority"], r["n"]) for r in filtered.collect()}
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    plain = {(r["o_orderpriority"], r["n"]) for r in build().collect()}
    assert with_bloom == plain


def test_scale_amplifier_replicates_facts_only(spark):
    """`<dir>@xN` must amplify fact tables N-fold and leave dimension /
    other-join-side tables untouched (replicating both join sides would
    square match cardinality)."""
    base = SF_SMOKE
    li1 = load_table(spark, base, "lineitem").count()
    li3 = load_table(spark, base + "@x3", "lineitem").count()
    assert li3 == 3 * li1
    assert (
        load_table(spark, base + "@x3", "orders").count()
        == load_table(spark, base, "orders").count()
    )


def test_xn_amplifier_replicates_facts_not_dims(spark):
    """The @xN catalog path (the zero-copy scale amplifier behind every
    EXPLAINS sweep) replicates FACT tables N-fold and leaves dims at
    1x — a regression here would silently invalidate the two-decade
    evidence, so the contract is pinned."""
    from weather_etl_pipeline_spark.catalog import load_table

    base = "/root/testdata/sf0.001"
    li1 = load_table(spark, base, "lineitem").count()
    li3 = load_table(spark, base + "@x3", "lineitem").count()
    assert li3 == 3 * li1
    r1 = load_table(spark, base, "region").count()
    r3 = load_table(spark, base + "@x3", "region").count()
    assert r3 == r1  # dims stay 1x (replicating both join sides is N^2)


def test_xn_amplifier_offsets_entity_keys(spark):
    """Round-9 contract: @xN gives entity tables N× DISTINCT keys
    (replica keys offset by the stride), not N copies of each key —
    raw duplication made keyed queries semantically ambiguous and the
    @xN oracle differential unrunnable. lineitem stays raw duplication
    (its keys must keep joining unamplified orders/part/supplier)."""
    from weather_etl_pipeline_spark.catalog import _SCALE_STRIDE, load_table

    base = "/root/testdata/sf0.001"
    d1 = load_table(spark, base, "documents")
    d3 = load_table(spark, base + "@x3", "documents")
    n1, n3 = d1.count(), d3.count()
    assert n3 == 3 * n1
    assert d3.select("doc_id").distinct().count() == n3  # keys stay unique
    # replica 2 carries the base payloads under offset ids
    base_texts = {r["text"] for r in d1.collect()}
    rep2 = {
        r["text"]
        for r in d3.filter(
            (F.col("doc_id") >= 2 * _SCALE_STRIDE)
            & (F.col("doc_id") < 3 * _SCALE_STRIDE)
        ).collect()
    }
    assert rep2 == base_texts
    # events: BOTH event_id and user_id offset (distinct users per
    # replica — sessionization must never interleave replicas)
    e3 = load_table(spark, base + "@x3", "events")
    assert e3.select("event_id").distinct().count() == e3.count()
    u1 = load_table(spark, base, "events").select("user_id").distinct().count()
    assert e3.select("user_id").distinct().count() == 3 * u1
    # lineitem: raw duplication preserved (keys join unamplified orders)
    li1 = load_table(spark, base, "lineitem")
    li3 = load_table(spark, base + "@x3", "lineitem")
    assert li3.count() == 3 * li1.count()
    assert (
        li3.select("l_orderkey").distinct().count()
        == li1.select("l_orderkey").distinct().count()
    )


def test_xn_amplifier_refuses_keys_at_stride(spark, tmp_path):
    """Review fix (round 9): a base corpus whose keys reach the stride
    would make replica key ranges overlap — and because the oracle
    mirrors the same arithmetic, the differential would PASS on the
    corrupted semantics. The remap must refuse loudly at load time
    (footer stats, no scan)."""
    import pytest

    from weather_etl_pipeline_spark.catalog import _SCALE_STRIDE, load_table

    d = tmp_path / "sfbad"
    d.mkdir()
    spark.createDataFrame(
        [(0, "a b c", "en", "s", 5), (_SCALE_STRIDE + 7, "d e f", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    with pytest.raises(ValueError, match="stride"):
        load_table(spark, str(d) + "@x2", "documents")
    # plain (unamplified) load of the same table is untouched
    assert load_table(spark, str(d), "documents").count() == 2
