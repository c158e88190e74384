"""Format round-trips: CSV / JSON-lines / ORC carry the silver schema
losslessly; Delta degrades cleanly when jars are absent."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from weather_etl_pipeline_spark.catalog import load_table
from weather_etl_pipeline_spark.sources.formats import (
    read_csv,
    read_jsonl,
    read_orc,
    try_delta_writer,
    write_csv,
    write_jsonl,
    write_orc,
)


def _sample(spark):
    return load_table(spark, SF_SMOKE, "orders").limit(200)


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip(spark, tmp_path):
    df = _sample(spark)
    write_csv(df, str(tmp_path / "csv"))
    back = read_csv(spark, str(tmp_path / "csv"), df.schema)
    assert back.schema == df.schema
    assert _multiset(back) == _multiset(df)


def test_jsonl_roundtrip(spark, tmp_path):
    df = _sample(spark)
    write_jsonl(df, str(tmp_path / "json"))
    back = read_jsonl(spark, str(tmp_path / "json"), df.schema)
    assert _multiset(back) == _multiset(df)


def test_orc_roundtrip(spark, tmp_path):
    df = _sample(spark)
    write_orc(df, str(tmp_path / "orc"))
    back = read_orc(spark, str(tmp_path / "orc"))
    assert back.schema == df.schema
    assert _multiset(back) == _multiset(df)


def test_delta_degrades_cleanly(spark, tmp_path):
    assert try_delta_writer(_sample(spark), str(tmp_path / "delta")) is False


def test_python_datasource_weather_obs(spark):
    """Spark 4 Python DataSource: partition-per-city executor-side
    generation, deterministic re-reads, pipeline-compatible schema."""
    from weather_etl_pipeline_spark.plans.pipeline import clean_bronze
    from weather_etl_pipeline_spark.sources import weather_source

    weather_source.register(spark)
    df = (
        spark.read.format("weather_obs")
        .option("date", "2026-02-13")
        .option("hours", "6")
        .option("cities", "Delhi,London")
        .load()
    )
    rows = df.collect()
    assert len(rows) == 2 * 6
    assert {r["city"] for r in rows} == {"Delhi", "London"}
    # deterministic: a second read returns identical data
    again = (
        spark.read.format("weather_obs")
        .option("date", "2026-02-13")
        .option("hours", "6")
        .option("cities", "Delhi,London")
        .load()
        .collect()
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # feeds straight into the silver projection (bronze-compatible shape)
    from pyspark.sql import functions as F

    silver = clean_bronze(df.withColumn("date", F.to_date(F.substring("time", 1, 10))))
    assert silver.count() == 12


def test_binaryfile_ingestion_feeds_featurize(spark, tmp_path):
    """binaryFile source -> multimodal layout -> mapInPandas featurize:
    the real binary ingestion path end-to-end (magic numbers sniffed)."""
    from weather_etl_pipeline_spark.operators.multimodal import (
        _FEATURIZE_SCHEMA,
        featurize_batches,
        ingest_binary_dir,
    )

    d = tmp_path / "blobs"
    d.mkdir()
    png = b"\x89PNG\r\n\x1a\n" + bytes(range(64))
    jpeg = b"\xff\xd8\xff\xe0" + bytes(range(32))
    (d / "img_1.png").write_bytes(png)
    (d / "img_2.jpg").write_bytes(jpeg)
    (d / "note_3.txt").write_bytes(b"hello world")

    ingested = ingest_binary_dir(spark, str(d))
    assert ingested.count() == 3
    import pyspark.sql.functions as F

    with_id = ingested.withColumn(
        "doc_id", F.regexp_extract("file_name", r"_(\d+)\.", 1).cast("long")
    ).select("doc_id", "blob")
    feats = {
        r["doc_id"]: r
        for r in with_id.mapInPandas(featurize_batches, schema=_FEATURIZE_SCHEMA).collect()
    }
    assert feats[1]["format_guess"] == "png" and feats[1]["n_bytes"] == len(png)
    assert feats[2]["format_guess"] == "jpeg"
    assert feats[3]["format_guess"] == "bin"
    assert feats[3]["header_sum"] == sum(b"hello world"[:16])


def test_corrupt_json_records_are_captured(spark):
    """Data-quality surface: PERMISSIVE JSON parsing routes malformed
    rows to the corrupt-record column instead of failing the job."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    rows = [
        ('{"k": 1}',),
        ('{"k": broken',),   # malformed
        ('{"k": 3}',),
        ("not json at all",),
    ]
    df = spark.createDataFrame(rows, "props string")
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    parsed = df.withColumn(
        "p",
        F.from_json(
            "props", schema, {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"}
        ),
    )
    ok = parsed.filter(F.col("p._corrupt").isNull()).count()
    bad = parsed.filter(F.col("p._corrupt").isNotNull()).count()
    assert (ok, bad) == (2, 2)
    assert sorted(
        r["k"] for r in parsed.filter(F.col("p._corrupt").isNull()).select("p.k").collect()
    ) == [1, 3]


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Lake schema evolution: files written before a column existed must
    coexist with newer files — mergeSchema unions the schemas and
    back-fills NULL for the missing column (the additive-evolution
    contract a long-lived corpus depends on)."""
    zone = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "alpha")], "doc_id long, text string"
    ).write.mode("append").parquet(zone)
    spark.createDataFrame(
        [(2, "beta", "en")], "doc_id long, text string, lang string"
    ).write.mode("append").parquet(zone)

    merged = spark.read.option("mergeSchema", "true").parquet(zone)
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    rows = {r["doc_id"]: r["lang"] for r in merged.collect()}
    assert rows == {1: None, 2: "en"}


def test_jsonl_sink_datasource_writer(spark, tmp_path):
    """Custom Python DataSource writer: executor part files + driver
    commit manifest; every row lands exactly once in published parts."""
    import json
    import os

    from weather_etl_pipeline_spark.sources.jsonl_sink import register_jsonl_sink

    register_jsonl_sink(spark)
    out = str(tmp_path / "jsonl_out")
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    ).repartition(4)
    df.write.format("jsonl_sink").option("path", out).mode("append").save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total"] == 100
    seen = []
    for part in sorted(os.listdir(out)):
        if part.endswith(".jsonl"):
            with open(os.path.join(out, part)) as f:
                seen += [json.loads(line)["doc_id"] for line in f]
    assert sorted(seen) == list(range(100))
    assert len(manifest["parts"]) == 4


def test_compact_partitions_reduces_files_preserves_rows(spark, tmp_path):
    """Fragmented partitions (20 files each) compact to 1 file per
    partition at this size, with the exact same row multiset."""
    from pathlib import Path

    from weather_etl_pipeline_spark.sources.parquet_io import (
        compact_partitions,
    )

    from pyspark.sql import functions as F

    src = str(tmp_path / "zone")
    dst = str(tmp_path / "compacted")
    df = spark.range(2000).selectExpr(
        "CAST(id % 2 AS STRING) AS city",
        "CAST(id % 2 AS STRING) AS date",
        "id AS v",
    )
    # 20 tiny files per partition
    df.repartition(20).write.partitionBy("city", "date").parquet(src)
    n_files_before = len(list(Path(src).rglob("*.parquet")))
    assert n_files_before >= 40

    n = compact_partitions(spark, src, dst)
    assert n == 2
    n_files_after = len(list(Path(dst).rglob("*.parquet")))
    assert n_files_after == 2  # tiny partitions -> 1 file each

    a = spark.read.parquet(src).groupBy("city", "date").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    b = spark.read.parquet(dst).groupBy("city", "date").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_compact_partitions_splits_large_partition(spark, tmp_path):
    """A partition above the byte target fans out to multiple files."""
    from pathlib import Path

    from weather_etl_pipeline_spark.sources.parquet_io import (
        compact_partitions,
    )

    src = str(tmp_path / "zone2")
    dst = str(tmp_path / "compacted2")
    df = spark.range(20000).selectExpr(
        "'x' AS city", "'d' AS date", "id AS v", "uuid() AS pad"
    )
    df.repartition(4).write.partitionBy("city", "date").parquet(src)
    compact_partitions(spark, src, dst, target_file_bytes=64 * 1024)
    files = [p for p in Path(dst).rglob("*.parquet")]
    assert len(files) > 1  # re-binned into multiple target-size files
    assert spark.read.parquet(dst).count() == 20000


def test_compact_partitions_sorted_tightens_file_stats(spark, tmp_path):
    """With sort_cols, each output file covers a disjoint key range —
    parquet min/max footer stats become selective (the data-skipping
    payoff), vs the unsorted layout where every file spans ~the whole
    domain."""
    from pathlib import Path

    import pyarrow.parquet as pq

    from weather_etl_pipeline_spark.sources.parquet_io import (
        compact_partitions,
    )

    src = str(tmp_path / "zone3")
    sorted_dst = str(tmp_path / "sorted")
    df = spark.range(40000).selectExpr(
        "'x' AS city", "'d' AS date", "id AS v", "uuid() AS pad"
    )
    df.repartition(8).write.partitionBy("city", "date").parquet(src)
    compact_partitions(
        spark, src, sorted_dst, target_file_bytes=256 * 1024, sort_cols=("v",)
    )
    files = sorted(Path(sorted_dst).rglob("*.parquet"))
    assert len(files) > 1
    spans = []
    for f in files:
        md = pq.ParquetFile(str(f)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["v"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    # disjoint, ordered ranges: each file's max < next file's min
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2
    # and together they cover the domain with no loss
    assert spark.read.parquet(sorted_dst).count() == 40000
