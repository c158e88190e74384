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
