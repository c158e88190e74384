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
