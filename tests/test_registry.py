"""Registry-wide smoke: every registered query must ANALYZE cleanly at
sf0.001 (schema resolution, type checking — catches API breakage in any
operator without paying full execution; the oracle differential in
tools/diffcheck.py covers value correctness)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from weather_etl_pipeline_spark.registry import load_all


def test_every_query_analyzes(spark):
    reg = load_all()
    assert len(reg) >= 70
    failures = {}
    for name, q in sorted(reg.items()):
        try:
            df = q.fn(spark, SF_SMOKE)
            _ = df.schema  # forces analysis
            assert df.columns, "no columns"
        except Exception as e:  # noqa: BLE001 — collect all failures
            failures[name] = repr(e)[:200]
    assert not failures, failures


def test_oracle_columns_match_spark_columns(spark):
    """The driver's compare sorts columns BY NAME before hashing values:
    a Spark alias that drifts from its oracle twin hash-mismatches even
    with identical values. Catch that contract break at analysis time —
    no execution on either engine."""
    import duckdb

    from weather_etl_pipeline_spark.schemas import TESTDATA_TABLES

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    reg = load_all()
    failures = {}
    for name, q in sorted(reg.items()):
        if q.oracle is None:
            continue
        try:
            oracle_cols = sorted(
                r[0] for r in con.execute(f"DESCRIBE {q.oracle}").fetchall()
            )
            spark_cols = sorted(q.fn(spark, SF_SMOKE).columns)
            if oracle_cols != spark_cols:
                failures[name] = f"spark={spark_cols} oracle={oracle_cols}"
        except Exception as e:  # noqa: BLE001
            failures[name] = repr(e)[:200]
    assert not failures, failures


def test_oracle_sql_parses_in_duckdb():
    import duckdb

    from weather_etl_pipeline_spark.schemas import TESTDATA_TABLES

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    reg = load_all()
    failures = {}
    for name, q in sorted(reg.items()):
        if q.oracle is None:
            continue
        try:
            con.execute(f"DESCRIBE {q.oracle}")
        except Exception as e:  # noqa: BLE001
            failures[name] = repr(e)[:200]
    assert not failures, failures
