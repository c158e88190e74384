"""Pin the cross-engine meaning of "props_unparseable".

The advisor flagged (round 5) that PERMISSIVE from_json silently returns a
non-null all-null struct for malformed JSON, so a null-check on the parsed
struct undercounts versus DuckDB's TRY_CAST(props AS JSON) IS NULL.  The
operator now uses try_parse_json (Spark 4 VARIANT), whose NULL-on-malformed
semantics match DuckDB exactly — including the two subtle corners: NULL input
counts as unparseable on both engines, and valid non-object JSON ('5',
'[1,2]') counts as parseable on both.  This test runs the same six-case
matrix through BOTH engines so any future drift fails loudly here rather
than silently on real data (the bundled testdata has zero malformed props,
so the oracle sweep alone can never catch it).
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

CASES = [
    ("not json", True),  # plain text: unparseable
    ('{"k":1}', False),  # object: valid
    ("5", False),  # scalar JSON: VALID on both engines
    ("[1,2]", False),  # array JSON: VALID on both engines
    (None, True),  # SQL NULL: counts as unparseable on both
    ('{"k":', True),  # truncated object: unparseable
]


def test_try_parse_json_matches_duckdb_try_cast(spark):
    df = spark.createDataFrame([(p,) for p, _ in CASES], "props string")
    got = {
        r.props: r.bad
        for r in df.select(
            "props", F.try_parse_json("props").isNull().alias("bad")
        ).collect()
    }
    con = duckdb.connect()
    for props, expected in CASES:
        duck = con.execute(
            "SELECT TRY_CAST(? AS JSON) IS NULL", [props]
        ).fetchone()[0]
        assert duck == expected, (props, duck)
        assert got[props] == expected, (props, got[props])


def test_null_profile_counts_malformed_props(spark, tmp_path):
    """End-to-end: a lake with malformed props reports them as unparseable."""
    from weather_etl_pipeline_spark.operators.relational import (
        events_null_profile,
    )

    rows = [
        (1, "click", 1.0, '{"k": 1}'),
        (2, "click", 2.0, "not json"),
        (3, "view", None, None),
        (4, "view", 3.0, "[1,2]"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.timestamp_seconds(F.col("user_id") * 3600))
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    prof = {
        r.col: r.n_null
        for r in events_null_profile(spark, str(tmp_path)).collect()
    }
    assert prof["props_unparseable"] == 2  # 'not json' + NULL
    assert prof["value"] == 1
    assert prof["user_id"] == 0
