"""Pin the cross-engine meaning of json_extract_agg's "k".

Round-6 rework parses props ONCE via from_json('k long') (the 3×
get_json_object form re-ran the JSON parser per aggregate expression —
6× slower end-to-end — and its .cast('long') THROWS under ANSI on a
float-valued k). Jackson's long parse accepts only integral JSON
numbers; DuckDB's CAST(json_extract_string(...) AS BIGINT) would
instead round '2.9' to 3 and coerce "5" to 5, so the oracle guards on
json_type IN ('BIGINT','UBIGINT'). This matrix runs the same eight
cases through BOTH engines so any future drift fails here rather than
silently on data richer than the bundled (all-integral) testdata.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

CASES = [
    ('{"k": 7}', 7),  # integral number: extracted
    ('{"k": -3}', -3),  # negative integral: extracted
    ('{"k": "5"}', None),  # string-typed number: NULL (no coercion)
    ('{"k": 2.9}', None),  # float: NULL (no rounding)
    ('{"j": 1}', None),  # missing key
    ("bad", None),  # malformed JSON
    (None, None),  # SQL NULL
    ("5", None),  # valid non-object JSON
    ('{"k": 9223372036854775808}', None),  # int64 overflow: NULL, no error
]

_ORACLE_K = """
CASE WHEN json_type(TRY_CAST(? AS JSON), '$.k') IN ('BIGINT', 'UBIGINT')
     THEN TRY_CAST(json_extract_string(?, '$.k') AS BIGINT) END
"""


def test_k_extraction_matches_across_engines(spark):
    df = spark.createDataFrame([(p,) for p, _ in CASES], "props string")
    got = {
        r.props: r.k
        for r in df.select(
            "props", F.from_json("props", "k long").getField("k").alias("k")
        ).collect()
    }
    con = duckdb.connect()
    for props, expected in CASES:
        duck = con.execute(f"SELECT {_ORACLE_K}", [props, props]).fetchone()[0]
        assert duck == expected, (props, duck)
        assert got[props] == expected, (props, got[props])


_VARIANT_CASES = [
    ('{"k": 7}', 7),
    ('{"k": -3}', -3),
    ('{"k": "5"}', 5),  # string INTEGRAL literal: accepted on both
    ('{"k": "5.7"}', None),  # string float: rejected (regex guard)
    ('{"k": 2.9}', None),  # float: rejected (no truncate-vs-round drift)
    ('{"j": 1}', None),
    ("bad", None),
    (None, None),
    ("5", None),
    ('{"k": 9223372036854775808}', None),  # overflow number: NULL both
    ('{"k": "99999999999999999999"}', None),  # overflow string: NULL both
]

_VARIANT_ORACLE_K = """
CASE WHEN regexp_matches(
       json_extract_string(TRY_CAST(? AS JSON), '$.k'), '^-?[0-9]+$')
     THEN TRY_CAST(json_extract_string(?, '$.k') AS BIGINT) END
"""


# json_map_explode_rollup's EAV path: parse to STRING-valued map on
# both engines, keep only integral literals, TRY_CAST to int64. Each
# case is (props, expected kept (key, value) entries) — value None
# means "kept in n but overflowed the cast". Non-integral, null, bool,
# nested, and non-object payloads drop identically on both engines.
_MAP_CASES = [
    ('{"a": 7, "b": -3}', [("a", 7), ("b", -3)]),
    ('{"a": "5"}', [("a", 5)]),  # string integral: kept (text form)
    ('{"a": 2.9}', []),  # float: dropped (no rounding drift)
    ('{"a": "5.7"}', []),  # string float: dropped
    ("bad", []),  # malformed: null map both
    (None, []),  # SQL NULL
    ("5", []),  # non-object JSON: null map both
    ("[1,2]", []),  # array root: null map both
    ('{"a": 9223372036854775808}', [("a", None)]),  # overflow: kept, null val
    ('{"a": null}', []),  # JSON null value: dropped by regex
    ('{"a": [1,2]}', []),  # nested array value: JSON text, dropped
    ('{"a": {"x":1}}', []),  # nested object value: JSON text, dropped
    ('{"a": true}', []),  # bool: 'true' text, dropped
    ('{"a": ""}', []),  # empty string: dropped
]


def test_map_value_guard_matches_across_engines(spark):
    """The map-EAV rollup's per-entry guard, run on adversarial
    payloads through BOTH engines: identical kept-entry sets and
    identical cast results, including int64 overflow."""
    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [(p,) for p, _ in _MAP_CASES if p is not None] + [(None,)],
        "props string",
    )
    kv = (
        df.select(
            "props",
            F.explode(
                F.from_json("props", T.MapType(T.StringType(), T.StringType()))
            ).alias("k", "v"),
        )
        .filter(F.col("v").rlike("^-?[0-9]+$"))
        .select("props", "k", F.col("v").try_cast("long").alias("v"))
    )
    got: dict = {}
    for r in kv.collect():
        got.setdefault(r.props, []).append((r.k, r.v))
    con = duckdb.connect()
    for props, expected in _MAP_CASES:
        duck = con.execute(
            """
            SELECT e.key, TRY_CAST(e.value AS BIGINT)
            FROM (SELECT unnest(map_entries(TRY_CAST(TRY_CAST(? AS JSON)
                                            AS MAP(VARCHAR, VARCHAR)))) AS e)
            WHERE regexp_matches(e.value, '^-?[0-9]+$')
            """,
            [props],
        ).fetchall()
        assert sorted(duck) == sorted(expected), (props, duck)
        assert sorted(got.get(props, [])) == sorted(expected), (
            props,
            got.get(props),
        )


def test_variant_k_extraction_matches_across_engines(spark):
    """variant_extract_agg's k: VARIANT-extract as string, accept only
    integral literals — try_variant_get(.., 'long') would coerce "5"
    and TRUNCATE 2.9 where DuckDB's CAST ROUNDS it, so the shared
    definition is the regex-guarded string form on both engines."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(p,) for p, _ in _VARIANT_CASES], "props string")
    k_str = F.try_variant_get(F.try_parse_json("props"), "$.k", "string")
    k = F.when(k_str.rlike("^-?[0-9]+$"), k_str.try_cast("long"))
    got = {r.props: r.k for r in df.select("props", k.alias("k")).collect()}
    con = duckdb.connect()
    for props, expected in _VARIANT_CASES:
        duck = con.execute(
            f"SELECT {_VARIANT_ORACLE_K}", [props, props]
        ).fetchone()[0]
        assert duck == expected, (props, duck)
        assert got[props] == expected, (props, got[props])
