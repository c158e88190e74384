"""Pin the cross-engine edit-distance semantics.

Spark's ``levenshtein`` counts CODEPOINTS; DuckDB's counts UTF-8
BYTES — 'héllo'→'hello' is 1 edit on Spark, 2 on DuckDB. The bundled
corpus is ASCII so the oracle sweep can never see it; these tests pin
(a) the raw divergence (so an engine upgrade that fixes it is
noticed), and (b) the ASCII-projection alignment used by
dedup_levenshtein_blocked, which agrees on every case.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

CASES = [
    ("kitten", "sitting", 3),
    ("", "abc", 3),
    ("abc", "", 3),
    ("", "", 0),
    ("abc", "abc", 0),
    ("ab", "ba", 2),
]

UNICODE_CASES = [
    ("héllo", "hello"),
    ("naïve café", "naive cafe"),
    ("日本語テスト", "日本語テス"),
    ("ßs", "ss"),
]


def _ascii(c):
    return F.regexp_replace(c, "[^\\x00-\\x7F]", "")


def test_ascii_levenshtein_matches(spark):
    df = spark.createDataFrame([(a, b) for a, b, _ in CASES], "a string, b string")
    got = {
        (r.a, r.b): r.d
        for r in df.select("a", "b", F.levenshtein("a", "b").alias("d")).collect()
    }
    con = duckdb.connect()
    for a, b, expected in CASES:
        duck = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert duck == expected and got[(a, b)] == expected, (a, b)


def test_unicode_divergence_is_known_and_projection_aligns(spark):
    df = spark.createDataFrame(UNICODE_CASES, "a string, b string")
    rows = df.select(
        "a",
        "b",
        F.levenshtein("a", "b").alias("raw"),
        F.levenshtein(_ascii(F.col("a")), _ascii(F.col("b"))).alias("proj"),
    ).collect()
    con = duckdb.connect()
    diverged = 0
    for r in rows:
        duck_raw = con.execute("SELECT levenshtein(?, ?)", [r.a, r.b]).fetchone()[0]
        duck_proj = con.execute(
            "SELECT levenshtein(regexp_replace(?, '[^\\x00-\\x7F]', '', 'g'),"
            " regexp_replace(?, '[^\\x00-\\x7F]', '', 'g'))",
            [r.a, r.b],
        ).fetchone()[0]
        # the ALIGNED form must always agree
        assert r.proj == duck_proj, (r.a, r.b, r.proj, duck_proj)
        if r.raw != duck_raw:
            diverged += 1
    # the RAW divergence is the documented reason the projection exists;
    # if an engine upgrade makes raw agree everywhere, this fails so the
    # projection (and the recursive-SQL caveat) can be re-evaluated
    assert diverged > 0, "raw levenshtein now agrees — drop the projection?"
