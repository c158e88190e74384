"""Pin the cross-engine tokenization primitive.

Roughly 30 text/dedup/curation oracles assume Spark's
``split(text, ' ')`` and DuckDB's ``string_split(text, ' ')`` agree —
including on the edge cases the bundled corpus never exercises (empty
string, bare/repeated/leading/trailing spaces, NULL). They do agree
today, on the full eight-case matrix below, including empty-string
elements and the distinct-count over them; this test keeps any engine
upgrade from silently un-agreeing them, the same way the JSON-k and
props-unparseable matrices pin their primitives.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

CASES = ["a b", "", " ", "a  b", " a", "a ", "a", None]


def test_split_matches_string_split(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "text string")
    got = {
        r.text: (r.t, r.n, r.nd)
        for r in df.select(
            "text",
            F.split("text", " ").alias("t"),
            F.size(F.split("text", " ")).alias("n"),
            F.size(F.array_distinct(F.split("text", " "))).alias("nd"),
        ).collect()
    }
    con = duckdb.connect()
    for text in CASES:
        duck = con.execute(
            "SELECT string_split(?, ' '), len(string_split(?, ' ')),"
            " len(list_distinct(string_split(?, ' ')))",
            [text, text, text],
        ).fetchone()
    # NULL handling: both engines propagate NULL through split/len
        if text is None:
            assert duck == (None, None, None)
            assert got[text] == (None, None, None)
        else:
            assert got[text] == (duck[0], duck[1], duck[2]), (text, duck)


def test_ascii_length_substr_match(spark):
    """The portable-hash primitives (ascii, length, substr-last-char)
    agree cross-engine INCLUDING on unicode — both are codepoint-based
    — so the portable minhash/simhash token codes are stable on any
    corpus, not just the ASCII testdata."""
    cases = ["a", "Z", "0", "é", "日", "", " "]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = {
        r.t: (r.a, r.l, r.last)
        for r in df.select(
            "t",
            F.ascii("t").alias("a"),
            F.length("t").alias("l"),
            F.ascii(F.col("t").substr(F.length("t"), F.lit(1))).alias("last"),
        ).collect()
    }
    con = duckdb.connect()
    for t in cases:
        duck = con.execute(
            "SELECT ascii(?), length(?), ascii(substr(?, length(?), 1))",
            [t] * 4,
        ).fetchone()
        assert got[t] == tuple(duck), (t, got[t], duck)
