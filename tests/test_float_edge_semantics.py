"""Pin cross-engine float edge-case behavior (NaN / ±Inf / NULL).

The stats family's oracles assume the two engines agree on double
aggregates. They do for SUM / MIN / MAX / COUNT — including the
convention that NaN is the GREATEST double (both sort it after +Inf)
and NaN poisons SUM — but interpolated PERCENTILE diverges when the
column contains non-finite values (Spark's percentile read 2.0 where
DuckDB's quantile_cont read +Inf on the same six-value column), and
the default NULL sort position differs (Spark NULLS FIRST ascending,
DuckDB NULLS LAST; harmless to the value-multiset gate, and every
ordered window in the repo orders by non-null keys).

So the precondition for the percentile-threshold operators
(stats_grouped_quantiles, stats_winsorized_mean, quality gates) is
FINITE values. This test pins both facts: the agreement set stays
agreeing, and the divergence stays known — if an engine upgrade makes
percentile agree on non-finite input, the guard below fails so the
precondition can be dropped.
"""

from __future__ import annotations

import math

import duckdb
import pyspark.sql.functions as F

VALS = [1.0, 2.0, float("nan"), float("inf"), float("-inf"), None]


def _duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in VALS])
    return con


def test_basic_double_aggregates_agree(spark):
    df = spark.createDataFrame([(v,) for v in VALS], "v double")
    r = df.agg(
        F.sum("v").alias("s"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.count("v").alias("n"),
    ).collect()[0]
    d = _duck().execute("SELECT SUM(v), MIN(v), MAX(v), COUNT(v) FROM t").fetchone()
    assert math.isnan(r.s) and math.isnan(d[0])
    assert r.mn == d[1] == float("-inf")
    assert math.isnan(r.mx) and math.isnan(d[2])  # NaN > +Inf on both
    assert r.n == d[3] == 5


def test_percentile_divergence_on_nonfinite_is_known(spark):
    df = spark.createDataFrame([(v,) for v in VALS], "v double")
    sp = df.agg(F.expr("percentile(v, 0.5)").alias("p")).collect()[0].p
    du = _duck().execute("SELECT quantile_cont(v, 0.5) FROM t").fetchone()[0]
    # the documented divergence: if this starts agreeing, the finite-
    # values precondition on the percentile-threshold operators can go
    assert sp != du, "percentile now agrees on non-finite input — drop the precondition?"


def test_percentile_agrees_on_finite_values(spark):
    finite = [1.0, 2.5, 3.0, 10.0, None]
    df = spark.createDataFrame([(v,) for v in finite], "v double")
    sp = df.agg(F.expr("percentile(v, 0.5)").alias("p")).collect()[0].p
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in finite])
    du = con.execute("SELECT quantile_cont(v, 0.5) FROM t").fetchone()[0]
    assert sp == du  # NULLs excluded, interpolation identical


def test_scaled_long_floor_form_equals_bigdecimal_round(spark):
    """Round-9 hot-path change: scaled_long moved from ROUND (per-row
    BigDecimal in Spark codegen — measured ~40% of q1) to
    FLOOR(x*10^d + 0.5). On fixed-scale data the two are exactly equal
    (true scaled values are integers ± ulp noise, never half-integers)
    — pinned here over a value grid including negatives, zero, and the
    repr-hostile decimals that motivated hround."""
    from pyspark.sql import functions as F

    from weather_etl_pipeline_spark.functions.exact import scaled_long

    # in-contract grid ONLY (<= 2 decimals): a 3-decimal value like
    # 2.675 scales to an exact half-integer (-267.5), where HALF_UP and
    # floor(+0.5) legitimately split on negatives — that case is
    # outside scaled_long's documented precondition for BOTH forms
    # (the old ROUND form silently mis-scaled it too)
    vals = [
        0.0, 0.01, -0.01, 123.45, -123.45, 0.07, -0.07, 1e7 - 0.01,
        -(1e7 - 0.01), 4781.25, -4781.25, 0.29, 999999.99, -999999.99,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.select(
        scaled_long("x", 2).alias("floor_form"),
        F.round(F.col("x") * 100, 0).cast("long").alias("round_form"),
    ).collect()
    for r in got:
        assert r["floor_form"] == r["round_form"], r
