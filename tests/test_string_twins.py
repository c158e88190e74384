"""Round-14 optimization guard: the Spark-SQL string twins must stay
value- AND dtype-identical to the Column-API forms they replaced.

The twins exist purely to cut plan-construction py4j round trips
(functions/exact.py string-twin note); any drift between the parsed
tree and the Column tree would silently change the cross-engine value
hash. The dtype assertions are the regression guard for the D-suffix
rule: a bare fractional literal parses as DECIMAL, not DOUBLE, and
changes the FP promotion chain even when the displayed value agrees.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_etl_pipeline_spark.functions import exact as ex
from weather_etl_pipeline_spark.functions import vectors as vec


@pytest.fixture(scope="module")
def money_df(spark):
    return spark.createDataFrame(
        [
            (1, 12345.67, 0.05, 0.08),
            (2, -98.21, 0.10, 0.00),
            (3, 0.005, 0.00, 0.04),  # sits at a rounding boundary
            (4, 9999999.99, 0.07, 0.02),
        ],
        "id long, l_extendedprice double, l_discount double, l_tax double",
    )


def _assert_twin(df, col_form, sql_form):
    out = df.select(
        col_form.alias("col_form"), F.expr(sql_form).alias("sql_form")
    )
    a, b = out.schema["col_form"].dataType, out.schema["sql_form"].dataType
    assert a == b, f"dtype drift: Column={a} vs parsed SQL={b} for {sql_form}"
    for r in out.collect():
        assert r["col_form"] == r["sql_form"], (
            f"value drift for {sql_form}: {r['col_form']} != {r['sql_form']}"
        )


def test_scaled_long_twin(money_df):
    _assert_twin(
        money_df,
        ex.scaled_long("l_extendedprice", 2),
        ex.spark_scaled_long("l_extendedprice", 2),
    )
    _assert_twin(
        money_df,
        ex.scaled_long("l_extendedprice", 0),
        ex.spark_scaled_long("l_extendedprice", 0),
    )


def test_rev_and_charge_twins(money_df):
    _assert_twin(money_df, ex.rev_scaled(), ex.spark_rev_scaled())
    _assert_twin(money_df, ex.charge_scaled(), ex.spark_charge_scaled())


def test_hround_unscale_twins(money_df):
    _assert_twin(
        money_df,
        ex.hround(F.col("l_extendedprice"), 2),
        ex.spark_hround("l_extendedprice", 2),
    )
    _assert_twin(
        money_df,
        ex.unscale(ex.scaled_long("l_extendedprice", 2), 2, 2),
        ex.spark_unscale(ex.spark_scaled_long("l_extendedprice", 2), 2, 2),
    )


def test_dsum_davg_twins(money_df):
    # aggregates: compare through a one-row global agg
    cur = money_df.agg(
        ex.dsum("l_extendedprice").alias("s"),
        ex.davg("l_extendedprice").alias("a"),
    )
    new = money_df.agg(
        F.expr(ex.spark_dsum("l_extendedprice")).alias("s"),
        F.expr(ex.spark_davg("l_extendedprice")).alias("a"),
    )
    assert cur.schema == new.schema
    assert cur.collect() == new.collect()


def test_vector_twins(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.5], [0.5, -1.0, 2.0])],
        "id long, a array<double>, b array<double>",
    )
    _assert_twin(df, vec.dot(F.col("a"), F.col("b")), vec.spark_dot("a", "b"))
    _assert_twin(df, vec.norm(F.col("a")), vec.spark_norm("a"))
    _assert_twin(
        df, vec.cosine(F.col("a"), F.col("b")), vec.spark_cosine("a", "b")
    )
    _assert_twin(
        df, vec.as_double(F.col("a")), vec.spark_as_double("a")
    )


def test_fractional_literals_carry_double_suffix():
    # the D-suffix rule itself: every fractional literal a twin emits
    # must be DOUBLE-typed, never a bare decimal literal
    import re

    for frag in (
        ex.spark_scaled_long("x", 2),
        ex.spark_hround("x", 6),
        ex.spark_unscale("x", 4, 2),
        ex.spark_dsum("x", 2),
        ex.spark_davg("x", 2, 6),
        ex.spark_rev_scaled(),
        ex.spark_charge_scaled(),
        vec.spark_dot("a", "b"),
    ):
        bare = re.findall(r"\d+\.\d+(?![\dD])", frag)
        assert not bare, f"bare fractional literal(s) {bare} in {frag}"


def test_grouped_partial_string_path_matches_column_path(money_df):
    cur = (
        ex.partial_by_partition(money_df, [])
        .sum_scaled(ex.rev_scaled(), ex.REV_D, "revenue")
        .avg_scaled(
            ex.scaled_long("l_extendedprice"), F.col("l_extendedprice"), 2, "avg_price"
        )
        .sum_long(ex.scaled_long("l_extendedprice"), "_raw")
        .count("n")
        .finish()
    )
    new = (
        ex.partial_by_partition(money_df, [])
        .sum_scaled(ex.spark_rev_scaled(), ex.REV_D, "revenue")
        .avg_scaled(
            ex.spark_scaled_long("l_extendedprice"), "l_extendedprice", 2, "avg_price"
        )
        .sum_long(ex.spark_scaled_long("l_extendedprice"), "_raw")
        .count("n")
        .finish()
    )
    assert cur.schema == new.schema
    assert cur.collect() == new.collect()
