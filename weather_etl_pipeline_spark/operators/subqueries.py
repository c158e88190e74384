"""Subquery shapes (extension surface): scalar subquery, IN-subquery,
correlated EXISTS — the remaining SQL-surface coverage. Catalyst
decorrelates these into joins (visible in the plans: scalar subquery →
broadcast of a 1-row aggregate; IN → left semi).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "subquery_scalar_vs_avg",
    oracle="""
SELECT o_orderkey, o_totalprice,
       FLOOR((o_totalprice / (SELECT FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0 FROM orders)) * 1000000.0 + 0.5) / 1000000.0 AS price_vs_avg
FROM orders
WHERE o_totalprice > 1.5 * (SELECT FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0 FROM orders)
""",
)
def subquery_scalar_vs_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders at >1.5x the average price, with price/avg ratio.

    The average is an exact-decimal-sum single division rounded to 6 —
    deterministic — then each row does one more division (also rounded).
    """
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_orders_scalar")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               FLOOR((o_totalprice / (SELECT FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) * 1E6 + CAST(0.5 AS DOUBLE)) / 1E6 FROM _orders_scalar)) * 1E6 + CAST(0.5 AS DOUBLE)) / 1E6 AS price_vs_avg
        FROM _orders_scalar
        WHERE o_totalprice > 1.5 * (SELECT FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) * 1E6 + CAST(0.5 AS DOUBLE)) / 1E6 FROM _orders_scalar)
        """
    )


@register(
    "subquery_correlated_min",
    oracle="""
SELECT p_partkey, p_type, p_retailprice
FROM part p
WHERE p_retailprice = (
  SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
)
""",
)
def subquery_correlated_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-shaped correlated MIN: parts priced at their type's
    minimum. The window-min formulation is the decorrelated plan
    Catalyst itself would produce — one shuffle on the correlation key."""
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_type")
    return (
        part.withColumn("_min_price", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("_min_price"))
        .select("p_partkey", "p_type", "p_retailprice")
    )


@register(
    "subquery_in_segment",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
""",
)
def subquery_in_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → Catalyst left semi join."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return orders.join(
        building, orders.o_custkey == building.c_custkey, "left_semi"
    ).select("o_orderkey", "o_custkey", "o_totalprice")
