"""Set operations (extension surface X-setops).

UNION / INTERSECT / EXCEPT over key sets. Scale shape: INTERSECT and
EXCEPT compile to aggregate+join under Catalyst; for key-set semantics
at 100 TB prefer semi/anti joins on pre-deduplicated sides (which is
exactly what these plans express).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "setop_union_keys",
    oracle="""
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
UNION
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
""",
)
def setop_union_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = cust.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )
    big = orders.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("custkey")
    )
    return rich.unionByName(big).distinct()


@register(
    "setop_intersect_keys",
    oracle="""
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
INTERSECT
SELECT o_custkey AS custkey FROM orders
""",
)
def setop_intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = cust.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )
    active = orders.select(F.col("o_custkey").alias("custkey"))
    return rich.intersect(active)


@register(
    "setop_except_keys",
    oracle="""
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
""",
)
def setop_except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = cust.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )
    active = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    return rich.subtract(active)  # EXCEPT (distinct semantics)


@register(
    "setop_except_all_multiset",
    oracle="""
SELECT o_custkey AS custkey FROM orders
EXCEPT ALL
SELECT c_custkey AS custkey FROM customer
""",
)
def setop_except_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: multiset difference (a customer with 12 orders keeps
    11 copies after subtracting their 1 customer row) — the
    multiplicity-preserving variant of setop_except_keys."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return orders.select(F.col("o_custkey").alias("custkey")).exceptAll(
        cust.select(F.col("c_custkey").alias("custkey"))
    )


@register(
    "setop_union_all_counted",
    oracle="""
SELECT custkey, COUNT(*) AS n_appearances FROM (
  SELECT c_custkey AS custkey FROM customer
  UNION ALL
  SELECT o_custkey AS custkey FROM orders
) u GROUP BY custkey
""",
)
def setop_union_all_counted(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    u = cust.select(F.col("c_custkey").alias("custkey")).unionByName(
        orders.select(F.col("o_custkey").alias("custkey"))
    )
    return u.groupBy("custkey").agg(F.count(F.lit(1)).alias("n_appearances"))
