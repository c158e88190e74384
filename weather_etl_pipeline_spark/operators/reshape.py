"""Reshaping operators: unpivot/melt + collection aggregates.

Rounds out the relational surface: UNPIVOT is PIVOT's inverse (wide →
long, a narrow executor-local transform — no shuffle), and collection
aggregation (array per group) is the embedding/feature-assembly shape.
Determinism notes: unpivot output is row-per-(input-row × column) —
exact; collected arrays are sorted so both engines agree on element
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "unpivot_part_attrs",
    oracle="""
SELECT p_partkey, attr, val FROM (
  SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
  UNION ALL
  SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part
) u
""",
)
def unpivot_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    ).unpivot(
        ids=["p_partkey"],
        values=["size", "retailprice"],
        variableColumnName="attr",
        valueColumnName="val",
    )


@register(
    "collect_sorted_orders",
    oracle="""
SELECT o_custkey,
       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS orderkeys,
       COUNT(*) AS n_orders
FROM orders
WHERE o_totalprice > 400000
GROUP BY o_custkey
""",
)
def collect_sorted_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer, their big orders' keys sorted and comma-joined —
    collect_list is unordered by contract, so sort_array pins a
    deterministic element order matching the oracle's ORDER BY; the
    array is serialized to a string because the driver's canonicalizer
    needs hashable (scalar) cells."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_totalprice") > 400000)
        .groupBy("o_custkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("o_orderkey")).cast("array<string>"), ","
            ).alias("orderkeys"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
