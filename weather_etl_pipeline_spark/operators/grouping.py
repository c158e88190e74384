"""Multi-dimensional grouping: ROLLUP / CUBE / PIVOT (extension surface).

Not in the reference (SURVEY.md §2.4 — plain GROUP BY only); standard
OLAP additions. All three compile to a single shuffle with expanded
grouping keys — at 100 TB the cost is (#grouping sets ×) the base
aggregation, still map-side combinable. Pivot uses an explicit value
list so the plan is static (dynamic pivot needs a driver-side distinct
pass — avoided).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, scaled_long, unscale
from ..registry import register


@register(
    "rollup_returnflag_status",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND((l_quantity) * 1, 0) AS BIGINT)) AS DOUBLE) / 1.0 AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", 0).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "cube_returnflag_status",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND((l_quantity) * 1, 0) AS BIGINT)) AS DOUBLE) / 1.0 AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", 0).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --- explicit GROUPING SETS (the general form rollup/cube specialize) --------


@register(
    "grouping_sets_flag_status",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(ROUND((l_quantity) * 1, 0) AS BIGINT)) AS DOUBLE) / 1.0 AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
""",
)
def grouping_sets_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(ROUND((l_quantity) * 1, 0) AS BIGINT)) AS DOUBLE) / 1.0 AS sum_qty
        FROM _li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


# --- TPC-H Q12 shape: two-way conditional aggregation ------------------------


@register(
    "q12_shipmode_priority",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_linestatus
""",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    window = li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    return (
        orders.join(window, orders.o_orderkey == window.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "pivot_status_by_flag",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                THEN CAST(ROUND((l_quantity) * 1, 0) AS BIGINT) END) AS DOUBLE) / 1.0 AS qty_O,
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                THEN CAST(ROUND((l_quantity) * 1, 0) AS BIGINT) END) AS DOUBLE) / 1.0 AS qty_F
FROM lineitem
GROUP BY l_returnflag
""",
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(unscale(F.sum(scaled_long("l_quantity", 0)), 0, None))
    )
    return piv.select(
        "l_returnflag",
        F.col("O").alias("qty_O"),
        F.col("F").alias("qty_F"),
    )
