"""Date/time scalar-function family (extension of F-strptime/F-cast).

The reference touches exactly one temporal function (STRPTIME,
``silver.py:31`` — covered by silver_clean_events); a real analytics
surface needs the full calendar toolbox. One projection exercises the
family end-to-end: truncation, calendar parts, day-of-week, ISO week,
day arithmetic, and month arithmetic with end-of-month clamping.

Cross-dialect notes (each verified against DuckDB before use):

- Spark ``dayofweek`` is 1-based Sunday=1; DuckDB ``dayofweek`` is
  0-based Sunday=0 — we publish the 0-based form (Spark value − 1).
- Both engines' ISO week agrees (``weekofyear`` vs ``week``).
- Spark ``add_months`` and DuckDB ``+ INTERVAL n MONTH`` both clamp to
  the last day of short months (Jan 31 + 1 → Feb 28).
- Spark ``datediff(end, start)`` truncates timestamps to dates; the
  oracle uses ``datediff('day', …)`` which counts day boundaries — the
  same value for date-typed input.

Per-row projection, no shuffle: at 100 TB this is a pure map stage
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "datetime_function_profile",
    oracle="""
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(dayofmonth(o_orderdate) AS INT) AS dom,
       CAST(dayofweek(o_orderdate) AS INT) AS dow0,
       CAST(week(o_orderdate) AS INT) AS iso_week,
       CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS INT)
         AS days_since_anchor,
       last_day(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE)) AS plus3m_month_end
FROM orders
""",
)
def datetime_function_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.trunc(d, "month").alias("month_start"),
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        (F.dayofweek(d) - F.lit(1)).cast("int").alias("dow0"),
        F.weekofyear(d).alias("iso_week"),
        F.datediff(d, F.lit("1992-01-01").cast("date")).alias("days_since_anchor"),
        F.last_day(F.add_months(d, 3)).alias("plus3m_month_end"),
    )


# --- weekday seasonality ------------------------------------------------------
# Order-volume seasonality by ISO weekday. The cross-engine trap is the
# weekday NUMBERING (Spark dayofweek is 1=Sunday, DuckDB dayofweek is
# 0=Sunday): both sides use the ISO convention explicitly — Spark
# weekday()+1 == DuckDB isodow — so Monday=1 everywhere. Shares come
# from a windowed sum over the 7-row aggregate.


@register(
    "orders_weekday_seasonality",
    oracle="""
WITH d AS (
  SELECT CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_weekday,
         o_totalprice
  FROM orders
),
agg AS (
  SELECT iso_weekday, COUNT(*) AS n_orders,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM d GROUP BY iso_weekday
)
SELECT iso_weekday, CAST(n_orders AS BIGINT) AS n_orders,
       FLOOR(CAST(n_orders AS DOUBLE) / SUM(n_orders) OVER ()
             * 1000000.0 + 0.5) / 1000000.0 AS order_share,
       CAST(cents AS BIGINT) AS revenue_cents
FROM agg
""",
)
def orders_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.exact import scaled_long

    orders = load_table(spark, sf_dir, "orders")
    agg = (
        orders.select(
            (F.weekday(F.col("o_orderdate").cast("date")) + 1)
            .cast("long")
            .alias("iso_weekday"),
            scaled_long("o_totalprice", 2).alias("_cents"),
        )
        .groupBy("iso_weekday")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("_cents").alias("cents"),
        )
    )
    # windowed share over the 7-row aggregate (empty over() == whole frame)
    w = Window.partitionBy()
    share = (
        F.floor(
            F.col("n_orders").cast("double")
            / F.sum("n_orders").over(w)
            * 1_000_000.0
            + 0.5
        )
        / 1_000_000.0
    )
    return agg.select(
        "iso_weekday",
        "n_orders",
        share.alias("order_share"),
        F.col("cents").alias("revenue_cents"),
    )
