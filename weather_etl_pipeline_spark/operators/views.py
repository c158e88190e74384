"""SQL-API surface: views + DESCRIBE (reference ops D-view / D-desc).

The reference's notebook registers a view over raw parquet and
introspects its schema (``sql-data-cleaning.ipynb`` cells ``21109f40``,
``48867dcc``). Spark equivalent: temp views + ``spark.sql`` — Catalyst
produces the identical plan to the DataFrame API, so this module also
serves as the SQL-entry-point demonstration for the whole engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..registry import register


@register(
    "sql_over_view",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND((o_totalprice) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS total
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
""",
)
def sql_over_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE VIEW over files + SQL query through it (D-view)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_view")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND((o_totalprice) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS total
        FROM orders_view
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
        """
    )


def describe_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Schema introspection (D-desc): DESCRIBE over a registered view."""
    load_table(spark, sf_dir, name).createOrReplaceTempView(f"{name}_desc_view")
    return spark.sql(f"DESCRIBE {name}_desc_view")
