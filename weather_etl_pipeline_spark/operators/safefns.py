"""ANSI-safe ``try_*`` function family (error-tolerant expressions).

Production pipelines over dirty data need expressions that yield NULL
instead of failing the job: ``try_divide`` for zero denominators,
``try_cast`` for malformed values. Spark's try_* functions are the
codegen-friendly form (no Python, no exception handling per row);
DuckDB replays them exactly (its float division by zero and TRY_CAST
are NULL-yielding too — verified). Pure map stage at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import hround, oracle_hround
from ..registry import register


@register(
    "try_function_profile",
    oracle=f"""
SELECT o_orderkey,
       {oracle_hround("o_totalprice / NULLIF(CAST(o_orderkey % 7 AS DOUBLE), 0.0)")}
         AS price_per_mod7,
       TRY_CAST(split_part(o_orderpriority, '-', 1) AS INT) AS priority_rank,
       TRY_CAST(o_orderstatus AS INT) AS status_as_int
FROM orders
""",
)
def try_function_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # one in seven keys manufactures a zero denominator — the NULL rows
    # prove the safe path on both engines. NULLIF in the oracle keeps
    # the division's NULL semantics explicit rather than relying on the
    # engine's div-by-zero convention.
    return orders.select(
        "o_orderkey",
        hround(
            F.try_divide(
                F.col("o_totalprice"), (F.col("o_orderkey") % 7).cast("double")
            )
        ).alias("price_per_mod7"),
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(1))
        .try_cast("int")
        .alias("priority_rank"),
        F.col("o_orderstatus").try_cast("int").alias("status_as_int"),
    )
