"""Approximate + exact distinct/quantile operators (extension X-approx).

Approximate sketches (HLL, KLL/GK) are THE scale posture for distinct
counts and quantiles at 100 TB — constant memory per group vs a full
shuffle+sort. Sketch estimates are implementation-specific, so the
approx variants carry no DuckDB oracle (driver does the rows-only
check); exact twins are registered alongside with full oracles so the
semantics are still differentially verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# --- exact distinct (oracle-verified) ----------------------------------------


@register(
    "distinct_users_exact",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
""",
)
def distinct_users_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- approximate distinct (HLL++; rows-only check) ---------------------------


@register("approx_distinct_users", oracle=None)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users")
    )


# --- exact quantiles (oracle-verified) ---------------------------------------
# Spark `percentile` and DuckDB `quantile_cont` both linearly
# interpolate over the sorted values → identical doubles for identical
# input sets; round(6) guards the final bit.


@register(
    "quantiles_exact",
    oracle="""
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.95), 6) AS p95,
       ROUND(MAX(value), 6) AS p100
FROM events GROUP BY event_type
""",
)
def quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 6).alias("p50"),
        F.round(F.percentile("value", 0.95), 6).alias("p95"),
        F.round(F.max("value"), 6).alias("p100"),
    )


# --- approximate quantiles (GK sketch; rows-only check) ----------------------


@register("approx_quantiles", oracle=None)
def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scalar double columns, not array<double> — the driver's result
    # canonicalizer requires hashable cells even for rows-only checks.
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
        F.percentile_approx("value", 0.95, 10000).alias("approx_p95"),
    )
