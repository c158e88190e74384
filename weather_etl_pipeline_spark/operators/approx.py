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


# --- approximate distinct (HLL++; oracle-checked accuracy contract) ----------
# The sketch ESTIMATE is implementation-specific (DuckDB cannot replay
# Spark's HLL++), but the sketch's accuracy CONTRACT is checkable
# differentially: emit a per-group boolean "estimate within tolerance
# of the true distinct count" and have the oracle assert TRUE for every
# group by computing the exact side. rsd=0.01 → 5× slack at 0.05 keeps
# the boolean stable across partitioning/merge-order variation.

_HLL_RTOL = 0.05


@register(
    "approx_distinct_users",
    oracle="""
SELECT event_type, TRUE AS hll_within_tol
FROM events GROUP BY event_type
""",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # pre-dedup (event_type, user_id) with map-side partial aggregation,
    # then count + sketch the distinct pairs: HLL over a set equals HLL
    # over the multiset, and this avoids the expand-based distinct-agg
    # rewrite (one wide shuffle instead of an Expand of the fact rows)
    pairs = ev.groupBy("event_type", "user_id").agg(F.lit(1).alias("_one"))
    est = F.approx_count_distinct("user_id", rsd=0.01).cast("double")
    exact = F.count(F.lit(1)).cast("double")
    return pairs.groupBy("event_type").agg(
        (F.abs(est - exact) <= F.lit(_HLL_RTOL) * exact).alias("hll_within_tol")
    )


def approx_distinct_users_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw HLL++ estimates (the production query; estimates are
    implementation-specific so this form is not oracle-registerable)."""
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


# --- approximate quantiles (GK sketch; oracle-checked rank contract) ---------
# Same posture as approx_distinct_users: DuckDB cannot replay the GK
# sketch, but the sketch's RANK guarantee is checkable. For the
# returned estimate x at quantile q the check is the tie-robust rank
# interval  frac(value < x) <= q + δ  AND  frac(value <= x) >= q - δ
# (with heavy ties frac(<) and frac(<=) straddle q — comparing either
# one alone to q would false-alarm). accuracy=10000 → rank error
# <= 1e-4; δ=0.01 adds two orders of slack for merge-order variation.

_GK_RANK_TOL = 0.01


def _rank_ok(q: float, est_col: str):
    lt = F.avg((F.col("value") < F.col(est_col)).cast("double"))
    le = F.avg((F.col("value") <= F.col(est_col)).cast("double"))
    return (lt <= F.lit(q + _GK_RANK_TOL)) & (le >= F.lit(q - _GK_RANK_TOL))


@register(
    "approx_quantiles",
    oracle="""
SELECT event_type, TRUE AS p50_rank_ok, TRUE AS p95_rank_ok
FROM events GROUP BY event_type
""",
)
def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    appr = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("a50"),
        F.percentile_approx("value", 0.95, 10000).alias("a95"),
    )
    # one pass back over events per group to place the estimates'
    # ranks; avg() ignores NULL values the same way the sketch does
    return (
        ev.join(appr, "event_type")
        .groupBy("event_type")
        .agg(
            _rank_ok(0.5, "a50").alias("p50_rank_ok"),
            _rank_ok(0.95, "a95").alias("p95_rank_ok"),
        )
    )


def approx_quantiles_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw GK estimates (the production query; estimates are
    implementation-specific so this form is not oracle-registerable).
    Scalar double columns, not array<double> — the driver's result
    canonicalizer requires hashable cells even for rows-only checks."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
        F.percentile_approx("value", 0.95, 10000).alias("approx_p95"),
    )
