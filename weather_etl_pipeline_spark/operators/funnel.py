"""Funnel / sequence analysis (extension surface).

The product-analytics staple: per user, time from first signup to the
first purchase AFTER that signup. Two exact MIN aggregations (the
second conditioned on the first) — both deterministic, both map-side
combinable; the conversion latency is a single timestamp subtraction.
At 100 TB this is two passes over a user-partitioned event stream (or
one pass with a conditional-min trick); no window sort needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "funnel_signup_to_purchase",
    oracle="""
WITH s AS (
  SELECT user_id, MIN(ts) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS first_purchase_ts
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.signup_ts
  GROUP BY e.user_id
)
SELECT s.user_id, s.signup_ts, p.first_purchase_ts,
       (epoch_us(p.first_purchase_ts) - epoch_us(s.signup_ts) + 500000) // 1000000
         AS conversion_seconds
FROM s LEFT JOIN p ON s.user_id = p.user_id
""",
)
def funnel_signup_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    first_purchase = (
        signups.join(
            purchases,
            (F.col("user_id") == F.col("p_user")) & (F.col("p_ts") > F.col("signup_ts")),
        )
        .groupBy("user_id")
        .agg(F.min("p_ts").alias("first_purchase_ts"))
    )
    out = signups.join(first_purchase, "user_id", "left")
    # pure integer microseconds → half-up seconds: double epoch math has
    # ~1e-7 s ulp at epoch magnitude, enough to flip a .5-boundary
    # latency to different BIGINTs across engines; integer arithmetic
    # cannot drift (latency is always positive, so floor-div of
    # diff+500000 is exact round-half-up)
    latency = (
        F.unix_micros("first_purchase_ts") - F.unix_micros("signup_ts") + F.lit(500000)
    ).cast("long") / F.lit(1000000)
    latency = F.floor(latency).cast("long")
    return out.select(
        "user_id", "signup_ts", "first_purchase_ts", latency.alias("conversion_seconds")
    )


# --- cohort retention ---------------------------------------------------------
# The other product-analytics staple: bucket users into WEEKLY COHORTS
# by first activity, then count how many of each cohort are still
# active k weeks later. Plan: per-user first timestamp (one map-side-
# combinable MIN), distinct (user, week) activity pairs (one pre-
# aggregation that also collapses the per-user event skew before the
# join), broadcast-or-shuffle join back on user, final tiny rollup on
# (cohort_week, week_offset). At 100 TB: two aggregations + one join,
# all on user-partitioned streams — no window, no total order. Week
# arithmetic is integer epoch-day division (identical both engines);
# DuckDB's date_trunc('week') would disagree with Spark's on locale
# anchoring, so both sides use days-since-epoch // 7 directly.

_WEEK_US = 7 * 24 * 3600 * 1_000_000


@register(
    "cohort_weekly_retention",
    oracle=f"""
WITH first_seen AS (
  SELECT user_id, MIN(epoch_us(ts)) // {_WEEK_US} AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_WEEK_US} AS week
  FROM events
)
SELECT f.cohort_week, a.week - f.cohort_week AS week_offset,
       COUNT(*) AS n_active_users
FROM active a JOIN first_seen f ON a.user_id = f.user_id
GROUP BY f.cohort_week, a.week - f.cohort_week
""",
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    week = (F.unix_micros(F.col("ts")) / _WEEK_US).cast("long")
    first_seen = (
        ev.select("user_id", week.alias("week"))
        .groupBy("user_id")
        .agg(F.min("week").alias("cohort_week"))
    )
    active = ev.select("user_id", week.alias("week")).distinct()
    return (
        active.join(first_seen, "user_id")
        .select(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )
