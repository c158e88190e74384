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


# --- three-step ordered funnel -----------------------------------------------
# The general N-step funnel shape: each stage is the MIN timestamp of
# the stage event STRICTLY AFTER the previous stage's timestamp —
# chained conditional mins, one per stage, every aggregation map-side
# combinable and keyed on user. At scale: three slim per-type
# aggregates joined on user_id (each output is one row per user), never
# a window over the raw event stream. Conversion latency in exact
# integer seconds from epoch micros.


@register(
    "funnel_three_step",
    oracle="""
WITH s AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'page' AND e.ts > s.t1
  GROUP BY e.user_id
),
b AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN p ON e.user_id = p.user_id
  WHERE e.event_type = 'purchase' AND e.ts > p.t2
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_signup,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_paged,
       CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_converted,
       CAST((SELECT SUM((epoch_us(b.t3) - epoch_us(s.t1)) // 1000000)
             FROM b JOIN s ON b.user_id = s.user_id) AS BIGINT)
         AS total_conversion_seconds
""",
)
def funnel_three_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "page")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .join(p, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    secs = F.floor(
        (F.unix_micros(F.col("t3")) - F.unix_micros(F.col("t1"))) / 1_000_000
    )
    conv = b.join(s, "user_id").agg(
        F.sum(secs).alias("total_conversion_seconds")
    )
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(F.broadcast(p.agg(F.count(F.lit(1)).alias("n_paged"))))
        .crossJoin(F.broadcast(b.agg(F.count(F.lit(1)).alias("n_converted"))))
        .crossJoin(F.broadcast(conv))
        .select("n_signup", "n_paged", "n_converted", "total_conversion_seconds")
    )
