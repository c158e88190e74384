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
