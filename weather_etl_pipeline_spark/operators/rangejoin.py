"""Range (interval) join — another operator Spark lacks natively.

"For each left event, match right events with ts in (left.ts,
left.ts + W]" — the naive form is a cross join with a theta filter
(O(n·m)). The scalable composition buckets both sides by W-sized time
cells: a right event in (t, t+W] must live in the left event's cell or
the next one, so the equi-join key (key, cell) bounds candidates to two
cells per left row, then the exact theta filter runs on that small
candidate set. Same pattern generalizes to numeric ranges and as-of
tolerances; the bucket width is the selectivity dial.

Demo: purchases within 1 hour after each signup, per user. Oracle =
correlated count (deterministic integer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_W_SEC = 3600


@register(
    "range_join_purchases_after_signup",
    oracle=f"""
SELECT s.event_id, s.user_id, s.ts,
       (SELECT COUNT(*) FROM events p
        WHERE p.user_id = s.user_id AND p.event_type = 'purchase'
          AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL {_W_SEC} SECOND) AS n_purchases_1h
FROM events s
WHERE s.event_type = 'signup'
""",
)
def range_join_purchases_after_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cell = lambda c: F.floor(F.unix_timestamp(c) / _W_SEC)  # noqa: E731
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts", cell(F.col("ts")).alias("cell0")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        cell(F.col("ts")).alias("p_cell"),
    )
    # a purchase in (ts, ts+W] sits in the signup's cell or the next one
    probed = signups.withColumn(
        "probe_cell", F.explode(F.array(F.col("cell0"), F.col("cell0") + 1))
    )
    matched = (
        probed.join(
            purchases,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_cell") == F.col("probe_cell")),
            "left",
        )
        .withColumn(
            "hit",
            F.when(
                (F.col("p_ts") > F.col("ts"))
                & (F.col("p_ts") <= F.col("ts") + F.expr(f"INTERVAL {_W_SEC} SECOND")),
                1,
            ).otherwise(0),
        )
        .groupBy("event_id", "user_id", "ts")
        .agg(F.sum("hit").alias("n_purchases_1h"))
    )
    return matched
