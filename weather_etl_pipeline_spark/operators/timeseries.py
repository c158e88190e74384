"""Time-series resample + gap-fill (hypertable-rollup family).

The reference's domain is a weather time series; the operator its
DuckDB surface lacks is the continuous-aggregate / gap-fill shape:
resample each key's events onto a fixed grid and forward-fill through
empty buckets. Composition of built-ins:

1. hourly rollup (exact-decimal avg per bucket);
2. per-key dense grid via ``sequence(min_hour, max_hour, 1 hour)`` +
   explode — grid size is bounded by the key's time span, generated
   executor-side, never on the driver;
3. left join rollup onto grid + ``last(..., ignorenulls)`` window for
   the forward fill.

One shuffle for the rollup, one for the window — both on user_id, so
AQE can reuse the partitioning. The DuckDB oracle is the identical
formulation via generate_series + IGNORE NULLS last_value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import davg
from ..registry import register

_GAPFILL_ORACLE = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         COUNT(*) AS n_events,
         FLOOR((CAST(SUM(CAST(ROUND((value) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(value)) * 1000000.0 + 0.5) / 1000000.0 AS avg_value
  FROM events GROUP BY user_id, date_trunc('hour', ts)
),
bounds AS (
  SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY user_id
),
grid AS (
  SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM bounds
)
SELECT g.user_id, g.hour,
       COALESCE(h.n_events, 0) AS n_events,
       last_value(h.avg_value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value_ffill
FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
"""


@register("timeseries_gapfill_hourly", oracle=_GAPFILL_ORACLE, headline=True)
def timeseries_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        davg("value").alias("avg_value"),
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    joined = grid.join(
        hourly.select(
            F.col("user_id").alias("h_user"),
            F.col("hour").alias("h_hour"),
            "n_events",
            "avg_value",
        ),
        (F.col("user_id") == F.col("h_user")) & (F.col("hour") == F.col("h_hour")),
        "left",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("avg_value", ignorenulls=True).over(w).alias("value_ffill"),
    )
