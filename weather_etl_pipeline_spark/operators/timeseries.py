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
from ..functions.exact import davg, hround, spark_davg
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
    # string-twin expressions (round 14): identical parsed trees, fewer
    # py4j round trips — see functions/exact.py string-twin note
    hourly = ev.groupBy(
        "user_id", F.expr("date_trunc('hour', ts) AS hour")
    ).agg(
        F.expr("COUNT(1)").alias("n_events"),
        F.expr(spark_davg("value")).alias("avg_value"),
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.expr("MIN(hour)").alias("h0"), F.expr("MAX(hour)").alias("h1"))
        .selectExpr(
            "user_id", "explode(sequence(h0, h1, INTERVAL 1 HOUR)) AS hour"
        )
    )
    joined = grid.join(
        hourly.selectExpr(
            "user_id AS h_user", "hour AS h_hour", "n_events", "avg_value"
        ),
        F.expr("user_id = h_user AND hour = h_hour"),
        "left",
    )
    return joined.selectExpr(
        "user_id",
        "hour",
        "COALESCE(n_events, 0) AS n_events",
        "last(avg_value, true) OVER (PARTITION BY user_id ORDER BY hour"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill",
    )


# --- linear interpolation through gaps ---------------------------------------
# The other half of the gap-fill family: instead of carrying the last
# observation forward, interior gaps get the straight line between the
# surrounding observations (the timeseries-db "interpolate()" shape).
# Same spine plan as gapfill (rollup → per-key grid → left join), plus
# two windows: last-non-null looking back, first-non-null looking
# forward, each carrying both the value and ITS hour. The grid spans
# min(hour)..max(hour) per key, so every empty bucket has both
# neighbors and the CASE below is total.
#
# Determinism: the interpolation fraction is a ratio of exact integer
# microsecond gaps; prev/next values are already hround-ed bucket
# averages; both engines evaluate the identical IEEE expression tree,
# then hround the display value.

_INTERP_VAL = (
    "(prev_val + (next_val - prev_val)"
    " * (CAST(hour_us - prev_us AS DOUBLE) / CAST(next_us - prev_us AS DOUBLE)))"
)

_INTERP_ORACLE = f"""
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
),
edged AS (
  SELECT g.user_id, g.hour, epoch_us(g.hour) AS hour_us,
         h.n_events, h.avg_value,
         last_value(h.avg_value IGNORE NULLS) OVER wb AS prev_val,
         last_value(CASE WHEN h.avg_value IS NOT NULL
                         THEN epoch_us(g.hour) END IGNORE NULLS) OVER wb AS prev_us,
         first_value(h.avg_value IGNORE NULLS) OVER wf AS next_val,
         first_value(CASE WHEN h.avg_value IS NOT NULL
                          THEN epoch_us(g.hour) END IGNORE NULLS) OVER wf AS next_us
  FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
  WINDOW wb AS (PARTITION BY g.user_id ORDER BY g.hour
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY g.user_id ORDER BY g.hour
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, hour, COALESCE(n_events, 0) AS n_events,
       FLOOR((CASE WHEN avg_value IS NOT NULL THEN avg_value
                   ELSE {_INTERP_VAL} END) * 1000000.0 + 0.5) / 1000000.0
         AS value_interp
FROM edged
"""


@register("timeseries_interpolate_linear", oracle=_INTERP_ORACLE)
def timeseries_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    ).select(
        "user_id", "hour", F.unix_micros("hour").alias("hour_us"),
        "n_events", "avg_value",
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "next non-null at-or-after this row" as a RUNNING last() over the
    # DESCENDING order — semantically identical to first() over
    # (currentRow, unboundedFollowing), but O(n): Spark's
    # UnboundedFollowing frame processor re-aggregates the remainder of
    # the partition for every row (O(n²) — measured 11.5s vs ~2s here).
    # Running frames stream in one pass; the two opposite sort orders
    # share the single user_id shuffle.
    wfd = (
        Window.partitionBy("user_id")
        .orderBy(F.col("hour").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    present_us = F.when(F.col("avg_value").isNotNull(), F.col("hour_us"))
    edged = joined.select(
        "user_id",
        "hour",
        "n_events",
        "avg_value",
        "hour_us",
        F.last("avg_value", ignorenulls=True).over(wb).alias("prev_val"),
        F.last(present_us, ignorenulls=True).over(wb).alias("prev_us"),
        F.last("avg_value", ignorenulls=True).over(wfd).alias("next_val"),
        F.last(present_us, ignorenulls=True).over(wfd).alias("next_us"),
    )
    interp = F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * (
        (F.col("hour_us") - F.col("prev_us")).cast("double")
        / (F.col("next_us") - F.col("prev_us")).cast("double")
    )
    return edged.select(
        "user_id",
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        hround(
            F.when(F.col("avg_value").isNotNull(), F.col("avg_value")).otherwise(
                interp
            )
        ).alias("value_interp"),
    )


# --- trailing z-score (windowed anomaly detection) ---------------------------
# "How unusual is this reading vs the key's recent history?" — the
# standard streaming-anomaly gate, composed as ONE partitioned window
# pass: per user, a trailing 24-row frame supplies exact integer
# moments (count, Σcents, Σcents²) and the z-score is a fixed-order
# double formula over them. Cross-engine determinism comes from the
# moments being EXACT (long sums of scaled ints — the same trick the
# repo's global moments use, in window form): both engines then
# evaluate the identical IEEE expression, so no stddev_samp /
# Welford-vs-textbook drift can appear. Frame is ROWS-bounded →
# streaming-O(n) per key, no unbounded-following processor; a key's
# history never leaves its partition.
#
# Null contract (identical both engines): z is NULL until the frame has
# >= 5 rows, and NULL when the window variance is 0 (constant history).

_Z_MIN_N = 5


@register(
    "timeseries_trailing_zscore",
    oracle=f"""
WITH c AS (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
m AS (
  SELECT event_id, user_id, cents,
         COUNT(*) OVER w AS n,
         SUM(cents) OVER w AS s1,
         SUM(cents * cents) OVER w AS s2
  FROM c
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, CAST(n AS BIGINT) AS n_window,
       CASE WHEN n >= {_Z_MIN_N}
             AND CAST(s2 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) > 0
            THEN FLOOR(
              (CAST(cents AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
              / SQRT((CAST(s2 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                     / (CAST(n AS DOUBLE) * (n - 1)))
              * 1000000.0 + 0.5) / 1000000.0
            ELSE NULL END AS zscore
FROM m
""",
)
def timeseries_trailing_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.exact import scaled_long

    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_id", "user_id", "ts", scaled_long("value", 2).alias("cents")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-23, 0)
    )
    m = c.select(
        "event_id",
        "user_id",
        "cents",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("cents").over(w).alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).over(w).alias("s2"),
    )
    n_d = F.col("n").cast("double")
    s1_d = F.col("s1").cast("double")
    s2_d = F.col("s2").cast("double")
    var_num = s2_d * F.col("n") - s1_d * s1_d
    z = (
        (F.col("cents").cast("double") - s1_d / F.col("n"))
        / F.sqrt(var_num / (n_d * (F.col("n") - 1)))
    )
    zr = F.floor(z * 1_000_000.0 + 0.5) / 1_000_000.0
    return m.select(
        "event_id",
        "user_id",
        F.col("n").alias("n_window"),
        F.when((F.col("n") >= _Z_MIN_N) & (var_num > 0), zr)
        .otherwise(F.lit(None))
        .alias("zscore"),
    )


# --- SCD Type-2 dimension build ----------------------------------------------
# The warehouse-modeling staple: turn a change-event stream into
# validity intervals — one row per (key, state) episode with
# [valid_from, valid_to) and an is_current flag. Built from the events
# stream per user: consecutive runs of the same event_type collapse to
# one episode (gaps-and-islands), valid_to = next episode's start.
# One partitioned-window pass per step, all ROWS/lag-lead — no
# unbounded-following processors, key history never leaves its
# partition. This is exactly the MERGE-free way to build an SCD2
# dimension from a CDC feed at scale (episode rows then upsert by
# (user_id, valid_from)).


@register(
    "scd2_user_event_episodes",
    oracle="""
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
marked AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN prev_type IS NULL OR prev_type <> event_type
              THEN 1 ELSE 0 END AS is_start
  FROM o
),
ep AS (
  SELECT user_id, event_type, ts,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS episode
  FROM marked
),
spans AS (
  SELECT user_id, episode, MIN(event_type) AS event_type,
         MIN(ts) AS valid_from, COUNT(*) AS n_events
  FROM ep GROUP BY user_id, episode
)
SELECT user_id, CAST(episode AS BIGINT) AS episode, event_type,
       valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY episode)
         AS valid_to,
       CAST(n_events AS BIGINT) AS n_events,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY episode)
         IS NULL AS is_current
FROM spans
""",
)
def scd2_user_event_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("event_type").over(w_ord).isNull()
            | (F.lag("event_type").over(w_ord) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ep = marked.withColumn("episode", F.sum("is_start").over(w_run))
    spans = ep.groupBy("user_id", "episode").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_ep = Window.partitionBy("user_id").orderBy("episode")
    nxt = F.lead("valid_from").over(w_ep)
    return spans.select(
        "user_id",
        "episode",
        "event_type",
        "valid_from",
        nxt.alias("valid_to"),
        "n_events",
        nxt.isNull().alias("is_current"),
    )


# --- hourly volume anomaly (z-score on the AGGREGATED series) ----------------
# Spike/outage detection the way monitoring actually does it: aggregate
# first (events → hourly counts per type), THEN score each bucket
# against its own trailing day. Two-stage plan: a tumbling-window count
# (map-side combinable — the raw stream collapses before any window
# work) and a 24-bucket trailing frame over the TINY aggregated series.
# Counts are integers, so the trailing moments are exact without any
# scaling step, and the z formula is the same fixed-order IEEE
# expression as timeseries_trailing_zscore.


@register(
    "timeseries_hourly_anomaly",
    oracle=f"""
WITH hourly AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_bucket,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, hour_bucket, n,
         COUNT(*) OVER w AS k,
         SUM(n) OVER w AS s1,
         SUM(n * n) OVER w AS s2
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_bucket
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour_bucket, CAST(n AS BIGINT) AS n_events,
       CASE WHEN k >= {_Z_MIN_N}
             AND CAST(s2 AS DOUBLE) * k - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) > 0
            THEN FLOOR(
              (CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / k)
              / SQRT((CAST(s2 AS DOUBLE) * k - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                     / (CAST(k AS DOUBLE) * (k - 1)))
              * 1000000.0 + 0.5) / 1000000.0
            ELSE NULL END AS zscore
FROM m
""",
)
def timeseries_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.floor(F.unix_micros(F.col("ts")) / 3_600_000_000).alias(
                "hour_bucket"
            ),
        )
        .groupBy("event_type", "hour_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_bucket")
        .rowsBetween(-24, -1)
    )
    m = hourly.select(
        "event_type",
        "hour_bucket",
        "n",
        F.count(F.lit(1)).over(w).alias("k"),
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
    )
    k_d = F.col("k").cast("double")
    s1_d = F.col("s1").cast("double")
    s2_d = F.col("s2").cast("double")
    var_num = s2_d * F.col("k") - s1_d * s1_d
    z = (F.col("n").cast("double") - s1_d / F.col("k")) / F.sqrt(
        var_num / (k_d * (F.col("k") - 1))
    )
    zr = F.floor(z * 1_000_000.0 + 0.5) / 1_000_000.0
    return m.select(
        "event_type",
        "hour_bucket",
        F.col("n").alias("n_events"),
        F.when((F.col("k") >= _Z_MIN_N) & (var_num > 0), zr)
        .otherwise(F.lit(None))
        .alias("zscore"),
    )


# --- rolling 7-day distinct users --------------------------------------------
# Rolling COUNT(DISTINCT) is the op window functions cannot express
# (distinct is not additive, so you cannot merge daily distinct counts
# and a distinct-over-frame window buffers every row). The distributed
# shape: pre-dedup to (user, day) — the raw stream collapses FIRST —
# then each pair fans out to the <=7 window-days it serves, and one
# count-distinct per window-day finishes it. Fan-out is bounded by the
# window length, the heavy distinct runs on day-grain data, and at
# larger windows the same plan swaps count_distinct for a mergeable
# HLL sketch (tests/test_operators.py covers the sketch path).


@register(
    "rolling_distinct_users_7d",
    oracle="""
WITH dgrid AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
),
fan AS (
  SELECT user_id, day + o AS wday
  FROM dgrid, UNNEST(generate_series(0, 6)) AS t(o)
),
days AS (SELECT DISTINCT day FROM dgrid)
SELECT fan.wday AS day,
       CAST(COUNT(DISTINCT fan.user_id) AS BIGINT) AS n_users_7d
FROM fan JOIN days ON days.day = fan.wday
GROUP BY fan.wday
""",
)
def rolling_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dgrid = ev.select(
        "user_id",
        F.floor(F.unix_micros(F.col("ts")) / 86_400_000_000).alias("day"),
    ).distinct()
    fan = dgrid.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + 6)
        ).alias("wday"),
    )
    days = dgrid.select("day").distinct()
    return (
        fan.join(F.broadcast(days), fan.wday == days.day)
        .groupBy("wday")
        .agg(F.count_distinct("user_id").alias("n_users_7d"))
        .select(F.col("wday").alias("day"), "n_users_7d")
    )


# --- CUSUM drift detection ----------------------------------------------------
# The control-chart question: did a key's metric drift from its own
# baseline, and by how much at the worst point? CUSUM = running sum of
# (value - baseline mean); its max/min excursions bound the drift. Two
# passes: per-type baseline means (map-side agg, broadcast back), then
# ONE ordered ROWS window per type for the running sum with max/min
# folded in the same final rollup. Everything in exact integer cents —
# the running sum and both excursions are exact longs, no FP at all
# until nothing is left to compute. Overflow budget: |cusum| <=
# 2 × n² × max_cents (the deviation carries an ×n scale), comfortably
# inside int64 through ~10^5-row groups. The budget is ENFORCED, not
# just documented: the baseline agg also computes max(|cents|) and the
# broadcast side routes s through a raise_error branch when
# 2·n²·max_cents crosses 9e18, so a group too large for the long path
# fails loudly (pinned by tests/test_operators.py::test_cusum_budget_
# guard) instead of wrapping — Spark's non-ANSI window SUM wraps
# silently. Beyond the budget, cast the window sum to DECIMAL(38,0)
# on both sides — exact either way (DuckDB already sums BIGINT into
# HUGEINT, so only the Spark side can wrap).


@register(
    "events_cusum_drift",
    oracle="""
WITH c AS (
  SELECT event_type, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
base AS (
  SELECT event_type, SUM(cents) AS s, COUNT(*) AS n
  FROM c GROUP BY event_type
),
dev AS (
  -- exact integer deviation: n * cents - s  (scaled by n to avoid
  -- a fractional mean; excursions rescale consistently both engines)
  SELECT c.event_type, c.ts, c.event_id,
         b.n * c.cents - b.s AS d
  FROM c JOIN base b ON c.event_type = b.event_type
),
run AS (
  SELECT event_type,
         SUM(d) OVER (PARTITION BY event_type ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS cusum
  FROM dev
)
SELECT event_type,
       CAST(MAX(cusum) AS BIGINT) AS max_drift_scaled,
       CAST(MIN(cusum) AS BIGINT) AS min_drift_scaled
FROM run GROUP BY event_type
""",
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.exact import scaled_long

    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_type", "ts", "event_id", scaled_long("value", 2).alias("cents")
    )
    base = c.groupBy("event_type").agg(
        F.sum("cents").alias("s"),
        F.count(F.lit(1)).alias("n"),
        F.max(F.abs(F.col("cents"))).alias("mc"),
    )
    # Loud overflow guard (see docstring budget): evaluate in DOUBLE so
    # the check itself cannot wrap, and poison `s` — every downstream
    # row uses it, so the first task to touch an over-budget group
    # raises instead of silently wrapping the window sum.
    over = (
        F.col("n").cast("double")
        * F.col("n").cast("double")
        * F.col("mc").cast("double")
        * F.lit(2.0)
        >= F.lit(9.0e18)
    )
    base = base.select(
        "event_type",
        F.when(
            over,
            F.raise_error(
                F.lit(
                    "events_cusum_drift: per-group cusum budget exceeded "
                    "(2*n^2*max_cents >= 9e18); use the DECIMAL(38,0) "
                    "window-sum variant for groups this large"
                )
            ).cast("long"),
        )
        .otherwise(F.col("s"))
        .alias("s"),
        "n",
    )
    dev = c.join(F.broadcast(base), "event_type").select(
        "event_type",
        "ts",
        "event_id",
        (F.col("n") * F.col("cents") - F.col("s")).alias("d"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = dev.select("event_type", F.sum("d").over(w).alias("cusum"))
    return run.groupBy("event_type").agg(
        F.max("cusum").alias("max_drift_scaled"),
        F.min("cusum").alias("min_drift_scaled"),
    )


# --- purchase cadence histogram ----------------------------------------------
# Recurrence mining: the distribution of gaps between a user's
# consecutive purchases. The lag window runs on the PURCHASE SUBSET
# (filter first — the stream shrinks before any window work), gaps are
# exact integer days, and the final histogram is a tiny rollup. The
# p50 of this distribution is the "reorder window" number growth teams
# quote.


@register(
    "purchase_cadence_histogram",
    oracle="""
WITH p AS (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events WHERE event_type = 'purchase'
)
SELECT CAST((epoch_us(ts) - epoch_us(prev_ts)) // 86400000000 AS BIGINT)
         AS gap_days,
       CAST(COUNT(*) AS BIGINT) AS n_gaps
FROM p WHERE prev_ts IS NOT NULL
GROUP BY 1
""",
)
def purchase_cadence_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        "user_id", "ts", F.lag("ts").over(w).alias("prev_ts")
    ).filter(F.col("prev_ts").isNotNull())
    gap = F.floor(
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts")))
        / 86_400_000_000
    )
    return (
        p.select(gap.alias("gap_days"))
        .groupBy("gap_days")
        .agg(F.count(F.lit(1)).alias("n_gaps"))
    )


# --- daily event-type mix ----------------------------------------------------
# Mix-shift monitoring: per day, each event type's share of traffic. A
# feature launch or an instrumentation break shows up as a share step
# long before absolute volumes look anomalous. Two-level shape: the
# stream collapses to (day, type) counts map-side; shares are a
# windowed sum over the tiny aggregate partitioned by day.


@register(
    "events_daily_type_mix",
    oracle="""
WITH d AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT day, event_type, CAST(n AS BIGINT) AS n_events,
       FLOOR(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY day)
             * 1000000.0 + 0.5) / 1000000.0 AS day_share
FROM d
""",
)
def events_daily_type_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select(
            F.floor(F.unix_micros(F.col("ts")) / 86_400_000_000).alias("day"),
            "event_type",
        )
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("day")
    share = (
        F.floor(
            F.col("n").cast("double") / F.sum("n").over(w) * 1_000_000.0 + 0.5
        )
        / 1_000_000.0
    )
    return d.select(
        "day", "event_type", F.col("n").alias("n_events"), share.alias("day_share")
    )
