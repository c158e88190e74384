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
from ..functions.exact import dsum, oracle_dsum
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


# --- interval OVERLAP join (interval × interval) ------------------------------
# The harder sibling of the point-in-interval range join above: BOTH
# sides are intervals and the predicate is symmetric overlap
# (a.start < b.end AND b.start < a.end). The naive form is again a
# theta cross join; the scalable composition explodes each interval to
# the W-sized time cells it covers, equi-joins on (key, cell) — an
# interval of length L lands in ceil(L/W)+1 cells, so candidates are
# bounded by interval length, not corpus size — then refines with the
# exact predicate and dedups pairs that met in several cells. Bucket
# width trades join fan-out (small W → many cells per interval) against
# candidate precision (large W → more false candidates per cell).
#
# Demo: per user, error incident windows [ts, ts+1h) overlapping
# purchase attention windows [ts-30m, ts+30m). Exact integer overlap
# length from epoch micros. Oracle = the plain theta join (DuckDB is
# fine with it at oracle scale).

_OV_W = 3600  # bucket width (s) = max interval length: <=2 cells/interval
_ERR_LEN = 3600
_PUR_PAD = 1800


@register(
    "interval_overlap_error_purchase",
    oracle=f"""
WITH e AS (
  SELECT event_id AS error_id, user_id,
         epoch_us(ts) AS s, epoch_us(ts) + {_ERR_LEN} * 1000000::BIGINT AS f
  FROM events WHERE event_type = 'error'
),
p AS (
  SELECT event_id AS purchase_id, user_id,
         epoch_us(ts) - {_PUR_PAD} * 1000000::BIGINT AS s,
         epoch_us(ts) + {_PUR_PAD} * 1000000::BIGINT AS f
  FROM events WHERE event_type = 'purchase'
)
SELECT e.user_id, e.error_id, p.purchase_id,
       CAST((LEAST(e.f, p.f) - GREATEST(e.s, p.s)) // 1000000 AS BIGINT)
         AS overlap_seconds
FROM e JOIN p ON e.user_id = p.user_id
             AND e.s < p.f AND p.s < e.f
""",
)
def interval_overlap_error_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = lambda c: F.unix_micros(c)  # noqa: E731
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        us(F.col("ts")).alias("e_s"),
        (us(F.col("ts")) + _ERR_LEN * 1_000_000).alias("e_f"),
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        (us(F.col("ts")) - _PUR_PAD * 1_000_000).alias("p_s"),
        (us(F.col("ts")) + _PUR_PAD * 1_000_000).alias("p_f"),
    )
    cells = lambda s, f: F.sequence(  # noqa: E731
        F.floor(s / (_OV_W * 1_000_000)), F.floor((f - 1) / (_OV_W * 1_000_000))
    )
    err_b = err.withColumn("cell", F.explode(cells(F.col("e_s"), F.col("e_f"))))
    pur_b = pur.withColumn("cell", F.explode(cells(F.col("p_s"), F.col("p_f"))))
    pairs = (
        err_b.join(
            pur_b,
            (F.col("user_id") == F.col("p_user")) & (err_b.cell == pur_b.cell),
        )
        .filter((F.col("e_s") < F.col("p_f")) & (F.col("p_s") < F.col("e_f")))
        .select(
            "user_id",
            "error_id",
            "purchase_id",
            (
                (
                    F.least(F.col("e_f"), F.col("p_f"))
                    - F.greatest(F.col("e_s"), F.col("p_s"))
                )
                / 1_000_000
            ).cast("long").alias("overlap_seconds"),
        )
        .dropDuplicates(["user_id", "error_id", "purchase_id"])
    )
    return pairs


# --- broadcast banded-range lookup -------------------------------------------
# The dimension-lookup sibling of the range join: classify each fact
# row into a band from a SMALL interval table (severity bands here;
# same shape as IP-geo ranges, SLA tiers, price brackets). The interval
# dimension is bounded by construction -> broadcast nested-loop with a
# range predicate is the RIGHT plan (the guard's ban is on unbounded
# CartesianProduct, not on bounded broadcast theta joins): every fact
# row tests a handful of broadcast rows map-side, nothing shuffles.
# With thousands+ of bands the upgrade is binning on the band grid as
# in the range join above.

_BANDS = [  # [lo, hi) -> label; covers all non-negative values
    (0.0, 2.0, "low"),
    (2.0, 5.0, "mid"),
    (5.0, 8.0, "high"),
    (8.0, 1e18, "extreme"),
]


def _bands_sql() -> str:
    rows = ", ".join(f"({lo}, {hi}, '{lab}')" for lo, hi, lab in _BANDS)
    return f"(VALUES {rows}) AS bands(lo, hi, band)"


@register(
    "range_lookup_value_band",
    oracle=f"""
SELECT bands.band, COUNT(*) AS n_events,
       {oracle_dsum("e.value")} AS sum_value
FROM events e JOIN {_bands_sql()}
  ON e.value >= bands.lo AND e.value < bands.hi
GROUP BY bands.band
""",
)
def range_lookup_value_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(_BANDS, "lo double, hi double, band string")
    return (
        ev.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
    )
