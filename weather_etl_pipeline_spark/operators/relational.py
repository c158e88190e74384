"""Reference-surface relational operators (SURVEY.md §2.1-2.7).

The reference's query surface is DuckDB SQL over a Hive-partitioned
parquet lake: scan → project/cast/rename → null-filter → groupBy-agg →
partitioned write (reference ``silver.py:26-40``, ``gold.py:69-82``), plus
partition-listing DISTINCT (``silver.py:8-12``), COUNT validation gates
(``silver.py:42-44``), equality partition filters (``silver.py:37-38``),
STRPTIME parsing (``silver.py:31``), and the incremental anti-join
work-list (``silver.py:66-69``). Each is re-expressed here as a
declarative DataFrame plan over the driver test tables so Catalyst gets
pushdown/pruning for free; scale notes per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import (
    CHARGE_D,
    REV_D,
    VALUE_D,
    davg,
    oracle_charge_scaled,
    oracle_davg,
    oracle_dsum,
    oracle_rev_scaled,
    oracle_unscale,
    partial_by_partition,
    rev_scaled,
    scaled_long,
    spark_charge_scaled,
    spark_davg,
    spark_rev_scaled,
    spark_scaled_long,
)
from ..registry import register

# --- flagship: TPC-H-Q1-shaped pricing summary -------------------------------
# The gold layer's avg/max/min/count groupBy (reference gold.py:70-81)
# scaled up to the classic 8-aggregate pricing summary. At 100 TB this is
# a pure map-side-partial + final agg on a low-cardinality key
# (|groups| ~ 6): no skew risk, no broadcast needed, scan-bound. Money
# arithmetic goes through the scaled-LONG two-level pattern
# (functions/exact.py): partition-local int64 partials, exact
# DECIMAL(38,0) final combine — fast (primitive codegen sums in the hot
# loop) and overflow-safe at any rows-per-group.
_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {oracle_dsum("l_quantity", 0)} AS sum_qty,
  {oracle_dsum("l_extendedprice")} AS sum_base_price,
  {oracle_unscale(f"SUM({oracle_rev_scaled()})", REV_D, 2)} AS sum_disc_price,
  {oracle_unscale(f"SUM({oracle_charge_scaled()})", CHARGE_D, 2)} AS sum_charge,
  {oracle_davg("l_quantity", 0)} AS avg_qty,
  {oracle_davg("l_extendedprice")} AS avg_price,
  {oracle_davg("l_discount")} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE, headline=True)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    filtered = li.filter("l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'")
    # string-twin aggregate spec (round 14): identical parsed trees to
    # the Column-API form at a fraction of the py4j round trips — see
    # functions/exact.py string-twin note
    return (
        partial_by_partition(filtered, ["l_returnflag", "l_linestatus"])
        .sum_scaled(spark_scaled_long("l_quantity", 0), 0, "sum_qty", round_to=None)
        .sum_scaled(
            spark_scaled_long("l_extendedprice"), 2, "sum_base_price", round_to=None
        )
        .sum_scaled(spark_rev_scaled(), REV_D, "sum_disc_price")
        .sum_scaled(spark_charge_scaled(), CHARGE_D, "sum_charge")
        .avg_scaled(spark_scaled_long("l_quantity", 0), "l_quantity", 0, "avg_qty")
        .avg_scaled(
            spark_scaled_long("l_extendedprice"), "l_extendedprice", 2, "avg_price"
        )
        .avg_scaled(spark_scaled_long("l_discount"), "l_discount", 2, "avg_disc")
        .count("count_order")
        .finish()
    )


# --- TPC-H Q6 shape: forecasting revenue change (pure filter + scalar sum) ---
# The simplest classic: three pushable range predicates and one exact
# decimal product sum — entirely scan-bound, zero shuffle beyond the
# single-row final aggregate.


_Q6_SCALED = "CAST(ROUND((l_extendedprice * l_discount) * 10000, 0) AS BIGINT)"


@register(
    "q6_forecast_revenue",
    oracle=f"""
SELECT {oracle_unscale(f"SUM({_Q6_SCALED})", REV_D, 2)} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # price * discount is exact at 4 decimals (2 + 2) → x10^4 LONG;
    # single global group → two-level combine for int64 safety.
    rev = scaled_long(F.col("l_extendedprice") * F.col("l_discount"), REV_D)
    filtered = li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return (
        partial_by_partition(filtered, [])
        .sum_scaled(rev, REV_D, "revenue")
        .count("n_items")
        .finish()
    )


# --- Q-proj / Q-cast / F-strptime: the silver cleaning projection ------------
# Mirrors silver.py:28-35: one declared projection that re-types and
# renames every column, plus the STRPTIME round-trip ('%Y-%m-%dT%H:%M' →
# "yyyy-MM-dd'T'HH:mm") and the null-rejection filter (silver.py:39).
# Narrow transform: no shuffle, fully codegen'd, filters/columns pushed
# into the parquet scan.


@register(
    "silver_clean_events",
    oracle="""
SELECT
  event_id,
  STRPTIME(STRFTIME(ts, '%Y-%m-%dT%H:%M'), '%Y-%m-%dT%H:%M') AS event_minute,
  CAST(user_id AS INTEGER) AS user_id,
  event_type,
  CAST(value AS DOUBLE) AS metric
FROM events
WHERE value IS NOT NULL AND event_type IS NOT NULL
""",
)
def silver_clean_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    iso = F.date_format("ts", "yyyy-MM-dd'T'HH:mm")
    return ev.filter(F.col("value").isNotNull() & F.col("event_type").isNotNull()).select(
        "event_id",
        F.to_timestamp(iso, "yyyy-MM-dd'T'HH:mm").alias("event_minute"),
        F.col("user_id").cast("int").alias("user_id"),
        "event_type",
        F.col("value").cast("double").alias("metric"),
    )


# --- Q-groupagg: the gold daily rollup ---------------------------------------
# Twin of gold.py:70-81 (avg/max/min/count per (city, date)) on the
# events table: per (event_type, day). Low-cardinality group key →
# map-side partial agg collapses ~everything before the shuffle.


@register(
    "gold_daily_rollup",
    oracle=f"""
SELECT
  event_type,
  CAST(ts AS DATE) AS event_date,
  {oracle_davg("value", VALUE_D)} AS avg_value,
  MAX(value) AS max_value,
  MIN(value) AS min_value,
  COUNT(*) AS record_count
FROM events
GROUP BY event_type, CAST(ts AS DATE)
""",
    headline=True,
)
def gold_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.expr("CAST(ts AS DATE) AS event_date")
    ).agg(
        F.expr(spark_davg("value", VALUE_D)).alias("avg_value"),
        F.expr("MAX(value)").alias("max_value"),
        F.expr("MIN(value)").alias("min_value"),
        F.expr("COUNT(1)").alias("record_count"),
    )


# --- Q-distinct: partition discovery -----------------------------------------
# silver.py:8-12's SELECT DISTINCT city, date — the partition work-list
# scan. At scale, prefer catalog listing over a data scan; as a query it
# is a shuffle on (event_type, day) with partial dedup map-side.


@register(
    "distinct_partitions",
    oracle="SELECT DISTINCT event_type, CAST(ts AS DATE) AS event_date FROM events",
)
def distinct_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_type", F.col("ts").cast("date").alias("event_date")).distinct()


# --- Q-filter-eq: partition-pruned point lookup ------------------------------
# silver.py:37-38's WHERE city=? AND date=? — on a partitioned lake these
# predicates prune at the file level (PartitionFilters); here they push
# into the parquet row-group scan (PushedFilters).


@register(
    "filter_point_lookup",
    oracle="""
SELECT event_id, ts, user_id, value
FROM events
WHERE event_type = 'purchase' AND CAST(ts AS DATE) = DATE '2024-01-05'
""",
)
def filter_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("event_type") == "purchase")
        & (F.col("ts").cast("date") == F.lit("2024-01-05").cast("date"))
    ).select("event_id", "ts", "user_id", "value")


# --- Q-count: scalar validation count ----------------------------------------
# The empty-partition guard (silver.py:42-47) is a COUNT(*); returned as
# a 1-row DataFrame so the driver can hash it.


@register("count_validation", oracle="SELECT COUNT(*) AS n_rows FROM lineitem")
def count_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(F.count(F.lit(1)).alias("n_rows"))


# --- Q-nullcheck: aggregate-sanity gate --------------------------------------
# gold.py:53-56's SELECT COUNT(*) WHERE avg IS NULL, generalized: count
# null / non-null metric values per event_type.


@register(
    "null_check_gate",
    oracle="""
SELECT event_type,
       COUNT(*) - COUNT(value) AS n_null,
       COUNT(value) AS n_ok
FROM events GROUP BY event_type
""",
)
def null_check_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        (F.count(F.lit(1)) - F.count("value")).alias("n_null"),
        F.count("value").alias("n_ok"),
    )


# --- NULL semantics: null grouping + null-safe comparison --------------------
# Both engines group NULL keys together and treat IS NOT DISTINCT FROM
# (Spark <=>) as null-safe equality; this query pins those semantics
# (the testdata has no organic nulls, so NULLIF manufactures them).


@register(
    "null_semantics_group",
    oracle="""
SELECT NULLIF(l_returnflag, 'N') AS flag,
       COUNT(*) AS n_rows,
       COUNT(NULLIF(l_returnflag, 'N')) AS n_nonnull_keys,
       CAST(SUM(CASE WHEN NULLIF(l_returnflag, 'N') IS NOT DISTINCT FROM NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_null_safe_hits
FROM lineitem
GROUP BY NULLIF(l_returnflag, 'N')
""",
)
def null_semantics_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    flag = F.nullif(F.col("l_returnflag"), F.lit("N"))
    return li.groupBy(flag.alias("flag")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(flag).alias("n_nonnull_keys"),
        F.sum(
            F.when(flag.eqNullSafe(F.lit(None).cast("string")), 1).otherwise(0)
        ).alias("n_null_safe_hits"),
    )


# --- Q-antijoin: the incremental work-list -----------------------------------
# The reference computes "available − processed" as a Python set diff
# (silver.py:66-69); distributed form is a LEFT ANTI join. Catalyst
# broadcasts the processed side when small (the common case: one row per
# partition). Demonstrated as customers with no orders.


@register(
    "incremental_antijoin",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
""",
)
def incremental_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    processed = orders.filter(F.col("o_totalprice") > 300000)
    return cust.join(
        processed, cust.c_custkey == processed.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --- null-rate data profile --------------------------------------------------
# The first query every data-quality harness runs on a new table: per
# column, how many rows are NULL (and for the JSON column, how many are
# unparseable — the practical "null" of a props field). ONE pass, one
# aggregate, map-side combinable; at 100 TB this is the cheapest
# possible full-table profile. Emitted in long form (column, n_null)
# so added columns extend rows, not schema.


@register(
    "events_null_profile",
    oracle="""
WITH c AS (
  SELECT
    CAST(COUNT(*) AS BIGINT) AS n_rows,
    CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ts_n,
    CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_n,
    CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS type_n,
    CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_n,
    CAST(SUM(CASE WHEN TRY_CAST(props AS JSON) IS NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS props_bad
  FROM events
)
SELECT 'ts' AS col, ts_n AS n_null, n_rows FROM c
UNION ALL SELECT 'user_id', user_n, n_rows FROM c
UNION ALL SELECT 'event_type', type_n, n_rows FROM c
UNION ALL SELECT 'value', value_n, n_rows FROM c
UNION ALL SELECT 'props_unparseable', props_bad, n_rows FROM c
""",
)
def events_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    nn = lambda c: F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))  # noqa: E731
    # "Unparseable" must mean the same thing on both engines.  PERMISSIVE
    # from_json returns a non-null all-null struct for malformed input, so it
    # undercounts; try_parse_json (Spark 4 VARIANT) returns NULL exactly when
    # the string is not valid JSON — including NULL input and non-object JSON
    # like '5' / '[1,2]' being VALID — which is bit-for-bit the semantics of
    # DuckDB's TRY_CAST(props AS JSON) IS NULL (verified on the six-case
    # matrix in tests/test_null_profile_semantics.py).
    props_bad = F.sum(
        F.when(F.try_parse_json("props").isNull(), 1).otherwise(0)
    )
    wide = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        nn("ts").alias("ts_n"),
        nn("user_id").alias("user_n"),
        nn("event_type").alias("type_n"),
        nn("value").alias("value_n"),
        props_bad.alias("props_bad"),
    )
    pairs = F.array(
        *[
            F.struct(F.lit(name).alias("col"), F.col(src).alias("n_null"))
            for name, src in [
                ("ts", "ts_n"),
                ("user_id", "user_n"),
                ("event_type", "type_n"),
                ("value", "value_n"),
                ("props_unparseable", "props_bad"),
            ]
        ]
    )
    return (
        wide.select(F.explode(pairs).alias("p"), "n_rows")
        .select("p.col", "p.n_null", "n_rows")
    )


# --- discount-band revenue effectiveness -------------------------------------
# Pricing analytics: revenue and volume per discount band — does the
# 5-7% band actually move more units than 0-2%? Bands are literal
# integer-percent boundaries (discounts are exact 2-decimal values, so
# CAST(ROUND(d*100)) is an exact integer both engines — no FP boundary
# risk); revenue flows through the shared exact scaled-long path.


@register(
    "discount_band_revenue",
    oracle=f"""
SELECT CAST(ROUND(l_discount * 100, 0) AS BIGINT) // 3 AS discount_band,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND((l_quantity) * 1, 0) AS BIGINT)) AS BIGINT)
         AS total_qty,
       {oracle_unscale(f"SUM({oracle_rev_scaled()})", 4, 2)} AS revenue
FROM lineitem
GROUP BY 1
""",
)
def discount_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import REV_D, rev_scaled, unscale

    li = load_table(spark, sf_dir, "lineitem")
    # floor(+0.5) scaled forms: exact-equal to the oracle's ROUND on
    # fixed-scale values (functions/exact.py scaled_long rationale) and
    # primitive in codegen, vs ROUND's per-row BigDecimal detour
    band = F.expr("CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) DIV 3")
    return (
        li.groupBy(band.alias("discount_band"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")).alias(
                "total_qty"
            ),
            F.sum(rev_scaled()).alias("_rs"),
        )
        .select(
            "discount_band",
            "n_items",
            "total_qty",
            unscale("_rs", REV_D, 2).alias("revenue"),
        )
    )
