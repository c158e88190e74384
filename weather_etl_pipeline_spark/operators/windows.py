"""Window-function operators (extension surface X-window / X-topk).

Not present in the reference (SURVEY.md §2.5 — grep-verified none);
mandated by the extension surface. Scale notes: a window over
``partitionBy(k)`` shuffles once on k and sorts within partitions —
fine when per-key cardinality is bounded (orders per customer, events
per user). Global ORDER BY ... LIMIT is implemented as top-k per
partition + merge (Spark's TakeOrderedAndProject), never a full sort.

Determinism: every ORDER BY carries a unique tiebreaker column so
ranking is total; running sums use exact decimal arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import hround, scaled_long, spark_hround, spark_scaled_long
from ..registry import register

# --- top-k per group via row_number ------------------------------------------


@register(
    "window_topk_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rk
  FROM orders
) t
WHERE rk <= 3
""",
    headline=True,
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # one selectExpr parse (round 14) — identical window tree, fewer
    # py4j round trips; see functions/exact.py string-twin note
    return (
        orders.selectExpr(
            "*",
            "CAST(row_number() OVER (PARTITION BY o_custkey"
            " ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk",
        )
        .filter("rk <= 3")
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


# --- rank / dense_rank --------------------------------------------------------


@register(
    "window_rank_customers_by_balance",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS bal_rank,
       DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS bal_dense_rank
FROM customer
""",
)
def window_rank_customers_by_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).cast("long").alias("bal_rank"),
        F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
    )


# --- lag / lead ---------------------------------------------------------------
# Per-user event deltas: the change-point shape (value vs previous
# value). Unique tiebreaker event_id makes lag/lead deterministic.


@register(
    "window_lag_lead_events",
    oracle="""
SELECT event_id, user_id, ts, value,
       LAG(value) OVER w AS prev_value,
       LEAD(value) OVER w AS next_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def window_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


# --- running total (frame: unbounded preceding → current) --------------------
# Exact scaled-LONG running sum → bit-stable across engines.


@register(
    "window_running_total",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(ROUND((o_totalprice) * 100, 0) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) / 100.0 AS running_spend
FROM orders
""",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (F.sum(scaled_long("o_totalprice")).over(w).cast("double") / 100.0).alias(
            "running_spend"
        ),
    )


# --- moving average (bounded row frame) --------------------------------------
# 3-row trailing mean of event values per user: exact scaled-LONG sum over
# the frame, one double division, round(6) — deterministic cross-engine.


@register(
    "window_moving_avg",
    oracle="""
SELECT event_id, user_id, ts,
       FLOOR((
         CAST(SUM(CAST(ROUND((value) * 100, 0) AS BIGINT)) OVER w AS DOUBLE)
         / 100.0 / COUNT(value) OVER w) * 1000000.0 + 0.5) / 1000000.0 AS moving_avg_3
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        hround(
            F.sum(scaled_long("value")).over(w).cast("double")
            / 100.0
            / F.count("value").over(w)
        ).alias("moving_avg_3"),
    )


# --- first_value / nth_value (deterministic positional picks) ----------------


@register(
    "window_first_nth_order",
    oracle="""
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_orderkey,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def window_first_nth_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_orderkey"),
    )


# --- RANGE frame: trailing time window ---------------------------------------
# ROWS frames count rows; RANGE frames bound by VALUE distance — here a
# trailing 1-hour window per user. Both engines order by epoch
# microseconds (numeric) so the frame edges are identical to the
# microsecond; exact scaled-LONG sum + single division as usual.


@register(
    "window_trailing_hour_range",
    headline=True,
    oracle="""
SELECT event_id, user_id, ts,
       COUNT(*) OVER w AS n_last_hour,
       FLOOR((CAST(SUM(CAST(ROUND((value) * 100, 0) AS BIGINT)) OVER w AS DOUBLE)
             / 100.0 / COUNT(value) OVER w) * 1000000.0 + 0.5) / 1000000.0 AS avg_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
)
def window_trailing_hour_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # one selectExpr parse (round 14) — identical window tree, fewer
    # py4j round trips (D-suffixed literals keep DOUBLE typing; see
    # functions/exact.py string-twin note)
    over = (
        "OVER (PARTITION BY user_id ORDER BY unix_micros(ts)"
        " RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"
    )
    avg = spark_hround(
        f"CAST(SUM({spark_scaled_long('value')}) {over} AS DOUBLE)"
        f" / 100.0D / COUNT(value) {over}"
    )
    return ev.selectExpr(
        "event_id",
        "user_id",
        "ts",
        f"COUNT(1) {over} AS n_last_hour",
        f"{avg} AS avg_last_hour",
    )


# --- global top-k (TakeOrderedAndProject, not a full sort) -------------------


@register(
    "global_topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def global_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --- distribution windows: ntile / percent_rank / cume_dist ------------------
# Quartile assignment + relative standing per market segment. All three
# are deterministic once the ORDER BY is total (unique tiebreaker
# c_custkey): ntile splits on row position, percent_rank is
# (rank-1)/(n-1), cume_dist is peers/n — integer ratios whose double
# division is bit-identical across engines; hround guards the display
# rounding. One shuffle on the partition key, same as any window.


@register(
    "window_ntile_distribution",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       NTILE(4) OVER w AS bal_quartile,
       FLOOR(percent_rank() OVER w * 1000000.0 + 0.5) / 1000000.0 AS bal_pct_rank,
       FLOOR(cume_dist() OVER w * 1000000.0 + 0.5) / 1000000.0 AS bal_cume_dist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
""",
)
def window_ntile_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).cast("long").alias("bal_quartile"),
        hround(F.percent_rank().over(w)).alias("bal_pct_rank"),
        hround(F.cume_dist().over(w)).alias("bal_cume_dist"),
    )


# --- per-event sessionization (lag-gap method) -------------------------------
# Row-level twin of stream_session_windows: instead of collapsing to
# per-session aggregates, every event keeps its session ordinal and
# position — the feature-engineering shape (downstream models join on
# (user_id, sess_seq)). Classic two-window composition: lag detects
# gap starts, running sum of starts numbers the sessions. Both windows
# share one shuffle+sort on (user_id, ts) — Catalyst reuses the sort.
# Gap convention matches session_window: strictly greater than the gap
# starts a new session (an event at exactly prev+gap merges).

_SESS_GAP_MIN = 30


@register(
    "sessionize_events_rows",
    oracle=f"""
WITH flagged AS (
  SELECT event_id, user_id, ts,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL {_SESS_GAP_MIN} MINUTE
              OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT event_id, user_id, ts,
         CAST(SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS sess_seq
  FROM flagged
)
SELECT event_id, user_id, ts, sess_seq,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id, sess_seq
                               ORDER BY ts, event_id) AS BIGINT) AS evt_seq
FROM numbered
""",
)
def sessionize_events_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = _SESS_GAP_MIN * 60 * 1_000_000
    new_sess = F.when(
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us)
        | F.lag("ts").over(w).isNull(),
        1,
    ).otherwise(0)
    numbered = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(new_sess).over(wr).alias("sess_seq"),
    )
    w_in = Window.partitionBy("user_id", "sess_seq").orderBy("ts", "event_id")
    return numbered.withColumn(
        "evt_seq", F.row_number().over(w_in).cast("long")
    )


# --- share-of-total (ratio-to-report) ----------------------------------------
# Each nation's share of its region's revenue: a windowed SUM over the
# aggregated rollup — the two-level BI shape (aggregate first, window
# over the small result). The window input is #nations rows, so the
# share computation is free regardless of fact-table scale; all the
# heavy lifting stays in the map-side-combinable agg below it.
# Exact scaled-LONG revenue keeps numerator/denominator identical
# cross-engine; one double division + hround for the displayed share.


@register(
    "window_share_of_region_revenue",
    oracle="""
WITH nat AS (
  SELECT r.r_name AS region_name, n.n_name AS nation_name,
         SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000, 0)
                  AS BIGINT)) AS rev_scaled
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT region_name, nation_name,
       FLOOR((CAST(rev_scaled AS DOUBLE) / 10000.0) * 100.0 + 0.5) / 100.0
         AS revenue,
       FLOOR((CAST(rev_scaled AS DOUBLE)
              / CAST(SUM(rev_scaled) OVER (PARTITION BY region_name) AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS region_share
FROM nat
""",
)
def window_share_of_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import (
        REV_D,
        partial_by_partition,
        rev_scaled,
        unscale,
    )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    # 25 (region, nation) groups x billions of rows at scale: the d=4
    # scaled sum needs the two-level combine (partition-local LONG
    # partials, DECIMAL(38,0) final) exactly like star_join_revenue —
    # see functions/exact.py overflow budget.
    nat = (
        partial_by_partition(
            joined,
            [(F.col("r_name"), "region_name"), (F.col("n_name"), "nation_name")],
        )
        .sum_long(rev_scaled(), "rev_scaled")
        .finish()
    )
    w = Window.partitionBy("region_name")
    return nat.select(
        "region_name",
        "nation_name",
        unscale(F.col("rev_scaled"), REV_D, 2).alias("revenue"),
        hround(
            F.col("rev_scaled").cast("double")
            / F.sum("rev_scaled").over(w).cast("double")
        ).alias("region_share"),
    )


# --- session-length histogram -------------------------------------------------
# The product-metric rollup over sessionization: distribution of
# session sizes (events per session) and durations. Composes the
# sessionizer — sessions collapse in one (user, sess_seq) aggregation,
# then a tiny histogram groupBy. The heavy sessionize windows already
# exist; everything above them is aggregate-of-aggregate on shrinking
# data. Duration in exact integer seconds.


@register(
    "session_length_histogram",
    oracle=f"""
WITH flagged AS (
  SELECT event_id, user_id, ts,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL {_SESS_GAP_MIN} MINUTE
              OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_seq
  FROM flagged
),
sessions AS (
  SELECT user_id, sess_seq, COUNT(*) AS n_events,
         (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS dur_s
  FROM numbered GROUP BY user_id, sess_seq
)
SELECT n_events AS session_size,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(dur_s) AS BIGINT) AS total_duration_s
FROM sessions GROUP BY n_events
""",
)
def session_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess = sessionize_events_rows(spark, sf_dir)
    sessions = sess.groupBy("user_id", "sess_seq").agg(
        F.count(F.lit(1)).alias("session_size"),
        F.floor(
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            / 1_000_000
        ).alias("dur_s"),
    )
    return sessions.groupBy("session_size").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("dur_s").alias("total_duration_s"),
    )


# --- month-over-month revenue growth -----------------------------------------
# The BI growth metric: monthly discounted revenue with percent change
# vs the prior month. The two-level shape again: the fact table
# collapses in one map-side-combinable exact aggregation (one row per
# month), and the lag/growth window runs over that TINY series — at
# any fact scale the window cost is #months rows. Growth ratio is
# computed from the exact scaled-LONG sums (identical integers both
# engines), one double division, engine-identical floor rounding.

from ..functions.exact import (  # noqa: E402
    REV_D,
    oracle_rev_scaled,
    oracle_unscale,
    rev_scaled,
    unscale,
)


@register(
    "revenue_monthly_growth",
    oracle=f"""
WITH m AS (
  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
         SUM({oracle_rev_scaled()}) AS rev_scaled
  FROM lineitem GROUP BY 1
)
SELECT month,
       {oracle_unscale("rev_scaled", REV_D, 2)} AS revenue,
       FLOOR((CAST(rev_scaled AS DOUBLE)
              / LAG(rev_scaled) OVER (ORDER BY month) - 1.0)
             * 100.0 * 1000000.0 + 0.5) / 1000000.0 AS growth_pct
FROM m
""",
)
def revenue_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    m = (
        li.select(
            F.date_trunc("month", F.col("l_shipdate"))
            .cast("date")
            .alias("month"),
            rev_scaled().alias("_rs"),
        )
        .groupBy("month")
        .agg(F.sum("_rs").alias("rev_scaled"))
    )
    # the unpartitioned ordered window is over the AGGREGATED series —
    # #months rows at any fact scale (the plan-shape guard exempts
    # windows whose input is a post-aggregation tiny frame; see
    # window_share_of_region_revenue for the partitioned sibling)
    w = Window.orderBy("month")
    growth = (
        F.floor(
            (
                F.col("rev_scaled").cast("double")
                / F.lag("rev_scaled").over(w)
                - 1.0
            )
            * 100.0
            * 1_000_000.0
            + 0.5
        )
        / 1_000_000.0
    )
    return m.select(
        "month",
        unscale("rev_scaled", REV_D, 2).alias("revenue"),
        growth.alias("growth_pct"),
    )


# --- event transition matrix -------------------------------------------------
# First-order behavioral Markov counts: how often does event type A
# precede event type B in a user's stream? One lag window per user
# (ROWS, streaming-O(n), key-partitioned) and a tiny (from, to) rollup;
# the row-conditional transition probability comes from a windowed
# share over the AGGREGATED matrix (#types² rows — free at any fact
# scale, the same two-level shape as the share-of-region query).


@register(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type AS to_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_type
  FROM events
),
m AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM seq WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n_transitions,
       FLOOR(CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY from_type)
             * 1000000.0 + 0.5) / 1000000.0 AS p_transition
FROM m
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    m = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    w_row = Window.partitionBy("from_type")
    p = (
        F.floor(
            F.col("n").cast("double")
            / F.sum("n").over(w_row)
            * 1_000_000.0
            + 0.5
        )
        / 1_000_000.0
    )
    return m.select(
        "from_type",
        "to_type",
        F.col("n").alias("n_transitions"),
        p.alias("p_transition"),
    )


# --- top-k per group WITH TIES (rank, not row_number) ------------------------
# The tie-inclusive variant of window_topk_orders_per_customer: RANK
# keeps every order whose value ties the k-th — the semantics reports
# actually want ("top 3 order values" should not drop a tied order on
# arbitrary grounds). Same WindowGroupLimit pushdown as the row_number
# form — Spark applies the per-group limit below the full sort for
# rank() too, so tie-inclusion costs nothing extra in the plan.


@register(
    "window_topk_with_ties",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC,
                      o_orderkey) AS rnk
  FROM orders
) t WHERE rnk <= 3
""",
)
def window_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        orders.withColumn("rnk", F.rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


# --- revenue concentration (Pareto / top-decile share) -----------------------
# "What share of revenue comes from the top 10% of customers?" — the
# concentration metric behind every account-tiering decision. Facts
# collapse to customer grain first (map-side, exact cents), the decile
# assignment is an ntile window over the CUSTOMER-grain frame
# partitioned by region (dims-sized at any fact scale), and shares come
# from exact integer sums with one engine-identical floor-rounded
# division at the end.


@register(
    "revenue_concentration",
    oracle="""
WITH cust AS (
  SELECT c.c_custkey, n.n_regionkey AS region_key,
         SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY c.c_custkey, n.n_regionkey
),
tiled AS (
  SELECT region_key, cents,
         NTILE(10) OVER (PARTITION BY region_key
                         ORDER BY cents DESC, c_custkey) AS decile
  FROM cust
)
SELECT region_key,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN decile = 1 THEN cents ELSE 0 END) AS BIGINT)
         AS top_decile_cents,
       FLOOR(CAST(SUM(CASE WHEN decile = 1 THEN cents ELSE 0 END) AS DOUBLE)
             / SUM(cents) * 1000000.0 + 0.5) / 1000000.0 AS top_decile_share
FROM tiled GROUP BY region_key
""",
)
def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import scaled_long

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cust = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", F.col("n_regionkey").alias("region_key"))
        .agg(F.sum(scaled_long("o_totalprice", 2)).alias("cents"))
    )
    w = Window.partitionBy("region_key").orderBy(
        F.col("cents").desc(), "c_custkey"
    )
    tiled = cust.withColumn("decile", F.ntile(10).over(w))
    top = F.sum(F.when(F.col("decile") == 1, F.col("cents")).otherwise(0))
    share = F.floor(
        top.cast("double") / F.sum("cents") * 1_000_000.0 + 0.5
    ) / 1_000_000.0
    return tiled.groupBy("region_key").agg(
        F.sum("cents").alias("total_cents"),
        top.alias("top_decile_cents"),
        share.alias("top_decile_share"),
    )
