"""TPC-H query-shape coverage: the 14 shapes not already present.

q1/q3/q4/q6/q10/q12/q14/q18 live in relational.py / joins.py /
grouping.py; this module adds the remaining classic shapes so the
engine demonstrably covers every TPC-H access pattern: multi-way join
cycles (q5, q7, q8, q9), correlated aggregates (q2, q17), scalar-
subquery gates (q11, q15, q22), distribution rollups (q13), disjunctive
pushdown (q19), distinct-count rollups (q16), and nested semi/anti
composition (q20, q21).

The driver corpus is TPC-H-ish, not TPC-H: there is no partsupp table
and no comment/commitdate/receiptdate/shipmode/phone columns. Queries
that reference those are ADAPTED (marked "adapted" below) to the
nearest same-shape formulation over the available columns — the join/
subquery structure is preserved, the missing predicate is swapped for
one the corpus supports (e.g. supplier unit price from lineitem instead
of ps_supplycost; custkey-mod country codes instead of phone prefixes).

Exact-arithmetic policy as everywhere (functions/exact.py): money sums
via scaled-LONG (two-level combine when groups are low-cardinality),
ratios as one double division over exact integer sums, round(6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import (
    REV_D,
    davg,
    dsum,
    oracle_davg,
    oracle_dsum,
    oracle_rev_scaled,
    oracle_unscale,
    partial_by_partition,
    rev_scaled,
    scaled_long,
    unscale,
)
from ..registry import register

_TS = "CAST('{}' AS TIMESTAMP)"


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# --- Q5: local supplier volume (6-way join cycle) ----------------------------
# customer and supplier constrained to the SAME nation — the classic
# join cycle. Dimensions broadcast; the two fact joins shuffle on their
# keys; 25 nation groups ← billions of rows → two-level combine.


@register(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n.n_name AS nation,
       {oracle_unscale(f"SUM({oracle_rev_scaled('l.l_extendedprice', 'l.l_discount')})", REV_D, 2)} AS revenue,
       COUNT(*) AS n_items
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        cust.join(
            orders.filter(
                (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
                & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
            ),
            cust.c_custkey == F.col("o_custkey"),
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
    )
    return (
        partial_by_partition(joined, [(F.col("n_name"), "nation")])
        .sum_scaled(rev_scaled(), REV_D, "revenue")
        .count("n_items")
        .finish()
    )


# --- Q7: volume shipping between two nations ---------------------------------
# Supplier-nation x customer-nation PAIR condition (disjunction of the
# two orderings) + shipdate-year breakout. 4 groups → two-level.


@register(
    "q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       {oracle_unscale(f"SUM({oracle_rev_scaled('l.l_extendedprice', 'l.l_discount')})", REV_D, 2)} AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return (
        partial_by_partition(
            joined,
            [
                "supp_nation",
                "cust_nation",
                (F.year("l_shipdate").cast("long"), "l_year"),
            ],
        )
        .sum_scaled(rev_scaled(), REV_D, "revenue")
        .finish()
    )


# --- Q8: national market share (conditional-sum ratio per year) --------------


@register(
    "q8_market_share",
    oracle=f"""
WITH all_nations AS (
  SELECT year(o.o_orderdate) AS o_year,
         {oracle_rev_scaled('l.l_extendedprice', 'l.l_discount')} AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                           ELSE CAST(0 AS BIGINT) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM all_nations GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(
            part.filter(F.col("p_type") == "ECONOMY"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            orders.filter(
                (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
                & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "AMERICA")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = rev_scaled()
    target = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(
        F.lit(0).cast("long")
    )
    return (
        partial_by_partition(
            joined, [(F.year("o_orderdate").cast("long"), "o_year")]
        )
        .sum_long(target, "_target")
        .sum_long(vol, "_total")
        .finish()
        .select(
            "o_year",
            F.round(
                F.col("_target").cast("double") / F.col("_total").cast("double"), 6
            ).alias("mkt_share"),
        )
    )


# --- Q9: product-type profit by nation/year (adapted: no ps_supplycost ------
# column in the corpus, so profit == discounted revenue; the join
# structure — part-name filter, supplier nation, order year — is kept).


@register(
    "q9_product_profit",
    oracle=f"""
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       {oracle_unscale(f"SUM({oracle_rev_scaled('l.l_extendedprice', 'l.l_discount')})", REV_D, 2)} AS profit
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, year(o.o_orderdate)
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(
            part.filter(F.col("p_name").like("%red%")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        partial_by_partition(
            joined,
            [
                (F.col("n_name"), "nation"),
                (F.year("o_orderdate").cast("long"), "o_year"),
            ],
        )
        .sum_scaled(rev_scaled(), REV_D, "profit")
        .finish()
    )


# --- Q13: customer order-count distribution ----------------------------------
# LEFT JOIN so order-less customers count at 0, then the distribution of
# the counts (a groupBy of a groupBy). The excluded-comment predicate is
# adapted to o_orderpriority <> '1-URGENT'.


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            cust.c_custkey == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --- Q15: top supplier (scalar-subquery max over an aggregated view) ---------


_Q15_REV = oracle_rev_scaled("l_extendedprice", "l_discount")


@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {oracle_unscale(f"SUM({_Q15_REV})", REV_D, 2)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    # per-supplier groups are bounded (scan-quarter lines per supplier)
    # → single-level; the max is a 1-row broadcast, not a collect
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(unscale(F.sum(rev_scaled()), REV_D, 2).alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        revenue.join(
            F.broadcast(top), F.col("total_revenue") == F.col("_max_rev")
        )
        .join(supp, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- Q16: supplier count by part attributes (adapted: the part-supplier ------
# relation comes from observed lineitem pairs — there is no partsupp
# table; the complaint-comment exclusion becomes s_acctbal < 0).


@register(
    "q16_parts_supplier",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    bad = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    keep = part.filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(keep, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- Q17: small-quantity revenue (correlated per-part AVG subquery) ----------


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
SELECT {oracle_unscale("SUM(CAST(ROUND((l.l_extendedprice) * 100, 0) AS BIGINT))", 2, None)} / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < (
    SELECT 0.2 * {oracle_davg("l2.l_quantity", 0)}
    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
  )
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # decorrelate: per-part avg quantity (bounded groups → single-level),
    # broadcast back against the brand-filtered lines
    per_part = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        davg("l_quantity", 0).alias("avg_qty")
    )
    brand = li.join(
        part.filter(F.col("p_brand") == "Brand#23"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    small = brand.join(
        per_part, F.col("l_partkey") == F.col("avg_partkey")
    ).filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    return small.agg(
        (
            unscale(F.sum(scaled_long("l_extendedprice", 2)), 2, None) / 7.0
        ).alias("avg_yearly")
    )


# --- Q19: disjunctive predicate pushdown (OR of three brand/size/qty bands) --


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
SELECT {oracle_unscale(f"SUM({oracle_rev_scaled('l.l_extendedprice', 'l.l_discount')})", REV_D, 2)} AS revenue,
       COUNT(*) AS n_items
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, F.col("p_partkey") == F.col("l_partkey"))
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        partial_by_partition(joined.filter(band), [])
        .sum_scaled(rev_scaled(), REV_D, "revenue")
        .count("n_items")
        .finish()
    )


# --- Q2: minimum-cost supplier (adapted: unit price observed from ------------
# lineitem — price/quantity — stands in for ps_supplycost; correlated
# per-part MIN preserved).


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH unit AS (
  SELECT l.l_partkey, l.l_suppkey,
         MIN(l.l_extendedprice / l.l_quantity) AS unit_price
  FROM lineitem l GROUP BY l.l_partkey, l.l_suppkey
)
SELECT p.p_partkey, s.s_name, n.n_name AS nation,
       FLOOR(u.unit_price * 1000000 + 0.5) / 1000000.0 AS unit_price
FROM part p
JOIN unit u     ON u.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = u.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
  AND u.unit_price = (
    SELECT MIN(u2.unit_price) FROM unit u2
    JOIN supplier s2 ON s2.s_suppkey = u2.l_suppkey
    JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
    JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
    WHERE u2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
  )
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    )
    europe = (
        unit.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
    )
    # correlated MIN → window min per part over the filtered region set;
    # FP equality is safe: both sides take MIN over identical doubles
    w = Window.partitionBy("l_partkey")
    best = europe.withColumn("_min_price", F.min("unit_price").over(w)).filter(
        F.col("unit_price") == F.col("_min_price")
    )
    return (
        best.join(
            part.filter(F.col("p_size") == 15),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "p_partkey",
            "s_name",
            F.col("n_name").alias("nation"),
            # floor(x*1e6 + 0.5) instead of round(x, 6): price/quantity
            # can land exactly on a half boundary (e.g. .3478125), where
            # Spark's shortest-repr HALF_UP and DuckDB's scaled-double
            # round disagree by 1 ulp of the 6th decimal; floor of the
            # identical double is engine-independent
            (F.floor(F.col("unit_price") * 1000000 + 0.5) / 1000000.0).alias(
                "unit_price"
            ),
        )
    )


# --- Q11: important stock (adapted: per-part revenue share from one ----------
# nation's suppliers vs a scalar-subquery global threshold).


_Q11_REV = oracle_rev_scaled("l.l_extendedprice", "l.l_discount")


@register(
    "q11_important_stock",
    oracle=f"""
WITH natrev AS (
  SELECT l.l_partkey, {_Q11_REV} AS v
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_1'
)
SELECT l_partkey, {oracle_unscale("SUM(v)", REV_D, 2)} AS part_value
FROM natrev
GROUP BY l_partkey
HAVING CAST(SUM(v) AS DOUBLE) > (
  SELECT CAST(SUM(v) AS DOUBLE) * 0.001 FROM natrev
)
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    natrev = (
        li.join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .filter(F.col("n_name") == "NATION_1")
        .select("l_partkey", rev_scaled().alias("v"))
    )
    per_part = natrev.groupBy("l_partkey").agg(F.sum("v").alias("_v"))
    total = per_part.agg(F.sum(F.col("_v").cast("decimal(38,0)")).alias("_tot"))
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("_v").cast("double")
            > F.col("_tot").cast("double") * 0.001
        )
        .select("l_partkey", unscale("_v", REV_D, 2).alias("part_value"))
    )


# --- Q20: potential promotion suppliers (nested semi composition; ------------
# adapted: "shipped more than 300 units of blue parts in 1996" replaces
# the partsupp availqty condition).


@register(
    "q20_promotion_suppliers",
    oracle="""
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_2'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey FROM lineitem l
    WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%')
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_suppkey
    HAVING SUM(CAST(ROUND((l.l_quantity) * 1, 0) AS BIGINT)) > 300
  )
""",
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    from ..functions.exact import scaled_long

    green = part.filter(F.col("p_name").like("%blue%")).select("p_partkey")
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
        )
        .join(green, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(scaled_long("l_quantity", 0)).alias("_q"))
        .filter(F.col("_q") > 300)
    )
    return (
        supp.join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .filter(F.col("n_name") == "NATION_2")
        .join(heavy, F.col("s_suppkey") == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


# --- Q21: suppliers who shipped last (adapted: commit/receipt dates ----------
# are absent, so "kept the order waiting" becomes "shipped on the
# order's latest ship date while other suppliers shipped earlier" —
# same EXISTS / NOT-EXISTS-other-supplier composition).


@register(
    "q21_last_shipper",
    oracle="""
WITH marks AS (
  SELECT l_orderkey,
         MAX(l_shipdate) AS last_ship,
         COUNT(DISTINCT l_suppkey) AS n_supps
  FROM lineitem GROUP BY l_orderkey
)
SELECT s.s_name, COUNT(DISTINCT l.l_orderkey) AS numwait
FROM lineitem l
JOIN marks m    ON m.l_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_4'
  AND m.n_supps > 1
  AND l.l_shipdate = m.last_ship
GROUP BY s.s_name
""",
)
def q21_last_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    marks = li.groupBy(F.col("l_orderkey").alias("m_orderkey")).agg(
        F.max("l_shipdate").alias("last_ship"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )
    return (
        li.join(
            marks,
            (F.col("l_orderkey") == F.col("m_orderkey"))
            & (F.col("n_supps") > 1)
            & (F.col("l_shipdate") == F.col("last_ship")),
        )
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .filter(F.col("n_name") == "NATION_4")
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


# --- Q22: global sales opportunity (adapted: country code = custkey mod 7 ----
# — no phone column — and the NOT EXISTS gates on HIGH-VALUE orders
# since every customer in this corpus has some order; AVG-subquery
# gate + anti-join composition kept).


@register(
    "q22_sales_opportunity",
    oracle=f"""
WITH codes AS (
  SELECT c_custkey, c_acctbal, c_custkey % 7 AS cntrycode
  FROM customer WHERE c_custkey % 7 IN (1, 3, 5)
)
SELECT cntrycode, COUNT(*) AS numcust,
       {oracle_dsum("c_acctbal")} AS totacctbal
FROM codes c
WHERE c.c_acctbal > (
  SELECT {oracle_davg("c2.c_acctbal")} FROM codes c2 WHERE c2.c_acctbal > 0.0
)
AND NOT EXISTS (SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
GROUP BY cntrycode
""",
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    codes = cust.filter((F.col("c_custkey") % 7).isin(1, 3, 5)).select(
        "c_custkey", "c_acctbal", (F.col("c_custkey") % 7).alias("cntrycode")
    )
    threshold = codes.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("_avg_bal")
    )
    return (
        codes.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(
            orders.filter(F.col("o_totalprice") > 400000),
            codes.c_custkey == orders.o_custkey,
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )
