"""Registry-wide plan-shape guard.

Explains EVERY registered query and asserts the two plan pathologies
that would silently wreck a 100 TB run never reappear:

1. ``CartesianProduct`` — a shuffle-based all-pairs join. (The bounded
   ``cross_join_region_quarters`` demo is broadcast-nested-loop over a
   constant-size side, which is a different — and allowed — operator.)
2. An ORDER BY window with NO PARTITION BY — every row funnels through
   one task (``Exchange SinglePartition`` + global Sort): the plan that
   turned up as the O(n²)/serial hot spots in earlier perf audits.

Plans are built (analysis + physical planning only, nothing executes)
at sf0.001, so the sweep stays cheap. A regression turns into a named
test failure instead of a bench surprise.
"""

from __future__ import annotations

import re

import pytest

from weather_etl_pipeline_spark.registry import load_all

SF_DIR = "/root/testdata/sf0.001"

# queries allowed to contain a deliberate, bounded exception
ALLOW_CARTESIAN: set[str] = set()
# revenue_monthly_growth: the ordered window runs over the POST-
# AGGREGATION monthly series (#months rows at any fact scale) — the
# single-task funnel only ever sees a tiny frame, which is the
# sanctioned two-level BI shape, not the pathology this guard hunts
ALLOW_GLOBAL_WINDOW: set[str] = {"revenue_monthly_growth"}

_REGISTRY = load_all()


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _top_level_groups(s: str) -> list[str]:
    """Split ``[a], [b], [c]`` into top-level bracket groups."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start is not None:
                groups.append(s[start + 1 : i])
                start = None
    return groups


_WINDOW_LINE = re.compile(r"(?:^|[\s:+-])Window (\[.*)$")


def unpartitioned_ordered_windows(plan: str) -> list[str]:
    """Window nodes printed as ``Window [exprs], [order]`` (two groups,
    second is a sort order) — i.e. ORDER BY with no PARTITION BY.
    Partitioned windows print three groups: exprs, partition, order."""
    bad = []
    for line in plan.splitlines():
        m = _WINDOW_LINE.search(line)
        if not m:
            continue
        groups = _top_level_groups(m.group(1))
        if len(groups) == 2 and ("ASC" in groups[1] or "DESC" in groups[1]):
            bad.append(line.strip())
    return bad


@pytest.mark.parametrize("name", sorted(_REGISTRY))
def test_plan_shape(spark, name):
    q = _REGISTRY[name]
    plan = _physical_plan(q.fn(spark, SF_DIR))
    if name not in ALLOW_CARTESIAN:
        assert "CartesianProduct" not in plan, (
            f"{name}: CartesianProduct in physical plan\n{plan}"
        )
    if name not in ALLOW_GLOBAL_WINDOW:
        bad = unpartitioned_ordered_windows(plan)
        assert not bad, (
            f"{name}: ORDER BY window without PARTITION BY "
            f"(single-task funnel):\n" + "\n".join(bad)
        )
    # third guarded class (round 6): row-at-a-time SCALAR Python UDFs.
    # All scalar Python execution must be on the Arrow surface
    # (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas /
    # *WithState) — a plain BatchEvalPython node is the 10-100x-slower
    # pickling path the repo bans by policy; this makes the ban
    # mechanical. BatchEvalPythonUDTF is NOT banned: the table-function
    # surface (udtf_shingles) has no Arrow variant in this Spark.
    scalar_pickled = re.sub(r"BatchEvalPythonUDTF", "", plan)
    assert "BatchEvalPython" not in scalar_pickled, (
        f"{name}: row-at-a-time Python UDF (BatchEvalPython) in plan\n{plan}"
    )


def test_minhash_signature_path_is_narrow(spark):
    """The round-5 rework made the whole MinHash signature derivation a
    narrow pipeline: the ONLY exchange is the round-robin spread (no
    hash/range partitioning anywhere). A hashpartitioning exchange
    reappearing means someone reintroduced the explode +
    groupBy/collect_set round trip."""
    from weather_etl_pipeline_spark.catalog import load_table
    from weather_etl_pipeline_spark.operators.dedup import minhash_signatures

    docs = load_table(spark, SF_DIR, "documents")
    plan = _physical_plan(minhash_signatures(docs))
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan, (
        "minhash signature path gained a shuffle:\n" + plan
    )


def test_langid_trigram_is_narrow(spark):
    """Trigram language-ID scores with HOF folds over literal profiles
    — no explode/join/aggregation shuffle."""
    plan = _physical_plan(_REGISTRY["text_langid_trigram"].fn(spark, SF_DIR))
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan, (
        "text_langid_trigram gained a shuffle:\n" + plan
    )


def test_guard_catches_seeded_regressions(spark):
    """The guard itself must fire on known-bad plans."""
    from pyspark.sql import Window, functions as F

    # seeded unpartitioned ordered window
    bad_window = spark.range(10).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    assert unpartitioned_ordered_windows(_physical_plan(bad_window))
    # seeded cartesian: non-equi join with broadcast disabled
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(10)
        b = spark.range(10).withColumnRenamed("id", "j")
        cart = a.join(b, F.col("id") * F.col("j") > 5)
        assert "CartesianProduct" in _physical_plan(cart)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # a healthy partitioned window must NOT fire
    good = spark.range(10).withColumn("g", F.col("id") % 2).withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("id"))
    )
    assert not unpartitioned_ordered_windows(_physical_plan(good))


# --- broadcast-join regression guard (TPC-H star family) ---------------------
# The third plan pathology, alongside cartesians and global windows: a
# stats/threshold regression silently flipping a dimension-side join
# (nation/region/supplier/customer/part) from broadcast to sort-merge
# would 10× shuffle volume at cluster scale. Plans are built at sf0.1
# (the bench scale, where the stats actually matter); each query pins
# its CURRENT dimension-broadcast count as a floor and forbids any
# shuffle-side join outright — every join in this family has a
# broadcastable side by construction.

_STAR_FAMILY_MIN_BHJ = {
    "star_join_revenue": 4,
    "join_part_pricing": 1,
    "basket_part_pairs": 1,
    "q2_min_cost_supplier": 4,
    "q3_shipping_priority": 2,
    "q4_order_priority": 1,
    "q5_local_supplier_volume": 5,
    "q7_volume_shipping": 5,
    "q8_market_share": 7,
    "q9_product_profit": 4,
    "q10_returned_revenue": 2,
    "q11_important_stock": 4,
    "q12_shipmode_priority": 1,
    "q13_customer_distribution": 1,
    "q14_promo_revenue": 1,
    "q15_top_supplier": 2,
    "q16_parts_supplier": 2,
    "q17_small_quantity_revenue": 2,
    "q18_large_orders": 1,
    "q19_disjunctive_revenue": 1,
    "q20_promotion_suppliers": 3,
    "q21_last_shipper": 3,
    "q22_sales_opportunity": 1,
}

_SF01 = "/root/testdata/sf0.1"


# --- exchange-count budget guard (headline queries) --------------------------
# Fourth plan pathology class, added round 8 after a correctness commit
# (round-7 collapse-first addendum) silently added two full-text
# shuffles to dedup_jaccard_pairs — none of the other guards (cartesian,
# global window, BatchEvalPython, broadcast floor) see exchange COUNT.
# Each headline query pins its current number of SHUFFLE exchanges
# (hash/range/single/round-robin — BroadcastExchange excluded: adding a
# broadcast is usually an improvement, and the star floor above guards
# the reverse flip) as a CEILING at sf0.1. A plan gaining a shuffle
# fails a named test; a plan LOSING one prints the new lower number in
# the failure so the ceiling can be ratcheted down deliberately.

_HEADLINE_MAX_SHUFFLES = {
    "asof_join_last_error": 1,  # ratcheted from 2 (round-9 window-order tie-collapse)
    "dedup_exact_canonical": 1,
    "dedup_jaccard_pairs": 6,  # ratcheted from 7 (round-12 arrays verify)
    "dedup_minhash_lsh": 9,
    "gold_daily_rollup": 1,
    "json_extract_agg": 1,
    "llm_corpus_curation": 2,
    "multimodal_featurize": 0,
    "q1_pricing_summary": 2,
    "q3_shipping_priority": 1,
    "simsearch_knn_bruteforce": 2,
    "star_join_revenue": 2,
    "stream_session_windows": 1,
    "stream_tumbling_hourly": 1,
    "text_term_frequency": 1,
    "timeseries_gapfill_hourly": 2,
    "udf_scalar_halve": 0,
    "window_topk_orders_per_customer": 1,
    "window_trailing_hour_range": 1,
}


def _shuffle_count(plan: str) -> int:
    return plan.count("Exchange") - plan.count("BroadcastExchange")


def test_headline_budget_covers_all_headlines():
    """A new headline query must declare its shuffle budget here."""
    headline = {n for n, q in _REGISTRY.items() if q.headline}
    assert headline == set(_HEADLINE_MAX_SHUFFLES), (
        "headline set drifted from _HEADLINE_MAX_SHUFFLES: "
        f"missing={sorted(headline - set(_HEADLINE_MAX_SHUFFLES))} "
        f"stale={sorted(set(_HEADLINE_MAX_SHUFFLES) - headline)}"
    )


@pytest.mark.parametrize("name", sorted(_HEADLINE_MAX_SHUFFLES))
def test_headline_shuffle_budget_at_sf01(spark, name):
    # cache-independent plans: a cache left by an earlier test swaps an
    # InMemoryRelation into the tree, whose STORED plan re-prints its
    # own exchanges and inflates the count (seen in-suite for
    # dedup_minhash_lsh); the bench clears caches per query, so the
    # budget is pinned against the same cold-plan shape
    spark.catalog.clearCache()
    plan = _physical_plan(_REGISTRY[name].fn(spark, "/root/testdata/sf0.1"))
    n = _shuffle_count(plan)
    assert n <= _HEADLINE_MAX_SHUFFLES[name], (
        f"{name}: plan gained a shuffle — {n} exchanges vs budget "
        f"{_HEADLINE_MAX_SHUFFLES[name]}\n" + plan
    )


@pytest.mark.parametrize("name", sorted(_STAR_FAMILY_MIN_BHJ))
def test_star_join_stays_broadcast_at_sf01(spark, name):
    plan = _physical_plan(_REGISTRY[name].fn(spark, _SF01))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, (
        f"{name}: a join fell off the broadcast path at sf0.1\n" + plan
    )
    bhj = plan.count("BroadcastHashJoin")
    assert bhj >= _STAR_FAMILY_MIN_BHJ[name], (
        f"{name}: expected >= {_STAR_FAMILY_MIN_BHJ[name]} broadcast hash "
        f"joins, found {bhj}\n" + plan
    )
