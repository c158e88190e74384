"""Query registry — the single source of truth for the driver contract.

Every implemented operator registers here with a ``(spark, sf_dir) ->
DataFrame`` callable and (when SQL-expressible) a DuckDB oracle twin.
``__spark_entry__.py`` re-exports this registry as ``queries()`` /
``oracle_sql()``; ``bench.py`` runs the entries flagged ``headline``.

Cross-engine determinism policy (why oracles hash-match):

- Double-typed SUMs go through scaled-integer arithmetic on both sides
  (``ROUND(expr * 10^d)`` → LONG/BIGINT sum — exact and associative for
  the corpus's fixed-decimal columns) and divide back to DOUBLE at the
  very end — FP summation order can differ between Spark partial
  aggregation and DuckDB, integer sums cannot. Low-cardinality product
  rollups use a two-level combine (partition-local LONG partials,
  DECIMAL(38,0) final) for int64 safety; see functions/exact.py.
- AVGs are ``cast(exact_sum as double) / 10^d / count`` — FP divisions
  over identical inputs are deterministic.
- Final display rounding is ``floor(x * 10^n + 0.5) / 10^n`` on BOTH
  sides, never the engine's ``round(x, n)``: Spark rounds the shortest
  decimal repr while DuckDB rounds scaled-double arithmetic, and the two
  disagree when the repr terminates with a 5 one digit past the kept
  scale (quotients by powers of two — money/qty, int-sum/count — hit
  this). ``functions/exact.py::hround`` / ``oracle_hround``.
- Per-row FP expressions use the same operation order on both sides.
- Every computed column is aliased identically on both sides (driver
  sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None => driver does rows-only check
    headline: bool = False  # include in bench.py's sf0.1 run
    # name of an oracle-exact PORTABLE TWIN whose DuckDB side bounds
    # this query's perf when its own semantics aren't SQL-expressible
    # (e.g. dedup_minhash_lsh's xxHash signatures vs the arithmetic
    # twin dedup_minhash_portable: same collapse-first pipeline, same
    # banding/cap/verify work shape, only the hash kernel differs —
    # so the twin's DuckDB cost is the honest 2×-gate denominator).
    # Consumed by tools/oracle_ratio.py; correctness still goes
    # through the twin's own registry entry.
    proxy_oracle: str | None = None


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    proxy_oracle: str | None = None,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle,
            headline=headline,
            proxy_oracle=proxy_oracle,
        )
        return fn

    return deco


# Verification-priority order. The external harness samples a window of
# registry entries in iteration order each round, so entries are ordered
# round-robin by verification debt: families with no green verdict yet,
# then queries whose implementation changed since the last green run,
# then the long-stable remainder. Names not listed keep registration
# order after the listed ones.
#
# NEXT ROTATION (round 3): the round-2 additions have local diffcheck
# verdicts but no harness verdict yet — promote them into the window,
# rotating out entries green in rounds 1-2: the full tpch.py sweep
# (q2 q5 q7 q8 q9 q11 q13 q15 q16 q17 q19 q20 q21 q22), scaleops
# (split/salted/stratified), portable twins (minhash/simhash/ivf),
# and the round-2-session operators (ntile, asof-forward, levenshtein,
# datetime/string/try profiles, interpolation, sessionize, json-map,
# array features, share-of-total, regression, skew/kurtosis, curation,
# decontaminate, repetition, variant, best-quality dedup, chunker,
# cross join). asof_join_last_error's internals changed in round 2
# (direction parameter) — re-verify it too.
_PRIORITY = [
    "q1_pricing_summary",  # flagship — keep first
    # families with no harness verdict yet (round 1 window ended at 50)
    "simsearch_neardup_blocked",
    "emb_label_centroids",
    "simsearch_ann_lsh",
    "stats_corr_moments",
    "stats_value_outliers",
    "stats_value_histogram",
    "subquery_scalar_vs_avg",
    "subquery_correlated_min",
    "subquery_in_segment",
    "text_term_frequency",
    "text_doc_stats",
    "text_lang_source_rollup",
    "text_token_count_bpe",
    "text_doc_fingerprint",
    "text_mode_token_per_lang",
    "text_tfidf_top_term",
    "text_normalize",
    "text_quality_score",
    "text_langid_trigram",
    "text_langid_markers",
    "timeseries_gapfill_hourly",
    "udf_group_rank",
    "udtf_shingles",
    "udf_scalar_halve",
    "sql_over_view",
    "window_topk_orders_per_customer",
    "window_rank_customers_by_balance",
    "window_lag_lead_events",
    "window_running_total",
    "window_moving_avg",
    "window_first_nth_order",
    "window_trailing_hour_range",
    "global_topk_orders",
    "stateful_user_totals_batch",
    "stream_tumbling_hourly",
    "stream_sliding_windows",
    "stream_session_windows",
    # fixed this round (array outputs scalar-ized)
    "approx_quantiles",
    "collect_sorted_orders",
    # upgraded this round (new oracle / determinism fix)
    "dedup_clusters",
    "funnel_signup_to_purchase",
    # changed this round (scaled-LONG exact arithmetic)
    "q6_forecast_revenue",
    "gold_daily_rollup",
    "star_join_revenue",
    "join_part_pricing",
    "q3_shipping_priority",
    "q18_large_orders",
    "q10_returned_revenue",
    "q14_promo_revenue",
]


def load_all() -> dict[str, Query]:
    """Import every operator module so all @register decorators run."""
    from .operators import (  # noqa: F401
        approx,
        arrayfns,
        asof,
        clusters,
        curation,
        datetime_fns,
        dedup,
        funnel,
        grouping,
        ivf,
        joins,
        jsonops,
        multimodal,
        rangejoin,
        relational,
        safefns,
        reshape,
        scaleops,
        setops,
        simsearch,
        stats,
        stringfns,
        subqueries,
        text,
        timeseries,
        tpch,
        udfs,
        views,
        windows,
    )
    from .streaming import stateful as streaming_stateful  # noqa: F401
    from .streaming import windows as streaming_windows  # noqa: F401

    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
