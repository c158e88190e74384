"""Query registry — the single source of truth for the driver contract.

Every implemented operator registers here with a ``(spark, sf_dir) ->
DataFrame`` callable and (when SQL-expressible) a DuckDB oracle twin.
``__spark_entry__.py`` re-exports this registry as ``queries()`` /
``oracle_sql()``; ``bench.py`` runs the entries flagged ``headline``.

Cross-engine determinism policy (why oracles hash-match):

- Double-typed SUMs are computed in exact DECIMAL arithmetic on both
  sides (per-value cast, associative exact addition) and cast to DOUBLE
  only at the very end — FP summation order can differ between Spark
  partial aggregation and DuckDB, decimal sums cannot.
- AVGs are ``round(cast(exact_decimal_sum as double) / count, 6)`` — a
  single FP division over identical inputs is deterministic.
- Per-row FP expressions use the same operation order on both sides and
  round(…, 6) at the end.
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


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, headline: bool = False
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every operator module so all @register decorators run."""
    from .operators import (  # noqa: F401
        approx,
        asof,
        clusters,
        dedup,
        funnel,
        grouping,
        ivf,
        joins,
        jsonops,
        multimodal,
        rangejoin,
        relational,
        reshape,
        setops,
        simsearch,
        stats,
        subqueries,
        text,
        timeseries,
        udfs,
        views,
        windows,
    )
    from .streaming import stateful as streaming_stateful  # noqa: F401
    from .streaming import windows as streaming_windows  # noqa: F401

    return REGISTRY
