"""Exact-arithmetic aggregation helpers.

FP double addition is not associative, so a double SUM's last bits depend
on partition/aggregation order — which differs between Spark's
partial+final aggregation and the DuckDB oracle (and run to run under
AQE). These helpers route double sums through DECIMAL (exact, associative)
so results are bit-stable across engines, then surface DOUBLE so schemas
line up. See registry.py for the full policy.

Precisions are sized so products stay inside DECIMAL(38, _):
MONEY(14,2) * RATE(9,6) -> (24,8); * RATE again -> (34,14); SUM -> (38,14).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(14,2)"  # prices, balances (exact to cents, up to 1e12)
RATE = "decimal(9,6)"  # discounts, taxes, small metrics (exact to 1e-6)


def dsum(col: Column | str, typ: str = MONEY) -> Column:
    """Exact SUM of a double column via decimal; returns DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(typ)).cast("double")


def davg(col: Column | str, typ: str = MONEY, scale: int = 6) -> Column:
    """Deterministic AVG: exact decimal sum, one double division, round."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(typ)).cast("double") / F.count(c), scale)


def oracle_dsum(expr: str, typ: str = "DECIMAL(14,2)") -> str:
    """DuckDB twin of dsum()."""
    return f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE)"


def oracle_davg(expr: str, typ: str = "DECIMAL(14,2)", scale: int = 6) -> str:
    """DuckDB twin of davg()."""
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE)"
        f" / COUNT({expr}), {scale})"
    )


def net_revenue() -> Column:
    """l_extendedprice * (1 - l_discount) in exact decimal — THE
    cross-engine revenue expression (precisions matched to the DuckDB
    oracle's INT128 path; see the q1 oracle's width commentary).
    Single definition so a precision change lands everywhere at once."""
    return F.col("l_extendedprice").cast(MONEY) * (
        (F.lit(1) - F.col("l_discount").cast(RATE)).cast("decimal(8,6)")
    )
