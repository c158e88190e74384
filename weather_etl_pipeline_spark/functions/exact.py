"""Exact-arithmetic aggregation helpers (scaled-integer fast path).

FP double addition is not associative, so a double SUM's last bits depend
on partition/aggregation order — which differs between Spark's
partial+final aggregation and the DuckDB oracle (and run to run under
AQE). Round 1 fixed this by summing in DECIMAL (exact, associative), but
Spark's BigDecimal aggregate path costs ~8x a primitive sum (measured:
15.3s decimal vs 5.5s long vs 2.2s double on a 9.6M-row q1 shape).

Round 2 policy — **scaled-integer sums**: every money/rate column in the
corpus has a fixed decimal scale (prices/balances exactly 2 places,
discounts/taxes 2 places, event values <= 6 places — verified against
the parquet), so ``ROUND(expr * 10^d)`` is an exact integer and a LONG
sum of those integers is exact and associative while staying in
whole-stage codegen's primitive path. Divide back to double at the end.
The per-row double product before ROUND is deterministic cross-engine
because both engines evaluate the identical IEEE expression tree
(left-to-right, same literals); its error is orders of magnitude below
the 0.5 rounding threshold (worst case ~1e-4 scaled units at 1e11
magnitude vs ulp-level operand noise).

Overflow budget (int64 max 9.2e18):

- cents (d=2): max ~1e7/row -> safe to ~9e11 rows *per group* — more
  lineitem rows than a 100 TB corpus holds. Single-level ``dsum`` is
  scale-safe for plain money columns.
- product scales (d=4 revenue, d=6 charge): max ~1.2e11/row -> a LONG
  total overflows past ~8e7 rows per group. Low-cardinality revenue
  rollups (q1, q6, q14, star-join) therefore use the **two-level
  pattern**: partition-local LONG partials (bounded by partition size:
  ~3e6 rows x 1.2e11 = 3.6e17, 25x headroom) combined by an exact
  DECIMAL(38,0) final sum over only #partitions x #groups rows — the
  BigDecimal path touches thousands of rows, not billions. Same trick
  as Spark's own partial/final split, one level up.

The DuckDB oracle needs no such care (its BIGINT sums accumulate in
INT128); oracle twins are plain ``SUM(CAST(ROUND(expr*10^d) AS BIGINT))``
with the same final division/round, so values hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Canonical scales (decimal places) for the corpus, verified exact
# against /root/testdata parquet (see module docstring).
MONEY_D = 2  # prices, balances, totalprice, acctbal
RATE_D = 2  # l_discount, l_tax
VALUE_D = 2  # events.value (verified exactly 2-decimal at all SFs)
REV_D = 4  # price * (1 - discount): 2 + 2 places
CHARGE_D = 6  # price * (1 - discount) * (1 + tax): 2 + 2 + 2 places


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def scaled_long(col: Column | str, d: int = MONEY_D) -> Column:
    """``FLOOR(expr * 10^d + 0.5)`` as LONG — exact for <=d-decimal values.

    floor(+0.5) instead of ROUND (round 9): Spark's ROUND on a DOUBLE
    routes every row through BigDecimal (shortest-decimal re-parse +
    setScale) — measured 0.54 vs 0.33s on the sf0.1 q1 shape, ~40% of
    the whole query, where floor is a single primitive instruction
    inside codegen. The two agree EXACTLY here: a <=d-decimal value
    scales to integer ± ulp-noise, so value+0.5 sits mid-interval, a
    regime where floor and HALF_UP can't disagree (they only split at
    half-integers, which fixed-scale data never produces — same
    argument as hround, and the same floor form both engines run, so
    per-row results stay bit-identical cross-engine; holds for
    negative values too: -12345±eps + 0.5 floors to -12345 from either
    side)."""
    return F.floor(_col(col) * F.lit(10**d) + F.lit(0.5)).cast("long")


def oracle_scaled_long(expr: str, d: int = MONEY_D) -> str:
    """DuckDB twin of scaled_long() — identical IEEE expression tree."""
    return f"CAST(FLOOR(({expr}) * {10**d} + 0.5) AS BIGINT)"


def dsum(col: Column | str, d: int = MONEY_D) -> Column:
    """Exact SUM of a fixed-scale double column via LONG; returns DOUBLE.

    Single-level: safe while the per-GROUP scaled sum fits int64 (see
    module docstring budget — always true for d=2 money columns; use
    the two-level pattern for d>=4 product sums over few groups).
    """
    return F.sum(scaled_long(col, d)).cast("double") / F.lit(float(10**d))


def oracle_dsum(expr: str, d: int = MONEY_D) -> str:
    """DuckDB twin of dsum()."""
    return f"CAST(SUM({oracle_scaled_long(expr, d)}) AS DOUBLE) / {float(10**d)}"


def hround(col: Column, scale: int = 6) -> Column:
    """Engine-independent half-up rounding of a DOUBLE.

    ``ROUND(double, n)`` implementations disagree when the value is an
    EXACTLY-representable decimal half (possible whenever the quotient's
    reduced denominator is a power of two — money/quantity divisions,
    cents/count averages): Spark rounds the shortest decimal repr
    half-up while DuckDB rounds the scaled double, and the two can
    differ by one ulp of the last kept digit (bit us at sf0.1 on
    price/qty = ...4781**25**). ``floor(x*10^n + 0.5)`` evaluates the
    identical IEEE expression on both engines — true halves hit an
    exactly-representable N+0.5 and floor to N+1 everywhere.
    """
    m = F.lit(float(10**scale))
    return F.floor(col * m + F.lit(0.5)) / m


def oracle_hround(expr: str, scale: int = 6) -> str:
    """DuckDB twin of hround()."""
    m = float(10**scale)
    return f"FLOOR(({expr}) * {m} + 0.5) / {m}"


# --- Spark-SQL string twins (round 14) ----------------------------------------
# Same role as the oracle_* twins, aimed at Spark's own parser: the
# Column-API builders cost one py4j round trip per F.* call (~0.5-1.5ms
# of driver latency each — q1's aggregate spec alone was ~150 trips =
# 0.25-0.45s of plan construction PER INVOCATION), where one parsed SQL
# string is a single trip. The emitted fragments are op-for-op the
# trees the Column API built. The ``D`` suffix on every fractional
# literal is LOAD-BEARING: Spark parses a bare ``0.5`` as DECIMAL(1,1)
# (not DOUBLE like F.lit(0.5)), which would silently change the FP
# promotion chain and break the cross-engine value hash.


def spark_scaled_long(expr: str, d: int = MONEY_D) -> str:
    """Spark-SQL twin of scaled_long() — identical floor form."""
    return f"CAST(FLOOR(({expr}) * {10**d} + 0.5D) AS BIGINT)"


def spark_rev_scaled(price: str = "l_extendedprice", disc: str = "l_discount") -> str:
    """Spark-SQL twin of rev_scaled()."""
    return f"CAST(FLOOR({price} * (1 - {disc}) * {10**REV_D} + 0.5D) AS BIGINT)"


def spark_charge_scaled() -> str:
    """Spark-SQL twin of charge_scaled()."""
    return (
        "CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax)"
        f" * {10**CHARGE_D} + 0.5D) AS BIGINT)"
    )


def spark_hround(expr: str, scale: int = 6) -> str:
    """Spark-SQL twin of hround()."""
    m = float(10**scale)
    return f"FLOOR(({expr}) * {m}D + 0.5D) / {m}D"


def spark_unscale(expr: str, d: int, round_to: int | None = 2) -> str:
    """Spark-SQL twin of unscale()."""
    base = f"CAST({expr} AS DOUBLE) / {float(10**d)}D"
    return spark_hround(base, round_to) if round_to is not None else base


def spark_dsum(expr: str, d: int = MONEY_D) -> str:
    """Spark-SQL twin of dsum()."""
    return (
        f"CAST(SUM({spark_scaled_long(expr, d)}) AS DOUBLE) / {float(10**d)}D"
    )


def spark_davg(expr: str, d: int = MONEY_D, scale: int = 6) -> str:
    """Spark-SQL twin of davg() — identical op order (/scale then /count)."""
    inner = (
        f"CAST(SUM({spark_scaled_long(expr, d)}) AS DOUBLE)"
        f" / {float(10**d)}D / COUNT({expr})"
    )
    return spark_hround(inner, scale)


def davg(col: Column | str, d: int = MONEY_D, scale: int = 6) -> Column:
    """Deterministic AVG: exact scaled sum, double divisions, hround."""
    c = _col(col)
    return hround(
        F.sum(scaled_long(c, d)).cast("double") / F.lit(float(10**d)) / F.count(c),
        scale,
    )


def oracle_davg(expr: str, d: int = MONEY_D, scale: int = 6) -> str:
    """DuckDB twin of davg() — identical op order (/scale then /count)."""
    inner = (
        f"CAST(SUM({oracle_scaled_long(expr, d)}) AS DOUBLE)"
        f" / {float(10**d)} / COUNT({expr})"
    )
    return oracle_hround(inner, scale)


# --- revenue product expressions (shared by q1/q3/q6/q10/q14/star-join) ------
# Single definitions so the Spark and oracle expression trees stay
# op-for-op identical (that identity is what makes per-row double
# products deterministic cross-engine).


def rev_scaled(price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """price * (1 - discount), scaled x10^4 to an exact LONG (floor
    form — see scaled_long)."""
    return F.floor(
        _col(price) * (F.lit(1) - _col(disc)) * F.lit(10**REV_D) + F.lit(0.5)
    ).cast("long")


def oracle_rev_scaled(price: str = "l_extendedprice", disc: str = "l_discount") -> str:
    return f"CAST(FLOOR({price} * (1 - {disc}) * {10**REV_D} + 0.5) AS BIGINT)"


def charge_scaled() -> Column:
    """price * (1 - discount) * (1 + tax), scaled x10^6 to an exact LONG
    (floor form — see scaled_long)."""
    return F.floor(
        F.col("l_extendedprice")
        * (F.lit(1) - F.col("l_discount"))
        * (F.lit(1) + F.col("l_tax"))
        * F.lit(10**CHARGE_D)
        + F.lit(0.5)
    ).cast("long")


def oracle_charge_scaled() -> str:
    return (
        "CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax)"
        f" * {10**CHARGE_D} + 0.5) AS BIGINT)"
    )


def unscale(col: Column | str, d: int, round_to: int | None = 2) -> Column:
    """LONG-sum column back to DOUBLE money: /10^d, optional hround."""
    c = _col(col).cast("double") / F.lit(float(10**d))
    return hround(c, round_to) if round_to is not None else c


def oracle_unscale(expr: str, d: int, round_to: int | None = 2) -> str:
    base = f"CAST({expr} AS DOUBLE) / {float(10**d)}"
    return oracle_hround(base, round_to) if round_to is not None else base


# --- two-level exact aggregation (the 100 TB shape) ---------------------------


def partial_by_partition(
    df: DataFrame, keys: list[str | tuple[Column, str]]
) -> "GroupedPartial":
    """Start a two-level exact aggregation.

    Level 1 groups by (spark_partition_id, keys): the map-side partial
    agg collapses each partition's rows into one LONG row per group
    before any shuffle (partition-bounded, no int64 overflow). Level 2
    (``finish``) combines the partials per key with DECIMAL(38,0) sums —
    exact at any scale, and only #partitions x #groups rows wide.

    ``keys``: column names, or ``(expr, name)`` tuples for computed keys.
    """
    return GroupedPartial(df, keys)


class GroupedPartial:
    """Aggregate exprs may be Columns OR Spark-SQL strings (round 14):
    string specs accumulate as SQL text and parse as ONE F.expr each at
    finish() — the parsed trees are identical to the Column-built ones,
    at a fraction of the py4j round trips (see the string-twin note
    above). Mixed usage is fine; both paths share the same partial/final
    structure."""

    def __init__(self, df: DataFrame, keys: list[str | tuple[Column, str]]):
        self._df = df
        self._keys = [k if isinstance(k, str) else k[0].alias(k[1]) for k in keys]
        self._key_names = [k if isinstance(k, str) else k[1] for k in keys]
        self._partials: list[Column | str] = []
        self._finals: list[Column | str] = []

    def sum_scaled(self, expr: Column | str, d: int, alias: str, round_to: int | None = 2) -> "GroupedPartial":
        tmp = f"_p_{alias}"
        if isinstance(expr, str):
            self._partials.append(f"SUM({expr}) AS {tmp}")
            self._finals.append(
                spark_unscale(f"SUM(CAST({tmp} AS DECIMAL(38,0)))", d, round_to)
                + f" AS {alias}"
            )
            return self
        self._partials.append(F.sum(expr).alias(tmp))
        self._finals.append(
            unscale(F.sum(F.col(tmp).cast("decimal(38,0)")), d, round_to).alias(alias)
        )
        return self

    def avg_scaled(self, expr: Column | str, count_of: Column | str, d: int, alias: str, scale: int = 6) -> "GroupedPartial":
        tmp_s, tmp_n = f"_p_{alias}", f"_pn_{alias}"
        if isinstance(expr, str):
            self._partials.append(f"SUM({expr}) AS {tmp_s}")
            self._partials.append(f"COUNT({count_of}) AS {tmp_n}")
            self._finals.append(
                spark_hround(
                    f"CAST(SUM(CAST({tmp_s} AS DECIMAL(38,0))) AS DOUBLE)"
                    f" / {float(10**d)}D / SUM({tmp_n})",
                    scale,
                )
                + f" AS {alias}"
            )
            return self
        self._partials.append(F.sum(expr).alias(tmp_s))
        self._partials.append(F.count(count_of).alias(tmp_n))
        self._finals.append(
            hround(
                F.sum(F.col(tmp_s).cast("decimal(38,0)")).cast("double")
                / F.lit(float(10**d))
                / F.sum(tmp_n),
                scale,
            ).alias(alias)
        )
        return self

    def sum_long(self, expr: Column | str, alias: str) -> "GroupedPartial":
        """Exact integer sum surfaced as DECIMAL(38,0) — for callers that
        post-process (ratios, comparisons) instead of unscaling."""
        tmp = f"_p_{alias}"
        if isinstance(expr, str):
            self._partials.append(f"SUM({expr}) AS {tmp}")
            self._finals.append(f"SUM(CAST({tmp} AS DECIMAL(38,0))) AS {alias}")
            return self
        self._partials.append(F.sum(expr).alias(tmp))
        self._finals.append(F.sum(F.col(tmp).cast("decimal(38,0)")).alias(alias))
        return self

    def count(self, alias: str) -> "GroupedPartial":
        tmp = f"_p_{alias}"
        # coalesce: a keyless (global) agg over zero rows still returns
        # one row, where SUM of partials is NULL but COUNT(*) must be 0
        self._partials.append(f"COUNT(1) AS {tmp}")
        self._finals.append(
            f"COALESCE(SUM({tmp}), CAST(0 AS BIGINT)) AS {alias}"
        )
        return self

    def finish(self) -> DataFrame:
        partials = [F.expr(p) if isinstance(p, str) else p for p in self._partials]
        finals = [F.expr(f) if isinstance(f, str) else f for f in self._finals]
        level1 = self._df.groupBy(
            F.spark_partition_id().alias("_pid"), *self._keys
        ).agg(*partials)
        return level1.groupBy(*self._key_names).agg(*finals)
