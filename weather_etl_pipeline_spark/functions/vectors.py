"""Vector column expressions over ``array<float>`` embeddings.

All built-in higher-order functions (JVM-side): zip_with for the
elementwise product, aggregate for the fold. Elements are cast to
double BEFORE any arithmetic so both Spark and the DuckDB oracle do the
same left-to-right double summation — bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right double dot product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """cosine(a, b) on pre-cast double arrays."""
    return dot(a, b) / (norm(a) * norm(b))


# --- Spark-SQL string twins (round 14) ----------------------------------------
# One F.expr parse instead of per-F.* py4j round trips — identical
# parsed trees (0.0D keeps the fold accumulator DOUBLE like F.lit(0.0);
# see functions/exact.py string-twin note).


def spark_as_double(vec: str) -> str:
    return f"transform({vec}, x -> CAST(x AS DOUBLE))"


def spark_dot(a: str, b: str) -> str:
    """Spark-SQL twin of dot() — same left-to-right double fold."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D,"
        " (acc, x) -> acc + x)"
    )


def spark_norm(a: str) -> str:
    return f"sqrt({spark_dot(a, a)})"


def spark_cosine(a: str, b: str) -> str:
    return f"({spark_dot(a, b)} / ({spark_norm(a)} * {spark_norm(b)}))"
