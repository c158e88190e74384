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
