"""JVM-side construction of tiny control tables (meta rows, empty
evidence frames) — the fast path for the per-batch bookkeeping writes
every store/loop op performs.

Why this exists (measured, round 10): ``spark.createDataFrame(rows)``
parallelizes the rows into ``defaultParallelism`` PYTHON-backed
partitions. Any task that then consumes several of those partitions
sequentially — ``coalesce(1)`` before a 1-file meta write is the
canonical case — pays one Python-worker round-trip PER PARTITION
(~140 ms each on this host), so a one-row meta write cost a flat
~4.5 s on local[32] (32 × worker round-trip), and the unified curation
loop paid it four times per micro-batch (two stores × intent+commit).
Building the same row JVM-side (``spark.range`` + literal columns)
makes the identical write ~0.2 s: no Python partitions exist at all.
On a real cluster the per-partition cost is smaller but still real
(Python worker spin-up per executor); a control-row write should never
involve Python executors anywhere.

Literal values only — anything expressible as ``F.lit(v).cast(type)``
(numbers, strings, booleans, None). Data rows with arrays/structs keep
using createDataFrame; their consumers read the partitions in
parallel, where the round-trips overlap instead of serializing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def one_row_df(spark: SparkSession, values: tuple, schema: str) -> DataFrame:
    """A 1-row, 1-partition DataFrame with ``values`` under the DDL
    ``schema`` — JVM-only plan (range + literals), no Python
    partitions, safe to write without a coalesce."""
    st = StructType.fromDDL(schema)
    if len(values) != len(st.fields):
        # explicit raise, not assert: under ``python -O`` an assert is
        # stripped and a mismatched tuple would zip-truncate silently,
        # writing a meta row with missing/misaligned fields
        raise ValueError(
            f"one_row_df: {len(values)} values for {len(st.fields)} "
            f"schema fields ({values!r} vs {schema!r})"
        )
    return spark.range(0, 1, 1, 1).select(
        *[
            F.lit(v).cast(f.dataType).alias(f.name)
            for f, v in zip(st.fields, values)
        ]
    )


def empty_df(spark: SparkSession, schema: str) -> DataFrame:
    """A 0-row, 1-partition DataFrame under the DDL ``schema`` —
    JVM-only twin of ``spark.createDataFrame([], schema)``, which
    carries defaultParallelism empty Python partitions that still cost
    a worker round-trip each wherever they're consumed."""
    st = StructType.fromDDL(schema)
    return spark.range(0, 0, 1, 1).select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in st.fields]
    )
