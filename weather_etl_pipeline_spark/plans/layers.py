"""Generic incremental layer engine.

The reference hardcodes its two layers (silver clean, gold aggregate)
around one partition scheme (``city``, ``date``) — ``silver.py`` and
``gold.py`` are near-identical control flow around different SQL. This
module extracts that control flow once, parameterized by:

- ``transform``: DataFrame → DataFrame (the layer's logic; must
  preserve the partition columns);
- ``partition_cols``: the incremental unit (any arity — the weather
  lake uses (city, date), an event lake just (event_date));
- ``validations``: gates run against the transformed output before
  anything is written (reference silver.py:42-47, gold.py:45-59).

Execution contract (the scale-relevant part):
- ONE distributed job covers every pending partition (no per-partition
  loop);
- the work-list is a broadcast anti-join against the metadata table;
- the write is dynamic-partition-overwrite (only touched partitions
  replaced);
- metadata marks processed only after a successful write.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet_io import scan_zone, write_partitions
from .incremental import (
    available_partitions,
    filter_to_partitions,
    pending_partitions,
)
from .metadata import mark_processed_cols, processed_partitions_cols


class ValidationError(ValueError):
    """A validation gate failed (reference raises ValueError)."""


Validation = Callable[[DataFrame, DataFrame], None]


@dataclass
class Layer:
    name: str
    transform: Callable[[DataFrame], DataFrame]
    partition_cols: tuple[str, ...] = ("city", "date")
    validations: Sequence[Validation] = field(default_factory=tuple)


def require_all_partitions_nonempty(layer: Layer) -> Validation:
    """Empty-partition gate: every pending partition must produce rows."""

    def check(out: DataFrame, todo: DataFrame) -> None:
        produced = out.select(*layer.partition_cols).distinct()
        missing = todo.join(
            produced, list(layer.partition_cols), "left_anti"
        ).collect()
        if missing:
            bad = [tuple(str(r[c]) for c in layer.partition_cols) for r in missing]
            raise ValidationError(
                f"layer {layer.name}: no rows produced for partitions {bad}"
            )

    return check


def require_no_nulls(col: str) -> Validation:
    """Null-aggregate gate (reference gold.py:53-59)."""

    def check(out: DataFrame, todo: DataFrame) -> None:
        n = out.filter(F.col(col).isNull()).count()
        if n:
            raise ValidationError(f"{n} rows with NULL {col}")

    return check


def run_layer(
    spark: SparkSession,
    layer: Layer,
    input_path: str,
    output_path: str,
    meta_path: str,
    full_refresh: bool = False,
) -> int:
    """One incremental pass; returns the number of partitions processed."""
    from ..sources.fs import path_exists

    if not path_exists(spark, input_path):
        return 0  # missing-input guard (reference gold.py:26-28)
    src = scan_zone(spark, input_path)
    cols = list(layer.partition_cols)
    available = available_partitions(src, cols)
    processed = (
        None
        if full_refresh
        else processed_partitions_cols(spark, meta_path, layer.name, cols)
    )
    todo = available if processed is None else pending_partitions(available, processed)
    todo_rows = todo.collect()  # tiny: one row per pending partition
    if not todo_rows:
        return 0
    todo_df = spark.createDataFrame(todo_rows, todo.schema)

    pending_input = filter_to_partitions(src, todo_df, cols)
    out = layer.transform(pending_input).cache()
    try:
        for validation in layer.validations:
            validation(out, todo_df)
        write_partitions(out, output_path, layer.partition_cols)
    finally:
        out.unpersist()
    mark_processed_cols(spark, meta_path, layer.name, todo_df, cols)
    return len(todo_rows)
