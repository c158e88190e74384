"""Incremental work-list (reference op Q-antijoin — the pipeline's core).

The reference computes ``to_process = available − processed`` as a
Python set difference over ``(city, date)`` tuples (reference
``silver.py:66-69``, ``gold.py:113-118``). Distributed form: LEFT ANTI
join of the partition listing against the metadata table — Catalyst
broadcasts the (tiny) processed side.

The follow-on divergence from the reference matters more: the
reference loops over ``to_process`` one partition at a time
(``silver.py:73``); here the work-list is joined back into ONE job
(``filter_to_partitions``) so all new partitions clean/aggregate/write
in a single distributed pass. At 100 TB that is the difference between
N sequential scans and one.

Partition columns are parameterized — the weather lake uses
``(city, date)``, an event lake just ``(event_date,)``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PARTITION_KEY = ("city", "date")


def available_partitions(
    zone_df: DataFrame, cols: Sequence[str] = DEFAULT_PARTITION_KEY
) -> DataFrame:
    """DISTINCT partition tuples over a zone scan — reference silver.py:8-12.

    On a partitioned lake this reads only partition columns, which
    Catalyst serves from directory metadata (no data scan).
    """
    return zone_df.select(*cols).distinct()


def pending_partitions(available: DataFrame, processed: DataFrame) -> DataFrame:
    """available − processed via broadcast anti-join (on shared columns)."""
    return available.join(
        F.broadcast(processed), on=list(available.columns), how="left_anti"
    )


def filter_to_partitions(
    zone_df: DataFrame,
    partitions: DataFrame,
    cols: Sequence[str] = DEFAULT_PARTITION_KEY,
) -> DataFrame:
    """Restrict a zone scan to a partition work-list in ONE plan.

    A broadcast LEFT SEMI join on partition columns: Spark turns this
    into dynamic partition pruning / pushed filters, so only the listed
    partitions' files are read — the single-job replacement for the
    reference's per-partition loop.
    """
    return zone_df.join(F.broadcast(partitions), on=list(cols), how="left_semi")
