"""Custom stateful streaming operator: per-user running counters via
``applyInPandasWithState`` (SURVEY.md §2.8 — the Spark-native upgrade
path the reference's batch re-runs approximate).

The operator keeps (n_events, total_value) per user across micro-
batches and emits the updated totals each batch — the canonical
"profile accumulator" shape for feature pipelines. State lives in the
state store (checkpointed, bounded by key cardinality); processing is
Arrow-batched pandas per group.

Batch-checkable: ``user_totals_batch`` computes the same result as a
plain aggregation (oracle-able); the streaming variant must converge to
it after all input is processed — asserted in tests/test_streaming.py.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

_CENT = Decimal("0.01")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..catalog import load_table
from ..functions.exact import dsum
from ..registry import register

_OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


def _update_user_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        # match the batch twin's DECIMAL(14,2) cast semantics exactly:
        # Spark casts via the double's SHORTEST DECIMAL REPR then rounds
        # HALF_UP — Decimal(repr(v)) reproduces both steps (a *100+0.5
        # floor trick fails on e.g. 8.845 whose double is 8.84499…)
        total += float(
            sum(
                Decimal(repr(float(v))).quantize(_CENT, rounding=ROUND_HALF_UP)
                for v in pdf["value"]
            )
        )
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def stream_user_totals(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
):
    """readStream → applyInPandasWithState accumulator → memory sink.

    Returns the StreamingQuery; final state per user (after
    processAllAvailable) must equal the batch aggregation.
    """
    from ..catalog import raw_nanos_schema
    from .staging import stage_events_dir

    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = raw_nanos_schema(spark, src)
    stage = stage_events_dir(src, checkpoint_dir, "stream_state_")
    stream = spark.readStream.schema(raw_schema).parquet(stage)
    out = (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.outputMode("update").format("memory").queryName("user_totals")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


@register(
    "stateful_user_totals_batch",
    oracle="""
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND((value) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
FROM events GROUP BY user_id
""",
)
def user_totals_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch twin the streaming accumulator must converge to."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
    )


# --- transformWithState (Spark 4 arbitrary-state API) ------------------------
# The successor to applyInPandasWithState: typed state handles
# (ValueState/ListState/MapState), timers, and TTL managed by the state
# store. Same accumulator semantics as stream_user_totals so the
# oracle-verified batch twin checks both kernels.


class _UserTotalsProcessor:
    """StatefulProcessor keeping (n_events, total_value) per user in a
    ValueState handle. Defined lazily (transformWithStateInPandas
    imports) so module import stays session-free."""

    def __new__(cls):
        from pyspark.sql.streaming import StatefulProcessor

        class Impl(StatefulProcessor):
            def init(self, handle) -> None:
                self._state = handle.getValueState(
                    "totals", "n BIGINT, total DOUBLE"
                )

            def handleInputRows(self, key, rows, timerValues):
                if self._state.exists():
                    n, total = self._state.get()
                else:
                    n, total = 0, 0.0
                for pdf in rows:
                    n += len(pdf)
                    # identical rounding kernel to _update_user_state:
                    # exact cents per value, one float conversion
                    total += float(
                        sum(
                            Decimal(repr(float(v))).quantize(
                                _CENT, rounding=ROUND_HALF_UP
                            )
                            for v in pdf["value"]
                        )
                    )
                self._state.update((n, total))
                yield pd.DataFrame(
                    {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
                )

            def close(self) -> None:
                pass

        return Impl()


def stream_user_totals_tws(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
):
    """readStream → transformWithStateInPandas accumulator → memory sink.

    Returns the StreamingQuery; after processAllAvailable the final
    per-user state must equal ``user_totals_batch``.

    Two runtime requirements beyond the applyInPandasWithState twin
    (``stream_user_totals``, which needs neither):

    - ``google.protobuf`` in every Python process Spark spawns (the
      state-server wire format). In this sandbox that's satisfied by
      the test-env proxy (tests/_protobuf_shim/README.md); deployments
      ship a real protobuf >= the pyspark gencode version.
    - the RocksDB state store provider: transformWithState keeps each
      state variable in its own column family, which the default
      HDFS-backed provider rejects (multipleColumnFamiliesNotSupported).
      Set around query START and RESTORED after: Structured Streaming
      clones the session at start (the running stream keeps the
      provider snapshot), so restoring the caller's previous value
      immediately after .start() is safe — and required, because a
      leaked session-wide override would silently pin RocksDB into the
      checkpoint of every LATER stateful query the caller starts
      (provider is fixed per-checkpoint at first start).
    """
    from ..catalog import raw_nanos_schema
    from .staging import stage_events_dir

    _PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(
        _PROVIDER_KEY,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    # the try begins IMMEDIATELY after conf.set: an exception anywhere
    # in the setup below (schema read, staging, plan construction) must
    # also restore the caller's provider, or the override leaks into
    # the next stateful query's checkpoint.
    try:
        src = os.path.join(sf_dir, "events.parquet")
        raw_schema = raw_nanos_schema(spark, src)
        stage = stage_events_dir(src, checkpoint_dir, "stream_tws_")
        stream = spark.readStream.schema(raw_schema).parquet(stage)
        out = (
            stream.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=_UserTotalsProcessor(),
                outputStructType=_OUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )
        writer = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("user_totals_tws")
        )
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        return writer.start()
    finally:
        if prev_provider is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prev_provider)
