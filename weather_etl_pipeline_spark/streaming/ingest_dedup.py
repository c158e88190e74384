"""Streaming ingest dedup: probe-then-append against the signature
store, per micro-batch.

The production shape of training-corpus ingestion (the batch form is
``operators/dedup_store.py``; the reference's closest analogue is the
scheduled re-run loop in /root/reference/main.py:36): documents arrive
as a stream, each micro-batch is probed against the persisted corpus
signatures, near-duplicates are quarantined with their evidence
(matched corpus doc + verified jaccard), and the ACCEPTED docs are
committed to the lake *and* their signatures appended to the store —
so a duplicate of a doc accepted two batches ago is caught without any
corpus recomputation.

Engine posture (all inherited from the store ops):
- per-batch cost is batch-bounded: batch signatures are computed
  inline, the store scan is partition-pruned and never shuffled, the
  append's rank bases come from the batch's own shard set;
- the monotonic-doc_id append contract maps onto streaming naturally:
  ingest ids are assigned monotonically by the upstream sequencer.

Exactly-once accounting (foreachBatch is at-least-once — the driver
can die after a batch completes but before the checkpoint commits its
offset, and the batch is redelivered):
- the store's meta watermark doubles as the batch-commit marker: the
  append's LAST step advances it to the batch's full max doc_id
  (rejected docs included), and a redelivered batch whose max id is
  at or below the watermark is skipped outright. Without the skip, a
  replay would re-probe against a store that now contains the batch's
  own accepted docs and quarantine the entire batch as self-dups;
- sink writes are batch_id-keyed overwrites (rejects/batch_id=N/,
  accepted/batch_id=N/), so a replay of a PARTIALLY completed batch
  replaces its own output instead of appending duplicate evidence or
  accepted rows. Both sinks therefore read exactly-once;
- probes see only committed store rows (doc_id <= watermark), so a
  replayed batch probes the identical corpus the crashed run saw;
- the one remaining loud failure is a genuine mid-append tear (codes
  or bands written, meta not): the torn-append check refuses the
  retry and the documented recovery is a store rebuild — mirroring
  the metadata swap's "refuse rather than tear" posture.

Intra-batch near-dups are deliberately out of scope here (the batch
ops own that: exact collapse + LSH); this operator answers "is this
NEW doc a dup of anything already ACCEPTED?".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup_store import (
    append_signature_batch,
    probe_signature_store,
    read_store_watermark,
)


def process_ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    accepted_dir: str,
    rejects_dir: str,
    family: str = "minhash",
) -> None:
    """One micro-batch of the ingest-dedup loop — IDEMPOTENT under
    foreachBatch's at-least-once redelivery (module doc, "Exactly-once
    accounting"). Factored out of the stream closure so crash-replay
    behavior is directly testable without a live StreamingQuery.
    """
    batch = batch_df.select("doc_id", "text")
    hi = batch.agg(F.max("doc_id").alias("hi")).collect()[0]["hi"]
    if hi is None:  # empty micro-batch: nothing to probe, write, or mark
        return
    # replay short-circuit: the store watermark advances to the FULL
    # batch max (including rejected docs) as the append's final step,
    # so watermark >= hi means this batch fully committed before a
    # crash-and-redeliver (e.g. the driver died after the append but
    # before the checkpoint recorded the offset). Reprocessing it would
    # be actively wrong, not just wasteful: the store now CONTAINS the
    # batch's accepted docs, so a re-probe would flag every one of them
    # as a duplicate of itself and quarantine the whole batch.
    if hi <= read_store_watermark(spark, store_path):
        return
    # persisted for the batch's lifetime only (unpersisted in the
    # finally): the evidence write and the quarantine anti-join both
    # consume the probe, and recomputing it would re-scan the store
    # once per consumer
    hits = probe_signature_store(
        spark, batch, store_path, family=family
    ).persist()
    try:
        # batch_id-keyed sink paths with OVERWRITE: a replay of a batch
        # that crashed between these writes and the append replaces its
        # own partial output instead of appending duplicate rows.
        # Readers take spark.read.parquet(<dir>) as usual — the
        # batch_id=N layout is partition discovery, and the provenance
        # column is free.
        hits.write.mode("overwrite").parquet(
            f"{rejects_dir}/batch_id={int(batch_id)}"
        )
        dup_ids = hits.select(F.col("new_id").alias("doc_id")).distinct()
        accepted = batch_df.join(dup_ids, "doc_id", "left_anti")
        accepted.write.mode("overwrite").parquet(
            f"{accepted_dir}/batch_id={int(batch_id)}"
        )
        # watermark_hi = full batch max: marks the batch committed even
        # when its tail docs were all quarantined (an all-dups batch
        # appends zero signatures but still advances the watermark)
        append_signature_batch(
            spark,
            accepted.select("doc_id", "text"),
            store_path,
            watermark_hi=int(hi),
            family=family,
            # streaming TTL — bound a crashed service's lease stall
            # (see curation_loop._STREAM_LEASE_TTL_S rationale)
            lease_ttl_s=120.0,
        )
    finally:
        hits.unpersist()


def stream_ingest_dedup(
    docs_stream: DataFrame,
    spark: SparkSession,
    store_path: str,
    accepted_dir: str,
    rejects_dir: str,
    checkpoint_dir: str,
    family: str = "minhash",
):
    """Start the ingest-dedup stream; returns the StreamingQuery.

    ``docs_stream`` needs (doc_id, text) plus any payload columns —
    payloads ride through to ``accepted_dir`` untouched. Rejects land
    in ``rejects_dir`` as (new_id, old_id, jaccard_shingles) evidence
    rows; a doc matching several corpus docs yields several evidence
    rows but is quarantined once.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_ingest_batch(
            spark,
            batch_df,
            batch_id,
            store_path,
            accepted_dir,
            rejects_dir,
            family=family,
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
