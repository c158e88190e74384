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
- crash behavior is loud, not silent: foreachBatch retries after a
  mid-append crash hit the store's torn-append watermark check and
  fail the query (recovery = rebuild the store) — mirroring the
  metadata swap's "refuse rather than tear" posture;
- the monotonic-doc_id append contract maps onto streaming naturally:
  ingest ids are assigned monotonically by the upstream sequencer.

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
)


def stream_ingest_dedup(
    docs_stream: DataFrame,
    spark: SparkSession,
    store_path: str,
    accepted_dir: str,
    rejects_dir: str,
    checkpoint_dir: str,
):
    """Start the ingest-dedup stream; returns the StreamingQuery.

    ``docs_stream`` needs (doc_id, text) plus any payload columns —
    payloads ride through to ``accepted_dir`` untouched. Rejects land
    in ``rejects_dir`` as (new_id, old_id, jaccard_shingles) evidence
    rows; a doc matching several corpus docs yields several evidence
    rows but is quarantined once.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select("doc_id", "text")
        # persisted for the batch's lifetime only (unpersisted in the
        # finally): the evidence write and the quarantine anti-join
        # both consume the probe, and recomputing it would re-scan the
        # store once per consumer
        hits = probe_signature_store(spark, batch, store_path).persist()
        try:
            # evidence rows for the quarantine audit trail
            hits.write.mode("append").parquet(rejects_dir)
            dup_ids = hits.select(
                F.col("new_id").alias("doc_id")
            ).distinct()
            accepted = batch_df.join(dup_ids, "doc_id", "left_anti")
            accepted.write.mode("append").parquet(accepted_dir)
            append_signature_batch(
                spark, accepted.select("doc_id", "text"), store_path
            )
        finally:
            hits.unpersist()

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
