"""Streaming ANN ingest dedup: probe-then-append against the IVF index,
per micro-batch — the embedding-space twin of ``ingest_dedup.py``.

Incoming vectors (new documents' embeddings) are probed against the
persisted IVF index; a batch vector whose nearest stored neighbor
within its probed cells has cosine >= the near-dup threshold is
quarantined with evidence (matched vec + cosine), and the accepted
vectors are appended to the index — so an embedding-near-dup of a
vector accepted two batches ago is caught without re-clustering or a
corpus scan.

Exactly-once accounting is inherited wholesale from the text loop
(ingest_dedup.py module doc): the index watermark doubles as the
batch-commit marker (append_ivf_batch advances it to the FULL batch
max via ``watermark_hi``-equivalent logic below), sink writes are
batch_id-keyed overwrites, probes read committed index rows only, and
a genuine mid-append tear refuses loudly on retry (rebuild recovery).

Retrieval caveat, stated not hidden: an IVF probe at nprobe < k is
approximate — a true near-dup whose vector lands just across a cell
boundary can be missed (recall dial: tools/ivf_recall.py). Production
pipelines pick nprobe by the recall curve; nprobe=k degenerates to
exact brute force against the index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ivf_store import (
    append_ivf_batch,
    probe_ivf_index,
    read_ivf_watermark,
)

_ANN_DUP_COS = 0.995  # near-dup threshold on cosine


def process_ann_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    accepted_dir: str,
    rejects_dir: str,
    nprobe: int = 1,
    dup_cos: float = _ANN_DUP_COS,
) -> None:
    """One micro-batch of the ANN ingest loop — IDEMPOTENT under
    foreachBatch's at-least-once redelivery. ``batch_df`` needs
    (vec_id, e array<double>) plus payload columns (ride through to
    ``accepted_dir``). Factored out of the stream closure for direct
    crash-replay testing, like ingest_dedup.process_ingest_batch."""
    from ..operators.ivf_store import build_ivf_index

    batch = batch_df.select("vec_id", "e")
    hi = batch.agg(F.max("vec_id").alias("hi")).collect()[0]["hi"]
    if hi is None:
        return
    # replay short-circuit — same reasoning as the text loop: after a
    # post-append crash the index contains the batch's own vectors and
    # a re-probe would quarantine the whole batch as self-dups
    from ..operators.ivf_store import _read_meta

    watermark, assign_m, trained = _read_meta(spark, index_path)
    if hi <= watermark:
        return
    if not trained:
        # bootstrap from an empty index: nothing to be a duplicate OF,
        # and no trained quantizer to assign against — the first batch
        # trains the centroids and becomes the corpus (build writes the
        # meta watermark last, so this is replay-safe like the append;
        # watermark_hi floors the committed marker at the FULL batch
        # max in case upstream filtering dropped the tail ids)
        spark.createDataFrame(
            [], "new_id long, old_id long, cos_sim double"
        ).write.mode("overwrite").parquet(
            f"{rejects_dir}/batch_id={int(batch_id)}"
        )
        batch_df.write.mode("overwrite").parquet(
            f"{accepted_dir}/batch_id={int(batch_id)}"
        )
        # assign_m carried from the (possibly empty) pre-built index's
        # meta — a stream configured at m=2 must not bootstrap to m=1
        build_ivf_index(
            spark,
            batch,
            index_path,
            assign_m=assign_m,
            watermark_hi=int(hi),
            # streaming TTL — bound a crashed service's lease stall
            # (see curation_loop._STREAM_LEASE_TTL_S rationale)
            lease_ttl_s=120.0,
        )
        return
    queries = batch.select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    hits = (
        probe_ivf_index(spark, queries, index_path, topk=1, nprobe=nprobe)
        .filter(F.col("cos_sim") >= dup_cos)
        .select(
            F.col("query_id").alias("new_id"),
            F.col("neighbor_id").alias("old_id"),
            "cos_sim",
        )
        .persist()
    )
    try:
        hits.write.mode("overwrite").parquet(
            f"{rejects_dir}/batch_id={int(batch_id)}"
        )
        dup_ids = hits.select(F.col("new_id").alias("vec_id")).distinct()
        accepted = batch_df.join(dup_ids, "vec_id", "left_anti")
        accepted.write.mode("overwrite").parquet(
            f"{accepted_dir}/batch_id={int(batch_id)}"
        )
        # watermark_hi = full batch max: ONE meta write commits the
        # batch even when its tail vectors were all quarantined — a
        # second driver-side meta bump would open a crash window where
        # a replay probes the batch's own appended vectors
        append_ivf_batch(
            spark,
            accepted.select("vec_id", "e"),
            index_path,
            watermark_hi=int(hi),
            lease_ttl_s=120.0,
        )
    finally:
        hits.unpersist()


def stream_ingest_ann(
    vecs_stream: DataFrame,
    spark: SparkSession,
    index_path: str,
    accepted_dir: str,
    rejects_dir: str,
    checkpoint_dir: str,
    nprobe: int = 1,
    dup_cos: float = _ANN_DUP_COS,
):
    """Start the ANN ingest-dedup stream; returns the StreamingQuery."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_ann_batch(
            spark,
            batch_df,
            batch_id,
            index_path,
            accepted_dir,
            rejects_dir,
            nprobe=nprobe,
            dup_cos=dup_cos,
        )

    return (
        vecs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
