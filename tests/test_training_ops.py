"""Invariant tests for the round-4 training-data operators.

Oracle hash-matches (diffcheck) prove cross-engine value equality;
these tests pin the SEMANTIC invariants the hashes can't express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_etl_pipeline_spark.operators.arrayfns import emb_quantize_int8
from weather_etl_pipeline_spark.operators.curation import (
    _SEQ_LEN,
    pack_training_sequences,
)

SF = "/root/testdata/sf0.001"


def test_pack_training_sequences_tiling(spark):
    out = pack_training_sequences(spark, SF).cache()
    # offsets live inside a sequence; a doc spans exactly the sequences
    # its token interval covers
    bad = out.filter(
        (F.col("offset_in_seq") < 0)
        | (F.col("offset_in_seq") >= _SEQ_LEN)
        | (F.col("first_seq") > F.col("last_seq"))
        | (
            F.col("last_seq")
            != F.floor(
                (F.col("first_seq") * _SEQ_LEN + F.col("offset_in_seq")
                 + F.col("n_tok") - 1) / _SEQ_LEN
            )
        )
    ).count()
    assert bad == 0
    # per-(lang, source) streams tile without gaps: total tokens in a
    # shard == last doc's end position
    shard = out.groupBy("lang", "source").agg(
        F.sum("n_tok").alias("total"),
        F.max(
            F.col("first_seq") * _SEQ_LEN + F.col("offset_in_seq") + F.col("n_tok")
        ).alias("end_pos"),
    )
    assert shard.filter(F.col("total") != F.col("end_pos")).count() == 0
    out.unpersist()


def test_emb_quantize_int8_bounds(spark):
    out = emb_quantize_int8(spark, SF).cache()
    # reconstruction error of round-to-nearest is bounded by scale/2
    # (hround gives both sides 1e-6 slack); scale is positive
    bad = out.filter(
        (F.col("scale") <= 0)
        | (F.col("max_abs_err") > F.col("scale") / 2 + F.lit(1e-6))
    ).count()
    assert bad == 0
    # symmetric quantization saturates at the max|x| dimension only:
    # every vector has at least one code at ±127
    assert out.filter(F.col("n_saturated") < 1).count() == 0
    out.unpersist()
