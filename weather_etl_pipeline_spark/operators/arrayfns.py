"""Array-function family over embedding vectors (X-simsearch adjunct).

Per-vector feature extraction with pure built-ins — the preprocessing
shape that feeds similarity search and model-input QA: dimensionality,
max activation and its dimension (argmax), L2 norm. Everything is a
map-stage projection inside whole-stage codegen; at 100 TB this runs
at scan speed with no shuffle.

Cross-engine determinism: elements are FLOAT on disk; max/argmax
compare the identical float values, and the L2 norm uses the shared
left-to-right double fold (functions/vectors.py ≡ the DuckDB
list_reduce twin) before an hround display round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import hround, oracle_hround
from ..functions.vectors import as_double, dot
from ..registry import register

_DD_DOT_SELF = (
    "list_reduce(list_prepend(0.0, list_transform(list_zip(embedding, embedding), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, x) -> acc + x)"
)


@register(
    "array_vector_features",
    oracle=f"""
SELECT vec_id, label,
       CAST(len(embedding) AS INT) AS n_dims,
       CAST(list_max(embedding) AS DOUBLE) AS max_activation,
       CAST(list_position(embedding, list_max(embedding)) AS INT) AS argmax_dim,
       {oracle_hround(f"sqrt({_DD_DOT_SELF})")} AS l2_norm
FROM embeddings
""",
)
def array_vector_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    vec = as_double(F.col("embedding"))
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("n_dims"),
        F.array_max("embedding").cast("double").alias("max_activation"),
        F.array_position(F.col("embedding"), F.array_max("embedding"))
        .cast("int")
        .alias("argmax_dim"),
        hround(F.sqrt(dot(vec, vec))).alias("l2_norm"),
    )


# --- symmetric int8 quantization (embedding compression) ---------------------
# At 100 TB an fp32 embedding column dominates storage; the standard
# mitigation is per-vector symmetric int8: scale = max|x| / 127,
# code = round(x / scale). Map-only projection (scan speed, no
# shuffle). Scalarized output — per-vector scale, exact code sum,
# saturation count, max reconstruction error — so the whole transform
# is oracle-verifiable: code sum is an exact integer over the identical
# rounding formula, and the error fold is the shared left-to-right
# double reduction. round-half-up is written as FLOOR(x + 0.5) so both
# engines tie-break identically.

_Q_MAXCODE = 127


def _q_codes(vec, scale):
    # scale == 0 (all-zero vector) guard: Spark's non-ANSI 0/0 is NULL
    # while DuckDB's IEEE division is NaN — both twins emit code 0 for
    # degenerate vectors instead (testdata regenerates between rounds,
    # so zero vectors cannot be assumed absent)
    return F.transform(
        vec,
        lambda x: F.when(scale == F.lit(0.0), F.lit(0).cast("long")).otherwise(
            F.floor(x / scale + F.lit(0.5)).cast("long")
        ),
    )


@register(
    "emb_quantize_int8",
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
s AS (
  SELECT vec_id, v,
         list_reduce(list_prepend(0.0, list_transform(v, x -> abs(x))),
                     (acc, x) -> greatest(acc, x)) / {_Q_MAXCODE} AS scale
  FROM e
),
q AS (
  SELECT vec_id, v, scale,
         list_transform(v, x -> CASE WHEN scale = 0 THEN CAST(0 AS BIGINT)
                                ELSE CAST(FLOOR(x / scale + 0.5) AS BIGINT)
                                END) AS codes
  FROM s
)
SELECT vec_id,
       {oracle_hround("scale")} AS scale,
       CAST(list_reduce(list_prepend(0::BIGINT, codes), (acc, x) -> acc + x)
            AS BIGINT) AS sum_codes,
       CAST(len(list_filter(codes, c -> abs(c) >= {_Q_MAXCODE})) AS INT)
         AS n_saturated,
       {oracle_hround(
           "list_reduce(list_prepend(0.0, "
           "list_transform(list_zip(v, codes), p -> abs(p[1] - p[2] * scale))), "
           "(acc, x) -> greatest(acc, x))")} AS max_abs_err
FROM q
""",
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = as_double(F.col("embedding"))
    base = emb.select("vec_id", v.alias("v")).select(
        "vec_id",
        "v",
        (
            F.aggregate(
                F.col("v"),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, F.abs(x)),
            )
            / _Q_MAXCODE
        ).alias("scale"),
    )
    q = base.select(
        "vec_id", "v", "scale", _q_codes(F.col("v"), F.col("scale")).alias("codes")
    )
    err = F.aggregate(
        F.zip_with(
            F.col("v"), F.col("codes"), lambda x, c: F.abs(x - c * F.col("scale"))
        ),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    # two projections: aliasing hround(scale) AS scale in the same
    # select that evaluates `err` would let Spark 4's lateral column
    # alias resolution feed the ROUNDED scale into the reconstruction
    raw = q.select(
        "vec_id",
        F.col("scale").alias("_scale_raw"),
        F.aggregate(
            F.col("codes"), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("sum_codes"),
        F.size(
            F.filter(F.col("codes"), lambda c: F.abs(c) >= _Q_MAXCODE)
        ).cast("int").alias("n_saturated"),
        err.alias("_err_raw"),
    )
    return raw.select(
        "vec_id",
        hround(F.col("_scale_raw")).alias("scale"),
        "sum_codes",
        "n_saturated",
        hround(F.col("_err_raw")).alias("max_abs_err"),
    )
