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
