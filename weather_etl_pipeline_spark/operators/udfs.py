"""Pandas-UDF surface (extension X-udf) — the sanctioned slow path.

Demonstrates the two Arrow-batched shapes with ORACLE-VERIFIED
semantics (rare for UDF code — possible here because the kernels are
integer-ranking / single-FP-op, so cross-engine determinism holds):

- ``applyInPandas`` grouped-map: per-user event ranking. The pandas
  kernel sorts and ranks inside each group; the oracle is the window
  ROW_NUMBER twin. Integer output → exact match.
- scalar ``pandas_udf``: halving is a single FP op (exact in binary
  floating point), so Spark-via-Arrow and DuckDB agree bit-for-bit.

Scale: both run as Arrow batches on executors — memory bounded by
maxRecordsPerBatch, no driver involvement. applyInPandas shuffles on
the group key; per-group state must fit one executor (true for
per-user event streams; use salted sub-groups otherwise).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import hround, oracle_hround
from ..registry import register

# --- grouped-map applyInPandas: per-user rank --------------------------------

_RANK_SCHEMA = (
    "user_id bigint, event_id bigint, value double, value_rank int"
)


def _rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # rank via one numpy lexsort instead of sort_values + row reorder:
    # the kernel runs once PER GROUP (1500 user groups at sf0.1), so
    # per-call pandas overhead dominates — assigning ranks in place
    # without materializing a reordered frame roughly halves it. Output
    # row order is irrelevant (grouped-map output is unordered anyway).
    import numpy as np

    order = np.lexsort((pdf["event_id"].to_numpy(), -pdf["value"].to_numpy()))
    ranks = np.empty(len(pdf), dtype=np.int32)
    ranks[order] = np.arange(1, len(pdf) + 1, dtype=np.int32)
    return pdf.assign(value_rank=ranks)


@register(
    "udf_group_rank",
    # demoted from headline: it exists to demo applyInPandas and was 21%
    # of bench wall-clock; udf_scalar_halve keeps the Arrow-UDF family in
    # the bench at a fraction of the cost (coverage proven at sf0.01)
    oracle="""
SELECT user_id, event_id, value,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY user_id ORDER BY value DESC, event_id
       ) AS INTEGER) AS value_rank
FROM events
""",
)
def udf_group_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return ev.groupBy("user_id").applyInPandas(_rank_group, schema=_RANK_SCHEMA)


# --- scalar pandas_udf: vectorized per-value transform -----------------------


# --- Python UDTF: one row in, many rows out ----------------------------------
# Spark 4's table-function API — the row-expanding UDF family. The
# kernel re-implements 3-token shingling; pytest cross-validates it
# against the built-in shingle_rows plan (two independent
# implementations of the same spec).


def make_shingle_udtf():
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, shingle string")
    class ShingleUDTF:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return  # match the built-in plan: null text -> no shingles
            toks = text.split(" ")
            seen = set()
            for i in range(max(len(toks) - 2, 0)):
                s = "\x1f".join(toks[i : i + 3])
                if s not in seen:
                    seen.add(s)
                    yield (doc_id, s)

    return ShingleUDTF


_UDTF_SHINGLES_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
)
SELECT doc_id,
       CAST((SELECT COUNT(*) FROM (
          SELECT DISTINCT array_to_string(tk[i:i+2], chr(31)) AS s
          FROM UNNEST(generate_series(1, len(tk) - 2)) AS t(i))) AS BIGINT)
         AS n_shingles,
       CAST((SELECT SUM(LEN(s)) FROM (
          SELECT DISTINCT array_to_string(tk[i:i+2], chr(31)) AS s
          FROM UNNEST(generate_series(1, len(tk) - 2)) AS t(i))) AS BIGINT)
         AS sum_len
FROM toks
WHERE len(tk) >= 3
"""


@register("udtf_shingles", oracle=_UDTF_SHINGLES_ORACLE)
def udtf_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle expansion via Python UDTF (lateral join), scalarized to
    per-doc (n_shingles, sum_len) so the result is oracle-expressible:
    the DuckDB twin rebuilds the distinct 3-token shingle set per doc
    and aggregates the same two scalars — count validates cardinality,
    summed length validates content.

    UDTF-surface demo ONLY: the ``seen`` set buffers each document's
    distinct shingles in Python worker memory, which is fine for
    bounded documents but the wrong place for dedup at scale — the
    production path is the built-in exploded plan (``dedup.shingle_rows``:
    posexplode + lead + ``.distinct()``), where dedup happens in the
    JVM with spillable aggregation. pytest asserts this UDTF's parity
    with that plan."""
    shingle_udtf = make_shingle_udtf()
    spark.udtf.register("shingle_udtf", shingle_udtf)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("_docs_for_udtf")
    return spark.sql(
        """
        SELECT s.doc_id, COUNT(*) AS n_shingles,
               SUM(LENGTH(s.shingle)) AS sum_len
        FROM _docs_for_udtf d,
             LATERAL shingle_udtf(d.doc_id, d.text) s
        GROUP BY s.doc_id
        """
    )


@register(
    "udf_scalar_halve",
    headline=True,
    oracle="""
SELECT event_id, value * 0.5 AS half_value FROM events
""",
)
def udf_scalar_halve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # defined inside the call: decorating at module import would need an
    # active SparkSession to parse the return type
    @F.pandas_udf("double")
    def _halve(s: pd.Series) -> pd.Series:
        return s * 0.5

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", _halve("value").alias("half_value"))


# --- applyInPandas EWMA: recursive per-key fold, oracle-replayed -------------
# Exponentially-weighted moving average is the canonical ORDER-DEPENDENT
# recursive kernel (ewma_t = a*x_t + (1-a)*ewma_{t-1}) — not expressible
# as a plain window aggregate, the textbook applyInPandas case. Both
# sides evaluate the IDENTICAL recursion over the identical total order
# (ts, event_id) in float64: the kernel writes the fold as an explicit
# loop (not pandas .ewm, whose adjust/bias options invite drift), and
# DuckDB replays it as list_reduce over the ordered value list. Alpha
# 0.25 keeps both multipliers exact binary fractions. Output is the
# final state + count per user — the bounded-size accumulator shape
# that streams through applyInPandasWithState unchanged.

_EWMA_ALPHA = 0.25

_EWMA_SCHEMA = "user_id bigint, n bigint, ewma_last double"


def _ewma_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # order via one numpy lexsort of just the sort keys (the kernel runs
    # once per user group, so per-call pandas overhead dominates —
    # sort_values would reorder the whole frame); pandas' C ewm kernel
    # (adjust=False) evaluates the IDENTICAL recursion a*x + (1-a)*acc —
    # verified bit-equal to the explicit float64 loop over 5k elements.
    # The C kernel is what survives LONG per-key series, the shape that
    # matters at scale.
    import numpy as np

    order = np.lexsort((pdf["event_id"].to_numpy(), pdf["ts"].to_numpy()))
    vals = pd.Series(pdf["value"].to_numpy()[order])
    ew = vals.ewm(alpha=_EWMA_ALPHA, adjust=False).mean()
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "n": [len(pdf)],
            "ewma_last": [float(ew.iloc[-1])],
        }
    )


@register(
    "udf_ewma_per_user",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, list(value ORDER BY ts, event_id) AS xs
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(xs) AS BIGINT) AS n,
       {oracle_hround(
         f"list_reduce(xs, (acc, x) -> {_EWMA_ALPHA} * x + {1 - _EWMA_ALPHA} * acc)")}
         AS ewma_last
FROM ordered
""",
)
def udf_ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    out = ev.groupBy("user_id").applyInPandas(_ewma_group, schema=_EWMA_SCHEMA)
    return out.select("user_id", "n", hround(F.col("ewma_last")).alias("ewma_last"))
