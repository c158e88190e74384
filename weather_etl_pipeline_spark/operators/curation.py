"""End-to-end LLM corpus curation — the flagship composite pipeline.

One declarative plan chaining the four standard pre-training data
stages over ``documents``:

1. **quality scoring** (shared formula with text_quality_score) and a
   keep gate at quality >= 0.45;
2. **exact dedup** among survivors (canonical min-doc_id per text);
3. **deterministic train/val/test split** (multiplicative-hash 90/5/5,
   same scheme as split_train_val_test — rerun- and engine-stable);
4. **rollup** to per-(split, lang) counts, sizes, and mean quality.

Because the whole chain is one logical plan, Catalyst fuses the score
+ gate + split into a single map stage over the scan; the only
shuffles are the dedup groupBy and the final rollup — at 100 TB that
is scan → one wide dedup exchange → a tiny aggregate. No Python in
the loop anywhere.

Determinism: quality is a fixed-order FP expression over integer
counts (identical both engines); the dedup survivor is min(doc_id);
the split is integer hash arithmetic; mean quality goes through the
scaled-LONG exact-sum path (d=6) with an hround display round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import davg, oracle_davg
from ..registry import register
from .scaleops import _hash_col, _oracle_hash
from .text import ORACLE_QUALITY_FORMULA, oracle_quality_counts, quality_expr

_Q_KEEP = 0.45


@register(
    "llm_corpus_curation",
    headline=True,
    oracle=f"""
WITH t AS ({oracle_quality_counts(", lang, n_chars, text")}),
scored AS (
  SELECT doc_id, lang, n_chars, text,
         ROUND({ORACLE_QUALITY_FORMULA}, 6) AS quality
  FROM t
),
kept AS (SELECT * FROM scored WHERE quality >= {_Q_KEEP}),
canon AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY text),
final AS (SELECT k.* FROM kept k JOIN canon c ON k.doc_id = c.doc_id)
SELECT CASE WHEN {_oracle_hash('doc_id')} % 100 < 90 THEN 'train'
            WHEN {_oracle_hash('doc_id')} % 100 < 95 THEN 'val'
            ELSE 'test' END AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       {oracle_davg("quality", 6)} AS avg_quality
FROM final
GROUP BY 1, 2
""",
)
def llm_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        "text",
        F.round(quality_expr(), 6).alias("quality"),
    )
    kept = scored.filter(F.col("quality") >= _Q_KEEP)
    # canonical survivor: min doc_id per exact text (one shuffle)
    w = Window.partitionBy("text").orderBy("doc_id")
    final = (
        kept.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    bucket = _hash_col("doc_id") % 100
    split = F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    return (
        final.select(split.alias("split"), "lang", "n_chars", "quality")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            davg("quality", 6).alias("avg_quality"),
        )
    )
