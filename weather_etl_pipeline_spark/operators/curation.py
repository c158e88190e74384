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
from ..functions.exact import hround, oracle_davg, spark_davg
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
    # string-twin expressions (round 14): identical parsed trees, fewer
    # py4j round trips; the split bucket reuses the ORACLE's pure-
    # arithmetic hash string (valid in both SQL dialects, so the two
    # sides share one literal definition)
    scored = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        "text",
        F.round(quality_expr(), 6).alias("quality"),
    )
    kept = scored.filter(f"quality >= {_Q_KEEP}")
    # canonical survivor: min doc_id per exact text (one shuffle)
    final = kept.selectExpr(
        "*", "row_number() OVER (PARTITION BY text ORDER BY doc_id) AS _rk"
    ).filter("_rk = 1")
    bucket = f"({_oracle_hash('doc_id')} % 100)"
    split = (
        f"CASE WHEN {bucket} < 90 THEN 'train'"
        f" WHEN {bucket} < 95 THEN 'val' ELSE 'test' END"
    )
    return (
        final.selectExpr(f"{split} AS split", "lang", "n_chars", "quality")
        .groupBy("split", "lang")
        .agg(
            F.expr("COUNT(1)").alias("n_docs"),
            F.expr("SUM(n_chars)").alias("total_chars"),
            F.expr(spark_davg("quality", 6)).alias("avg_quality"),
        )
    )


# --- test-set decontamination (cross-corpus n-gram containment) --------------
# The benchmark-leakage check every pre-training pipeline runs before
# release: a training document is contaminated if it shares any
# complete N-token shingle with any held-out (test-split) document.
# Same split hash as the curation pipeline, shingles from the shared
# shingle_arrays plan (narrow per-doc distinct arrays; the split bucket
# is a pure expression of doc_id computed inline on the exploded rows —
# no join). The contamination join keys on the shingle string: cost is
# bounded by shingle-frequency skew, which the distinct-per-doc
# projection caps; at 100 TB the test side (5% of docs -> broadcast or
# bucketed) is the small build side by construction.

_DECON_N = 5  # shingle width in tokens


@register(
    "decontaminate_test_overlap",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_oracle_hash('doc_id')} % 100 AS bucket,
         string_split(text, ' ') AS tk
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, bucket,
         array_to_string(tk[i:i+{_DECON_N - 1}], chr(31)) AS s
  FROM toks, UNNEST(generate_series(1, len(tk) - {_DECON_N - 1})) AS t(i)
),
rare AS (
  -- stop-shingle cap: boilerplate n-grams shared by many documents are
  -- not leakage evidence AND are the hot join keys — drop them before
  -- the containment join (bounds per-key fan-out at any corpus size)
  SELECT s FROM sh GROUP BY s HAVING COUNT(DISTINCT doc_id) <= 10
),
hits AS (
  SELECT tr.doc_id, tr.s, te.doc_id AS test_doc
  FROM sh tr JOIN rare r ON tr.s = r.s
  JOIN sh te ON tr.s = te.s
  WHERE tr.bucket < 90 AND te.bucket >= 95
)
SELECT doc_id,
       CAST(COUNT(DISTINCT s) AS BIGINT) AS n_shared_shingles,
       CAST(COUNT(DISTINCT test_doc) AS BIGINT) AS n_test_docs
FROM hits
GROUP BY doc_id
""",
)
def decontaminate_test_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import shingle_rows

    docs = load_table(spark, sf_dir, "documents")
    # bucket inline AFTER the explode — it is a pure expression of
    # doc_id, so attaching it via a join would shuffle the exploded
    # shingle rows for nothing (and a projection above the Generate
    # costs nothing, unlike one below it — see shingle_rows docstring)
    sh = shingle_rows(docs, n=_DECON_N).select(
        "doc_id", (_hash_col("doc_id") % 100).alias("bucket"), "s"
    )
    # stop-shingle cap (see oracle comment): keep only shingles seen in
    # <= 10 distinct docs, dropping boilerplate AND the skewed join keys
    rare = (
        sh.groupBy("s")
        .agg(F.count_distinct("doc_id").alias("_df"))
        .filter(F.col("_df") <= 10)
        .select("s")
    )
    train = (
        sh.filter(F.col("bucket") < 90).select("doc_id", "s").join(rare, "s")
    )
    test = sh.filter(F.col("bucket") >= 95).select(
        F.col("doc_id").alias("test_doc"), "s"
    )
    return (
        train.join(test, "s")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("s").alias("n_shared_shingles"),
            F.count_distinct("test_doc").alias("n_test_docs"),
        )
    )


# --- repetition filter (Gopher-style doc-internal duplication) ---------------
# Repetitive documents (boilerplate, template spam) poison training
# data; the standard gates are duplicate-n-gram fraction and
# top-token dominance. Both are per-document map-side expressions over
# the token/shingle plans — no cross-doc state, embarrassingly
# parallel at any scale.


@register(
    "text_repetition_filter",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
base AS (
  SELECT doc_id,
         len(tk) AS n_tok,
         len(tk) - 1 AS n_2gram,
         (SELECT COUNT(DISTINCT array_to_string(tk[i:i+1], chr(31)))
          FROM UNNEST(generate_series(1, len(tk) - 1)) AS t(i)) AS n_2gram_uniq,
         (SELECT MAX(c) FROM (
            SELECT COUNT(*) AS c FROM UNNEST(tk) AS u(tok) GROUP BY tok)) AS top_tok_n
  FROM toks
)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       FLOOR((1.0 - CAST(n_2gram_uniq AS DOUBLE) / n_2gram) * 1000000.0 + 0.5)
         / 1000000.0 AS dup_2gram_frac,
       FLOOR((CAST(top_tok_n AS DOUBLE) / n_tok) * 1000000.0 + 0.5)
         / 1000000.0 AS top_token_frac,
       ((1.0 - CAST(n_2gram_uniq AS DOUBLE) / n_2gram) > 0.2
        OR (CAST(top_tok_n AS DOUBLE) / n_tok) > 0.2) AS is_repetitive
FROM base
WHERE n_tok >= 2
""",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import hround
    from .dedup import shingle_arrays

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    # Linear plans only: an array-HOF count of each distinct token
    # (transform × filter) is O(n_uniq × n_tok) per document — harmless
    # on 100-token docs, quadratic death on 100k-token docs. Exploded
    # token rows + hash aggregation keep the top-token signal O(n_tok)
    # with map-side partial aggregation; the distinct-bigram count is
    # size(shingle_arrays) — array_distinct is O(n_tok) per doc and the
    # whole signal stays narrow (no explode + re-group round trip).
    tok_rows = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    top_tok = (
        tok_rows.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_tok_n"))
    )
    uniq2 = shingle_arrays(docs, n=2).select(
        "doc_id", F.size("shingles").cast("long").alias("n_2gram_uniq")
    )
    base = (
        docs.filter(n_tok >= 2)
        .select(
            "doc_id",
            n_tok.cast("long").alias("n_tok"),
            (n_tok - 1).alias("n_2gram"),
        )
        .join(uniq2, "doc_id")
        .join(top_tok, "doc_id")
    )
    dup_frac = 1.0 - F.col("n_2gram_uniq").cast("double") / F.col("n_2gram")
    top_frac = F.col("top_tok_n").cast("double") / F.col("n_tok")
    return base.select(
        "doc_id",
        "n_tok",
        hround(dup_frac).alias("dup_2gram_frac"),
        hround(top_frac).alias("top_token_frac"),
        ((dup_frac > 0.2) | (top_frac > 0.2)).alias("is_repetitive"),
    )


# --- fixed-window document chunking (pretraining / RAG shape) ----------------
# Long documents become overlapping fixed-token chunks — the op between
# curation and tokenization in every LLM data pipeline. Pure built-ins:
# sequence() generates chunk starts executor-side, slice() carves the
# token window, so the whole thing is one generate+project map stage —
# no shuffle, no Python, linear in corpus size, and the chunk fan-out
# is bounded by ceil(n_tok / stride) per document.

_CHUNK_TOKENS = 64
_CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


@register(
    "chunk_documents_overlap",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
starts AS (
  SELECT doc_id, tk,
         UNNEST(generate_series(0, GREATEST(len(tk) - 1, 0), {_CHUNK_STRIDE}))
           AS start
  FROM toks
)
SELECT doc_id,
       CAST(start / {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(LEAST(start + {_CHUNK_TOKENS}, len(tk)) - start AS BIGINT)
         AS n_chunk_tok,
       array_to_string(tk[start + 1 : LEAST(start + {_CHUNK_TOKENS}, len(tk))], ' ')
         AS chunk_text
FROM starts
""",
)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    with_starts = docs.select(
        "doc_id",
        toks.alias("tk"),
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(_CHUNK_STRIDE)
            )
        ).alias("start"),
    )
    chunk = F.slice(
        F.col("tk"), F.col("start") + 1, F.lit(_CHUNK_TOKENS)
    )
    return with_starts.select(
        "doc_id",
        (F.col("start") / _CHUNK_STRIDE).cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_chunk_tok"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# --- training-sequence packing (concat-then-split, GPT-style) ----------------
# Pre-training examples are fixed-length token sequences packed from
# variable-length documents: concatenate docs in a deterministic order,
# then split the token stream at SEQ_LEN boundaries. Each doc maps to
# the sequence(s) it occupies — first_seq/last_seq differ when a doc
# straddles a boundary. Packing runs PER (lang, source) SHARD: a global
# total order would serialize the window into one partition at 100 TB,
# while per-shard streams keep the window partitioned (and match how
# packing is sharded in production — one stream per corpus slice).

_SEQ_LEN = 256


@register(
    "pack_training_sequences",
    oracle=f"""
WITH d AS (
  SELECT doc_id, lang, source, len(string_split(text, ' ')) AS n_tok
  FROM documents
),
c AS (
  SELECT doc_id, lang, source, n_tok,
         COALESCE(SUM(n_tok) OVER (
           PARTITION BY lang, source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM d
)
SELECT doc_id, lang, source,
       CAST(n_tok AS BIGINT) AS n_tok,
       CAST(cum // {_SEQ_LEN} AS BIGINT) AS first_seq,
       CAST((cum + n_tok - 1) // {_SEQ_LEN} AS BIGINT) AS last_seq,
       CAST(cum % {_SEQ_LEN} AS BIGINT) AS offset_in_seq
FROM c
""",
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("lang", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("long"))
    return base.select(
        "doc_id",
        "lang",
        "source",
        "n_tok",
        F.floor(cum / _SEQ_LEN).cast("long").alias("first_seq"),
        F.floor((cum + F.col("n_tok") - 1) / _SEQ_LEN).cast("long").alias("last_seq"),
        (cum % _SEQ_LEN).cast("long").alias("offset_in_seq"),
    )


# --- per-source quality percentile gate --------------------------------------
# "Keep the best quarter of every (lang, source) shard" — the relative
# quality filter pipelines use when absolute score thresholds drift
# across domains (a 0.45 cut means different things for web scrape vs
# curated text; a per-shard percentile does not).
#
# Deliberately a THRESHOLD-BROADCAST-JOIN, not a percent_rank window:
# the window form globally sorts every (lang, source) block by score —
# at 100 TB that is a full sort of the corpus inside each shard. This
# form aggregates per-shard exact p75 thresholds (bounded: #langs x
# #sources rows), broadcasts them, and gates on the scan with a
# map-side comparison; the corpus shuffles only into the final tiny
# rollup. Exact percentile() materializes each shard's scores during
# the agg — for unbounded shards switch to approx_percentile (same
# switch stats_grouped_quantiles documents); the gate plan is unchanged.
#
# Engine agreement: Spark percentile() and DuckDB quantile_cont() are
# bit-equal on the same doubles (proved by stats_grouped_quantiles), so
# the >= threshold comparison needs no epsilon on either side. The
# DISPLAYED q75 goes through hround (floor(x*1e6+0.5)) — the 0.75
# interpolation lands on exactly-representable decimal halves often
# enough that plain ROUND drifted one ulp between engines at sf0.1.

_QGATE_P = 0.75


@register(
    "quality_percentile_gate",
    oracle=f"""
WITH t AS ({oracle_quality_counts(", lang, source, n_chars")}),
scored AS (
  SELECT doc_id, lang, source, n_chars,
         ROUND({ORACLE_QUALITY_FORMULA}, 6) AS quality
  FROM t
),
thr AS (
  SELECT lang, source, quantile_cont(quality, {_QGATE_P}) AS q75,
         COUNT(*) AS n_total
  FROM scored GROUP BY lang, source
)
SELECT s.lang, s.source, FLOOR(MIN(t.q75) * 1000000.0 + 0.5) / 1000000.0 AS q75,
       MIN(t.n_total) AS n_total, COUNT(*) AS n_kept,
       CAST(SUM(s.n_chars) AS BIGINT) AS kept_chars
FROM scored s
JOIN thr t ON s.lang = t.lang AND s.source = t.source
WHERE s.quality >= t.q75
GROUP BY s.lang, s.source
""",
)
def quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "lang", "source", "n_chars", F.round(quality_expr(), 6).alias("quality")
    )
    thr = scored.groupBy("lang", "source").agg(
        F.expr(f"percentile(quality, {_QGATE_P})").alias("q75"),
        F.count(F.lit(1)).alias("n_total"),
    )
    kept = scored.join(F.broadcast(thr), ["lang", "source"]).filter(
        F.col("quality") >= F.col("q75")
    )
    return kept.groupBy("lang", "source").agg(
        hround(F.min("q75")).alias("q75"),
        F.min("n_total").alias("n_total"),
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
    )


# --- token-budget corpus selection -------------------------------------------
# The data-mixing primitive: each (lang, source) shard contributes its
# BEST documents (by quality) until a per-shard token budget is
# exhausted — how pretraining runs fill a fixed token allocation per
# domain. One partitioned window pass: order the shard by (quality
# DESC, doc_id), keep while the running token total stays within
# budget. The sort is per-shard (bounded), never global; the plan-shape
# guard's "no unpartitioned ordered window" rule holds. Determinism:
# quality is bit-identical cross-engine (shared formula), doc_id breaks
# ties, and the running sum is exact integer token counts.

_TB_BUDGET = 20_000  # tokens per (lang, source) shard


@register(
    "token_budget_selection",
    oracle=f"""
WITH t AS ({oracle_quality_counts(", lang, source")}),
scored AS (
  SELECT doc_id, lang, source, n_tok,
         ROUND({ORACLE_QUALITY_FORMULA}, 6) AS quality
  FROM t
),
ranked AS (
  SELECT *, SUM(n_tok) OVER (
           PARTITION BY lang, source
           ORDER BY quality DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
  FROM scored
)
SELECT lang, source, COUNT(*) AS n_kept,
       CAST(SUM(n_tok) AS BIGINT) AS tokens_kept,
       FLOOR(MIN(quality) * 1000000.0 + 0.5) / 1000000.0 AS q_min_kept
FROM ranked
WHERE cum_tok <= {_TB_BUDGET}
GROUP BY lang, source
""",
)
def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import hround

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        F.round(quality_expr(), 6).alias("quality"),
    )
    w = (
        Window.partitionBy("lang", "source")
        .orderBy(F.col("quality").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    kept = scored.withColumn("cum_tok", F.sum("n_tok").over(w)).filter(
        F.col("cum_tok") <= _TB_BUDGET
    )
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tok").alias("tokens_kept"),
        hround(F.min("quality")).alias("q_min_kept"),
    )
