"""Scale-posture operators for training-data pipelines.

Three operations every 100 TB data-prep pipeline needs, each expressed
so the result is deterministic and engine-independent (no RNG, no
sampling primitives — both of which differ across engines and runs):

- **deterministic split** (train/val/test): assignment by an arithmetic
  Knuth-style multiplicative hash of the stable row key. Any engine that
  can do BIGINT arithmetic produces the identical split — reruns,
  backfills, and cross-engine audits all agree. This is how production
  corpora are split (hash-of-id), never by ``rand()``.
- **salted aggregation**: the skew-mitigation pattern. A hot group key
  overwhelms one reducer at scale; salting fans each key across
  ``_SALTS`` sub-keys (stage 1: map-side-combinable partial agg on the
  salted key), then a second tiny aggregation merges the partials.
  Results are EXACTLY the plain groupBy's (the oracle is the plain
  GROUP BY) — only the shuffle distribution changes. AQE's skew-join
  handling covers joins; this covers aggregation skew.
- **deterministic stratified sample**: per-stratum fixed-rate sampling
  by hash threshold — reproducible, joinable (the same doc always
  lands in or out), and expressible identically in the oracle.

The multiplicative hash (Knuth 2654435761, the golden-ratio multiplier
for 2^32) is computed in BIGINT: key < ~3.5e9 keeps key*2654435761
inside int64, which holds for the corpus keys; production would use a
128-bit hash via xxhash64 — kept arithmetic here so the DuckDB oracle
can replay it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import KNUTH_MOD as _MOD
from ..catalog import load_table
from ..catalog import knuth_hash as _hash_col
from ..catalog import oracle_knuth_hash as _oracle_hash
from ..functions.exact import davg, dsum, hround, oracle_davg, oracle_dsum
from ..registry import register


# --- deterministic train/val/test split --------------------------------------
# 90/5/5 by hash bucket; summary counts per (split, lang) so the result
# is compact while pinning every assignment (a wrong split flips counts).


@register(
    "split_train_val_test",
    oracle=f"""
SELECT CASE WHEN {_oracle_hash('doc_id')} % 100 < 90 THEN 'train'
            WHEN {_oracle_hash('doc_id')} % 100 < 95 THEN 'val'
            ELSE 'test' END AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
""",
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = _hash_col("doc_id") % 100
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# --- salted aggregation (skew-safe two-stage groupBy) ------------------------

_SALTS = 32


@register(
    "salted_event_totals",
    oracle=f"""
SELECT event_type, COUNT(*) AS n_events,
       {oracle_dsum("value")} AS sum_value,
       {oracle_davg("value")} AS avg_value
FROM events GROUP BY event_type
""",
)
def salted_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation with plain-groupBy semantics.

    Stage 1 groups by (event_type, salt) — the hot key's rows spread
    over ``_SALTS`` reducers instead of one. Stage 2 merges the partial
    LONG sums per event_type (tiny: #groups x #salts rows). The salt is
    a deterministic function of a high-cardinality column (not rand()),
    so reruns hit identical partials; the FINAL result is independent of
    the salt entirely — which is what the plain-GROUP-BY oracle checks.
    """
    ev = load_table(spark, sf_dir, "events")
    from ..functions.exact import scaled_long

    salt = (F.col("event_id") % _SALTS).alias("_salt")
    stage1 = (
        ev.select("event_type", salt, scaled_long("value").alias("_cents"), "value")
        .groupBy("event_type", "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_cents").alias("_sum_cents"),
            F.count("value").alias("_n_val"),
        )
    )
    return stage1.groupBy("event_type").agg(
        F.sum("_n").alias("n_events"),
        (
            F.sum(F.col("_sum_cents").cast("decimal(38,0)")).cast("double")
            / F.lit(100.0)
        ).alias("sum_value"),
        hround(
            F.sum(F.col("_sum_cents").cast("decimal(38,0)")).cast("double")
            / F.lit(100.0)
            / F.sum("_n_val")
        ).alias("avg_value"),
    )


# --- deterministic stratified sample -----------------------------------------
# 10% per (lang) stratum by hash threshold; returns the sampled docs'
# ids + strata so membership itself is verified, not just counts.


@register(
    "stratified_sample_docs",
    oracle=f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {_oracle_hash('doc_id')} % 100 < 10
""",
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(_hash_col("doc_id") % 100 < 10).select(
        "doc_id", "lang", "source", "n_chars"
    )


# --- corpus mixture resampling -----------------------------------------------
# The domain-reweighting step of a pre-training pipeline: given a target
# language mixture, derive the per-language sampling rate that hits the
# mixture exactly while keeping 100% of the scarcest (binding) language,
# then keep/drop documents deterministically by hash threshold.
#
# All arithmetic is BIGINT so Spark and the DuckDB oracle agree bit-for-
# bit with no float thresholds anywhere:
#
# - binding language = argmin over langs of count/target. Compared via
#   integer division of count*10^6 by the target percent: two distinct
#   rationals c1/t1 != c2/t2 with t <= 100 differ by >= 1/10^4, so the
#   10^6-scaled quotients differ by >= 100 — integer division preserves
#   the exact order (lang breaks true ties).
# - keep rule: h * t_b * c_l < c_b * t_l * 10^6 with h = knuth-hash(doc_id)
#   mod 10^6, i.e. h < rate_l * 10^6 with the rate as an exact rational,
#   never a rounded double. Products stay inside int64 up to ~9e10 docs
#   per language; beyond that cast the comparison to decimal(38,0)
#   (both engines have exact int128 decimals).
#
# Plan at scale: one tiny groupBy for counts, a 1-row argmin, a
# broadcast of the 5-row rates table onto the scan, a map-side filter,
# and one final tiny aggregate — the corpus itself is never shuffled.

_MIX_TARGET = {"en": 30, "de": 20, "es": 20, "fr": 15, "zh": 15}
_MIX_SCALE = 1_000_000


def _mix_values_sql() -> str:
    rows = ", ".join(f"('{k}', {v})" for k, v in sorted(_MIX_TARGET.items()))
    return f"(VALUES {rows}) AS tgt(lang, t)"


@register(
    "corpus_mixture_resample",
    oracle=f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang
),
j AS (
  SELECT counts.lang, c, t FROM counts JOIN {_mix_values_sql()} USING (lang)
),
b AS (
  SELECT c AS cb, t AS tb FROM j
  ORDER BY (c * {_MIX_SCALE}) // t, lang LIMIT 1
),
rates AS (
  SELECT lang, c, t, cb, tb,
         LEAST({_MIX_SCALE}, (cb * t * {_MIX_SCALE}) // (tb * c)) AS rate_ppm
  FROM j, b
)
SELECT d.lang, MIN(r.rate_ppm) AS rate_ppm,
       COUNT(*) AS n_kept, CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE ({_oracle_hash('d.doc_id')} % {_MIX_SCALE}) * r.tb * r.c
      < r.cb * r.t * {_MIX_SCALE}
GROUP BY d.lang
""",
)
def corpus_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t_expr = F.lit(None).cast("long")
    for k, v in sorted(_MIX_TARGET.items(), reverse=True):
        t_expr = F.when(F.col("lang") == k, F.lit(v).cast("long")).otherwise(
            t_expr
        )
    # cached: both the binding argmin and the rates table read counts,
    # and without the cache each would re-scan the full corpus for its
    # own copy of this 5-row aggregate (lifetime: harness clearCache)
    counts = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("t", t_expr)
        .filter(F.col("t").isNotNull())
        .cache()
    )
    binding = (
        counts.orderBy(F.expr(f"c * {_MIX_SCALE} DIV t"), "lang")
        .limit(1)
        .select(F.col("c").alias("cb"), F.col("t").alias("tb"))
    )
    rates = counts.crossJoin(F.broadcast(binding)).withColumn(
        "rate_ppm",
        F.least(
            F.lit(_MIX_SCALE).cast("long"),
            F.expr(f"cb * t * {_MIX_SCALE} DIV (tb * c)"),
        ),
    )
    h = _hash_col("doc_id") % _MIX_SCALE
    kept = (
        docs.join(F.broadcast(rates), "lang")
        .filter(h * F.col("tb") * F.col("c") < F.col("cb") * F.col("t") * _MIX_SCALE)
    )
    return kept.groupBy("lang").agg(
        F.min("rate_ppm").alias("rate_ppm"),
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
    )


# --- quality-weighted deterministic sampling ---------------------------------
# Importance sampling with a VALUE-DEPENDENT keep probability: each doc
# survives with probability equal to its own quality score (a
# soft-keep, vs the hard cut of the percentile gate and the per-GROUP
# rates of the mixture resample). Still fully deterministic and
# engine-replayable: the probability becomes an integer ppm threshold
# via floor(quality*1e6 + 0.5) — quality is bit-identical cross-engine,
# so the threshold and therefore the exact kept set are too. Map-only
# until the final tiny rollup.


def _oracle_quality_scored(extra: str) -> str:
    from .text import ORACLE_QUALITY_FORMULA, oracle_quality_counts

    return f"""
WITH t AS ({oracle_quality_counts(extra)}),
scored AS (
  SELECT doc_id{extra},
         ROUND({ORACLE_QUALITY_FORMULA}, 6) AS quality
  FROM t
)"""


def _register_quality_weighted_sample():
    from ..functions.exact import davg, oracle_davg
    from .text import quality_expr

    @register(
        "quality_weighted_sample",
        oracle=f"""
{_oracle_quality_scored(", lang, source")}
SELECT lang, source, COUNT(*) AS n_kept,
       {oracle_davg("quality", 6)} AS avg_q_kept
FROM scored
WHERE ({_oracle_hash('doc_id')} % 1000000)
      < FLOOR(quality * 1000000.0 + 0.5)
GROUP BY lang, source
""",
    )
    def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        scored = docs.select(
            "doc_id", "lang", "source", F.round(quality_expr(), 6).alias("quality")
        )
        thr = F.floor(F.col("quality") * 1_000_000.0 + 0.5)
        kept = scored.filter((_hash_col("doc_id") % 1_000_000) < thr)
        return kept.groupBy("lang", "source").agg(
            F.count(F.lit(1)).alias("n_kept"),
            davg("quality", 6).alias("avg_q_kept"),
        )

    return quality_weighted_sample


quality_weighted_sample = _register_quality_weighted_sample()
