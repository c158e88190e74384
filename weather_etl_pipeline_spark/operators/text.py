"""Text-analysis operators (extension surface X-text; LLM-pipeline ops).

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen): split/explode for tokenization, higher-order
functions (aggregate/transform) for per-document folds, regexp for
BPE-ish token counting. No Python UDFs anywhere — at 100 TB these run
entirely inside codegen'd stages; explode fan-out is bounded by document
length and the token aggregation is a map-side-combinable groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, spread_to_cores
from ..functions.exact import hround, spark_hround
from ..registry import register

# --- term frequency per language ---------------------------------------------
# tokenize → explode → count per (lang, token). Vocabulary is small, so
# map-side partial aggregation collapses the exploded stream before the
# shuffle; at 100 TB this is the canonical word-count shape.


@register(
    "text_term_frequency",
    oracle="""
SELECT lang, token, COUNT(*) AS tf
FROM (
  SELECT lang, UNNEST(string_split(text, ' ')) AS token
  FROM documents
) t
WHERE token <> ''
GROUP BY lang, token
""",
    headline=True,
)
def text_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.selectExpr("lang", "explode(split(text, ' ')) AS token")
        .filter("token != ''")
        .groupBy("lang", "token")
        .agg(F.expr("COUNT(1)").alias("tf"))
    )


# --- per-document stats / quality score --------------------------------------
# Length/token/structure features — the standard pre-training quality
# heuristics (length, mean token length, type-token ratio). Pure
# narrow projection: no shuffle at all.
# avg_token_len = (chars - spaces) / n_tokens, single FP division.


@register(
    "text_doc_stats",
    oracle="""
SELECT
  doc_id,
  n_chars,
  len(string_split(text, ' ')) AS n_tokens,
  len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
  FLOOR((CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        / len(string_split(text, ' '))) * 1000000.0 + 0.5) / 1000000.0 AS avg_token_len,
  FLOOR((CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        / len(string_split(text, ' '))) * 1000000.0 + 0.5) / 1000000.0 AS type_token_ratio
FROM documents
""",
)
def text_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_unique = F.size(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        "n_chars",
        n_tokens.cast("long").alias("n_tokens"),
        n_unique.cast("long").alias("n_unique_tokens"),
        hround(
            (F.length("text") - (n_tokens - 1)).cast("double") / n_tokens
        ).alias("avg_token_len"),
        hround(n_unique.cast("double") / n_tokens).alias("type_token_ratio"),
    )


# --- corpus rollup per (lang, source) ----------------------------------------


@register(
    "text_lang_source_rollup",
    oracle="""
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       FLOOR((CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars)) * 1000000.0 + 0.5) / 1000000.0 AS avg_chars,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY lang, source
""",
)
def text_lang_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        hround(F.sum("n_chars").cast("double") / F.count("n_chars")).alias(
            "avg_chars"
        ),
        F.max("n_chars").alias("max_chars"),
    )


# --- BPE-ish token counting ---------------------------------------------------
# Counts letter-runs, digit-runs, and single non-alnum marks — the
# regex-class approximation of a BPE pre-tokenizer. regexp_extract_all
# is codegen'd JVM regex; no Python in the loop.

_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@register(
    "text_token_count_bpe",
    oracle=f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
       len(string_split(text, ' ')) AS n_ws_tokens
FROM documents
""",
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0)).cast("long").alias("n_bpe_tokens"),
        F.size(F.split("text", " ")).cast("long").alias("n_ws_tokens"),
    )


# --- document fingerprint (rolling hash) -------------------------------------
# Polynomial rolling hash over tokens, folded with a higher-order
# aggregate — exact int64 arithmetic with a per-step modulus, so the
# fingerprint is engine-independent. Token contribution mixes first-char
# codepoint and token length. This is the order-sensitive cousin of the
# exact-dedup hash: equal fingerprints ⇒ (almost surely) equal token
# streams.

_MOD = 1_000_000_007
_P = 31


@register(
    "text_doc_fingerprint",
    oracle=f"""
SELECT doc_id,
       list_reduce(
         list_prepend(
           CAST(0 AS BIGINT),
           list_transform(string_split(text, ' '),
                          t -> CAST(ascii(t) * 131 + length(t) AS BIGINT))),
         (acc, x) -> (acc * {_P} + x) % {_MOD}
       ) AS fingerprint
FROM documents
""",
)
def text_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    token_codes = F.transform(
        F.split("text", " "),
        lambda t: (F.ascii(t) * 131 + F.length(t)).cast("long"),
    )
    fp = F.aggregate(
        token_codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * _P + x) % _MOD,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


# --- mode: most frequent token per language ----------------------------------
# The deterministic argmax pattern: rank (count desc, token asc) and
# keep rank 1 — engine-built-in mode() has unspecified tie behavior, so
# the explicit window IS the portable form.


@register(
    "text_mode_token_per_lang",
    oracle="""
SELECT lang, token AS top_token, tf FROM (
  SELECT lang, token, COUNT(*) AS tf,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, token) AS rk
  FROM (SELECT lang, UNNEST(string_split(text, ' ')) AS token FROM documents) t
  GROUP BY lang, token
) r WHERE rk = 1
""",
)
def text_mode_token_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("tf").desc(), F.col("token"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("lang", F.col("token").alias("top_token"), "tf")
    )


# --- TF-IDF ------------------------------------------------------------------
# Term frequency × inverse document frequency, the flagship text
# statistic: tf from the exploded token stream, df from distinct
# (token, doc) pairs, idf = ln(N/df). Every count is exact; the two
# FP ops (ln, one multiply) run on identical inputs in a fixed order,
# round(6) guards the last bit. Top term per doc keeps the output
# bounded (row_number, deterministic tiebreak by token).


@register(
    "text_tfidf_top_term",
    oracle="""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
),
df AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token,
         ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
)
SELECT doc_id, token, tfidf FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rk
  FROM scored
) t WHERE rk = 1
""",
)
def text_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()  # scalar; the driver-side count keeps the plan simple
    scored = tf.join(df, "token").select(
        "doc_id",
        "token",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "token", "tfidf")
    )


# --- normalization (cleaning projection for text) ----------------------------
# The text twin of the silver cleaning layer: lowercase, strip
# non-alphanumerics, collapse whitespace. Pure codegen'd string ops.


@register(
    "text_normalize",
    oracle="""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                           ' +', ' ', 'g')) AS norm_text
FROM documents
""",
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return docs.select("doc_id", norm.alias("norm_text"))


# --- quality score (composite) ------------------------------------------------
# The pre-training quality heuristic: length saturation + lexical
# diversity + stopword plausibility, combined with fixed weights. All
# integer counts → two FP ops in a fixed order → deterministic.

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")


def quality_expr() -> "F.Column":
    """Unrounded quality score Column over a ``text`` column — shared by
    text_quality_score and the llm_corpus_curation composite so the
    formula can never drift between them.

    Evaluation-count discipline (design rule 3): the token array has
    three consumers (n_tok, n_uniq, n_stop), so it is bound ONCE as a
    HOF lambda variable — an inline split() would be re-built per
    consumer by CollapseProject. Identical arithmetic in the identical
    order, so the value is bit-equal to the naive form (A/B verified 0
    diffs at sf0.01; 0.72→0.54s at sf0.1@x100).

    One F.expr parse (round 14): the Column-API form cost ~0.1s of py4j
    round trips per invocation; the D suffix on every fractional
    literal keeps them DOUBLE like F.lit was (a bare 0.4 would parse as
    DECIMAL and change the FP promotion chain — see functions/exact.py
    string-twin note). One known plan-TEXT diff vs the old Column form:
    the Column API canonicalized the weights to the right of each
    multiply (``least(..) * 0.4``) where this string keeps them on the
    left (``0.4 * least(..)``). IEEE-754 multiplication is commutative,
    so the VALUES are bit-identical (oracle hash match across all
    consumers), but the parsed trees are not byte-equal — the committed
    llm_corpus_curation before/after plan pair shows exactly this diff
    (round-15 ADVICE: claim scoped to value-identity, not tree-identity)."""
    stop = ", ".join(f"'{s}'" for s in _STOPWORDS)
    score = (
        "0.4D * least(CAST(size(tk) AS DOUBLE) / 100.0D, 1.0D)"
        " + 0.4D * (CAST(size(array_distinct(tk)) AS DOUBLE) / size(tk))"
        " + 0.2D * least(4.0D * CAST(size(filter(tk,"
        f" x -> array_contains(array({stop}), x))) AS DOUBLE) / size(tk),"
        " 1.0D)"
    )
    return F.expr(
        f"get(transform(array(split(text, ' ')), tk -> {score}), 0)"
    )


def oracle_quality_counts(extra_cols: str = "") -> str:
    """DuckDB twin of the token-count sub-select feeding quality."""
    return f"""
  SELECT doc_id{extra_cols},
         len(string_split(text, ' ')) AS n_tok,
         len(list_distinct(string_split(text, ' '))) AS n_uniq,
         len(list_filter(string_split(text, ' '),
             x -> list_contains({list(_STOPWORDS)!r}, x))) AS n_stop
  FROM documents
"""


ORACLE_QUALITY_FORMULA = (
    "0.4 * least(CAST(n_tok AS DOUBLE) / 100.0, 1.0)"
    " + 0.4 * (CAST(n_uniq AS DOUBLE) / n_tok)"
    " + 0.2 * least(4.0 * CAST(n_stop AS DOUBLE) / n_tok, 1.0)"
)


@register(
    "text_quality_score",
    oracle=f"""
WITH t AS ({oracle_quality_counts()})
SELECT doc_id,
       ROUND({ORACLE_QUALITY_FORMULA}, 6) AS quality
FROM t
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.round(quality_expr(), 6).alias("quality"))


# --- language-ID: trigram profile ---------------------------------------------
# The real LID shape: a (trigram, lang) profile table broadcast-joined
# against exploded character trigrams; score = hit count per language;
# prediction = argmax with deterministic tie-break. Profiles here are
# demo lexicons — production swaps in learned trigram weights, the plan
# is unchanged (broadcast join + pivoted conditional counts).

_TRIGRAM_PROFILE = {
    "en": ["the", "ing", "ion", "ent"],
    "de": ["der", "sch", "ein", "und"],
    "es": ["que", "los", "ado", "nte"],
    "fr": ["les", "des", "eur", "ait"],
}


def _trigram_values_sql() -> str:
    rows = [
        f"('{t}', '{lang}')"
        for lang, tris in _TRIGRAM_PROFILE.items()
        for t in tris
    ]
    return ", ".join(rows)


_TRIGRAM_ORACLE = f"""
WITH profile(tri, plang) AS (VALUES {_trigram_values_sql()}),
tris AS (
  SELECT doc_id, UNNEST(list_transform(range(1, greatest(length(text) - 1, 2)),
                                       i -> substr(text, CAST(i AS INTEGER), 3))) AS tri
  FROM documents
),
scores AS (
  SELECT t.doc_id,
         COUNT(*) FILTER (WHERE p.plang = 'en') AS s_en,
         COUNT(*) FILTER (WHERE p.plang = 'de') AS s_de,
         COUNT(*) FILTER (WHERE p.plang = 'es') AS s_es,
         COUNT(*) FILTER (WHERE p.plang = 'fr') AS s_fr
  FROM tris t LEFT JOIN profile p ON t.tri = p.tri
  GROUP BY t.doc_id
)
SELECT doc_id,
  CASE
    WHEN s_de > s_en AND s_de > s_es AND s_de > s_fr THEN 'de'
    WHEN s_es > s_en AND s_es > s_fr THEN 'es'
    WHEN s_fr > s_en THEN 'fr'
    WHEN s_en > 0 THEN 'en'
    ELSE 'unk'
  END AS predicted_lang
FROM scores
"""


@register("text_langid_trigram", oracle=_TRIGRAM_ORACLE)
def text_langid_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fully NARROW, and SINGLE-EVALUATION by construction: the per-
    # language profiles are tiny literal lists, so classification is
    # pure per-row expression work — no explode, no broadcast join, no
    # groupBy shuffle. (A production-size trigram-frequency profile
    # would flip back to the broadcast-join shape; the cutover point is
    # when the profile stops fitting in a literal InSet.)
    #
    # Evaluation-count discipline (the round-6 @x100 sweep caught the
    # old 4-filter form at 25.8s — CollapseProject inlined the
    # length(text)-2 substring transform into EVERY language fold,
    # building the trigram array 4× per row):
    #   1. ALL four counts come from ONE aggregate() fold, so the
    #      trigram transform has a single consumer and is built once;
    #   2. the argmax when-chain consumes the counts struct as a HOF
    #      LAMBDA VARIABLE (transform over a 1-element array) — lambda
    #      variables are materialized values, O(1) per reference, so
    #      the fold itself also runs exactly once per row. No exchange
    #      needed as a barrier — nothing fat ever shuffles.
    # A/B at sf0.1/@x10/@x100: 4-filter 0.64/2.93/25.78s; array-behind-
    # exchange 1.90/2.08/8.94s (ships trigram arrays through the wire);
    # this form 0.90/1.31/9.97s — best at every realistic scale.
    langs = ["en", "de", "es", "fr"]
    tris = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("text") - 2, F.lit(1))),
        lambda i: F.substring(F.col("text"), i, F.lit(3)),
    )
    zero = F.struct(*[F.lit(0).cast("long").alias(l) for l in langs])

    def step(acc, t):
        return F.struct(
            *[
                (acc[l] + F.when(t.isin(*_TRIGRAM_PROFILE[l]), 1).otherwise(0)).alias(l)
                for l in langs
            ]
        )

    counts = F.aggregate(tris, zero, step)

    def predchain(c):
        return (
            F.when((c["de"] > c["en"]) & (c["de"] > c["es"]) & (c["de"] > c["fr"]), "de")
            .when((c["es"] > c["en"]) & (c["es"] > c["fr"]), "es")
            .when(c["fr"] > c["en"], "fr")
            .when(c["en"] > 0, "en")
            .otherwise("unk")
        )

    pred = F.get(F.transform(F.array(counts), lambda c: predchain(c)), 0)
    base = spread_to_cores(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return base.select("doc_id", pred.alias("predicted_lang"))


# --- language-ID heuristic -----------------------------------------------------
# Marker-token scoring: count hits against small per-language marker
# lexicons, predict argmax (deterministic tie-break by language code).
# The lexicons here are demo-sized; a production profile would be a
# broadcast trigram-frequency table joined the same way — the plan shape
# (narrow scan + codegen'd scoring + no shuffle) is the point.

_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "es": ["el", "la", "de"],
    "fr": ["le", "la", "et"],
}


def _token_eq(marker: str):
    # closure factory: F.filter inspects lambda arity, so the predicate
    # must be a genuine single-argument lambda (a default-arg second
    # param would make Spark pass the element index into it)
    return lambda t: t == F.lit(marker)


def _hit_count_expr(markers: list[str]):
    toks = F.split("text", " ")
    expr = F.lit(0)
    for m in markers:
        expr = expr + F.size(F.filter(toks, _token_eq(m)))
    return expr


def _oracle_hits(markers: list[str]) -> str:
    parts = [
        f"len(list_filter(string_split(text, ' '), t -> t = '{m}'))" for m in markers
    ]
    return " + ".join(parts)


_LANGID_ORACLE = f"""
SELECT doc_id, lang,
  CASE
    WHEN {_oracle_hits(_MARKERS['de'])} > {_oracle_hits(_MARKERS['en'])}
     AND {_oracle_hits(_MARKERS['de'])} > {_oracle_hits(_MARKERS['es'])}
     AND {_oracle_hits(_MARKERS['de'])} > {_oracle_hits(_MARKERS['fr'])}
      THEN 'de'
    WHEN {_oracle_hits(_MARKERS['es'])} > {_oracle_hits(_MARKERS['en'])}
     AND {_oracle_hits(_MARKERS['es'])} > {_oracle_hits(_MARKERS['fr'])}
      THEN 'es'
    WHEN {_oracle_hits(_MARKERS['fr'])} > {_oracle_hits(_MARKERS['en'])}
      THEN 'fr'
    WHEN {_oracle_hits(_MARKERS['en'])} > 0 THEN 'en'
    ELSE 'unk'
  END AS predicted_lang
FROM documents
"""


@register("text_langid_markers", oracle=_LANGID_ORACLE)
def text_langid_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    de = _hit_count_expr(_MARKERS["de"])
    en = _hit_count_expr(_MARKERS["en"])
    es = _hit_count_expr(_MARKERS["es"])
    fr = _hit_count_expr(_MARKERS["fr"])
    pred = (
        F.when((de > en) & (de > es) & (de > fr), "de")
        .when((es > en) & (es > fr), "es")
        .when(fr > en, "fr")
        .when(en > 0, "en")
        .otherwise("unk")
    )
    return docs.select("doc_id", "lang", pred.alias("predicted_lang"))


# --- bigram language-model profile (corpus n-gram statistics) ----------------
# Training-data QA builds per-language n-gram statistics: bigram counts
# and the most likely continuation of each token (argmax conditional
# probability). The engine shape: posexplode + per-doc lead (one
# doc_id-partitioned window), hash groupBy with map-side partial
# counts, then a (lang, t1)-partitioned argmax window. Shuffles on
# (lang, t1) — high cardinality, no hot key; the same plan carries a
# full KenLM-style count pipeline at 100 TB. Gated to t1 totals >= 20
# so the output is a profile, not a corpus dump.

_BIGRAM_MIN_T1 = 20


@register(
    "text_bigram_top",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents
),
big AS (
  SELECT lang, tk[i] AS t1, tk[i + 1] AS t2
  FROM (
    SELECT doc_id, lang, tk, UNNEST(generate_series(1, len(tk) - 1)) AS i
    FROM toks
  )
),
counts AS (
  SELECT lang, t1, t2, COUNT(*) AS c FROM big GROUP BY lang, t1, t2
),
ranked AS (
  SELECT lang, t1, t2, c,
         SUM(c) OVER (PARTITION BY lang, t1) AS c_t1,
         ROW_NUMBER() OVER (
           PARTITION BY lang, t1 ORDER BY c DESC, t2) AS rk
  FROM counts
)
SELECT lang, t1, t2, CAST(c AS BIGINT) AS c,
       FLOOR((CAST(c AS DOUBLE) / c_t1) * 1000000.0 + 0.5) / 1000000.0 AS p_next
FROM ranked WHERE rk = 1 AND c_t1 >= {_BIGRAM_MIN_T1}
""",
)
def text_bigram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.posexplode(F.split("text", " ")).alias("pos", "t1")
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        toks.select("lang", "t1", F.lead("t1").over(wd).alias("t2"))
        .filter(F.col("t2").isNotNull())
    )
    counts = big.groupBy("lang", "t1", "t2").agg(F.count(F.lit(1)).alias("c"))
    wt = Window.partitionBy("lang", "t1")
    wr = Window.partitionBy("lang", "t1").orderBy(F.col("c").desc(), "t2")
    ranked = counts.withColumn("c_t1", F.sum("c").over(wt)).withColumn(
        "rk", F.row_number().over(wr)
    )
    return ranked.filter(
        (F.col("rk") == 1) & (F.col("c_t1") >= _BIGRAM_MIN_T1)
    ).select(
        "lang",
        "t1",
        "t2",
        F.col("c").cast("long").alias("c"),
        hround(F.col("c").cast("double") / F.col("c_t1")).alias("p_next"),
    )


# --- vocabulary coverage / OOV rate ------------------------------------------
# Tokenizer-vocabulary QA: build the top-K corpus vocabulary (by global
# term frequency, deterministic ties by token), then score every doc's
# out-of-vocabulary rate. The scale shape: the vocab is top-K BOUNDED,
# so it broadcasts regardless of corpus size; the per-doc rollup is a
# map-side-combinable count over the exploded tokens — one broadcast
# join, one doc_id agg, no all-pairs anything.

_VOCAB_K = 200


@register(
    "text_vocab_coverage",
    oracle=f"""
WITH tf AS (
  SELECT token, COUNT(*) AS tf FROM (
    SELECT UNNEST(string_split(text, ' ')) AS token FROM documents
  ) GROUP BY token
),
vocab AS (
  SELECT token FROM (
    SELECT token, ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS rk FROM tf
  ) t WHERE rk <= {_VOCAB_K}
),
toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
)
SELECT t.doc_id,
       COUNT(*) AS n_tok,
       CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       FLOOR((CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0 AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.token = v.token
GROUP BY t.doc_id
""",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    # top-K via orderBy+limit = TakeOrderedAndProject (per-partition
    # heaps + merge) — a row_number window here would drag the whole
    # vocabulary through ONE partition; (tf, token) is a total order so
    # the K rows are deterministic either way
    vocab = (
        tf.orderBy(F.col("tf").desc(), "token")
        .limit(_VOCAB_K)
        .select("token", F.lit(True).alias("_in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(
                F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tok",
            "n_oov",
            hround(F.col("n_oov").cast("double") / F.col("n_tok")).alias(
                "oov_rate"
            ),
        )
    )


# --- n-gram novelty (incremental-contribution curation signal) ---------------
# "How much of this document's content is FIRST SEEN here?" — the
# shingle-level novelty score curation pipelines use to rank documents
# by incremental contribution to the corpus (a near-dup of earlier
# material scores ~0; boilerplate-heavy docs score low even when no
# single earlier doc matches). First-seen = min doc_id over the docs
# containing the shingle, which makes the score deterministic and
# order-free (ingestion order at scale would use an ingest sequence
# column the same way).
#
# Plan: narrow per-doc distinct shingle arrays (shared shingle_arrays
# pipeline) → one (shingle → min doc) aggregation over the exploded
# stream → join back on shingle → per-doc rollup. Two shuffles of the
# shingle stream + one vocab-sized aggregate; the first-seen side joins
# 1 row per shingle so common shingles cause no fan-out.

_NOV_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], chr(31)) AS s
  FROM toks, UNNEST(generate_series(1, len(tk) - 2)) AS t(i)
),
fs AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s)
SELECT sh.doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN fs.first_doc = sh.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       FLOOR(CAST(SUM(CASE WHEN fs.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*) * 1000000.0 + 0.5) / 1000000.0
         AS novelty
FROM sh JOIN fs ON sh.s = fs.s
GROUP BY sh.doc_id
"""


@register("text_ngram_novelty", oracle=_NOV_ORACLE)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import shingle_arrays

    docs = load_table(spark, sf_dir, "documents")
    ex = shingle_arrays(docs).select(
        "doc_id", F.explode("shingles").alias("s")
    )
    # first-appearance via a window over ONE pass (round 15): the old
    # groupBy(s) + join-back planned the scan+shingle subtree TWICE
    # (no exchange reuse across the aggregated branch) and joined the
    # exploded rows against a distinct-shingle table that is
    # corpus-sized at scale — min(doc_id) OVER (PARTITION BY s)
    # computes the identical first_doc on the single exploded pass:
    # one scan (was 2), one shuffle by s (was shuffle + join), same
    # values row-for-row (oracle hash-exact).
    marked = ex.selectExpr(
        "doc_id", "min(doc_id) OVER (PARTITION BY s) AS first_doc"
    )
    novel = "SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)"
    return marked.groupBy("doc_id").agg(
        F.expr("COUNT(1)").alias("n_shingles"),
        F.expr(novel).alias("n_novel"),
        F.expr(
            spark_hround(f"CAST({novel} AS DOUBLE) / COUNT(1)")
        ).alias("novelty"),
    )


# --- boilerplate report (top document-frequency shingles) --------------------
# The other half of repetition QA: CROSS-document boilerplate (headers,
# disclaimers, navigation junk) shows up as shingles contained in an
# outsized share of documents. Distinct-per-doc shingles → one
# doc-frequency aggregation → global top-20 by (df, shingle) — a
# TakeOrderedAndProject, never a global sort. These are exactly the
# shingles the decontamination stop-shingle cap drops and the jaccard
# posting cap truncates; the report is how you TUNE those caps on a
# real corpus.


@register(
    "text_boilerplate_report",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], chr(31)) AS s
  FROM toks, UNNEST(generate_series(1, len(tk) - 2)) AS t(i)
),
df AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT s AS shingle, CAST(df AS BIGINT) AS df,
       FLOOR(CAST(df AS DOUBLE) / n.n_docs * 1000000.0 + 0.5) / 1000000.0
         AS doc_share
FROM df, n
ORDER BY df DESC, s
LIMIT 20
""",
)
def text_boilerplate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import shingle_arrays

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df = (
        shingle_arrays(docs)
        .select("doc_id", F.explode("shingles").alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return (
        df.crossJoin(F.broadcast(n_docs))
        .orderBy(F.col("df").desc(), "s")
        .limit(20)
        .select(
            F.col("s").alias("shingle"),
            "df",
            (
                F.floor(
                    F.col("df").cast("double")
                    / F.col("n_docs")
                    * 1_000_000.0
                    + 0.5
                )
                / 1_000_000.0
            ).alias("doc_share"),
        )
    )


# --- cross-language vocabulary overlap ---------------------------------------
# Corpus QA at the language level: pairwise Jaccard between language
# vocabularies exposes mislabeled languages (two "different" langs with
# near-total vocab overlap) and shared-boilerplate contamination. The
# intersection self-join keys on token, so per-token fan-out is bounded
# by #langs² (tiny constant), never corpus-quadratic; vocab sizes come
# from one distinct-count aggregate.


@register(
    "lang_vocab_overlap",
    oracle="""
WITH vt AS (
  SELECT DISTINCT lang, UNNEST(list_distinct(string_split(text, ' '))) AS token
  FROM documents
),
vs AS (SELECT lang, COUNT(*) AS v FROM vt GROUP BY lang),
inter AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, COUNT(*) AS i
  FROM vt a JOIN vt b ON a.token = b.token AND a.lang < b.lang
  GROUP BY a.lang, b.lang
)
SELECT i.lang_a, i.lang_b, CAST(i.i AS BIGINT) AS n_shared,
       FLOOR(CAST(i.i AS DOUBLE) / (va.v + vb.v - i.i) * 1000000.0 + 0.5)
         / 1000000.0 AS vocab_jaccard
FROM inter i
JOIN vs va ON va.lang = i.lang_a
JOIN vs vb ON vb.lang = i.lang_b
""",
)
def lang_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    vt = (
        docs.select(
            "lang", F.explode(F.array_distinct(F.split("text", " "))).alias("token")
        )
        .distinct()
    )
    vs = vt.groupBy("lang").agg(F.count(F.lit(1)).alias("v"))
    a = vt.select(F.col("lang").alias("lang_a"), "token")
    b = vt.select(F.col("lang").alias("lang_b"), "token")
    inter = (
        a.join(b, "token")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    va = vs.select(F.col("lang").alias("lang_a"), F.col("v").alias("va"))
    vb = vs.select(F.col("lang").alias("lang_b"), F.col("v").alias("vb"))
    jac = F.col("i").cast("double") / (F.col("va") + F.col("vb") - F.col("i"))
    return (
        inter.join(F.broadcast(va), "lang_a")
        .join(F.broadcast(vb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            F.col("i").alias("n_shared"),
            (F.floor(jac * 1_000_000.0 + 0.5) / 1_000_000.0).alias(
                "vocab_jaccard"
            ),
        )
    )


# --- character-class profile per language ------------------------------------
# Orthography QA: the per-language distribution of character classes
# (letters / digits / punctuation / spaces). Wrong-script contamination
# (e.g. Cyrillic rows labeled 'en') and markup bleed-through (punct
# spikes) surface here before they poison lang-id training. Counts come
# from length deltas after class-targeted regexp_replace — pure
# map-side integer arithmetic, identical regex semantics both engines
# for these ASCII classes; one tiny rollup.


@register(
    "text_charclass_profile",
    oracle="""
WITH per_doc AS (
  SELECT lang,
         length(text) AS n_ch,
         length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS n_alpha,
         length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
         length(text) - length(regexp_replace(text, ' ', '', 'g')) AS n_space
  FROM documents
)
SELECT lang,
       CAST(SUM(n_ch) AS BIGINT) AS n_chars,
       CAST(SUM(n_alpha) AS BIGINT) AS n_alpha,
       CAST(SUM(n_digit) AS BIGINT) AS n_digit,
       CAST(SUM(n_space) AS BIGINT) AS n_space,
       CAST(SUM(n_ch - n_alpha - n_digit - n_space) AS BIGINT) AS n_other
FROM per_doc GROUP BY lang
""",
)
def text_charclass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_ch = F.length("text")
    strip = lambda pat: n_ch - F.length(F.regexp_replace("text", pat, ""))  # noqa: E731
    per_doc = docs.select(
        "lang",
        n_ch.alias("n_ch"),
        strip("[a-zA-Z]").alias("n_alpha"),
        strip("[0-9]").alias("n_digit"),
        strip(" ").alias("n_space"),
    )
    return per_doc.groupBy("lang").agg(
        F.sum("n_ch").alias("n_chars"),
        F.sum("n_alpha").alias("n_alpha"),
        F.sum("n_digit").alias("n_digit"),
        F.sum("n_space").alias("n_space"),
        F.sum(
            F.col("n_ch") - F.col("n_alpha") - F.col("n_digit") - F.col("n_space")
        ).alias("n_other"),
    )


# --- document length histogram (per language) --------------------------------
# The length-spectrum QA: corpus length distributions are heavy-tailed,
# and a missing tail (over-aggressive truncation) or a spike at a
# round number (hard cutoff artifacts) is immediately visible in
# doubling buckets. Buckets are literal integer boundaries evaluated
# identically on both engines (no log() — IEEE log is not
# correctly-rounded, so floor(log2(n)) can disagree at exact powers).


_LEN_BOUNDS = [50, 100, 200, 400, 800, 1600]


def _len_bucket_sql() -> str:
    clauses = " ".join(
        f"WHEN n_chars < {b} THEN {i}" for i, b in enumerate(_LEN_BOUNDS)
    )
    return f"CASE {clauses} ELSE {len(_LEN_BOUNDS)} END"


@register(
    "doc_length_histogram",
    oracle=f"""
SELECT lang,
       CAST({_len_bucket_sql()} AS BIGINT) AS len_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang, {_len_bucket_sql()}
""",
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.lit(len(_LEN_BOUNDS)).cast("long")
    for i, b in reversed(list(enumerate(_LEN_BOUNDS))):
        bucket = F.when(F.col("n_chars") < b, F.lit(i).cast("long")).otherwise(
            bucket
        )
    return docs.groupBy("lang", bucket.alias("len_bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
