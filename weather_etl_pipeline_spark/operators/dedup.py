"""Deduplication operators (LLM-pipeline surface: exact + near-dup).

Four strategies, in increasing sophistication — the standard toolbox for
pre-training-corpus dedup:

- exact: hash-groupBy on content (map-side combinable, one shuffle);
- n-gram Jaccard: token-set overlap via an inverted-index join, blocked
  by (lang, source) so the candidate space never goes quadratic in the
  corpus — the blocking key is the knob that keeps this sub-O(n²) at
  100 TB (swap in coarser shards/buckets as needed);
- MinHash + LSH: shingle → K minhashes → banded bucket join; candidate
  pairs only form inside a bucket, verification joins back to token
  sets. Sub-quadratic by construction; hash-function-specific so no SQL
  oracle (pytest oracle-bridge ties it to the portable twin);
- SimHash: 64-bit signature via HOF fold (no explode), banded into
  16-bit chunks for candidate generation, hamming-distance verify.

Collapse-first contract (round 7): every banded structure collapses
EXACT duplicates before signing (_collapse_exact) and outputs a linear
cluster certificate — star edges (rep, member) at jaccard 1.0 /
hamming 0 plus verified rep-level near-dup pairs. Exact-dup recall is
therefore exact at ANY multiplicity (per-bucket caps can no longer
starve twin tails), the all-pairs clique (quadratic under duplication)
is never materialized, and the caps bound only genuinely-distinct
co-bucketed texts.

All JVM-side built-ins — no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import (
    cap_per_group,
    knuth_hash,
    load_table,
    oracle_knuth_hash,
    spread_to_cores,
    table_file_bytes,
)
from ..functions.exact import hround, spark_hround
from ..registry import register

# --- exact dedup: canonical row per content ----------------------------------
# Deterministic survivor (min doc_id) so both engines agree row-for-row.


@register(
    "dedup_exact_canonical",
    headline=True,
    oracle="""
SELECT MIN(doc_id) AS doc_id, text, COUNT(*) AS n_copies
FROM documents GROUP BY text
""",
)
def dedup_exact_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies")
    )


# --- exact dedup: keep-first full row (window variant) -----------------------


@register(
    "dedup_exact_keep_first",
    oracle="""
SELECT doc_id, lang, source, n_chars FROM (
  SELECT doc_id, lang, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents
) t WHERE rn = 1
""",
)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


# --- n-gram Jaccard near-dup pairs (oracle-verified) -------------------------
# Candidates + exact verify, the shape that survives 100 TB:
#
# 1. inverted index on distinct tokens, blocked by (lang, source);
# 2. POSTING-LIST CAP: candidate generation only sees the first
#    ``_JACCARD_POSTING_CAP`` docs (by doc_id) of each (block, token)
#    posting list. Uncapped, the candidate count is Σ_token df(token)² —
#    quadratic in the frequency of common tokens, the classic inverted-
#    index scale-killer. Capped, it is ≤ vocab × CAP² — linear in corpus
#    size. The recall tradeoff (a pair sharing ONLY tokens whose lists
#    are longer than CAP is missed) is the documented production
#    tradeoff; near-dup pairs share many tokens, most of them rare.
# 3. exact verify: n_shared is counted over the FULL token sets of the
#    candidate pairs (same candidates→verify split as the MinHash-LSH
#    path), so reported Jaccard scores are exact, not capped
#    approximations.
#
# The DuckDB oracle applies the IDENTICAL deterministic cap (row_number
# by doc_id), so Spark and oracle agree at any corpus scale by
# construction, not by luck.

_JACCARD_T = 0.6
_JACCARD_POSTING_CAP = 64
# cache the derived per-doc token arrays only past this documents-table
# size: the cache is consumed three times (posting path + both verify
# sides), but its materialization is a serializing BARRIER the three
# otherwise-concurrent scans don't pay. Interleaved A/B (round 12):
# no-cache wins 0.80s vs 1.10s at sf0.1 (0.6MB) and 1.33 vs 1.46 at
# @x10 (5.9MB); cache wins 1.81 vs 2.20 at @x30 (18MB) and 2.01 vs
# 2.35 at @x100 — the recompute term (3× split+array_distinct) crosses
# the barrier cost at ~10MB. Driver-side file metadata, no scan — the
# same gate mechanism as _JACCARD_BC_MAX_BYTES below.
_JACCARD_CACHE_MIN_BYTES = 8 * 1024 * 1024
# verify-broadcast gate: documents.parquet bytes under which the
# inverted index (~2-4x the raw bytes in memory) broadcasts safely
_JACCARD_BC_MAX_BYTES = 64 * 1024 * 1024

# scored-candidate CTE chain shared by the pair query and the
# threshold-tuning curve below (one definition so they cannot drift)
_JACCARD_CTE_PREFIX = f"""marked AS (
  -- exact-collapse (the same star-certificate contract as the LSH
  -- family): posting caps otherwise have the identical recall hole —
  -- exact twins fill every capped posting list they appear in,
  -- crowding distinct near-dups out and losing twin tails past the
  -- cap. Row_numbers, not whole-row DISTINCT: cp kills replicated
  -- input rows (@xN amplification, ingest double-writes — dup²-fold
  -- verify inflation otherwise, caught by the @x1000 sweep) AND pins
  -- one star edge per member; rn0's (doc_id, lang, source) order
  -- makes the surviving rep row deterministic
  SELECT doc_id, lang, source, text,
         MIN(doc_id) OVER (PARTITION BY text) AS rep,
         ROW_NUMBER() OVER (PARTITION BY text
                            ORDER BY doc_id, lang, source) AS rn0,
         ROW_NUMBER() OVER (PARTITION BY text, doc_id
                            ORDER BY lang, source) AS cp
  FROM documents WHERE text IS NOT NULL
),
jdocs AS (SELECT doc_id, lang, source, text FROM marked WHERE rn0 = 1),
jstar AS (
  SELECT rep AS doc_a, doc_id AS doc_b FROM marked
  WHERE cp = 1 AND doc_id <> rep
),
toks AS (
  SELECT doc_id, lang, source,
         len(list_distinct(string_split(text, ' '))) AS n_tok,
         UNNEST(list_distinct(string_split(text, ' '))) AS token
  FROM jdocs
),
capped AS (
  SELECT * FROM (
    SELECT doc_id, lang, source, token,
           ROW_NUMBER() OVER (PARTITION BY lang, source, token
                              ORDER BY doc_id) AS rn
    FROM toks
  ) t WHERE rn <= {_JACCARD_POSTING_CAP}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b
    ON a.token = b.token AND a.lang = b.lang AND a.source = b.source
   AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT c.doc_a, c.doc_b,
         MIN(a.n_tok) AS n_a, MIN(b.n_tok) AS n_b, COUNT(*) AS n_shared
  FROM cand c
  JOIN toks a ON a.doc_id = c.doc_a
  JOIN toks b ON b.doc_id = c.doc_b AND b.token = a.token
  GROUP BY c.doc_a, c.doc_b
)"""

_JACCARD_ORACLE = f"""
WITH {_JACCARD_CTE_PREFIX}
SELECT doc_a, doc_b,
       FLOOR(CAST(n_shared AS DOUBLE) / (n_a + n_b - n_shared) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
FROM pairs
WHERE CAST(n_shared AS DOUBLE) / (n_a + n_b - n_shared) >= {_JACCARD_T}
UNION ALL
SELECT doc_a, doc_b, 1.0 AS jaccard FROM jstar
"""


def _jaccard_collapse(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(reps, star_edges) for the jaccard family — the same exact-
    collapse contract as the LSH ops (_collapse_exact), carrying the
    blocking columns (lang, source) on the reps. Posting caps have the
    identical recall hole the LSH bucket caps had: exact twins fill
    every capped posting list they appear in, crowding distinct
    near-dups out and losing twin tails past the cap. Star edges span
    blocks deliberately — identical text is a duplicate regardless of
    which (lang, source) block each copy was filed under.

    ONE text exchange total, same as _collapse_exact: all three windows
    ride the single partitionBy(text) hash exchange (the (text, doc_id)
    window's ClusteredDistribution is satisfied by hash(text) — subset
    rule), and the row_numbers subsume the whole-row distinct the round-7
    version ran as a separate exchange. _cp (not whole-row distinct)
    kills replicated input rows — doc_id is the unit of pairing;
    replicated rows would ride the verify joins on BOTH sides (dup² work
    and dup²-inflated n_shared, measured 12.9×/decade at @x1000 before
    the fix) — and pins ONE star edge per member even when a member row
    is replicated with differing lang/source (the round-7 whole-row
    distinct let those emit the same edge twice). _rn0's (doc_id, lang,
    source) order makes the surviving rep row's block deterministic."""
    # one selectExpr (round 14, same as _collapse_exact): identical
    # parsed expressions, ~0.3s fewer py4j round trips per invocation
    marked = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source", "text")
        .filter("text IS NOT NULL")
        .selectExpr(
            "doc_id",
            "lang",
            "source",
            "text",
            "min(doc_id) OVER (PARTITION BY text) AS _rep",
            "row_number() OVER (PARTITION BY text"
            " ORDER BY doc_id, lang, source) AS _rn0",
            "row_number() OVER (PARTITION BY text, doc_id"
            " ORDER BY lang, source) AS _cp",
        )
    )
    reps = marked.filter("_rn0 = 1").select("doc_id", "lang", "source", "text")
    star = marked.filter("_cp = 1 AND doc_id != _rep").selectExpr(
        "_rep AS doc_a", "doc_id AS doc_b"
    )
    return reps, star


def _jaccard_scored_pairs(
    spark: SparkSession, sf_dir: str, reps: DataFrame | None = None
) -> DataFrame:
    """Verified candidate pairs with (doc_a, doc_b, n_a, n_b, n_shared)
    over the collapsed reps — the shared pipeline behind the pair query
    and the threshold curve (one definition so they cannot drift)."""
    docs = reps if reps is not None else _jaccard_collapse(spark, sf_dir)[0]
    # ONE ROW PER DOC with the distinct-token ARRAY (not the exploded
    # index): candidate generation explodes from it, and the exact
    # verify reads the arrays directly — the full token volume never
    # crosses the wire a second time. Cached only past the measured
    # size crossover (_JACCARD_CACHE_MIN_BYTES): below it the cache's
    # materialization barrier costs more than three concurrent narrow
    # recomputes. Cache lifetime when taken: released by the
    # catalog.clearCache() the harness runs between registry entries;
    # longer-lived callers should unpersist after materializing.
    toks = docs.selectExpr(
        "doc_id",
        "lang",
        "source",
        "array_distinct(split(text, ' ')) AS tokens",
    ).selectExpr("*", "size(tokens) AS n_tok")
    # ONE metadata listing feeds both size gates (cache + broadcast):
    # the recursive py4j FileSystem listing costs real driver latency
    # on Hadoop schemes, and both gates should read one snapshot
    doc_bytes = table_file_bytes(spark, sf_dir, "documents")
    if doc_bytes >= _JACCARD_CACHE_MIN_BYTES:
        toks = toks.cache()
    inv = toks.selectExpr(
        "doc_id", "lang", "source", "explode(tokens) AS token"
    )
    # cap via window row_number (streams/spills — a raw collect_list of
    # UNCAPPED posting lists would materialize per-group arrays bounded
    # only by token frequency: an OOM at corpus scale), then collect the
    # already-capped ≤CAP doc_ids per token in the SAME partitioning —
    # the groupBy reuses the window's (lang, source, token) exchange, so
    # the capped posting arrays cost no extra shuffle and are bounded by
    # construction
    capped = inv.selectExpr(
        "*",
        "row_number() OVER (PARTITION BY lang, source, token"
        " ORDER BY doc_id) AS rn",
    ).filter(f"rn <= {_JACCARD_POSTING_CAP}")
    posting = capped.groupBy("lang", "source", "token").agg(
        F.expr("sort_array(collect_list(doc_id))").alias("ds")
    )
    # pair-gen by double-explode of the bounded posting arrays — narrow
    # (no self-join shuffle of the exploded index; ≤ CAP²/2 rows per
    # token row by construction)
    cand = (
        posting.selectExpr("explode(ds) AS doc_a", "ds")
        .selectExpr("doc_a", "explode(ds) AS doc_b")
        .filter("doc_a < doc_b")
        .distinct()
    )
    # exact verify over full DISTINCT-token sets of the candidate pairs
    # only — array_intersect over the cached per-doc token arrays, NO
    # aggregation. History of this A/B (it flipped): rounds 6-8
    # measured an exploded count-join (cand ⋈ index_a ⋈ index_b →
    # groupBy pair) FASTER than the arrays shape (2.44s vs 3.42s at
    # sf0.1, round 8) and kept it. Round 12, after the one-exchange
    # collapse, the posting/cap fusion, and the toks cache shrank
    # everything upstream, the same A/B at the new head reads arrays
    # 0.99s vs count-join 1.52s best-of-5 — the count-join's final
    # groupBy exchange and second join stage are now the plan's most
    # expensive stages, while the arrays verify is two broadcast-gated
    # joins and a map-side size(array_intersect): one fewer shuffle,
    # no pairs×tokens intermediate. Outputs verified identical at
    # sf0.01 and sf0.1 (exact set compare, both gate paths).
    ta = toks.selectExpr("doc_id AS doc_a", "tokens AS _ta", "n_tok AS n_a")
    tb = toks.selectExpr("doc_id AS doc_b", "tokens AS _tb", "n_tok AS n_b")
    # size-gated broadcast of the verify arrays (driver-side file
    # metadata, no scan): while the documents table is small enough
    # that the per-doc token arrays fit an executor, both joins are
    # broadcast and the verify is map-only; past the gate (the @x1000
    # sweep, any real corpus) the plan falls back to shuffle joins
    # keyed on doc_id — bounded by the candidate count, which the
    # posting caps bound in turn. The arrays side is STRICTLY smaller
    # than the exploded index the pre-round-12 verify shipped (same
    # token payload, one row per doc instead of one per token).
    if doc_bytes <= _JACCARD_BC_MAX_BYTES:
        ta, tb = F.broadcast(ta), F.broadcast(tb)
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .selectExpr(
            "doc_a",
            "doc_b",
            "size(array_intersect(_ta, _tb)) AS n_shared",
            "n_a",
            "n_b",
        )
    )


# exact-jaccard over the scored-pair counts — the SQL string twin of
# the old _jac_expr Column builder (round 15): same parse tree
# (left-associative (n_a + n_b) - n_shared), one parser trip per
# consumer instead of ~8 Column round trips per mention
_JAC_SQL = "CAST(n_shared AS DOUBLE) / (n_a + n_b - n_shared)"


@register("dedup_jaccard_pairs", oracle=_JACCARD_ORACLE, headline=True)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup edges via exact-collapse + capped inverted index — the
    same cluster-certificate contract as the LSH family: star edges
    (rep, member, 1.0) for exact-duplicate members (full recall at any
    multiplicity, across blocks) plus exact-verified rep-level pairs
    at jaccard >= _JACCARD_T within (lang, source) blocks."""
    reps, star = _jaccard_collapse(spark, sf_dir)
    pairs = (
        _jaccard_scored_pairs(spark, sf_dir, reps)
        .filter(f"{_JAC_SQL} >= {_JACCARD_T}D")
        .selectExpr("doc_a", "doc_b", f"{spark_hround(_JAC_SQL)} AS jaccard")
    )
    return pairs.unionByName(star.selectExpr("*", "1.0D AS jaccard"))


# --- jaccard threshold-tuning curve ------------------------------------------
# How you PICK _JACCARD_T on a real corpus: the distribution of exact
# jaccard over all verified candidates. A healthy near-dup corpus is
# bimodal (unrelated-but-cobucketed low bulk, true-dup high mode); the
# threshold goes in the valley. One extra tiny histogram aggregate over
# the pipeline the pair query already runs — candidates are bounded by
# the posting cap, so the curve costs what the pair query costs.
# Rep-level by construction (the collapse runs upstream): exact twins
# contribute no mass, which is what a TUNING signal wants — a
# dup-heavy corpus would otherwise bury the near-dup valley under a
# decile-10 spike of exact copies.


@register(
    "dedup_jaccard_threshold_curve",
    oracle=f"""
WITH {_JACCARD_CTE_PREFIX}
SELECT CAST(FLOOR(CAST(n_shared AS DOUBLE) / (n_a + n_b - n_shared) * 10)
            AS BIGINT) AS jaccard_decile,
       COUNT(*) AS n_pairs
FROM pairs
GROUP BY 1
""",
)
def dedup_jaccard_threshold_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return (
        _jaccard_scored_pairs(spark, sf_dir)
        .selectExpr(f"FLOOR(({_JAC_SQL}) * 10) AS jaccard_decile")
        .groupBy("jaccard_decile")
        .agg(F.expr("COUNT(1)").alias("n_pairs"))
    )


# --- MinHash + LSH near-dup (scale path; rows-only + pytest golden) ----------
# K=32 minhashes from xxhash64(seed, shingle); 8 bands × 4 rows. A pair
# collides iff some band signature matches → candidate set is ~linear in
# corpus size for bounded near-dup density. Verification = exact Jaccard
# on distinct 3-token shingles.

_MH_K = 32
_MH_BANDS = 8
_MH_ROWS = _MH_K // _MH_BANDS
_MH_VERIFY_T = 0.5
# shingle-array cache gate (round 13): same barrier-vs-recompute
# mechanism as _JACCARD_CACHE_MIN_BYTES. After the bound-lambda
# shingle rework removed the spread exchange, the uncached recompute
# is a narrow projection and the cache's materialization barrier
# dominates below ~4MB of documents. Interleaved warmed A/B (best /
# median of 4 alternating passes): no-cache wins 1.13/1.21 vs
# 1.40/1.49 at sf0.1 (0.6MB); cache wins 1.69/1.90 vs 1.88/2.03 at
# @x10 (5.9MB), ~ties 2.18/2.93 vs 2.38/2.86 at @x30, and wins
# 2.21/2.29 vs 2.24/2.58 at @x100. At 100 TB the gate always takes
# the cache.
_MINHASH_CACHE_MIN_BYTES = 4 * 1024 * 1024
# Per-bucket membership cap for every banded candidate structure
# (minhash bands, simhash chunks) — same role as _JACCARD_POSTING_CAP:
# bounds pair-gen at cells × CAP² regardless of duplicate multiplicity.
_LSH_BUCKET_CAP = 64


def _collapse_exact(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Exact-duplicate collapse in front of every banded LSH structure:
    (reps, star_edges) where ``reps`` keeps ONE row per distinct text
    (min doc_id survivor) and ``star_edges`` is (doc_a=rep, doc_b=member)
    for every other member — a LINEAR-size certificate of the full
    exact-dup relation (the member clique is its transitive closure).

    Why this is load-bearing for recall, not just perf: exact twins
    have identical signatures, so they occupy the same ordered prefix
    of EVERY band bucket they appear in — under a per-bucket membership
    cap, twins past the cap would emit zero candidate pairs in ANY band
    and silently escape dedup, and they'd crowd genuinely-distinct
    near-dups out of the bucket prefix besides. Collapsing first makes
    exact-dup recall exact at ANY multiplicity (every member is one
    star edge) and leaves the caps to bound only genuinely-distinct
    co-bucketed texts. Cost: the same one-shuffle text exchange
    dedup_exact_canonical already pays — reps and star edges both come
    out of the single min-over-window exchange.
    """
    # all three windows share the ONE partitionBy(text) exchange; the
    # row_numbers (not equality-with-min filters) make the outputs
    # duplication-proof: replicated input ROWS (same doc_id appearing
    # n times — @xN amplification, or upstream ingest double-writes)
    # yield exactly one rep row per text and one star edge per member,
    # never n copies (an equality filter kept every copy of the min
    # row, which re-introduced the dup² blowup downstream — caught by
    # the @x1000 sweep)
    # NULL text is UNKNOWN, not a duplicate class: the window would
    # otherwise co-partition every NULL-text doc and emit "identical
    # text" star edges between documents whose text is missing. Filter
    # preserves the pre-collapse semantics (no shingles → no pairs).
    # Built as ONE selectExpr (round 14): the Column-API form (three
    # withColumn window calls) cost ~0.3s of py4j round trips PER
    # INVOCATION on the driver — the parsed expressions are identical,
    # so the physical plan (and output) is byte-for-byte the same.
    marked = (
        docs.select("doc_id", "text")
        .filter("text IS NOT NULL")
        .selectExpr(
            "doc_id",
            "text",
            "min(doc_id) OVER (PARTITION BY text) AS _rep",
            "row_number() OVER (PARTITION BY text ORDER BY doc_id) AS _rn",
            "row_number() OVER (PARTITION BY text, doc_id ORDER BY doc_id)"
            " AS _cp",
        )
    )
    reps = marked.filter("_rn = 1").select("doc_id", "text")
    edges = marked.filter("_cp = 1 AND doc_id != _rep").selectExpr(
        "_rep AS doc_a", "doc_id AS doc_b"
    )
    return reps, edges


# oracle CTE fragment mirroring _collapse_exact verbatim (row_numbers,
# not equality-with-min, so replicated rows can't duplicate outputs):
# ``docs`` = one row per distinct text (min doc_id), ``star_edges`` =
# one (doc_a=rep, doc_b=member) edge per member
_COLLAPSE_CTE = """marked AS (
  SELECT doc_id, text,
         MIN(doc_id) OVER (PARTITION BY text) AS rep,
         ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn,
         ROW_NUMBER() OVER (PARTITION BY text, doc_id
                            ORDER BY doc_id) AS cp
  FROM documents
  WHERE text IS NOT NULL
),
docs AS (SELECT doc_id, text FROM marked WHERE rn = 1),
star_edges AS (
  SELECT rep AS doc_a, doc_id AS doc_b FROM marked
  WHERE cp = 1 AND doc_id <> rep
)"""


def _capped_bucket_pairs(
    keyed: DataFrame, keys: list[str], cap: int = _LSH_BUCKET_CAP
) -> DataFrame:
    """(doc_a < doc_b) candidate pairs from a (``*keys``, doc_id)
    bucketing, bounded by a deterministic first-``cap``-docs membership
    cap per bucket.

    One shuffle total: the row_number window partitions by the bucket
    keys, and the collect_list groupBy reuses that exact exchange, so
    the bounded arrays cost no extra shuffle; pair-gen is a narrow
    double-explode of ≤cap-element arrays (never a self-join of the
    exploded index).

    Round-7 A/B: fusing the cap into the groupBy as
    slice(sort_array(collect_list(..)), 1, cap) drops the window's
    per-bucket sort and reads 0.14s faster at sf0.1 (1.54 vs 1.68 on
    dedup_minhash_lsh) — rejected because the pre-slice collect_list
    materializes UNBOUNDED per-bucket arrays (the OOM shape the
    posting-cap design rule exists to forbid); the window streams.
    """
    from ..catalog import temp_col

    rn = temp_col(keyed, "rn")
    key_list = ", ".join(keys)
    capped = keyed.selectExpr(
        "*",
        f"row_number() OVER (PARTITION BY {key_list} ORDER BY doc_id)"
        f" AS {rn}",
    ).filter(f"{rn} <= {cap}")
    posting = capped.groupBy(*keys).agg(
        F.expr("sort_array(collect_list(doc_id))").alias("ds")
    )
    return (
        posting.selectExpr("explode(ds) AS doc_a", "ds")
        .selectExpr("doc_a", "explode(ds) AS doc_b")
        .filter("doc_a < doc_b")
        .distinct()
    )


def shingle_arrays(docs: DataFrame, n: int = 3, spread: bool = True) -> DataFrame:
    """One row per doc with the ARRAY of its distinct n-token shingles
    — a fully NARROW pipeline (no shuffle at all when ``spread=False``).

    Shape (round-13 rework): the token array is bound ONCE as an outer
    HOF lambda variable — ``get(transform(array(split(text)), tk ->
    <shingles over tk>), 0)``, the same single-binding trick as
    text.quality_expr — so every ``element_at(tk, i)`` inside the inner
    transform is O(1) bound-variable access with NO exchange needed as
    a CollapseProject barrier. (The previous form materialized _toks
    behind a round-robin exchange because a plain column reference got
    inlined by CollapseProject into the lambda, re-running split() per
    element — quadratic per document. The lambda binding gets the same
    O(1) access for free: measured 0.25 vs 0.49s at sf0.1 post-collapse,
    byte-identical output.)

    ``spread``: the round-robin exchange is now PURELY a parallelism
    hedge for callers whose input is a thin raw scan (a one-file local
    parquet feeding this heavy narrow pipeline would otherwise run
    single-partition). Callers downstream of an existing exchange
    (post-_collapse_exact — the minhash/jaccard heads) pass False and
    save the whole shuffle; at cluster scale a 100 TB scan has
    thousands of natural partitions and the hedge is a no-op cost
    either way. Docs with fewer than n tokens produce no row, matching
    the exploded form's grouping semantics."""
    base = docs.select("doc_id", "text").filter(
        f"size(split(text, ' ')) >= {n}"
    )
    if spread:
        base = spread_to_cores(base)
    return base.select("doc_id", _shingle_expr_bound(n).alias("shingles"))


def _shingles_over_sql(tk: str, n: int) -> str:
    """THE single definition of the n-token shingle construction,
    parameterized by the token-array expression ``tk`` (a lambda-bound
    variable in the array form, the ``_toks`` column in the exploded
    form — sharing one body is what keeps the two consumer families
    byte-identical; a one-sided edit would silently diverge them).
    '\\x1f' (unit separator) keeps token boundaries: with no separator
    ('ab','c') and ('a','bc') would collide into the same shingle.
    sequence() is safe unguarded: every caller filters size >= n, so
    start <= stop always.

    Emitted as a SQL fragment (round 14): one F.expr parse instead of
    ~n×5 py4j Column round trips per invocation; the parsed tree is
    the one the Column API built (the embedded 0x1f byte is the same
    literal the parser sees from a Python string)."""
    parts = ", ".join(
        f"element_at({tk}, i + {j})" if j else f"element_at({tk}, i)"
        for j in range(n)
    )
    return (
        f"array_distinct(transform(sequence(1, size({tk}) - {n - 1}), "
        f"i -> concat_ws('\x1f', {parts})))"
    )


def _shingle_expr_bound(n: int):
    """Distinct n-token shingle array over ``text``, with the token
    array bound once as a HOF lambda variable (see shingle_arrays)."""
    return F.expr(
        "get(transform(array(split(text, ' ')), "
        f"tk -> {_shingles_over_sql('tk', n)}), 0)"
    )


def _shingle_base(docs: DataFrame, n: int) -> DataFrame:
    return spread_to_cores(
        docs.selectExpr("doc_id", "split(text, ' ') AS _toks").filter(
            f"size(split(text, ' ')) >= {n}"
        )
    )


def _shingle_expr(n: int):
    return F.expr(_shingles_over_sql("_toks", n))


def shingle_rows(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct n-token shingles, one row per (doc_id, shingle) — the
    exploded view for consumers that aggregate or join per shingle
    (decontamination, UDTF twin).

    The explode MUST live in the same select that builds the array:
    projecting the array and exploding it in a later select makes the
    optimizer inline the array expression into the Generate node, where
    it is re-evaluated per OUTPUT row — measured 14× slower (0.33s →
    4.68s at sf0.1, n=5). Don't "simplify" this to
    shingle_arrays(...).select(explode(...)).
    """
    return _shingle_base(docs, n).select(
        "doc_id", F.explode(_shingle_expr(n)).alias("s")
    )


def _fold_signature(k: int = _MH_K):
    """k-vector of minhashes folded over a ``shingles`` array column:
    one pass over the shingles, k xxhash64 per element, elementwise
    least() into the accumulator. As a projection over an already-
    aggregated per-doc row this is ~5× cheaper than a second groupBy
    re-hashing the exploded shingle rows (measured 0.15s vs 0.74s at
    sf0.1)."""
    # one F.expr parse (round 14): the Column-API form (k lits + k
    # xxhash64 + the HOF lambdas) cost ~0.3s of py4j round trips per
    # invocation; the parsed tree — and the signature values — are
    # identical (integer literals are INT like F.lit(i) was, the L
    # suffix pins the init array to BIGINT like the .cast("long") did).
    max_long = (1 << 63) - 1
    init = ", ".join([f"{max_long}L"] * k)
    hashes = ", ".join(f"xxhash64({i}, s)" for i in range(k))
    return F.expr(
        f"aggregate(shingles, array({init}), "
        f"(acc, s) -> zip_with(acc, array({hashes}), (x, y) -> least(x, y)))"
    )


def minhash_signatures(docs: DataFrame, k: int = _MH_K) -> DataFrame:
    """doc_id + k-vector of minhashes over 3-token shingles.

    Fully NARROW: per-doc shingle arrays (shingle_arrays — no shuffle)
    with the k minhashes folded as a projection (_fold_signature).
    Docs with fewer than 3 tokens have no shingles and no output row.
    """
    return shingle_arrays(docs).select(
        "doc_id", _fold_signature(k).alias("sig")
    )


@register(
    "dedup_minhash_lsh",
    oracle=None,
    headline=True,
    # perf bound (round-12 judge item 1): no SQL oracle can reproduce
    # xxHash signatures, but the portable twin runs the identical
    # collapse-first → shingle → k-min fold → band → capped-bucket →
    # exact-verify pipeline with arithmetic hashes — its DuckDB side
    # is the honest 2×-gate denominator for this head.
    proxy_oracle="dedup_minhash_portable",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup edges via exact-collapse + MinHash-LSH; columns
    (doc_a, doc_b, jaccard_shingles).

    Output contract (the production cluster-certificate shape): star
    edges (rep, member, 1.0) for every exact-duplicate member — full
    recall at ANY duplicate multiplicity, see _collapse_exact — plus
    verified near-dup pairs BETWEEN representatives. The connected
    components of the edge set are the dup clusters; the all-pairs
    clique (quadratic under duplication) is recoverable by closure and
    deliberately not materialized."""
    all_docs = load_table(spark, sf_dir, "documents")
    docs, star = _collapse_exact(all_docs)  # shingle_rows spreads
    # ZERO shuffles on the signature side: the per-doc shingle arrays
    # are a narrow projection (shingle_arrays, spread=False — the
    # collapse window's exchange already distributed the reps, so the
    # round-robin hedge would be a pure extra shuffle), consumed by the
    # signature fold AND both exact-verify sides. Cached only past the
    # measured size crossover (_MINHASH_CACHE_MIN_BYTES — same barrier-
    # vs-recompute tradeoff as the jaccard token cache; the minhash
    # crossover is LOWER because shingle recompute costs ~3× token
    # recompute per doc). Cache lifetime when taken: released by the
    # catalog.clearCache() the harness runs between registry entries
    # (profile_registry.py / driver); callers embedding this in a
    # longer session should unpersist after materializing.
    sets = shingle_arrays(docs, spread=False)
    # ONE metadata listing feeds both size gates (cache + verify
    # broadcast), mirroring _jaccard_scored_pairs
    doc_bytes = table_file_bytes(spark, sf_dir, "documents")
    if doc_bytes >= _MINHASH_CACHE_MIN_BYTES:
        sets = sets.cache()
    sigs = sets.select("doc_id", _fold_signature().alias("sig"))
    # band bucket = hash of the band's slice of the signature vector —
    # pure projection, no second aggregation. Built as one F.expr
    # (round 14): the nested struct/xxhash64 listcomp was ~0.5s of py4j
    # round trips per invocation; named_struct parses to the identical
    # struct(band, bucket) the aliased F.struct built.
    structs = ", ".join(
        "named_struct('band', {b}, 'bucket', xxhash64({cols}))".format(
            b=b,
            cols=", ".join(
                f"sig[{b * _MH_ROWS + r}]" for r in range(_MH_ROWS)
            ),
        )
        for b in range(_MH_BANDS)
    )
    bands = sigs.selectExpr(
        "doc_id", f"explode(array({structs})) AS bb"
    ).selectExpr("doc_id", "bb.band", "bb.bucket")
    # candidate pairs per (band, bucket) with the same bounded-membership
    # pattern as the jaccard posting lists: a bucket holding m co-hashed
    # docs would otherwise emit m² pairs — quadratic in co-bucket
    # multiplicity (measured 7.6×/decade at @x100 pre-collapse, vs ≤1.7×
    # for the capped plans). Cap via row_number, collect the ≤CAP
    # doc_ids per bucket in the SAME exchange, pair-gen by double-
    # explode of the bounded arrays — no self-join shuffle, ≤ CAP²/2
    # pairs per bucket by construction. Recall note: exact twins never
    # reach these buckets (collapsed upstream into star edges — full
    # recall at any multiplicity); the cap binds only on ≥CAP DISTINCT
    # texts sharing a band signature, and a rep past the cap in one
    # bucket still candidates through its other _MH_BANDS-1 bands.
    cand = _capped_bucket_pairs(bands, ["band", "bucket"], _LSH_BUCKET_CAP)
    # verification: exact shingle-set Jaccard from the cached per-doc
    # sets, joined in by doc_id (AQE broadcasts the small candidate
    # side at this scale; sort-merge by doc_id at cluster scale)
    sh_a = sets.selectExpr("doc_id AS doc_a", "shingles AS sh_a")
    sh_b = sets.selectExpr("doc_id AS doc_b", "shingles AS sh_b")
    # size-gated broadcast of the verify arrays — the exact
    # _jaccard_scored_pairs pattern and gate (round 15): while the
    # documents table is small enough that the per-doc shingle arrays
    # fit an executor, both verify joins are map-side over the
    # candidate stream (interleaved A/B at sf0.1: best 0.76 vs 0.99,
    # 7 -> 6 AQE jobs; @x10: 1.09 vs 1.22 — outputs identical both
    # scales); past the gate the plan falls back to shuffle joins
    # keyed on doc_id, bounded by the capped candidate count.
    if doc_bytes <= _JACCARD_BC_MAX_BYTES:
        sh_a, sh_b = F.broadcast(sh_a), F.broadcast(sh_b)
    # string-twin verify expressions (round 15, same discipline as the
    # round-14 conversions): identical parsed trees — the Column form
    # bound `inter` once in Python but spliced the SAME subtree into
    # both consumers, which is exactly what the repeated text does
    inter = "size(array_intersect(sh_a, sh_b))"
    jac = f"CAST({inter} AS DOUBLE) / ((size(sh_a) + size(sh_b)) - {inter})"
    pairs = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .selectExpr("*", f"{spark_hround(jac)} AS jaccard_shingles")
        .filter(f"jaccard_shingles >= {_MH_VERIFY_T}D")
        .selectExpr("doc_a", "doc_b", "jaccard_shingles")
    )
    # star edges carry jaccard 1.0 BY DEFINITION (identical text ⟹
    # identical shingle set) — no verify join needed, and <3-token docs
    # (which have no shingles and can't enter LSH) are still covered
    return pairs.unionByName(
        star.selectExpr("*", "1.0D AS jaccard_shingles")
    )


# --- SimHash near-dup (scale path; rows-only + pytest golden) ----------------
# 62-bit simhash folded with HOFs (aggregate/zip_with) — no explode, no
# UDF. Candidates share one of four 16-bit chunks; by pigeonhole, any
# pair within hamming distance 3 MUST collide in some chunk, so the
# verify threshold is 3 (a higher advertised radius would silently miss
# pairs whose differing bits spread across all four chunks; raise
# _SH_CHUNKS to k+1 to widen the guaranteed radius to k).

_SH_BITS = 62
_SH_CHUNKS = 4


def _token_bits(t):
    """±1 bit vector of a token's 64-bit hash (bit positions unrolled in
    Python — F.shiftright needs a literal shift amount)."""
    h = F.xxhash64(t)
    return F.array(
        *[
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            for j in range(_SH_BITS)
        ]
    )


def bitvec_expr():
    toks = F.array_distinct(F.split("text", " "))
    return F.aggregate(
        toks,
        F.array_repeat(F.lit(0), _SH_BITS),
        lambda acc, t: F.zip_with(acc, _token_bits(t), lambda x, y: x + y),
    )


def simhash_df(docs: DataFrame) -> DataFrame:
    """doc_id + 62-bit simhash. Two projection steps so the expensive
    fold is evaluated once, not per sign-bit."""
    bv = docs.select("doc_id", bitvec_expr().alias("bv"))
    signature = F.aggregate(
        F.zip_with(
            F.col("bv"),
            # powers of two, position-aligned with the bit vector
            F.array(*[F.lit(1 << j).cast("long") for j in range(_SH_BITS)]),
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return bv.select("doc_id", signature.alias("simhash"))


@register("dedup_simhash", oracle=None)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup edges via exact-collapse + SimHash banding;
    (doc_a, doc_b, hamming).

    Same cluster-certificate contract as dedup_minhash_lsh: star edges
    (rep, member, hamming=0 — identical text ⟹ identical signature)
    for exact-duplicate members, plus banded near-dup pairs between
    representatives. The hamming≤3 guaranteed-recall radius therefore
    holds between DISTINCT texts regardless of duplicate multiplicity —
    exact twins never compete for bucket-cap slots."""
    # 62 hashes/token + chunk-join pair-gen: core-bound, not split-bound
    reps, star = _collapse_exact(load_table(spark, sf_dir, "documents"))
    docs = spread_to_cores(reps)
    # cached: the 62-hash fold feeds the chunk explode AND both hamming
    # verify sides (lifetime: the harness's clearCache between entries)
    sh = simhash_df(docs).cache()
    chunk_w = 16
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * chunk_w)
                        .bitwiseAND(F.lit((1 << chunk_w) - 1))
                        .alias("val"),
                    )
                    for c in range(_SH_CHUNKS)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "cc.chunk", "cc.val")
    # bounded pair-gen per 16-bit chunk bucket (same membership-cap
    # pattern as the minhash bands — an exact-dup-heavy bucket would
    # otherwise pair quadratically); signatures joined back by doc_id
    # for the hamming verify
    cand = _capped_bucket_pairs(chunks, ["chunk", "val"])
    cand = cand.join(
        sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a")),
        "doc_a",
    ).join(
        sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b")),
        "doc_b",
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    pairs = (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= _SH_CHUNKS - 1)  # guaranteed-recall radius
        # one row per pair even if doc_ids repeat in the corpus (the
        # signature join-back would otherwise multiply each pair by the
        # duplication factor squared); signatures of identical docs are
        # identical, so any survivor is the same row
        .dropDuplicates(["doc_a", "doc_b"])
        .select("doc_a", "doc_b", "hamming")
    )
    return pairs.unionByName(star.withColumn("hamming", F.lit(0)))


# --- MinHash-LSH, portable-hash variant (fully oracle-verified) --------------
# Same banding pipeline as dedup_minhash_lsh, but every hash is plain
# integer arithmetic both engines can replay: token code from
# (first char, last char, length), shingle code via a mod-P polynomial
# over the three token codes, K affine minhash permutations, and an
# order-independent weighted-sum band signature. xxhash64 stays the
# production path (JVM-speed, better dispersion); this twin proves the
# LSH *algorithm* end-to-end against the oracle rather than rows-only.

_PMH_P = 2147483647  # 2^31 - 1
_PMH_B = 1000003
_PMH_BANDMULT = (1, 131, 17161, 2248091)  # 131^pos, pos = k % 4


def _portable_token_code(t):
    return (
        F.ascii(F.substring(t, 1, 1)) * 8191
        + F.ascii(t.substr(F.length(t), F.lit(1))) * 131
        + F.length(t)
    ).cast("long")


_PMH_ORACLE_CODE = (
    "(ascii(substr({t}, 1, 1)) * 8191"
    " + ascii(substr({t}, length({t}), 1)) * 131 + length({t}))"
)


def _portable_minhash_cte_prefix(source: str = "documents") -> str:
    """Shared oracle CTE chain ``toks → sh → sig → bands`` (shingle
    codes, affine-permutation minima, banded signatures) over
    ``source`` — the collapsed ``docs`` reps for the full-corpus pair
    query, the raw ``documents`` table for the incremental
    new-vs-corpus query (whose batch/corpus split is by doc_id)."""
    c1 = _PMH_ORACLE_CODE.format(t="L[i]")
    c2 = _PMH_ORACLE_CODE.format(t="L[i+1]")
    c3 = _PMH_ORACLE_CODE.format(t="L[i+2]")
    return f"""toks AS (
  SELECT doc_id, string_split(text, ' ') AS L FROM {source}
),
sh AS (
  SELECT DISTINCT doc_id,
         ((({c1} * {_PMH_B} + {c2}) % {_PMH_P}) * {_PMH_B} + {c3}) % {_PMH_P} AS h
  FROM (
    SELECT doc_id, L,
           UNNEST(generate_series(1, greatest(len(L) - 2, 0))) AS i
    FROM toks
  )
),
sig AS (
  SELECT doc_id, k,
         MIN(((2 * k + 1) * h + k * k + 17) % {_PMH_P}) AS mh
  FROM sh CROSS JOIN (SELECT UNNEST(generate_series(0, {_MH_K - 1})) AS k) ks
  GROUP BY doc_id, k
),
bands AS (
  SELECT doc_id, k // {_MH_ROWS} AS band,
         SUM(mh * CASE k % {_MH_ROWS}
               WHEN 0 THEN {_PMH_BANDMULT[0]} WHEN 1 THEN {_PMH_BANDMULT[1]}
               WHEN 2 THEN {_PMH_BANDMULT[2]} ELSE {_PMH_BANDMULT[3]} END) AS band_sig
  FROM sig GROUP BY doc_id, k // {_MH_ROWS}
)"""


def _portable_minhash_oracle() -> str:
    # collapse-first mirror: the signature pipeline runs over the
    # distinct-text reps (docs CTE), star edges union in at jaccard 1.0;
    # capped AS ... mirrors _capped_bucket_pairs verbatim: pairs only
    # among the first-_LSH_BUCKET_CAP reps (by doc_id) of each bucket
    return f"""
WITH {_COLLAPSE_CTE},
{_portable_minhash_cte_prefix("docs")},
capped AS (
  SELECT doc_id, band, band_sig,
         ROW_NUMBER() OVER (PARTITION BY band, band_sig ORDER BY doc_id) AS rn
  FROM bands
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a
  JOIN capped b ON a.band = b.band AND a.band_sig = b.band_sig
              AND a.doc_id < b.doc_id
  WHERE a.rn <= {_LSH_BUCKET_CAP} AND b.rn <= {_LSH_BUCKET_CAP}
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS ni
  FROM cand c
  JOIN sh x ON x.doc_id = c.doc_a
  JOIN sh y ON y.doc_id = c.doc_b AND y.h = x.h
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       FLOOR(CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) * 1000000.0 + 0.5) / 1000000.0 AS jaccard_shingles
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= {_MH_VERIFY_T}
UNION ALL
SELECT doc_a, doc_b, 1.0 AS jaccard_shingles FROM star_edges
"""


def _portable_minhash_tables(
    docs: DataFrame, cache: bool = True, spread: bool = True
) -> tuple[DataFrame, DataFrame]:
    # Same narrow shape as dedup_minhash_lsh: per-doc distinct shingle-
    # CODE arrays built with a transform over the token array bound
    # ONCE as a HOF lambda variable (round-13 rework — same single-
    # binding trick as shingle_arrays, so element access is O(1) with
    # no exchange needed as a CollapseProject barrier), signatures
    # folded as a projection, band buckets pure arithmetic. The cached
    # code arrays feed the fold AND both exact-verify sides. Arithmetic
    # is identical to the oracle's: shingle code, affine permutations,
    # 131^pos band mix. Cache lifetime: released by the harness's
    # clearCache between registry entries — callers that OWN their
    # lifetime (build/append unpersist; the store probe runs inside a
    # long-lived streaming loop where a per-batch cache would leak)
    # pass cache=False or unpersist explicitly. Uncached, sh recomputes
    # per consumer — a map-only projection over the batch, no shuffle
    # to repeat. ``spread``: parallelism hedge only (see
    # shingle_arrays) — post-collapse callers pass False.
    toked = docs.select("doc_id", "text").filter(
        F.size(F.split("text", " ")) >= 3
    )
    if spread:
        toked = spread_to_cores(toked)

    def mk(tk):
        def code_at(i):
            return _portable_token_code(F.element_at(tk, i))

        def shcode(i):
            return (
                (code_at(i) * _PMH_B + code_at(i + 1)) % _PMH_P * _PMH_B
                + code_at(i + 2)
            ) % _PMH_P

        return F.array_distinct(
            F.transform(F.sequence(F.lit(1), F.size(tk) - 2), shcode)
        )

    arr = F.get(F.transform(F.array(F.split("text", " ")), mk), 0)
    sh = toked.select("doc_id", arr.alias("hs"))
    if cache:
        sh = sh.cache()
    # k affine-permutation mins folded in ONE pass over the code array
    # (permutation values are < _PMH_P, so _PMH_P is +infinity here)
    init = F.array(*[F.lit(_PMH_P).cast("long")] * _MH_K)
    sig = F.aggregate(
        "hs",
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[((2 * k + 1) * h + (k * k + 17)) % _PMH_P for k in range(_MH_K)]
            ),
            lambda x, y: F.least(x, y),
        ),
    )
    mins = sh.select("doc_id", sig.alias("sig"))
    band_structs = []
    for band in range(_MH_BANDS):
        sig_expr = F.lit(0).cast("long")
        for j in range(_MH_ROWS):
            sig_expr = sig_expr + F.col("sig")[band * _MH_ROWS + j] * _PMH_BANDMULT[j]
        band_structs.append(
            F.struct(
                F.lit(band).cast("long").alias("band"),
                sig_expr.alias("band_sig"),
            )
        )
    bands = mins.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.band_sig").alias("band_sig"))
    return sh, bands


@register("dedup_minhash_portable", oracle=_portable_minhash_oracle())
def dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-exact twin of dedup_minhash_lsh — same collapse-first
    cluster-certificate contract (star edges at jaccard 1.0 + verified
    rep-level near-dup pairs), portable arithmetic hashes."""
    reps, star = _collapse_exact(load_table(spark, sf_dir, "documents"))
    sh, bands = _portable_minhash_tables(
        reps,
        # same size-gated cache + no-spread as the fast path (the
        # collapse exchange already distributed the reps)
        cache=table_file_bytes(spark, sf_dir, "documents")
        >= _MINHASH_CACHE_MIN_BYTES,
        spread=False,
    )
    # bounded pair-gen per band bucket, cap mirrored verbatim in the
    # oracle's `capped` CTE
    cand = _capped_bucket_pairs(bands, ["band", "band_sig"])
    # exact verify: band candidates are few, so array_intersect over the
    # cached per-doc code arrays (joined in by doc_id) replaces the
    # explode + count-group over code rows
    ha = sh.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("h_a"))
    hb = sh.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("h_b"))
    ni = F.size(F.array_intersect("h_a", "h_b"))
    jac = ni.cast("double") / (F.size("h_a") + F.size("h_b") - ni)
    pairs = (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .filter(jac >= _MH_VERIFY_T)
        .select("doc_a", "doc_b", hround(jac).alias("jaccard_shingles"))
    )
    return pairs.unionByName(star.withColumn("jaccard_shingles", F.lit(1.0)))


# --- incremental minhash dedup: new batch vs existing corpus -----------------
# The PRODUCTION shape of near-dup dedup: a crawl lands as a small new
# batch and is checked against the (much larger) already-ingested
# corpus — nobody re-pairs the whole corpus per ingest. Here the "new"
# batch is the deterministic 5% hash split (the same multiplicative
# hash the split/curation operators use) and the corpus is the rest;
# both sides reuse the portable banded-signature pipeline, so the
# candidate join is new-bands × corpus-bands on (band, band_sig) — cost
# proportional to the BATCH, not the corpus, once corpus signatures are
# stored. The persisted form EXISTS as a first-class op:
# operators/dedup_store.py::build_signature_store /
# probe_signature_store (probe ≡ this query, pytest-pinned; probe cost
# measured flat across x1/x10/x100 corpus growth). Computing the
# corpus side inline here keeps the query self-contained for the
# oracle harness. Verify = exact shingle-code jaccard, as the
# full-corpus variant.

_INC_NEW_PCT = 95  # hash bucket >= this → "new batch" (5%)


def _inc_minhash_oracle() -> str:
    # same split hash as operators/scaleops.py (Knuth multiplicative)
    split = f"{oracle_knuth_hash('doc_id')} % 100"
    return f"""
WITH {_portable_minhash_cte_prefix()},
corpus AS (
  -- corpus-side membership cap per bucket (mirrors the Spark window):
  -- a hot bucket (boilerplate signature shared by millions of stored
  -- docs) would otherwise fan every probing batch doc out by the full
  -- bucket size
  SELECT doc_id, band, band_sig,
         ROW_NUMBER() OVER (PARTITION BY band, band_sig ORDER BY doc_id) AS rn
  FROM bands
  WHERE ({split}) < {_INC_NEW_PCT}
),
cand AS (
  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
  FROM bands n
  JOIN corpus o ON n.band = o.band AND n.band_sig = o.band_sig
  WHERE ({split.replace('doc_id', 'n.doc_id')}) >= {_INC_NEW_PCT}
    AND o.rn <= {_LSH_BUCKET_CAP}
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.new_id, c.old_id, COUNT(*) AS ni
  FROM cand c
  JOIN sh x ON x.doc_id = c.new_id
  JOIN sh y ON y.doc_id = c.old_id AND y.h = x.h
  GROUP BY c.new_id, c.old_id
)
SELECT i.new_id, i.old_id,
       FLOOR(CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) * 1000000.0 + 0.5) / 1000000.0 AS jaccard_shingles
FROM inter i
JOIN sizes sa ON sa.doc_id = i.new_id
JOIN sizes sb ON sb.doc_id = i.old_id
WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= {_MH_VERIFY_T}
"""


@register("dedup_incremental_minhash", oracle=_inc_minhash_oracle())
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(new_id, old_id, jaccard_shingles) — new-batch docs near-duplicating
    an existing-corpus doc. Candidates from the banded signature join
    (new side small by construction → AQE broadcasts it; the corpus
    side never self-joins), verify from the cached per-doc code arrays."""
    from pyspark.sql import Window

    sh, bands = _portable_minhash_tables(load_table(spark, sf_dir, "documents"))
    bucket = knuth_hash("doc_id") % 100
    new_b = bands.filter(bucket >= _INC_NEW_PCT)
    # corpus-side membership cap per (band, band_sig) — a hot bucket
    # (boilerplate signature shared by millions of stored docs) would
    # otherwise fan every probing batch doc out by the full bucket
    # size; mirrored in the oracle's `corpus` CTE. The batch side stays
    # uncapped: its size IS the cost budget.
    old_b = cap_per_group(
        bands.filter(bucket < _INC_NEW_PCT),
        ["band", "band_sig"],
        "doc_id",
        _LSH_BUCKET_CAP,
    )
    cand = (
        new_b.alias("n")
        .join(
            old_b.alias("o"),
            (F.col("n.band") == F.col("o.band"))
            & (F.col("n.band_sig") == F.col("o.band_sig")),
        )
        .select(
            F.col("n.doc_id").alias("new_id"), F.col("o.doc_id").alias("old_id")
        )
        .dropDuplicates(["new_id", "old_id"])
    )
    ha = sh.select(F.col("doc_id").alias("new_id"), F.col("hs").alias("h_a"))
    hb = sh.select(F.col("doc_id").alias("old_id"), F.col("hs").alias("h_b"))
    ni = F.size(F.array_intersect("h_a", "h_b"))
    jac = ni.cast("double") / (F.size("h_a") + F.size("h_b") - ni)
    return (
        cand.join(ha, "new_id")
        .join(hb, "old_id")
        .filter(jac >= _MH_VERIFY_T)
        .select("new_id", "old_id", hround(jac).alias("jaccard_shingles"))
    )


# --- SimHash, portable-hash variant (fully oracle-verified) ------------------
# Same 62-bit vote/sign pipeline + 16-bit chunk banding + hamming verify
# as dedup_simhash, with the token hash as a multiplicative arithmetic
# mix both engines replay (xxhash64 stays the production path). Bit j of
# a non-negative LONG is (h // 2^j) % 2 — floor-div on both sides.

_PSH_M31 = 2147483648  # 2^31
_PSH_K1 = 2654435761
_PSH_K2 = 98765431


def _mix31(x, k):
    # xorshift-multiply avalanche in 31-bit space: every product stays
    # under 2^62 (int64-safe) and each output bit depends on many input
    # bits — a bare multiplicative mix leaves bit patterns correlated
    # across a small vocabulary, which inflates the hamming<=3 tail
    x = x % _PSH_M31
    x = x.bitwiseXOR(F.shiftright(x, 13))
    x = (x * k) % _PSH_M31
    return x.bitwiseXOR(F.shiftright(x, 17))


def _portable_token_hash(t):
    # low and high 31-bit halves from independently-keyed avalanches
    code = _portable_token_code(t)
    return _mix31(code, _PSH_K1) + _mix31(code * 31 + 7, _PSH_K2) * _PSH_M31


def _psh_bits_of_hash(h):
    # h is a lambda VARIABLE here — the avalanche runs once per token;
    # inlining it would re-evaluate the whole mix per bit (62x/token)
    return F.array(
        *[
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            for j in range(_SH_BITS)
        ]
    )


def _portable_simhash_cte() -> str:
    """Oracle CTE prefix through ``cand`` (deduped banded candidate
    pairs carrying both signatures) — shared by the pair oracle and the
    threshold-curve oracle so the candidate pipeline can never drift
    between them."""
    code = _PMH_ORACLE_CODE.format(t="t")
    def mix31(x: str, k: int) -> str:
        a = f"(({x}) % {_PSH_M31})"
        b = f"xor({a}, {a} // 8192)"
        c = f"(({b} * {k}) % {_PSH_M31})"
        return f"xor({c}, {c} // 131072)"

    h = f"({mix31(code, _PSH_K1)} + {mix31(f'{code} * 31 + 7', _PSH_K2)} * {_PSH_M31})"
    pows = "[" + ", ".join(str(1 << j) + "::BIGINT" for j in range(_SH_BITS)) + "]"
    bits = (
        f"list_transform({pows}, p -> CASE WHEN (h // p) % 2 = 1"
        " THEN 1 ELSE -1 END)"
    )
    zeros = "[" + ", ".join("0" for _ in range(_SH_BITS)) + "]"
    chunk_w = 16
    chunk_exprs = ", ".join(
        f"(simhash // {1 << (c * chunk_w)}) % {1 << chunk_w}" for c in range(_SH_CHUNKS)
    )
    return f"""
WITH {_COLLAPSE_CTE},
votes AS (
  SELECT doc_id,
         list_reduce(
           list_prepend({zeros},
             list_transform(
               list_transform(list_distinct(string_split(text, ' ')),
                              t -> {h}),
               h -> {bits})),
           (acc, x) -> list_transform(list_zip(acc, x), p -> p[1] + p[2])
         ) AS bv
  FROM docs
),
sigs AS (
  SELECT doc_id,
         list_reduce(
           list_prepend(0::BIGINT,
             list_transform(list_zip(bv, {pows}),
                            p -> CASE WHEN p[1] > 0 THEN p[2] ELSE 0::BIGINT END)),
           (acc, x) -> acc + x
         ) AS simhash
  FROM votes
),
chunks AS (
  SELECT doc_id, simhash,
         UNNEST(generate_series(0, {_SH_CHUNKS - 1})) AS chunk,
         UNNEST([{chunk_exprs}]) AS val
  FROM sigs
),
capped AS (
  SELECT doc_id, simhash, chunk, val,
         ROW_NUMBER() OVER (PARTITION BY chunk, val ORDER BY doc_id) AS rn
  FROM chunks
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM capped a
  JOIN capped b ON a.chunk = b.chunk AND a.val = b.val
              AND a.doc_id < b.doc_id
  WHERE a.rn <= {_LSH_BUCKET_CAP} AND b.rn <= {_LSH_BUCKET_CAP}
)"""


def _portable_simhash_oracle() -> str:
    return f"""
{_portable_simhash_cte()}
SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(sh_a, sh_b)) <= {_SH_CHUNKS - 1}
UNION ALL
SELECT doc_a, doc_b, CAST(0 AS INTEGER) AS hamming FROM star_edges
"""


def _portable_simhash_scored(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(scored, star): all deduped banded candidate pairs with their
    hamming distance (UNfiltered — the radius cut is the caller's), plus
    the exact-collapse star edges. Shared by the portable pair op and
    the threshold curve, mirroring the oracle's shared ``cand`` CTE."""
    reps, star = _collapse_exact(load_table(spark, sf_dir, "documents"))
    docs = spread_to_cores(reps)
    toks = F.array_distinct(F.split("text", " "))
    hashes = F.transform(toks, lambda t: _portable_token_hash(t))
    bv = docs.select(
        "doc_id",
        F.aggregate(
            hashes,
            F.array_repeat(F.lit(0), _SH_BITS),
            lambda acc, h: F.zip_with(acc, _psh_bits_of_hash(h), lambda x, y: x + y),
        ).alias("bv"),
    )
    signature = F.aggregate(
        F.zip_with(
            F.col("bv"),
            F.array(*[F.lit(1 << j).cast("long") for j in range(_SH_BITS)]),
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # cached: the 62-bit vote fold feeds the chunk explode AND both
    # hamming verify sides (lifetime: harness clearCache between entries)
    sh = bv.select("doc_id", signature.alias("simhash")).cache()
    chunk_w = 16
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * chunk_w)
                        .bitwiseAND(F.lit((1 << chunk_w) - 1))
                        .alias("val"),
                    )
                    for c in range(_SH_CHUNKS)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "cc.chunk", "cc.val")
    # bounded pair-gen per chunk bucket (cap mirrored in the oracle's
    # `capped` CTE); signatures joined back by doc_id for the verify
    cand = _capped_bucket_pairs(chunks, ["chunk", "val"])
    cand = cand.join(
        sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a")),
        "doc_a",
    ).join(
        sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b")),
        "doc_b",
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    scored = (
        cand.withColumn("hamming", hamming)
        # one row per pair under doc_id duplication — mirrors the
        # oracle's DISTINCT cand (see dedup_simhash for the rationale)
        .dropDuplicates(["doc_a", "doc_b"])
        .select("doc_a", "doc_b", "hamming")
    )
    return scored, star


@register("dedup_simhash_portable", oracle=_portable_simhash_oracle())
def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-exact twin of dedup_simhash — same collapse-first
    cluster-certificate contract (star edges at hamming 0 + banded
    rep-level pairs), portable arithmetic hashes;
    (doc_a, doc_b, hamming)."""
    scored, star = _portable_simhash_scored(spark, sf_dir)
    pairs = scored.filter(F.col("hamming") <= _SH_CHUNKS - 1)
    return pairs.unionByName(
        star.withColumn("hamming", F.lit(0).cast("int"))
    )


# --- simhash threshold-tuning curve -------------------------------------------
# The hamming twin of dedup_jaccard_threshold_curve: how you PICK the
# verify radius on a real corpus — the hamming-distance histogram over
# every banded candidate (NOT just those inside the current radius; the
# whole point is seeing the mass beyond it). Same tuning-signal
# posture: rep-level by construction (exact twins collapse upstream, so
# a dup-heavy corpus can't bury the near-dup valley under a hamming-0
# spike), bounded by the same bucket caps the pair query pays.


@register(
    "dedup_simhash_threshold_curve",
    oracle=f"""
{_portable_simhash_cte()}
SELECT CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming,
       COUNT(*) AS n_pairs
FROM cand
GROUP BY 1
""",
)
def dedup_simhash_threshold_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    scored, _ = _portable_simhash_scored(spark, sf_dir)
    return (
        scored.select(F.col("hamming").cast("long").alias("hamming"))
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --- edit-distance near-dup: closest pair per block --------------------------
# Levenshtein is O(len^2) per pair and all-pairs is O(n^2) per corpus —
# neither survives 100 TB unblocked. Standard posture: compare only
# inside a blocking cell (same lang + same length bucket — near-dups
# rarely differ much in length), and bound the per-pair cost by
# comparing a fixed-length prefix. Emitting the closest pair per cell
# keeps the output deterministic and non-degenerate regardless of the
# corpus's true dup density. Built-in F.levenshtein — JVM-side, no UDF.
#
# MEMBERSHIP CAP: the blocking key (lang, len_bucket) has FIXED
# cardinality, so uncapped block membership grows linearly with the
# corpus and pair-gen grows quadratically (the @x10 sweep measured 31×,
# EXPLAINS.md). Same medicine as the jaccard posting cap: only the
# first ``_LEV_MEMBER_CAP`` docs (deterministic row_number by doc_id)
# of each cell enter pair generation, bounding pairs at
# cells × CAP² — constant per cell at any corpus scale. The DuckDB
# oracle applies the IDENTICAL cap, so both engines agree at any scale
# by construction. Tradeoff: the reported closest pair is the closest
# among the cell's first CAP docs — the documented sampling posture for
# a diagnostics-style operator (production near-dup goes through the
# MinHash-LSH / jaccard paths, which scale by banding, not sampling).

_LEV_PREFIX = 48  # chars compared per doc (bounds per-pair cost)
_LEV_BUCKET = 64  # n_chars per length bucket (blocking granularity)
_LEV_MEMBER_CAP = 128  # docs per cell entering pair-gen (bounds pairs/cell)


@register(
    "dedup_levenshtein_blocked",
    oracle=f"""
WITH d0 AS (
  -- ASCII projection of the prefix: Spark's levenshtein counts
  -- CODEPOINTS while DuckDB's counts UTF-8 BYTES ('héllo'→'hello' is
  -- 1 vs 2), so both engines compare the ASCII-projected prefix —
  -- identical on ASCII corpora, deterministic and agreed on any other
  -- (tests/test_editdist_semantics.py pins the matrix)
  SELECT doc_id, lang,
         CAST(FLOOR(n_chars / {_LEV_BUCKET}) AS BIGINT) AS len_bucket,
         regexp_replace(substr(text, 1, {_LEV_PREFIX}),
                        '[^\\x00-\\x7F]', '', 'g') AS prefix
  FROM documents
),
d AS (
  SELECT doc_id, lang, len_bucket, prefix FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY lang, len_bucket
                                 ORDER BY doc_id) AS rn
    FROM d0
  ) t WHERE rn <= {_LEV_MEMBER_CAP}
),
pairs AS (
  SELECT a.lang, a.len_bucket, a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_dist
  FROM d a JOIN d b
    ON a.lang = b.lang AND a.len_bucket = b.len_bucket
   AND a.doc_id < b.doc_id
)
SELECT lang, len_bucket, doc_a, doc_b, edit_dist FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY lang, len_bucket
    ORDER BY edit_dist, doc_a, doc_b) AS rk
  FROM pairs
) t WHERE rk = 1
""",
)
def dedup_levenshtein_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / _LEV_BUCKET).cast("long").alias("len_bucket"),
        # ASCII projection — see the oracle's d0 comment (codepoint- vs
        # byte-counting levenshtein drift on non-ASCII text)
        F.regexp_replace(
            F.substring("text", 1, _LEV_PREFIX), "[^\\x00-\\x7F]", ""
        ).alias("prefix"),
    )
    # membership cap (see header comment): deterministic first CAP docs
    # per cell — bounds pair-gen at cells × CAP² regardless of corpus size
    capped = cap_per_group(docs, ["lang", "len_bucket"], "doc_id", _LEV_MEMBER_CAP)
    # pair-gen amplifies work by block-size² — spread the capped rows so
    # the probe side isn't bound to the cap window's (low-cardinality)
    # output partitioning
    capped = spread_to_cores(capped)
    a, b = capped.alias("a"), capped.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.len_bucket") == F.col("b.len_bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.lang").alias("lang"),
        F.col("a.len_bucket").alias("len_bucket"),
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.levenshtein(F.col("a.prefix"), F.col("b.prefix"))
        .cast("long")
        .alias("edit_dist"),
    )
    w = Window.partitionBy("lang", "len_bucket").orderBy(
        "edit_dist", "doc_a", "doc_b"
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("lang", "len_bucket", "doc_a", "doc_b", "edit_dist")
    )


# --- quality-aware exact dedup (best-survivor selection) ---------------------
# Production corpus dedup keeps the BEST copy, not the first: survivor
# = argmax(quality) per exact text, ties to min doc_id. Same one-
# shuffle window plan as keep-first; only the ORDER BY changes. The
# quality signal reuses the curation formula so the two pipelines
# agree on what "best" means.


from .text import ORACLE_QUALITY_FORMULA as _OQF
from .text import oracle_quality_counts as _oqc


@register(
    "dedup_exact_best_quality",
    oracle=f"""
WITH t AS ({_oqc(", lang, text")}),
scored AS (
  SELECT doc_id, text, lang, ROUND({_OQF}, 6) AS quality FROM t
)
SELECT doc_id, lang, quality, n_copies FROM (
  SELECT doc_id, lang, quality,
         ROW_NUMBER() OVER (PARTITION BY text ORDER BY quality DESC, doc_id) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY text) AS BIGINT) AS n_copies
  FROM scored
) t WHERE rk = 1
""",
)
def dedup_exact_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .text import quality_expr

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "text", "lang", F.round(quality_expr(), 6).alias("quality")
    )
    w = Window.partitionBy("text").orderBy(F.col("quality").desc(), F.col("doc_id"))
    wc = Window.partitionBy("text")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(wc))
        .filter(F.col("rk") == 1)
        .select("doc_id", "lang", "quality", "n_copies")
    )


# --- recursive-CTE clustering over closest pairs (one SQL, two engines) ------
# Spark 4 ships WITH RECURSIVE; DuckDB always had it. This query is the
# proof the engine speaks PORTABLE SQL for iterative graph work: both
# engines run the SAME SQL fragments (composed below). Level-bounded
# min-label propagation over the sparse closest-pair edges (one edge per
# levenshtein block -> components are tiny stars/paths, so depth 4
# closes them and the UNION ALL path enumeration stays bounded).
#
# Materialization split: the recursive member references `edges` once
# per iteration. DuckDB's optimizer materializes a multiply-referenced
# CTE automatically; Spark INLINES it — and the recursion's per-level
# plan rewrite also defeats a .cache() (measured: ~15s/level at sf0.1
# even with the edge view cached and fully populated; 80s total).
# ``localCheckpoint`` truncates the lineage so the view is backed by a
# materialized RDD the recursion cannot re-derive: depth-4 recursion
# drops to ~2s. (On a durable cluster use ``checkpoint()`` with a
# checkpoint dir — same shape, executor-loss-safe.) Same SQL dialect,
# explicit materialization where Spark's planner lacks it.
#
# Known caveat (identical SQL ≠ identical semantics): levenshtein here
# counts CODEPOINTS on Spark and UTF-8 BYTES on DuckDB, so edge
# selection can differ on non-ASCII text. The main blocked operator
# aligns via an ASCII-projected prefix, but that projection has no
# cross-engine-identical spelling (DuckDB's global regexp_replace
# needs a 'g' flag; Spark's 4th argument is a position), and this
# query's purpose is the VERBATIM-shared recursive SQL — so the
# caveat is documented rather than forked. ASCII corpora (the test
# data) are unaffected; tests/test_editdist_semantics.py pins the
# divergence so an engine change is caught.

_REC_EDGES_BODY = f"""
d0 AS (
  SELECT doc_id, lang,
         CAST(FLOOR(n_chars / {_LEV_BUCKET}) AS BIGINT) AS len_bucket,
         substr(text, 1, {_LEV_PREFIX}) AS prefix
  FROM documents
),
d AS (
  -- same membership cap as dedup_levenshtein_blocked: pair-gen is
  -- bounded at cells x CAP^2 at any corpus scale (SQL shared verbatim
  -- by the Spark run and the DuckDB oracle, so both agree). The
  -- REPARTITION hint re-spreads the cap window's low-cardinality
  -- (lang, len_bucket) partitioning before the quadratic self-join —
  -- Spark-only; DuckDB parses it as a plain block comment.
  SELECT /*+ REPARTITION(32, doc_id) */ doc_id, lang, len_bucket, prefix
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY lang, len_bucket
                                 ORDER BY doc_id) AS rn
    FROM d0
  ) t WHERE rn <= {_LEV_MEMBER_CAP}
),
pairs AS (
  SELECT lang, len_bucket, doc_a, doc_b FROM (
    SELECT a.lang, a.len_bucket, a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROW_NUMBER() OVER (
             PARTITION BY a.lang, a.len_bucket
             ORDER BY levenshtein(a.prefix, b.prefix), a.doc_id, b.doc_id) AS rk
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket
     AND a.doc_id < b.doc_id
  ) t WHERE rk = 1
)"""

_REC_EDGES_SELECT = """
SELECT doc_a AS src, doc_b AS dst FROM pairs
UNION ALL
SELECT doc_b AS src, doc_a AS dst FROM pairs
"""

_REC_REACH_BODY = """
reach(node, label, lvl) AS (
  SELECT DISTINCT src, src, 0 FROM edges
  UNION ALL
  SELECT e.dst, r.label, r.lvl + 1
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.lvl < 4
)
SELECT node AS doc_id, CAST(MIN(label) AS BIGINT) AS cluster_id
FROM reach GROUP BY node
"""

_RECURSIVE_CLUSTER_SQL = (
    "WITH RECURSIVE "
    + _REC_EDGES_BODY
    + ",\nedges AS ("
    + _REC_EDGES_SELECT
    + "),\n"
    + _REC_REACH_BODY
)


@register("dedup_clusters_recursive_sql", oracle=_RECURSIVE_CLUSTER_SQL)
def dedup_clusters_recursive_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component labels via Spark 4 WITH RECURSIVE — a DEMO of
    the recursive-CTE surface beside the production clustering path
    (operators/clusters.py, iterative min-label with bounded rounds).
    Edge generation reuses the capped levenshtein blocking (pair-gen
    bounded at cells × CAP²), the edge set is materialized once via
    localCheckpoint (the recursion would otherwise re-execute it per
    level), and recursion depth is bounded at 4."""
    spread_to_cores(load_table(spark, sf_dir, "documents")).createOrReplaceTempView(
        "documents"
    )
    edges = spark.sql("WITH " + _REC_EDGES_BODY + _REC_EDGES_SELECT).localCheckpoint()
    edges.createOrReplaceTempView("edges")
    return spark.sql("WITH RECURSIVE " + _REC_REACH_BODY)


# --- duplication-rate QA rollup ----------------------------------------------
# The corpus-health dashboard query run before and after every dedup
# pass: per (lang, source) shard, how many docs, how many distinct
# texts, and what fraction of rows are redundant copies. One
# two-level aggregation — count_distinct carries the exact distinct
# count per shard; no pair generation anywhere.


@register(
    "dedup_rate_report",
    oracle="""
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT text) AS BIGINT) AS n_unique,
       FLOOR((1.0 - CAST(COUNT(DISTINCT text) AS DOUBLE) / COUNT(*))
             * 1000000.0 + 0.5) / 1000000.0 AS dup_rate
FROM documents
GROUP BY lang, source
""",
)
def dedup_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("text").alias("n_unique"),
        (
            F.floor(
                (
                    1.0
                    - F.count_distinct("text").cast("double")
                    / F.count(F.lit(1))
                )
                * 1_000_000.0
                + 0.5
            )
            / 1_000_000.0
        ).alias("dup_rate"),
    )
