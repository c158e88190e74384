"""IVF index build via mini k-means (iterative algorithm surface).

The scale path for similarity search is an inverted-file (IVF) index:
k-means centroids partition the corpus into cells; queries probe the
nearest cell(s) only. This module builds that index with Lloyd's
algorithm — the canonical ITERATIVE Spark workload shape:

- centroids ride along as ONE array column via a single-row broadcast
  join each iteration; distance is one generic higher-order-function
  expression (NOT k×dim unrolled literals — that bloats codegen into
  tens of seconds of compile time);
- assignment = transform + array_min over struct(d2, cell) — a pure
  map-side projection, no per-vector window and no n×k-row shuffle;
- centroid update = one aggregation with map-side partial sums;
- iteration count is fixed and small — at 100 TB run the iterations on
  a sample, then one final assignment pass over everything.

Deterministic: init = k-means++ D²-sampling with a fixed-seed RNG over
a hash-ordered bounded sample (kmeanspp_seed_rows; ``init="first"``
keeps the portable twin's first-k-by-vec_id seeding for the oracle
bridge); assignment ties break toward the lower cell id.
Non-SQL-expressible (driver records rows-only); pytest asserts
assignment optimality + search recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import as_double, cosine
from ..registry import register

_K = 8
_ITERS = 3
_DIM = 64


def _dist2(a, b):
    """Squared L2 distance between two array<double> columns (HOF fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment as a MAP-ONLY projection.

    The k centroids ride along as ONE array column via a single-row
    broadcast join (no row explosion), and the argmin is a generic
    transform + array_min over struct(d2, cell) — struct ordering gives
    exactly the (min distance, then lower cell) tie-break the previous
    window argmin used. This removes the n×k-row shuffle the
    broadcast-join + row_number shape paid per Lloyd iteration, with no
    per-centroid literal unrolling (which bloats codegen — see module
    docstring). sort_array pins the fold order so collect_list's
    nondeterministic ordering can't leak into results.
    """
    cs = cent.agg(
        F.sort_array(F.collect_list(F.struct("cell", "centroid"))).alias("_cs")
    )
    best = F.array_min(
        F.transform(
            "_cs",
            lambda c: F.struct(
                _dist2(F.col("e"), c["centroid"]).alias("d2"),
                c["cell"].alias("cell"),
            ),
        )
    )
    return (
        emb.join(F.broadcast(cs))
        .withColumn("_best", best)
        .select("vec_id", "e", F.col("_best.cell").alias("cell"))
    )


# bounded driver-side sample for k-means++ seeding: per-partition
# TakeOrdered by a deterministic hash of vec_id + driver merge — never
# a full sort, never corpus-sized. 4k keeps the sample proportional at
# large k; the floor keeps it representative at small k.
_SEED_SAMPLE_FLOOR = 2048


def kmeanspp_seed_rows(emb: DataFrame, k: int) -> list:
    """Deterministic k-means++ seeds: [(cell, [float]*dim)].

    First-k-by-vec_id seeding (the round-8 init) is quality-poor on
    skewed corpora — consecutive ids are often near-identical (same
    crawl shard), so several seeds land in one dense region and
    recall@nprobe=1 reflects it (measured 0.33 at sf0.1). Classic
    k-means++ D²-sampling fixes the spread; determinism (rerun-stable
    builds, the engine-wide contract) comes from (a) a hash-ordered
    bounded sample (knuth_hash of vec_id — decorrelated from ingest
    order, stable across runs/engines), (b) a fixed-seed RandomState
    for the D² draws. Driver cost: one TakeOrdered collect of
    max(4k, floor) vectors + k numpy passes over it — bytes, not data,
    same class as the Lloyd centroid round-trip.
    """
    import numpy as np

    from ..catalog import knuth_hash

    sample = (
        emb.select("vec_id", "e")
        .orderBy(knuth_hash("vec_id"), "vec_id")
        .limit(max(4 * k, _SEED_SAMPLE_FLOOR))
        .collect()
    )
    X = np.asarray([r["e"] for r in sample], dtype=np.float64)
    rs = np.random.RandomState(0)
    chosen = [0]  # first seed: the hash-order head (deterministic)
    d2 = ((X - X[0]) ** 2).sum(axis=1)
    while len(chosen) < min(k, len(X)):
        tot = d2.sum()
        if tot <= 0.0:
            # every remaining sample point coincides with a seed — pad
            # with the next unchosen index so callers still get k rows
            nxt = next((j for j in range(len(X)) if j not in chosen), None)
            if nxt is None:
                break
            chosen.append(nxt)
            continue
        j = int(rs.choice(len(X), p=d2 / tot))
        chosen.append(j)
        d2 = np.minimum(d2, ((X - X[j]) ** 2).sum(axis=1))
    return [(i, [float(x) for x in X[j]]) for i, j in enumerate(chosen)]


def _seed_rows(emb: DataFrame, k: int, init: str) -> list:
    if init == "kmeans++":
        return kmeanspp_seed_rows(emb, k)
    first = emb.orderBy("vec_id").limit(k).collect()
    return [(i, [float(x) for x in r["e"]]) for i, r in enumerate(first)]


def kmeans_centroids(
    emb: DataFrame,
    k: int = _K,
    iters: int = _ITERS,
    dim: int = _DIM,
    init: str = "kmeans++",
) -> DataFrame:
    """Lloyd's iterations; returns a (cell, centroid array<double>) DataFrame.

    Centroid state round-trips through the driver between iterations
    (k×dim doubles — bytes, not data), re-broadcast each pass.
    ``init``: "kmeans++" (default — see kmeanspp_seed_rows) or "first"
    (first k vectors by vec_id — the portable twin's documented init,
    kept for the oracle bridge)."""
    spark = emb.sparkSession
    rows = _seed_rows(emb, k, init)
    cent = spark.createDataFrame(rows, "cell int, centroid array<double>")
    for _ in range(iters):
        assigned = _assign(emb, cent)
        sums = assigned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.element_at("e", d + 1)).alias(f"s{d}") for d in range(dim)],
        )
        got = {r["cell"]: r for r in sums.collect()}
        rows = [
            (
                i,
                [got[i][f"s{d}"] / got[i]["n"] for d in range(dim)]
                if i in got
                else rows[i][1],  # empty cluster keeps its old centroid
            )
            for i in range(k)
        ]
        cent = spark.createDataFrame(rows, "cell int, centroid array<double>")
    return cent


def build_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cell) assignment table — the IVF index."""
    # cache: every Lloyd iteration re-derives emb's lineage otherwise
    # (k x dim math per row is trivial next to per-iteration re-scans).
    # Lifetime: released by the catalog.clearCache() the harness runs
    # between registry entries; longer-lived callers should unpersist
    # after materializing.
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    ).cache()
    cent = kmeans_centroids(emb)
    return _assign(emb, cent).select("vec_id", F.col("cell").cast("long").alias("cell"))


@register("simsearch_ivf_kmeans", oracle=None)
def simsearch_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed top-k: build cells, then search only the query's cell.

    Output (query_id, neighbor_id, cos_sim, rk) — same shape as the
    brute-force baseline; recall vs brute force asserted in pytest.
    """
    # cache: every Lloyd iteration re-derives emb's lineage otherwise
    # (k x dim math per row is trivial next to per-iteration re-scans).
    # Lifetime: released by the catalog.clearCache() the harness runs
    # between registry entries; longer-lived callers should unpersist
    # after materializing.
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    ).cache()
    cent = kmeans_centroids(emb)
    cells = _assign(emb, cent)
    # probe-set dedupe by key: a repeated/replicated probe must not
    # multiply the cell-scan work (the @x100 sweep read 17×/decade —
    # 100 probe replicas × 100× cell membership is quadratic under
    # duplication; kmeans itself decomposed to a linear 11.7s of the
    # 186s). Same guard as the brute-force kNN probe side.
    queries = (
        cells.filter(F.col("vec_id") < 8)
        .dropDuplicates(["vec_id"])
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("cell").alias("qcell"),
        )
    )
    cand = F.broadcast(queries).join(
        cells,
        (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qe"), F.col("e")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


# --- portable one-iteration IVF (oracle-replayable) --------------------------
# The oracle-verification twin of the kmeans build above, following the
# same playbook as dedup_minhash_portable / dedup_simhash_portable:
# make every arithmetic step engine-independent and let DuckDB replay
# the ALGORITHM end-to-end.
#
# - init: cells 0..k-1 = the first k vectors (exact float values);
# - assignment: squared-L2 as the shared left-fold — identical doubles
#   both engines, ties to the lower cell;
# - centroid update: per-dimension QUANTIZED-exact mean — doubles cast
#   to DECIMAL(20,12) (deterministic scale-12 quantization), summed
#   exactly (order-free), one double division, hround(6). Production
#   ANN quantizes centroids anyway; here quantization also buys
#   cross-engine bit-stability. Fully distributed — no driver collect
#   (the iterative fast path above round-trips k×dim floats by design;
#   this variant shows the shuffle-only formulation).
# - one Lloyd iteration, then the final assignment is the output.

_PK = 8


def _portable_assign(emb: DataFrame, cent: DataFrame) -> DataFrame:
    d = emb.join(F.broadcast(cent)).withColumn(
        "_d2", _dist2(F.col("e"), F.col("c"))
    )
    w = Window.partitionBy("vec_id").orderBy("_d2", "cell")
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "e", "cell")
    )


_DD_D2 = (
    "list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
    "p -> (p[1] - p[2]) * (p[1] - p[2]))), (acc, x) -> acc + x)"
)

_IVF_PORTABLE_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
c0 AS (SELECT DISTINCT CAST(vec_id AS INT) AS cell, e AS c
       FROM e WHERE vec_id < {_PK}),
a0 AS (
  SELECT vec_id, e, cell FROM (
    SELECT e.vec_id, e.e, c0.cell,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_DD_D2.format(a="e.e", b="c0.c")}, c0.cell) AS rn
    FROM e CROSS JOIN c0
  ) t WHERE rn = 1
),
upd AS (
  SELECT cell, generate_subscripts(e, 1) AS dim, UNNEST(e) AS x
  FROM a0
),
cm AS (
  SELECT cell, dim,
         FLOOR((CAST(SUM(CAST(x AS DECIMAL(20,12))) AS DOUBLE) / COUNT(*))
               * 1000000.0 + 0.5) / 1000000.0 AS cv
  FROM upd GROUP BY cell, dim
),
c1 AS (SELECT cell, list(cv ORDER BY dim) AS c FROM cm GROUP BY cell)
SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM (
  SELECT e.vec_id, c1.cell,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY {_DD_D2.format(a="e.e", b="c1.c")}, c1.cell) AS rn
  FROM e CROSS JOIN c1
) t WHERE rn = 1
"""


@register("simsearch_ivf_portable", oracle=_IVF_PORTABLE_ORACLE)
def simsearch_ivf_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import hround

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    # initial-centroid dedupe by key (mirrored in the oracle's DISTINCT
    # c0): replicated seed rows would multiply BOTH sides of the
    # assignment cross join — quadratic under duplication. vec_id is a
    # key, so the arbitrary-survivor dropDuplicates equals the oracle's
    # whole-row DISTINCT (duplicates carry identical embeddings)
    c0 = (
        emb.filter(F.col("vec_id") < _PK)
        .dropDuplicates(["vec_id"])
        .select(F.col("vec_id").cast("int").alias("cell"), F.col("e").alias("c"))
    )
    a0 = _portable_assign(emb, c0)
    cm = (
        a0.select("cell", F.posexplode("e").alias("dim", "x"))
        .groupBy("cell", "dim")
        .agg(
            hround(
                F.sum(F.col("x").cast("decimal(20,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("cv")
        )
    )
    c1 = cm.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cv"))), lambda s: s.cv
        ).alias("c")
    )
    return _portable_assign(emb, c1).select(
        "vec_id", F.col("cell").cast("long").alias("cell")
    )
