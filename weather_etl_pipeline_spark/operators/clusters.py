"""Duplicate clustering: connected components over near-dup pairs.

Pairwise dedup (jaccard/minhash/simhash) yields EDGES; the pipeline
action — "keep one document per duplicate group" — needs the connected
COMPONENTS. Computed with iterative min-label propagation:

    label(v) ← min(label(v), min over neighbors(label(u)))

repeated until fixpoint. Each iteration is ONE join (neighbor messages)
unioned with the current labels into ONE min-aggregation — the standard
hash-partitioned label-propagation shape; iterations needed = graph
diameter, which for near-dup clusters is tiny (dup groups are
near-cliques, so 2-3 passes converge). Convergence is detected from the
LABEL SUM: labels only ever decrease, so the sum is strictly monotone
while anything changes and stationary exactly at the fixpoint — a
one-row aggregate per iteration instead of an old-vs-new join. The
driver only sees that one number; labels never leave the executors.
Bounded at ``max_iters`` as a runaway guard.

Non-SQL-expressible (iterative) → rows-only driver check; pytest
verifies against a driver-side union-find on the same edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


def connected_components(
    edges: DataFrame, vertices: DataFrame, max_iters: int = 20
) -> DataFrame:
    """(doc_id, cluster) with cluster = min doc_id in the component.

    ``edges``: columns (doc_a, doc_b); ``vertices``: column (doc_id).

    Propagation runs ONLY over the edge-touched vertex set: an isolated
    vertex can never change label, and at corpus scale isolated docs
    are the overwhelming majority — keeping them in the loop would
    multiply every iteration's join + min-aggregation shuffle (and the
    convergence collect) by corpus size for zero information. They are
    joined back as their own singleton clusters once the fixpoint over
    the duplicate subgraph is reached, so the result is identical.
    """
    # symmetric adjacency so propagation flows both ways; materialized
    # ONCE — without this every iteration would re-derive the edges
    # (for near-dup edges that is the expensive inverted-index join)
    # pre-partitioned by dst — the per-iteration message join keys on
    # (adj.dst = labels.doc_id) and labels come out of groupBy(doc_id)
    # hash-partitioned, so with adj laid out by dst the join needs NO
    # exchange on either side (localCheckpoint preserves partitioning)
    adj = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .repartition("dst")
        .localCheckpoint(eager=True)
    )
    # initial labels = FIRST PROPAGATION HOP fused into initialization:
    # label(v) = min(v, neighbors(v)) comes straight out of one
    # aggregation over the checkpointed adjacency (grouped on dst, so it
    # reuses the checkpoint's partitioning with no exchange). This also
    # pins the vertex set to edge-touched vertices only. Starting from
    # identity labels instead would spend a full join+agg round
    # computing exactly this. Deriving anything from the raw `edges`
    # plan would re-execute the whole edge derivation — everything
    # reads the checkpoint.
    labels = (
        adj.groupBy("dst")
        .agg(F.min("src").alias("_min_nbr"))
        .select(
            F.col("dst").alias("doc_id"),
            F.least("dst", "_min_nbr").alias("cluster"),
        )
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("cluster")).collect()[0][0]
    converged = False
    for _ in range(max_iters):
        # ONE hop per materialization: each hop reads `labels` twice
        # (join side + union side), so running a second hop before the
        # checkpoint would inline the first hop's whole plan twice —
        # measured 6.4s vs 4.7s for a 2-hops-per-checkpoint variant
        # despite halving the fixed per-round costs.
        # neighbor messages: each edge forwards its dst's label to src;
        # union with the self-labels and take the min in ONE aggregation
        msgs = adj.join(labels, adj.dst == labels.doc_id).select(
            F.col("src").alias("doc_id"), "cluster"
        )
        labels = (
            msgs.unionByName(labels.select("doc_id", "cluster"))
            .groupBy("doc_id")
            .agg(F.min("cluster").alias("cluster"))
            .localCheckpoint(eager=True)  # cut lineage growth
        )
        cur_sum = labels.agg(F.sum("cluster")).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # returning silently would hand back split components
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} iterations "
            "(label sum still decreasing); raise max_iters for graphs "
            "with diameter > max_iters"
        )
    # isolated vertices rejoin as singleton clusters (cluster = self)
    return vertices.join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster", "doc_id").alias("cluster")
    )


# Oracle: the same fixpoint as SQL — recursive reachability, cluster =
# MIN(reachable doc_id) — made CLIQUE-SAFE (round 11): the closure runs
# over the REP-LEVEL near-dup edges only, and exact-dup members inherit
# their rep's label through one star-edge join afterwards. The round-10
# formulation closed over the full edge set (near-dup pairs UNION star
# edges), whose reach table is O(Σ|component|²) — at sf0.1@x100 every
# distinct text is a 100-wide exact clique, ≈10^8 reach rows, and the
# oracle (not the engine) timed out. Collapse-first is exactly what the
# Spark side already does (_collapse_exact / dedup.py): `pairs` is
# computed over jdocs (one row per distinct text), so rep components
# keep their @x1 size at ANY replica multiplicity, and the member
# extension is linear in corpus size.
#
# Label equivalence: members are leaves attached only to their rep
# (near-dup pairs join reps only), and rep = MIN(doc_id) of its exact
# clique ≤ every member, so a component's global MIN(doc_id) is always
# attained at a rep — member.cluster = rep_label(rep) exactly.
def _clusters_oracle() -> str:
    from .dedup import _JACCARD_CTE_PREFIX, _JACCARD_T

    return f"""
WITH RECURSIVE {_JACCARD_CTE_PREFIX},
rep_edges AS (
  SELECT doc_a, doc_b FROM pairs
  WHERE CAST(n_shared AS DOUBLE) / (n_a + n_b - n_shared) >= {_JACCARD_T}
),
sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM rep_edges
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM rep_edges
),
reach(doc_id, nbr) AS (
  SELECT doc_id, doc_id AS nbr FROM jdocs
  UNION
  SELECT r.doc_id, s.dst AS nbr FROM reach r JOIN sym s ON s.src = r.nbr
),
rep_labels AS (
  SELECT doc_id, MIN(nbr) AS cluster FROM reach GROUP BY doc_id
),
all_labels AS (
  SELECT doc_id, cluster FROM rep_labels
  UNION ALL
  SELECT js.doc_b AS doc_id, rl.cluster
  FROM jstar js JOIN rep_labels rl ON rl.doc_id = js.doc_a
),
verts AS (SELECT DISTINCT doc_id FROM documents)
SELECT v.doc_id,
       COALESCE(al.cluster, v.doc_id) AS cluster,
       v.doc_id = COALESCE(al.cluster, v.doc_id) AS is_canonical
FROM verts v LEFT JOIN all_labels al ON al.doc_id = v.doc_id
"""


@register("dedup_clusters", oracle=_clusters_oracle())
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster documents by Jaccard near-duplication; one row per doc
    with its cluster id (min doc_id in the component) and whether the
    doc is the cluster's canonical survivor."""
    from .dedup import dedup_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    edges = dedup_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(edges, docs)
    return labels.select(
        "doc_id",
        "cluster",
        (F.col("doc_id") == F.col("cluster")).alias("is_canonical"),
    )


# --- triangle count / closure over the near-dup graph ------------------------
# Graph-shape QA for dedup: real duplicate groups are near-cliques, so
# a LOW triangle-closure fraction flags chains of borderline matches
# (A~B~C with A!~C) that would over-merge under transitive clustering.
# The classic distributed triangle count: edges are already stored in
# canonical orientation (doc_a < doc_b), so the 3-way self-join
#   (a,b) ⋈ (b,c) ⋈ (a,c)
# counts every triangle exactly once — orientation IS the dedup trick
# (no per-triangle 6× blowup, no post-dedup). Wedges come from a degree
# aggregation, closure = 3·triangles / wedges. Intermediate size is
# Σ_b deg_out(b)·deg_in(b), bounded here because capped pair-gen bounds
# both the edge count and the per-vertex degree; the general-graph
# refinement (order vertices by degree instead of id) drops in by
# re-orienting the edges first.


def _tri_oracle() -> str:
    from .dedup import _JACCARD_ORACLE

    return f"""
WITH e AS (SELECT doc_a, doc_b FROM ({_JACCARD_ORACLE}) j),
deg AS (
  SELECT v, COUNT(*) AS d FROM (
    SELECT doc_a AS v FROM e UNION ALL SELECT doc_b AS v FROM e
  ) GROUP BY v
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM e e1
  JOIN e e2 ON e2.doc_a = e1.doc_b
  JOIN e e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
)
SELECT (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
       (SELECT n_triangles FROM tri) AS n_triangles,
       FLOOR(3.0 * (SELECT n_triangles FROM tri)
             / GREATEST((SELECT SUM(d * (d - 1) / 2) FROM deg), 1)
             * 1000000.0 + 0.5) / 1000000.0 AS closure
"""


@register("graph_triangle_closure", oracle=_tri_oracle())
def graph_triangle_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import dedup_jaccard_pairs

    e = (
        dedup_jaccard_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)  # three consumers; derive edges once
    )
    deg = (
        e.select(F.col("doc_a").alias("v"))
        .unionByName(e.select(F.col("doc_b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wedges = deg.agg(
        F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("long")).alias("n_wedges")
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.doc_a") == F.col("e1.doc_b"))
        .join(
            e3,
            (F.col("e3.doc_a") == F.col("e1.doc_a"))
            & (F.col("e3.doc_b") == F.col("e2.doc_b")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    closure = (
        F.floor(
            3.0
            * F.col("n_triangles")
            / F.greatest(F.col("n_wedges"), F.lit(1))
            * 1_000_000.0
            + 0.5
        )
        / 1_000_000.0
    )
    return (
        e.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(F.broadcast(wedges))
        .crossJoin(F.broadcast(tri))
        .select("n_edges", "n_wedges", "n_triangles", closure.alias("closure"))
    )
