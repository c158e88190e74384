"""IVF recall@k vs nprobe — the ANN quality/latency dial, measured.

Ground truth is exact brute-force cosine top-k (numpy, driver-side —
the corpus here is small; at lake scale you'd sample queries). For
each nprobe the probe runs against the SAME persisted index, so the
table reads as: what fraction of the true top-k does an nprobe-cell
probe recover, and what does the probe cost?

nprobe = k (all cells) must reach recall 1.0 exactly — the probe
degenerates to brute force over the full index; pytest pins that
equivalence (test_training_ops.py). In between, recall climbs with
nprobe while probed bytes grow linearly — pick the knee.

Usage: python tools/ivf_recall.py [--k 8] [--topk 5] [--queries 64]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from weather_etl_pipeline_spark.catalog import load_table  # noqa: E402
from weather_etl_pipeline_spark.functions.vectors import as_double  # noqa: E402
from weather_etl_pipeline_spark.operators.ivf_store import (  # noqa: E402
    build_ivf_index,
    probe_ivf_index,
)
from weather_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", default="8", help="centroid count, or 'auto' for the build's sqrt(n) sizing")
    ap.add_argument("--topk", type=int, default=5)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--m", type=int, default=1, help="multi-assignment factor")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--synthetic",
        type=int,
        default=0,
        help="ignore --base; use N seeded isotropic 64-dim vectors. The "
        "@xN amplified dirs are useless for recall: replicas duplicate "
        "the embedding VALUES, so every true top-k is an exact twin in "
        "the query's own cell and any nprobe scores recall 1.0.",
    )
    ap.add_argument(
        "--clusters",
        type=int,
        default=0,
        help="with --synthetic: draw vectors from a C-center gaussian "
        "mixture instead of pure isotropic — the structure IVF exists "
        "to exploit (true neighbors share a center, Lloyd's finds the "
        "centers, small-nprobe recall should approach 1).",
    )
    args = ap.parse_args()

    spark = get_spark("ivf-recall")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    if args.synthetic:
        rng = np.random.default_rng(0)
        if args.clusters:
            centers = rng.standard_normal((args.clusters, 64)) * 4.0
            which = rng.integers(0, args.clusters, args.synthetic)
            X = centers[which] + rng.standard_normal((args.synthetic, 64))
        else:
            X = rng.standard_normal((args.synthetic, 64))
        ids = np.arange(args.synthetic)
        emb = spark.createDataFrame(
            [(int(i), [float(v) for v in x]) for i, x in zip(ids, X)],
            "vec_id long, e array<double>",
        )
        rows = list(range(args.synthetic))  # only len() is used below
    else:
        emb = load_table(spark, args.base, "embeddings").select(
            "vec_id", as_double(F.col("embedding")).alias("e")
        )
        rows = emb.collect()
        ids = np.array([r["vec_id"] for r in rows])
        X = np.array([r["e"] for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    qidx = np.argsort(ids)[: args.queries]

    # exact ground truth: cosine top-k excluding self
    sims = Xn[qidx] @ Xn.T
    truth = {}
    for row, qi in enumerate(qidx):
        order = np.argsort(-sims[row], kind="stable")
        top = [ids[j] for j in order if j != qi][: args.topk]
        truth[int(ids[qi])] = set(int(v) for v in top)

    index = tempfile.mkdtemp(prefix="ivf_recall_")
    # --k auto exercises build_ivf_index's default sqrt(n) sizing end
    # to end; the effective k is read back from the stored centroids so
    # the nprobe=k (brute force) leg stays exact either way
    k = None if args.k == "auto" else int(args.k)
    build_ivf_index(spark, emb, index, k=k, assign_m=args.m)
    k_eff = (
        spark.read.parquet(f"{index}/centroids").count() if k is None else k
    )
    print(f"k={'auto->' if k is None else ''}{k_eff} n={len(rows)}", flush=True)
    queries = emb.filter(
        F.col("vec_id").isin([int(ids[i]) for i in qidx])
    ).select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))

    for nprobe in sorted({min(p, k_eff) for p in (1, 2, 4, 8, 16, k_eff)}):
        t0 = time.perf_counter()
        got = probe_ivf_index(
            spark, queries, index, topk=args.topk, nprobe=nprobe
        ).collect()
        dt = time.perf_counter() - t0
        by_q: dict[int, set] = {}
        for r in got:
            by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(
            len(by_q.get(q, set()) & t) for q, t in truth.items()
        )
        total = sum(len(t) for t in truth.values())
        print(
            f"m={args.m} nprobe={nprobe}: recall@{args.topk} "
            f"{hits / total:.3f} probe {dt:.2f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
