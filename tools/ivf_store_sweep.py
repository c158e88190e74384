"""IVF-index flatness sweep: build the index from N×-grown corpora and
time the SAME query-batch probe against each — the evidence that probe
cost is flat in corpus size (the inline simsearch_ivf_kmeans re-runs
Lloyd's + the full assignment per call; that whole corpus-linear term
is gone from the probe path). Pattern: tools/signature_store_sweep.py.

Corpus growth is synthesized with DISTINCT vec_ids (offset per replica,
embeddings nudged by a deterministic per-replica epsilon) — the @xN
replicated-listing amplifier reuses vec_ids, which the build correctly
collapses as a key, so it cannot grow this corpus.

Usage: python tools/ivf_store_sweep.py [--scales 1,10,100]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from functools import reduce
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from weather_etl_pipeline_spark.catalog import load_table  # noqa: E402
from weather_etl_pipeline_spark.functions.vectors import as_double  # noqa: E402
from weather_etl_pipeline_spark.operators.ivf_store import (  # noqa: E402
    build_ivf_index,
    probe_ivf_index,
)
from weather_etl_pipeline_spark.session import get_spark  # noqa: E402


def grown(emb, mult: int, stride: int):
    parts = [
        emb.select(
            (F.col("vec_id") + F.lit(r * stride)).alias("vec_id"),
            F.transform("e", lambda x: x + F.lit(r * 1e-4)).alias("e"),
        )
        for r in range(mult)
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,100")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("ivfstore-sweep")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    emb = load_table(spark, args.base, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    n_base = emb.count()
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    for mult in (int(m) for m in args.scales.split(",")):
        index = tempfile.mkdtemp(prefix=f"ivf_x{mult}_")
        # k grows with the corpus so per-cell membership stays ~250 —
        # the IVF cost model (probe scans nprobe*n/k vectors; fixed k
        # would make probes corpus-linear BY DESIGN, k scaling is how
        # production IVF keeps them flat). k >= 64 exercises the
        # vectorized BLAS assignment path.
        k = max(8, (n_base * mult) // 250)
        t0 = time.perf_counter()
        build_ivf_index(spark, grown(emb, mult, n_base), index, k=k)
        tb = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            probe_ivf_index(spark, queries, index).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
        rows = probe_ivf_index(spark, queries, index).count()
        print(
            f"x{mult}: corpus {n_base * mult} k {k} build {tb:.2f}s "
            f"probe(best-of-2) {best:.2f}s topk-rows {rows}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
