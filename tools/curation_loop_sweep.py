"""Unified curation-loop flatness sweep — the 100 TB ingest claim,
measured end-to-end.

The loop's cost model (streaming/curation_loop.py): per-batch work is
BATCH-bounded — quality gate is map-only over the batch, the signature
-store probe reads partition-pruned band shards and broadcasts the
batch, the IVF probe scans only the probed cells, and both appends'
rank/assign work is batch-local. Corpus size should therefore move
per-batch latency only through partition-pruned scan width (IO-speed,
documented worst case), never through recompute.

This sweep builds BOTH stores at @x1/@x10/@x100 document/embedding
corpora (catalog @xN key-offset amplification), then drives the SAME
fixed-size batch through process_curation_batch against each, printing
per-decade batch latency. Flat-ish rows = the ingest shape holds
across two decades of corpus growth; the store-level sweeps
(signature_store_sweep.py, ivf_store_sweep.py) isolate the per-probe
terms if a decade ever bends.

Usage: python tools/curation_loop_sweep.py [--base /root/testdata/sf0.1]
       [--decades 1,10,100] [--batch 200]
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

from pyspark.sql import functions as F  # noqa: E402

from weather_etl_pipeline_spark.catalog import load_table  # noqa: E402
from weather_etl_pipeline_spark.functions.vectors import as_double  # noqa: E402
from weather_etl_pipeline_spark.operators.dedup_store import (  # noqa: E402
    build_signature_store,
)
from weather_etl_pipeline_spark.operators.ivf_store import (  # noqa: E402
    build_ivf_index,
)
from weather_etl_pipeline_spark.session import get_spark  # noqa: E402
from weather_etl_pipeline_spark.streaming.curation_loop import (  # noqa: E402
    process_curation_batch,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--decades", default="1,10,100")
    ap.add_argument("--batch", type=int, default=200)
    args = ap.parse_args()

    spark = get_spark("curation-sweep")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    for n in (int(x) for x in args.decades.split(",")):
        sf = args.base if n == 1 else f"{args.base}@x{n}"
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        embs = load_table(spark, sf, "embeddings").select(
            "vec_id", as_double(F.col("embedding")).alias("e")
        )
        # corpus = docs carrying their embedding (vec_id == doc_id in
        # the loop's contract); batch = synthetic NEW docs above the
        # corpus watermark, half fresh / half exact text dups
        corpus = docs.join(
            embs.select(F.col("vec_id").alias("doc_id"), "e"), "doc_id"
        )
        hi = corpus.agg(F.max("doc_id")).collect()[0][0]
        half = args.batch // 2
        fresh = [
            (
                int(hi) + 1 + i,
                f"a genuinely new crawl document about subject {i} with "
                f"plenty of the usual words for a quality gate to like",
                [float((i * 7 + d) % 23) for d in range(64)],
                "crawl",
            )
            for i in range(half)
        ]
        dup_src = [r for r in docs.limit(half).collect()]
        dups = [
            (
                int(hi) + 1 + half + i,
                r["text"],
                [0.5] * 64,
                "crawl",
            )
            for i, r in enumerate(dup_src)
        ]
        batch = spark.createDataFrame(
            fresh + dups, "doc_id long, text string, e array<double>, src string"
        )

        work = tempfile.mkdtemp(prefix=f"cursweep_x{n}_")
        sig, ivf = f"{work}/sig", f"{work}/ivf"
        t0 = time.perf_counter()
        build_signature_store(spark, corpus.select("doc_id", "text"), sig)
        # k=None → the build's own auto-sqrt(n) sizing (round 10)
        build_ivf_index(
            spark, corpus.select(F.col("doc_id").alias("vec_id"), "e"), ivf
        )
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        process_curation_batch(
            spark, batch, 1, sig, ivf, f"{work}/lake", f"{work}/rej"
        )
        t_batch = time.perf_counter() - t0
        n_lake = spark.read.parquet(f"{work}/lake").count()
        print(
            f"@x{n}: corpus={corpus.count()} build={t_build:.2f}s "
            f"batch({args.batch} docs)={t_batch:.2f}s accepted={n_lake}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
