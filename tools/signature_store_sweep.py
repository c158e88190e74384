"""Signature-store flatness sweep: build the store from @xN-amplified
corpora and time the SAME batch probe against each — the evidence that
probe cost is flat in corpus size (the inline incremental query's
corpus signature build, its whole 6.3x/decade term, is gone from the
ingest path).

Usage: python tools/signature_store_sweep.py [--scales 1,10,100]
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

from weather_etl_pipeline_spark.catalog import knuth_hash, load_table  # noqa: E402
from weather_etl_pipeline_spark.operators.dedup import _INC_NEW_PCT  # noqa: E402
from weather_etl_pipeline_spark.operators.dedup_store import (  # noqa: E402
    build_signature_store,
    probe_signature_store,
)
from weather_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,100")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--family", default="minhash", choices=["minhash", "simhash"])
    args = ap.parse_args()

    spark = get_spark("sigstore-sweep")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    bucket = knuth_hash("doc_id") % 100
    batch = load_table(spark, args.base, "documents").filter(
        bucket >= _INC_NEW_PCT
    )
    for mult in (int(m) for m in args.scales.split(",")):
        sf = args.base if mult == 1 else f"{args.base}@x{mult}"
        corpus = load_table(spark, sf, "documents").filter(bucket < _INC_NEW_PCT)
        store = tempfile.mkdtemp(prefix=f"sigstore_{args.family}_x{mult}_")
        t0 = time.perf_counter()
        build_signature_store(spark, corpus, store, family=args.family)
        tb = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            probe_signature_store(
                spark, batch, store, family=args.family
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
        rows = probe_signature_store(
            spark, batch, store, family=args.family
        ).count()
        print(
            f"{args.family} x{mult}: build {tb:.2f}s"
            f" probe(best-of-2) {best:.2f}s pairs {rows}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
