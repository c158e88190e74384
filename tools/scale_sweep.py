"""Synthetic scale-up sweep: time headline queries at sf0.1 and at a
zero-copy 10x amplification (catalog `@xN` path replication — 6M-row
lineitem, 100k events, 5k docs x10). Evidence that plan cost grows
sublinearly with data on fixed cores, i.e. the plans have parallel
headroom rather than fixed-overhead dominance.

Usage: python tools/scale_sweep.py [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from weather_etl_pipeline_spark.registry import load_all  # noqa: E402
from weather_etl_pipeline_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "q1_pricing_summary",
    "star_join_revenue",
    "q3_shipping_priority",
    "llm_corpus_curation",
    "sessionize_events_rows",
    "window_trailing_hour_range",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    reg = load_all()
    spark = get_spark("scale-sweep")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    print(f"{'query':35s} {'sf0.1':>8s} {'sf0.1@x10':>10s} {'ratio':>6s}")
    scales = ["/root/testdata/sf0.1", "/root/testdata/sf0.1@x10"]
    for name in names:
        # interleaved best-of-2 per scale so codegen warm-up (paid by
        # whichever variant runs first — the plans share expression
        # trees) cannot bias the ratio
        best = {sf: float("inf") for sf in scales}
        for _ in range(2):
            for sf in scales:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                reg[name].fn(spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                best[sf] = min(best[sf], time.perf_counter() - t0)
        r0, r1 = best[scales[0]], best[scales[1]]
        print(f"{name:35s} {r0:7.2f}s {r1:9.2f}s {r1 / r0:5.1f}x")
    spark.stop()


if __name__ == "__main__":
    main()
