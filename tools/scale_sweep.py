"""Synthetic scale-up sweep: time queries at sf0.1 and at zero-copy
N-fold amplifications (catalog ``@xN`` path replication — the fact
tables listed N times). Evidence that plan cost grows sublinearly with
data on fixed cores, i.e. the plans have parallel headroom rather than
fixed-overhead dominance — and, at @x100, that the bounded structures
(posting caps, membership caps, blocked pair-gen) hold across TWO
decades, not one.

Note the amplified corpus is ADVERSARIAL for dedup: every row gains
N-1 exact twins, so collision density in every block/band is maximal.
A capped plan that stays ~flat here is bounded by construction.

Usage: python tools/scale_sweep.py [--scales 1,10,100] [--reps 2] [query ...]
"""

from __future__ import annotations

import argparse
import os
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="*", default=DEFAULT)
    args = ap.parse_args()

    mults = [int(s) for s in args.scales.split(",")]
    scales = [
        args.base if m == 1 else f"{args.base}@x{m}" for m in mults
    ]
    reg = load_all()
    spark = get_spark("scale-sweep")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    base_label = os.path.basename(args.base.rstrip("/"))
    hdr = f"{'query':35s}" + "".join(
        f" {'@x%d' % m if m > 1 else base_label:>9s}" for m in mults
    )
    print(hdr + "  ratios")
    for name in args.queries:
        # interleaved best-of-N per scale so codegen warm-up (paid by
        # whichever variant runs first — the plans share expression
        # trees) cannot bias the ratio
        best = {sf: float("inf") for sf in scales}
        for _ in range(args.reps):
            for sf in scales:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                reg[name].fn(spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                best[sf] = min(best[sf], time.perf_counter() - t0)
        times = [best[sf] for sf in scales]
        ratios = " ".join(
            f"{times[i] / times[i - 1]:.1f}x" for i in range(1, len(times))
        )
        row = f"{name:35s}" + "".join(f" {t:8.2f}s" for t in times)
        print(f"{row}  {ratios}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
