"""Time every registered query (warm best-of-2, noop sink) and print the
slowest ones — the feedback loop that found the round-4 pathologies
(80s recursion, O(n²) window frames, split-bound parallelism).

Usage:  python tools/profile_registry.py [sf_dir] [top_n]
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    reg = load_all()
    spark = get_spark("profile")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    times: dict[str, float] = {}
    for name, q in reg.items():
        best = float("inf")
        try:
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[name] = best
        except Exception as e:  # noqa: BLE001 — a broken query is a finding
            print(f"ERR   {name}: {str(e)[:120]}", flush=True)
    total = sum(times.values())
    print(f"\n{len(times)} queries, {total:.1f}s total — slowest {top_n}:")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{t:7.2f}s  {name}")
    spark.stop()


if __name__ == "__main__":
    main()
