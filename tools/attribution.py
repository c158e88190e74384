"""Per-query time attribution for the headline bench (guide §1).

For each headline query, splits the bench's timed region into
  build   — fn(spark, sf_dir): Python expression-tree construction (py4j)
  analyze — first schema touch (Catalyst analysis)
  exec    — noop write (optimize + codegen + run)
and counts the Spark jobs/stages/tasks the noop write launched.

Usage: python tools/attribution.py [reps] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from weather_etl_pipeline_spark.registry import load_all  # noqa: E402
from weather_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reg = load_all()
    if not names:
        names = sorted(n for n, q in reg.items() if q.headline)
    spark = get_spark("attribution")
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    tracker = sc.statusTracker()
    rows = []
    for name in names:
        best = None
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = reg[name].fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.schema  # force analysis
            t2 = time.perf_counter()
            jobs_before = set(tracker.getJobIdsForGroup(None) or [])
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            jobs_after = set(tracker.getJobIdsForGroup(None) or [])
            new_jobs = jobs_after - jobs_before
            n_stages = 0
            n_tasks = 0
            for j in new_jobs:
                ji = tracker.getJobInfo(j)
                if ji is None:
                    continue
                for s in ji.stageIds:
                    si = tracker.getStageInfo(s)
                    if si is not None:
                        n_stages += 1
                        n_tasks += si.numTasks
            cur = {
                "build": round(t1 - t0, 3),
                "analyze": round(t2 - t1, 3),
                "exec": round(t3 - t2, 3),
                "total": round(t3 - t0, 3),
                "jobs": len(new_jobs),
                "stages": n_stages,
                "tasks": n_tasks,
            }
            if best is None or cur["total"] < best["total"]:
                best = cur
        rows.append((name, best))
        print(f"{name}: {json.dumps(best)}", flush=True)
    total = {
        k: round(sum(b[k] for _, b in rows), 3)
        for k in ("build", "analyze", "exec", "total")
    }
    print("TOTALS:", json.dumps(total))
    spark.stop()


if __name__ == "__main__":
    main()
