"""Same-process interleaved timing of named queries — the adjudication
protocol from the round-10 jaccard "drift" entry (EXPLAINS.md), as a
reusable tool: one warm session, N passes over the query list in
rotation (so a noise window must span the whole run to poison any
query's best), cache cleared before every execution, noop-sink
materialization, floor + fixed reference job recorded so the window
itself is normalizable against other rounds.

Usage: python tools/outlier_ab.py [sf_dir] query [query ...]
       SPARK_GRAFT_AB_PASSES=8 python tools/outlier_ab.py ...

Prints one JSON line: {"floor": s, "ref_job": s,
"queries": {name: {"best": s, "median": s, "raw": [...]}}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from weather_etl_pipeline_spark.registry import load_all  # noqa: E402
from weather_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]

    def _is_sf_dir(a: str) -> bool:
        # honor the repo's <dir>@xN amplification convention: the @xN
        # suffix is not a literal directory, so test the BASE dir
        return os.path.isdir(a.rpartition("@x")[0] if "@x" in a else a)

    take_first = bool(args) and _is_sf_dir(args[0])
    sf_dir = args[0] if take_first else "/root/testdata/sf0.1"
    names = args[1:] if take_first else args
    if not names:
        raise SystemExit("usage: outlier_ab.py [sf_dir] query [query ...]")
    passes = max(1, int(os.environ.get("SPARK_GRAFT_AB_PASSES", "8")))
    reg = load_all()
    unknown = [n for n in names if n not in reg]
    if unknown:
        # refuse BEFORE the ~15s session spin-up + warmup/floor/ref
        # jobs, and before a late bare KeyError — same posture as
        # diffcheck's unknown-name guard
        raise SystemExit(f"unknown query name(s): {unknown}")

    spark = get_spark("outlier-ab")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    def timed(fn) -> float:
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    floor = min(
        timed(
            lambda: spark.range(1).write.format("noop").mode("overwrite").save()
        )
        for _ in range(5)
    )
    # fixed CPU-bound reference job (identical to bench_context's):
    # its drift across runs is pure host drift
    ref = min(
        timed(
            lambda: spark.range(30_000_000)
            # pmod keeps the sum inside long (bench_context's exact job;
            # a raw sum of xxhash64 overflows under ANSI)
            .selectExpr("sum(pmod(xxhash64(id), 1000000)) as s")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        for _ in range(3)
    )

    raw: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(passes):
        for n in names:
            spark.catalog.clearCache()
            raw[n].append(
                timed(
                    lambda: reg[n]
                    .fn(spark, sf_dir)
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
            )
    out = {
        "floor": round(floor, 3),
        "ref_job": round(ref, 3),
        "passes": passes,
        "sf_dir": sf_dir,
        "queries": {
            n: {
                "best": round(min(v), 3),
                "median": round(statistics.median(v), 3),
                "raw": [round(x, 3) for x in v],
            }
            for n, v in raw.items()
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
