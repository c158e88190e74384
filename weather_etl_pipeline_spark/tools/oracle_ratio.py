"""Spark-vs-DuckDB headline ratio, measured the fair way: one process,
interleaved passes, same host window for both engines.

The round-7 verdict showed the ratio is exquisitely window-sensitive:
the same HEAD measured 2.03x and 2.81x across rounds mostly because
the two sides were timed in different noise windows (and a correctness
restructure changed the ORACLE's cost as much as the Spark plan's).
This tool removes the methodology variance: for each with-oracle
headline query it alternates Spark pass / DuckDB pass within the same
minute, takes per-engine best-of-N, and prints one JSON line with the
per-query pairs, the totals, and the floor-adjusted ratio (subtracting
the local-mode scheduling floor once per query from the Spark side —
the irreducible-locally, irrelevant-on-a-cluster term bench.py also
reports).

Usage: weather-etl-oracle-ratio [--passes 3] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import time

try:
    import duckdb
except ModuleNotFoundError as _e:  # pragma: no cover — env-dependent
    raise ModuleNotFoundError(
        "duckdb is required as the oracle engine for this tool: "
        "pip install 'weather-etl-pipeline-spark[oracle]'"
    ) from _e

from ..registry import load_all
from ..schemas import TESTDATA_TABLES
from ..session import get_spark


def main() -> None:
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=5)  # match the bench's
    # best-of-5 contract: at best-of-3 the Spark side reads 0.6-1.1s high
    # (heavy plans get only two clean tries after JVM/codegen warmup —
    # same finding as BENCH round 11), which skews the ratio, not just
    # the total
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    reg = load_all()
    heads = {n: q for n, q in reg.items() if q.headline and q.oracle}

    spark = get_spark("oracle-ratio")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )
    # duckdb warm-up (catalog + reader init)
    con.execute("SELECT count(*) FROM region").fetchall()

    floor = min(
        _t(lambda: spark.range(1).write.format("noop").mode("overwrite").save())
        for _ in range(5)
    )
    # the fixed reference micro-job (bench_context.py) so this run's
    # host window can be compared against any bench run's context
    from .bench_context import bench_context

    context = bench_context(spark, args.sf)

    s_best: dict[str, float] = {n: float("inf") for n in heads}
    d_best: dict[str, float] = {n: float("inf") for n in heads}
    for _ in range(args.passes):
        for name in sorted(heads):
            spark.catalog.clearCache()
            s_best[name] = min(
                s_best[name],
                _t(
                    lambda: heads[name]
                    .fn(spark, args.sf)
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                ),
            )
            d_best[name] = min(
                d_best[name], _t(lambda: con.execute(heads[name].oracle).fetchall())
            )
    st, dt = sum(s_best.values()), sum(d_best.values())
    adj = st - floor * len(heads)
    print(
        json.dumps(
            {
                "n_queries": len(heads),
                "spark_sec": round(st, 3),
                "duckdb_sec": round(dt, 3),
                "floor_sec": round(floor, 3),
                "ratio_raw": round(st / dt, 3),
                "ratio_floor_adjusted": round(adj / dt, 3),
                "ref_job_sec": context["ref_job_sec"],
                # per-query table (round-12 judge item 2): the adjusted
                # ratio subtracts the local-mode scheduling floor from
                # the Spark side; `engine_bound` marks queries where
                # BOTH engines do >3× floor of real work — only those
                # ratios measure the engine rather than fixed costs (a
                # 13× raw ratio on a query DuckDB finishes in 0.05s is
                # the locality floor, not a plan defect). The summary
                # `engine_bound_over_2x` list is the perf-gap worklist.
                "per_query": {
                    n: {
                        "spark": round(s_best[n], 3),
                        "duckdb": round(d_best[n], 3),
                        "ratio_raw": round(s_best[n] / d_best[n], 3),
                        "ratio_adj": round(
                            max(0.0, s_best[n] - floor) / d_best[n], 3
                        ),
                        "engine_bound": bool(
                            s_best[n] > 3 * floor and d_best[n] > 3 * floor
                        ),
                    }
                    for n in sorted(heads)
                },
                "engine_bound_over_2x": sorted(
                    n
                    for n in heads
                    if s_best[n] > 3 * floor
                    and d_best[n] > 3 * floor
                    and (s_best[n] - floor) / d_best[n] > 2.0
                ),
                "sf": args.sf,
            }
        )
    )
    # append-only ratio ledger (mirrors bench.py's BENCH_LEDGER): the
    # ratio is exquisitely host-window-sensitive (same head measured
    # 1.43-1.66 adjusted across windows), so adjudicating a drift needs
    # the history with its ref_job host-speed normalizer, not a single
    # snapshot. SPARK_GRAFT_NO_LEDGER=1 opts out; rows land in the cwd
    # (the checkout) like the bench ledger.
    if not os.environ.get("SPARK_GRAFT_NO_LEDGER"):
        with open("RATIO_LEDGER.jsonl", "a") as f:
            f.write(
                json.dumps(
                    {
                        "ts": round(time.time(), 1),
                        "passes": args.passes,
                        "spark_sec": round(st, 3),
                        "duckdb_sec": round(dt, 3),
                        "ratio_raw": round(st / dt, 3),
                        "ratio_floor_adjusted": round(adj / dt, 3),
                        "floor_sec": round(floor, 3),
                        "ref_job_sec": context["ref_job_sec"],
                        "sf": args.sf,
                    }
                )
                + "\n"
            )
    spark.stop()


def _t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
