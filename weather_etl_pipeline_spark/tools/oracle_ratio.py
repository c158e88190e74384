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
from ..session import get_spark


def rotate_sample(pool: list[str], n: int, offset: int) -> list[str]:
    """Deterministic rotating window over ``pool`` (sorted names):
    offset R (the round number) → names [R*n, R*n+n) mod len(pool),
    clamped to the whole pool when n ≥ len(pool) (a window of
    min(n, len) consecutive wrap-around positions never repeats an
    entry). Every pool entry is visited once per ⌈len/n⌉ consecutive
    offsets — full non-headline ratio coverage every ~8 rounds at
    n=20."""
    if not pool or n <= 0:
        return []
    start = (offset * n) % len(pool)
    return [pool[(start + i) % len(pool)] for i in range(min(n, len(pool)))]


def main() -> None:
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=5)  # match the bench's
    # best-of-5 contract: at best-of-3 the Spark side reads 0.6-1.1s high
    # (heavy plans get only two clean tries after JVM/codegen warmup —
    # same finding as BENCH round 11), which skews the ratio, not just
    # the total
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    # rotating NON-headline sample (round-12 judge item 4): the 2× gate
    # is enforced per-round only on the ~18 headliners; a perf
    # regression in the other ~150 registered with-oracle queries would
    # otherwise surface only at the next decade sweep. --sample N
    # measures N extra queries under the same interleaved protocol;
    # --sample-offset R (pass the round number) rotates the window
    # deterministically through the sorted non-headline names, so over
    # ~8 rounds every registered oracle query gets a ledgered ratio.
    ap.add_argument("--sample", type=int, default=0)
    ap.add_argument("--sample-offset", type=int, default=0)
    ap.add_argument(
        "--sample-passes",
        type=int,
        default=2,
        help="best-of-N for the sample (2: a tripwire, not a headline "
        "measurement — the headliners keep the best-of-5 contract)",
    )
    # decade curve for the proxy-bounded heads: a proxy ratio over 2×
    # at sf0.1 can be fixed-cost floor, not plan defect — the honest
    # adjudication is whether the ratio FALLS as data grows (Spark's
    # stage floor amortizes, DuckDB grows linearly). --proxy-decades
    # "3,10" measures each proxy head at <sf>@x3 and <sf>@x10 (best-of-
    # sample-passes, amplified views on the DuckDB side) and reports
    # the per-decade adjusted ratios alongside the @x1 row.
    ap.add_argument("--proxy-decades", default=None)
    args = ap.parse_args()

    reg = load_all()
    heads = {n: q for n, q in reg.items() if q.headline and q.oracle}
    # headline queries with no SQL oracle but a declared portable-twin
    # proxy (Query.proxy_oracle): their Spark side is timed against the
    # TWIN's DuckDB side — same work shape, different hash kernel —
    # and reported separately so the main ratio stays apples-to-apples
    # with earlier rounds' ledger rows.
    from ..registry import Query as _Q

    proxies = {
        n: _Q(name=n, fn=q.fn, oracle=reg[q.proxy_oracle].oracle, headline=True)
        for n, q in reg.items()
        if q.headline and not q.oracle and q.proxy_oracle
    }
    sample: dict = {}
    if args.sample > 0:
        pool = sorted(
            n for n, q in reg.items() if q.oracle and not q.headline
        )
        sample = {
            n: reg[n]
            for n in rotate_sample(pool, args.sample, args.sample_offset)
        }

    spark = get_spark("oracle-ratio")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    def _make_con(sf: str):
        """DuckDB connection with the testdata views — @xN dirs get the
        same key-offset amplification diffcheck uses (shared builder,
        duck_views.py), so a decade measurement runs identical inputs
        on both engines."""
        from .duck_views import create_testdata_views

        c = duckdb.connect()
        c.execute("SET threads TO 32")
        create_testdata_views(c, sf)
        c.execute("SELECT count(*) FROM region").fetchall()  # warm-up
        return c

    con = _make_con(args.sf)

    floor = min(
        _t(lambda: spark.range(1).write.format("noop").mode("overwrite").save())
        for _ in range(5)
    )
    # the fixed reference micro-job (bench_context.py) so this run's
    # host window can be compared against any bench run's context
    from .bench_context import bench_context

    context = bench_context(spark, args.sf)

    def _measure(queries, passes, sf=None, dcon=None):
        sf, dcon = sf or args.sf, dcon or con
        sb: dict[str, float] = {n: float("inf") for n in queries}
        db: dict[str, float] = {n: float("inf") for n in queries}
        for _ in range(passes):
            for name in sorted(queries):
                spark.catalog.clearCache()
                sb[name] = min(
                    sb[name],
                    _t(
                        lambda: queries[name]
                        .fn(spark, sf)
                        .write.format("noop")
                        .mode("overwrite")
                        .save()
                    ),
                )
                db[name] = min(
                    db[name],
                    _t(lambda: dcon.execute(queries[name].oracle).fetchall()),
                )
        return sb, db

    def _per_query(sb, db):
        return {
            n: {
                "spark": round(sb[n], 3),
                "duckdb": round(db[n], 3),
                "ratio_raw": round(sb[n] / db[n], 3),
                "ratio_adj": round(max(0.0, sb[n] - floor) / db[n], 3),
                "engine_bound": bool(sb[n] > 3 * floor and db[n] > 3 * floor),
            }
            for n in sorted(sb)
        }

    def _over_2x(sb, db):
        return sorted(
            n
            for n in sb
            if sb[n] > 3 * floor
            and db[n] > 3 * floor
            and (sb[n] - floor) / db[n] > 2.0
        )

    s_best, d_best = _measure(heads, args.passes)
    prx_s, prx_d = _measure(proxies, args.passes) if proxies else ({}, {})
    prx_decades: dict[str, dict] = {}
    if proxies and args.proxy_decades:
        for nx in (int(x) for x in args.proxy_decades.split(",")):
            sfx = f"{args.sf}@x{nx}"
            conx = _make_con(sfx)
            ds, dd = _measure(
                proxies, args.sample_passes, sf=sfx, dcon=conx
            )
            prx_decades[f"x{nx}"] = {
                n: {
                    "spark": round(ds[n], 3),
                    "duckdb": round(dd[n], 3),
                    "ratio_adj": round(max(0.0, ds[n] - floor) / dd[n], 3),
                }
                for n in sorted(proxies)
            }
            conx.close()
    smp_s, smp_d = _measure(sample, args.sample_passes) if sample else ({}, {})
    proxy_pq = _per_query(prx_s, prx_d) if proxies else {}
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
                "per_query": _per_query(s_best, d_best),
                "engine_bound_over_2x": _over_2x(s_best, d_best),
                "sf": args.sf,
                **(
                    {
                        "proxy_per_query": {
                            n: {
                                **proxy_pq[n],
                                "oracle_from": reg[n].proxy_oracle,
                            }
                            for n in sorted(proxies)
                        },
                        "proxy_over_2x": _over_2x(prx_s, prx_d),
                        **(
                            {"proxy_decades": prx_decades}
                            if prx_decades
                            else {}
                        ),
                    }
                    if proxies
                    else {}
                ),
                **(
                    {
                        "sample": {
                            "n": len(sample),
                            "offset": args.sample_offset,
                            "passes": args.sample_passes,
                            "per_query": _per_query(smp_s, smp_d),
                            "engine_bound_over_2x": _over_2x(smp_s, smp_d),
                        }
                    }
                    if sample
                    else {}
                ),
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
                        **(
                            {
                                "proxy": {
                                    n: round(
                                        max(0.0, prx_s[n] - floor) / prx_d[n],
                                        3,
                                    )
                                    for n in sorted(proxies)
                                }
                            }
                            if proxies
                            else {}
                        ),
                        **(
                            {
                                "sample_n": len(sample),
                                "sample_offset": args.sample_offset,
                                "sample_over_2x": _over_2x(smp_s, smp_d),
                            }
                            if sample
                            else {}
                        ),
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
