"""Local oracle-differential harness — mimics the driver's compare.

Runs every registered query on Spark AND its DuckDB oracle twin at the
given sf dir, then compares row count, column names/order-insensitive
value multiset. Values are compared EXACTLY (stringified) — if this
passes, any reasonable driver hash passes too.

Usage:  weather-etl-diffcheck [sf_dir] [query ...]
        python tools/diffcheck.py [sf_dir] [query ...]   (repo shim)
        DIFFCHECK_BIG_ROWS=<N> python tools/diffcheck.py <sf_dir>

DIFFCHECK_BIG_ROWS (default 2000000): queries whose Spark output
exceeds N rows switch to an engine-side compare — row count plus
schema plus per-column engine-side checksums (exact for integer/
string/date columns: SUMs and distinct counts are order-free; float
columns compare count+min/max only, since cross-engine float SUM
depends on accumulation order) — instead of a full driver collect. A
100M-row differential (sf0.1@x100 gapfill) cannot be collected into
the driver on either engine; this is the honest scalable form, and
the output marks such rows "big" so a reader can tell which compare
ran. ON BY DEFAULT since the round-11 continuation: an unadorned
`diffcheck sf0.1@x100` used to spend 46 minutes driver-collecting the
105M-row gapfill and then die on spark.driver.maxResultSize at the
next big query — a sweep-shaped footgun. At the driver-gate scales
every output is far below the threshold, so the default changes
nothing there (the take(N+1) classification IS the collect). Set
DIFFCHECK_BIG_ROWS=0 to force full driver collects regardless.

DIFFCHECK_ORACLE_TIMEOUT=<seconds>: interrupt any single DuckDB oracle
execution past the deadline (watchdog thread + con.interrupt()) and
record the query as "FAIL ... oracle timeout". At @x100 one runaway
oracle monopolized the host for 40+ minutes at 100 GB RSS / 21 GB of
spill — a bounded sweep with named stragglers beats an unbounded one
that may never report.

DIFFCHECK_DUCKDB_MEM=<e.g. 32GB>: cap DuckDB's memory so a heavy
oracle spills (or errors) instead of consuming the whole host."""

from __future__ import annotations

import sys
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


# spark simpleString / duckdb DESCRIBE type → common vocabulary, so the
# dtype compare flags int32-vs-int64 style drift the value compare hides
_CANON_TYPE = {
    "bigint": "i64",
    "int": "i32",
    "integer": "i32",
    "smallint": "i16",
    "double": "f64",
    "float": "f32",
    "string": "str",
    "varchar": "str",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "timestamp_ns": "ts",
    "date": "date",
    "boolean": "bool",
    "hugeint": "i128",
}


def canon_type(t: str) -> str:
    t = str(t).lower().strip()
    if t.startswith("array<") and t.endswith(">"):
        return f"arr<{canon_type(t[6:-1])}>"
    if t.endswith("[]"):
        return f"arr<{canon_type(t[:-2])}>"
    return _CANON_TYPE.get(t, t)


def canon(val) -> str:
    import datetime
    import math

    if val is None:
        return "NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(val)
    if isinstance(val, datetime.datetime):
        return val.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(val, datetime.date):
        return val.isoformat()
    if isinstance(val, list):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)


def rows_to_multiset(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def _oracle_exec(con, sql: str, timeout: float):
    """con.execute with an interrupt watchdog (module doc). DuckDB has
    no statement timeout; interrupt() from a sibling thread raises
    InterruptException in the executing call. Race guard: the watchdog
    can fire just as the query finishes, leaving a stale interrupt flag
    on the shared connection that would spuriously fail the NEXT
    query — when the watchdog fired but this query did not die of it,
    a throwaway statement absorbs the flag."""
    if not timeout:
        return con.execute(sql)
    import threading

    done = threading.Event()
    fired = threading.Event()

    def watchdog():
        if not done.wait(timeout) and not done.is_set():
            fired.set()
            con.interrupt()

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        result = con.execute(sql)
    except Exception:
        done.set()
        t.join()
        raise  # interrupt (or real error) consumed by this query
    done.set()
    t.join()
    if fired.is_set():
        try:
            con.execute("SELECT 1")
        except Exception:
            pass  # stale interrupt absorbed
    return result


def _big_compare(sdf, scount, scols, stypes, con, oracle, timeout=0.0) -> list[str]:
    """Engine-side compare for outputs too large to collect: row count
    + per-column order-free checksums (module doc). Returns problem
    strings; empty = pass at this (weaker, marked) level."""
    from pyspark.sql import functions as F

    ocount = _oracle_exec(
        con, f"SELECT count(*) FROM ({oracle})", timeout
    ).fetchone()[0]
    if scount != ocount:
        return [f"rowcount spark={scount} oracle={ocount}"]
    saggs, oexprs = [], []
    for c in scols:
        ct = canon_type(stypes[c])
        qc = f'"{c}"'
        saggs.append(F.count(F.col(c)).alias(f"cnt__{c}"))
        oexprs.append(f'count({qc}) AS "cnt__{c}"')
        if not ct.startswith("arr<"):
            saggs += [F.min(c).alias(f"min__{c}"), F.max(c).alias(f"max__{c}")]
            oexprs += [f'min({qc}) AS "min__{c}"', f'max({qc}) AS "max__{c}"']
        if ct in ("i16", "i32", "i64"):
            # exact order-free sums: decimal(38,0) on Spark, hugeint on
            # DuckDB — no float accumulation anywhere
            saggs.append(
                F.sum(F.col(c).cast("decimal(38,0)")).alias(f"sum__{c}")
            )
            oexprs.append(f'sum({qc}) AS "sum__{c}"')
        if ct in ("i16", "i32", "i64", "str", "date", "ts", "bool"):
            saggs.append(F.countDistinct(c).alias(f"dst__{c}"))
            oexprs.append(f'count(DISTINCT {qc}) AS "dst__{c}"')
    srow = sdf.agg(*saggs).collect()[0].asDict()
    ores = _oracle_exec(
        con, f"SELECT {', '.join(oexprs)} FROM ({oracle})", timeout
    )
    orow = dict(zip([d[0] for d in ores.description], ores.fetchone()))
    return [
        f"checksum {k}: spark={canon(srow[k])} oracle={canon(orow[k])}"
        for k in srow
        if canon(srow[k]) != canon(orow[k])
    ]


def main() -> int:
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    reg = load_all()
    unknown = only - set(reg)
    if unknown:
        # refuse, don't skip: a typo'd name otherwise yields "0 ok,
        # 0 fail", which reads like a clean run
        raise SystemExit(
            f"unknown query name(s): {sorted(unknown)} — "
            "see registry.load_all() for valid names"
        )
    spark = get_spark("diffcheck")

    # `<dir>@xN` amplifies the fact tables N-fold on BOTH engines,
    # mirroring catalog.load_table exactly — shared builder
    # (duck_views.py) so this tool and oracle_ratio can never drift on
    # the amplification semantics. The differential then runs at sf*N
    # scale with identical inputs on both engines.
    from .duck_views import create_testdata_views

    con = duckdb.connect()
    mem = os.environ.get("DIFFCHECK_DUCKDB_MEM")
    if mem:
        con.execute(f"PRAGMA memory_limit='{mem}'")
    oracle_timeout = float(os.environ.get("DIFFCHECK_ORACLE_TIMEOUT", "0") or 0)
    create_testdata_views(con, sf_dir)

    big_rows = int(os.environ.get("DIFFCHECK_BIG_ROWS", "2000000") or 0)
    n_pass = n_fail = n_rowsonly = n_big = 0
    for name, q in sorted(reg.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark.catalog.clearCache()  # no cross-query cache reuse or pinning
            sdf = q.fn(spark, sf_dir)
            scols = sdf.columns
            srows = None
            if big_rows and q.oracle is not None:
                # ONE execution classifies AND collects: take(N+1)
                # returning <= N rows IS the complete result (a
                # separate count() pre-pass re-ran every under-threshold
                # query's full plan — doubling sweep wall time)
                head = sdf.take(big_rows + 1)
                if len(head) <= big_rows:
                    srows = head
                else:
                    # engine-side compare (module doc): collect is not
                    # an option at this output size on either engine
                    scount = sdf.count()
                    stypes = dict(
                        zip(
                            sdf.columns,
                            [f.dataType.simpleString() for f in sdf.schema.fields],
                        )
                    )
                    problems = []
                    try:
                        otypes = {
                            r[0]: r[1]
                            for r in con.execute(
                                f"DESCRIBE {q.oracle}"
                            ).fetchall()
                        }
                        if sorted(scols) != sorted(otypes):
                            problems.append(
                                f"columns spark={sorted(scols)} "
                                f"oracle={sorted(otypes)}"
                            )
                        else:
                            problems += [
                                f"dtype {c}: spark={stypes[c]} oracle={otypes[c]}"
                                for c in scols
                                if canon_type(stypes[c]) != canon_type(otypes[c])
                            ]
                            problems += _big_compare(
                                sdf,
                                scount,
                                scols,
                                stypes,
                                con,
                                q.oracle,
                                oracle_timeout,
                            )
                    except Exception as e:  # noqa: BLE001
                        problems.append(f"oracle error: {e}")
                    if problems:
                        print(f"FAIL  {name}: " + "; ".join(problems))
                        n_fail += 1
                    else:
                        print(
                            f"big   {name}: {scount} rows, engine-side "
                            f"checksums ok [{time.time()-t0:.1f}s]"
                        )
                        n_big += 1
                    continue
            if srows is None:
                srows = sdf.collect()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}", flush=True)
            n_fail += 1
            continue
        if q.oracle is None:
            print(
                f"rows  {name}: {len(srows)} rows (no oracle) "
                f"[{time.time()-t0:.1f}s]",
                flush=True,
            )
            n_rowsonly += 1
            continue
        try:
            res = _oracle_exec(con, q.oracle, oracle_timeout)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}", flush=True)
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        else:
            stypes = dict(zip(sdf.columns, [f.dataType.simpleString() for f in sdf.schema.fields]))
            otypes = {
                r[0]: r[1] for r in con.execute(f"DESCRIBE {q.oracle}").fetchall()
            }
            for c in scols:
                if canon_type(stypes[c]) != canon_type(otypes[c]):
                    problems.append(f"dtype {c}: spark={stypes[c]} oracle={otypes[c]}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sm = rows_to_multiset(scols, [tuple(r) for r in srows])
            om = rows_to_multiset(ocols, orows)
            if sm != om:
                diffs = [
                    (x, y) for x, y in zip(sm, om) if x != y
                ][:3]
                problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems), flush=True)
            n_fail += 1
        else:
            print(
                f"ok    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]",
                flush=True,
            )
            n_pass += 1

    big_note = f", {n_big} big (engine-side checksums)" if n_big else ""
    print(f"\n{n_pass} ok, {n_rowsonly} rows-only{big_note}, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
