"""Local oracle-differential harness — mimics the driver's compare.

Runs every registered query on Spark AND its DuckDB oracle twin at the
given sf dir, then compares row count, column names/order-insensitive
value multiset. Values are compared EXACTLY (stringified) — if this
passes, any reasonable driver hash passes too.

Usage:  python tools/diffcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from weather_etl_pipeline_spark.registry import load_all  # noqa: E402
from weather_etl_pipeline_spark.schemas import TESTDATA_TABLES  # noqa: E402
from weather_etl_pipeline_spark.session import get_spark  # noqa: E402


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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    reg = load_all()
    spark = get_spark("diffcheck")

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_rowsonly = 0
    for name, q in sorted(reg.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark.catalog.clearCache()  # no cross-query cache reuse or pinning
            sdf = q.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(q.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
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
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
