"""Dump .explain("formatted") for headline (or named) queries to
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence files.

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]
e.g.   python tools/dump_plans.py r14 before
       python tools/dump_plans.py r14 after dedup_minhash_lsh
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from weather_etl_pipeline_spark.registry import load_all  # noqa: E402
from weather_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(_REPO) / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    reg = load_all()
    if not names:
        names = sorted(n for n, q in reg.items() if q.headline)
    spark = get_spark("dump-plans")
    for name in names:
        spark.catalog.clearCache()
        df = reg[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {n_ex} Exchange -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
