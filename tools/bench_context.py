"""Shim — implementation moved to weather_etl_pipeline_spark.tools
.bench_context. Keeps `from tools.bench_context import bench_context`
and the standalone host-check invocation working from a checkout."""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from weather_etl_pipeline_spark.tools.bench_context import (  # noqa: E402,F401
    bench_context,
    parquet_layout,
)

if __name__ == "__main__":
    import json
    import os

    from weather_etl_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-context")
    print(json.dumps(bench_context(spark, sf_dir)))
    spark.stop()
