"""Repo-root bench shim — the driver contract entry point.

The implementation lives in the installed package
(`weather_etl_pipeline_spark.tools.bench`; console entry point
`weather-etl-bench`). This shim keeps the historical `python bench.py`
invocation working from a checkout without installation, and pins the
ledger/git-head directory to the repo root regardless of cwd."""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from weather_etl_pipeline_spark.tools.bench import main  # noqa: E402

if __name__ == "__main__":
    main(repo_dir=_REPO)
