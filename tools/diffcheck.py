"""Shim — implementation moved to weather_etl_pipeline_spark.tools.diffcheck
(installed console entry point: `weather-etl-diffcheck`). Keeps the
historical `python tools/diffcheck.py [sf_dir] [query ...]` invocation
working from a checkout without installation."""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from weather_etl_pipeline_spark.tools.diffcheck import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
