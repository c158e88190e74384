"""Shim — implementation moved to weather_etl_pipeline_spark.tools
.oracle_ratio (installed console entry point: `weather-etl-oracle-ratio`).
Keeps `python tools/oracle_ratio.py` working from a checkout."""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from weather_etl_pipeline_spark.tools.oracle_ratio import main  # noqa: E402

if __name__ == "__main__":
    main()
