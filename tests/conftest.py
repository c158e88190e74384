from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# protobuf proxy for transformWithState (tests/_protobuf_shim/README.md):
# engaged ONLY when no real google.protobuf exists, and BEFORE any
# SparkSession is built — the JVM inherits this process's PYTHONPATH,
# which is how the spawned streaming Python runner (a fresh process,
# not a fork of this one) finds the proxy too.
try:  # pragma: no cover — branch depends on the host environment
    import google.protobuf  # noqa: F401
except ImportError:
    _SHIM = REPO / "tests" / "_protobuf_shim"
    _impl = Path(
        "/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk/google/protobuf"
    )
    if _impl.is_dir():
        import os

        sys.path.insert(0, str(_SHIM))
        os.environ["PYTHONPATH"] = (
            f"{_SHIM}:{os.environ['PYTHONPATH']}"
            if os.environ.get("PYTHONPATH")
            else str(_SHIM)
        )

from weather_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from weather_etl_pipeline_spark.catalog import clear_table_cache

    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s
    # drop memoized table handles BEFORE stopping: cached DataFrames
    # reference the stopped session and must not outlive it
    clear_table_cache()
    s.stop()


@pytest.fixture()
def lake(tmp_path):
    from weather_etl_pipeline_spark.plans.pipeline import LakePaths

    return LakePaths(str(tmp_path / "lake"))
