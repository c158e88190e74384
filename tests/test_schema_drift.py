"""Testdata schema-drift guard.

The driver regenerates /root/testdata between rounds and has already
shipped the same column under two physical encodings (events.ts as
parquet TIMESTAMP(NANOS) in r1-r2, plain timestamp[us] in r3). The r3
regression — one hard-coded physical type in catalog.load_table taking
down 32 queries — motivates this test: every table in every sf dir
present must load, and time columns must come back as a plain TIMESTAMP
regardless of how the file encodes them. A drift shows up here as ONE
targeted failure instead of a 30-row correctness wipe.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import TimestampType

from weather_etl_pipeline_spark.catalog import load_table
from weather_etl_pipeline_spark.schemas import TESTDATA_TABLES

TESTDATA_ROOT = "/root/testdata"

# columns load_table must surface as TIMESTAMP whatever the file stores
_TS_COLS = {"events": ["ts"]}


def _sf_dirs() -> list[str]:
    if not os.path.isdir(TESTDATA_ROOT):
        return []
    return sorted(
        os.path.join(TESTDATA_ROOT, d)
        for d in os.listdir(TESTDATA_ROOT)
        if d.startswith("sf") and os.path.isdir(os.path.join(TESTDATA_ROOT, d))
    )


@pytest.mark.parametrize("sf_dir", _sf_dirs() or ["<missing>"])
def test_every_table_loads_with_normalized_types(spark, sf_dir):
    if sf_dir == "<missing>":
        pytest.skip("no /root/testdata present")
    for name in TESTDATA_TABLES:
        if not os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            continue
        df = load_table(spark, sf_dir, name)
        # loads and has rows at every sf (schema resolution + one scan)
        assert df.limit(1).count() == 1, f"{name} @ {sf_dir} empty or unscannable"
        for c in _TS_COLS.get(name, []):
            assert isinstance(df.schema[c].dataType, TimestampType), (
                f"{name}.{c} @ {sf_dir}: expected TIMESTAMP after "
                f"load_table normalization, got {df.schema[c].dataType} — "
                "testdata physical encoding drifted; fix catalog._convert_long_ts_cols"
            )
