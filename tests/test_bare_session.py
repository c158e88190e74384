"""Driver-portability differential: results must not depend on
session.get_spark's tuned configs.

The external correctness driver builds its OWN bare SparkSession — no
UTC pin, no AQE floor, no codegen-cache bump, no dynamic-overwrite
mode. Every registry query therefore has to carry its semantics in the
PLAN (catalog.load_table self-pins timezone + nanos handling; the
decimal policy lives in expressions), with get_spark contributing
performance only. This test runs the most conf-sensitive queries in a
bare-session SUBPROCESS (one SparkContext per process) and requires
row-for-row equality with the tuned in-suite session: a query that
silently starts depending on a get_spark conf fails here before it
fails in the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import json
import subprocess
import sys

SF = "/root/testdata/sf0.001"

# timestamps + nanos normalization, decimal policy, session windows,
# JSON extraction, dedup canonicalization — the semantics most likely
# to drift under a session with different timezone/conf defaults
QUERIES = [
    "q1_pricing_summary",
    "timeseries_gapfill_hourly",
    "stream_session_windows",
    "json_extract_agg",
    "dedup_exact_canonical",
]

_SUBPROC = r"""
import json, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("bare-driver-twin")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from weather_etl_pipeline_spark.registry import load_all

reg = load_all()
out = {}
for name in %(queries)s:
    rows = reg[name].fn(spark, %(sf)r).collect()
    out[name] = sorted(repr(tuple(r)) for r in rows)
print("RESULT:" + json.dumps(out))
spark.stop()
"""


def test_bare_session_matches_tuned_session(spark):
    tuned = {}
    from weather_etl_pipeline_spark.registry import load_all

    reg = load_all()
    for name in QUERIES:
        rows = reg[name].fn(spark, SF).collect()
        tuned[name] = sorted(repr(tuple(r)) for r in rows)
        assert tuned[name], f"{name}: empty result at {SF}"

    script = _SUBPROC % {"queries": QUERIES, "sf": SF}
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    payload = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert payload, proc.stdout[-2000:]
    bare = json.loads(payload[0][len("RESULT:") :])
    for name in QUERIES:
        assert bare[name] == tuned[name], (
            f"{name}: bare-session result diverges from tuned session "
            f"(first bare row {bare[name][:1]} vs tuned {tuned[name][:1]})"
        )
