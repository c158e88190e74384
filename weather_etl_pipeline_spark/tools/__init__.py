"""Installed operational tooling (PEP 621 console entry points).

These modules are the engine's runbook surface — the oracle
differential (`weather-etl-diffcheck`), the headline bench
(`weather-etl-bench`), the interleaved Spark-vs-DuckDB ratio
(`weather-etl-oracle-ratio`) and the curation stream runner
(`weather-etl-curate`). The repo-root `bench.py` and `tools/*.py`
shims delegate here so the historical invocations (`python bench.py`,
`python tools/diffcheck.py ...`) keep working from a checkout."""
