"""CLI orchestrator — the reference's ``main.py`` re-expressed.

The reference's shipped run (``main.py:27-40``): connect → init metadata
→ ingest (4 cities, async HTTP) → bronze landing → silver incremental →
gold full-refresh. This CLI does the same against a lake root; with no
network (this environment) the ingestion step uses a deterministic fake
unless ``--live`` is passed.

    python -m weather_etl_pipeline_spark --lake /tmp/lake
    python -m weather_etl_pipeline_spark --lake /tmp/lake --gold-incremental
"""

from __future__ import annotations

import argparse
import datetime as dt
import sys


def _fake_fetch(city: str, lat: float, lon: float):
    """Offline stand-in for the Open-Meteo GET (deterministic per city/day)."""
    today = dt.date.today().isoformat()
    seed = sum(ord(c) for c in city)
    return {
        "current": {
            "time": f"{today}T12:00",
            "interval": 900,
            "temperature_2m": 10.0 + seed % 15,
            "wind_speed_10m": 2.0 + seed % 7,
            "wind_direction_10m": seed % 360,
            "weather_code": seed % 4,
        }
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="weather_etl_pipeline_spark")
    ap.add_argument("--lake", required=True, help="lake root directory")
    ap.add_argument("--gold-incremental", action="store_true",
                    help="incremental gold instead of the reference's full refresh")
    ap.add_argument("--live", action="store_true",
                    help="fetch from the real Open-Meteo API (needs network + httpx)")
    args = ap.parse_args(argv)

    from .plans.pipeline import LakePaths, run_pipeline
    from .session import get_spark
    from .sources.http_weather import DEFAULT_CITIES, fetch_all, to_bronze_df

    spark = get_spark("weather-pipeline-cli")
    if args.live:
        import httpx  # noqa: F401 — not installed here; --live is for real deployments

        def live_fetch(city: str, lat: float, lon: float):
            url = "https://api.open-meteo.com/v1/forecast"
            params = {
                "latitude": lat,
                "longitude": lon,
                "current": "temperature_2m,wind_speed_10m,wind_direction_10m,weather_code",
            }
            resp = httpx.get(url, params=params, timeout=10.0)
            resp.raise_for_status()
            return resp.json()

        fetch = live_fetch
    else:
        fetch = _fake_fetch

    payloads = fetch_all(DEFAULT_CITIES, fetch)
    bronze = to_bronze_df(spark, payloads)
    result = run_pipeline(
        spark,
        LakePaths(args.lake),
        bronze_df=bronze,
        gold_full_refresh=not args.gold_incremental,
    )
    print(result)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
