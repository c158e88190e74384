"""Custom Spark Python DataSource for weather observations (Spark 4 API).

The reference fetches weather on the DRIVER (4 cities, asyncio —
``ingestion.py:36-45``); the scale path distributes the fetch: each
city list shard becomes a DataSource partition whose ``read()`` runs on
an EXECUTOR. This implements that shape with Spark 4's
``pyspark.sql.datasource`` API:

    spark.dataSource.register(WeatherObservationsSource)
    df = (spark.read.format("weather_obs")
          .option("date", "2026-02-13")
          .option("hours", "24")
          .load())

Per-partition work is one city's full day of observations. The fetch
itself is pluggable exactly like sources/http_weather.py: with no
network in this environment the default is a DETERMINISTIC synthetic
generator (seeded by city+timestamp, so re-reads are reproducible and
tests can assert values); a production deployment swaps
``_observe`` for the HTTP GET + retry loop — partitioning, schema and
executor placement don't change.
"""

from __future__ import annotations

from datetime import date, datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from ..schemas import WEATHER_BRONZE_WITH_CITY
from .http_weather import DEFAULT_CITIES

# derived from the declared bronze schema — one source of truth for the
# ingestion shape (hand-written DDL would drift silently)
_SCHEMA_DDL = ", ".join(
    f"{f.name} {f.dataType.simpleString()}" for f in WEATHER_BRONZE_WITH_CITY.fields
)


def _parse_options(options: dict) -> tuple[str, int, int, list[str]]:
    """(day, hours, hours_per_batch, cities) — shared by the batch and
    streaming readers so the two paths cannot disagree on semantics."""
    day = options.get("date", date.today().isoformat())
    hours = int(options.get("hours", "24"))
    hours_per_batch = int(options.get("hoursPerBatch", "6"))
    cities = [
        c.strip()
        for c in options.get(
            "cities", ",".join(c for c, _, _ in DEFAULT_CITIES)
        ).split(",")
        if c.strip()
    ]
    return day, hours, hours_per_batch, cities


def _observe(city: str, ts: datetime) -> tuple:
    """Deterministic synthetic observation (production: HTTP GET here).

    crc32, not hash(): Python string hashing is salted per process, so
    hash() would give every executor (and every run) different data.
    """
    import zlib

    seed = zlib.crc32(f"{city}|{ts.isoformat()}".encode()) % 1000
    return (
        ts.strftime("%Y-%m-%dT%H:%M"),
        900,
        round(-5.0 + (seed % 400) / 10.0, 1),
        round((seed % 150) / 10.0, 1),
        seed % 360,
        seed % 4,
        city,
    )


class _CityPartition(InputPartition):
    def __init__(self, city: str, day: str, hours: int):
        self.city = city
        self.day = day
        self.hours = hours


class WeatherObservationsReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.options = options

    def partitions(self):
        day, hours, _, cities = _parse_options(self.options)
        return [_CityPartition(c, day, hours) for c in cities]

    def read(self, partition: _CityPartition):
        start = datetime.fromisoformat(partition.day)
        for h in range(partition.hours):
            yield _observe(partition.city, start + timedelta(hours=h))


class WeatherObservationsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch feed: offset = observation-hour index. Each poll
    emits every city's next unseen hours (bounded by the ``hours``
    option so tests drain it with processAllAvailable) — the true
    streaming upgrade of the reference's scheduled batch re-runs."""

    def __init__(self, schema: StructType, options: dict):
        self.day, self.max_hours, self.hours_per_batch, self.cities = (
            _parse_options(options)
        )

    def initialOffset(self) -> dict:
        # the resolved day travels IN THE OFFSET: with a wall-clock
        # default, a reader rebuilt after a midnight restart would
        # otherwise replay checkpointed hour ranges against a different
        # day — breaking exact replay
        return {"hour": 0, "day": self.day}

    def read(self, start: dict):
        h0 = start["hour"]
        h1 = min(h0 + self.hours_per_batch, self.max_hours)
        return self._rows(start["day"], h0, h1), {"hour": h1, "day": start["day"]}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["day"], start["hour"], end["hour"])

    def _rows(self, day: str, h0: int, h1: int):
        # a list_iterator: Spark's wrapper requires an iterator, and it
        # must be picklable for prefetch/replay (generators are not;
        # plain lists are not iterators)
        base = datetime.fromisoformat(day)
        return iter(
            [
                _observe(city, base + timedelta(hours=h))
                for h in range(h0, h1)
                for city in self.cities
            ]
        )


class WeatherObservationsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "weather_obs"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return WeatherObservationsReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return WeatherObservationsStreamReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(WeatherObservationsSource)
