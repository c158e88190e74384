"""Declared schemas (FIXTURES.md).

Two families: the weather-domain medallion zones that define the
reference's semantics (reference ``bronze.py:12-17``, ``silver.py:28-35``,
``gold.py:71-77``, ``metadata.py:2-9``), and the driver test tables at
``/root/testdata/sf*``. Silver/gold/metadata schemas are *declared*, not
inferred — the reference's schema regime hardens layer by layer
(SURVEY.md section 1.4) and we enforce that with explicit StructTypes.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- weather medallion zones -------------------------------------------------

# Bronze: raw landing. Types as the ingestion JSON produces them; city/date
# are Hive partition columns (directory-encoded, not stored in the files).
WEATHER_BRONZE_FILE = T.StructType(
    [
        T.StructField("time", T.StringType()),
        T.StructField("interval", T.LongType()),
        T.StructField("temperature_2m", T.DoubleType()),
        T.StructField("wind_speed_10m", T.DoubleType()),
        T.StructField("wind_direction_10m", T.LongType()),
        T.StructField("weather_code", T.LongType()),
    ]
)

# Bronze + the city tag the ingestion side attaches before the write
# (date is derived from `time` at landing). Built as a fresh StructType —
# StructType.add() mutates in place, so never call it on a shared schema.
WEATHER_BRONZE_WITH_CITY = T.StructType(
    list(WEATHER_BRONZE_FILE.fields) + [T.StructField("city", T.StringType())]
)

# Silver: cleaned/typed (reference silver.py:28-35 projection).
WEATHER_SILVER = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("temperature", T.DoubleType()),
        T.StructField("wind_speed", T.DoubleType()),
        T.StructField("wind_direction", T.IntegerType()),
        T.StructField("weather_code", T.IntegerType()),
        T.StructField("city", T.StringType()),
        T.StructField("date", T.DateType()),
    ]
)

# Gold: aggregate shape (reference gold.py:71-77).
WEATHER_GOLD = T.StructType(
    [
        T.StructField("avg_temp", T.DoubleType()),
        T.StructField("max_temp", T.DoubleType()),
        T.StructField("min_temp", T.DoubleType()),
        T.StructField("record_count", T.LongType()),
        T.StructField("city", T.StringType()),
        T.StructField("date", T.DateType()),
    ]
)

# pipeline_metadata: watermark table (reference metadata.py:2-9). The
# composite key (layer, city, date) is enforced by the upsert op, not the
# engine (Spark has no PK constraint) — see plans/metadata.py.
PIPELINE_METADATA = T.StructType(
    [
        T.StructField("layer", T.StringType(), False),
        T.StructField("city", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("processed_at", T.TimestampType(), False),
    ]
)

METADATA_KEY = ["layer", "city", "date"]

def assert_schema(df, expected: T.StructType, where: str = "") -> None:
    """Schema gate (SURVEY.md §1.4): silver/gold shapes are DECLARED, not
    inferred — fail fast when a projection drifts. Compares names and
    types order-insensitively; nullability is advisory in Spark and is
    deliberately not compared."""
    got = {f.name: f.dataType for f in df.schema.fields}
    want = {f.name: f.dataType for f in expected.fields}
    if got != want:
        missing = {k: v for k, v in want.items() if got.get(k) != v}
        extra = {k: v for k, v in got.items() if want.get(k) != v}
        raise TypeError(
            f"schema drift{' in ' + where if where else ''}: "
            f"expected-but-wrong {missing}; got {extra}"
        )


# --- driver test tables (FIXTURES.md section 2) ------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
