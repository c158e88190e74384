"""Additional source/sink formats: CSV, JSON-lines, ORC + gated
lakehouse connectors.

The reference's lake is parquet-only; a complete engine speaks the
other columnar/row formats for ingest/egress interchange. All three are
built-in Spark datasources (schema declared, never inferred, per the
silver-layer schema regime).

Delta/Iceberg need jars absent from this environment — exposed behind
``try_delta_writer`` so call sites degrade cleanly (SURVEY.md §7 /
pyspark guide: "stub connectors behind an import-try").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).option("header", True).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def try_delta_writer(df: DataFrame, path: str) -> bool:
    """Write as a Delta table if delta-spark is importable; else False.

    With Delta available, plans/metadata.py's upsert becomes a MERGE
    INTO and the zones gain ACID + time travel — the call sites are
    already shaped for that swap.
    """
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    df.write.format("delta").mode("overwrite").save(path)
    return True
