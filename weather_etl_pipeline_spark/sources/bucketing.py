"""Bucketed tables + skew salting — the co-located-join toolkit.

At 100 TB the dominant cost of fact-fact joins is the shuffle. Two
levers, both demonstrated and tested here:

- **Bucketing** (``bucketBy`` at write time): both tables hashed into
  the same bucket count on the join key persist pre-partitioned; a
  later equi-join on that key is a zero-exchange sort-merge join
  (asserted in tests). This is Spark's answer to the reference's
  single-node "everything is local" luxury.
- **Salting**: a hot key is split into N sub-keys; the small side is
  exploded N ways so every sub-key still finds its match. Turns one
  straggler partition into N even ones. (AQE's skew-join handles
  moderate skew automatically — salting is for the pathological tail.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 16
) -> None:
    """Persist as a bucketed managed table (co-location at rest)."""
    import os
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a crashed previous writer can leave the managed location behind
    loc = os.path.join(
        spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"), table_name
    )
    if os.path.exists(loc):
        shutil.rmtree(loc)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_pair: tuple[str, str]
) -> DataFrame:
    """Join two tables bucketed on their join keys — no exchange."""
    lk, rk = key_pair
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[lk] == right[rk])


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, explode the small side.

    Result is identical to ``big.join(small, key)``; the shuffle key
    becomes (key, salt) so a hot key spreads over n_salts partitions.
    """
    big_s = big.withColumn(
        "_salt", (F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)))
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    out = big_s.join(small_s, [key, "_salt"])
    return out.drop("_salt")
