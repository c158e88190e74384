"""As-of join (extension surface — an operator Spark lacks natively).

For each left-side event, attach the most recent right-side event at or
before it (per key). Implemented as composition of built-in ops — the
preferred strategy for custom operators (SURVEY.md §7.3):

    union the two tagged streams → one window sort per key →
    last non-null carried value (ignoreNulls last_value) → filter left rows

One shuffle on the key, one sort — same cost as a window function, no
UDF, no per-group pandas. This beats the ``merge_asof``-in-pandas
route at scale because state never leaves the JVM and skewed keys are
handled by AQE like any other window.

Demo: for each 'purchase' event, the timestamp of the same user's most
recent 'error' event at or before it. The oracle is a correlated MAX
subquery (deterministic — ties collapse to the same max).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    carry: str,
) -> DataFrame:
    """Generic as-of: left rows + ``asof_<carry>`` = last right ``carry``
    with right_ts <= left_ts within the key group."""
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
        F.lit(None).cast(right.schema[carry].dataType).alias("_carry"),
    )
    # determinism guards on the right side:
    # - drop NULL timestamps (they sort NULLS FIRST and would forward-
    #   fill their carry into every left row);
    # - collapse ties on (key, ts) to max(carry) — otherwise the carried
    #   value at a tied timestamp depends on shuffle order
    right = right.filter(F.col(right_ts).isNotNull())
    if carry == right_ts:
        right = right.select(key, right_ts).distinct()
    else:
        right = right.groupBy(key, right_ts).agg(F.max(carry).alias(carry))
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_row"].dataType).alias("_row"),
        F.col(carry).alias("_carry"),
    )
    # right rows sort before left rows at equal timestamps so "at or
    # before" includes ties
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_asof", F.last("_carry", ignorenulls=True).over(w))
    return (
        carried.filter(F.col("_is_left") == 1)
        .select("_row.*", F.col("_asof").alias(f"asof_{carry}"))
    )


@register(
    "asof_join_last_error",
    headline=True,
    oracle="""
SELECT p.event_id, p.user_id, p.ts,
       (SELECT MAX(e.ts) FROM events e
        WHERE e.user_id = p.user_id AND e.event_type = 'error'
          AND e.ts <= p.ts) AS asof_ts
FROM events p
WHERE p.event_type = 'purchase'
""",
)
def asof_join_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts")
    return asof_join(
        purchases, errors, key="user_id", left_ts="ts", right_ts="ts", carry="ts"
    )
