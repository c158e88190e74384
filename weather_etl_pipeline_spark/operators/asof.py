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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Generic as-of: left rows + ``asof_<carry>`` = nearest right
    ``carry`` within the key group — the last right row with
    right_ts <= left_ts (``direction="backward"``, the default) or the
    first with right_ts >= left_ts (``direction="forward"``).

    Forward mode is the same union-sort-carry plan run over a
    descending timestamp order: "last preceding row in descending
    order" IS the nearest following row, so no second implementation
    is needed and the cost model (one shuffle + one sort per key) is
    identical.

    ``tolerance_seconds`` (pandas ``merge_asof(tolerance=...)``):
    matches farther than the tolerance from the left timestamp come
    back NULL. Applied as a post-carry filter on the matched right
    timestamp — nulling the NEAREST match outside the window is
    equivalent to restricting the match range, because the nearest
    match being outside implies no right row inside. Zero extra
    shuffles.
    """
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
        F.lit(None).cast(right.schema[carry].dataType).alias("_carry"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
    )
    # determinism guards on the right side:
    # - drop NULL timestamps (they sort NULLS FIRST and would forward-
    #   fill their carry into every left row);
    # - ties on (key, ts) resolve INSIDE the carry window (round 9):
    #   right rows at equal timestamps are ordered by carry (asc
    #   backward / desc forward), so the last() below returns
    #   max(carry) backward / min(carry) forward — the same
    #   deterministic tie-collapse the previous groupBy(key, ts)
    #   performed, without its extra exchange. The whole as-of is now
    #   ONE shuffle (the window's partitionBy) instead of two.
    right = right.filter(F.col(right_ts).isNotNull())
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_row"].dataType).alias("_row"),
        F.col(carry).alias("_carry"),
        # _rts is NULL exactly when _carry is NULL: both ignorenulls
        # lasts below then skip the SAME rows, so the tolerance gap is
        # always measured against the row whose carry is returned. (With
        # an unconditional _rts, a nearer null-carry right row would
        # anchor the gap while the returned carry came from a farther
        # row — letting an out-of-tolerance carry through.)
        F.when(F.col(carry).isNotNull(), F.col(right_ts)).alias("_rts"),
    )
    # right rows sort before left rows at equal timestamps so "at or
    # before" / "at or after" includes ties; forward mode flips the
    # timestamp order so "preceding" means "following in event time"
    u = l_tag.unionByName(r_tag)
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    # third order key = the tie-collapse: among right rows at one
    # (key, ts), the winning carry sorts LAST so last(ignorenulls)
    # returns it (null-carry rows are skipped by ignorenulls, so their
    # position is immaterial); left rows (_is_left=1) still sort after
    # all right rows at the same timestamp, keeping ties inclusive
    tie_order = (
        F.col("_carry").asc() if direction == "backward" else F.col("_carry").desc()
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(ts_order, F.col("_is_left").asc(), tie_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        "_asof", F.last("_carry", ignorenulls=True).over(w)
    ).withColumn("_asof_rts", F.last("_rts", ignorenulls=True).over(w))
    out = carried.filter(F.col("_is_left") == 1)
    asof = F.col("_asof")
    if tolerance_seconds is not None:
        # epoch-seconds gap of the MATCHED right row vs the left row
        gap = (
            F.col("_ts").cast("double") - F.col("_asof_rts").cast("double")
            if direction == "backward"
            else F.col("_asof_rts").cast("double") - F.col("_ts").cast("double")
        )
        asof = F.when(gap <= F.lit(float(tolerance_seconds)), asof)
    return out.select("_row.*", asof.alias(f"asof_{carry}"))


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


@register(
    "asof_join_next_purchase",
    oracle="""
SELECT e.event_id, e.user_id, e.ts,
       (SELECT MIN(p.ts) FROM events p
        WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
          AND p.ts >= e.ts) AS asof_ts
FROM events e
WHERE e.event_type = 'error'
""",
)
def asof_join_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for each error, the same user's next purchase at
    or after it — the time-to-recovery shape. Oracle is a correlated
    MIN subquery (deterministic: ties collapse to the same min)."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    return asof_join(
        errors,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        carry="ts",
        direction="forward",
    )


@register(
    "asof_join_tolerance",
    oracle="""
SELECT p.event_id, p.user_id, p.ts,
       (SELECT MAX(e.ts) FROM events e
        WHERE e.user_id = p.user_id AND e.event_type = 'error'
          AND e.ts <= p.ts AND e.ts >= p.ts - INTERVAL 1 HOUR) AS asof_ts
FROM events p
WHERE p.event_type = 'purchase'
""",
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a 1-hour tolerance (pandas merge_asof
    ``tolerance=`` semantics): matches older than the window come back
    NULL. The oracle constrains the correlated MAX's range instead —
    equivalent, because the nearest match being outside the window
    implies no match inside it."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts")
    return asof_join(
        purchases,
        errors,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        carry="ts",
        tolerance_seconds=3600,
    )
