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

from pyspark.sql import DataFrame, SparkSession

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
    # Built as selectExpr SQL (round 14): the Column-API form cost
    # ~0.3s of py4j round trips per invocation; the parsed expressions
    # — and the one-shuffle union-sort-carry plan — are identical.
    carry_t = right.schema[carry].dataType.simpleString()
    rts_t = right.schema[right_ts].dataType.simpleString()
    row_t = (
        "struct<"
        + ", ".join(f.name + ":" + f.dataType.simpleString() for f in left.schema)
        + ">"
    )
    l_tag = left.selectExpr(
        f"`{key}` AS _k",
        f"`{left_ts}` AS _ts",
        "1 AS _is_left",
        "struct(" + ", ".join(f"`{c}`" for c in left.columns) + ") AS _row",
        f"CAST(NULL AS {carry_t}) AS _carry",
        f"CAST(NULL AS {rts_t}) AS _rts",
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
    r_tag = right.filter(f"`{right_ts}` IS NOT NULL").selectExpr(
        f"`{key}` AS _k",
        f"`{right_ts}` AS _ts",
        "0 AS _is_left",
        f"CAST(NULL AS {row_t}) AS _row",
        f"`{carry}` AS _carry",
        # _rts is NULL exactly when _carry is NULL: both ignorenulls
        # lasts below then skip the SAME rows, so the tolerance gap is
        # always measured against the row whose carry is returned. (With
        # an unconditional _rts, a nearer null-carry right row would
        # anchor the gap while the returned carry came from a farther
        # row — letting an out-of-tolerance carry through.)
        f"CASE WHEN `{carry}` IS NOT NULL THEN `{right_ts}` END AS _rts",
    )
    return _carry_and_project(
        l_tag.unionByName(r_tag), carry, direction, tolerance_seconds
    )


def asof_join_same_scan(
    df: DataFrame,
    key: str,
    ts: str,
    carry: str,
    left_pred: str,
    right_pred: str,
    left_cols: list[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Same-source as-of: both sides are predicate slices of ONE table.

    The generic ``asof_join`` unions two scans of that table — at scale
    that is two full passes over the input for one logical read. This
    form tags sides with CASE expressions in a single projection over a
    single scan (guide §1.2: remove unnecessary passes — measured
    0.27 vs 0.37s best at sf0.1 with byte-identical output, and half
    the input bytes at any scale). The tagged schema, ordering and
    carry window are the exact ones ``_carry_and_project`` gives the
    union form, so the two forms cannot drift.

    Contract: ``left_pred`` and ``right_pred`` must be DISJOINT (a row
    satisfying both would become one left row here but two rows in the
    union form); right rows with NULL ``ts`` are dropped exactly like
    the union form's right-side isNotNull guard.
    """
    row = "struct(" + ", ".join(f"`{c}`" for c in left_cols) + ")"
    # side tag evaluated ONCE: NULL left_pred means "not left", i.e. a
    # kept row (right_pred TRUE) whose left_pred is NULL must carry like
    # the union form's right side would. A bare NOT(left_pred) yields
    # NULL there and silently dropped the carry (round-15 ADVICE fix) —
    # COALESCE(.., false) restores three-valued-logic parity with the
    # union form for predicates over different columns.
    not_left = f"NOT coalesce(({left_pred}), false)"
    tagged = df.filter(
        f"({left_pred}) OR (({right_pred}) AND `{ts}` IS NOT NULL)"
    ).selectExpr(
        f"`{key}` AS _k",
        f"`{ts}` AS _ts",
        f"CASE WHEN {left_pred} THEN 1 ELSE 0 END AS _is_left",
        f"CASE WHEN {left_pred} THEN {row} END AS _row",
        f"CASE WHEN {not_left} THEN `{carry}` END AS _carry",
        # _rts NULL exactly when _carry is NULL — see asof_join
        f"CASE WHEN {not_left} AND `{carry}` IS NOT NULL"
        f" THEN `{ts}` END AS _rts",
    )
    return _carry_and_project(tagged, carry, direction, tolerance_seconds)


def _carry_and_project(
    u: DataFrame,
    carry: str,
    direction: str,
    tolerance_seconds: float | None,
) -> DataFrame:
    """The shared window-carry stage over a tagged (_k, _ts, _is_left,
    _row, _carry, _rts) frame — single definition so the union and
    same-scan forms stay byte-identical.

    right rows sort before left rows at equal timestamps so "at or
    before" / "at or after" includes ties; forward mode flips the
    timestamp order so "preceding" means "following in event time".
    third order key = the tie-collapse: among right rows at one
    (key, ts), the winning carry sorts LAST so last(ignorenulls)
    returns it (null-carry rows are skipped by ignorenulls, so their
    position is immaterial); left rows (_is_left=1) still sort after
    all right rows at the same timestamp, keeping ties inclusive."""
    order = (
        "_ts ASC, _is_left ASC, _carry ASC"
        if direction == "backward"
        else "_ts DESC, _is_left ASC, _carry DESC"
    )
    over = (
        f"OVER (PARTITION BY _k ORDER BY {order}"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    out = u.selectExpr(
        "*",
        f"last(_carry, true) {over} AS _asof",
        f"last(_rts, true) {over} AS _asof_rts",
    ).filter("_is_left = 1")
    asof = "_asof"
    if tolerance_seconds is not None:
        # epoch-seconds gap of the MATCHED right row vs the left row
        gap = (
            "CAST(_ts AS DOUBLE) - CAST(_asof_rts AS DOUBLE)"
            if direction == "backward"
            else "CAST(_asof_rts AS DOUBLE) - CAST(_ts AS DOUBLE)"
        )
        asof = (
            f"CASE WHEN ({gap}) <= {float(tolerance_seconds)}"
            " THEN _asof END"
        )
    return out.selectExpr("_row.*", f"{asof} AS `asof_{carry}`")


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
    # both sides slice the events table → single-scan form (one pass
    # over the input instead of the generic union's two)
    ev = load_table(spark, sf_dir, "events")
    return asof_join_same_scan(
        ev,
        key="user_id",
        ts="ts",
        carry="ts",
        left_pred="event_type = 'purchase'",
        right_pred="event_type = 'error'",
        left_cols=["event_id", "user_id", "ts"],
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
    return asof_join_same_scan(
        ev,
        key="user_id",
        ts="ts",
        carry="ts",
        left_pred="event_type = 'error'",
        right_pred="event_type = 'purchase'",
        left_cols=["event_id", "user_id", "ts"],
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
    return asof_join_same_scan(
        ev,
        key="user_id",
        ts="ts",
        carry="ts",
        left_pred="event_type = 'purchase'",
        right_pred="event_type = 'error'",
        left_cols=["event_id", "user_id", "ts"],
        tolerance_seconds=3600,
    )
