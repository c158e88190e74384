"""Round-14 optimization guard: asof_join_same_scan (one pass over a
shared source) must stay row-identical to the generic two-scan
asof_join it replaces in the same-source registered queries — across
directions, the tolerance path, NULL right timestamps, and (key, ts)
ties."""

from __future__ import annotations

import pytest

from weather_etl_pipeline_spark.operators.asof import (
    asof_join,
    asof_join_same_scan,
)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: error before and at the purchase ts (tie inclusive)
        (1, 1, "2024-01-01 10:00:00", "error"),
        (2, 1, "2024-01-01 11:00:00", "purchase"),
        (3, 1, "2024-01-01 11:00:00", "error"),
        # user 2: purchase with no prior error; later error
        (4, 2, "2024-01-01 09:00:00", "purchase"),
        (5, 2, "2024-01-01 12:00:00", "error"),
        # user 3: two errors at the same ts (carry tie-collapse)
        (6, 3, "2024-01-01 08:00:00", "error"),
        (7, 3, "2024-01-01 08:00:00", "error"),
        (8, 3, "2024-01-01 20:00:00", "purchase"),
        # NULL-ts error must be dropped, NULL-ts purchase kept
        (9, 1, None, "error"),
        (10, 2, None, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    )
    return df.selectExpr(
        "event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type"
    )


def _union_form(events, left_type, right_type, **kw):
    left = events.filter(f"event_type = '{left_type}'").select(
        "event_id", "user_id", "ts"
    )
    right = events.filter(f"event_type = '{right_type}'").select(
        "user_id", "ts"
    )
    return asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="ts", carry="ts", **kw
    )


def _same_scan_form(events, left_type, right_type, **kw):
    return asof_join_same_scan(
        events,
        key="user_id",
        ts="ts",
        carry="ts",
        left_pred=f"event_type = '{left_type}'",
        right_pred=f"event_type = '{right_type}'",
        left_cols=["event_id", "user_id", "ts"],
        **kw,
    )


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"direction": "forward"},
        {"tolerance_seconds": 3600},
    ],
    ids=["backward", "forward", "tolerance"],
)
def test_same_scan_matches_union_form(events, kw):
    a = _union_form(events, "purchase", "error", **kw)
    b = _same_scan_form(events, "purchase", "error", **kw)
    assert a.schema == b.schema
    key = lambda r: r["event_id"]
    assert sorted(a.collect(), key=key) == sorted(b.collect(), key=key)


def test_same_scan_null_left_pred_carries(spark):
    # round-15 ADVICE fix: when the two predicates reference DIFFERENT
    # columns, a right row (right_pred TRUE) whose left_pred evaluates
    # to NULL must still contribute its carry. Before the fix the
    # carry tag was NOT(left_pred) = NOT(NULL) = NULL and the carry was
    # silently dropped, diverging from the union form.
    rows = [
        # left row: is_purchase=true
        (1, 1, "2024-01-01 11:00:00", True, None),
        # right row: is_purchase=NULL (left_pred NULL), is_error=true
        (2, 1, "2024-01-01 10:00:00", None, True),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts string,"
        " is_purchase boolean, is_error boolean",
    ).selectExpr(
        "event_id",
        "user_id",
        "CAST(ts AS TIMESTAMP) AS ts",
        "is_purchase",
        "is_error",
    )
    left = ev.filter("is_purchase").select("event_id", "user_id", "ts")
    right = ev.filter("is_error").select("user_id", "ts")
    union = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="ts", carry="ts"
    )
    same = asof_join_same_scan(
        ev,
        key="user_id",
        ts="ts",
        carry="ts",
        left_pred="is_purchase",
        right_pred="is_error",
        left_cols=["event_id", "user_id", "ts"],
    )
    key = lambda r: r["event_id"]
    a = sorted(union.collect(), key=key)
    b = sorted(same.collect(), key=key)
    assert a == b
    # and the carry actually happened (non-NULL asof on the left row)
    assert b[0]["asof_ts"] is not None


def test_same_scan_single_scan_plan(events):
    # the point of the form: ONE scan of the shared source (the union
    # form plans two)
    plan = _same_scan_form(events, "purchase", "error")._jdf.queryExecution()
    txt = plan.executedPlan().toString()
    assert txt.lower().count("scan existingrdd") <= 1