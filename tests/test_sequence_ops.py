"""Planted-fixture tests for as-of join and sessionization."""

import datetime as dt

from aws_dms_cdc_data_pipeline_spark.operators.asof import asof_join
from aws_dms_cdc_data_pipeline_spark.operators.sessionize import sessionize


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 12, minute, second)


def test_asof_join_planted(spark):
    purchases = spark.createDataFrame(
        [
            (101, 1, _ts(10), 9.99),   # after visits at :05 and :08 → :08
            (102, 1, _ts(5), 5.00),    # exactly AT a visit ts → matches it (<=)
            (103, 2, _ts(1), 1.00),    # before any visit → NULL
            (104, 3, _ts(30), 3.00),   # user with no visits at all → NULL
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    visits = spark.createDataFrame(
        [
            (201, 1, _ts(5)),
            (202, 1, _ts(8)),
            (203, 2, _ts(2)),
            (204, 1, _ts(8)),  # duplicate ts — higher event_id wins
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = {
        r.event_id: (r.asof_event_id, r.asof_ts)
        for r in asof_join(
            purchases,
            visits,
            on="user_id",
            left_ts="ts",
            right_ts="ts",
            right_order="event_id",
            right_payload=["event_id", "ts"],
        ).collect()
    }
    assert out[101] == (204, _ts(8))   # latest visit, tie → max event_id
    assert out[102] == (201, _ts(5))   # <= semantics: same-instant visit matches
    assert out[103] == (None, None)
    assert out[104] == (None, None)
    assert len(out) == 4               # every left row preserved


def test_asof_join_string_order_deterministic(spark):
    # string event-ids used to be cast("long") → NULL → nondeterministic
    # equal-timestamp ties; native-type ordering keeps them lexicographic
    purchases = spark.createDataFrame(
        [(101, 1, _ts(10), 9.99)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    visits = spark.createDataFrame(
        [("ev-a", 1, _ts(8)), ("ev-z", 1, _ts(8)), ("ev-m", 1, _ts(8))],
        "event_id string, user_id long, ts timestamp",
    )
    for _ in range(3):  # would flap across runs under the old NULL cast
        (row,) = asof_join(
            purchases, visits,
            on="user_id", left_ts="ts", right_ts="ts",
            right_order="event_id", right_payload=["event_id"],
        ).collect()
        assert row.asof_event_id == "ev-z"   # lexicographic max wins ties


def test_asof_join_rejects_non_orderable_order_col(spark):
    import pytest

    purchases = spark.createDataFrame(
        [(1, _ts(10))], "user_id long, ts timestamp")
    visits = spark.createDataFrame(
        [(1, _ts(8), {"a": 1})], "user_id long, ts timestamp, meta map<string,int>")
    with pytest.raises(TypeError, match="non-orderable"):
        asof_join(purchases, visits, on="user_id", left_ts="ts",
                  right_ts="ts", right_order="meta", right_payload=["ts"])


def test_sessionize_planted(spark):
    events = spark.createDataFrame(
        [
            (1, 1, _ts(0)),
            (2, 1, _ts(10)),          # 10 min gap → same session
            (3, 1, _ts(50)),          # 40 min gap → new session
            (4, 1, _ts(50)),          # duplicate ts → same session, id order
            (5, 2, _ts(0)),           # other user → own numbering
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = {r.event_id: (r.session_idx, r.session_id)
           for r in sessionize(events, gap_minutes=30).collect()}
    assert out[1] == (1, "1-1")
    assert out[2] == (1, "1-1")
    assert out[3] == (2, "1-2")
    assert out[4] == (2, "1-2")
    assert out[5] == (1, "2-1")


def test_sessionize_gap_boundary_is_exclusive(spark):
    # gap of exactly 30:00 does NOT start a new session (> not >=)
    events = spark.createDataFrame(
        [(1, 1, _ts(0)), (2, 1, _ts(30)), (3, 1, _ts(0, 1))],
        "event_id long, user_id long, ts timestamp",
    )
    out = {r.event_id: r.session_idx
           for r in sessionize(events, gap_minutes=30).collect()}
    assert out == {1: 1, 3: 1, 2: 1}


def _asof(purchases, visits, **kw):
    return {
        r.event_id: (r.asof_event_id, r.asof_ts)
        for r in asof_join(
            purchases,
            visits,
            on="user_id",
            left_ts="ts",
            right_ts="ts",
            right_order="event_id",
            right_payload=["event_id", "ts"],
            **kw,
        ).collect()
    }


def _direction_fixtures(spark):
    purchases = spark.createDataFrame(
        [
            (1, 1, _ts(5)),    # before all visits
            (2, 1, _ts(15)),   # equidistant between :10 and :20
            (3, 1, _ts(20)),   # exactly AT the :20 visits
            (4, 1, _ts(25)),   # between :20 and :40
            (5, 1, _ts(59)),   # after all visits
        ],
        "event_id long, user_id long, ts timestamp",
    )
    visits = spark.createDataFrame(
        [
            (201, 1, _ts(10)),
            (202, 1, _ts(20)),
            (203, 1, _ts(20)),  # duplicate ts — higher event_id wins
            (204, 1, _ts(40)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    return purchases, visits


def test_asof_join_forward(spark):
    purchases, visits = _direction_fixtures(spark)
    out = _asof(purchases, visits, direction="forward")
    assert out[1] == (201, _ts(10))   # earliest visit >= :05
    assert out[2] == (203, _ts(20))   # next is :20; tie → max event_id
    assert out[3] == (203, _ts(20))   # >= includes same instant
    assert out[4] == (204, _ts(40))
    assert out[5] == (None, None)     # nothing after :59


def test_asof_join_nearest(spark):
    purchases, visits = _direction_fixtures(spark)
    out = _asof(purchases, visits, direction="nearest")
    assert out[1] == (201, _ts(10))   # only forward exists
    assert out[2] == (201, _ts(10))   # 5 min both ways: tie → backward
    assert out[3] == (203, _ts(20))
    assert out[4] == (203, _ts(20))   # 5 min back vs 15 forward
    assert out[5] == (204, _ts(40))   # only backward exists


def test_asof_join_tolerance(spark):
    purchases, visits = _direction_fixtures(spark)
    tol = 6 * 60 * 1_000_000  # 6 minutes in µs
    back = _asof(purchases, visits, tolerance_us=tol)
    assert back[2] == (201, _ts(10))  # 5 min back: within
    assert back[5] == (None, None)    # 19 min back: nulled out
    fwd = _asof(purchases, visits, direction="forward", tolerance_us=tol)
    assert fwd[1] == (201, _ts(10))   # 5 min forward: within
    assert fwd[4] == (None, None)     # 15 min forward: nulled out
    near = _asof(purchases, visits, direction="nearest", tolerance_us=tol)
    assert near[4] == (203, _ts(20))  # back within, forward nulled
    assert near[5] == (None, None)    # both out of tolerance


def test_asof_join_rejects_bad_direction(spark):
    purchases, visits = _direction_fixtures(spark)
    import pytest

    with pytest.raises(ValueError, match="direction"):
        asof_join(
            purchases, visits, on="user_id", left_ts="ts", right_ts="ts",
            right_order="event_id", right_payload=["event_id"],
            direction="sideways",
        )


def test_error_then_purchase_order_matters(spark):
    """The pattern is ORDERED: purchase-then-error must not match."""
    from aws_dms_cdc_data_pipeline_spark.plans.queries import REGISTRY
    import datetime as dt
    import os
    import tempfile

    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: error ... purchase (match)
    for i, t in enumerate(["view", "error", "click", "purchase"]):
        rows.append((100 + i, base + dt.timedelta(minutes=i), 1, t, 1.0, "{}"))
    # user 2: purchase ... error (NO match — order reversed)
    for i, t in enumerate(["purchase", "view", "error"]):
        rows.append((200 + i, base + dt.timedelta(minutes=i), 2, t, 1.0, "{}"))
    # user 3: error in one session, purchase in the NEXT (no match:
    # 31-minute gap splits the sessions)
    rows.append((300, base, 3, "error", 1.0, "{}"))
    rows.append((301, base + dt.timedelta(minutes=40), 3, "purchase", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "events.parquet"))
        out = REGISTRY["error_then_purchase_sessions"].fn(spark, tmp).collect()
    assert [(r["user_id"], r["session_idx"]) for r in out] == [(1, 1)]
