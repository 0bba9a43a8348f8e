"""Unit tests for §2.9 event-time operators: session invariants,
dedup idempotence, funnel logic on tiny inline frames."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _t(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_session_boundaries(spark):
    from big_data_flight_spark.operators.events import _with_session_id

    rows = [
        (1, _t(0), 7, "click", 1.0),
        (2, _t(10), 7, "click", 1.0),   # gap 10m -> same session
        (3, _t(41), 7, "click", 1.0),   # gap 31m -> NEW session
        (4, _t(41), 7, "click", 1.0),   # tie ts, later event_id -> same session
        (5, _t(0), 8, "click", 1.0),    # other user -> own session
    ]
    out = {r["event_id"]: r["session_id"] for r in _with_session_id(_ev(spark, rows)).collect()}
    assert out[1] == out[2] == 1
    assert out[3] == out[4] == 2
    assert out[5] == 1


def test_session_gap_exactly_timeout_stays(spark):
    """Gap == 30min exactly is NOT a break (strict >)."""
    from big_data_flight_spark.operators.events import _with_session_id

    rows = [(1, _t(0), 1, "click", 1.0), (2, _t(30), 1, "click", 1.0)]
    out = _with_session_id(_ev(spark, rows)).collect()
    assert {r["session_id"] for r in out} == {1}


def test_funnel_requires_order(spark):
    import big_data_flight_spark.operators.events as events_mod

    rows = [
        (1, _t(0), 1, "signup", 0.0),
        (2, _t(5), 1, "purchase", 9.0),   # converted
        (3, _t(0), 2, "purchase", 9.0),
        (4, _t(5), 2, "signup", 0.0),     # purchase BEFORE signup -> not converted
        (5, _t(0), 3, "click", 0.0),      # neither -> not converted
    ]
    df = _ev(spark, rows)
    orig = events_mod.table
    events_mod.table = lambda s, d, n: df  # monkeypatch the loader for inline data
    try:
        out = {
            r["user_id"]: r["converted"]
            for r in events_mod.evt_stateful_funnel(spark, "ignored").collect()
        }
    finally:
        events_mod.table = orig
    assert out == {1: True, 2: False, 3: False}


def test_dedup_idempotent(spark, duck):
    from big_data_flight_spark.operators.events import evt_dedup
    from tests.conftest import SF_SMOKE

    once = evt_dedup(spark, SF_SMOKE)
    # applying the same (user,type) first-row rule twice changes nothing
    again = once.groupBy("user_id", "event_type").count().filter(F.col("count") > 1)
    assert again.count() == 0
