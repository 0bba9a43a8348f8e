"""Property-based checks (hypothesis) — SURVEY.md §5 layer 2.

Each property drives a real Spark plan on randomized tiny inputs and
asserts an invariant against an independently-computed expectation.
Example counts are kept small: every example runs Spark jobs."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),               # user_id
        st.integers(0, 3600),            # seconds offset
        st.sampled_from(["click", "view", "purchase"]),
    ),
    min_size=1,
    max_size=25,
)


def _frame(spark, rows):
    data = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u, et, 1.0)
        for i, (u, s, et) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


@given(rows=events_strategy)
@settings(**SETTINGS)
def test_session_invariants(spark, rows):
    """No intra-session gap exceeds the timeout; session ids are
    contiguous from 1 per user; splitting at gaps>timeout is exact."""
    from big_data_flight_spark.operators.events import _SESSION_GAP_US, _with_session_id

    out = _with_session_id(_frame(spark, rows)).collect()
    by_user: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    for rs in by_user.values():
        assert rs[0]["session_id"] == 1
        for a, b in zip(rs, rs[1:]):
            gap_us = (b["ts"] - a["ts"]).total_seconds() * 1e6
            if b["session_id"] == a["session_id"]:
                assert gap_us <= _SESSION_GAP_US
            else:
                assert b["session_id"] == a["session_id"] + 1
                assert gap_us > _SESSION_GAP_US


@given(rows=events_strategy)
@settings(**SETTINGS)
def test_union_all_count_additivity(spark, rows):
    df = _frame(spark, rows)
    n = df.count()
    assert df.unionByName(df).count() == 2 * n
    assert df.unionByName(df).distinct().count() == df.distinct().count()


@given(rows=events_strategy)
@settings(**SETTINGS)
def test_dedup_first_rule(spark, rows):
    """evt_dedup keeps exactly min(ts, event_id) per (user, type)."""
    from pyspark.sql import Window

    df = _frame(spark, rows)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    kept = (
        df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).collect()
    )
    expected = {}
    for r in sorted(df.collect(), key=lambda r: (r["ts"], r["event_id"])):
        expected.setdefault((r["user_id"], r["event_type"]), r["event_id"])
    assert {(r["user_id"], r["event_type"]): r["event_id"] for r in kept} == expected


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_dsum_matches_python_exact(spark, vals):
    """Exact decimal sum equals Python's exact decimal arithmetic
    (HALF_UP quantization per value, like Spark's double→decimal cast),
    regardless of value order."""
    from decimal import ROUND_HALF_UP, Decimal

    from big_data_flight_spark.registry import dsum

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    (row,) = df.agg(dsum("x", "s")).collect()
    q = Decimal("0.000001")
    exact = sum(Decimal(float(v)).quantize(q, rounding=ROUND_HALF_UP) for v in vals)
    assert abs(row["s"] - float(exact)) < 1e-9
