"""Semantics tests for the ETL family and the newer analytic gates —
edge cases the fixture-backed oracle comparison cannot isolate
(tie-breaks, bin boundaries, open intervals, orphan counting)."""

from __future__ import annotations

import datetime as dt

import big_data_flight_spark.operators.aggregates as agg_mod
import big_data_flight_spark.operators.etl as etl_mod
import big_data_flight_spark.operators.events as evt_mod
import big_data_flight_spark.operators.text as text_mod

_EVT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def _patched(mod, frames):
    """Swap mod.table for a synthetic-table lookup; returns a restorer."""
    orig = mod.table
    mod.table = lambda s, d, n: frames[n]
    return orig


def test_agg_mode_tiebreak_prefers_smaller_type(spark):
    """Two event types tied on count: the lexicographically smaller
    one must win (min-of-struct with negated count)."""
    e = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1), 7, "view", 1.0),
            (2, dt.datetime(2024, 1, 2), 7, "click", 1.0),
            (3, dt.datetime(2024, 1, 3), 7, "view", 1.0),
            (4, dt.datetime(2024, 1, 4), 7, "click", 1.0),
        ],
        _EVT_SCHEMA,
    )
    orig = _patched(agg_mod, {"events": e})
    try:
        (row,) = agg_mod.agg_mode(spark, "ignored").collect()
        assert (row["modal_type"], row["n"]) == ("click", 2)
    finally:
        agg_mod.table = orig


def test_pack_sequences_bin_boundary_and_conservation(spark):
    """A doc whose tokens would cross the 2048 budget opens a new bin;
    token totals are conserved across bins."""
    texts = [
        ("a " * 2000).strip(),  # doc 0: 2000 tokens -> bin 0
        ("b " * 100).strip(),   # doc 1: cum-excl 2000 -> bin 0 (overflows it)
        ("c " * 50).strip(),    # doc 2: cum-excl 2100 -> bin 1
    ]
    d = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = _patched(text_mod, {"documents": d})
    try:
        rows = {r["seq_id"]: r for r in text_mod.text_pack_sequences(spark, "x").collect()}
        assert rows[0]["n_docs"] == 2 and rows[0]["total_tokens"] == 2100
        assert rows[1]["n_docs"] == 1 and rows[1]["total_tokens"] == 50
        assert sum(r["total_tokens"] for r in rows.values()) == 2150
    finally:
        text_mod.table = orig


def test_retention_skipped_week_not_counted(spark):
    """User active in cohort week and two weeks later only: week_no
    rows are {0, 2}, never 1."""
    e = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1), 5, "view", 1.0),   # Mon, week 0
            (2, dt.datetime(2024, 1, 16), 5, "view", 1.0),  # week 2
        ],
        _EVT_SCHEMA,
    )
    orig = _patched(evt_mod, {"events": e})
    try:
        got = {
            (r["week_no"], r["n_users"])
            for r in evt_mod.evt_retention(spark, "x").collect()
        }
        assert got == {(0, 1), (2, 1)}
    finally:
        evt_mod.table = orig


def test_scd2_last_interval_open(spark):
    """The newest per-user row is open-ended (is_current, NULL
    valid_to, zero duration); earlier rows span to the next change."""
    e = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0, 0), 5, "signup", 1.0),
            (2, dt.datetime(2024, 1, 1, 0, 0, 10), 5, "click", 1.0),
        ],
        _EVT_SCHEMA,
    )
    orig = _patched(etl_mod, {"events": e})
    try:
        rows = sorted(
            etl_mod.etl_scd2_intervals(spark, "x").collect(),
            key=lambda r: r["valid_from"],
        )
        assert rows[0]["duration_us"] == 10_000_000 and not rows[0]["is_current"]
        assert rows[1]["valid_to"] is None and rows[1]["is_current"]
        assert rows[1]["duration_us"] == 0
    finally:
        etl_mod.table = orig


def test_dq_profile_counts_orphans_and_violations(spark):
    """FK orphans and each rule counter fire independently."""
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 5.0, dt.datetime(2024, 1, 1), "1-URGENT"),
            (2, 99, "O", 5.0, dt.datetime(2024, 1, 1), "5-LOW"),   # orphan cust
            (3, 10, "X", -1.0, dt.datetime(1980, 1, 1), "5-LOW"),  # 3 violations
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    customer = spark.createDataFrame(
        [(10, "c10", 0, 1.0, "SEG")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    orig = _patched(etl_mod, {"orders": orders, "customer": customer})
    try:
        (row,) = etl_mod.dq_profile(spark, "x").collect()
        assert row["n_rows"] == 3
        assert row["fk_orphans"] == 1
        assert row["nonpositive_price"] == 1
        assert row["bad_status"] == 1
        assert row["out_of_range_date"] == 1
        assert row["n_distinct_keys"] == 3
    finally:
        etl_mod.table = orig


def test_knn_vote_tie_prefers_smaller_label(spark):
    """Five equidistant neighbors with tied label votes: the smaller
    label must win (rank tie-break by neighbor_id, vote tie-break by
    label) — deterministic on any engine or partitioning."""
    import big_data_flight_spark.operators.similarity as sim_mod

    unit = [1.0, 0.0, 0.0, 0.0]
    rows = [(0, unit, 9)]  # the probe (vec_id < 100)
    labels = {100: 2, 101: 1, 102: 2, 103: 1, 104: 3, 105: 7}
    rows += [(vid, unit, lab) for vid, lab in labels.items()]
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    orig = sim_mod.table
    sim_mod.table = lambda s, d, n: e
    try:
        (row,) = sim_mod.sim_knn_classify(spark, "ignored").collect()
    finally:
        sim_mod.table = orig
    # top-5 by neighbor_id among equidistant: 100..104 -> votes 2:2, 1:2, 3:1
    assert row["predicted_label"] == 1 and row["votes"] == 2
    assert row["correct"] is False


def test_rollup_cascade_equals_direct_daily(spark):
    """Hour→day cascade must equal a direct daily aggregate, including
    events on exact hour/day boundaries."""
    import datetime as dt

    import big_data_flight_spark.operators.events as evt_mod
    from pyspark.sql import functions as F

    base = dt.datetime(2024, 3, 1)
    rows = [
        (i, base + dt.timedelta(hours=h, minutes=m), 1, t, v)
        for i, (h, m, t, v) in enumerate(
            [
                (0, 0, "click", 1.5),    # exact midnight
                (23, 59, "click", 2.5),  # last minute of day 1
                (24, 0, "click", 4.0),   # exact midnight day 2
                (25, 30, "view", 0.25),
            ]
        )
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    orig = evt_mod.table
    evt_mod.table = lambda s, d, n: e
    try:
        got = {
            (r["day_start"], r["event_type"]): (r["n"], r["sum_value"], r["min_value"], r["max_value"])
            for r in evt_mod.evt_rollup_cascade(spark, "x").collect()
        }
    finally:
        evt_mod.table = orig
    direct = {
        (r["d"], r["event_type"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in e.groupBy(
            F.date_trunc("day", "ts").alias("d"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        ).collect()
    }
    assert got == direct


def test_incremental_agg_matches_full_recompute_exactly(spark):
    """IVM invariant, engine-internal: the incrementally maintained
    (count, sum) per group must equal a from-scratch Spark recompute
    of the post-delta snapshot BIT-FOR-BIT (decimal partials make the
    maintained sum exact, so even the final double cast agrees)."""
    from pyspark.sql import functions as F

    from big_data_flight_spark.registry import _REGISTRY, _load_all_operator_modules
    from big_data_flight_spark.io import table
    from tests.conftest import SF_SMOKE

    _load_all_operator_modules()
    got = {
        r.priority: (r.n_rows, r.sum_price, r.n_inserted, r.n_deleted)
        for r in _REGISTRY["etl_incremental_agg"].builder(spark, SF_SMOKE).collect()
    }
    o = table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    snap2 = o.filter(
        ((F.col("o_orderkey") % 10 != 0) & (F.col("o_orderkey") % 7 != 0))
        | (F.col("o_orderkey") % 10 == 0)
    )
    want = {
        r.priority: (r.n_rows, r.sum_price)
        for r in snap2.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("decimal(38,6)")
            .cast("double")
            .alias("sum_price"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for p, (n, s) in want.items():
        gn, gs, gi, gd = got[p]
        assert gn == n
        assert gs == s  # exact equality — decimal path, single cast
        assert gi > 0 and gd > 0  # the delta actually touched the group


def test_gapfill_locf_semantics(spark):
    """User 1 has events on days 0 and 3 inside a 0..4 span (user 2
    sets the span): days 1-2 must be zero-filled with the day-0 sum
    carried forward; day 4 carries day 3; user 2's day-0 row (before
    any observation... it observes day 4 only) must have NULL locf
    until day 4."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 5), 1, "a", 10.0),
        (2, dt.datetime(2024, 1, 1, 6), 1, "a", 2.5),
        (3, dt.datetime(2024, 1, 4, 7), 1, "a", 7.0),
        (4, dt.datetime(2024, 1, 5, 8), 2, "a", 1.0),
    ]
    e = spark.createDataFrame(rows, _EVT_SCHEMA)
    orig = _patched(evt_mod, {"events": e})
    try:
        got = {
            (r.user_id, r.day): (r.n_events, r.sum_value, r.locf_sum, r.has_data)
            for r in evt_mod.evt_gapfill_locf(spark, "ignored").collect()
        }
    finally:
        evt_mod.table = orig
    assert len(got) == 10  # 2 users x days 0..4
    assert got[(1, 0)] == (2, 12.5, 12.5, True)
    assert got[(1, 1)] == (0, 0.0, 12.5, False)
    assert got[(1, 2)] == (0, 0.0, 12.5, False)
    assert got[(1, 3)] == (1, 7.0, 7.0, True)
    assert got[(1, 4)] == (0, 0.0, 7.0, False)
    assert got[(2, 0)] == (0, 0.0, None, False)
    assert got[(2, 3)] == (0, 0.0, None, False)
    assert got[(2, 4)] == (1, 1.0, 1.0, True)
