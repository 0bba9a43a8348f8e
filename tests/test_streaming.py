"""Streaming twins must agree with their batch counterparts."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_stream_counts_equal_batch(spark):
    from big_data_flight_spark.io import table
    from big_data_flight_spark.streaming.twins import stream_source_sink

    stream = {
        (r["event_type"],): r["n"]
        for r in stream_source_sink(spark, SF_SMOKE).collect()
    }
    batch = {
        (r["event_type"],): r["count"]
        for r in table(spark, SF_SMOKE, "events").groupBy("event_type").count().collect()
    }
    assert stream == batch


def test_stream_tumbling_equals_batch(spark):
    from big_data_flight_spark.operators.events import evt_tumbling_window
    from big_data_flight_spark.streaming.twins import tumbling_window_stream

    stream = {
        (r["day_start"], r["event_type"]): r["n"]
        for r in tumbling_window_stream(spark, SF_SMOKE).collect()
    }
    batch = {
        (r["day_start"], r["event_type"]): r["n"]
        for r in evt_tumbling_window(spark, SF_SMOKE).collect()
    }
    assert stream == batch


def test_stream_dedup_unique(spark):
    from big_data_flight_spark.streaming.twins import dedup_stream

    out = dedup_stream(spark, SF_SMOKE).toPandas()
    assert out["event_id"].is_unique
    assert len(out) > 0


def test_stream_session_window_bounds(spark):
    from big_data_flight_spark.streaming.twins import session_window_stream

    out = session_window_stream(spark, SF_SMOKE).toPandas()
    assert (out["session_end"] >= out["session_start"]).all()
    assert (out["n_events"] >= 1).all()


def test_stateful_funnel_stream_matches_batch(spark):
    from big_data_flight_spark.operators.events import evt_stateful_funnel
    from big_data_flight_spark.streaming.twins import funnel_stateful_stream

    stream = {
        r["user_id"]: r["converted"]
        for r in funnel_stateful_stream(spark, SF_SMOKE).collect()
    }
    batch = {
        r["user_id"]: r["converted"]
        for r in evt_stateful_funnel(spark, SF_SMOKE).collect()
    }
    assert stream == batch


def test_stream_static_join_runs(spark):
    from big_data_flight_spark.streaming.twins import stream_static_join

    out = stream_static_join(spark, SF_SMOKE).toPandas()
    assert set(out["event_type"]) == {"signup", "click", "error", "view", "purchase"}
    assert (out["n"] > 0).all()


def test_foreach_batch_sink(spark, tmp_path):
    from big_data_flight_spark.streaming.twins import foreach_batch_sink

    n_epochs = foreach_batch_sink(spark, SF_SMOKE, str(tmp_path / "sink"))
    assert n_epochs >= 1
    written = spark.read.parquet(str(tmp_path / "sink" / "epoch=0"))
    assert written.count() == 1000  # all smoke events landed in epoch 0


def test_tws_funnel_matches_batch(spark):
    """transformWithStateInPandas (Spark 4 stateful API) twin agrees
    with the batch funnel — or raises the documented
    NotImplementedError where the protobuf wire protocol is absent."""
    import pytest

    from big_data_flight_spark.operators.events import evt_stateful_funnel
    from big_data_flight_spark.streaming.twins import funnel_tws_stream

    try:
        stream_rows = funnel_tws_stream(spark, SF_SMOKE).collect()
    except NotImplementedError:
        pytest.skip(
            "TWS wire protocol unavailable: pyspark/sql/streaming/proto/"
            "StateMessage_pb2.py:23 needs google.protobuf.descriptor and "
            "no 'google' package exists here (pip install out of scope); "
            "the applyInPandasWithState twin covers the stateful surface"
        )
    stream = {r["user_id"]: r["converted"] for r in stream_rows}
    batch = {
        r["user_id"]: r["converted"]
        for r in evt_stateful_funnel(spark, SF_SMOKE).collect()
    }
    assert stream == batch


def test_count_min_stream_matches_batch(spark):
    """The streamed CMS counter table must equal the batch-built one
    (mergeable partials — order and batching cannot matter)."""
    from big_data_flight_spark.io import table
    from big_data_flight_spark.operators.sketches import cms_counters
    from big_data_flight_spark.streaming.twins import count_min_stream

    got = {
        (r["seed"], r["bucket"]): r["c"]
        for r in count_min_stream(spark, SF_SMOKE).collect()
    }
    want = {
        (r["seed"], r["bucket"]): r["c"]
        for r in cms_counters(table(spark, SF_SMOKE, "events")).collect()
    }
    assert got == want


def test_cdc_latest_stream_matches_batch(spark):
    """Streamed latest-per-key snapshot == the batch CDC gate (struct
    max over (ts, event_id) is order-insensitive, so micro-batching
    cannot change the winner)."""
    from big_data_flight_spark.operators.etl import etl_cdc_latest_snapshot
    from big_data_flight_spark.streaming.twins import cdc_latest_stream

    got = {
        r["user_id"]: (r["last_ts"], r["last_type"], r["last_value"])
        for r in cdc_latest_stream(spark, SF_SMOKE).collect()
    }
    want = {
        r["user_id"]: (r["last_ts"], r["last_type"], r["last_value"])
        for r in etl_cdc_latest_snapshot(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_stream_stream_join_matches_batch(spark):
    """Watermarked stream-stream join drained with availableNow must
    equal the identical batch join: click -> same-user purchase within
    1 day after."""
    from big_data_flight_spark.io import table
    from big_data_flight_spark.streaming.twins import stream_stream_join

    from pyspark.sql import functions as F

    ev = table(spark, SF_SMOKE, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = {
        (r["click_id"], r["purchase_id"])
        for r in clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("interval 1 day")),
        ).collect()
    }
    stream = {
        (r["click_id"], r["purchase_id"])
        for r in stream_stream_join(spark, SF_SMOKE).collect()
    }
    assert stream == batch
    assert len(stream) > 0  # fixture has same-user click->purchase pairs
