"""UDF-surface tests: python UDTF registration, haversine, grouped map."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F


def test_python_udtf_matches_builtin(spark):
    from big_data_flight_spark.operators.udfs import register_python_udtf

    register_python_udtf(spark)
    out = spark.sql(
        "SELECT t.pos, t.token FROM (SELECT 'A quick Fox' AS text), "
        "LATERAL split_tokens(text) t"
    ).collect()
    assert [(r["pos"], r["token"]) for r in out] == [(0, "a"), (1, "quick"), (2, "fox")]


def test_haversine_known_distance(spark):
    from big_data_flight_spark.operators.udfs import haversine_km

    # JFK (40.64, -73.78) -> LHR (51.47, -0.45) ≈ 5540 km
    df = spark.createDataFrame(
        [(40.6413, -73.7781, 51.4700, -0.4543)], "lat1 double, lon1 double, lat2 double, lon2 double"
    )
    (row,) = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("km")
    ).collect()
    assert row["km"] == pytest.approx(5539, rel=0.01)


def test_haversine_zero_distance(spark):
    from big_data_flight_spark.operators.udfs import haversine_km

    df = spark.createDataFrame([(10.0, 20.0, 10.0, 20.0)], "lat1 double, lon1 double, lat2 double, lon2 double")
    (row,) = df.select(haversine_km("lat1", "lon1", "lat2", "lon2").alias("km")).collect()
    assert row["km"] == pytest.approx(0.0, abs=1e-9)


def test_grouped_map_running_sum(spark):
    import datetime as dt

    import big_data_flight_spark.operators.udfs as udfs_mod

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), 7, 1.5),
        (2, dt.datetime(2024, 1, 1, 0, 1), 7, 2.5),
        (3, dt.datetime(2024, 1, 1, 0, 2), 7, -1.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    orig = udfs_mod.table
    udfs_mod.table = lambda s, d, n: df
    try:
        out = sorted(
            (r["seq"], r["running_value"])
            for r in udfs_mod.udf_grouped_map(spark, "ignored").collect()
        )
    finally:
        udfs_mod.table = orig
    assert out == [(1, 1.5), (2, 4.0), (3, 3.0)]


def test_asof_pandas_matches_window_rank(spark):
    from tests.conftest import SF_SMOKE

    from big_data_flight_spark.operators.joins import join_asof
    from big_data_flight_spark.operators.udfs import asof_join_pandas

    wr = {
        (r["purchase_id"]): (r["click_id"], r["click_ts"])
        for r in join_asof(spark, SF_SMOKE).collect()
    }
    pa = {
        (r["purchase_id"]): (r["click_id"], r["click_ts"])
        for r in asof_join_pandas(spark, SF_SMOKE).collect()
    }
    assert wr == pa


def test_rerank_pandas_matches_jvm_fold(spark):
    """Fold-order-exact parity: the Arrow-batched numpy rerank kernel
    (sim_rerank_pandas) accumulates dim-by-dim left-to-right, the same
    float64 operation order as the F.aggregate fold in
    sim_topk_neighbors — so the two paths must agree bit-for-bit, not
    just approximately. Promised by sim_rerank_pandas' docstring."""
    from tests.conftest import SF_SMOKE

    from big_data_flight_spark.operators.similarity import (
        sim_rerank_pandas,
        sim_topk_neighbors,
    )

    jvm = {
        (r["query_id"], r["rn"]): (r["neighbor_id"], r["cos_sim"])
        for r in sim_topk_neighbors(spark, SF_SMOKE).collect()
    }
    pdy = {
        (r["query_id"], r["rn"]): (r["neighbor_id"], r["cos_sim"])
        for r in sim_rerank_pandas(spark, SF_SMOKE).collect()
    }
    assert jvm == pdy
    assert len(jvm) == 50  # 10 queries x top-5
