"""Unit tests for §2.4 aggregation operators on tiny inline frames +
oracle parity at smoke scale."""

from __future__ import annotations

import pytest

from big_data_flight_spark.operators.aggregates import flagship
from big_data_flight_spark.registry import _REGISTRY, _load_all_operator_modules
from tests.conftest import SF_SMOKE


def test_flagship_shape(spark):
    df = flagship(spark, SF_SMOKE)
    rows = df.collect()
    assert 0 < len(rows) <= 6  # |returnflag| x |linestatus| combos
    r = rows[0]
    assert r["count_order"] > 0
    assert abs(r["avg_qty"] * r["count_order"] - r["sum_qty"]) < 1e-3


def test_dsum_is_exact(spark):
    from big_data_flight_spark.registry import dsum

    df = spark.createDataFrame([(0.1,), (0.2,), (0.3,)], ["x"])
    (out,) = df.agg(dsum("x", "s")).collect()
    assert out["s"] == pytest.approx(0.6, abs=1e-12)


def _oracle_parity(spark, duck, name):
    from tools.compare import compare_one

    _load_all_operator_modules()
    q = _REGISTRY[name]
    r = compare_one(spark, duck, name, q, SF_SMOKE)
    assert r["status"] in ("OK", "WEAK_OK"), r


@pytest.mark.parametrize("name", ["agg_groupby", "agg_stats", "agg_percentile"])
def test_agg_oracle_parity_smoke(spark, duck, name):
    _oracle_parity(spark, duck, name)
