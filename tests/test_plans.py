"""Plan-property regression tests (fast twin of plans/snapshot.py)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from tests.conftest import SF_SMOKE


def _plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    from big_data_flight_spark.registry import _REGISTRY, _load_all_operator_modules

    _load_all_operator_modules()
    plan = _plan(_REGISTRY["filter_pred"].builder(spark, SF_SMOKE))
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_quantity)" in plan or "GreaterThanOrEqual" in plan


def test_projection_prunes_read_schema(spark):
    from big_data_flight_spark.registry import _REGISTRY, _load_all_operator_modules

    _load_all_operator_modules()
    plan = _plan(_REGISTRY["scan_parquet"].builder(spark, SF_SMOKE))
    # nation has 3 read columns here; no other columns may be read
    assert "ReadSchema" in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "n_nationkey" in read and "n_comment" not in read


def test_dimension_join_broadcasts(spark):
    from big_data_flight_spark.registry import _REGISTRY, _load_all_operator_modules

    _load_all_operator_modules()
    plan = _plan(_REGISTRY["join_broadcast"].builder(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_uses_take_ordered(spark):
    from big_data_flight_spark.registry import _REGISTRY, _load_all_operator_modules

    _load_all_operator_modules()
    plan = _plan(_REGISTRY["limit_topk"].builder(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
