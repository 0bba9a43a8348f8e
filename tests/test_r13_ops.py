"""Round-13 (optimization round 2/2) tests.

Pins for the round's operator-internal optimizations — each one
changed HOW a declared query computes, never WHAT it computes, so the
tests assert (a) bit-identical results between the old and new forms
and (b) the structural property the optimization exists to provide.
"""

from __future__ import annotations

import io
import os
import struct
from contextlib import redirect_stdout

import pytest

from tests.conftest import SF_SMOKE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# agg_percentile: bounded 100 TB form (VERDICT r12 #1)
# ---------------------------------------------------------------------------


def _pctl_rows(spark, form: str):
    import big_data_flight_spark.operators.aggregates as agg

    prev = os.environ.get("SPARK_GRAFT_PCTL_FORM")
    os.environ["SPARK_GRAFT_PCTL_FORM"] = form
    try:
        rows = agg.agg_percentile(spark, SF_SMOKE).collect()
    finally:
        if prev is None:
            os.environ.pop("SPARK_GRAFT_PCTL_FORM", None)
        else:
            os.environ["SPARK_GRAFT_PCTL_FORM"] = prev
    return {
        r["l_returnflag"]: (r["p50_price"], r["p90_price"], r["p99_price"])
        for r in rows
    }


def test_pctl_bounded_bit_identical_to_sorted(spark):
    """The two agg_percentile forms must agree to the BIT (the driver
    hashes the values; 'close' is not equal). Compared via IEEE bit
    patterns, not float ==, so a -0.0/0.0 or NaN slip would fail."""
    a = _pctl_rows(spark, "sorted")
    b = _pctl_rows(spark, "bounded")
    assert set(a) == set(b)
    for g in a:
        bits_a = [struct.pack(">d", x) for x in a[g]]
        bits_b = [struct.pack(">d", x) for x in b[g]]
        assert bits_a == bits_b, (g, a[g], b[g])


def test_pctl_bounded_plan_has_no_data_sized_collect(spark):
    """The bounded form's whole point (§5): no data-sized per-group
    buffer. Its plan must show the radix bucketing (shiftright) and
    must NOT collect raw l_extendedprice rows into one array — every
    collect_list runs above the (group, value)/(group, bucket)
    aggregates, whose width is domain-bounded (≤4096)."""
    import big_data_flight_spark.operators.aggregates as agg

    plan = _plan(agg._agg_percentile_bounded(spark, SF_SMOKE))
    # No raw-row collect anywhere (the sorted form's data-sized buffer
    # signature is collect_list over bare l_extendedprice)...
    assert "collect_list(l_extendedprice" not in plan
    # ...every collect runs over (key, count) histogram structs, above
    # the compact checkpointed count table (ExistingRDD).
    assert "collect_list(struct(" in plan
    assert "ExistingRDD" in plan


def test_pctl_default_form_unchanged_at_fixture_scale(spark):
    """The auto switch must keep the sorted form at fixture scale (the
    bench-comparability contract): the driver's bench numbers measure
    the same plan as r12."""
    import big_data_flight_spark.operators.aggregates as agg

    assert os.environ.get("SPARK_GRAFT_PCTL_FORM", "auto") == "auto"
    plan = _plan(agg.agg_percentile(spark, SF_SMOKE))
    assert "collect_list(l_extendedprice" in plan
    assert "shiftright" not in plan
    assert "ExistingRDD" not in plan  # no checkpoint in the bench path
