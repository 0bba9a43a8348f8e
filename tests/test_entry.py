"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import importlib.util
import os

from tests.conftest import REPO, SF_SMOKE


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_registry_integrity(spark):
    mod = _entry_module()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) > 0
    # every oracle key has a query
    assert set(oracles) <= set(qs)
    # builders are callables with the right signature shape
    for name, fn in qs.items():
        assert callable(fn), name


def test_every_query_runs_at_smoke_scale(spark):
    """Every registered gate query must at least execute at sf0.001."""
    mod = _entry_module()
    for name, fn in mod.queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.limit(1).count() >= 0, name
