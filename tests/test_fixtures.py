"""Fixture invariants that operator rewrites depend on (FIXTURES.md).

These guard DATA assumptions, not code: if the driver ever regenerates
the testdata with different value distributions, the dependent rewrite
must be revisited — fail loudly here rather than silently diverge from
the oracle.
"""

from __future__ import annotations

import duckdb

from tests.conftest import SF_SMOKE


def test_l_quantity_is_integral():
    """tpch_q18 sums l_quantity as LONG (truncating cast) in its HAVING
    aggregate — exact only because every l_quantity is a whole number.
    FIXTURES.md records the invariant; this asserts it on the smoke
    fixture (also verified manually at sf0.01 and sf0.1, where the same
    seed-42 generator produced 0 fractional rows)."""
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_SMOKE}/lineitem.parquet') "
        "WHERE l_quantity <> floor(l_quantity) OR l_quantity IS NULL"
    ).fetchone()[0]
    assert n == 0


def test_orders_customer_fk_integrity():
    """tpch_q18 takes its top-100 BEFORE the customer join (rewrite #2
    in its docstring) — valid only if every o_custkey resolves in
    customer. An orphan among the top-100 would silently shift the
    result by one row vs the oracle, so the FK must fail loudly on any
    fixture regeneration that breaks it."""
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_SMOKE}/orders.parquet') o "
        f"LEFT JOIN read_parquet('{SF_SMOKE}/customer.parquet') c "
        "ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL"
    ).fetchone()[0]
    assert n == 0
