"""Round-12 tests: the adaptive-cap newborn gate (VERDICT r11 #4).

Cross-engine parity is owned by tools/compare.py (three-SF probed
before landing — CLAUDE.md 3b); these tests pin the SEMANTIC
invariants the oracle hash alone wouldn't explain: the quantile
definitions behind the computed cap (recomputed independently in
plain Python from the shingle df multiset), the cap-bite accounting
(dropped_shingles == |{shingle : df > cap}| exactly), and the
capped-output containment/lower-bound relation to the uncapped gate
that makes the cap a safe recall/cost knob rather than a semantics
change.

The gate rows and the independent Python df multiset are computed
ONCE per module (session-scoped spark fixture + module-scoped
caches) — each gate run is a full shingle-explode + df-groupBy +
pair-join, not something to repeat per test (r12 review finding).
"""

from __future__ import annotations

import math
from collections import Counter

import pytest

from tests.conftest import SF_SMOKE

from big_data_flight_spark.registry import _REGISTRY, _load_all_operator_modules

_load_all_operator_modules()


@pytest.fixture(scope="module")
def adaptive_rows(spark):
    rows = _REGISTRY["text_near_dedup_jaccard_adaptive"].builder(
        spark, SF_SMOKE
    ).collect()
    assert rows, "gate must be non-vacuous at sf0.001 (probed 28 rows)"
    return rows


@pytest.fixture(scope="module")
def python_shingle_dfs(spark):
    """Independent df multiset: 3-word distinct shingles per doc via
    plain Python string ops (no reuse of the gate's shingles())."""
    from big_data_flight_spark.io import table

    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    df_counter = Counter()
    for r in docs:
        w = r["text"].lower().split(" ")
        sh = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        df_counter.update(sh)
    return df_counter


def _type1_quantile(sorted_vals, q):
    """min x with rank(x) >= ceil(q*n) over the sorted multiset."""
    n = len(sorted_vals)
    return sorted_vals[math.ceil(q * n) - 1]


def test_adaptive_cap_quantiles_match_independent_python(
    adaptive_rows, python_shingle_dfs
):
    """(median_df, p90_df, chosen_cap) must equal type-1 quantiles of
    the shingle-df distribution recomputed from scratch in Python,
    with cap = _ADAPTIVE_TARGET_DUP x median."""
    from big_data_flight_spark.operators.text import _ADAPTIVE_TARGET_DUP

    dfs = sorted(python_shingle_dfs.values())
    med = _type1_quantile(dfs, 0.5)
    p90 = _type1_quantile(dfs, 0.9)
    caps = {(r["chosen_cap"], r["median_df"], r["p90_df"]) for r in adaptive_rows}
    assert caps == {(med * _ADAPTIVE_TARGET_DUP, med, p90)}, (
        f"gate {caps} vs python (cap={med * _ADAPTIVE_TARGET_DUP}, "
        f"median={med}, p90={p90})"
    )


def test_adaptive_cap_bite_accounting(adaptive_rows, python_shingle_dfs):
    """dropped_shingles must equal the exact count of distinct
    shingles with df > chosen_cap — and at sf0.001 the cap genuinely
    BITES (>=1 dropped), so the drop path is exercised, not dormant."""
    cap = adaptive_rows[0]["chosen_cap"]
    expected_dropped = sum(1 for df in python_shingle_dfs.values() if df > cap)
    assert expected_dropped >= 1, "fixture regression: cap no longer bites"
    assert {r["dropped_shingles"] for r in adaptive_rows} == {expected_dropped}


def test_adaptive_pairs_are_capped_lower_bounds_of_uncapped(spark, adaptive_rows):
    """Every adaptive pair must appear in the uncapped gate's pair set
    with jaccard >= the capped value (denominators keep true set
    sizes, so dropping stop-shingles can only shrink the numerator),
    and any uncapped pair MISSING from the adaptive output must have
    fallen below threshold for that reason — i.e. the capped set is a
    subset, never an invention."""
    adaptive = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in adaptive_rows}
    uncapped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _REGISTRY["text_near_dedup_jaccard"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    assert set(adaptive) <= set(uncapped)
    for pair, j in adaptive.items():
        assert uncapped[pair] >= j - 1e-9, (pair, j, uncapped[pair])
