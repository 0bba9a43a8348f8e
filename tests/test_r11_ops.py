"""Round-11 tests: the three newborn gates (VERDICT r10 #4).

Each gate's cross-engine parity is owned by tools/compare.py (probed
green at all three SFs before landing — CLAUDE.md 3b); these tests pin
the SEMANTIC invariants the oracle hash alone wouldn't explain:
conservation and long-form shape for the streaming contract check,
keep-first election arithmetic for the paragraph dedup, and the
monotone-curve + nprobe=10-anchor properties of the recall audit.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE

from big_data_flight_spark.registry import _REGISTRY, _load_all_operator_modules

_load_all_operator_modules()


def test_stream_dq_expectations_long_form_and_conservation(spark):
    """The streaming contract check must emit exactly the five fixed
    expectations in long form, with every n_checked equal to the
    source row count (the conservation the builder also self-audits)
    and passed consistent with n_violations."""
    from big_data_flight_spark.io import table

    rows = _REGISTRY["stream_dq_expectations"].builder(spark, SF_SMOKE).collect()
    names = sorted(r["expectation"] for r in rows)
    assert names == [
        "events.event_id.unique",
        "events.event_type.in_set",
        "events.ts.window_jan01_15",
        "events.user_id.not_null",
        "events.value.range_0_50",
    ]
    n_events = table(spark, SF_SMOKE, "events").count()
    for r in rows:
        assert r["n_checked"] == n_events, r
        assert 0 <= r["n_violations"] <= r["n_checked"], r
        assert r["passed"] == (r["n_violations"] == 0), r
    by = {r["expectation"]: r for r in rows}
    # The fixture's contract status (probed at all three SFs): ids
    # unique, users non-null, types all in-set; the value range and
    # the freshness window both genuinely violated — the hash has
    # real signal on both sides of `passed`.
    assert by["events.event_id.unique"]["n_violations"] == 0
    assert by["events.user_id.not_null"]["n_violations"] == 0
    assert by["events.value.range_0_50"]["n_violations"] > 0
    assert by["events.ts.window_jan01_15"]["n_violations"] > 0


def test_paragraph_dedup_keep_first_election(spark):
    """Keep-first arithmetic: totals must balance (paras = kept +
    dropped corpus-wide, and distinct paragraph contents == kept
    count), every doc keeps its own first paragraph (the earliest
    (doc_id, para_id) occurrence of any content is by definition
    kept), and cleaned_text token counts match n_kept_tokens."""
    import pyspark.sql.functions as F

    df = _REGISTRY["text_substring_dedup_paragraph"].builder(spark, SF_SMOKE)
    rows = df.collect()
    assert rows
    tot = df.agg(
        F.sum("n_paras"), F.sum("n_dropped"), F.sum("n_kept_tokens")
    ).collect()[0]
    n_paras, n_dropped = int(tot[0]), int(tot[1])
    assert 0 < n_dropped < n_paras  # probed: 31 dropped of 1106 at sf0.001
    for r in rows:
        # n_dropped == n_paras is LEGAL per doc (a document that is
        # entirely boilerplate repeated from earlier docs loses every
        # paragraph — the exact case the gate exists for; r11 review);
        # only the corpus-wide strict inequality above is an invariant.
        assert 0 <= r["n_dropped"] <= r["n_paras"], r
        kept_tokens = (
            len([t for t in r["cleaned_text"].split(" ") if t != ""])
            if r["cleaned_text"]
            else 0
        )
        assert kept_tokens == r["n_kept_tokens"], r
    # doc 0's first paragraph can't duplicate anything earlier: its
    # cleaned text must start with its original first tokens.
    d0 = next(r for r in rows if r["doc_id"] == 0)
    assert d0["cleaned_text"] != ""


def test_ann_recall_curve_monotone_with_full_probe_anchor(spark):
    """Recall must be monotone non-decreasing in nprobe, candidates
    (n_ivf_results) non-decreasing, and the nprobe=10 row — every
    cell probed, so the ivf ranking IS the exact ranking — must read
    recall_micro == 1000000 exactly (the built-in sanity anchor)."""
    rows = sorted(
        _REGISTRY["sim_ann_recall_curve"].builder(spark, SF_SMOKE).collect(),
        key=lambda r: r["nprobe"],
    )
    assert [r["nprobe"] for r in rows] == [1, 2, 3, 5, 8, 10]
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_recalled"] >= prev["n_recalled"]
        assert cur["n_ivf_results"] >= prev["n_ivf_results"]
    for r in rows:
        assert r["n_exact_results"] == rows[0]["n_exact_results"] > 0
        assert r["recall_micro"] == r["n_recalled"] * 1000000 // r["n_exact_results"]
    full = rows[-1]
    assert full["n_recalled"] == full["n_exact_results"]
    assert full["recall_micro"] == 1000000
