"""Smoke test for the bench harness itself.

The driver records BENCH_r{N}.json by running `python bench.py`; if
the harness crashes (a renamed gate, a broken override, a JSON
regression) the round silently loses its perf artifact. This runs the
real main() over a 3-query headline slice at sf0.001 — covering the
prepared-plan path, the eager-builder (streaming) path, the per-query
shuffle override, and the prev-round delta machinery — and checks the
emitted JSON contract.
"""

from __future__ import annotations

import json


def test_bench_main_emits_contract_json(spark, monkeypatch, capsys):
    import bench

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("BENCH_RUNS", "1")
    slice_ = ["agg_groupby", "join_asof", "stream_source_sink"]
    monkeypatch.setattr(bench, "HEADLINE", slice_)

    pre_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    rc = bench.main()
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.startswith('{"metric"')]
    assert rc == 0 and len(lines) == 1, out

    data = json.loads(lines[0])
    assert data["unit"] == "sec"
    assert data["sf"] == 0.001
    assert set(data["queries"]) == set(slice_)
    # -1.0 is the harness's query-errored sentinel — none allowed
    assert all(v >= 0 for v in data["queries"].values()), data["queries"]
    assert data["value"] > 0
    # eager builders are timed builder-inclusive: build_sec must be 0
    assert data["build_sec"]["stream_source_sink"] == 0.0
    # prev-round deltas only cover queries present in both rounds
    if "delta_vs_prev" in data:
        assert set(data["delta_vs_prev"]) <= set(slice_)

    # r5 contract additions: the stall-retry pass must emit its noise
    # audit fields; at sf0.001 every min is far below its sf0.1
    # BEST_KNOWN threshold, so the suspected list must be empty.
    assert data["noise_suspected"] == []
    assert data["best_known_total"] > 0

    # the harness must restore the session's shuffle partitions to
    # whatever they were before the per-query overrides (join_asof
    # runs at 16); compare against the pre-bench value, not the env
    # default — an earlier test in the shared session may have
    # legitimately changed the conf
    assert spark.conf.get("spark.sql.shuffle.partitions") == pre_shuffle


def test_shuffle_override_lever_is_live(spark, monkeypatch):
    """Lever-reaches-plan loud guard (VERDICT r9 #5): _time_query must
    FAIL, not silently measure the base width, when the configure()
    wrapper stops re-applying the patched RUNTIME_CONF — the exact
    failure mode that left SHUFFLE_OVERRIDE dead (and unnoticed)
    from r2 through r8. Positive half: through the live mechanism the
    session conf INSIDE the window equals the override. Negative half:
    sever the RUNTIME_CONF linkage (configure() reading a different
    dict, as a refactor might) and the same call must raise."""
    import bench
    from big_data_flight_spark import session as sess

    sf = "/root/testdata/sf0.001"
    name = "join_asof"  # has a SHUFFLE_OVERRIDE entry (16)
    want = bench.SHUFFLE_OVERRIDE[name]

    # positive: the override reaches the session conf inside the window
    seen = {}
    orig_guard = bench._assert_lever_live

    def spy(sp, nm, width):
        seen[nm] = sp.conf.get("spark.sql.shuffle.partitions")
        orig_guard(sp, nm, width)

    monkeypatch.setattr(bench, "_assert_lever_live", spy)
    t, _ = bench._time_query(spark, name, sf, 1, "8")
    assert t >= 0 and seen[name] == want

    # negative: simulate a dead mechanism — configure() re-applies a
    # FROZEN copy of the conf (the base width), so the patch written
    # into bench's RUNTIME_CONF never reaches the session. The guard
    # must blow up rather than let the window be timed.
    monkeypatch.setattr(bench, "_assert_lever_live", orig_guard)
    frozen = dict(sess.RUNTIME_CONF)
    frozen["spark.sql.shuffle.partitions"] = "8"

    def dead_configure(sp):
        for k, v in frozen.items():
            try:
                sp.conf.set(k, v)
            except Exception:
                pass
        return sp

    # the gate wrapper binds `configure` in registry.py's namespace —
    # patch THAT reference (patching session.configure alone would not
    # reach the wrapper, which is itself part of the lesson)
    from big_data_flight_spark import registry as reg

    monkeypatch.setattr(reg, "configure", dead_configure)
    try:
        import pytest

        with pytest.raises(AssertionError, match="SHUFFLE_OVERRIDE dead"):
            bench._time_query(spark, name, sf, 1, "8")
    finally:
        sess.configure(spark)


def test_bench_panel2_emits_contract_json(spark, monkeypatch, capsys):
    """Panel-2 harness smoke (VERDICT r9 #3): the round routine records
    BENCH_PANEL2.json by running tools/bench_panel2.py; a renamed gate
    or harness crash would silently drop the panel. Run the real main()
    over a 2-gate slice at sf0.001 and check the JSON contract."""
    from tools import bench_panel2

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("BENCH_RUNS", "1")
    monkeypatch.setenv("PANEL2_NO_ARTIFACT", "1")
    slice_ = ["mm_interleaved_pack", "agg_median_bisect"]
    monkeypatch.setattr(bench_panel2, "PANEL", slice_)

    rc = bench_panel2.main()
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.startswith('{"metric"')]
    assert rc == 0 and len(lines) == 1, out
    data = json.loads(lines[0])
    assert data["unit"] == "sec" and data["sf"] == 0.001
    assert set(data["queries"]) == set(slice_)
    assert all(v >= 0 for v in data["queries"].values()), data["queries"]
    assert data["value"] > 0
    # sf0.001 != 0.1: the retry pass must not run, so no noise flags
    assert data["noise_suspected"] == []
    # every committed record must name a PANEL gate (catches renames)
    assert set(bench_panel2.BEST_KNOWN) <= set(
        ["graph_pagerank_converged", "sql_recursive_bfs",
         "text_bpe_merge_train", "sim_ivf_pq", "sim_kmeans_lloyd",
         "text_dedup_clusters_sliced", "agg_median_bisect",
         "stream_windowed_agg", "mm_interleaved_pack",
         "text_substring_dedup_clean"]
    )


def test_bench_panel2_fails_loud_on_gate_error(spark, monkeypatch, capsys):
    """ADVICE r10: a panel gate that errors used to be recorded as
    -1.0, excluded from the total, and the tool still exited 0 — a
    committed artifact could silently miss gates while reading green.
    main() must now return nonzero and list the failed gates in an
    'errors' field."""
    from tools import bench_panel2

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("BENCH_RUNS", "1")
    monkeypatch.setenv("PANEL2_NO_ARTIFACT", "1")
    monkeypatch.setattr(
        bench_panel2, "PANEL", ["mm_interleaved_pack", "no_such_gate_xyz"]
    )

    rc = bench_panel2.main()
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.startswith('{"metric"')]
    assert rc != 0 and len(lines) == 1, out
    data = json.loads(lines[0])
    assert data["errors"] == ["no_such_gate_xyz"]
    assert data["queries"]["no_such_gate_xyz"] == -1.0
    # the healthy gate still timed and still contributes to the total
    assert data["queries"]["mm_interleaved_pack"] >= 0
