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
