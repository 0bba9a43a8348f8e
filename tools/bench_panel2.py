"""Bench panel 2 — tracked perf signal for the post-r1 gate families
(VERDICT r9 #3).

The headline bench (bench.py, 20 queries) has ratcheted BEST_KNOWN
records since r4, but 269 of 289 gates carried NO tracked perf signal:
a plan regression in an iterative (pagerank, k-means, BPE), ANN
(IVF-PQ), sliced-dedup, or streaming gate would have been invisible
between rounds. This panel times ten heavy representatives of those
families under the SAME protocol discipline as bench.py — min-of-N on
a warm session, stall-wave retry against committed records, noise
flagging — and writes BENCH_PANEL2.json at the repo root. The driver
doesn't run this file (its contract names only bench.py); the round
routine runs it at stamp time and commits the artifact, and
tests/test_bench_smoke.py smoke-runs its main() so a renamed gate or
harness crash can't silently drop the panel.

Protocol notes vs bench.py:
- BUILDER-INCLUSIVE timing, every gate. Most of this panel is
  iterative (the work happens in a driver-side loop with
  localCheckpoint barriers) or eagerly-drained (streaming), so the
  prepared-plan protocol doesn't apply; for uniformity the lazy
  members (mm_interleaved_pack, sql_recursive_bfs) are timed
  builder-inclusive too. Numbers are therefore comparable WITHIN this
  panel across rounds, not to bench.py's prepared-plan numbers.
- Same min-of-N + retry + noise_suspected machinery, shared by import
  from bench.py where possible; records ratchet DOWN only — from a
  probe-QUIET window when one lands, else via the r12 codified
  fallback (CLAUDE.md): min across >=3 independent same-session
  windows beating the record by >10%.

Usage: python tools/bench_panel2.py          # sf0.1, min-of-3
       BENCH_RUNS=5 SPARK_GRAFT_SF_DIR=... python tools/bench_panel2.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# Same bench-session tuning as bench.py (see its header): these heavy
# gates carry their own repartition()/checkpoint discipline internally,
# so the env base matters less, but one consistent session shape keeps
# rounds comparable.
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
os.environ.setdefault("SPARK_GRAFT_AQE", "false")

PANEL = [
    "graph_pagerank_converged",   # iterative: checkpointed loop + unrolled oracle
    "sql_recursive_bfs",          # recursive-CTE BFS (UnionLoop plan)
    "text_bpe_merge_train",       # iterative BPE merge training
    "sim_ivf_pq",                 # composed IVF-PQ ANN stack
    "sim_kmeans_lloyd",           # bit-exact Lloyd iterations
    "text_dedup_clusters_sliced", # sliced label-propagation dedup
    "agg_median_bisect",          # driver-side bisection loop
    "stream_windowed_agg",        # streaming windowed aggregation drain
    "mm_interleaved_pack",        # multimodal training-sample assembler
    "text_substring_dedup_clean", # Lee-et-al substring dedup + clean
]

# Committed per-gate records (sec, builder-inclusive, sf0.1, min-of-3).
# Established r10 from two interleaved runs in a probe-characterized
# NOISY (not stall-wave) window — min-of-N is the sanctioned estimator
# there; starting records slightly high is safe because they ratchet
# DOWN only, and only from probe-gated windows (CLAUDE.md).
# text_substring_dedup_clean's record is post-Generate-fix (the 52.6 s
# first reading was the pathology the panel was built to catch; see
# BASELINE.md round-10).
# r12 re-adjudication (VERDICT r11 #2) under the codified fallback
# ratchet (CLAUDE.md): three independent same-session windows
# (totals 23.071 / 23.877 / 25.375, zero structural flags) — nine of
# ten r10-born records CONFIRMED as floors (no window-min beat any by
# >10%; seven were never beaten at all), text_bpe_merge_train
# ratcheted 1.816 -> 1.578 (13.1%). agg_median_bisect's 4.03 (9.1%)
# misses the bar — correctly not ratcheted. The r11
# stream_windowed_agg flag (1.0 vs 0.756) closed: r12 read
# 0.777/0.810/0.992 — the record is reachable, r11 was regime.
# r12 session 2: agg_median_bisect 4.434 -> 1.439 on the STRUCTURAL
# basis (the r10 jaccard precedent — structural wins ratchet from any
# regime): the 24 eager bit-bisection rounds were collapsed to two
# domain-bounded histogram passes in one lazy plan (BASELINE.md r12
# "24 eager rounds" section; matched-window sandwich 5.206 -> 1.422,
# first panel window on the new form 20.155 total / medb 1.439).
# Session-2 fallback ratchets (four same-session windows 23.788 /
# 20.155 / 19.546 / 18.550, fresh processes, the last three ZERO-flag
# and each in turn the best panel total ever recorded; probe still
# NOISY 2.8x, so all four are min-of-N fallback-rule ratchets):
# sql_recursive_bfs 2.528 -> 2.222 (readings 2.715/2.247/2.222/2.548 —
# 12.1% under record), sim_kmeans_lloyd 1.462 -> 1.298
# (1.503/1.298/1.425/1.410 — 11.2%), graph_pagerank_converged
# 4.925 -> 4.226 (4.722/5.511/5.061/4.226 — 14.2%), and
# agg_median_bisect's structural 1.439 tightened to 1.226 across the
# three new-form windows (1.439/1.358/1.226 — 14.8%); a FOURTH
# new-form window (the final committed BENCH_PANEL2.json) read 1.136,
# left unratcheted by the round-end record freeze (records move only
# when the protocol is re-run, never retroactively — ADVICE r12 #3
# notes the artifact/comment agreement here). Other mins
# inside the 10% bar (bpe 4.9%, ivf_pq 4.3%, substring_clean 6.4%,
# interleaved_pack 6.4% — floors confirmed again). Frozen here for
# the round; any residual sub-record reading stays unratcheted.
BEST_KNOWN: dict[str, float] = {
    "graph_pagerank_converged": 4.226,
    "sql_recursive_bfs": 2.222,
    "text_bpe_merge_train": 1.578,
    "sim_ivf_pq": 2.363,
    "sim_kmeans_lloyd": 1.298,
    "text_dedup_clusters_sliced": 2.248,
    "agg_median_bisect": 1.226,
    "stream_windowed_agg": 0.756,
    "mm_interleaved_pack": 0.605,
    "text_substring_dedup_clean": 1.065,
}


def _time_gate(spark, registry, name: str, sf_dir: str, runs: int) -> float:
    """Warm-up + min-of-runs, builder-INCLUSIVE (see module docstring)."""
    from bench import materialize

    q = registry[name]
    materialize(q.builder(spark, sf_dir))  # warm-up (codegen, page cache)
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        materialize(q.builder(spark, sf_dir))
        samples.append(time.perf_counter() - t0)
    return round(min(samples), 3)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from big_data_flight_spark.registry import (
        _REGISTRY,
        _load_all_operator_modules,
    )
    from big_data_flight_spark.session import get_session

    _load_all_operator_modules()
    spark = get_session("bench-panel2")

    timings: dict[str, float] = {}
    for name in PANEL:
        try:
            timings[name] = _time_gate(spark, _REGISTRY, name, sf_dir, runs)
        except Exception as exc:  # noqa: BLE001
            print(f"panel2 error {name}: {exc}", file=sys.stderr)
            timings[name] = -1.0

    # Stall-wave retry pass against committed records (bench.py's
    # machinery, same thresholds; sf0.1 records only apply at sf0.1).
    noise_suspected: list[str] = []
    for name in PANEL if sf == 0.1 else []:
        ref = BEST_KNOWN.get(name)
        if ref is None or timings[name] < 0:
            continue
        threshold = 1.25 * ref + 0.03
        attempts = 0
        while timings[name] > threshold and attempts < 2:
            attempts += 1
            try:
                t2 = _time_gate(spark, _REGISTRY, name, sf_dir, runs)
            except Exception as exc:  # noqa: BLE001
                print(f"panel2 retry error {name}: {exc}", file=sys.stderr)
                break
            if t2 < timings[name]:
                print(f"panel2 retry {name}: {timings[name]} -> {t2}",
                      file=sys.stderr)
                timings[name] = t2
        if timings[name] > threshold:
            noise_suspected.append(name)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    payload = {
        "metric": f"panel2_{len(PANEL)}q_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "noise_suspected": noise_suspected,
        "best_known_total": round(sum(BEST_KNOWN.values()), 3) if BEST_KNOWN else None,
        "protocol": "builder-inclusive min-of-%d, warm session" % runs,
    }
    errors = sorted(n for n, t in timings.items() if t < 0)
    if errors:
        payload["errors"] = errors
    print(json.dumps(payload))
    if not os.environ.get("PANEL2_NO_ARTIFACT"):
        with open(os.path.join(_REPO, "BENCH_PANEL2.json"), "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
    # A gate error is recorded as -1.0 and excluded from the total; the
    # panel exists so a regression can't hide, so a missing gate must
    # fail the run loudly (ADVICE r10), not exit green with a short
    # total that reads as "fast".
    if errors:
        print(f"panel2 FAILED gates: {errors}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
