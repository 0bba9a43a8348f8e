"""Environment noise probe — characterize the box before trusting bench.

Round-4 finding (BASELINE.md): this environment exhibits exogenous
CPU-stall waves invisible to the guest (identical prepared plan
1 s ↔ 63 s, GC/cgroup/steal/PSI all clean). Run this FIRST in any
session that will make performance decisions: it materializes one
fixed mid-weight plan N times and prints min/median/max plus a
stall verdict, so you know whether an A/B measured now means anything.

Usage: python tools/noise_probe.py [N] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")
    from big_data_flight_spark.registry import (
        _REGISTRY,
        _load_all_operator_modules,
    )
    from big_data_flight_spark.session import get_session

    _load_all_operator_modules()
    spark = get_session("noise-probe")
    # jaccard: multi-stage, shuffle-bound, 32-way — the shape most
    # sensitive to stall waves (it produced the 1 s ↔ 63 s evidence)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    df = _REGISTRY["text_near_dedup_jaccard"].builder(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # warm-up
    samples = []
    for i in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
        print(f"run {i}: {samples[-1]:.3f}s", flush=True)
    lo, med, hi = min(samples), statistics.median(samples), max(samples)
    spread = hi / lo if lo > 0 else float("inf")
    verdict = (
        "QUIET (trust medians)" if spread < 1.5
        else "NOISY (trust min-of-N only)" if spread < 4
        else "STALL WAVES (defer perf decisions)"
    )
    print(
        f"min {lo:.3f}  median {med:.3f}  max {hi:.3f}  "
        f"spread {spread:.1f}x  -> {verdict}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
