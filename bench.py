"""Benchmark harness — run the headline gate queries at the bench scale
factor and print ONE JSON line with per-query timings.

Protocol (BASELINE.md): one shared SparkSession (JVM startup excluded),
one warm-up + median of 3 timed runs per query, full materialization
via the noop sink (no driver-side collect cost). Configure with:
    SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS     (default 32)
    BENCH_RUNS           (default 3)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_flight_spark.registry import _REGISTRY, _load_all_operator_modules
from big_data_flight_spark.session import get_session

# Headline set: one representative per major operator family, weighted
# toward the shapes that dominate real workloads (scan-agg, star join,
# windows, event-time, text/similarity pipeline ops).
HEADLINE = [
    "agg_groupby",          # flagship scan→filter→groupBy (TPC-H Q1 shape)
    "tpch_q5",              # 6-way star join, broadcast dims
    "tpch_q18",             # HAVING semi-join + top-100
    "agg_distinct",         # distinct aggregation
    "agg_percentile",       # exact percentiles
    "join_inner_equi",      # fact-fact join
    "join_broadcast",       # star-schema dim chain
    "join_asof",            # custom as-of pattern
    "win_topk_per_group",   # rank window
    "evt_tumbling_window",  # event-time bucketing
    "evt_sessionize_stats", # sessionization (lag/cumsum + agg)
    "text_tokenize_counts", # explode word-count
    "text_near_dedup_jaccard",  # shingle inverted-index near-dup
    "sim_cosine_pairs",     # vector similarity
    "limit_topk",           # global top-k
    "stream_source_sink",   # streaming drain
    "tpch_q8",              # 7-join market-share ratio (deepest star)
    "tpch_q21",             # dual EXISTS/NOT-EXISTS fact self-join
    "text_ngram_freq",      # bigram corpus frequencies
    "mm_dedup_assets",      # binary-asset hash dedup
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    _load_all_operator_modules()
    spark = get_session("bench")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = _REGISTRY[name]
        try:
            materialize(q.builder(spark, sf_dir))  # warm-up (plan + page cache)
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                materialize(q.builder(spark, sf_dir))
                samples.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(samples), 3)
        except Exception as exc:  # noqa: BLE001
            print(f"bench error {name}: {exc}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": f"headline_{len(HEADLINE)}q_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
