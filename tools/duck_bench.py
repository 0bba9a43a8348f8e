"""DuckDB side of the BASELINE comparison — min-of-N oracle timings.

Times each headline gate's ORACLE SQL in DuckDB on the same sf dir the
Spark bench uses, with the same estimator (1 warm-up + min of N timed
runs, default 5) so the Spark:DuckDB ratio in BASELINE.md compares
like with like. Headline queries whose oracle is structurally non-comparable are
listed in SKIP with a reason and reported in the JSON's "skipped"
map instead of being timed (SKIP mirrors compare.py's
SLOW_ORACLE_AT_SF01 plus the streaming gate):

* text_near_dedup_jaccard / text_minhash_mllib — the DuckDB oracle
  is the quadratic all-pairs form and aborts at sf0.1 (the asymmetry
  IS the point of those gates). Neither mllib nor any other
  non-headline gate is timed; the entry exists so adding one to
  HEADLINE can never silently hang this tool.
* stream_source_sink — micro-batch machinery has no DuckDB analogue.

Usage:
    python tools/duck_bench.py                  # headline set @ sf0.1
    SF_DIR=... DUCK_RUNS=7 python tools/duck_bench.py
Prints one JSON line: {"queries": {name: sec}, "skipped": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from big_data_flight_spark.registry import _REGISTRY, _load_all_operator_modules  # noqa: E402
from tools.compare import SLOW_ORACLE_AT_SF01, duck_connect  # noqa: E402

# Derived from compare.py's set, not hand-duplicated (ADVICE r4): a
# future quadratic-oracle gate added to both HEADLINE and
# SLOW_ORACLE_AT_SF01 is then skipped here automatically instead of
# hanging this tool at sf0.1. The streaming entry is the one local
# overlay (it is skipped for a different reason: no DuckDB analogue,
# which compare.py has no concept of).
SKIP = {n: "quadratic oracle aborts at sf0.1" for n in SLOW_ORACLE_AT_SF01}
SKIP["stream_source_sink"] = "no DuckDB analogue (micro-batch machinery)"


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("DUCK_RUNS", "5"))
    _load_all_operator_modules()
    from bench import HEADLINE  # noqa: E402  (repo root on sys.path)

    con = duck_connect(sf_dir)
    timings: dict[str, float] = {}
    skipped = {n: SKIP[n] for n in HEADLINE if n in SKIP}
    for name in HEADLINE:
        if name in SKIP:
            continue
        sql = _REGISTRY[name].oracle
        con.execute(sql).fetchall()  # warm-up
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 3)
        print(f"{name}: {timings[name]}", file=sys.stderr)
    print(json.dumps({"queries": timings, "skipped": skipped, "sf_dir": sf_dir, "runs": runs}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
