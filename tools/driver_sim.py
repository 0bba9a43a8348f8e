"""Full driver simulation: import __spark_entry__ by path in THIS fresh
process, build a bare SparkSession (none of the engine's configs — the
driver owns its session), run entry() + every queries()/oracle_sql()
pair at the given sf, and compare exactly like tools/compare.py.

This is the closest local replica of the driver's t1/t2 gates.
Usage: python tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import importlib.util
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(_REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # t1: smoke
    rows = mod.entry(spark).collect()
    assert len(rows) > 0, "entry() returned no rows"
    print(f"t1 smoke: entry() -> {len(rows)} rows OK", flush=True)

    # t2: correctness
    from tools.compare import compare_one, duck_connect
    from big_data_flight_spark.registry import _REGISTRY, _load_all_operator_modules

    _load_all_operator_modules()
    con = duck_connect(sf_dir)
    qs = mod.queries()
    failed = []
    for name in sorted(qs):
        r = compare_one(spark, con, name, _REGISTRY[name], sf_dir, verbose=False)
        ok = r["status"] in ("OK", "WEAK_OK")
        print(("PASS " if ok else "FAIL ") + name.ljust(28) + r["status"], flush=True)
        if not ok:
            failed.append(r)
    for r in failed:
        print("FAIL DETAIL:", r)
    print(f"t2: {len(qs) - len(failed)}/{len(qs)} passed @ {sf_dir} (bare session)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
