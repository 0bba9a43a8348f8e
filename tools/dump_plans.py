"""Dump `explain("formatted")` for named gate queries to per-query files.

Round-12 deliverable support: the optimization judge checks plan claims
against committed `plans/r12/<query>_before.txt` / `..._after.txt`
files. This tool captures the formatted physical plan of each named
gate at a given SF dir. Run it once from the round-start tree (a git
worktree at the round's base commit) with `--suffix _before --repo
<worktree>` and once from HEAD with `--suffix _after`.

Usage:
    python tools/dump_plans.py --out plans/r12 --suffix _after \
        [--repo /path/to/tree] [--sf-dir /root/testdata/sf0.1] q1 q2 ...

Plans are captured with the default correctness session (AQE on — the
pre-AQE strategy is shown, same convention as PLANS.md) at the bench
scale factor so broadcast-size estimates match what the bench measures.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from big_data_flight_spark.registry import _REGISTRY, _load_all_operator_modules
    from big_data_flight_spark.session import get_session

    _load_all_operator_modules()
    spark = get_session("dump_plans")
    os.makedirs(args.out, exist_ok=True)

    rc = 0
    for name in args.queries:
        q = _REGISTRY.get(name)
        if q is None:
            print(f"SKIP {name}: not in registry of this tree", file=sys.stderr)
            continue
        try:
            df = q.builder(spark, args.sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}", file=sys.stderr)
            rc = 1
            continue
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"# {name} — explain('formatted') @ {args.sf_dir}, "
                f"tree={args.repo}\n" + txt
            )
        print(f"wrote {path} ({len(txt)} chars)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
