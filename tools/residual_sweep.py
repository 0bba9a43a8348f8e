"""Residual plan sweep over EVERY registered gate.

Builds each gate's DataFrame, captures explain('formatted'), and flags:
  - CartesianProduct / BroadcastNestedLoopJoin
  - BatchEvalPython / ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
    (the Python boundary — should exist only in the declared UDF twins)
  - Exchange SinglePartition (driver-funnel smell)
  - Generate over a non-trivial generator child expression (the r10
    InferFiltersFromGenerate clone signature: an aliased expensive
    array inlined into the generator re-runs per element)
  - Scan of a >1-column parquet with a Filter directly above it (only
    ColumnarToRow/InputAdapter between) but empty PushedFilters
    (pushdown silently lost — guide §6)

ADVICE r12 #1: the last two checks were documented but unimplemented
in the r12 sweep; they are real code now, unit-pinned (including an
intentional-violation case) in tests/test_sweep_guards.py, which also
validates the committed sweep artifact against the KNOWN_CLASSES
below — a NEW flag class in a committed sweep fails the suite.

Writes a JSON report (default /tmp/residual_sweep.json; --out to
commit one under plans/r<N>/).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# The flag-class vocabulary. Every flag a sweep can emit starts with
# one of these prefixes; the guard test fails on any committed sweep
# whose flags fall outside the vocabulary OR outside the documented
# bounded classes (KNOWN_BOUNDED below).
FLAG_CLASSES = ("CARTESIAN", "BNLJ", "PY", "SINGLEPART", "GENERATE_INLINE",
                "NOPUSHDOWN", "BUILD_ERROR")

# Documented-bounded classes (r12 adjudication, OPTIMIZATION_r12.md):
#  - BNLJ: declared bounded nested-loop sweeps (sim_* quadratic
#    baselines, range/theta joins over bounded slices, scalar frames).
#  - PY: the declared UDF-surface twins (udfs.py, python datasource,
#    pandas/arrow kernels).
#  - SINGLEPART: ordered-output / global-scalar frames (TakeOrdered
#    alternatives where the output is rows-bounded).
# A committed sweep may contain ONLY these; CARTESIAN,
# GENERATE_INLINE, NOPUSHDOWN and BUILD_ERROR fail the guard outright.
KNOWN_BOUNDED = ("BNLJ", "PY", "SINGLEPART")

_TREE_LINE = re.compile(r"^[\s:+|*-]*?([A-Za-z][A-Za-z0-9 ._]*?)\s*\((\d+)\)\s*$")


def _parse_tree(plan: str) -> list[tuple[int, str, int]]:
    """(depth, opname, id) for each tree line of a formatted plan.
    Depth = column where the operator name starts (the tree is drawn
    with ':-'/'+-' branches, so the name column is monotone with
    nesting depth)."""
    out = []
    for line in plan.splitlines():
        if line.startswith("=="):
            continue
        if not line.strip():
            break  # blank line ends the tree section
        m = _TREE_LINE.match(line)
        if m:
            name = m.group(1).strip().lstrip("* ").strip()
            depth = line.index(name[0], 0) if name else 0
            depth = len(line) - len(line.lstrip(" :+|-*"))
            out.append((depth, name, int(m.group(2))))
    return out


def _detail_block(plan: str, node_id: int) -> str:
    """The '(n) OpName ...' detail section for one node id."""
    m = re.search(rf"^\({node_id}\) .*?(?=^\(\d+\) |\Z)", plan, re.M | re.S)
    return m.group(0) if m else ""


def analyze_plan(plan: str) -> list[str]:
    """All residual flags for one formatted plan (pure function —
    unit-testable without Spark)."""
    flags: list[str] = []
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in plan:
        flags.append("BNLJ")
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "FlatMapGroupsInPandas", "MapInArrow", "PythonUDTF",
                 "FlatMapCoGroupsInPandas", "AggregateInPandas"):
        if node in plan:
            flags.append(f"PY:{node}")
    n_single = len(re.findall(r"Exchange SinglePartition", plan))
    if n_single:
        flags.append(f"SINGLEPART:{n_single}")

    # Generate over a non-trivial generator child: the detail block's
    # Arguments begin with [pos]explode(<expr>); a bare attribute ref
    # ('explode(toks#123)') is fine, any nested '(' inside the
    # generator argument is the inline-clone signature.
    for m in re.finditer(r"Arguments: (?:pos)?explode\(([^\n]*)", plan):
        arg = m.group(1)
        # cut at the argument list's closing paren: take up to the
        # first top-level ')' by paren counting
        depth, inner = 1, []
        for ch in arg:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            inner.append(ch)
        if "(" in "".join(inner):
            flags.append("GENERATE_INLINE")
            break

    # Filter directly above a >1-col parquet scan with empty
    # PushedFilters (ColumnarToRow/InputAdapter transparent).
    tree = _parse_tree(plan)
    for i, (depth, name, nid) in enumerate(tree):
        if not name.startswith("Scan parquet"):
            continue
        detail = _detail_block(plan, nid)
        if "PushedFilters: []" not in detail:
            continue
        mm = re.search(r"ReadSchema: struct<([^\n]*)", detail)
        ncols = mm.group(1).count(":") if mm else 0
        if ncols <= 1:
            continue
        # walk upward: nearest shallower lines are the ancestor chain
        j, want = i - 1, depth
        hops = 0
        while j >= 0 and hops < 3:
            d2, n2, _ = tree[j]
            if d2 < want:
                want = d2
                hops += 1
                if n2.startswith(("ColumnarToRow", "InputAdapter")):
                    j -= 1
                    continue
                if n2.startswith("Filter"):
                    flags.append("NOPUSHDOWN")
                break
            j -= 1
        if "NOPUSHDOWN" in flags:
            break
    return flags


def validate_report(report: dict) -> dict[str, list[str]]:
    """Gate name -> offending flags, for every flag outside the
    documented-bounded classes. Empty dict = clean sweep."""
    bad: dict[str, list[str]] = {}
    for name, rec in report.items():
        off = [f for f in rec.get("flags", ())
               if not f.startswith(KNOWN_BOUNDED)]
        if off:
            bad[name] = off
    return bad


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/residual_sweep.json")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from big_data_flight_spark.registry import _REGISTRY, _load_all_operator_modules
    from big_data_flight_spark.session import get_session

    _load_all_operator_modules()
    spark = get_session("residual_sweep")

    report = {}
    names = args.names or sorted(_REGISTRY.keys())
    print(f"{len(names)} gates")
    for i, name in enumerate(names):
        q = _REGISTRY[name]
        try:
            df = q.builder(spark, args.sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            report[name] = {"flags": analyze_plan(plan),
                            "exchanges": plan.count("Exchange"),
                            "plan_lines": plan.count("\n")}
        except Exception as e:  # noqa: BLE001
            report[name] = {"flags": [f"BUILD_ERROR:{type(e).__name__}"],
                            "err": str(e)[:200]}
        if (i + 1) % 25 == 0:
            print(f"  {i+1}/{len(names)}", flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)

    flagged = {k: v for k, v in report.items() if v["flags"]}
    print(f"\nFlagged: {len(flagged)}")
    for k, v in sorted(flagged.items()):
        print(f"  {k}: {v['flags']}")
    bad = validate_report(report)
    print(f"Outside bounded classes: {len(bad)}")
    for k, v in sorted(bad.items()):
        print(f"  !! {k}: {v}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
