"""Per-query bench profile: split each BENCH query's wall time into
DataFrame CONSTRUCTION (Python+Py4J tree building) vs EXECUTION (noop
sink), count the Spark jobs each one launches, and count Exchange /
BatchEvalPython nodes in the executed plan. This is the guide-§1
"measure first" instrument for the optimization rounds: at sf0.1 the
data is ~17 MB, so fixed per-query costs (tree construction, analysis,
job round trips) can rival the actual compute, and this tells the two
apart.

Usage: python tools/bench_profile.py [runs] [name ...]
Writes /tmp/bench_profile.json and prints a sorted table.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from route81_spark import harness
from route81_spark.session import get_spark


def main() -> None:
    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = set(sys.argv[2:])
    spark = get_spark("bench_profile")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    qs = harness.queries()
    qs["envelope_lineitem_parseback"] = qs["envelope_lineitem"]
    qs["envelope_lineitem"] = harness.envelope_lineitem_build
    names = [n for n in bench.BENCH_QUERIES if not only or n in only]

    # warm phase (same as bench.py)
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for name in names:
        bench.materialize(qs[name](spark, warm_dir))

    out: dict[str, dict] = {}
    for _ in range(runs):
        for name in names:
            sc.setJobDescription(f"profile:{name}")
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()  # analyzer+optimizer+physical
            t2 = time.perf_counter()
            bench.materialize(df)
            t3 = time.perf_counter()
            jobs = len(tracker.getJobIdsForGroup(None) or []) - j0
            rec = out.setdefault(
                name, {"build": 1e9, "plan": 1e9, "exec": 1e9, "total": 1e9,
                       "jobs": 0}
            )
            rec["build"] = min(rec["build"], round(t1 - t0, 3))
            rec["plan"] = min(rec["plan"], round(t2 - t1, 3))
            rec["exec"] = min(rec["exec"], round(t3 - t2, 3))
            rec["total"] = min(rec["total"], round(t3 - t0, 3))
            rec["jobs"] = max(rec["jobs"], jobs)
            sc.setJobDescription(None)

    # plan shape (once, outside timing)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out[name]["exchanges"] = len(re.findall(r"\bExchange\b", plan))
        out[name]["python"] = len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInArrow|FlatMapsInPandas|MapInPandas", plan)
        )

    with open("/tmp/bench_profile.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    rows = sorted(out.items(), key=lambda kv: -kv[1]["total"])
    print(f"{'query':32s} {'total':>7s} {'build':>7s} {'plan':>7s} "
          f"{'exec':>7s} {'jobs':>4s} {'exch':>4s} {'py':>3s}")
    for name, r in rows:
        print(f"{name:32s} {r['total']:7.3f} {r['build']:7.3f} "
              f"{r['plan']:7.3f} {r['exec']:7.3f} {r['jobs']:4d} "
              f"{r['exchanges']:4d} {r['python']:3d}")
    tot = sum(r["total"] for _, r in rows)
    tb = sum(r["build"] for _, r in rows)
    tp = sum(r["plan"] for _, r in rows)
    te = sum(r["exec"] for _, r in rows)
    print(f"{'TOTAL':32s} {tot:7.3f} {tb:7.3f} {tp:7.3f} {te:7.3f}")


if __name__ == "__main__":
    main()
