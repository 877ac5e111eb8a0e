"""Dump `.explain("formatted")` of named registered queries to files —
the per-query plan evidence the optimization rounds commit under
plans/r{N}/ (<query>_<tag>.txt).

Usage: python tools/plan_dump.py <out_dir> <tag> <name> [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    import __spark_entry__ as entry
    from route81_spark.session import get_spark

    spark = get_spark("plan_dump", 8)
    qs = entry.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{tag}.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
