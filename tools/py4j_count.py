"""Count Py4J round trips per bench-query CONSTRUCTION (guide §1 /
§4.1: on this driver the JVM gateway round trip costs ~0.5-5 ms, so a
query whose build makes hundreds of calls pays seconds of pure driver
latency before any data moves). Prints calls + build seconds per query,
sorted by call count.

Usage: python tools/py4j_count.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import py4j.clientserver as _cs

from route81_spark import harness
from route81_spark.session import get_spark

CALLS = 0
_orig = _cs.ClientServerConnection.send_command


def _counting(self, *a, **kw):
    global CALLS
    CALLS += 1
    return _orig(self, *a, **kw)


def main() -> None:
    import bench

    _cs.ClientServerConnection.send_command = _counting
    only = set(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("py4j_count")
    qs = harness.queries()
    qs["envelope_lineitem_parseback"] = qs["envelope_lineitem"]
    qs["envelope_lineitem"] = harness.envelope_lineitem_build
    names = [n for n in bench.BENCH_QUERIES if not only or n in only]
    # warm: session-scoped registration (temp SQL functions, table
    # handles) happens once, exactly as in bench.py's warm phase
    for n in names:
        qs[n](spark, sf_dir)
    global CALLS
    rows = []
    for n in names:
        CALLS = 0
        t0 = time.perf_counter()
        qs[n](spark, sf_dir)
        rows.append((n, CALLS, time.perf_counter() - t0))
    rows.sort(key=lambda r: -r[1])
    tot_c = sum(r[1] for r in rows)
    tot_t = sum(r[2] for r in rows)
    print(f"{'query':34}{'py4j_calls':>11}{'build_s':>9}")
    for n, c, t in rows:
        print(f"{n:34}{c:11d}{t:9.3f}")
    print(f"{'TOTAL':34}{tot_c:11d}{tot_t:9.3f}")


if __name__ == "__main__":
    main()
