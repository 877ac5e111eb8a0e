"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the route81_spark/harness/ package (one
registry module per domain), which routes every query through the
engine's actual surfaces (pipeline compiler, envelope builder,
classifier/merge, dedup/similarity/text ops).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from route81_spark import harness  # noqa: E402

# The driver records at most the first ~50 registered queries per round,
# so the full 90+ registry needs two rounds to get driver rows. Rotate
# automatically: the must-stay-green headline set is always first, then
# every other query ordered by the round it last got a driver row
# (never-recorded first, then oldest), tie-broken by registration order.
# Consecutive rounds therefore alternate halves without hand-kept lists.
_HEADLINE = [
    # r13: only queries whose GENERATED PLAN changed this round (the
    # freshness discipline), computed by tools/plan_snapshot.py
    # before/after the round's code changes (r12 pristine-HEAD
    # baseline vs final code, lambda-ordinal normalization added --
    # the session-global `lambda x_406` counters renumber untouched
    # plans and are not shape). Two sources of change: (1) the r13
    # ADVICE German prelude fix (the u/y mark's trailing context
    # vowel became a lookahead) rewrites the _MARK_PAT literal inside
    # every plan that embeds the German stemmer -- the three German
    # text queries; (2) the Snowball NORWEGIAN stemmer landed
    # (ops/norwegian.py) and the languageOverride CASE derives every
    # arm from the registry, so the one recorded query compiling a
    # per-document analyzer gained an nb arm (it also embeds the
    # German fix). Every other recorded query's plan is
    # byte-identical under the normalizer (verified: the 4 below +
    # the 4 new registrations are the EXACT diff). The 4 new r13
    # queries (match_text_norwegian, text_bm25_norwegian,
    # text_bm25_swedish, stage_stem_swedish -- the last two close the
    # unit-pinned-but-not-driver-graded Swedish bm25/$stem forms,
    # and the Norwegian bm25 registration lands in the stemmer's own
    # round) sort first in the tail automatically; 4 headline + 4
    # new + the ENTIRE 42-row r8 cohort = exactly the 50-slot window
    # (nothing stays older than r9 after this round). headline+new =
    # 8 = the budget the r12 verdict's window math allows.
    "match_text_german",            # embeds the fixed German prelude
    "match_text_german_stopwords",  # same, behind the stop filter
    "text_bm25_german",             # same, on the no-fold bm25 path
    "match_text_langoverride",      # override CASE gained the nb arm
]


def _last_recorded_round() -> dict[str, int]:
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        try:
            with open(path) as f:
                names = list(json.load(f))
        except (OSError, json.JSONDecodeError):
            continue
        for k in names:
            seen[k] = max(seen.get(k, 0), int(m.group(1)))
    return seen


def _rotated(d: dict) -> dict:
    missing = [k for k in _HEADLINE if k not in d]
    if missing:
        raise KeyError(f"headline queries missing from registry: {missing}")
    seen = _last_recorded_round()
    reg = list(d)
    tail = sorted(
        (k for k in reg if k not in _HEADLINE),
        key=lambda k: (seen.get(k, -1), reg.index(k)),
    )
    return {k: d[k] for k in [*_HEADLINE, *tail]}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the Q1-style grouped
    aggregation compiled from a Mongo aggregation pipeline."""
    return harness.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(harness.queries())


def oracle_sql() -> dict[str, str]:
    # same order as queries() so driver row N compares the same query
    q = _rotated(harness.queries())
    oracles = harness.oracle_sql()
    return {k: oracles[k] for k in q if k in oracles}
