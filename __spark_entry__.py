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
    # r14: only queries whose GENERATED PLAN changed this round (the
    # freshness discipline), computed by tools/plan_snapshot.py
    # before/after the round's code changes (r13 pristine-HEAD
    # baseline vs final code). Two sources of change: (1) the FRENCH
    # prelude fix (the compiled-Snowball-authority guard,
    # tests/test_snowball_authority.py, found the u/i/y marks
    # consuming their trailing context vowel -- the exact sibling of
    # the r13 German ADVICE fix; the _MARK_PAT literal now uses
    # lookaheads) rewrites every plan that embeds the French stemmer
    # -- the four French text queries; (2) the Snowball DANISH
    # stemmer landed (ops/danish.py) and the languageOverride CASE
    # derives every arm from the registry, so the one recorded query
    # compiling a per-document analyzer gained a da arm (it also
    # embeds the French fix). Every other recorded query's plan is
    # byte-identical under the normalizer (verified: the 5 below +
    # the 4 new registrations are the EXACT diff). The 4 new r14
    # queries (match_text_danish, text_bm25_danish, stage_stem_danish
    # -- engine and driver land together, the Norwegian-round pattern
    # -- and stage_stem_norwegian, closing the one r13
    # tested-vs-graded gap) sort first in the tail automatically;
    # 5 headline + 4 new + the ENTIRE 40-row r9 cohort = 49 of the
    # 50-slot window, so one r10 row also refreshes (nothing stays
    # older than r10 after this round). headline+new = 9 <= 10 = the
    # budget the r13 verdict's window math allows.
    "match_text_french",            # embeds the fixed French prelude
    "match_text_french_stopwords",  # same, behind the stop filter
    "text_bm25_french",             # same, on the no-fold bm25 path
    "stage_stem_french",            # same, on the $stem surface
    "match_text_langoverride",      # override CASE gained the da arm
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
