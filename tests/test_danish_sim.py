"""Second-derivation guard for the Danish program: a from-scratch
simulation of classic danish.sbl's BACKWARD-MODE cursor mechanics
(limit ints + bracket positions + the ch string variable —
deliberately a different structure from ops/danish.py's suffix-table
twin), fuzzed against the committed twin. This is the detector for
the r13 ADVICE bug CLASS: a spec divergence BOTH the Column program
and its twin share is invisible to column-vs-twin grids, but not to
an independently structured re-derivation.

MAINTENANCE RULE: when this test disagrees with the twin, adjudicate
against the PUBLISHED algorithm description only — never "fix" the
simulation by reading ops/danish.py (that would collapse the two
derivations into one and the guard is gone).
"""

from __future__ import annotations

import itertools
import random

from route81_spark.ops.danish import danish_py

_V = set("aeiouyæåø")
_S_ENDING = set("abcdfghjklmnoprtvyzå")

_MAIN = [
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
    "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
    "heds", "es", "endes", "erendes", "enes", "ernes", "eres", "ens",
    "hedens", "erens", "ers", "ets", "erets", "et", "eret",
]
_PAIRS = ["gd", "dt", "gt", "kt"]
_OTHER = ["ig", "lig", "elig", "els"]


def _mark_regions(w: str) -> int:
    """$p1 = limit; test(hop 3 setmark x); goto v; gopast non-v;
    setmark p1; try($p1 < x $p1 = x)."""
    n = len(w)
    p1 = n
    i = 0
    while i < n and w[i] not in _V:
        i += 1
    if i < n:
        j = i
        while j < n and w[j] in _V:
            j += 1
        if j < n:
            p1 = j + 1
    if n >= 3 and p1 < 3:
        p1 = 3
    return p1


def _longest_under_limit(w: str, lim: int, table: list[str]) -> str | None:
    """Backward [substring] under `setlimit tomark p1`: a candidate
    suffix must start at a position >= the limit to be seen at all."""
    best = None
    for s in table:
        if w.endswith(s) and len(w) - len(s) >= lim:
            if best is None or len(s) > len(best):
                best = s
    return best


def _consonant_pair(w: str, p1: int) -> str:
    """test(setlimit for ([substring] among gd dt gt kt)) next ]
    delete: bra/ket set inside the test persist, the test restores
    only the cursor; net effect — word ends with a pair entirely in
    R1 -> the final letter deletes."""
    if _longest_under_limit(w, p1, _PAIRS) is not None:
        w = w[:-1]
    return w


def _sim(w: str) -> str:
    p1 = _mark_regions(w)
    # main_suffix (among commits: no shorter retry after a failed
    # condition on the chosen candidate)
    s = _longest_under_limit(w, p1, _MAIN + ["s"])
    if s is not None:
        c = len(w) - len(s)
        if s == "s":
            # s_ending letter read OUTSIDE the limit (only the
            # bracketed suffix is under `for ([substring])`)
            if c >= 1 and w[c - 1] in _S_ENDING:
                w = w[:c]
        else:
            w = w[:c]
    # consonant_pair (first call)
    w = _consonant_pair(w, p1)
    # other_suffix: do (['st'] 'ig' delete) — no limit anywhere
    if w.endswith("igst"):
        w = w[:-2]
    s3 = _longest_under_limit(w, p1, _OTHER + ["løst"])
    if s3 == "løst":
        w = w[: len(w) - 4] + "løs"
    elif s3 is not None:
        w = w[: len(w) - len(s3)]
        w = _consonant_pair(w, p1)  # the in-among `do consonant_pair`
    # undouble: setlimit for ([non-v] -> ch) ch delete — the bracketed
    # final non-vowel must sit in R1; the ch comparison letter is read
    # outside the limit
    if w and len(w) - 1 >= p1 and w[-1] not in _V:
        ch = w[-1]
        if len(w) >= 2 and w[-2] == ch:
            w = w[:-1]
    return w


def test_simulation_agrees_on_random_words():
    """20k seeded random words (alphabet incl. æ/å/ø and the
    s-ending/pair/undouble letters, lengths 0-12): the
    cursor-mechanics simulation and the committed twin must agree
    everywhere."""
    rng = random.Random(14)
    alpha = "aeiouyæåø" + "bcdfghjklmnprstvz"
    bad = []
    for _ in range(20000):
        w = "".join(
            rng.choice(alpha) for _ in range(rng.randint(0, 12))
        )
        if _sim(w) != danish_py(w):
            bad.append((w, _sim(w), danish_py(w)))
            if len(bad) > 5:
                break
    assert not bad, bad


def test_simulation_agrees_exhaustively_on_small_words():
    """Every string of length <= 4 over a compact alphabet chosen to
    hit the s-ending vowels (a), the gd/gt/kt pairs, undouble, and
    the R1 lift."""
    bad = []
    for ln in range(0, 5):
        for t in itertools.product("aeøsgktdn", repeat=ln):
            w = "".join(t)
            if _sim(w) != danish_py(w):
                bad.append((w, _sim(w), danish_py(w)))
                if len(bad) > 5:
                    break
    assert not bad, bad


def test_simulation_agrees_on_suffix_stacks():
    """Dense coverage of the step-1/3 tables: every table suffix
    appended to a small set of stems (real and adversarial), plus
    igst/løst/doubled-consonant composites."""
    stems = ["nyhed", "hund", "bestemm", "frisk", "væk", "so", "b",
             "arbejdsløs", "venl", "øjeblikk", "katt", "mul", ""]
    sufs = _MAIN + ["s", "igst", "løst", "gd", "dt", "gt", "kt",
                    "ig", "lig", "elig", "els", "tt", "mm"]
    bad = []
    for st, su in itertools.product(stems, sufs):
        w = st + su
        if _sim(w) != danish_py(w):
            bad.append((w, _sim(w), danish_py(w)))
    assert not bad, bad[:8]
