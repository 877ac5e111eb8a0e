"""Second-derivation guard for the Swedish program: a from-scratch
simulation of classic swedish.sbl's backward-mode cursor mechanics
(the same independent structure as tests/test_norwegian_sim.py —
limit ints + bracket positions, not the twin's suffix-table
formulation), fuzzed against the committed twin. The r12 review pass
ran a one-off ~196k-word fuzz of this kind; this makes the detector
permanent for the ADVICE bug class (a divergence BOTH twins share,
invisible to column-vs-twin grids).

MAINTENANCE RULE: when this test disagrees with the twin, adjudicate
against the PUBLISHED algorithm description only — never "fix" the
simulation by reading ops/swedish.py.
"""

from __future__ import annotations

import itertools
import random

from route81_spark.ops.swedish import swedish_py

_V = set("aeiouyäåö")
_S_LETTERS = set("bcdfghjklmnoprtvy")

_STEP1 = [
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
    "arne", "are", "aste", "en", "anden", "aren", "heten", "ern",
    "ar", "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es",
    "ades", "andes", "ens", "arens", "hetens", "erns", "at", "andet",
    "het", "ast", "s",
]
_PAIRS = ["dd", "gd", "nn", "dt", "gt", "kt", "tt"]
_STEP3_DEL = ["lig", "ig", "els"]


def _mark_regions(w: str) -> int:
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
    best = None
    for s in table:
        if w.endswith(s) and len(w) - len(s) >= lim:
            if best is None or len(s) > len(best):
                best = s
    return best


def _sim(w: str) -> str:
    p1 = _mark_regions(w)
    # main_suffix: among commits — a chosen 's' whose s-ending test
    # (outside the limit) fails leaves the word whole, no retry
    s = _longest_under_limit(w, p1, _STEP1)
    if s is not None:
        c = len(w) - len(s)
        if s == "s":
            if c >= 1 and w[c - 1] in _S_LETTERS:
                w = w[:c]
        else:
            w = w[:c]
    # consonant_pair: both letters in R1 -> drop the last
    if _longest_under_limit(w, p1, _PAIRS) is not None:
        w = w[:-1]
    # other_suffix: lig/ig/els delete; löst -> lös, fullt -> full
    s3 = _longest_under_limit(w, p1, _STEP3_DEL + ["löst", "fullt"])
    if s3 is not None:
        if s3 in ("löst", "fullt"):
            w = w[:-1]
        else:
            w = w[: len(w) - len(s3)]
    return w


def test_simulation_agrees_on_random_words():
    rng = random.Random(29)
    alpha = "aeiouyäåö" + "bcdfghjklmnprstv"
    bad = []
    for _ in range(20000):
        w = "".join(
            rng.choice(alpha) for _ in range(rng.randint(0, 12))
        )
        if _sim(w) != swedish_py(w):
            bad.append((w, _sim(w), swedish_py(w)))
            if len(bad) > 5:
                break
    assert not bad, bad


def test_simulation_agrees_exhaustively_on_small_words():
    bad = []
    for ln in range(0, 5):
        for t in itertools.product("aenslötg", repeat=ln):
            w = "".join(t)
            if _sim(w) != swedish_py(w):
                bad.append((w, _sim(w), swedish_py(w)))
                if len(bad) > 5:
                    break
    assert not bad, bad
