"""Snowball Norwegian stemmer — pure-Column program + Python spec twin.

MongoDB's text index runs a per-language Snowball program server-side;
the reference ships $text straight to that index (route81.go:181-197),
so `$language: "norwegian"` (or "nb") on a Mongo deployment stems with
Snowball Norwegian. This module implements the published algorithm
(the snowballstem.org Norwegian stemmer description, CLASSIC revision
— i.e. WITHOUT the 2.x/3.x additions such as the revised s-ending and
the -ers/-ets conditions; the same revision-pin policy as
ops/french.py, ops/german.py and ops/swedish.py: Mongo vendors the
classic program) twice, independently:

  * ``norwegian_stem`` — one Column expression program over a single
    lowercased token. Zero Python per row, no shuffle.
  * ``norwegian_py`` — a direct Python transcription of the spec, used
    to stem $text query literals driver-side, to generate oracle
    fixtures (the twin-precomputed CASE lookups the DuckDB oracles
    share as data), and as the equivalence oracle for the
    column-vs-twin sweeps in tests/test_norwegian.py.

Algorithm (snowballstem.org norwegian.sbl, classic):

  Vowels: a e i o u y æ å ø. No prelude; no R2; no postlude (the
  stemmer keeps æ/å/ø — under the engine's diacritic-INsensitive
  default the $text analyzer folds AFTER stemming, the same chain
  order as French/German/Swedish; NFD folds only å -> a, æ/ø have no
  decomposition and survive the fold on both sides of a match).

  R1 = region after the first non-vowel following a vowel (end of
  word if none), then adjusted so at least 3 letters precede it —
  the same `test (hop 3 setmark x)` shape as German/Swedish.

  valid s-ending: one of b c d f g h j l m n o p r t v y z, OR a k
  NOT preceded by a vowel (a word-initial k has no preceding letter,
  so its grouping test fails — the s stays).

  Every step runs under `setlimit tomark p1 for ([substring])`: the
  candidate suffix must lie ENTIRELY within R1 for the among to SEE
  it (ops/swedish.py's containment semantics — 'nyhetene': 'hetene'
  starts before R1 and is invisible, 'ene' deletes -> 'nyhet'),
  while the s-ending / k-context letters are tested OUTSIDE the
  limit (the parenthesised `for ([substring])` scope ends before the
  among actions run). Among-commit semantics still apply: when the
  longest in-R1 candidate is 's' and the s-ending test fails, no
  shorter suffix is retried.

  Step 1 (longest in R1 of):
    a e ede ande ende ane ene hetene en heten ar er heter as es edes
    endes enes hetenes ens hetens ers ets et het ast -> delete;
    s -> delete if preceded by a valid s-ending;
    erte ert -> replace with er.
  Step 2: if the word ends dt or vt with the pair entirely in R1,
    delete the last letter (the t).
  Step 3 (longest in R1 of): leg eleg ig eig lig elig els lov elov
    slov hetslov -> delete.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from route81_spark.ops.porter import _bind1, _drop
from route81_spark.ops.swedish import (
    _bind_suffix_r1,
    _in_r1,
    _py_longest_in_r1,
)

_V = "aeiouyæåø"  # Norwegian vowels
_S_END = "bcdfghjlmnoprtvyz"  # valid s-ending (k handled separately)

_STEP1_SUFS = [
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
    "heten", "ar", "er", "heter", "as", "es", "edes", "endes",
    "enes", "hetenes", "ens", "hetens", "ers", "ets", "et", "het",
    "ast", "s", "erte", "ert",
]
_STEP2_PAIRS = ["dt", "vt"]
_STEP3_SUFS = [
    "leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
    "slov", "hetslov",
]


# --------------------------------------------------------------------
# Python spec twin
# --------------------------------------------------------------------

def _no_region(w: str) -> int:
    """R1 with the hop-3 adjustment: position after the first
    non-vowel following a vowel (end of word if none), lifted to >= 3
    when the word has >= 3 letters."""
    p1 = len(w)
    for i in range(1, len(w)):
        if w[i] not in _V and w[i - 1] in _V:
            p1 = i + 1
            break
    return max(p1, 3) if len(w) >= 3 else p1


def _py_valid_s(w: str) -> bool:
    """The letter before a final s is a valid s-ending (tested on the
    WHOLE word — the setlimit scope ends before the among action)."""
    if len(w) < 2:
        return False
    prev = w[-2]
    if prev in _S_END:
        return True
    return prev == "k" and len(w) >= 3 and w[-3] not in _V


def _py_step1(w: str, p1: int) -> str:
    sx = _py_longest_in_r1(w, _STEP1_SUFS, p1)
    if not sx:
        return w
    if sx == "s":
        # among commits: an in-R1 's' without a valid s-ending leaves
        # the word unchanged (no shorter retry)
        return w[:-1] if _py_valid_s(w) else w
    if sx in ("erte", "ert"):
        return w[: len(w) - len(sx)] + "er"
    return w[: len(w) - len(sx)]


def _py_step2(w: str, p1: int) -> str:
    if w[-2:] in _STEP2_PAIRS and _in_r1(w, w[-2:], p1):
        return w[:-1]
    return w


def _py_step3(w: str, p1: int) -> str:
    sx = _py_longest_in_r1(w, _STEP3_SUFS, p1)
    return w[: len(w) - len(sx)] if sx else w


def norwegian_py(word: str) -> str:
    """Snowball Norwegian stem of one lowercased token (spec twin)."""
    p1 = _no_region(word)
    w = _py_step1(word, p1)
    w = _py_step2(w, p1)
    return _py_step3(w, p1)


# --------------------------------------------------------------------
# pure-Column program
# --------------------------------------------------------------------

def _region_len_no(s: Column) -> Column:
    """R1 start for Norwegian vowels, hop-3 adjusted (the shared
    Scandinavian shape — ops/swedish.py's with æ/å/ø for ä/å/ö)."""
    pre = F.regexp_extract(s, f"^(.*?[{_V}][^{_V}])", 1)
    raw = F.when(pre != "", F.length(pre)).otherwise(F.length(s))
    return F.greatest(raw, F.least(F.lit(3), F.length(s)))


def _no_step1_col(w: Column, p1: Column) -> Column:
    def body(sx: Column, pos: Column) -> Column:
        stem = w.substr(F.lit(1), pos)
        # valid s-ending on the WHOLE word (outside the limit):
        # substr is 1-based, so w.substr(pos, 1) IS the letter just
        # before the 0-based suffix start `pos`, and substr(pos-1, 1)
        # the one before a candidate k (absent at word start -> the
        # grouping test fails, exactly `non-v` at the limit)
        s_ok = (
            (pos >= 1)
            & w.substr(pos, F.lit(1)).rlike(f"^[{_S_END}]$")
        ) | (
            (pos >= 2)
            & (w.substr(pos, F.lit(1)) == "k")
            & w.substr(pos - 1, F.lit(1)).rlike(f"^[^{_V}]$")
        )
        return (
            F.when(sx == "", w)
            .when(sx == "s", F.when(s_ok, stem).otherwise(w))
            .when(sx == "erte", _drop(w, 2))
            .when(sx == "ert", _drop(w, 1))
            .otherwise(stem)
        )

    return _bind_suffix_r1(w, _STEP1_SUFS, p1, body)


def _no_step2_col(w: Column, p1: Column) -> Column:
    pair = F.substring(w, -2, 2)
    return F.when(
        pair.isin(*_STEP2_PAIRS) & (F.length(w) - 2 >= p1), _drop(w, 1)
    ).otherwise(w)


def _no_step3_col(w: Column, p1: Column) -> Column:
    def body(sx: Column, pos: Column) -> Column:
        return F.when(sx == "", w).otherwise(w.substr(F.lit(1), pos))

    return _bind_suffix_r1(w, _STEP3_SUFS, p1, body)


def norwegian_stem(tok: Column) -> Column:
    """Snowball Norwegian stem of ONE lowercased token, as a single
    Column expression: R1 (hop-3 adjusted) computed once and riding
    along; each step's output binds before the next step reads it."""

    def run(w: Column, p1: Column) -> Column:
        w1 = _no_step1_col(w, p1)
        w2 = _bind1(w1, lambda x: _no_step2_col(x, p1))
        return _bind1(w2, lambda x: _no_step3_col(x, p1))

    s = F.struct(tok.alias("w"), _region_len_no(tok).alias("p1"))
    return F.get(
        F.transform(
            F.array(s),
            lambda b: run(b.getField("w"), b.getField("p1")),
        ),
        0,
    )


def norwegian_stem_tokens(toks: Column) -> Column:
    """Stem EVERY element of a token array through one call_function
    against a once-per-session SQL temp function (ops/sqlfn.py) —
    the same registration machinery as the English/French/German/
    Swedish stemmers; inline transform() fallback when no session is
    active."""
    from route81_spark.ops.sqlfn import tokens_fn

    return tokens_fn("__r81_norwegians", norwegian_stem, toks)
