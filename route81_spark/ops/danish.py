"""Snowball Danish stemmer — pure-Column program + Python spec twin.

MongoDB's text index runs a per-language Snowball program server-side;
the reference ships $text straight to that index (route81.go:181-197),
so `$language: "danish"` (or "da") on a Mongo deployment stems with
Snowball Danish. This module implements the published algorithm (the
snowballstem.org Danish stemmer description, CLASSIC revision — the
same revision-pin policy as ops/french.py, ops/german.py,
ops/swedish.py and ops/norwegian.py: Mongo vendors the classic
program) twice, independently:

  * ``danish_stem`` — one Column expression program over a single
    lowercased token. Zero Python per row, no shuffle.
  * ``danish_py`` — a direct Python transcription of the spec, used
    to stem $text query literals driver-side, to generate oracle
    fixtures (the twin-precomputed CASE lookups the DuckDB oracles
    share as data), and as the equivalence oracle for the
    column-vs-twin sweeps in tests/test_danish.py.

Algorithm (snowballstem.org danish.sbl, classic):

  Vowels: a e i o u y æ å ø — the IDENTICAL set to Norwegian, so the
  R1 machinery is imported from ops/norwegian.py rather than
  re-derived. No prelude; no R2; no postlude (the stemmer keeps
  æ/å/ø — under the engine's diacritic-INsensitive default the $text
  analyzer folds AFTER stemming, the same chain order as the other
  carried languages; NFD folds only å -> a, æ/ø have no decomposition
  and survive the fold on both sides of a match).

  R1 = region after the first non-vowel following a vowel (end of
  word if none), then adjusted so at least 3 letters precede it —
  the same `test (hop 3 setmark x)` shape as German/Swedish/
  Norwegian.

  valid s-ending: a b c d f g h j k l m n o p r t v y z å (note the
  VOWELS a/å and the unconditional k — Norwegian's k-not-after-vowel
  clause and Swedish's consonant-only class are both different).

  Every step runs under `setlimit tomark p1 for ([substring])`: the
  candidate suffix must lie ENTIRELY within R1 for the among to SEE
  it (ops/swedish.py's containment semantics — 'nyheder': 'heder'
  starts before R1 and is invisible, 'er' deletes -> 'nyhed'), while
  the s-ending letter (step 1), the igst pre-step (step 3) and the
  undouble pair letter (step 4) are tested OUTSIDE the limit.
  Among-commit semantics still apply: when the longest in-R1
  candidate is 's' and the s-ending test fails, no shorter suffix is
  retried.

  Step 1 (longest in R1 of):
    hed ethed ered e erede ende erende ene erne ere en heden eren er
    heder erer heds es endes erendes enes ernes eres ens hedens
    erens ers ets erets et eret -> delete;
    s -> delete if preceded by a valid s-ending.
  Step 2 (consonant_pair): if the word ends gd dt gt kt with the
    pair entirely in R1, delete the last letter ('friskt' ->
    'frisk').
  Step 3 (other_suffix): first, if the word ends igst (no R1
    condition — `do (['st'] 'ig' delete)` runs outside any limit),
    remove the final st. Then (longest in R1 of): ig lig elig els ->
    delete AND repeat step 2 ('solgte' -> step-1 'solgt' -> step-2
    'solg'; the gd pair is significant only on this repeat call);
    løst -> replace with løs.
  Step 4 (undouble): if the word ends with a doubled non-vowel whose
    LAST letter is in R1 (the bracket runs under the limit; the
    matching letter before it is tested outside), remove one
    ('bestemmelse' -> 'bestemmels' -> 'bestemm' -> 'bestem').
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from route81_spark.ops.norwegian import _no_region, _region_len_no
from route81_spark.ops.porter import _bind1, _drop
from route81_spark.ops.swedish import (
    _bind_suffix_r1,
    _in_r1,
    _py_longest_in_r1,
)

_V = "aeiouyæåø"  # Danish vowels (== Norwegian's, see module docstring)
_S_END = "abcdfghjklmnoprtvyzå"  # valid s-ending (vowels a/å included)

_STEP1_SUFS = [
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
    "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
    "heds", "es", "endes", "erendes", "enes", "ernes", "eres", "ens",
    "hedens", "erens", "ers", "ets", "erets", "et", "eret", "s",
]
_STEP2_PAIRS = ["gd", "dt", "gt", "kt"]
_STEP3_SUFS = ["ig", "lig", "elig", "els", "løst"]


# --------------------------------------------------------------------
# Python spec twin
# --------------------------------------------------------------------

def _py_pair(w: str, p1: int) -> str:
    """consonant_pair: drop the final letter when the word ends with
    one of the gd/dt/gt/kt pairs lying entirely in R1."""
    if w[-2:] in _STEP2_PAIRS and _in_r1(w, w[-2:], p1):
        return w[:-1]
    return w


def _py_step1(w: str, p1: int) -> str:
    sx = _py_longest_in_r1(w, _STEP1_SUFS, p1)
    if not sx:
        return w
    if sx == "s":
        # among commits: an in-R1 's' whose preceding letter is not a
        # valid s-ending leaves the word unchanged (no shorter retry);
        # the letter itself is tested OUTSIDE the limit
        if len(w) >= 2 and w[-2] in _S_END:
            return w[:-1]
        return w
    return w[: len(w) - len(sx)]


def _py_step3(w: str, p1: int) -> str:
    # `do (['st'] 'ig' delete)` — ends igst, drop the st; NO limit
    if w.endswith("igst"):
        w = w[:-2]
    sx = _py_longest_in_r1(w, _STEP3_SUFS, p1)
    if sx == "løst":
        return w[:-1]  # <- 'løs': drop the final t
    if sx:
        # delete, then repeat the consonant_pair step on the result
        return _py_pair(w[: len(w) - len(sx)], p1)
    return w


def _py_step4(w: str, p1: int) -> str:
    """undouble: the final letter is a non-vowel in R1 and equals the
    letter before it (that one tested outside the limit) -> drop one."""
    if (
        len(w) >= 2
        and len(w) - 1 >= p1
        and w[-1] not in _V
        and w[-2] == w[-1]
    ):
        return w[:-1]
    return w


def danish_py(word: str) -> str:
    """Snowball Danish stem of one lowercased token (spec twin)."""
    p1 = _no_region(word)  # identical vowel set — see module docstring
    w = _py_step1(word, p1)
    w = _py_pair(w, p1)
    w = _py_step3(w, p1)
    return _py_step4(w, p1)


# --------------------------------------------------------------------
# pure-Column program
# --------------------------------------------------------------------

def _da_pair_col(w: Column, p1: Column) -> Column:
    pair = F.substring(w, -2, 2)
    return F.when(
        pair.isin(*_STEP2_PAIRS) & (F.length(w) - 2 >= p1), _drop(w, 1)
    ).otherwise(w)


def _da_step1_col(w: Column, p1: Column) -> Column:
    def body(sx: Column, pos: Column) -> Column:
        stem = w.substr(F.lit(1), pos)
        # valid s-ending on the WHOLE word (outside the limit):
        # substr is 1-based, so w.substr(pos, 1) IS the letter just
        # before the 0-based suffix start `pos`
        return (
            F.when(sx == "", w)
            .when(
                sx == "s",
                F.when(
                    (pos >= 1)
                    & w.substr(pos, F.lit(1)).rlike(f"^[{_S_END}]$"),
                    stem,
                ).otherwise(w),
            )
            .otherwise(stem)
        )

    return _bind_suffix_r1(w, _STEP1_SUFS, p1, body)


def _da_step3_col(w: Column, p1: Column) -> Column:
    # the igst pre-step binds first so the among (AND the no-match
    # fallthrough) read its output, never the pre-igst word
    def after_igst(x: Column) -> Column:
        def body(sx: Column, pos: Column) -> Column:
            return (
                F.when(sx == "", x)
                .when(sx == "løst", _drop(x, 1))
                .otherwise(
                    # delete, then repeat consonant_pair on the result
                    _bind1(
                        x.substr(F.lit(1), pos),
                        lambda y: _da_pair_col(y, p1),
                    )
                )
            )

        return _bind_suffix_r1(x, _STEP3_SUFS, p1, body)

    pre = F.when(w.endswith("igst"), _drop(w, 2)).otherwise(w)
    return _bind1(pre, after_igst)


def _da_step4_col(w: Column, p1: Column) -> Column:
    last = F.substring(w, -1, 1)
    return F.when(
        (F.length(w) - 1 >= p1)
        & (F.length(w) >= 2)
        & last.rlike(f"^[^{_V}]$")
        & (F.substring(w, -2, 1) == last),
        _drop(w, 1),
    ).otherwise(w)


def danish_stem(tok: Column) -> Column:
    """Snowball Danish stem of ONE lowercased token, as a single
    Column expression: R1 (hop-3 adjusted) computed once and riding
    along; each step's output binds before the next step reads it."""

    def run(w: Column, p1: Column) -> Column:
        w1 = _da_step1_col(w, p1)
        w2 = _bind1(w1, lambda x: _da_pair_col(x, p1))
        w3 = _bind1(w2, lambda x: _da_step3_col(x, p1))
        return _bind1(w3, lambda x: _da_step4_col(x, p1))

    s = F.struct(tok.alias("w"), _region_len_no(tok).alias("p1"))
    return F.get(
        F.transform(
            F.array(s),
            lambda b: run(b.getField("w"), b.getField("p1")),
        ),
        0,
    )


def danish_stem_tokens(toks: Column) -> Column:
    """Stem EVERY element of a token array through one call_function
    against a once-per-session SQL temp function (ops/sqlfn.py) —
    the same registration machinery as the English/French/German/
    Swedish/Norwegian stemmers; inline transform() fallback when no
    session is active."""
    from route81_spark.ops.sqlfn import tokens_fn

    return tokens_fn("__r81_danishs", danish_stem, toks)
