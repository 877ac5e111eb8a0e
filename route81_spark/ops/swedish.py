"""Snowball Swedish stemmer — pure-Column program + Python spec twin.

MongoDB's text index runs a per-language Snowball program server-side;
the reference ships $text straight to that index (route81.go:181-197),
so `$language: "swedish"` on a Mongo deployment stems with Snowball
Swedish. This module implements the published algorithm (the
snowballstem.org Swedish stemmer description, CLASSIC revision — i.e.
WITHOUT the 2.x/3.x additions such as -et/-t handling and the revised
s-ending; the same revision-pin policy as ops/french.py and
ops/german.py: Mongo vendors the classic program) twice, independently:

  * ``swedish_stem`` — one Column expression program over a single
    lowercased token. Zero Python per row, no shuffle.
  * ``swedish_py`` — a direct Python transcription of the spec, used
    to stem $text query literals driver-side, to generate oracle
    fixtures (the twin-precomputed CASE lookups the DuckDB oracles
    share as data), and as the equivalence oracle for the
    column-vs-twin sweeps in tests/test_swedish.py.

Algorithm (snowballstem.org swedish.sbl, classic):

  Vowels: a e i o u y ä å ö. No prelude; no R2; no postlude (the
  stemmer keeps ä/å/ö — under the engine's diacritic-INsensitive
  default the $text analyzer folds AFTER stemming, the same chain
  order as French/German).

  R1 = region after the first non-vowel following a vowel (end of
  word if none), then adjusted so at least 3 letters precede it
  (`try ($p1 < x $p1 = x)` after `test (hop 3 setmark x)` — words
  shorter than 3 letters keep their raw R1, exactly ops/german.py's
  hop-3 shape).

  valid s-ending: b c d f g h j k l m n o p r t v y.

  THE structural difference from the German program: every step runs
  under `setlimit tomark p1 for ([substring])` — the candidate suffix
  must lie ENTIRELY within R1 for the among to SEE it at all, so a
  shorter suffix can still match when a longer one straddles the R1
  boundary ('nyheter': 'heter' starts before R1 and is invisible,
  'er' deletes -> 'nyhet'). German instead matches the longest
  suffix anywhere and gates the action on R1 (a straddling match
  BLOCKS shorter ones). Among-commit semantics still apply to the
  candidates the limit admits: when the longest in-R1 candidate is
  's' and the s-ending test fails, no shorter suffix is retried.

  Step 1 (longest in R1 of):
    a arna erna heterna orna ad e ade ande arne are aste en anden
    aren heten ern ar er heter or as arnas ernas ornas es ades andes
    ens arens hetens erns at andet het ast -> delete;
    s -> delete if preceded by a valid s-ending (the s-ending letter
    itself need NOT be in R1).
  Step 2: if the word ends dd gd nn dt gt kt tt with the pair
    entirely in R1, delete the last letter.
  Step 3 (longest in R1 of): lig ig els -> delete;
    löst -> replace with lös; fullt -> replace with full.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from route81_spark.ops.porter import _bind1, _drop, _longest_suffix

_V = "aeiouyäåö"  # Swedish vowels
_S_END = "bcdfghjklmnoprtvy"  # valid s-ending

_STEP1_SUFS = [
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
    "arne", "are", "aste", "en", "anden", "aren", "heten", "ern",
    "ar", "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es",
    "ades", "andes", "ens", "arens", "hetens", "erns", "at", "andet",
    "het", "ast", "s",
]
_STEP2_PAIRS = ["dd", "gd", "nn", "dt", "gt", "kt", "tt"]
_STEP3_SUFS = ["lig", "ig", "els", "löst", "fullt"]


# --------------------------------------------------------------------
# Python spec twin
# --------------------------------------------------------------------

def _sv_region(w: str) -> int:
    """R1 with the hop-3 adjustment: position after the first
    non-vowel following a vowel (end of word if none), lifted to >= 3
    when the word has >= 3 letters."""
    p1 = len(w)
    for i in range(1, len(w)):
        if w[i] not in _V and w[i - 1] in _V:
            p1 = i + 1
            break
    return max(p1, 3) if len(w) >= 3 else p1


def _in_r1(w: str, sx: str, p1: int) -> bool:
    return len(w) - len(sx) >= p1


def _py_longest_in_r1(w: str, sufs: list[str], p1: int) -> str:
    """Longest table suffix lying ENTIRELY in R1 ('' when none) —
    the setlimit-restricted among: straddling suffixes are invisible,
    shorter in-R1 ones still match."""
    best = ""
    for sx in sufs:
        if len(sx) > len(best) and w.endswith(sx) and _in_r1(w, sx, p1):
            best = sx
    return best


def _py_step1(w: str, p1: int) -> str:
    sx = _py_longest_in_r1(w, _STEP1_SUFS, p1)
    if not sx:
        return w
    if sx == "s":
        # among commits: an in-R1 's' whose preceding letter is not a
        # valid s-ending leaves the word unchanged (no shorter retry)
        if len(w) >= 2 and w[-2] in _S_END:
            return w[:-1]
        return w
    return w[: len(w) - len(sx)]


def _py_step2(w: str, p1: int) -> str:
    if w[-2:] in _STEP2_PAIRS and _in_r1(w, w[-2:], p1):
        return w[:-1]
    return w


def _py_step3(w: str, p1: int) -> str:
    sx = _py_longest_in_r1(w, _STEP3_SUFS, p1)
    if sx in ("löst", "fullt"):
        return w[:-1]  # löst -> lös, fullt -> full: drop the final t
    if sx:
        return w[: len(w) - len(sx)]
    return w


def swedish_py(word: str) -> str:
    """Snowball Swedish stem of one lowercased token (spec twin)."""
    p1 = _sv_region(word)
    w = _py_step1(word, p1)
    w = _py_step2(w, p1)
    return _py_step3(w, p1)


# --------------------------------------------------------------------
# pure-Column program
# --------------------------------------------------------------------

def _region_len_sv(s: Column) -> Column:
    """R1 start for Swedish vowels, hop-3 adjusted (the German
    program's shape, with no R2 to thread)."""
    pre = F.regexp_extract(s, f"^(.*?[{_V}][^{_V}])", 1)
    raw = F.when(pre != "", F.length(pre)).otherwise(F.length(s))
    return F.greatest(raw, F.least(F.lit(3), F.length(s)))


def _longest_in_r1(w: Column, sufs: list[str], p1: Column) -> Column:
    """The setlimit among: longest table suffix lying entirely in R1
    ('' when none). Expressed as ONE anchored regexp over the R1
    SUBSTRING — a suffix of the region text IS a suffix of the word
    constrained to lie within R1, which is exactly `setlimit tomark
    p1 for ([substring])`. Measured into place at the 100x sf1 probe
    (500k docs, same session, min of 2): this form 2.47 s vs 3.10 s
    for the alternative 37-branch descending-length endswith-AND-
    containment when-chain (and ~0.85 s vs ~1.10 s at 1x — the
    regexp tree is smaller); it also reuses ops/porter's documented
    longest-suffix mechanics instead of new machinery."""
    return _longest_suffix(w.substr(p1 + 1, F.length(w)), sufs)


def _sv_step1_col(w: Column, p1: Column) -> Column:
    def body(sx: Column, pos: Column) -> Column:
        stem = w.substr(F.lit(1), pos)
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


def _sv_step2_col(w: Column, p1: Column) -> Column:
    pair = F.substring(w, -2, 2)
    return F.when(
        pair.isin(*_STEP2_PAIRS) & (F.length(w) - 2 >= p1), _drop(w, 1)
    ).otherwise(w)


def _sv_step3_col(w: Column, p1: Column) -> Column:
    def body(sx: Column, pos: Column) -> Column:
        return (
            F.when(sx == "", w)
            .when(sx.isin("löst", "fullt"), _drop(w, 1))
            .otherwise(w.substr(F.lit(1), pos))
        )

    return _bind_suffix_r1(w, _STEP3_SUFS, p1, body)


def _bind_suffix_r1(w: Column, sufs: list[str], p1: Column, body) -> Column:
    """Longest in-R1 suffix + its stem position, bound once."""
    sx0 = _longest_in_r1(w, sufs, p1)
    pre = F.struct(
        sx0.alias("s"), (F.length(w) - F.length(sx0)).alias("p")
    )
    return F.get(
        F.transform(
            F.array(pre),
            lambda b: body(b.getField("s"), b.getField("p")),
        ),
        0,
    )


def swedish_stem(tok: Column) -> Column:
    """Snowball Swedish stem of ONE lowercased token, as a single
    Column expression: R1 (hop-3 adjusted) computed once and riding
    along; each step's output binds before the next step reads it."""

    def run(w: Column, p1: Column) -> Column:
        w1 = _sv_step1_col(w, p1)
        w2 = _bind1(w1, lambda x: _sv_step2_col(x, p1))
        return _bind1(w2, lambda x: _sv_step3_col(x, p1))

    s = F.struct(tok.alias("w"), _region_len_sv(tok).alias("p1"))
    return F.get(
        F.transform(
            F.array(s),
            lambda b: run(b.getField("w"), b.getField("p1")),
        ),
        0,
    )


def swedish_stem_tokens(toks: Column) -> Column:
    """Stem EVERY element of a token array through one call_function
    against a once-per-session SQL temp function (ops/sqlfn.py) —
    the same registration machinery as the English/French/German
    stemmers; inline transform() fallback when no session is
    active."""
    from route81_spark.ops.sqlfn import tokens_fn

    return tokens_fn("__r81_swedishs", swedish_stem, toks)
