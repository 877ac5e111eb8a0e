"""Snowball German stemmer — pure-Column program + Python spec twin.

MongoDB's text index runs a per-language Snowball program server-side;
the reference ships $text straight to that index (route81.go:181-197),
so `$language: "german"` on a Mongo deployment stems with Snowball
German. This module implements the published algorithm (the
snowballstem.org German stemmer description, CLASSIC revision — i.e.
WITHOUT the german2 variant's ae/oe/ue folding and WITHOUT the 3.x
additions such as -erin/-erinnen handling; documented divergence from
the very latest Snowball release, same algorithm otherwise — the same
revision-pin policy as ops/french.py) twice, independently:

  * ``german_stem`` — one Column expression program over a single
    lowercased token: prelude (ß -> ss, then u/y between vowels
    marked U/Y via ONE consuming regexp scan — marker-insertion
    template + literal replaces, the ops/french.py trick), R1/R2 with
    the spec's "at least 3 letters before R1" adjustment (R2 keeps
    scanning from the UNADJUSTED R1 cursor, as the Snowball source
    does), the three suffix sub-steps as longest-match when-chains
    with Snowball among semantics (a matched suffix whose condition
    fails BLOCKS shorter suffixes), and the postlude (unmark U/Y,
    remove umlauts). Zero Python per row, no shuffle.
  * ``german_py`` — a direct Python transcription of the spec, used
    to stem $text query literals driver-side, to generate oracle
    fixtures (the twin-precomputed CASE lookups the DuckDB oracles
    share as data), and as the equivalence oracle for the
    column-vs-twin sweeps in tests/test_german.py.

Algorithm (snowballstem.org german.sbl, classic):

  prelude: replace ß by ss; put u and y BETWEEN vowels into upper
  case (U/Y — consonants from then on). Vowels: a e i o u y ä ö ü.

  R1 = region after the first non-vowel following a vowel (end if
  none); R2 = the same, computed onward from R1's UNADJUSTED start;
  then R1's start is adjusted to position >= 3 (hop-3 rule).

  valid s-ending:  b d f g h k l m n r t
  valid st-ending: the same letters minus r

  Step 1 (longest of): em ern er -> delete if in R1;
    e en es -> delete if in R1, then a final s preceded by 'nis'
    also deletes (nisse -> nis); s -> delete if in R1 and preceded
    by a valid s-ending (the s-ending letter need not be in R1).
  Step 2 (longest of): en er est -> delete if in R1; st -> delete
    if in R1, preceded by a valid st-ending itself preceded by at
    least 3 letters.
  Step 3 (longest of, all gated on R2): end ung -> delete, then a
    remaining ig (not preceded by e, in R2) also deletes; ig ik
    isch -> delete if not preceded by e; lich heit -> delete, then
    a remaining er/en in R1 also deletes; keit -> delete, then a
    remaining lich/ig in R2 also deletes.

  postlude: unmark U/Y; ä -> a, ö -> o, ü -> u.

Application path: ``german_stem_tokens`` registers the program once
per session as a SQL temp function (ops/sqlfn.py) — same machinery as
the English and French stemmers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from route81_spark.ops.porter import _bind1, _chain, _drop, _longest_suffix

_V = "aeiouyäöü"  # German vowels; U/Y marks are NOT vowels
_S_END = "bdfghklmnrt"   # valid s-ending
_ST_END = "bdfghklmnt"   # valid st-ending (s-ending minus r)

_STEP1_SUFS = ["ern", "em", "er", "en", "es", "e", "s"]
_STEP2_SUFS = ["est", "en", "er", "st"]
_STEP3_SUFS = ["isch", "lich", "heit", "keit", "end", "ung", "ig", "ik"]


# --------------------------------------------------------------------
# Python spec twin
# --------------------------------------------------------------------

def _de_mark(w: str) -> str:
    """Prelude: ß -> ss, then one left-to-right scan (Snowball
    `repeat goto`) marking u/y between vowels. The trailing context
    vowel is a LOOKAHEAD, not consumed (r13 ADVICE fix): Snowball's
    goto leaves the cursor after the replaced u/y, so that vowel can
    lead the NEXT mark — 'auaua' -> 'aUaUa' (real word 'donauauen'),
    while an already-marked U/Y is a consonant and never hosts or
    contexts a second mark ('bauuer' -> 'baUuer' is unchanged: the
    second u's left context is the marked U). Same cursor semantics
    as the Column program's lookahead regexp pass."""
    w = w.replace("ß", "ss")
    out: list[str] = []
    i, n = 0, len(w)
    while i < n:
        c = w[i]
        if (
            c in _V and i + 2 < n
            and w[i + 1] in "uy" and w[i + 2] in _V
        ):
            out += [c, w[i + 1].upper()]
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _de_region(w: str, start: int) -> int:
    """Position after the first non-vowel following a vowel, scanning
    from `start`; end of word if none."""
    for i in range(start + 1, len(w)):
        if w[i] not in _V and w[i - 1] in _V:
            return i + 1
    return len(w)


def _de_regions(w: str) -> tuple[int, int]:
    """(p1 adjusted, p2). The hop-3 rule lifts p1 to >= 3 when the
    word has >= 3 letters; p2's scan continues from the UNADJUSTED p1
    cursor (german.sbl marks p2 before the try($p1 < x) adjustment
    moves anything)."""
    p1_raw = _de_region(w, 0)
    p2 = _de_region(w, p1_raw)
    p1 = max(p1_raw, 3) if len(w) >= 3 else p1_raw
    return p1, p2


def _py_step1(w: str, p1: int) -> str:
    for sx in _STEP1_SUFS:
        if not w.endswith(sx):
            continue
        pos = len(w) - len(sx)
        if pos < p1:
            return w  # among committed; the R1 test gates all branches
        if sx in ("em", "ern", "er"):
            return w[:pos]
        if sx in ("e", "en", "es"):
            w = w[:pos]
            if w.endswith("niss"):
                w = w[:-1]
            return w
        # 's': the preceding letter need not be in R1
        if pos >= 1 and w[pos - 1] in _S_END:
            return w[:pos]
        return w
    return w


def _py_step2(w: str, p1: int) -> str:
    for sx in _STEP2_SUFS:
        if not w.endswith(sx):
            continue
        pos = len(w) - len(sx)
        if pos < p1:
            return w
        if sx == "st":
            # st-ending, itself preceded by at least 3 letters (hop 3)
            if pos >= 1 and w[pos - 1] in _ST_END and pos - 1 >= 3:
                return w[:pos]
            return w
        return w[:pos]
    return w


def _py_step3(w: str, p1: int, p2: int) -> str:
    for sx in _STEP3_SUFS:
        if not w.endswith(sx):
            continue
        pos = len(w) - len(sx)
        if pos < p2:
            return w
        if sx in ("end", "ung"):
            w = w[:pos]
            if (
                w.endswith("ig") and not w.endswith("eig")
                and len(w) - 2 >= p2
            ):
                w = w[:-2]
            return w
        if sx in ("ig", "ik", "isch"):
            if not (pos >= 1 and w[pos - 1] == "e"):
                return w[:pos]
            return w
        if sx in ("lich", "heit"):
            w = w[:pos]
            for t in ("er", "en"):
                if w.endswith(t):
                    if len(w) - 2 >= p1:
                        w = w[:-2]
                    break
            return w
        # keit
        w = w[:pos]
        for t in ("lich", "ig"):
            if w.endswith(t):
                if len(w) - len(t) >= p2:
                    w = w[: -len(t)]
                break
        return w
    return w


_POSTLUDE = str.maketrans("UYäöü", "uyaou")


def german_py(word: str) -> str:
    """Snowball German stem of one lowercased token (spec twin)."""
    w = _de_mark(word)
    p1, p2 = _de_regions(w)
    w = _py_step1(w, p1)
    w = _py_step2(w, p1)
    w = _py_step3(w, p1, p2)
    return w.translate(_POSTLUDE)


# --------------------------------------------------------------------
# pure-Column program
# --------------------------------------------------------------------

# u/y between vowels, ONE scan: the marker \x01 is inserted before
# the letter (the replacement template cannot change case), then two
# literal replaces turn marker+letter into the mark. The trailing
# context vowel is a non-consuming LOOKAHEAD (r13 ADVICE fix): Java's
# scan continues after the matched (vowel, u/y) pair, so the context
# vowel can lead the next match — exactly Snowball's `repeat goto`
# cursor, which resets to just after the replaced letter ('auaua' ->
# 'aUaUa'). A marked U/Y is not in the vowel class, so overlapping
# u/y runs never double-mark ('bauuer' -> 'baUuer').
# \x01 cannot occur in a token (tokenizers emit letter/number runs).
_MARK_PAT = f"([{_V}])([uy])(?=[{_V}])"


def _mark(tok: Column) -> Column:
    w = F.replace(tok, F.lit("ß"), F.lit("ss"))
    m = F.regexp_replace(w, _MARK_PAT, "$1\x01$2")
    for lo, up in (("u", "U"), ("y", "Y")):
        m = F.replace(m, F.lit("\x01" + lo), F.lit(up))
    return m


def _region_len(s: Column) -> Column:
    """Length of the prefix up to and including the first non-vowel
    that follows a vowel; whole string when there is none."""
    pre = F.regexp_extract(s, f"^(.*?[{_V}][^{_V}])", 1)
    return F.when(pre != "", F.length(pre)).otherwise(F.length(s))


def _prev_is(w: Column, pos: Column, chars: str) -> Column:
    """True when the char just before 0-based suffix start `pos` is
    one of `chars`; False when there is none (substr is 1-based, so
    w.substr(pos, 1) IS that char)."""
    return (pos >= 1) & w.substr(pos, F.lit(1)).rlike(f"^[{chars}]$")


def _de_step1_col(w: Column, p1: Column) -> Column:
    def body(sx: Column, pos: Column) -> Column:
        stem = w.substr(F.lit(1), pos)
        g_ab = F.when(
            sx.isin("e", "en", "es"),
            _bind1(
                stem,
                lambda s: F.when(
                    s.endswith("niss"), _drop(s, 1)
                ).otherwise(s),
            ),
        ).otherwise(stem)
        return (
            F.when(sx == "", w)
            .when(pos < p1, w)  # R1 gates every branch; among commits
            .when(
                sx == "s",
                F.when(_prev_is(w, pos, _S_END), stem).otherwise(w),
            )
            .otherwise(g_ab)
        )

    return _bind_suffix(w, _STEP1_SUFS, body)


def _de_step2_col(w: Column, p1: Column) -> Column:
    def body(sx: Column, pos: Column) -> Column:
        stem = w.substr(F.lit(1), pos)
        return (
            F.when(sx == "", w)
            .when(pos < p1, w)
            .when(
                sx == "st",
                F.when(
                    _prev_is(w, pos, _ST_END) & (pos - 1 >= 3), stem
                ).otherwise(w),
            )
            .otherwise(stem)
        )

    return _bind_suffix(w, _STEP2_SUFS, body)


def _de_step3_col(w: Column, p1: Column, p2: Column) -> Column:
    def body(sx: Column, pos: Column) -> Column:
        stem = w.substr(F.lit(1), pos)
        end_ung = _bind1(
            stem,
            lambda s: F.when(
                s.endswith("ig") & ~s.endswith("eig")
                & (F.length(s) - 2 >= p2),
                _drop(s, 2),
            ).otherwise(s),
        )
        lich_heit = _bind1(
            stem,
            lambda s: F.when(
                (s.endswith("er") | s.endswith("en"))
                & (F.length(s) - 2 >= p1),
                _drop(s, 2),
            ).otherwise(s),
        )
        keit = _bind1(
            stem,
            lambda s: F.when(
                s.endswith("lich"),
                F.when(F.length(s) - 4 >= p2, _drop(s, 4)).otherwise(s),
            )
            .when(
                s.endswith("ig"),
                F.when(F.length(s) - 2 >= p2, _drop(s, 2)).otherwise(s),
            )
            .otherwise(s),
        )
        return (
            F.when(sx == "", w)
            .when(pos < p2, w)  # hoisted R2 gates every branch
            .when(sx.isin("end", "ung"), end_ung)
            .when(
                sx.isin("ig", "ik", "isch"),
                F.when(~_prev_is(w, pos, "e"), stem).otherwise(w),
            )
            .when(sx.isin("lich", "heit"), lich_heit)
            .otherwise(keit)
        )

    return _bind_suffix(w, _STEP3_SUFS, body)


def _bind_suffix(w: Column, sufs: list[str], body) -> Column:
    """Longest table suffix + its stem position, bound once."""
    sx0 = _longest_suffix(w, sufs)
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


def german_stem(tok: Column) -> Column:
    """Snowball German stem of ONE lowercased token, as a single
    Column expression. The marked word binds once; R1 (hop-3
    adjusted) and R2 (scanned from the UNADJUSTED R1 cursor) are
    computed once and ride along unchanged; each step's output binds
    before the next step reads it."""

    def run_steps(m: Column, p1: Column, p2: Column) -> Column:
        w1 = _de_step1_col(m, p1)
        w2 = _bind1(w1, lambda x: _de_step2_col(x, p1))
        w3 = _bind1(w2, lambda x: _de_step3_col(x, p1, p2))
        return F.translate(w3, "UYäöü", "uyaou")

    def with_regions(m: Column) -> Column:
        return _bind1(
            _region_len(m),
            lambda p1r: _chain(
                m,
                F.greatest(p1r, F.least(F.lit(3), F.length(m))),
                p1r + _region_len(m.substr(p1r + 1, F.length(m))),
                run_steps,
            ),
        )

    return _bind1(_mark(tok), with_regions)


def german_stem_tokens(toks: Column) -> Column:
    """Stem EVERY element of a token array through one call_function
    against a once-per-session SQL temp function (ops/sqlfn.py) —
    the same registration machinery as the English and French
    stemmers; inline transform() fallback when no session is
    active."""
    from route81_spark.ops.sqlfn import tokens_fn

    return tokens_fn("__r81_germans", german_stem, toks)
