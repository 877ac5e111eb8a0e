"""Porter2 (Snowball English) stemmer — pure-Column program + Python
spec twin.

MongoDB's default English text analyzer stems query terms and indexed
tokens with the Snowball English ("Porter2") stemmer server-side; the
reference ships $text straight to that server index (route81.go:
181-197). This module implements the published algorithm (the
snowballstem.org English stemmer description) twice, independently:

  * ``porter2_stem`` — one Column expression program over a single
    lowercased token: regexp-derived R1/R2 regions, the suffix steps as
    nested CASE chains with Snowball's longest-match-wins "among"
    semantics (a matched suffix whose condition fails BLOCKS shorter
    suffixes — encoded as nested when()), intermediate words bound
    once per step through 1-element transform() so the expression tree
    grows additively, not multiplicatively. Zero Python per row, no
    shuffle; HOF steps evaluate each sub-expression once per token.
  * ``porter2_py`` — a direct Python transcription of the spec, used
    to stem $text query literals driver-side, to generate oracle
    fixtures, and as the equivalence oracle for the exhaustive
    column-vs-twin sweeps in tests/test_porter.py.

Both sides implement, from the spec: exceptional forms, the 2-letter
pass-through, apostrophe prelude, consonant-y marking, special R1
prefixes (gener/commun/arsen), steps 0-5, and the final Y-unmarking.

Scale shape: stemming is a per-token scalar expression — map-only,
fuses into whatever scan/filter projection applies it; the only cost
is expression evaluation (HOF steps are CodegenFallback, i.e.
interpreted, so ~an order slower than codegen'd string ops per token —
still no shuffle, no Python, no data movement).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_V = "aeiouy"  # after consonant-y marking, 'Y' is NOT in this class
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_END = "cdeghkmnrt"

# full-word exceptional forms (checked on the raw lowercased word)
EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
# invariant after step 1a
EXCEPTION2 = (
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
)

# (suffix, replacement, extra) tables, longest-first (among semantics).
# extra: None | "ogi" (preceded by l) | "li" (valid li-ending)
_STEP2 = [
    ("ational", "ate", None), ("fulness", "ful", None),
    ("iveness", "ive", None), ("ization", "ize", None),
    ("ousness", "ous", None),
    ("biliti", "ble", None), ("lessli", "less", None),
    ("tional", "tion", None),
    ("alism", "al", None), ("aliti", "al", None), ("ation", "ate", None),
    ("entli", "ent", None), ("fulli", "ful", None), ("iviti", "ive", None),
    ("ousli", "ous", None),
    ("abli", "able", None), ("alli", "al", None), ("anci", "ance", None),
    ("ator", "ate", None), ("enci", "ence", None), ("izer", "ize", None),
    ("bli", "ble", None), ("ogi", "og", "ogi"),
    ("li", "", "li"),
]
# (suffix, replacement, needs_r2)
_STEP3 = [
    ("ational", "ate", False), ("tional", "tion", False),
    ("alize", "al", False), ("icate", "ic", False), ("iciti", "ic", False),
    ("ative", "", True),
    ("ical", "ic", False), ("ness", "", False),
    ("ful", "", False),
]
# (suffix, extra) — all delete, all need R2; "ion" needs preceding s/t
_STEP4 = [
    ("ement", None),
    ("ance", None), ("ence", None), ("able", None), ("ible", None),
    ("ment", None),
    ("ant", None), ("ent", None), ("ism", None), ("ate", None),
    ("iti", None), ("ous", None), ("ive", None), ("ize", None),
    ("ion", "st"),
    ("al", None), ("er", None), ("ic", None),
]


# --------------------------------------------------------------------
# Python spec twin
# --------------------------------------------------------------------

def _py_mark_y(w: str) -> str:
    cs = list(w)
    for i, c in enumerate(cs):
        if c == "y" and (i == 0 or cs[i - 1] in _V):
            cs[i] = "Y"
    return "".join(cs)


def _py_r1(w: str) -> int:
    for p in ("gener", "commun", "arsen"):
        if w.startswith(p):
            return len(p)
    return _py_region(w, 0)


def _py_region(w: str, start: int) -> int:
    for i in range(start + 1, len(w)):
        if w[i] not in _V and w[i - 1] in _V:
            return i + 1
    return len(w)


def _py_short_syll_end(w: str) -> bool:
    if len(w) >= 3 and (w[-3] not in _V and w[-2] in _V
                        and w[-1] not in _V and w[-1] not in "wxY"):
        return True
    return len(w) == 2 and w[0] in _V and w[1] not in _V


def porter2_py(word: str) -> str:
    """Spec twin: stem ONE lowercased token."""
    w = word
    if w in EXCEPTION1:
        return EXCEPTION1[w]
    if len(w) <= 2:
        return w
    if w.startswith("'"):
        w = w[1:]
    w = _py_mark_y(w)
    r1 = _py_r1(w)
    r2 = _py_region(w, r1)

    def in_r1(suf: str) -> bool:
        return len(w) - len(suf) >= r1

    def in_r2(suf: str) -> bool:
        return len(w) - len(suf) >= r2

    # step 0
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if any(c in _V for c in w[:-2]):
            w = w[:-1]
    if w in EXCEPTION2:
        return w
    # step 1b
    if w.endswith("eedly"):
        if in_r1("eedly"):
            w = w[:-3]
    elif w.endswith("eed"):
        if in_r1("eed"):
            w = w[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if any(c in _V for c in stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_DOUBLES):
                        w = w[:-1]
                    elif r1 >= len(w) and _py_short_syll_end(w):
                        w += "e"
                break
    # step 1c
    if (len(w) >= 3 and w[-1] in "yY" and w[-2] not in _V):
        w = w[:-1] + "i"
    # step 2
    for suf, repl, extra in _STEP2:
        if w.endswith(suf):
            if in_r1(suf):
                if extra == "ogi" and not w[: -3].endswith("l"):
                    pass
                elif extra == "li" and not (
                    len(w) > 2 and w[-3] in _LI_END
                ):
                    pass
                else:
                    w = w[: -len(suf)] + repl
            break
    # step 3
    for suf, repl, needs_r2 in _STEP3:
        if w.endswith(suf):
            if (in_r2(suf) if needs_r2 else in_r1(suf)):
                w = w[: -len(suf)] + repl
            break
    # step 4
    for suf, extra in _STEP4:
        if w.endswith(suf):
            if in_r2(suf):
                if extra == "st" and not (
                    len(w) > 3 and w[-4] in "st"
                ):
                    pass
                else:
                    w = w[: -len(suf)]
            break
    # step 5
    if w.endswith("e") and (
        len(w) - 1 >= r2
        or (len(w) - 1 >= r1 and not _py_short_syll_end(w[:-1]))
    ):
        w = w[:-1]
    elif w.endswith("l") and len(w) - 1 >= r2 and len(w) >= 2 and w[-2] == "l":
        w = w[:-1]
    return w.replace("Y", "y")


# --------------------------------------------------------------------
# pure-Column program
# --------------------------------------------------------------------

def _bind1(col: Column, fn) -> Column:
    """Evaluate `col` once, reference it many times: 1-element
    transform binding (the web.url_canonicalize anti-re-inline trap —
    Catalyst would otherwise duplicate the whole upstream expression
    into every downstream reference)."""
    return F.get(F.transform(F.array(col), fn), 0)


def _chain(w: Column, r1: Column, r2: Column, fn) -> Column:
    s = F.struct(w.alias("w"), r1.alias("r1"), r2.alias("r2"))
    return F.get(
        F.transform(
            F.array(s),
            lambda b: fn(b.getField("w"), b.getField("r1"), b.getField("r2")),
        ),
        0,
    )


def _drop(w: Column, k: int) -> Column:
    return w.substr(F.lit(1), F.length(w) - F.lit(k))


def _in_r(w: Column, r: Column, suf: str) -> Column:
    return F.length(w) - F.lit(len(suf)) >= r


_SHORT_END = "[^aeiouy][aeiouy][^aeiouywxY]$"
_SHORT_WORD2 = "^[aeiouy][^aeiouy]$"


def _short_syll_end(w: Column) -> Column:
    return w.rlike(_SHORT_END) | w.rlike(_SHORT_WORD2)


def _region_len(s: Column) -> Column:
    """Length of the prefix up to and including the first non-vowel
    that follows a vowel; whole string when there is none."""
    pre = F.regexp_extract(s, r"^(.*?[aeiouy][^aeiouy])", 1)
    return F.when(pre != "", F.length(pre)).otherwise(F.length(s))


def _step1a(w: Column) -> Column:
    return (
        F.when(w.endswith("sses"), _drop(w, 2))
        .when(
            w.endswith("ied") | w.endswith("ies"),
            F.when(F.length(w) > 4, _drop(w, 2)).otherwise(_drop(w, 1)),
        )
        .when(w.endswith("us") | w.endswith("ss"), w)
        .when(
            w.endswith("s") & _drop(w, 2).rlike("[aeiouy]"), _drop(w, 1)
        )
        .otherwise(w)
    )


def _step1b(w: Column, r1: Column) -> Column:
    def fix(k: int) -> Column:
        # post-deletion repair, the dropped stem bound once
        return _bind1(
            _drop(w, k),
            lambda x: F.when(x.rlike("(at|bl|iz)$"), F.concat(x, F.lit("e")))
            .when(x.rlike("(" + "|".join(_DOUBLES) + ")$"), _drop(x, 1))
            .when(
                (r1 >= F.length(x)) & _short_syll_end(x),
                F.concat(x, F.lit("e")),
            )
            .otherwise(x),
        )

    return (
        F.when(
            w.endswith("eedly"),
            F.when(_in_r(w, r1, "eedly"), _drop(w, 3)).otherwise(w),
        )
        .when(
            w.endswith("eed"),
            F.when(_in_r(w, r1, "eed"), _drop(w, 1)).otherwise(w),
        )
        .when(w.endswith("ingly") & _drop(w, 5).rlike("[aeiouy]"), fix(5))
        .when(w.endswith("edly") & _drop(w, 4).rlike("[aeiouy]"), fix(4))
        .when(w.endswith("ing") & _drop(w, 3).rlike("[aeiouy]"), fix(3))
        .when(w.endswith("ed") & _drop(w, 2).rlike("[aeiouy]"), fix(2))
        .otherwise(w)
    )


def _step1c(w: Column) -> Column:
    return F.when(
        w.rlike(".[^aeiouy][yY]$"), F.concat(_drop(w, 1), F.lit("i"))
    ).otherwise(w)


def _longest_suffix(w: Column, sufs: list[str]) -> Column:
    """The longest suffix of `w` among `sufs` ('' when none) via ONE
    anchored regexp_extract. Correct by regex mechanics, not
    alternation order: the scan tries start positions left-to-right
    and every alternative is $-anchored, so whichever alternative
    matches at the EARLIEST position is exactly the longest matching
    suffix (a shorter one cannot match there — it would not reach $).
    All table suffixes are plain letters, so they embed verbatim."""
    return F.regexp_extract(w, "(" + "|".join(sufs) + ")$", 1)


def _suffix_step(
    w: Column,
    table: list[tuple[str, str]],
    extra_ok,
    r_for,
) -> Column:
    """Shared steps-2/3/4 shape: find the longest table suffix (bound
    once), replace via a map-literal lookup when it lies in the
    required region AND its extra condition holds — Snowball among
    semantics (a matched suffix whose condition fails leaves the word
    unchanged, never falls through to a shorter one)."""
    repl_map = F.create_map(
        *[F.lit(x) for suf, repl in table for x in (suf, repl)]
    )
    return _bind1(
        _longest_suffix(w, [s for s, _ in table]),
        lambda sufx: F.when(sufx == "", w).otherwise(
            F.when(
                (F.length(w) - F.length(sufx) >= r_for(sufx)) & extra_ok(sufx),
                F.concat(
                    w.substr(F.lit(1), F.length(w) - F.length(sufx)),
                    F.element_at(repl_map, sufx),
                ),
            ).otherwise(w)
        ),
    )


def _step2(w: Column, r1: Column) -> Column:
    def extra_ok(sufx: Column) -> Column:
        return (
            ((sufx != "ogi") | _drop(w, 3).endswith("l"))
            & ((sufx != "li") | _drop(w, 2).rlike("[" + _LI_END + "]$"))
        )

    return _suffix_step(
        w, [(s, r) for s, r, _x in _STEP2], extra_ok, lambda _s: r1
    )


def _step3(w: Column, r1: Column, r2: Column) -> Column:
    return _suffix_step(
        w,
        [(s, r) for s, r, _n in _STEP3],
        lambda _sufx: F.lit(True),
        # ative is the one R2-gated entry; everything else gates on R1
        lambda sufx: F.when(sufx == "ative", r2).otherwise(r1),
    )


def _step4(w: Column, r2: Column) -> Column:
    def extra_ok(sufx: Column) -> Column:
        return (sufx != "ion") | _drop(w, 3).rlike("[st]$")

    return _suffix_step(
        w, [(s, "") for s, _x in _STEP4], extra_ok, lambda _s: r2
    )


def _step5(w: Column, r1: Column, r2: Column) -> Column:
    e_del = w.endswith("e") & (
        (F.length(w) - 1 >= r2)
        | ((F.length(w) - 1 >= r1) & ~_short_syll_end(_drop(w, 1)))
    )
    l_del = (
        w.endswith("l")
        & (F.length(w) - 1 >= r2)
        & _drop(w, 1).endswith("l")
    )
    return F.when(e_del | l_del, _drop(w, 1)).otherwise(w)


def porter2_stem_tokens(toks: Column) -> Column:
    """Stem EVERY element of a token array — the application path all
    stemming call sites should use. One `call_function` against a
    once-per-session SQL temp function (ops/sqlfn.py — building the
    ~13 KB stemmer tree cost ~1.5 s of driver time per application);
    inline transform() fallback when no session is active."""
    from route81_spark.ops.sqlfn import tokens_fn

    return tokens_fn("__r81_porter2s", porter2_stem, toks)


def porter2_stem(tok: Column) -> Column:
    """Snowball English (Porter2) stem of ONE lowercased token, as a
    single Column expression. Intermediate words are bound once per
    step (1-element transform); R1/R2 are computed once on the marked
    word, as the algorithm specifies, and ride along unchanged."""
    exc1 = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in sorted(EXCEPTION1.items()) for x in kv]
        ),
        tok,
    )

    # prelude: strip one leading apostrophe, mark consonant y. The
    # vowel-then-y regex consumes its vowel, so a freshly-marked Y
    # never re-qualifies as the vowel for the next y — same cursor
    # semantics as Snowball's `repeat goto (v ['y'])`.
    w0 = F.when(tok.startswith("'"), F.substring(tok, 2, 2**30)).otherwise(tok)
    marked = F.regexp_replace(
        F.regexp_replace(w0, "^y", "Y"), "([aeiouy])y", "$1Y"
    )

    def with_regions(m: Column) -> Column:
        sp = F.regexp_extract(m, "^(gener|commun|arsen)", 1)
        r1 = F.when(sp != "", F.length(sp)).otherwise(_region_len(m))
        return _bind1(
            r1,
            lambda r1b: _chain(
                m,
                r1b,
                r1b + _region_len(m.substr(r1b + 1, F.length(m))),
                run_steps,
            ),
        )

    def run_steps(w: Column, r1: Column, r2: Column) -> Column:
        # step 0: longest of 's' / 's / '
        w = (
            F.when(w.endswith("'s'"), _drop(w, 3))
            .when(w.endswith("'s"), _drop(w, 2))
            .when(w.endswith("'"), _drop(w, 1))
            .otherwise(w)
        )
        return _chain(
            _step1a(w), r1, r2,
            lambda w, r1, r2: F.when(w.isin(*EXCEPTION2), w).otherwise(
                _chain(
                    _step1b(w, r1), r1, r2,
                    lambda w, r1, r2: _chain(
                        _step1c(w), r1, r2,
                        lambda w, r1, r2: _chain(
                            _step2(w, r1), r1, r2,
                            lambda w, r1, r2: _chain(
                                _step3(w, r1, r2), r1, r2,
                                lambda w, r1, r2: _chain(
                                    _step4(w, r2), r1, r2, _step5
                                ),
                            ),
                        ),
                    ),
                )
            ),
        )

    stemmed = F.translate(_bind1(marked, with_regions), "Y", "y")
    return (
        F.when(exc1.isNotNull(), exc1)
        .when(F.length(tok) <= 2, tok)
        .otherwise(stemmed)
    )
