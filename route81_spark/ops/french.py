"""Snowball French stemmer — pure-Column program + Python spec twin.

MongoDB's text index runs a per-language Snowball program server-side;
the reference ships $text straight to that index (route81.go:181-197),
so `$language: "french"` on a Mongo deployment stems with Snowball
French. This module implements the published algorithm (the
snowballstem.org French stemmer description, classic revision — i.e.
WITHOUT the 2019+ `ë`->He / `ï`->Hi preludes; documented divergence
from the very latest Snowball release, same algorithm otherwise)
twice, independently:

  * ``french_stem`` — one Column expression program over a single
    lowercased token: the prelude's left-to-right scan as ONE
    regexp_replace (five alternatives sharing a marker-insertion
    template; trailing context vowels are lookaheads — the Snowball
    cursor resumes after the mark) + three literal replaces,
    regexp-derived RV/R1/R2,
    the suffix steps as longest-match when-chains with Snowball's
    among semantics (a matched suffix whose condition fails BLOCKS
    shorter suffixes; the RV `setlimit` of steps 2a/2b/4 participates
    in MATCHING, so an out-of-region longer suffix falls through to a
    shorter in-region one), intermediate words bound once per step.
    Zero Python per row, no shuffle.
  * ``french_py`` — a direct Python transcription of the spec, used
    to stem $text query literals driver-side, to generate oracle
    fixtures, and as the equivalence oracle for the column-vs-twin
    sweeps in tests/test_french.py.

Control flow (french.sbl `stem`): step 1 (standard_suffix) OR step 2a
(i_verb_suffix) OR step 2b (verb_suffix); if one succeeded, try the
final Y->i / ç->c repair (step 3); if all failed, the residual step 4.
The `amment/emment/ment/ments` entries of step 1 mutate the word and
then FAIL on purpose (Snowball `fail`), which is how "do step 2a if
one of these endings was found" is encoded. un_double (step 5) and
un_accent (step 6) always run; the postlude lowercases the U/I/Y
marks.

Application path: ``french_stem_tokens`` registers the program once
per session as a SQL temp function (ops/sqlfn.py) — same machinery as
the English stemmer.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from route81_spark.ops.porter import _bind1, _drop, _longest_suffix

_V = "aeiouyâàëéêèïîôûù"  # French vowels; U/I/Y marks are NOT vowels

# ---- step 1 (standard_suffix) tables ---------------------------------
_S1_R2_DEL = (  # delete if in R2
    "ance", "iqUe", "isme", "able", "iste", "eux",
    "ances", "iqUes", "ismes", "ables", "istes",
)
_S1_ATION = ("atrice", "ateur", "ation", "atrices", "ateurs", "ations")
_S1_LOGIE = ("logie", "logies")
_S1_USION = ("usion", "ution", "usions", "utions")
_S1_ENCE = ("ence", "ences")
_S1_EMENT = ("ement", "ements")
_S1_ITE = ("ité", "ités")
_S1_IF = ("if", "ive", "ifs", "ives")
_S1_EUSE = ("euse", "euses")
_S1_ISSEMENT = ("issement", "issements")
_S1_MENT = ("ment", "ments")
_STEP1_SUFS = sorted(
    [*_S1_R2_DEL, *_S1_ATION, *_S1_LOGIE, *_S1_USION, *_S1_ENCE,
     *_S1_EMENT, *_S1_ITE, *_S1_IF, "eaux", "aux", *_S1_EUSE,
     *_S1_ISSEMENT, "amment", "emment", *_S1_MENT],
    key=len, reverse=True,
)

# ---- step 2a (i_verb_suffix) — all delete if preceded by a non-vowel,
# everything (suffix + the non-vowel) inside RV
_STEP2A_SUFS = sorted(
    ["îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai",
     "iraIent", "irais", "irait", "iras", "irent", "irez", "iriez",
     "irions", "irons", "iront", "is", "issaIent", "issais", "issait",
     "issant", "issante", "issantes", "issants", "isse", "issent",
     "isses", "issez", "issiez", "issions", "issons", "it"],
    key=len, reverse=True,
)

# ---- step 2b (verb_suffix) — inside RV
_S2B_IONS = ("ions",)  # delete if in R2
_S2B_E = (  # delete
    "é", "ée", "ées", "és", "èrent", "er", "era", "erai", "eraIent",
    "erais", "erait", "eras", "erez", "eriez", "erions", "erons",
    "eront", "ez", "iez",
)
_S2B_A = (  # delete; then delete a preceding e (in RV) too
    "âmes", "ât", "âtes", "a", "ai", "aIent", "ais", "ait", "ant",
    "ante", "antes", "ants", "as", "asse", "assent", "asses",
    "assiez", "assions",
)
_STEP2B_SUFS = sorted(
    [*_S2B_IONS, *_S2B_E, *_S2B_A], key=len, reverse=True
)

# ---- step 4 (residual_suffix) — inside RV (except the s-removal)
_S4_IER = ("ière", "Ière", "ier", "Ier")
_STEP4_SUFS = sorted(
    [*_S4_IER, "ion", "e", "ë"], key=len, reverse=True
)
_KEEP_S_AFTER = "aiouès"  # final s kept when preceded by one of these


# --------------------------------------------------------------------
# Python spec twin
# --------------------------------------------------------------------

def _fr_mark(w: str) -> str:
    """Prelude: one left-to-right scan (Snowball `repeat goto`): at a
    vowel, mark a following u/i (when vowel-flanked) or y; else mark
    y before a vowel; else mark u after q. The trailing context vowel
    is a LOOKAHEAD, not consumed (r14 fix — the same divergence class
    the r13 ADVICE found in the German prelude): Snowball's `<- S`
    leaves the cursor just after the substituted mark, so the context
    vowel is re-scanned and can host or lead the NEXT mark
    ('énîetfyéy': the y marked before é does not consume the é, which
    then marks the final y -> '..fYéY', so un_accent sees a non-vowel
    and fires; verified against the compiled Snowball authority in
    tests/test_snowball_authority.py). A marked U/I/Y is a consonant
    and never hosts or contexts a second mark."""
    out: list[str] = []
    i, n = 0, len(w)
    while i < n:
        c = w[i]
        if c in _V and i + 1 < n:
            d = w[i + 1]
            if d == "u" and i + 2 < n and w[i + 2] in _V:
                out += [c, "U"]
                i += 2
                continue
            if d == "i" and i + 2 < n and w[i + 2] in _V:
                out += [c, "I"]
                i += 2
                continue
            if d == "y":
                out += [c, "Y"]
                i += 2
                continue
        if c == "y" and i + 1 < n and w[i + 1] in _V:
            out.append("Y")
            i += 1
            continue
        if c == "q" and i + 1 < n and w[i + 1] == "u":
            out += ["q", "U"]
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _fr_rv(w: str) -> int:
    """RV start: after the 3rd letter when the word starts with two
    vowels; after 'par'/'col'/'tap'; else after the first vowel not at
    the beginning; else the end."""
    if len(w) >= 3 and w[0] in _V and w[1] in _V:
        return 3
    if w[:3] in ("par", "col", "tap"):
        return 3
    for i in range(1, len(w)):
        if w[i] in _V:
            return i + 1
    return len(w)


def _fr_region(w: str, start: int) -> int:
    for i in range(start + 1, len(w)):
        if w[i] not in _V and w[i - 1] in _V:
            return i + 1
    return len(w)


def _py_step1(w: str, rv: int, r1: int, r2: int) -> tuple[str, bool]:
    """standard_suffix: (new word, success). The amment/emment/ment(s)
    entries may mutate and still report failure (Snowball `fail`)."""
    sx = next((s for s in _STEP1_SUFS if w.endswith(s)), None)
    if sx is None:
        return w, False
    pos = len(w) - len(sx)
    stem = w[:pos]
    if sx in _S1_R2_DEL:
        return (stem, True) if pos >= r2 else (w, False)
    if sx in _S1_ATION:
        if pos < r2:
            return w, False
        if stem.endswith("ic"):
            if len(stem) - 2 >= r2:
                return stem[:-2], True
            return stem[:-2] + "iqU", True
        return stem, True
    if sx in _S1_LOGIE:
        return (stem + "log", True) if pos >= r2 else (w, False)
    if sx in _S1_USION:
        return (stem + "u", True) if pos >= r2 else (w, False)
    if sx in _S1_ENCE:
        return (stem + "ent", True) if pos >= r2 else (w, False)
    if sx in _S1_EMENT:
        if pos < rv:
            return w, False
        s = stem
        if s.endswith("iv") and len(s) - 2 >= r2:
            s = s[:-2]
            if s.endswith("at") and len(s) - 2 >= r2:
                s = s[:-2]
        elif s.endswith("eus"):
            if len(s) - 3 >= r2:
                s = s[:-3]
            elif len(s) - 3 >= r1:
                s = s[:-3] + "eux"
        elif (s.endswith("abl") or s.endswith("iqU")) and len(s) - 3 >= r2:
            s = s[:-3]
        elif (s.endswith("ièr") or s.endswith("Ièr")) and len(s) - 3 >= rv:
            s = s[:-3] + "i"
        return s, True
    if sx in _S1_ITE:
        if pos < r2:
            return w, False
        s = stem
        if s.endswith("abil"):
            s = s[:-4] if len(s) - 4 >= r2 else s[:-4] + "abl"
        elif s.endswith("ic"):
            s = s[:-2] if len(s) - 2 >= r2 else s[:-2] + "iqU"
        elif s.endswith("iv") and len(s) - 2 >= r2:
            s = s[:-2]
        return s, True
    if sx in _S1_IF:
        if pos < r2:
            return w, False
        s = stem
        if s.endswith("at") and len(s) - 2 >= r2:
            s = s[:-2]
            if s.endswith("ic"):
                s = s[:-2] if len(s) - 2 >= r2 else s[:-2] + "iqU"
        return s, True
    if sx == "eaux":
        return stem + "eau", True
    if sx == "aux":
        return (stem + "al", True) if pos >= r1 else (w, False)
    if sx in _S1_EUSE:
        if pos >= r2:
            return stem, True
        if pos >= r1:
            return stem + "eux", True
        return w, False
    if sx in _S1_ISSEMENT:
        if pos >= r1 and pos >= 1 and w[pos - 1] not in _V:
            return stem, True
        return w, False
    if sx == "amment":
        return (stem + "ant" if pos >= rv else w), False
    if sx == "emment":
        return (stem + "ent" if pos >= rv else w), False
    # ment / ments: delete when preceded by a vowel that is itself in
    # RV — and FAIL either way (step 2a runs on the result)
    if pos >= 1 and w[pos - 1] in _V and pos - 1 >= rv:
        return stem, False
    return w, False


def _py_step2a(w: str, rv: int) -> tuple[str, bool]:
    """i_verb_suffix, inside RV: the limit participates in MATCHING
    (an out-of-region longer suffix falls through to a shorter one);
    delete when preceded by a non-vowel that is itself in RV."""
    for s in _STEP2A_SUFS:
        if w.endswith(s) and len(w) - len(s) >= rv:
            pos = len(w) - len(s)
            if pos >= 1 and pos - 1 >= rv and w[pos - 1] not in _V:
                return w[:pos], True
            return w, False
    return w, False


def _py_step2b(w: str, rv: int, r2: int) -> tuple[str, bool]:
    for s in _STEP2B_SUFS:
        if w.endswith(s) and len(w) - len(s) >= rv:
            pos = len(w) - len(s)
            if s in _S2B_IONS:
                return (w[:pos], True) if pos >= r2 else (w, False)
            if s in _S2B_E:
                return w[:pos], True
            w2 = w[:pos]
            if w2.endswith("e") and len(w2) - 1 >= rv:
                w2 = w2[:-1]
            return w2, True
    return w, False


def _py_residual(w: str, rv: int, r2: int) -> str:
    if w.endswith("s") and len(w) >= 2 and w[-2] not in _KEEP_S_AFTER:
        w = w[:-1]
    for s in _STEP4_SUFS:
        if w.endswith(s) and len(w) - len(s) >= rv:
            pos = len(w) - len(s)
            if s == "ion":
                if pos >= r2 and pos >= 1 and pos - 1 >= rv \
                        and w[pos - 1] in "st":
                    return w[:pos]
                return w
            if s in _S4_IER:
                return w[:pos] + "i"
            if s == "e":
                return w[:pos]
            # ë: delete when preceded by gu inside RV
            if w[:pos].endswith("gu") and pos - 2 >= rv:
                return w[:pos]
            return w
    return w


_UN_ACCENT_RE = re.compile(f"[éè]([^{_V}]+)$")


def french_py(word: str) -> str:
    """Spec twin: stem ONE lowercased token."""
    w = _fr_mark(word)
    rv = _fr_rv(w)
    r1 = _fr_region(w, 0)
    r2 = _fr_region(w, r1)

    w, ok = _py_step1(w, rv, r1, r2)
    if not ok:
        w, ok = _py_step2a(w, rv)
        if not ok:
            w, ok = _py_step2b(w, rv, r2)
    if ok:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        w = _py_residual(w, rv, r2)
    # step 5: un_double
    if w.endswith(("enn", "onn", "ett", "ell", "eill")):
        w = w[:-1]
    # step 6: un_accent
    m = _UN_ACCENT_RE.search(w)
    if m:
        w = w[:m.start()] + "e" + m.group(1)
    return w.translate(str.maketrans("UIY", "uiy"))


# --------------------------------------------------------------------
# pure-Column program
# --------------------------------------------------------------------

# the prelude as ONE regex: Java's scan is exactly Snowball's
# `repeat goto` (at each position try alternatives in order, advance
# on failure, continue after a match). The trailing context vowels
# are non-consuming LOOKAHEADS (r14 fix — the German r13 ADVICE
# cursor semantics applied here too): Snowball's `<- S` leaves the
# cursor just after the substituted mark, so a mark's context vowel
# is re-scanned and can host or lead the next mark; an
# already-marked U/I/Y (preceded by \x01 during the pass) is a
# consonant and never double-marks. A marker \x01 is inserted before
# the letter to mark (the replacement template cannot change case),
# then three literal replaces turn marker+letter into the mark.
# \x01 cannot occur in a token (tokenizers emit letter/number runs).
_MARK_PAT = (
    f"([{_V}])(u)(?=[{_V}])"
    f"|([{_V}])(i)(?=[{_V}])"
    f"|([{_V}])(y)"
    f"|(y)(?=[{_V}])"
    f"|(q)(u)"
)
_MARK_REPL = "$1$3$5$8\x01$2$4$6$7$9"


def _mark(tok: Column) -> Column:
    m = F.regexp_replace(tok, _MARK_PAT, _MARK_REPL)
    for lo, up in (("u", "U"), ("i", "I"), ("y", "Y")):
        m = F.replace(m, F.lit("\x01" + lo), F.lit(up))
    return m


def _region_len(s: Column) -> Column:
    pre = F.regexp_extract(s, f"^(.*?[{_V}][^{_V}])", 1)
    return F.when(pre != "", F.length(pre)).otherwise(F.length(s))


def _rv_len(m: Column) -> Column:
    pre = F.regexp_extract(m, f"^(.[^{_V}]*[{_V}])", 1)
    return (
        F.when(m.rlike(f"^[{_V}][{_V}]."), F.lit(3))
        .when(m.rlike("^(par|col|tap)"), F.lit(3))
        .when(pre != "", F.length(pre))
        .otherwise(F.length(m))
    )


def _chain4(w: Column, rv: Column, r1: Column, r2: Column, fn) -> Column:
    s = F.struct(
        w.alias("w"), rv.alias("rv"), r1.alias("r1"), r2.alias("r2")
    )
    return F.get(
        F.transform(
            F.array(s),
            lambda b: fn(b.getField("w"), b.getField("rv"),
                         b.getField("r1"), b.getField("r2")),
        ),
        0,
    )


def _bind_res(res: Column, fn) -> Column:
    """Bind a struct<w,ok> step result once."""
    return F.get(
        F.transform(
            F.array(res), lambda b: fn(b.getField("w"), b.getField("ok"))
        ),
        0,
    )


def _res(w: Column, ok) -> Column:
    okc = ok if isinstance(ok, Column) else F.lit(ok)
    return F.struct(w.alias("w"), okc.alias("ok"))


def _prev_is(w: Column, pos: Column, chars: str) -> Column:
    """True when the char just before position `pos` (1-based suffix
    start) is one of `chars`; False when there is none."""
    return (pos >= 1) & w.substr(pos, F.lit(1)).rlike(f"^[{chars}]$")


def _step1(w: Column, rv: Column, r1: Column, r2: Column) -> Column:
    sx0 = _longest_suffix(w, _STEP1_SUFS)
    pre = F.struct(
        sx0.alias("s"), (F.length(w) - F.length(sx0)).alias("p")
    )
    return F.get(
        F.transform(
            F.array(pre),
            lambda b: _step1_body(w, rv, r1, r2,
                                  b.getField("s"), b.getField("p")),
        ),
        0,
    )


def _step1_body(w, rv, r1, r2, sx, pos):
    stem = w.substr(F.lit(1), pos)
    fail = _res(w, False)

    def gate(region, out):  # suffix-in-region else among-committed fail
        return F.when(pos >= region, _res(out, True)).otherwise(fail)

    def ic_fix(s: Column) -> Column:  # shared ation/ité 'ic' repair
        return (
            F.when(s.endswith("ic") & (F.length(s) - 2 >= r2), _drop(s, 2))
            .when(s.endswith("ic"), F.concat(_drop(s, 2), F.lit("iqU")))
            .otherwise(s)
        )

    ement_fix = _bind1(
        stem,
        lambda s: F.when(
            s.endswith("iv") & (F.length(s) - 2 >= r2),
            _bind1(
                _drop(s, 2),
                lambda s2: F.when(
                    s2.endswith("at") & (F.length(s2) - 2 >= r2),
                    _drop(s2, 2),
                ).otherwise(s2),
            ),
        )
        .when(s.endswith("eus") & (F.length(s) - 3 >= r2), _drop(s, 3))
        .when(
            s.endswith("eus") & (F.length(s) - 3 >= r1),
            F.concat(_drop(s, 3), F.lit("eux")),
        )
        .when(
            (s.endswith("abl") | s.endswith("iqU"))
            & (F.length(s) - 3 >= r2),
            _drop(s, 3),
        )
        .when(
            (s.endswith("ièr") | s.endswith("Ièr"))
            & (F.length(s) - 3 >= rv),
            F.concat(_drop(s, 3), F.lit("i")),
        )
        .otherwise(s),
    )
    ite_fix = _bind1(
        stem,
        lambda s: F.when(
            s.endswith("abil") & (F.length(s) - 4 >= r2), _drop(s, 4)
        )
        .when(s.endswith("abil"), F.concat(_drop(s, 4), F.lit("abl")))
        .when(s.endswith("ic") & (F.length(s) - 2 >= r2), _drop(s, 2))
        .when(s.endswith("ic"), F.concat(_drop(s, 2), F.lit("iqU")))
        .when(s.endswith("iv") & (F.length(s) - 2 >= r2), _drop(s, 2))
        .otherwise(s),
    )
    if_fix = _bind1(
        stem,
        lambda s: F.when(
            s.endswith("at") & (F.length(s) - 2 >= r2),
            _bind1(_drop(s, 2), ic_fix),
        ).otherwise(s),
    )
    ment_del = (
        _prev_is(w, pos, _V) & (pos - 1 >= rv)
    )
    return (
        F.when(sx == "", fail)
        .when(sx.isin(*_S1_R2_DEL), gate(r2, stem))
        .when(sx.isin(*_S1_ATION), gate(r2, _bind1(stem, ic_fix)))
        .when(sx.isin(*_S1_LOGIE), gate(r2, F.concat(stem, F.lit("log"))))
        .when(sx.isin(*_S1_USION), gate(r2, F.concat(stem, F.lit("u"))))
        .when(sx.isin(*_S1_ENCE), gate(r2, F.concat(stem, F.lit("ent"))))
        .when(sx.isin(*_S1_EMENT), gate(rv, ement_fix))
        .when(sx.isin(*_S1_ITE), gate(r2, ite_fix))
        .when(sx.isin(*_S1_IF), gate(r2, if_fix))
        .when(sx == "eaux", _res(F.concat(stem, F.lit("eau")), True))
        .when(sx == "aux", gate(r1, F.concat(stem, F.lit("al"))))
        .when(
            sx.isin(*_S1_EUSE),
            F.when(pos >= r2, _res(stem, True))
            .when(pos >= r1, _res(F.concat(stem, F.lit("eux")), True))
            .otherwise(fail),
        )
        .when(
            sx.isin(*_S1_ISSEMENT),
            F.when(
                (pos >= r1) & (pos >= 1) & ~_prev_is(w, pos, _V),
                _res(stem, True),
            ).otherwise(fail),
        )
        .when(
            sx == "amment",
            _res(
                F.when(pos >= rv, F.concat(stem, F.lit("ant"))).otherwise(w),
                False,
            ),
        )
        .when(
            sx == "emment",
            _res(
                F.when(pos >= rv, F.concat(stem, F.lit("ent"))).otherwise(w),
                False,
            ),
        )
        .otherwise(  # ment / ments
            _res(F.when(ment_del, stem).otherwise(w), False)
        )
    )


def _limited_chain(w, rv, sufs: list[str], act) -> Column:
    """The setlimit-among shape of steps 2a/2b/4: first (longest)
    suffix that BOTH matches and lies inside RV wins and commits;
    out-of-region longer suffixes fall through to shorter ones.
    `act(sx, pos, stem)` builds the committed result."""
    out = None
    for s in sufs:  # already longest-first
        pos = F.length(w) - len(s)
        cond = w.endswith(s) & (pos >= rv)
        branch = act(s, pos, w.substr(F.lit(1), pos))
        out = F.when(cond, branch) if out is None else out.when(cond, branch)
    return out


def _step2a(w: Column, rv: Column) -> Column:
    def act(s, pos, stem):
        return F.when(
            (pos >= 1) & (pos - 1 >= rv) & ~_prev_is(w, pos, _V),
            _res(stem, True),
        ).otherwise(_res(w, False))

    return _limited_chain(w, rv, _STEP2A_SUFS, act).otherwise(_res(w, False))


def _step2b(w: Column, rv: Column, r2: Column) -> Column:
    def act(s, pos, stem):
        if s in _S2B_IONS:
            return F.when(pos >= r2, _res(stem, True)).otherwise(
                _res(w, False)
            )
        if s in _S2B_E:
            return _res(stem, True)
        return _res(
            _bind1(
                stem,
                lambda s2: F.when(
                    s2.endswith("e") & (F.length(s2) - 1 >= rv),
                    _drop(s2, 1),
                ).otherwise(s2),
            ),
            True,
        )

    return _limited_chain(w, rv, _STEP2B_SUFS, act).otherwise(_res(w, False))


def _step3(w: Column) -> Column:
    return (
        F.when(w.endswith("Y"), F.concat(_drop(w, 1), F.lit("i")))
        .when(w.endswith("ç"), F.concat(_drop(w, 1), F.lit("c")))
        .otherwise(w)
    )


def _residual(w0: Column, rv: Column, r2: Column) -> Column:
    s_dropped = F.when(
        w0.endswith("s")
        & (F.length(w0) >= 2)
        & ~w0.substr(F.length(w0) - 1, F.lit(1)).rlike(
            f"^[{_KEEP_S_AFTER}]$"
        ),
        _drop(w0, 1),
    ).otherwise(w0)

    def inner(w):
        def act(s, pos, stem):
            if s == "ion":
                return F.when(
                    (pos >= r2) & (pos >= 1) & (pos - 1 >= rv)
                    & _prev_is(w, pos, "st"),
                    stem,
                ).otherwise(w)
            if s in _S4_IER:
                return F.concat(stem, F.lit("i"))
            if s == "e":
                return stem
            return F.when(  # ë after gu, the gu inside RV
                stem.endswith("gu") & (pos - 2 >= rv), stem
            ).otherwise(w)

        return _limited_chain(w, rv, _STEP4_SUFS, act).otherwise(w)

    return _bind1(s_dropped, inner)


def _un_double(w: Column) -> Column:
    return F.when(
        w.rlike("(enn|onn|ett|ell|eill)$"), _drop(w, 1)
    ).otherwise(w)


def _un_accent(w: Column) -> Column:
    return F.regexp_replace(w, f"[éè]([^{_V}]+)$", "e$1")


def french_stem(tok: Column) -> Column:
    """Snowball French stem of ONE lowercased token, as a single
    Column expression. RV/R1/R2 are computed once on the marked word
    and ride along unchanged; each step binds its input word once."""

    def run_steps(w, rv, r1, r2):
        return _bind_res(
            _step1(w, rv, r1, r2),
            lambda w1, ok1: F.when(ok1, _step3(w1)).otherwise(
                _bind_res(
                    _step2a(w1, rv),
                    lambda w2, ok2: F.when(ok2, _step3(w2)).otherwise(
                        _bind_res(
                            _step2b(w2, rv, r2),
                            lambda w3, ok3: F.when(ok3, _step3(w3))
                            .otherwise(_residual(w3, rv, r2)),
                        )
                    ),
                )
            ),
        )

    def with_regions(m: Column) -> Column:
        return _bind1(
            _region_len(m),
            lambda r1b: _chain4(
                m,
                _rv_len(m),
                r1b,
                r1b + _region_len(m.substr(r1b + 1, F.length(m))),
                run_steps,
            ),
        )

    stemmed = _bind1(
        _bind1(_mark(tok), with_regions),
        lambda x: _un_accent(_un_double(x)),
    )
    return F.translate(stemmed, "UIY", "uiy")


def french_stem_tokens(toks: Column) -> Column:
    """Stem EVERY element of a token array — one `call_function`
    against a once-per-session SQL temp function (ops/sqlfn.py);
    inline transform() fallback when no session is active."""
    from route81_spark.ops.sqlfn import tokens_fn

    return tokens_fn("__r81_frstem", french_stem, toks)
