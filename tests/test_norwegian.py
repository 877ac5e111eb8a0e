"""Snowball Norwegian stemmer: the pure-Column program
(ops/norwegian.py) must agree with the independent Python spec twin on
a broad generated word grid, and both must pin behaviors the published
algorithm states outright or forces mechanically — the setlimit
containment semantics shared with Swedish (a suffix must lie ENTIRELY
in R1 to be a candidate), the two-clause valid s-ending (letter class
OR a k not preceded by a vowel, both tested OUTSIDE the limit), the
erte/ert -> er rewrite, and the dt/vt consonant pair. $text
integration: $language: "norwegian" (or "nb") conflates morphological
variants in match + score, stops (when asked) on unfolded tokens
BEFORE stemming, stems BEFORE the diacritic fold (the program KEEPS
æ/å/ø — the chain's fold removes the å; æ/ø have no NFD decomposition
and survive on BOTH sides of a match), and languageOverride dispatches
nb docs to this program.

MongoDB runs the per-language Snowball program server-side; the
reference ships $text to that index (route81.go:181-197).
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from route81_spark.ops.norwegian import _no_region, norwegian_py, norwegian_stem
from route81_spark.pipeline import apply_pipeline

# behaviors forced by single rules or short rule compositions of the
# published description (each hand-traced through the rule tables):
# these pin BOTH implementations against the spec, not just against
# each other
SPEC_PINS = {
    # step 1: plural/definite suffixes in R1
    "havnedistriktene": "havnedistrikt", "administrasjonen": "administrasjon",
    "advokatene": "advokat", "avdelingene": "avdeling", "andre": "andr",
    "jentene": "jent", "hunden": "hund", "huset": "hus",
    "varmast": "varm", "arbeidende": "arbeid", "løper": "løp",
    "påstanden": "påstand", "påstander": "påstand",
    # het-composites: heter/hetene/hetenes all delete whole in R1
    "muligheter": "mul", "mulighetene": "mul", "mulighetenes": "mul",
    # classic revision: ers and ets delete UNCONDITIONALLY (the 2.x/
    # 3.x conditions on these are pinned OUT)
    "lærers": "lær", "verkets": "verk",
    # step 1 's': valid s-ending = letter class (tested on the whole
    # word, outside the limit) ...
    "hunds": "hund", "dagens": "dag", "naturens": "natur",
    # ... or k NOT preceded by a vowel; a vowel-preceded k fails, and
    # among-commit means no shorter suffix is retried
    "folks": "folk", "bruks": "bruks", "ukas": "ukas",
    # step 1 erte/ert -> er
    "forserte": "forser", "operert": "operer",
    # setlimit containment: the longest table suffix straddles R1 and
    # is INVISIBLE, a shorter in-R1 suffix still acts (a German-style
    # longest-anywhere gate would keep these whole)
    "nyhetene": "nyhet", "nyheter": "nyhet", "nyhet": "nyh",
    "mulig": "mul",
    # ... and fully-outside suffixes stay put
    "ene": "ene", "løp": "løp", "på": "på", "by": "by",
    # step 2: dt vt in R1 -> drop the t; straddling pair stays
    "sendt": "send", "halvt": "halv", "midt": "midt",
    # step 1 then step 2 composition
    "sendte": "send",
    # step 3: leg eleg ig eig lig elig els lov elov slov hetslov
    "hemmelig": "hemm", "vanskelig": "vansk", "betydelig": "betyd",
    "venleg": "ven", "huseig": "hus", "arvelov": "arv",
    "kjærlighetslov": "kjærlig",
    # underived forms pass through
    "ingenting": "ingenting", "fort": "fort", "står": "står",
}


def test_python_twin_matches_spec_pins():
    for w, want in SPEC_PINS.items():
        assert norwegian_py(w) == want, (w, want, norwegian_py(w))


def test_regions_hop3():
    """R1 = after the first non-vowel following a vowel, lifted to
    >= 3 (hop-3); 2-letter words keep their tiny raw R1; æ/å/ø and y
    are vowels."""
    assert _no_region("jentene") == 3
    assert _no_region("muligheter") == 3   # m-u-l -> 3
    assert _no_region("advokatene") == 3   # raw 2 lifted to 3
    assert _no_region("på") == 2           # no non-vowel after vowel
    assert _no_region("ab") == 2           # len < 3 keeps raw R1
    assert _no_region("nyhet") == 3        # y is a vowel: n-y-h -> 3
    assert _no_region("løper") == 3        # ø is a vowel: l-ø-p -> 3
    assert _no_region("kjærlig") == 4      # æ..r -> raw 4 > 3


def test_setlimit_vs_gate_semantics():
    """The distinguishing pins: 'nyhetene' ends with table suffix
    'hetene' whose start (position 2) lies before R1 (3) — under
    setlimit it is not a candidate at all and the in-R1 'ene'
    deletes; and 'nyhet' itself loses its in-R1 'et' even though
    'het' straddles (Norwegian's table has 'et'; Swedish's does not,
    which is why Swedish keeps 'nyhet' whole and Norwegian does
    not)."""
    assert norwegian_py("nyhetene") == "nyhet"
    assert norwegian_py("nyheter") == "nyhet"   # 'heter' out, 'er' in
    assert norwegian_py("nyhet") == "nyh"       # 'het' out, 'et' in
    assert norwegian_py("mulig") == "mul"       # 'lig' out, 'ig' in


def test_column_matches_twin_on_generated_grid(spark):
    """ONE Spark job over a prefix x stem x suffix grid hitting every
    rule family (all 29 step-1 entries, both valid-s-ending clauses
    each way, both step-2 pairs, every step-3 suffix, containment
    straddles, hop-3 shapes, æ/å/ø/y words), plus a small-alphabet
    exhaustive block, plus the spec pins — and the registered-SQL-
    function application path must agree on the same grid (proving
    the .sql() round trip changed nothing)."""
    from route81_spark.ops.norwegian import _STEP1_SUFS, _STEP3_SUFS

    words = set(SPEC_PINS)
    prefixes = ["", "x", "ny", "på", "for", "opp", "ø", "æ", "hav",
                "a", "ab", "y", "folk", "kjær", "mul"]
    stems = ["nyhet", "het", "mul", "hund", "jent", "dag", "uk",
             "folk", "bruk", "oper", "fors", "send", "halv", "mid",
             "hemm", "vansk", "ven", "arv", "hus", "varm", "påstand",
             "løp", "e", "o", "s", "å", "k", "vk", "ak"]
    sufs = ([""] + _STEP1_SUFS + _STEP3_SUFS
            + ["t", "dt", "vt", "ks", "kss", "ertes", "hetenes",
               "endes", "slov", "hetslov", "ene", "ane", "ede",
               "ast", "asts", "na", "an", "ets", "ers", "erte"])
    for p, st, su in itertools.product(prefixes, stems, sufs):
        words.add(p + st + su)
    for n in range(1, 4):
        for t in itertools.product("aenskvtø", repeat=n):
            words.add("".join(t))
    words = sorted(words)

    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["s"]
        for r in df.select(
            "w", norwegian_stem(F.col("w")).alias("s")
        ).collect()
    }
    bad = [
        (w, norwegian_py(w), got[w]) for w in words
        if got[w] != norwegian_py(w)
    ]
    assert not bad, f"{len(bad)} column/twin mismatches, first: {bad[:5]}"
    for w, want in SPEC_PINS.items():
        assert got[w] == want

    from route81_spark.ops.norwegian import norwegian_stem_tokens

    chunks = [words[i:i + 500] for i in range(0, len(words), 500)]
    adf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(chunks)], "i int, ws array<string>"
    )
    rows = adf.select(
        "i", norwegian_stem_tokens(F.col("ws")).alias("ss")
    ).collect()
    got2 = {w: s for r in rows for w, s in zip(chunks[r["i"]], r["ss"])}
    bad2 = [
        (w, norwegian_py(w), got2[w]) for w in words
        if got2[w] != norwegian_py(w)
    ]
    assert not bad2, f"{len(bad2)} sql-fn/twin mismatches, first: {bad2[:5]}"


def test_text_search_norwegian_mode(spark):
    """$language: "norwegian": 'nyheter' conflates with 'nyhetene',
    'mulig' with 'mulighetene' (shared stem 'mul'), 'påstander' with
    'påstanden' (stem 'påstand', folded to 'pastand' on both sides),
    and the '-hund' negation excludes 'hunden' via stem 'hund'."""
    df = spark.createDataFrame(
        [(1, "nyhetene kommer raskt"),
         (2, "jentene leser nyheter"),
         (3, "mulighetene blir store"),
         (4, "nyheter når hunden løper"),
         (5, "påstanden står fast"),
         (6, "ingenting relevant her")],
        "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "nyheter mulig påstander -hund",
            "$language": "norwegian",
            "unicode": True,
        }}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ])
    got = {(r["doc_id"], r["score"]) for r in out.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (5, 1)}, got
    # the "nb" alias selects the same program
    out2 = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "nyheter", "$language": "nb", "unicode": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert {r["doc_id"] for r in out2.collect()} == {1, 2, 4}


def test_text_norwegian_stopwords_stop_then_stem(spark):
    """stopWords composes with the Norwegian stemmer in the analyzer
    ORDER (tokenize -> stop unfolded -> stem -> fold): 'når'/'over'
    (on the raw list) drop BEFORE stemming on both sides; an
    all-stop-words search matches nothing; and the user-folded query
    term 'nar' does NOT hit the raw list — it stems+folds to 'nar',
    which can never match a document whose 'når' was stopped."""
    df = spark.createDataFrame(
        [(1, "nyhetene er over alt"),
         (2, "jentene leser nyheter"),
         (3, "og det at over når")],  # all stop words
        "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "nyheter når", "$language": "norwegian",
            "unicode": True, "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert {r["doc_id"] for r in out.collect()} == {1, 2}
    out2 = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "over og det", "$language": "norwegian",
            "unicode": True, "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert out2.count() == 0
    out3 = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "nar", "$language": "norwegian",
            "unicode": True, "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert out3.count() == 0


def test_text_langoverride_dispatches_norwegian(spark):
    """languageOverride with nb present: nb docs stem with Snowball
    Norwegian from EVERY query-language arm (the dispatch is
    symmetric across the registry); zh docs keep raw tokens."""
    df = spark.createDataFrame(
        [(1, "nb", "nyhetene kommer"),
         (2, "nb", "hunden løper"),
         (3, "en", "running the nyheter"),
         (4, "zh", "nyhet running")],
        "doc_id long, lang string, text string",
    )
    # query language norwegian: 'nyheter' -> 'nyhet'. The DISPATCH
    # proof is nb doc 1: 'nyhetene' -> 'nyhet' ONLY under the
    # Norwegian program; en doc 3 matches because Porter2 also stems
    # 'nyheter' -> 'nyhet' (its own R2 'er' rule); zh doc 4 has the
    # literal raw 'nyhet'; nb doc 2 does not match.
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "nyheter",
            "$language": "norwegian",
            "languageOverride": "lang",
            "unicode": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert {r["doc_id"] for r in out.collect()} == {1, 3, 4}
    # query language english: 'runs' -> 'run' matches only the en doc
    out2 = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "runs",
            "$language": "english",
            "languageOverride": "lang",
            "unicode": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert {r["doc_id"] for r in out2.collect()} == {3}


def test_stem_stage_norwegian_mode(spark):
    """$stem mode 'norwegian': per-token Snowball Norwegian over
    whitespace tokens (diacritics KEPT — no postlude), stopWords
    composes (stop unfolded, then stem)."""
    df = spark.createDataFrame(
        [(1, "nyhetene mulighetene påstanden"),
         (2, "og det at over når")],
        "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$stem": {"textField": "text", "mode": "norwegian",
                   "as": "st"}},
    ])
    got = {r["doc_id"]: r["st"] for r in out.collect()}
    assert got[1] == ["nyhet", "mul", "påstand"]
    assert got[2] == ["og", "det", "at", "over", "når"]  # no stopping
    out2 = apply_pipeline(df, [
        {"$stem": {"textField": "text", "mode": "norwegian",
                   "as": "st", "stopWords": True}},
    ])
    got2 = {r["doc_id"]: r["st"] for r in out2.collect()}
    assert got2[1] == ["nyhet", "mul", "påstand"]
    assert got2[2] == []  # all stop words -> empty array
    # stopLanguage stays non-composable (loud), norwegian included
    with pytest.raises(ValueError, match="stopLanguage"):
        apply_pipeline(df, [
            {"$stem": {"mode": "norwegian", "stopLanguage": "german"}},
        ])


def test_bm25_norwegian_stem_and_stops(spark):
    """bm25_scores(stem='norwegian'): corpus tokens and query terms
    run the Norwegian program before tf/df ('nyheter' scores
    'nyhetene' docs); stop_words=True picks the NORWEGIAN list (the
    'når' term stops out; an all-stop query fails loudly)."""
    from route81_spark.ops.corpus import bm25_scores

    df = spark.createDataFrame(
        [(1, "nyhetene kommer raskt"),
         (2, "jentene leser boken"),
         (3, "ingenting her")],
        "doc_id long, text string",
    )
    scored = bm25_scores(df, ["nyheter", "når"], stem="norwegian",
                         stop_words=True)
    got = {r["doc_id"]: r["bm25"] for r in scored.collect()}
    assert got[1] > 0 and got[2] == 0 and got[3] == 0
    with pytest.raises(ValueError, match="stop word"):
        bm25_scores(df, ["når", "og"], stem="norwegian",
                    stop_words=True)


def test_case_sensitive_composes_self_consistently(spark):
    """$caseSensitive + norwegian mode: capitalized tokens pass
    through largely unstemmed on BOTH sides (the documented symmetric
    degradation — same policy as the other modes)."""
    df = spark.createDataFrame(
        [(1, "Nyhetene kommer"), (2, "nyhetene kommer")],
        "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "Nyhetene", "$language": "norwegian",
            "$caseSensitive": True, "unicode": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert {r["doc_id"] for r in out.collect()} == {1}


def test_text_norwegian_composes_with_weighted_fields(spark):
    """Norwegian mode rides the shared bound-struct scaffolding, so
    the weighted multi-field index form composes: terms stem with
    Norwegian in EVERY field, weights multiply per-field
    occurrences."""
    df = spark.createDataFrame(
        [(1, "nyhetene", "ingenting her"),
         (2, "annet", "jentene leser nyheter"),
         (3, "annet", "ingenting")],
        "doc_id long, title string, body string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "nyheter", "$language": "norwegian",
            "fields": {"title": 5, "body": 1},
        }}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ])
    got = {(r["doc_id"], r["score"]) for r in out.collect()}
    assert got == {(1, 5), (2, 1)}, got


def test_text_norwegian_diacritic_sensitive(spark):
    """$diacriticSensitive: true + norwegian: no fold anywhere — the
    program's output keeps its å and matching is exact on it:
    'påstander' (stem 'påstand') matches the 'påstanden' doc but NOT
    the user-folded 'pastanden' doc (stem 'pastand'), which the
    default INsensitive mode conflates (å -> a under NFD; æ/ø have
    no decomposition and stay distinct in BOTH modes)."""
    df = spark.createDataFrame(
        [(1, "påstanden her"), (2, "pastanden her")],
        "doc_id long, text string",
    )
    base = {"$search": "påstander", "$language": "norwegian",
            "unicode": True}
    out = apply_pipeline(df, [
        {"$match": {"$text": {**base, "$diacriticSensitive": True}}},
        {"$project": {"doc_id": 1}},
    ])
    assert {r["doc_id"] for r in out.collect()} == {1}
    out2 = apply_pipeline(df, [
        {"$match": {"$text": base}},
        {"$project": {"doc_id": 1}},
    ])
    assert {r["doc_id"] for r in out2.collect()} == {1, 2}
