"""Snowball Swedish stemmer: the pure-Column program (ops/swedish.py)
must agree with the independent Python spec twin on a broad generated
word grid, and both must pin behaviors the published algorithm states
outright or forces mechanically — above all the setlimit containment
semantics that distinguish the Scandinavian programs from German's
suffix-gate shape (a suffix must lie ENTIRELY in R1 to be a candidate,
so a shorter in-R1 suffix still matches when the longest straddles the
boundary). $text integration: $language: "swedish" conflates
morphological variants in match + score, stops (when asked) on
unfolded tokens BEFORE stemming, stems BEFORE the diacritic fold (the
Swedish program KEEPS ä/å/ö — the chain's fold removes them), and
languageOverride dispatches sv docs to this program.

MongoDB runs the per-language Snowball program server-side; the
reference ships $text to that index (route81.go:181-197).
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from route81_spark.ops.swedish import _sv_region, swedish_py, swedish_stem
from route81_spark.pipeline import apply_pipeline

# behaviors forced by single rules or short rule compositions of the
# published description (each hand-traced through the rule tables):
# these pin BOTH implementations against the spec, not just against
# each other
SPEC_PINS = {
    # step 1: plural/definite suffixes in R1
    "jackor": "jack", "jackorna": "jack", "flickor": "flick",
    "flickornas": "flick", "följande": "följ", "hundarnas": "hund",
    "trädgårdens": "trädgård", "skönheterna": "skön",
    "springandet": "spring", "katten": "katt",
    # step 1 's': only after a valid s-ending (the letter itself need
    # not be in R1); 'o' IS a valid s-ending
    "hunds": "hund", "husets": "huset", "glass": "glass",
    "videos": "video",
    # classic-revision negatives: -et, -an, -ning are NOT in the
    # table (the 2.x/3.x additions are pinned OUT)
    "huset": "huset", "kvinnan": "kvinnan", "betalning": "betalning",
    "vattnet": "vattnet",
    # setlimit containment: the longest table suffix straddles R1 and
    # is INVISIBLE, a shorter in-R1 suffix still deletes (German-gate
    # semantics would keep these words whole)
    "nyheter": "nyhet", "nyheterna": "nyhet", "karna": "karn",
    "hjärna": "hjärn", "rolig": "rol",
    # ... and fully-outside suffixes stay put
    "nyhet": "nyhet", "öga": "öga", "lätt": "lätt", "högt": "högt",
    # step 2: dd gd nn dt gt kt tt in R1 -> drop the last letter
    "friskt": "frisk", "tryggt": "trygg", "snabbt": "snabbt",
    # step 3: lig ig els delete; löst/fullt drop the t
    "möjlig": "möj", "möjligt": "möj", "möjligheterna": "möj",
    "tidig": "tid", "nyttig": "nytt", "förstörelse": "förstör",
    "görelser": "gör", "upplöst": "upplös", "praktfullt": "praktfull",
    # step 3 suffixes not in R1 stay
    "trolöst": "trolöst", "fullt": "fullt",
    # underived forms pass through
    "underbart": "underbart", "löst": "löst", "på": "på",
}


def test_python_twin_matches_spec_pins():
    for w, want in SPEC_PINS.items():
        assert swedish_py(w) == want, (w, want, swedish_py(w))


def test_regions_hop3():
    """R1 = after the first non-vowel following a vowel, lifted to
    >= 3 (hop-3); 2-letter words keep their tiny raw R1; ä/å/ö and y
    are vowels."""
    assert _sv_region("jackor") == 3
    assert _sv_region("flickor") == 4      # i..c -> raw 4 > 3
    assert _sv_region("öga") == 3          # raw 2 lifted to 3
    assert _sv_region("på") == 2           # no non-vowel after vowel
    assert _sv_region("ab") == 2           # len < 3 keeps raw R1
    assert _sv_region("nyhet") == 3        # y is a vowel: n-y-h -> 3


def test_setlimit_vs_gate_semantics():
    """The distinguishing pins: 'nyheterna' ends with table suffix
    'heterna' whose start (position 2) lies before R1 (3) — under
    setlimit it is not a candidate at all and the in-R1 'erna'
    deletes; a German-style longest-anywhere gate would match
    'heterna', fail the R1 test, and keep the word whole."""
    assert swedish_py("nyheterna") == "nyhet"
    assert swedish_py("nyheter") == "nyhet"    # 'heter' out, 'er' in
    assert swedish_py("rolig") == "rol"        # 'lig' out, 'ig' in
    assert swedish_py("karna") == "karn"       # 'arna' out, 'a' in


def test_column_matches_twin_on_generated_grid(spark):
    """ONE Spark job over a prefix x stem x suffix grid hitting every
    rule family (all 37 step-1 suffixes, the s-ending gate both ways,
    the seven step-2 pairs, every step-3 action, containment
    straddles, hop-3 shapes, ä/å/ö/y words), plus a small-alphabet
    exhaustive block, plus the spec pins — and the registered-SQL-
    function application path must agree on the same grid (proving
    the .sql() round trip changed nothing)."""
    from route81_spark.ops.swedish import _STEP1_SUFS, _STEP3_SUFS

    words = set(SPEC_PINS)
    prefixes = ["", "x", "ny", "trä", "för", "upp", "ö", "på", "hög",
                "a", "ab", "y", "glas", "frisk", "mö"]
    stems = ["jack", "flick", "hund", "katt", "nyhet", "het", "karn",
             "rol", "möj", "tid", "gör", "lös", "full", "e", "o",
             "trygg", "snab", "vatt", "kvinn", "s", "å"]
    sufs = ([""] + _STEP1_SUFS + _STEP3_SUFS
            + ["t", "dd", "gd", "nn", "dt", "gt", "kt", "tt", "else",
               "elser", "ligt", "igt", "igare", "igast", "lösa",
               "fulla", "heternas", "ornas", "aren", "erse", "ets",
               "ats", "ans", "ns", "na", "an", "et"])
    for p, st, su in itertools.product(prefixes, stems, sufs):
        words.add(p + st + su)
    for n in range(1, 4):
        for t in itertools.product("aensötå", repeat=n):
            words.add("".join(t))
    words = sorted(words)

    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["s"]
        for r in df.select("w", swedish_stem(F.col("w")).alias("s")).collect()
    }
    bad = [(w, swedish_py(w), got[w]) for w in words if got[w] != swedish_py(w)]
    assert not bad, f"{len(bad)} column/twin mismatches, first: {bad[:5]}"
    for w, want in SPEC_PINS.items():
        assert got[w] == want

    from route81_spark.ops.swedish import swedish_stem_tokens

    chunks = [words[i:i + 500] for i in range(0, len(words), 500)]
    adf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(chunks)], "i int, ws array<string>"
    )
    rows = adf.select(
        "i", swedish_stem_tokens(F.col("ws")).alias("ss")
    ).collect()
    got2 = {w: s for r in rows for w, s in zip(chunks[r["i"]], r["ss"])}
    bad2 = [
        (w, swedish_py(w), got2[w]) for w in words if got2[w] != swedish_py(w)
    ]
    assert not bad2, f"{len(bad2)} sql-fn/twin mismatches, first: {bad2[:5]}"


def test_text_search_swedish_mode(spark):
    """$language: "swedish": 'nyheter' conflates with 'nyheterna',
    'möjlig' with 'möjligheterna' (shared stem 'möj'), and the
    '-hund' negation excludes 'hunden'/'hundarnas' via stem 'hund';
    stemming runs BEFORE the diacritic fold (the folded 'mojlig'
    would keep its 'lig' — R1 unchanged — but never conflate with
    'möjligheterna' whose fold-first stem differs)."""
    df = spark.createDataFrame(
        [(1, "nyheterna kommer snabbt"),
         (2, "flickorna läser nyheter"),
         (3, "möjligheterna är stora"),
         (4, "nyheter när hunden springer"),
         (5, "inget relevant alls")],
        "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "nyheter möjlig -hund",
            "$language": "swedish",
            "unicode": True,
        }}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ])
    got = {(r["doc_id"], r["score"]) for r in out.collect()}
    assert got == {(1, 1), (2, 1), (3, 1)}, got


def test_text_swedish_stopwords_stop_then_stem(spark):
    """stopWords composes with the Swedish stemmer in the analyzer
    ORDER (tokenize -> stop unfolded -> stem -> fold): 'över'/'är'
    (accented surface forms on the raw list) drop BEFORE stemming on
    both sides; an all-stop-words search matches nothing; and the
    user-folded query term 'over' does NOT hit the raw list — it
    stems+folds to 'over', which can never match a document whose
    'över' was stopped."""
    df = spark.createDataFrame(
        [(1, "nyheterna är över allt"),
         (2, "flickorna läser nyheter"),
         (3, "och det att över är")],  # all stop words
        "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "nyheter är", "$language": "swedish",
            "unicode": True, "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert {r["doc_id"] for r in out.collect()} == {1, 2}
    out2 = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "över och det", "$language": "swedish",
            "unicode": True, "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert out2.count() == 0
    out3 = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "over", "$language": "swedish",
            "unicode": True, "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert out3.count() == 0


def test_text_langoverride_dispatches_swedish(spark):
    """languageOverride with sv present: sv docs stem with Snowball
    Swedish from EVERY query-language arm (the dispatch is symmetric
    across en/fr/de/sv); zh docs keep raw tokens."""
    df = spark.createDataFrame(
        [(1, "sv", "nyheterna kommer"),
         (2, "sv", "hunden springer"),
         (3, "en", "running the nyheter"),
         (4, "zh", "nyhet running")],
        "doc_id long, lang string, text string",
    )
    # query language swedish: 'nyheter' -> 'nyhet'. The DISPATCH
    # proof is sv doc 1: 'nyheterna' -> 'nyhet' ONLY under the
    # Swedish program (Porter2 keeps 'nyheterna' whole); en doc 3
    # also matches — Porter2 happens to stem 'nyheter' -> 'nyhet'
    # too (its own R2 'er' rule) — and zh doc 4 has the literal raw
    # 'nyhet'; sv doc 2 ('hunden' -> 'hund') does not.
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "nyheter",
            "$language": "swedish",
            "languageOverride": "lang",
            "unicode": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert {r["doc_id"] for r in out.collect()} == {1, 3, 4}
    # query language english: 'runs' -> 'run' matches the en doc via
    # Porter2; zh doc 4 keeps its raw 'running', which is not the
    # stemmed literal 'run' — only doc 3 matches
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


def test_stem_stage_swedish_mode(spark):
    """$stem mode 'swedish': per-token Snowball Swedish over
    whitespace tokens (diacritics KEPT — no postlude), stopWords
    composes (stop unfolded, then stem)."""
    df = spark.createDataFrame(
        [(1, "nyheterna möjligheterna förstörelse"),
         (2, "och det att över")],
        "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$stem": {"textField": "text", "mode": "swedish", "as": "st"}},
    ])
    got = {r["doc_id"]: r["st"] for r in out.collect()}
    assert got[1] == ["nyhet", "möj", "förstör"]
    assert got[2] == ["och", "det", "att", "över"]  # no stopping
    out2 = apply_pipeline(df, [
        {"$stem": {"textField": "text", "mode": "swedish", "as": "st",
                   "stopWords": True}},
    ])
    got2 = {r["doc_id"]: r["st"] for r in out2.collect()}
    assert got2[1] == ["nyhet", "möj", "förstör"]
    assert got2[2] == []  # all stop words -> empty array
    # stopLanguage stays non-composable (loud), swedish mode included
    with pytest.raises(ValueError, match="stopLanguage"):
        apply_pipeline(df, [
            {"$stem": {"mode": "swedish", "stopLanguage": "german"}},
        ])


def test_bm25_swedish_stem_and_stops(spark):
    """bm25_scores(stem='swedish'): corpus tokens and query terms run
    the Swedish program before tf/df ('nyheter' scores 'nyheterna'
    docs); stop_words=True picks the SWEDISH list (the 'är' term
    stops out; an all-stop query fails loudly)."""
    from route81_spark.ops.corpus import bm25_scores

    df = spark.createDataFrame(
        [(1, "nyheterna kommer snabbt"),
         (2, "flickorna läser boken"),
         (3, "inget alls")],
        "doc_id long, text string",
    )
    scored = bm25_scores(df, ["nyheter", "är"], stem="swedish",
                         stop_words=True)
    got = {r["doc_id"]: r["bm25"] for r in scored.collect()}
    assert got[1] > 0 and got[2] == 0 and got[3] == 0
    with pytest.raises(ValueError, match="stop word"):
        bm25_scores(df, ["är", "och"], stem="swedish", stop_words=True)


def test_case_sensitive_composes_self_consistently(spark):
    """$caseSensitive + swedish mode: capitalized tokens pass through
    largely unstemmed on BOTH sides (the documented symmetric
    degradation — same policy as the other modes)."""
    df = spark.createDataFrame(
        [(1, "Nyheterna kommer"), (2, "nyheterna kommer")],
        "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "Nyheterna", "$language": "swedish",
            "$caseSensitive": True, "unicode": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    # query term and doc token run the same program, so the
    # capitalized query matches exactly the capitalized doc and never
    # the lowercase one
    assert {r["doc_id"] for r in out.collect()} == {1}


def test_text_swedish_composes_with_weighted_fields(spark):
    """Swedish mode rides the shared bound-struct scaffolding, so the
    weighted multi-field index form composes: terms stem with Swedish
    in EVERY field, weights multiply per-field occurrences."""
    df = spark.createDataFrame(
        [(1, "nyheterna", "inget här"),
         (2, "annat", "flickorna läser nyheter"),
         (3, "annat", "inget")],
        "doc_id long, title string, body string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "nyheter", "$language": "swedish",
            "fields": {"title": 5, "body": 1},
        }}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ])
    got = {(r["doc_id"], r["score"]) for r in out.collect()}
    assert got == {(1, 5), (2, 1)}, got


def test_text_swedish_diacritic_sensitive(spark):
    """$diacriticSensitive: true + swedish: no fold anywhere — the
    program's output keeps its ä/å/ö and matching is exact on them:
    'möjligheterna' (stem 'möj') matches the 'möjlig' doc but NOT the
    user-folded 'mojlig' doc (stem 'moj'), which the default
    INsensitive mode would conflate."""
    df = spark.createDataFrame(
        [(1, "en möjlig sak"), (2, "en mojlig sak")],
        "doc_id long, text string",
    )
    spec = {
        "$search": "möjligheterna", "$language": "swedish",
        "unicode": True, "$diacriticSensitive": True,
    }
    out = apply_pipeline(df, [
        {"$match": {"$text": spec}}, {"$project": {"doc_id": 1}},
    ])
    assert {r["doc_id"] for r in out.collect()} == {1}
    # the default insensitive mode folds post-stem on both sides:
    # 'möj' and 'moj' both land on 'moj' and the two docs conflate
    out2 = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "möjligheterna", "$language": "swedish",
            "unicode": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert {r["doc_id"] for r in out2.collect()} == {1, 2}


def test_swedish_stem_with_language_none_stops_nothing(spark):
    """{stem: "swedish", $language: "none", stopWords: true}: the
    declared 'none' wins for STOPPING (nothing stops — 'över' stays
    a live query term) while the explicit stem extension is still
    honored for stemming — the same pinned exception as the English
    modes (the r11 review finding, generalized)."""
    df = spark.createDataFrame(
        [(1, "över allt")], "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "över", "$language": "none",
            "stem": "swedish", "unicode": True, "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert out.count() == 1


def test_stem_language_contradiction_stays_loud(spark):
    """The r12 contradiction guard covers the new mode: an explicit
    stem mode + a DECLARED different $language + stopWords raises."""
    from route81_spark.pipeline.compiler import PipelineCompileError

    df = spark.createDataFrame([(1, "nyheter")], "doc_id long, text string")
    with pytest.raises(PipelineCompileError, match="contradicts"):
        apply_pipeline(df, [
            {"$match": {"$text": {
                "$search": "nyheter", "stem": "swedish",
                "$language": "german", "stopWords": True,
            }}},
        ])
