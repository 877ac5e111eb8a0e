"""Snowball Danish stemmer: the pure-Column program (ops/danish.py)
must agree with the independent Python spec twin on a broad generated
word grid, and both must pin behaviors the published algorithm states
outright or forces mechanically — the setlimit containment semantics
shared with Swedish/Norwegian (a suffix must lie ENTIRELY in R1 to be
a candidate), the Danish valid s-ending (a letter CLASS that includes
the vowels a/å and an unconditional k — contrast Norwegian's
k-not-after-vowel clause), the gd/dt/gt/kt consonant pair (with gd
significant on the repeat call from step 3), the un-limited igst
pre-step, løst -> løs, and the step-4 undouble. $text integration:
$language: "danish" (or "da") conflates morphological variants in
match + score, stops (when asked) on unfolded tokens BEFORE stemming,
stems BEFORE the diacritic fold (the program KEEPS æ/å/ø — the
chain's fold removes the å; æ/ø survive on BOTH sides), and
languageOverride dispatches da docs to this program.

MongoDB runs the per-language Snowball program server-side; the
reference ships $text to that index (route81.go:181-197).
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from route81_spark.ops.danish import _no_region, danish_py, danish_stem
from route81_spark.pipeline import apply_pipeline

# behaviors forced by single rules or short rule compositions of the
# published description (each hand-traced through the rule tables):
# these pin BOTH implementations against the spec, not just against
# each other
SPEC_PINS = {
    # step 1: plural/definite suffixes in R1
    "hunden": "hund", "hundene": "hund", "hundenes": "hund",
    "pigerne": "pig", "læser": "læs", "gælder": "gæld",
    "løber": "løb", "ofte": "oft", "påstanden": "påstand",
    "påstande": "påstand", "accepterede": "accept",
    "studerende": "stud", "studerendes": "stud", "leveret": "lev",
    "lærers": "lær", "lærerens": "lær", "huset": "hus",
    "husets": "hus",
    # Danish carries NO bare 'ede' entry (Norwegian does): the past
    # tense keeps its 'ed' after the final-e deletion — adjudicated
    # against the compiled Snowball authority (ts_lexize danish_stem
    # 'dannede' -> 'danned'), not by reading either derivation
    "dannede": "danned",
    # hed-composites: hed/heden/heder/heds/hedens delete whole in R1
    "dumhed": "dum", "dumheden": "dum", "dumheder": "dum",
    "dumheds": "dum", "dumhedens": "dum", "friskhed": "frisk",
    # setlimit containment: the longest table suffix straddles R1 and
    # is INVISIBLE, a shorter in-R1 suffix still acts — and 'nyhed'
    # itself SURVIVES ('hed' straddles; Danish has no bare 'ed'
    # entry, unlike Norwegian whose 'et' strips 'nyhet' to 'nyh')
    "nyheder": "nyhed", "nyhederne": "nyhed", "nyheden": "nyhed",
    "nyhedernes": "nyhed", "nyhed": "nyhed",
    # ... and fully-outside suffixes stay put
    "ene": "ene", "løb": "løb", "på": "på", "hus": "hus",
    # step 1 's': the Danish s-ending CLASS includes the vowels a/å
    # and an unconditional k (Norwegian deletes none of the first
    # three; Swedish only folks)
    "villas": "villa", "varås": "varå", "bruks": "bruk",
    "folks": "folk", "ukas": "uka", "dagens": "dag",
    # ... e is NOT in the class, and among-commit means no shorter
    # suffix is retried after the failed condition
    "abes": "abes",
    # step 2: gd dt gt kt in R1 -> drop the last letter; straddling
    # pairs stay; vt is NOT a Danish pair (Norwegian contrast)
    "friskt": "frisk", "sendt": "send", "belagd": "belag",
    "trygt": "trygt", "halvt": "halvt",
    # step 1 then step 2 composition ('solgte' -> 'solgt' -> 'solg')
    "solgte": "solg", "sendte": "send",
    # step 3: the igst pre-step runs with NO limit, then ig/lig/elig/
    # els delete in R1 (with the repeat consonant_pair call — gd
    # significant there), løst -> løs
    "venligst": "ven", "venlig": "ven", "hurtigst": "hurt",
    "hurtigt": "hurt", "roligst": "rol", "igst": "ig",
    "mulig": "mul", "balagdig": "balag",
    "arbejdsløst": "arbejdsløs", "arbejdsløs": "arbejdsløs",
    "løst": "løst",  # 'løst' itself straddles R1 — containment pin
    # step 4 undouble (the doubled letter's LAST copy must sit in R1;
    # its partner is read outside the limit)
    "katten": "kat", "kattens": "kat", "hopper": "hop",
    "kommer": "kom", "spillets": "spil", "att": "att",
    # step 1 + step 3 + step 4 composition (the spec's own example)
    "bestemmelse": "bestem", "bestemmelserne": "bestem",
    "bestemme": "bestem",
    # step 3 elig + undouble
    "øjeblikkelig": "øjeblik",
    # underived forms pass through
    "ingenting": "ingenting", "fast": "fast", "står": "står",
    "når": "når",
}


def test_python_twin_matches_spec_pins():
    for w, want in SPEC_PINS.items():
        assert danish_py(w) == want, (w, want, danish_py(w))


def test_regions_hop3():
    """R1 = after the first non-vowel following a vowel, lifted to
    >= 3 (hop-3); 2-letter words keep their tiny raw R1; æ/å/ø and y
    are vowels (the Danish set is IDENTICAL to Norwegian's, which is
    why ops/danish.py imports the region machinery)."""
    assert _no_region("hunden") == 3
    assert _no_region("pigerne") == 3      # p-i-g -> 3
    assert _no_region("accepterede") == 3  # raw 2 lifted to 3
    assert _no_region("på") == 2           # no non-vowel after vowel
    assert _no_region("ab") == 2           # len < 3 keeps raw R1
    assert _no_region("nyhed") == 3        # y is a vowel: n-y-h -> 3
    assert _no_region("løber") == 3        # ø is a vowel: l-ø-b -> 3
    assert _no_region("gælder") == 3       # æ is a vowel: g-æ-l -> 3
    assert _no_region("friskt") == 4       # f-r-i-s -> raw 4 > 3


def test_setlimit_vs_gate_semantics():
    """The distinguishing pins: 'nyheder' ends with table suffix
    'heder' whose start (position 2) lies before R1 (3) — under
    setlimit it is not a candidate at all and the in-R1 'er'
    deletes; 'nyhed' survives whole because Danish's table has no
    bare 'ed' (the Norwegian/Swedish contrast both ways); and 'løst'
    itself keeps its t because the whole suffix starts before R1."""
    assert danish_py("nyheder") == "nyhed"   # 'heder' out, 'er' in
    assert danish_py("nyhed") == "nyhed"     # 'hed' out, nothing in
    assert danish_py("løst") == "løst"       # 'løst' starts at 0 < 3
    assert danish_py("arbejdsløst") == "arbejdsløs"  # in R1 -> løs


def test_column_matches_twin_on_generated_grid(spark):
    """ONE Spark job over a prefix x stem x suffix grid hitting every
    rule family (all 31 step-1 entries, the three Danish-specific
    s-ending letter groups each way, every step-2 pair, every step-3
    suffix incl. igst/løst, undouble doubles, containment straddles,
    hop-3 shapes, æ/å/ø/y words), plus a small-alphabet exhaustive
    block, plus the spec pins — and the registered-SQL-function
    application path must agree on the same grid (proving the .sql()
    round trip changed nothing)."""
    from route81_spark.ops.danish import _STEP1_SUFS, _STEP3_SUFS

    words = set(SPEC_PINS)
    prefixes = ["", "x", "ny", "på", "for", "be", "ø", "æ", "hav",
                "a", "ab", "y", "folk", "gæ", "mul"]
    stems = ["nyhed", "hed", "mul", "hund", "pig", "dag", "uk",
             "folk", "bruk", "villa", "varå", "send", "halv", "frisk",
             "solg", "ven", "rol", "katt", "hopp", "spill", "påstand",
             "løb", "løs", "bestemm", "e", "o", "s", "å", "k", "gd",
             "ak"]
    sufs = ([""] + _STEP1_SUFS + _STEP3_SUFS
            + ["t", "dt", "gt", "kt", "gd", "st", "igst", "løst",
               "elsig", "eligt", "heds", "hedens", "erendes", "tt",
               "mm", "nn", "ll", "as", "ås", "ks", "es", "na", "an"])
    for p, st, su in itertools.product(prefixes, stems, sufs):
        words.add(p + st + su)
    for n in range(1, 4):
        for t in itertools.product("aeøsgktd", repeat=n):
            words.add("".join(t))
    words = sorted(words)

    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["s"]
        for r in df.select(
            "w", danish_stem(F.col("w")).alias("s")
        ).collect()
    }
    bad = [
        (w, danish_py(w), got[w]) for w in words
        if got[w] != danish_py(w)
    ]
    assert not bad, f"{len(bad)} column/twin mismatches, first: {bad[:5]}"
    for w, want in SPEC_PINS.items():
        assert got[w] == want

    from route81_spark.ops.danish import danish_stem_tokens

    chunks = [words[i:i + 500] for i in range(0, len(words), 500)]
    adf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(chunks)], "i int, ws array<string>"
    )
    rows = adf.select(
        "i", danish_stem_tokens(F.col("ws")).alias("ss")
    ).collect()
    got2 = {w: s for r in rows for w, s in zip(chunks[r["i"]], r["ss"])}
    bad2 = [
        (w, danish_py(w), got2[w]) for w in words
        if got2[w] != danish_py(w)
    ]
    assert not bad2, f"{len(bad2)} sql-fn/twin mismatches, first: {bad2[:5]}"


def test_text_search_danish_mode(spark):
    """$language: "danish": 'nyheder' conflates with 'nyhederne',
    'bestemme' with 'bestemmelserne' (shared stem 'bestem' through
    steps 1+3a+4), 'påstande' with 'påstanden' (stem 'påstand',
    folded to 'pastand' on both sides), and the '-hund' negation
    excludes 'hunden' via stem 'hund'."""
    df = spark.createDataFrame(
        [(1, "nyhederne kommer hurtigt"),
         (2, "pigerne læser nyheder"),
         (3, "bestemmelserne gælder nu"),
         (4, "nyheder når hunden løber"),
         (5, "påstanden står fast"),
         (6, "ingenting relevant her")],
        "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "nyheder bestemme påstande -hund",
            "$language": "danish",
            "unicode": True,
        }}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ])
    got = {(r["doc_id"], r["score"]) for r in out.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (5, 1)}, got
    # the "da" alias selects the same program
    out2 = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "nyheder", "$language": "da", "unicode": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert {r["doc_id"] for r in out2.collect()} == {1, 2, 4}


def test_text_danish_stopwords_stop_then_stem(spark):
    """stopWords composes with the Danish stemmer in the analyzer
    ORDER (tokenize -> stop unfolded -> stem -> fold): 'når'/'over'
    (on the raw list) drop BEFORE stemming on both sides; an
    all-stop-words search matches nothing; and the user-folded query
    term 'nar' does NOT hit the raw list — it stems+folds to 'nar',
    which can never match a document whose 'når' was stopped."""
    df = spark.createDataFrame(
        [(1, "nyhederne er over alt"),
         (2, "pigerne læser nyheder"),
         (3, "og det at over når")],  # all stop words
        "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "nyheder når", "$language": "danish",
            "unicode": True, "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert {r["doc_id"] for r in out.collect()} == {1, 2}
    out2 = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "over og det", "$language": "danish",
            "unicode": True, "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert out2.count() == 0
    out3 = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "nar", "$language": "danish",
            "unicode": True, "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert out3.count() == 0


def test_text_langoverride_dispatches_danish(spark):
    """languageOverride with da present: da docs stem with Snowball
    Danish from EVERY query-language arm (the dispatch is symmetric
    across the registry); zh docs keep raw tokens."""
    df = spark.createDataFrame(
        [(1, "da", "nyhederne kommer"),
         (2, "da", "hunden løber"),
         (3, "en", "running the nyheder"),
         (4, "zh", "nyhed running")],
        "doc_id long, lang string, text string",
    )
    # query language danish: 'nyheder' -> 'nyhed'. The DISPATCH proof
    # is da doc 1: 'nyhederne' -> 'nyhed' ONLY under the Danish
    # program; en doc 3 matches because Porter2 also stems 'nyheder'
    # -> 'nyhed' (its own R1 'er' rule); zh doc 4 has the literal raw
    # 'nyhed'; da doc 2 does not match.
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "nyheder",
            "$language": "danish",
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


def test_stem_stage_danish_mode(spark):
    """$stem mode 'danish': per-token Snowball Danish over whitespace
    tokens (diacritics KEPT — no postlude), stopWords composes (stop
    unfolded, then stem)."""
    df = spark.createDataFrame(
        [(1, "nyhederne bestemmelserne påstanden"),
         (2, "og det at over når")],
        "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$stem": {"textField": "text", "mode": "danish", "as": "st"}},
    ])
    got = {r["doc_id"]: r["st"] for r in out.collect()}
    assert got[1] == ["nyhed", "bestem", "påstand"]
    assert got[2] == ["og", "det", "at", "over", "når"]  # no stopping
    out2 = apply_pipeline(df, [
        {"$stem": {"textField": "text", "mode": "danish",
                   "as": "st", "stopWords": True}},
    ])
    got2 = {r["doc_id"]: r["st"] for r in out2.collect()}
    assert got2[1] == ["nyhed", "bestem", "påstand"]
    assert got2[2] == []  # all stop words -> empty array
    # stopLanguage stays non-composable (loud), danish included
    with pytest.raises(ValueError, match="stopLanguage"):
        apply_pipeline(df, [
            {"$stem": {"mode": "danish", "stopLanguage": "german"}},
        ])


def test_bm25_danish_stem_and_stops(spark):
    """bm25_scores(stem='danish'): corpus tokens and query terms run
    the Danish program before tf/df ('nyheder' scores 'nyhederne'
    docs); stop_words=True picks the DANISH list (the 'når' term
    stops out; an all-stop query fails loudly)."""
    from route81_spark.ops.corpus import bm25_scores

    df = spark.createDataFrame(
        [(1, "nyhederne kommer hurtigt"),
         (2, "pigerne læser bogen"),
         (3, "ingenting her")],
        "doc_id long, text string",
    )
    scored = bm25_scores(df, ["nyheder", "når"], stem="danish",
                         stop_words=True)
    got = {r["doc_id"]: r["bm25"] for r in scored.collect()}
    assert got[1] > 0 and got[2] == 0 and got[3] == 0
    with pytest.raises(ValueError, match="stop word"):
        bm25_scores(df, ["når", "og"], stem="danish",
                    stop_words=True)


def test_case_sensitive_composes_self_consistently(spark):
    """$caseSensitive + danish mode: capitalized tokens pass through
    largely unstemmed on BOTH sides (the documented symmetric
    degradation — same policy as the other modes)."""
    df = spark.createDataFrame(
        [(1, "Nyhederne kommer"), (2, "nyhederne kommer")],
        "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "Nyhederne", "$language": "danish",
            "$caseSensitive": True, "unicode": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert {r["doc_id"] for r in out.collect()} == {1}


def test_text_danish_composes_with_weighted_fields(spark):
    """Danish mode rides the shared bound-struct scaffolding, so the
    weighted multi-field index form composes: terms stem with Danish
    in EVERY field, weights multiply per-field occurrences."""
    df = spark.createDataFrame(
        [(1, "nyhederne", "ingenting her"),
         (2, "andet", "pigerne læser nyheder"),
         (3, "andet", "ingenting")],
        "doc_id long, title string, body string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "nyheder", "$language": "danish",
            "fields": {"title": 5, "body": 1},
        }}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ])
    got = {(r["doc_id"], r["score"]) for r in out.collect()}
    assert got == {(1, 5), (2, 1)}, got


def test_text_danish_diacritic_sensitive(spark):
    """$diacriticSensitive: true + danish: no fold anywhere — the
    program's output keeps its å and matching is exact on it:
    'påstande' (stem 'påstand') matches the 'påstanden' doc but NOT
    the user-folded 'pastanden' doc (stem 'pastand'), which the
    default INsensitive mode conflates (å -> a under NFD; æ/ø have
    no decomposition and stay distinct in BOTH modes)."""
    df = spark.createDataFrame(
        [(1, "påstanden her"), (2, "pastanden her")],
        "doc_id long, text string",
    )
    base = {"$search": "påstande", "$language": "danish",
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
