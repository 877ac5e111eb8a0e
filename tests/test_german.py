"""Snowball German stemmer: the pure-Column program (ops/german.py)
must agree with the independent Python spec twin on a broad generated
word grid, and both must pin behaviors the published algorithm states
outright or forces mechanically (prelude marking, the hop-3 R1
adjustment, the unadjusted-cursor R2 scan, per-step rule composites).
$text integration: $language: "german" conflates morphological
variants in match + score, stops (when asked) on unfolded tokens
BEFORE stemming, stems BEFORE the diacritic fold (the German analyzer
order — the stemmer's own postlude removes umlauts), and
languageOverride dispatches de docs to this program.

MongoDB runs the per-language Snowball program server-side; the
reference ships $text to that index (route81.go:181-197).
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from route81_spark.ops.german import _de_mark, _de_regions, german_py, german_stem
from route81_spark.pipeline import apply_pipeline

# prelude behaviors forced by the published description (ß -> ss;
# u/y between vowels marked, the trailing context vowel a lookahead
# that may lead the next mark — r13 ADVICE fix)
MARK_PINS = {
    "hauen": "haUen", "treue": "treUe", "bauer": "baUer",
    "größe": "grösse", "straße": "strasse",
    # r13 ADVICE fix — the trailing context vowel is a LOOKAHEAD
    # (Snowball's goto resets the cursor after the replaced letter),
    # so it can lead the next mark: overlapping vowel-u/y-vowel runs
    # mark every u/y (real word 'donauauen')
    "auaua": "aUaUa", "ayuya": "aYuYa",
    # ...but a MARKED u/y is a consonant, so it neither hosts nor
    # contexts a second mark: after aYu, the u's left context is Y
    "ayua": "aYua", "auya": "aUya",
    "bauuer": "baUuer",
    # no French-style q-u or lone-y marking in German
    "quelle": "quelle", "yoga": "yoga",
}

# behaviors forced by single rules or short rule compositions of the
# published description (each hand-traced through the rule tables):
# these pin BOTH implementations against the spec, not just against
# each other
SPEC_PINS = {
    # step 1 group (a): em ern er in R1
    "kinder": "kind", "kindern": "kind", "aufeinander": "aufeinand",
    "kleinstem": "klein", "über": "uber",  # 'er' at pos 2 < hop-3 R1
    # step 1 group (b): e en es + the niss repair
    "kindes": "kind", "daten": "dat", "alles": "all", "treue": "treu",
    "hauen": "hau", "mädchen": "madch", "bücher": "buch",
    "verhältnisse": "verhaltnis", "verhältnisses": "verhaltnis",
    "erlebnisse": "erlebnis",
    # step 1 group (c): s only after a valid s-ending
    "haus": "haus", "hauses": "haus", "verhältnis": "verhaltnis",
    # step 2: en er est; st needs a valid st-ending + 3 letters before
    "derbsten": "derb", "derbste": "derb", "derbst": "derb",
    "schönsten": "schon", "kleinste": "klein", "dampfst": "dampf",
    "best": "best",        # 'st' starts before R1 -> kept
    "größte": "grosst",    # 's' is not a valid st-ending
    # step 3 d-suffixes (R2-gated) + inner repairs
    "verarbeitung": "verarbeit", "entscheidungen": "entscheid",
    "beleidigend": "beleid",      # end, then inner ig (not 'eig')
    "unendlichkeit": "unend",     # keit, then inner lich in R2
    "möglichkeiten": "moglich",   # keit after en; inner lich NOT in R2
    "ätherisch": "ather",         # isch, not preceded by e
    "freundlich": "freundlich",   # lich starts before R2 -> kept
    # prelude + postlude compositions
    "größe": "gross", "grösse": "gross", "läuft": "lauft",
    "gelaufen": "gelauf", "aufeinanderfolgenden": "aufeinanderfolg",
    "aufeinanderfolgende": "aufeinanderfolg",
}


def test_prelude_marks_spec_examples():
    for w, want in MARK_PINS.items():
        assert _de_mark(w) == want, (w, want, _de_mark(w))


def test_python_twin_matches_spec_pins():
    for w, want in SPEC_PINS.items():
        assert german_py(w) == want, (w, want, german_py(w))


def test_regions_hop3_and_unadjusted_r2_cursor():
    """The two region subtleties the Snowball source forces: R1 is
    lifted to >= 3 (hop-3) AFTER R2's scan started from the
    UNADJUSTED cursor — for 'überig' the raw R1 cursor sits ON the
    vowel at index 2, so R2 = 4 and the final 'ig' deletes; scanning
    R2 from the adjusted position 3 would give R2 = 6 and keep it."""
    assert _de_regions(_de_mark("überig")) == (3, 4)
    assert german_py("überig") == "uber"
    # and with no vowel at the raw cursor the two scans agree
    assert _de_regions(_de_mark("übrig")) == (3, 5)
    assert german_py("übrig") == "ubrig"
    # hop-3 alone: 2-letter words keep their tiny raw R1
    assert _de_regions(_de_mark("ab")) == (2, 2)


def test_column_matches_twin_on_generated_grid(spark):
    """ONE Spark job over a prefix x stem x suffix grid hitting every
    rule family (all three sub-steps and their inner repairs, the
    s/st ending gates, niss, the hop-3 and unadjusted-R2 region
    shapes, prelude mark contexts, ß words), plus a small-alphabet
    exhaustive block, plus the spec pins — and the registered-SQL-
    function application path must agree on the same grid (proving
    the .sql() round trip changed nothing)."""
    words = set(SPEC_PINS) | set(MARK_PINS)
    prefixes = ["", "x", "ge", "ver", "über", "auf", "un", "be", "a",
                "ab", "ß", "ei", "au", "q"]
    stems = ["kind", "haus", "lauf", "derb", "nis", "niss", "schön",
             "grüß", "treu", "bau", "hau", "e", "u", "y", "ig", "eig",
             "lich", "freund", "tag", "dampf", "st"]
    sufs = ["", "e", "en", "es", "er", "em", "ern", "s", "st", "est",
            "end", "ung", "ig", "ik", "isch", "lich", "heit", "keit",
            "nisse", "nis", "igend", "igung", "erung", "ungen",
            "igen", "sten", "stem", "lichkeit", "igkeit", "ischen",
            "ende", "ete", "ße", "ßen", "uen", "yen", "eig", "eigend",
            "erlich", "enheit", "igkeiten", "ichst"]
    for p, st, su in itertools.product(prefixes, stems, sufs):
        words.add(p + st + su)
    for n in range(1, 4):
        for t in itertools.product("aenisßü", repeat=n):
            words.add("".join(t))
    words = sorted(words)

    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["s"]
        for r in df.select("w", german_stem(F.col("w")).alias("s")).collect()
    }
    bad = [(w, german_py(w), got[w]) for w in words if got[w] != german_py(w)]
    assert not bad, f"{len(bad)} column/twin mismatches, first: {bad[:5]}"
    for w, want in SPEC_PINS.items():
        assert got[w] == want

    from route81_spark.ops.german import german_stem_tokens

    chunks = [words[i:i + 500] for i in range(0, len(words), 500)]
    adf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(chunks)], "i int, ws array<string>"
    )
    rows = adf.select(
        "i", german_stem_tokens(F.col("ws")).alias("ss")
    ).collect()
    got2 = {w: s for r in rows for w, s in zip(chunks[r["i"]], r["ss"])}
    bad2 = [
        (w, german_py(w), got2[w]) for w in words if got2[w] != german_py(w)
    ]
    assert not bad2, f"{len(bad2)} sql-fn/twin mismatches, first: {bad2[:5]}"


def test_text_search_german_mode(spark):
    """$language: "german": 'kinder' conflates with 'kindes'/'kindern';
    'bücher' matches 'buch' with the stem applied BEFORE the diacritic
    fold (the folded text 'bucher' would stem to 'buch' here too, but
    'bücher' -> 'büch' -> fold 'buch' is the analyzer order the
    accented stop lists and regions require); '-verarbeitung'
    excludes via the shared stem of verarbeitung/verarbeitungen."""
    df = spark.createDataFrame(
        [(1, "die kindes spielen"),
         (2, "kindern macht es freude"),
         (3, "das buch gefällt"),
         (4, "kinder bei der verarbeitungen"),
         (5, "nichts relevantes hier")],
        "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "kinder bücher -verarbeitung",
            "$language": "german",
            "unicode": True,
        }}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ])
    got = {(r["doc_id"], r["score"]) for r in out.collect()}
    assert got == {(1, 1), (2, 1), (3, 1)}, got


def test_text_german_stopwords_stop_then_stem(spark):
    """stopWords composes with the German stemmer in the analyzer
    ORDER (tokenize -> stop unfolded -> stem -> fold): 'über' (a stop
    word, accented surface form) drops BEFORE stemming on both sides;
    an all-stop-words search matches nothing; and a stop word that
    would survive as a stem target ('alles' -> 'all') must NOT — it
    is stopped first."""
    df = spark.createDataFrame(
        [(1, "die daten über alles"),
         (2, "kindern läuft täglich"),
         (3, "über die der und")],  # all stop words
        "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "daten kinder", "$language": "german",
            "unicode": True, "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert {r["doc_id"] for r in out.collect()} == {1, 2}
    # all-stop-words search: nothing matches
    out2 = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "über die und", "$language": "german",
            "unicode": True, "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert out2.count() == 0
    # 'alles' is a stop word: stopped before the stemmer could turn
    # it into 'all', so searching 'alles' finds nothing
    out3 = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "alles", "$language": "german",
            "unicode": True, "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert out3.count() == 0


def test_text_langoverride_dispatches_german(spark):
    """languageOverride with en/de/zh present: en docs stem with
    Snowball English, de docs with Snowball German, zh docs keep raw
    tokens — per-row CASE, one analysis branch per document."""
    df = spark.createDataFrame(
        [(1, "en", "running the lines"),
         (2, "de", "kindern und bücher"),
         (3, "de", "buch der woche"),
         (4, "zh", "kinder running"),   # raw: matches stemmed literals only
         (5, "zh", "run kind")],
        "doc_id long, lang string, text string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "runs kinder",
            "$language": "english",
            "languageOverride": "lang",
            "unicode": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    # query language is english: 'runs' -> 'run', 'kinder' -> 'kinder'
    # (English stem). en doc 1: running -> run (match); de docs 2/3:
    # kindern -> kind != 'kinder' (no match — the query term stems
    # with the QUERY language, Mongo semantics); zh docs keep raw
    # tokens and match the literal stemmed terms: doc 4 has 'kinder',
    # doc 5 has 'run'.
    assert {r["doc_id"] for r in out.collect()} == {1, 4, 5}
    # query language german: 'kinder' -> 'kind' now matches the de
    # docs through THEIR program — and zh doc 5's literal raw 'kind'
    out2 = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "kinder",
            "$language": "german",
            "languageOverride": "lang",
            "unicode": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert {r["doc_id"] for r in out2.collect()} == {2, 5}


def test_stem_stage_german_mode(spark):
    """$stem mode 'german': per-token Snowball German over whitespace
    tokens, stopWords composes (stop unfolded, then stem)."""
    df = spark.createDataFrame(
        [(1, "kindern läuft verarbeitung"),
         (2, "über die der und")],
        "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$stem": {"textField": "text", "mode": "german", "as": "st"}},
    ])
    got = {r["doc_id"]: r["st"] for r in out.collect()}
    assert got[1] == ["kind", "lauft", "verarbeit"]
    assert got[2] == ["uber", "die", "der", "und"]  # no stopping
    out2 = apply_pipeline(df, [
        {"$stem": {"textField": "text", "mode": "german", "as": "st",
                   "stopWords": True}},
    ])
    got2 = {r["doc_id"]: r["st"] for r in out2.collect()}
    assert got2[1] == ["kind", "lauft", "verarbeit"]
    assert got2[2] == []  # all stop words -> empty array
    # stopLanguage stays non-composable (loud), german mode included
    with pytest.raises(ValueError, match="stopLanguage"):
        apply_pipeline(df, [
            {"$stem": {"mode": "german", "stopLanguage": "french"}},
        ])


def test_case_sensitive_composes_self_consistently(spark):
    """$caseSensitive + german mode: capitalized tokens pass through
    largely unstemmed on BOTH sides (the documented symmetric
    degradation — same policy as the English/French modes)."""
    df = spark.createDataFrame(
        [(1, "Kindern spielen"), (2, "kindern spielen")],
        "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "Kindern", "$language": "german",
            "$caseSensitive": True, "unicode": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    # 'Kindern' stems to 'Kind' (K counts as a consonant for the
    # regions; the lowercase 'ern' suffix still deletes) — the point
    # is SYMMETRY: query term and doc token run the same program, so
    # the capitalized query matches exactly the capitalized doc and
    # never the lowercase one.
    assert {r["doc_id"] for r in out.collect()} == {1}


def test_german_stop_query_terms_unfolded(spark):
    """Query-term stopping uses the raw accented list under the
    German analyzer: 'über' (accented) is dropped as a query term;
    under the default diacritic-INSENSITIVE mode 'uber' (user-folded)
    does NOT match the raw list and instead stems+folds to 'uber' —
    which can never match a document whose 'über' was stopped."""
    df = spark.createDataFrame(
        [(1, "über den daten")], "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "uber", "$language": "german",
            "unicode": True, "stopWords": True,
        }}},
        {"$project": {"doc_id": 1}},
    ])
    assert out.count() == 0


def test_mark_regions_agree_with_from_scratch_simulation():
    """Second-derivation guard for the German prelude/region
    machinery (where the r13 ADVICE bug lived — a divergence BOTH
    twins shared, invisible to column-vs-twin grids): a from-scratch
    simulation of german.sbl's mark_regions cursor mechanics
    (gopast v / gopast non-v; p1 lifted to x=3 only when `hop 3`
    succeeds; p2's gopast continuing from the UNADJUSTED cursor)
    must agree with _de_regions exhaustively on small marked strings
    and on the marked forms of 20k seeded random words. Adjudicate
    disagreements against the PUBLISHED description only — never by
    reading ops/german.py."""
    import itertools
    import random

    V = set("aeiouyäöü")

    def sim_regions(w):
        n = len(w)
        i = 0
        while i < n and w[i] not in V:
            i += 1
        if i >= n:
            return (n, n)
        i += 1
        j = i
        while j < n and w[j] in V:
            j += 1
        if j >= n:
            return (n, n)
        p1_raw = j + 1
        p1 = 3 if (n >= 3 and p1_raw < 3) else p1_raw
        k = p1_raw
        while k < n and w[k] not in V:
            k += 1
        if k >= n:
            return (p1, n)
        k += 1
        m = k
        while m < n and w[m] in V:
            m += 1
        if m >= n:
            return (p1, n)
        return (p1, m + 1)

    bad = []
    for ln in range(0, 7):
        for t in itertools.product("auUbä", repeat=ln):
            w = "".join(t)
            if _de_regions(w) != sim_regions(w):
                bad.append(w)
                if len(bad) > 5:
                    break
    assert not bad, bad
    rng = random.Random(7)
    alpha = "aeiouyäöübcdfghklmnrstß"
    bad2 = []
    for _ in range(20000):
        w = "".join(
            rng.choice(alpha) for _ in range(rng.randint(0, 10))
        )
        m = _de_mark(w)
        if _de_regions(m) != sim_regions(m):
            bad2.append((w, m))
            if len(bad2) > 5:
                break
    assert not bad2, bad2
