"""Porter2 (Snowball English) stemmer: the pure-Column program
(ops/porter.py) must agree with the independent Python spec twin on a
broad generated word grid, and both must pin the behaviors the
published algorithm states outright (exceptional forms, step examples,
invariants). $text integration: {stem: "porter"} and
$language: "english" conflate morphological variants in match + score.

MongoDB's English analyzer runs this algorithm server-side; the
reference ships $text to that index (route81.go:181-197).
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from route81_spark.ops.porter import porter2_py, porter2_stem
from route81_spark.pipeline import apply_pipeline

# behaviors stated in the published algorithm description (inputs ->
# outputs given there, or directly forced by a single rule): these pin
# BOTH implementations against the spec, not just against each other
SPEC_PINS = {
    # exceptional forms
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "atlas": "atlas", "cosmos": "cosmos",
    "bias": "bias", "andes": "andes",
    # <= 2 letters pass through
    "as": "as", "i": "i", "ox": "ox",
    # step 1a examples from the spec
    "ties": "tie", "cries": "cri", "gas": "gas", "this": "this",
    "gaps": "gap", "kiwis": "kiwi",
    # post-1a invariants (incl. reached via s-removal)
    "inning": "inning", "proceed": "proceed", "herrings": "herring",
    "exceed": "exceed", "canning": "canning",
    # step 1b: double undoubling, at/bl/iz + e, short-word + e
    "hopping": "hop", "hoping": "hope", "running": "run",
    "tanned": "tan", "luxuriated": "luxuri", "sized": "size",
    "falling": "fall", "agreed": "agre", "feed": "feed", "bled": "bled",
    "motoring": "motor", "plastered": "plaster",
    # step 1c examples from the spec
    "cry": "cri", "by": "by", "say": "say",
    # steps 2-5 composites (hand-derived through the rule tables)
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "knightly": "knight", "controlled": "control", "generate": "generat",
    "generic": "generic", "generously": "generous",
    "argument": "argument", "consignment": "consign",
    # apostrophe prelude + step 0
    "it's": "it", "spies'": "spi", "'twas": "twas",
}


def test_python_twin_matches_spec_pins():
    for w, want in SPEC_PINS.items():
        assert porter2_py(w) == want, (w, want, porter2_py(w))


def test_column_matches_twin_on_generated_grid(spark):
    """ONE Spark job over a prefix x stem x suffix grid hitting every
    rule family, plus a small-alphabet exhaustive block for the
    y-marking / region / 1a edge cases, plus the spec pins."""
    words = set(SPEC_PINS)
    prefixes = ["", "x", "en", "gener", "commun", "arsen", "con", "tr",
                "f", "y", "ay", "lill", "rat", "hes"]
    stems = ["hop", "hope", "rate", "tie", "cry", "feed", "bed",
             "control", "miss", "gas", "fall", "y"]
    sufs = ["", "s", "es", "ies", "ied", "ed", "ing", "ingly", "edly",
            "eed", "eedly", "sses", "ation", "ational", "tional",
            "ization", "izer", "fulness", "ousness", "iveness",
            "biliti", "bli", "abli", "alli", "entli", "ousli", "fulli",
            "lessli", "li", "ogi", "logi", "enci", "anci", "ator",
            "alism", "aliti", "iviti", "icate", "iciti", "ical", "ness",
            "ful", "ative", "alize", "al", "ance", "ence", "er", "ic",
            "able", "ible", "ant", "ement", "ment", "ent", "ism", "ate",
            "iti", "ous", "ive", "ize", "ion", "sion", "tion", "e", "l",
            "ll", "ey", "'s", "'s'", "'"]
    for p, st, su in itertools.product(prefixes, stems, sufs):
        words.add(p + st + su)
    for n in range(1, 4):
        for t in itertools.product("abeilsy'", repeat=n):
            words.add("".join(t))
    words = sorted(words)

    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["s"]
        for r in df.select("w", porter2_stem(F.col("w")).alias("s")).collect()
    }
    bad = [(w, porter2_py(w), got[w]) for w in words if got[w] != porter2_py(w)]
    assert not bad, f"{len(bad)} column/twin mismatches, first: {bad[:5]}"
    for w, want in SPEC_PINS.items():
        assert got[w] == want

    # the registered-SQL-function application path (porter2_stem_tokens
    # — what $text/$stem/bm25 actually call, r10) must agree with the
    # twin on the SAME grid: the body is EXTRACTED from the Column
    # program, and this sweep proves the .sql() round trip (incl. the
    # lambdafunction -> arrow rewrite) changed nothing
    from route81_spark.ops.porter import porter2_stem_tokens

    chunks = [words[i:i + 500] for i in range(0, len(words), 500)]
    adf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(chunks)], "i int, ws array<string>"
    )
    rows = adf.select("i", porter2_stem_tokens(F.col("ws")).alias("ss")).collect()
    got2 = {
        w: s for r in rows for w, s in zip(chunks[r["i"]], r["ss"])
    }
    bad2 = [
        (w, porter2_py(w), got2[w]) for w in words if got2[w] != porter2_py(w)
    ]
    assert not bad2, f"{len(bad2)} sql-fn/twin mismatches, first: {bad2[:5]}"


def test_text_search_porter_mode(spark):
    """{stem: "porter"}: 'runs' conflates with running/run/runner? NO —
    runner keeps its -er (not in R2); relational/relations conflate
    with 'relation'; the negation fires on the stemmed token; score
    counts stem-conflated occurrences."""
    rows = [
        (1, "running daily and jumping"),        # running -> run
        (2, "the runner ran a lap"),             # no token stems to run
        (3, "relational relations hold"),        # both -> relat
        (4, "controlled runs proceed"),          # run, but negated token
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = apply_pipeline(
        df,
        [
            {"$match": {"$text": {
                "$search": "runs relation -control", "stem": "porter",
            }}},
            {"$addFields": {"score": {"$meta": "textScore"}}},
            {"$project": {"doc_id": 1, "score": 1}},
        ],
    )
    got = {r["doc_id"]: r["score"] for r in out.collect()}
    # doc4 matched 'runs' but contains controlled -> control (negated)
    assert got == {1: 1, 3: 2}


def test_text_language_english_selects_porter(spark):
    """$language: "english" (Mongo's default analyzer language) now
    runs Porter2 instead of being silently ignored; languages beyond
    english/french stay accepted-and-ignored (documented
    divergence)."""
    rows = [(1, "generously agreed"), (2, "generous agreement")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    eng = apply_pipeline(
        df,
        [{"$match": {"$text": {
            "$search": "generous", "$language": "english",
        }}}],
    )
    assert {r["doc_id"] for r in eng.collect()} == {1, 2}
    # French: accepted, ignored -> exact-token match only
    fr = apply_pipeline(
        df,
        [{"$match": {"$text": {
            "$search": "generous", "$language": "french",
        }}}],
    )
    assert {r["doc_id"] for r in fr.collect()} == {2}


def test_bm25_stemmed_option(spark):
    """bm25_scores(stem="porter"): query forms conflate with text
    variants; two query forms sharing a stem dedupe to ONE term
    (identical scores); unsupported modes fail loudly."""
    import pytest

    from route81_spark.ops.corpus import bm25_scores

    rows = [
        (1, "running daily and jumping"),
        (2, "the runner ran a lap"),
        (3, "relational relations hold"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["bm25"]
           for r in bm25_scores(df, ["runs"], stem="porter").collect()}
    assert got[1] > 0 and got[2] == 0.0 and got[3] == 0.0
    # 'runs' and 'running' share the stem -> dedupe -> same scores as
    # the single-term query
    got2 = {r["doc_id"]: r["bm25"]
            for r in bm25_scores(df, ["runs", "running"],
                                 stem="porter").collect()}
    assert got2 == got
    # unstemmed: 'runs' matches nothing here
    got3 = {r["doc_id"]: r["bm25"]
            for r in bm25_scores(df, ["runs"]).collect()}
    assert all(v == 0.0 for v in got3.values())
    with pytest.raises(ValueError, match="stem"):
        bm25_scores(df, ["runs"], stem="lovins")


def test_stem_stage_extension(spark):
    """$stem pipeline stage: porter and s modes produce the stemmed
    token array; unknown modes fail loudly."""
    import pytest

    from route81_spark.pipeline import apply_pipeline

    df = spark.createDataFrame(
        [(1, "running queries daily")], "doc_id long, text string"
    )
    out = apply_pipeline(
        df, [{"$stem": {"textField": "text", "as": "st"}}]
    ).collect()[0]
    assert list(out["st"]) == ["run", "queri", "daili"]
    out_s = apply_pipeline(
        df, [{"$stem": {"mode": "s"}}]
    ).collect()[0]
    assert list(out_s["stems"]) == ["running", "query", "daily"]
    with pytest.raises(Exception, match="stem"):
        apply_pipeline(df, [{"$stem": {"mode": "lovins"}}]).collect()
