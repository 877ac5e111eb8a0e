"""Snowball French stemmer: the pure-Column program (ops/french.py)
must agree with the independent Python spec twin on a broad generated
word grid, and both must pin behaviors the published algorithm states
outright or forces mechanically (prelude marking examples, region
exceptions, per-step rule composites). $text integration:
$language: "french" conflates morphological variants in match + score,
stems BEFORE the diacritic fold (the French analyzer order), and
languageOverride dispatches fr docs to this program.

MongoDB runs the per-language Snowball program server-side; the
reference ships $text to that index (route81.go:181-197).
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from route81_spark.ops.french import _fr_mark, french_py, french_stem
from route81_spark.pipeline import apply_pipeline

# prelude examples given verbatim in the published algorithm
MARK_PINS = {
    "jouer": "joUer", "ennuie": "ennuIe", "yeux": "Yeux",
    "quand": "qUand", "croyiez": "croYiez",
    # r14 cursor-semantics pins (the German r13 ADVICE class): after
    # `<- S` the Snowball cursor sits just after the substituted
    # mark, so a mark's trailing context vowel is RE-SCANNED and can
    # host or lead the next mark — it is a lookahead, never consumed.
    # Each hand-traced through `repeat goto`, and the whole prelude
    # is verified against the compiled Snowball authority in
    # tests/test_snowball_authority.py.
    "auaua": "aUaUa",          # context a of the first U leads the next
    "ouiyé": "oUiYé",          # the U's context i hosts the Y mark
    "énîetfyéy": "énîetfYéY",  # the Y's context é contexts the final y
    "jtrtémîiyif": "jtrtémîIYif",  # I's context y is itself marked
    "ayiay": "aYiaY", "quiyou": "qUiYou", "ayua": "aYua",
}

# behaviors forced by single rules or short rule compositions of the
# published description (each hand-traced through the rule tables):
# these pin BOTH implementations against the spec, not just against
# each other
SPEC_PINS = {
    # verb suffixes (steps 2a/2b) + prelude interplay
    "jouer": "jou", "aimer": "aim", "continuer": "continu",
    "continuait": "continu", "croyiez": "croi", "maintenant": "mainten",
    # standard suffixes (step 1) incl. nested repairs
    "continuations": "continu", "majestueusement": "majestu",
    "majestueux": "majestu", "majestueuses": "majestu",
    "fameusement": "fameux", "fameux": "fameux", "doucement": "douc",
    "librement": "libr", "activités": "activ", "humilité": "humil",
    "indication": "indiqu",           # ation + ic -> iqU repair
    "programmateurs": "programm", "investissement": "invest",
    "châteaux": "château", "nationaux": "national",
    # amment/emment mutate-and-continue into step 2
    "abondamment": "abond", "évidemment": "évident",
    "évident": "évident",
    # step-1 R2 blocking falls through to the verb steps
    "conclusions": "conclus",         # usions fails R2; ions in 2b
    "biologie": "biolog",             # logie fails R2; ie in 2a
    # residual step 4 (s-removal, ier/e/ë entries, within RV)
    "premier": "premi", "nationales": "national",
    "national": "national", "générales": "général",
    "relations": "relat",             # s-drop then ion after t in R2
    "ambiguë": "ambigu",              # ë after gu inside RV
    "aiguë": "aiguë",                 # same rule: gu OUTSIDE RV -> kept
    # un_double / un_accent / pass-throughs
    "chienne": "chien", "complète": "complet",
    "yeux": "yeux", "quand": "quand",
}


def test_prelude_marks_spec_examples():
    for w, want in MARK_PINS.items():
        assert _fr_mark(w) == want, (w, want, _fr_mark(w))


def test_python_twin_matches_spec_pins():
    for w, want in SPEC_PINS.items():
        assert french_py(w) == want, (w, want, french_py(w))


def test_column_matches_twin_on_generated_grid(spark):
    """ONE Spark job over a prefix x stem x suffix grid hitting every
    rule family (all step-1 groups and repairs, the i-verb and verb
    suffix tables, residual entries, un_double/un_accent shapes, the
    par/col/tap and two-vowel RV exceptions, prelude mark contexts),
    plus a small-alphabet exhaustive block, plus the spec pins — and
    the registered-SQL-function application path must agree on the
    same grid (proving the .sql() round trip changed nothing)."""
    words = set(SPEC_PINS) | set(MARK_PINS)
    prefixes = ["", "x", "par", "col", "tap", "con", "d", "ab", "gu",
                "q", "jou", "cr", "enn", "y", "ai", "majestu", "f",
                "ch", "écl"]
    stems = ["aim", "continu", "rat", "nation", "log", "e", "u", "y",
             "tenn", "bell", "veill", "ét", "cré", "gé", "iqu"]
    sufs = ["", "s", "e", "es", "ance", "ances", "iques", "isme",
            "able", "iste", "eux", "atrice", "ateur", "ation",
            "ications", "logie", "logies", "usion", "ution", "ence",
            "ences", "ement", "ements", "ivement", "ativement",
            "eusement", "ablement", "iquement", "ièrement", "ité",
            "ités", "abilité", "icité", "ivité", "if", "ive", "ifs",
            "ives", "atif", "icatif", "eaux", "aux", "euse", "euses",
            "issement", "issements", "amment", "emment", "ment",
            "ments", "îmes", "ît", "îtes", "i", "ie", "ies", "ir",
            "ira", "irai", "iraient", "irais", "irait", "iras",
            "irent", "irez", "iriez", "irions", "irons", "iront",
            "is", "issaient", "issais", "issait", "issant", "issante",
            "issantes", "issants", "isse", "issent", "isses", "issez",
            "issiez", "issions", "issons", "it", "ions", "é", "ée",
            "ées", "és", "èrent", "er", "era", "erai", "eraient",
            "erais", "erait", "eras", "erez", "eriez", "erions",
            "erons", "eront", "ez", "iez", "âmes", "ât", "âtes", "a",
            "ai", "aient", "ais", "ait", "ant", "ante", "antes",
            "ants", "as", "asse", "assent", "asses", "assiez",
            "assions", "eassent", "ion", "ier", "ière", "ë", "guë",
            "ç", "çait", "eill", "ett", "enn", "onn", "été", "ètent",
            "ément"]
    for p, st, su in itertools.product(prefixes, stems, sufs):
        words.add(p + st + su)
    for n in range(1, 4):
        for t in itertools.product("aeiséèy", repeat=n):
            words.add("".join(t))
    # exhaustive mark-chain stress (r14): every string of length <= 5
    # over the prelude's own letters — the u/i/y/q mark alternatives,
    # their vowel contexts, and the re-scan interactions between
    # consecutive marks all live inside this block
    for n in range(1, 6):
        for t in itertools.product("auiyqé", repeat=n):
            words.add("".join(t))
    words = sorted(words)

    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["s"]
        for r in df.select("w", french_stem(F.col("w")).alias("s")).collect()
    }
    bad = [(w, french_py(w), got[w]) for w in words if got[w] != french_py(w)]
    assert not bad, f"{len(bad)} column/twin mismatches, first: {bad[:5]}"
    for w, want in SPEC_PINS.items():
        assert got[w] == want

    from route81_spark.ops.french import french_stem_tokens

    chunks = [words[i:i + 500] for i in range(0, len(words), 500)]
    adf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(chunks)], "i int, ws array<string>"
    )
    rows = adf.select(
        "i", french_stem_tokens(F.col("ws")).alias("ss")
    ).collect()
    got2 = {w: s for r in rows for w, s in zip(chunks[r["i"]], r["ss"])}
    bad2 = [
        (w, french_py(w), got2[w]) for w in words if got2[w] != french_py(w)
    ]
    assert not bad2, f"{len(bad2)} sql-fn/twin mismatches, first: {bad2[:5]}"


def test_text_search_french_mode(spark):
    """$language: "french": 'continuer' conflates with 'continuait' and
    'continuations'; 'générale' matches 'générales' with the stem
    applied BEFORE the diacritic fold (the folded text 'generales'
    would never French-stem to 'general'); '-nationaux' excludes via
    the shared stem of national/nationales/nationaux."""
    df = spark.createDataFrame(
        [(1, "elle continuait librement"),
         (2, "les continuations majestueuses"),
         (3, "générales activités"),
         (4, "premier jouet national"),
         (5, "continuait des nationaux"),
         (6, "rien de notable ici")],
        "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "continuer générale -nationaux",
            "$language": "french",
        }}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ])
    got = {(r["doc_id"], r["score"]) for r in out.collect()}
    assert got == {(1, 1), (2, 1), (3, 1)}, got


def test_text_langoverride_dispatches_french(spark):
    """languageOverride with three languages present: en docs stem
    with Snowball English, fr docs with Snowball French, zh docs keep
    raw tokens — per-row CASE, one analysis branch per document."""
    df = spark.createDataFrame(
        [(1, "en", "running lines"),
         (2, "fr", "continuations nationales"),
         (3, "zh", "continuations running"),
         (4, "fr", "rien ici")],
        "doc_id long, lang string, text string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "runs continuer",
            "$language": "english",
            "languageOverride": "lang",
        }}},
        {"$project": {"doc_id": 1}},
    ])
    # query terms stem with the QUERY language (english): run, continu.
    # doc 1 (en): running -> run MATCH. doc 2 (fr): continuations ->
    # continu MATCH. doc 3 (zh): raw tokens, no literal 'run'/'continu'
    # -> no match. doc 4 (fr): nothing.
    assert {r["doc_id"] for r in out.collect()} == {1, 2}


def test_text_french_composes_with_weighted_fields(spark):
    """French mode rides the shared bound-struct scaffolding, so the
    weighted multi-field index form composes: terms stem with French
    in EVERY field, weights multiply per-field occurrences."""
    df = spark.createDataFrame(
        [(1, "continuations", "rien ici"),
         (2, "divers", "elle continuait"),
         (3, "divers", "rien")],
        "doc_id long, title string, body string",
    )
    out = apply_pipeline(df, [
        {"$match": {"$text": {
            "$search": "continuer", "$language": "french",
            "fields": {"title": 5, "body": 1},
        }}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ])
    got = {(r["doc_id"], r["score"]) for r in out.collect()}
    assert got == {(1, 5), (2, 1)}, got


def test_stem_stage_french_mode(spark):
    df = spark.createDataFrame(
        [(1, "les continuations majestueuses abondamment")],
        "doc_id long, text string",
    )
    out = apply_pipeline(df, [
        {"$stem": {"textField": "text", "as": "st", "mode": "french"}},
    ])
    row = out.collect()[0]
    assert list(row["st"]) == [
        french_py(w) for w in
        ("les", "continuations", "majestueuses", "abondamment")
    ]
