"""Stop-word lists for the $text / $stem / bm25 stopWords option.

MongoDB's text index drops language-specific stop words from both the
indexed token stream and the query terms (a $search consisting only of
stop words matches nothing). The English list here is the
Snowball-project English stopword list in its contraction-free
distillation — the same 127-entry derivation PostgreSQL ships as
`english.stop`; the French list (r11) is the Snowball French stopword
list verbatim — the 156-entry `french.stop` from the same PostgreSQL
snowball stopword corpus, byte-identical to the copy Apache Spark
ships as the MLlib StopWordsRemover resource
`org/apache/spark/ml/feature/stopwords/french.txt` (pinned against
that in-environment jar resource by tests/test_stopwords.py). Both
lists are shared as data with the DuckDB oracle (the harness generates
its NOT IN lists from these constants, the same single-source pattern
as the IBAN length registry). The remaining twelve Mongo text-search
languages resolve through ``stop_list()`` below, which loads their
verbatim Snowball lists from the PySpark distribution's own MLlib
stopwords resource.

PERMANENT divergence (r12 close-out): romanian is the one Mongo text
language whose Snowball stop list no in-environment corpus carries
(the MLlib resource directory has no romanian.txt, and no other
verbatim-confident source ships in this container). Rather than stop
romanian text with a wrong-language or from-memory list — a silent
wrong-answer hazard — ``stop_list("romanian")`` raises ValueError
naming the carried set, permanently, until a verbatim list can be
vendored with provenance. `$language: "romanian"` without stopWords
still works (fold-only matching).

Documented divergence: Mongo's index applies the full Snowball list
(contraction forms included) over its own tokenizer; this engine's
tokenizer splits contractions at the apostrophe, so the fragments
's'/'t' are stopped (they are IN the list) but contraction stems like
'aren'/'isn' are not.
"""

from __future__ import annotations

import functools

STOP_EN: tuple[str, ...] = (
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves",
    "you", "your", "yours", "yourself", "yourselves",
    "he", "him", "his", "himself", "she", "her", "hers", "herself",
    "it", "its", "itself", "they", "them", "their", "theirs",
    "themselves", "what", "which", "who", "whom", "this", "that",
    "these", "those", "am", "is", "are", "was", "were", "be", "been",
    "being", "have", "has", "had", "having", "do", "does", "did",
    "doing", "a", "an", "the", "and", "but", "if", "or", "because",
    "as", "until", "while", "of", "at", "by", "for", "with", "about",
    "against", "between", "into", "through", "during", "before",
    "after", "above", "below", "to", "from", "up", "down", "in",
    "out", "on", "off", "over", "under", "again", "further", "then",
    "once", "here", "there", "when", "where", "why", "how", "all",
    "any", "both", "each", "few", "more", "most", "other", "some",
    "such", "no", "nor", "not", "only", "own", "same", "so", "than",
    "too", "very", "s", "t", "can", "will", "just", "don", "should",
    "now",
)

# Snowball French stopword list, verbatim (see module docstring for
# provenance + the jar pin). The single letters c/d/j/l/m/n/s/t come
# from elisions (c'/d'/j'/l'/…); this engine's Unicode tokenizer
# splits at the apostrophe, so "l'homme" tokenizes as l + homme and
# the elision fragment is correctly stopped.
STOP_FR: tuple[str, ...] = (
    "au", "aux", "avec", "ce", "ces", "dans", "de", "des", "du",
    "elle", "en", "et", "eux", "il", "je", "la", "le", "les", "leur",
    "lui", "ma", "mais", "me", "même", "mes", "moi", "mon", "ne",
    "nos", "notre", "nous", "on", "ou", "par", "pas", "pour", "qu",
    "que", "qui", "sa", "se", "ses", "son", "sur", "ta", "te", "tes",
    "toi", "ton", "tu", "un", "une", "vos", "votre", "vous", "c", "d",
    "j", "l", "à", "m", "n", "s", "t", "y", "été", "étée", "étées",
    "étés", "étant", "étante", "étants", "étantes", "suis", "es",
    "est", "sommes", "êtes", "sont", "serai", "seras", "sera",
    "serons", "serez", "seront", "serais", "serait", "serions",
    "seriez", "seraient", "étais", "était", "étions", "étiez",
    "étaient", "fus", "fut", "fûmes", "fûtes", "furent", "sois",
    "soit", "soyons", "soyez", "soient", "fusse", "fusses", "fût",
    "fussions", "fussiez", "fussent", "ayant", "ayante", "ayantes",
    "ayants", "eu", "eue", "eues", "eus", "ai", "as", "avons", "avez",
    "ont", "aurai", "auras", "aura", "aurons", "aurez", "auront",
    "aurais", "aurait", "aurions", "auriez", "auraient", "avais",
    "avait", "avions", "aviez", "avaient", "eut", "eûmes", "eûtes",
    "eurent", "aie", "aies", "ait", "ayons", "ayez", "aient", "eusse",
    "eusses", "eût", "eussions", "eussiez", "eussent",
)

# Mongo text-search language names + ISO 639-1 codes -> the Snowball
# stop-list resource name. Mongo's text index supports 15 languages;
# romanian is the ONE whose Snowball list the in-environment corpus
# does not carry (it maps to None -> loud error naming the gap).
_LANGS: dict[str, str | None] = {
    "danish": "danish", "da": "danish",
    "dutch": "dutch", "nl": "dutch",
    "english": "english", "en": "english",
    "finnish": "finnish", "fi": "finnish",
    "french": "french", "fr": "french",
    "german": "german", "de": "german",
    "hungarian": "hungarian", "hu": "hungarian",
    "italian": "italian", "it": "italian",
    "norwegian": "norwegian", "nb": "norwegian",
    "portuguese": "portuguese", "pt": "portuguese",
    "romanian": None, "ro": None,
    "russian": "russian", "ru": "russian",
    "spanish": "spanish", "es": "spanish",
    "swedish": "swedish", "sv": "swedish",
    "turkish": "turkish", "tr": "turkish",
}


@functools.lru_cache(maxsize=None)
def stop_list(language: str) -> tuple[str, ...]:
    """The Snowball stop list for a Mongo text-search language name or
    ISO code (r11). english/french return the vendored constants above
    (single source with every recorded oracle — the jar's ENGLISH copy
    is the NLTK-augmented 181-entry variant, per its own README, so it
    is deliberately NOT used); the other twelve load from the PySpark
    distribution's own MLlib StopWordsRemover resource
    (org/apache/spark/ml/feature/stopwords/<language>.txt — the
    PostgreSQL snowball stopword corpus, i.e. the Snowball lists
    verbatim). Unknown languages and romanian (the one Mongo text
    language whose list the corpus does not carry) raise ValueError
    naming the carried set."""
    key = _LANGS.get(language.lower())
    if key is None:
        carried = sorted({v for v in _LANGS.values() if v})
        raise ValueError(
            f"no Snowball stop list carried for language "
            f"{language!r} — carried: {', '.join(carried)}"
        )
    if key == "english":
        return STOP_EN
    if key == "french":
        return STOP_FR
    import glob
    import os
    import zipfile

    import pyspark

    # sorted + uniqueness-checked (r12): glob order is filesystem-
    # dependent, and two coexisting mllib jar versions would otherwise
    # make the list source nondeterministic — fail loudly instead.
    jars = sorted(glob.glob(os.path.join(
        os.path.dirname(pyspark.__file__), "jars", "spark-mllib_*.jar"
    )))
    if not jars:  # pragma: no cover - packaging seam
        raise RuntimeError(
            "spark-mllib jar (the Snowball stop-list resource) not"
            " found next to the pyspark package"
        )
    if len(jars) > 1:  # pragma: no cover - packaging seam
        raise RuntimeError(
            "multiple spark-mllib jars next to the pyspark package — "
            f"ambiguous stop-list source: {jars}"
        )
    with zipfile.ZipFile(jars[0]) as z:
        raw = z.read(
            f"org/apache/spark/ml/feature/stopwords/{key}.txt"
        ).decode("utf-8")
    # order-preserving dedupe: three of the raw resource files carry a
    # handful of repeated lines (finnish/hungarian/norwegian)
    return tuple(dict.fromkeys(
        w.strip() for w in raw.splitlines() if w.strip()
    ))
