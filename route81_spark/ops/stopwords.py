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
as the IBAN length registry).

Documented divergence: Mongo's index applies the full Snowball list
(contraction forms included) over its own tokenizer; this engine's
tokenizer splits contractions at the apostrophe, so the fragments
's'/'t' are stopped (they are IN the list) but contraction stems like
'aren'/'isn' are not.
"""

from __future__ import annotations

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
