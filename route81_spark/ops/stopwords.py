"""English stop-word list for the $text stopWords option.

MongoDB's text index drops language-specific stop words from both the
indexed token stream and the query terms (a $search consisting only of
stop words matches nothing). The list here is the Snowball-project
English stopword list in its contraction-free distillation — the same
127-entry derivation PostgreSQL ships as `english.stop` — shared as
data with the DuckDB oracle (the harness generates its NOT IN list
from this constant, the same single-source pattern as the IBAN length
registry).

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
