"""Text analysis over the `documents` table: tokenization, token counts,
quality scoring, language-ID heuristic, document fingerprinting.

Everything is built-in pyspark.sql.functions (JVM-side, codegen'd) and
deliberately mirrors expressions DuckDB can evaluate, so each op ships
with a value-exact oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A BPE-ish pre-tokenizer: word pieces, digit runs, punctuation runs.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"

# Tiny deterministic stopword marker sets for the lang-id heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array."""
    t = F.trim(col)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_tokens(col: Column) -> Column:
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)


def distinct_ratio(col: Column) -> Column:
    tk = tokens(col)
    # empty token list -> null (not an ANSI DIVIDE_BY_ZERO abort)
    return F.when(F.size(tk) > 0, F.size(F.array_distinct(tk)) / F.size(tk))


def quality_score(text_col: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length factor x lexical
    diversity x alpha ratio. The components are the standard cheap
    signals (length, punct/alpha ratios, type-token ratio).

    Rounded with det_round (floor-scaling) so the value is bit-identical
    across engines — see ops/util.py."""
    from route81_spark.ops.util import det_round

    n_chars = F.length(text_col)
    length_factor = F.least(n_chars / F.lit(400.0), F.lit(1.0))
    diversity = distinct_ratio(text_col)
    alpha = F.length(F.regexp_replace(text_col, r"[^A-Za-z]", "")) / n_chars
    score = det_round(length_factor * diversity * alpha, 6)
    # empty/whitespace-only text scores 0 instead of aborting under ANSI
    return F.when((n_chars > 0) & (F.size(tokens(text_col)) > 0), score).otherwise(
        F.lit(0.0)
    )


def marker_hits(text_col: Column, words: list[str]) -> Column:
    """How many tokens of `text_col` are in `words` (with multiplicity)."""
    tk = tokens(text_col)
    return F.size(F.filter(tk, lambda t: t.isin(words)))


def lang_scores(text_col: Column) -> dict[str, Column]:
    return {lang: marker_hits(text_col, ws) for lang, ws in LANG_MARKERS.items()}


def lang_id(text_col: Column) -> Column:
    """argmax over marker-hit scores, ties broken by language code order;
    all-zero -> 'und' (undetermined)."""
    scores = lang_scores(text_col)
    langs = sorted(scores)  # deterministic tie-break: first max in code-order wins
    best = F.greatest(*[scores[l] for l in langs]) if len(langs) > 1 else scores[langs[0]]
    chain = None
    for l in langs:
        cond = scores[l] == best
        chain = F.when(cond, F.lit(l)) if chain is None else chain.when(cond, F.lit(l))
    return F.when(best > 0, chain).otherwise(F.lit("und"))


def fingerprint(text_col: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set (a set-signature; md5 matches DuckDB's)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text_col)))))


def shingles(text_col: Column, n: int = 3) -> Column:
    """Word n-gram shingles (distinct), the MinHash input."""
    tk = tokens(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(tk) - F.lit(n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tk, i, n)))
    )


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        F.size(bpe_ish_tokens(c)).alias("n_bpe_tokens"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("pred_lang"),
        fingerprint(c).alias("fp"),
    )
