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


def winnow_fingerprints(text_col: Column, k: int = 4, window: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003, the MOSS algorithm): rolling-hash every k-token
    shingle POSITIONALLY (no distinct — window order matters), keep the
    minimum hash of each `window` consecutive hashes, then dedupe+sort.
    Guarantees any shared run of >= window+k-1 tokens yields a common
    fingerprint, with ~2/(window+1) of hashes retained.

    Pure per-row Column expression — at 100 TB this is a narrow map with
    no shuffle; candidate retrieval is then an equi-join on fp."""
    tk = tokens(text_col)
    n_sh = F.greatest(F.size(tk) - F.lit(k - 1), F.lit(1))
    sh = F.transform(
        F.sequence(F.lit(1), n_sh), lambda i: F.concat_ws(" ", F.slice(tk, i, k))
    )
    hs = F.transform(sh, lambda s: _h64(s, 7))
    n_win = F.greatest(F.size(hs) - F.lit(window - 1), F.lit(1))
    fps = F.transform(
        F.sequence(F.lit(1), n_win), lambda i: F.array_min(F.slice(hs, i, window))
    )
    return F.array_sort(F.array_distinct(fps))


def _h64(col: Column, seed: int) -> Column:
    # same deterministic 60-bit md5 hash as ops.dedup.h64 (kept local to
    # avoid a circular import)
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|"), col)), 1, 15), 16, 10
    ).cast("long")


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
