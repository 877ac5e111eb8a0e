"""Unicode text layer: NFC normalization, any-script tokenization, unicode $text search."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from route81_spark.pipeline import apply_pipeline
from ._shared import U_SNIPS, _docs_ids, _q, _syn_text, _t, _wh60

def _uni_syn_spark(ids: Column) -> Column:
    """Synthetic multilingual text per id: two hash-picked snippets +
    a digit run (same md5 slices as the SQL twin)."""
    from route81_spark.ops.web import _h60

    def pick(seed):
        h = _h60(ids, seed)
        return F.element_at(
            F.array(*[F.lit(s) for s in U_SNIPS]), (h % 8 + 1).cast("int")
        )

    nr = (_h60(ids, "uni0|n") % 97).cast("string")
    return F.concat(pick("uni0|a"), F.lit(" "), pick("uni0|b"), F.lit(" nr "), nr)

def _uni_syn_sql(x: str = "CAST(doc_id AS VARCHAR)") -> str:
    lits = "[" + ", ".join("'" + s + "'" for s in U_SNIPS) + "]"

    def pick(seed):
        return f"({lits})[CAST({_wh60(seed, x)} % 8 AS INT) + 1]"

    return (
        f"{pick('uni0|a')} || ' ' || {pick('uni0|b')} || ' nr ' || "
        f"CAST({_wh60('uni0|n', x)} % 97 AS VARCHAR)"
    )

_U_SEP = r"[^\p{{L}}\p{{N}}]+"  # doubled braces: formatted into f-sql

@_q(
    "corpus_unicode_text",
    # oracle twin: DuckDB's native nfc_normalize + lower + the same
    # Unicode-category split regex (RE2 == Java semantics here); both
    # implement the frozen Unicode NFC spec, so bytes match exactly
    "WITH s AS (SELECT doc_id, " + _uni_syn_sql() + " AS raw FROM documents),\n"
    "     n AS (SELECT doc_id, raw, nfc_normalize(lower(raw)) AS norm FROM s),\n"
    "     t AS (SELECT doc_id, raw, norm,\n"
    f"            list_filter(string_split_regex(norm, '{_U_SEP.format()}'),"
    " x -> x <> '') AS toks FROM n)\n"
    "SELECT doc_id,\n"
    "       CAST(length(raw) AS BIGINT) AS pre_len,\n"
    "       CAST(length(norm) AS BIGINT) AS post_len,\n"
    "       CAST(len(toks) AS BIGINT) AS n_tokens,\n"
    "       toks[1] AS first_tok\n"
    "FROM t",
)
def corpus_unicode_text(spark, sf_dir):
    """Unicode normalize->tokenize over multilingual synthetic text:
    NFC composition (decomposed accents/jamo fold to precomposed —
    pre_len > post_len exactly where combining marks composed), Unicode
    lower, and any-script letter/number tokenization. NFC is the one
    Arrow-vectorized hop (no Spark builtin carries the composition
    tables); everything else is pure Column. Per-row map work — zero
    shuffle."""
    from route81_spark.ops.unitext import nfc_normalize, unicode_tokens

    docs = _docs_ids(spark, sf_dir)
    raw = _uni_syn_spark(F.col("doc_id"))
    out = docs.select(
        "doc_id",
        raw.alias("raw"),
        nfc_normalize(F.lower(raw)).alias("norm"),
    )
    toks = unicode_tokens(F.col("norm"))
    return out.select(
        "doc_id",
        F.length("raw").cast("long").alias("pre_len"),
        F.length("norm").cast("long").alias("post_len"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.get(toks, 0).alias("first_tok"),
    )

# diacritic-fold fixture pool: precomposed / decomposed / plain café
# spellings plus accented snippets from the verified strip_accents ==
# fold_diacritics agreement set (ops/unitext.py spec block)
D_SNIPS = [
    "café au lait",
    "café au lait",
    "cafe au lait",
    "naïve jalapeño salsa",
    "Dvořák žluťoučký",
    "ёлка и мир",
    "über Ångström",
    "nothing plain here",
]


def _d_syn_spark(ids: Column) -> Column:
    from route81_spark.ops.web import _h60

    def pick(seed):
        h = _h60(ids, seed)
        return F.element_at(
            F.array(*[F.lit(s) for s in D_SNIPS]), (h % 8 + 1).cast("int")
        )

    return F.concat(pick("dia0|a"), F.lit(" "), pick("dia0|b"))


def _d_syn_sql(x: str = "CAST(doc_id AS VARCHAR)") -> str:
    lits = "[" + ", ".join("'" + s + "'" for s in D_SNIPS) + "]"

    def pick(seed):
        return f"({lits})[CAST({_wh60(seed, x)} % 8 AS INT) + 1]"

    return f"{pick('dia0|a')} || ' ' || {pick('dia0|b')}"


@_q(
    "match_text_diacritics",
    # oracle twin: DuckDB strip_accents == ops.unitext.fold_diacritics
    # on the fixture charset (both = utf8proc STRIPMARK semantics:
    # Mn/Me marks removed, single-base precomposed chars folded);
    # membership + integer score recomputed from the folded tokens
    "WITH s AS (SELECT doc_id, " + _d_syn_sql() + " AS raw FROM documents),\n"
    "     n AS (SELECT doc_id, strip_accents(lower(raw)) AS norm FROM s),\n"
    "     t AS (SELECT doc_id,\n"
    f"            string_split_regex(norm, '{_U_SEP.format()}') AS toks FROM n)\n"
    "SELECT doc_id,\n"
    "       CAST(len(list_filter(toks, x -> x = 'cafe'))\n"
    "          + len(list_filter(toks, x -> x = 'uber')) AS BIGINT) AS score\n"
    "FROM t\n"
    "WHERE (list_contains(toks, 'cafe') OR list_contains(toks, 'uber'))\n"
    "  AND NOT coalesce(list_contains(toks, 'salsa'), false)",
)
def match_text_diacritics(spark, sf_dir):
    """$text with Mongo's DEFAULT diacritic folding: 'café'
    (precomposed), 'cafe'+U+0301 (decomposed), and plain 'cafe' all
    match the search term 'café', and the folded negation '-salsa'
    excludes the jalapeño rows. Folding is ONE pure-Column
    translate (ops.unitext.fold_diacritics) applied to text and query
    literals alike — per-row, shuffle-free, inside codegen."""
    docs = _docs_ids(spark, sf_dir)
    prepped = _syn_text(docs, _d_syn_spark(F.col("doc_id")), "doc_id")
    return apply_pipeline(
        prepped,
        [
            {"$match": {"$text": {
                "$search": "café über -salsa", "unicode": True,
            }}},
            {"$addFields": {"score": {"$meta": "textScore"}}},
            {"$project": {"doc_id": 1, "score": 1}},
        ],
    )


@_q(
    "match_text_unicode",
    # engine $text with {unicode: true} over NFC'd multilingual text;
    # oracle recomputes membership + integer score from the same split
    "WITH s AS (SELECT doc_id, " + _uni_syn_sql() + " AS raw FROM documents),\n"
    "     n AS (SELECT doc_id, nfc_normalize(lower(raw)) AS norm FROM s),\n"
    "     t AS (SELECT doc_id, norm,\n"
    f"            string_split_regex(norm, '{_U_SEP.format()}') AS toks FROM n)\n"
    "SELECT doc_id,\n"
    "       CAST(len(list_filter(toks, x -> x = 'café'))\n"
    "          + len(list_filter(toks, x -> x = 'über')) AS BIGINT) AS score\n"
    "FROM t\n"
    "WHERE (list_contains(toks, 'café') OR list_contains(toks, 'über'))\n"
    "  AND NOT coalesce(list_contains(toks, 'jamo'), false)",
)
def match_text_unicode(spark, sf_dir):
    """$text in Unicode mode: the engine extension {unicode: true}
    switches tokenization to Unicode letter/number runs, so 'café' and
    'über' (NFC, composed) match after upstream nfc_normalize — the
    ASCII tokenizer would shred them at the accents. Disjunctive terms
    + negation + integer textScore, per-row and shuffle-free."""
    from route81_spark.ops.unitext import nfc_normalize

    docs = _docs_ids(spark, sf_dir)
    raw = _uni_syn_spark(F.col("doc_id"))
    prepped = _syn_text(docs, nfc_normalize(F.lower(raw)), "doc_id")
    return apply_pipeline(
        prepped,
        [
            {"$match": {"$text": {
                "$search": "café über -jamo", "unicode": True,
            }}},
            {"$addFields": {"score": {"$meta": "textScore"}}},
            {"$project": {"doc_id": 1, "score": 1}},
        ],
    )
