"""Unicode text layer (ops/unitext.py + $text unicode mode): NFC
composition unit cases, any-script tokenization, the
combining-marks-are-separators property that makes NFC-first
mandatory, and a hypothesis sweep against an independent pure-Python
spec twin built on unicodedata (category-walk tokenizer, stdlib
normalize)."""

from __future__ import annotations

import unicodedata

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from route81_spark.ops.unitext import (
    nfc_normalize,
    unicode_token_count,
    unicode_tokens,
)
from route81_spark.pipeline import apply_pipeline


def _eval(spark, texts, *cols):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    return df.select("t", *cols).collect()


def test_nfc_composes_decomposed_sequences(spark):
    cases = {
        "café": "café",                  # e + acute -> é
        "über": "über",                  # u + diaeresis -> ü
        "가": "가",                   # jamo -> 가
        "café": "café",                   # already NFC: identity
        "plain": "plain",
        "": "",
    }
    got = {
        r["t"]: r["n"]
        for r in _eval(spark, cases, nfc_normalize(F.col("t")).alias("n"))
    }
    for raw, want in cases.items():
        assert got[raw] == want, (raw.encode("unicode_escape"), got[raw])
    # NULL-safe
    df = spark.createDataFrame([(None,)], "t string")
    assert df.select(nfc_normalize(F.col("t")).alias("n")).first()["n"] is None


def test_unicode_tokens_any_script(spark):
    cases = {
        "café 42 über": ["café", "42", "über"],
        "русский, текст!": ["русский", "текст"],
        "日本語 の テキスト": ["日本語", "の", "テキスト"],
        "  spaced   out  ": ["spaced", "out"],
        "": [],
        "!!! ---": [],
    }
    got = {
        r["t"]: list(r["k"])
        for r in _eval(spark, cases, unicode_tokens(F.col("t")).alias("k"))
    }
    for raw, want in cases.items():
        assert got[raw] == want, (raw, got[raw])


def test_combining_marks_are_separators_until_nfc(spark):
    """The reason pipelines normalize FIRST: a combining mark (Mn) is
    not a letter, so the NFD form of 'café' tokenizes as ['cafe'] while
    its NFC form tokenizes as ['café']."""
    nfd = "café x"
    rows = _eval(
        spark,
        [nfd],
        unicode_tokens(F.col("t")).alias("raw_toks"),
        unicode_tokens(nfc_normalize(F.col("t"))).alias("nfc_toks"),
    )[0]
    assert list(rows["raw_toks"]) == ["cafe", "x"]
    assert list(rows["nfc_toks"]) == ["café", "x"]


def test_text_unicode_mode_matches_any_script(spark):
    """$text {unicode: true}: non-ASCII terms match whole Unicode
    tokens; the default ASCII tokenizer would shred them."""
    df = spark.createDataFrame(
        [
            (1, "café du monde"),
            (2, "café café bar"),
            (3, "cafe du parc"),
            (4, "русский текст"),
        ],
        "doc_id long, text string",
    )

    def run(search, **opts):
        return {
            r["doc_id"]: r["s"]
            for r in apply_pipeline(
                df,
                [
                    {"$match": {"$text": {"$search": search, **opts}}},
                    {"$addFields": {"s": {"$meta": "textScore"}}},
                    {"$project": {"doc_id": 1, "s": 1}},
                ],
            ).collect()
        }

    # Mongo's default folds diacritics: 'café' and 'cafe' docs both hit
    assert run("café", unicode=True) == {1: 1, 2: 2, 3: 1}
    # explicit sensitivity restores the accent distinction
    assert run("café", unicode=True,
               **{"$diacriticSensitive": True}) == {1: 1, 2: 2}
    assert run("текст", unicode=True) == {4: 1}
    # negation + disjunction still compose in unicode mode
    assert run("café текст -monde", unicode=True) == {2: 2, 3: 1, 4: 1}
    # the ASCII default folds café -> cafe, so it matches too (folding
    # happens BEFORE tokenization); Cyrillic still needs unicode
    assert run("café") == {1: 1, 2: 2, 3: 1}
    assert run("текст") == {}


# ------------------------------------------------------------------
# hypothesis sweep vs an independent spec twin: tokenizer = walk of
# unicodedata categories (L*/N* are token chars), normalize = stdlib
# ------------------------------------------------------------------

def ref_tokens(text: str) -> list[str]:
    out, cur = [], []
    for ch in text:
        if unicodedata.category(ch)[0] in ("L", "N"):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


_alphabet = st.sampled_from(
    list("ab1 .,!-") + ["é", "é"[1], "ü", "̈",
                        "α", "р", "日", "の",
                        "ᄀ", "ᅡ", "가"]
)
_texts = st.text(alphabet=_alphabet, min_size=0, max_size=24)


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None)
@given(texts=st.lists(_texts, min_size=1, max_size=24))
def test_unicode_ops_match_python_reference(spark, texts):
    rows = _eval(
        spark,
        dict.fromkeys(texts),  # dedup, keep order
        nfc_normalize(F.col("t")).alias("n"),
        unicode_tokens(F.col("t")).alias("k"),
        unicode_token_count(F.col("t")).alias("c"),
    )
    for r in rows:
        t = r["t"]
        assert r["n"] == unicodedata.normalize("NFC", t), t.encode(
            "unicode_escape"
        )
        want = ref_tokens(t)
        assert list(r["k"]) == want, (t.encode("unicode_escape"), r["k"], want)
        assert r["c"] == len(want)
