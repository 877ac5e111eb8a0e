"""Shared harness infrastructure: the (QUERIES, ORACLES) registries,
the @_q registration decorator, table loading, and helpers used by
more than one domain module."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from collections.abc import Callable
from route81_spark.io import load_table

from collections.abc import Callable

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
_DOT = (
    "list_reduce(list_transform(range(1, 65),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
)
def _cos_sql(a: str, b: str) -> str:
    return (
        f"{_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)}))"
    )
def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return load_table(spark, sf_dir, table)

def _docs_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared narrow corpus source for the synthetic-text families:
    just doc_id, spread to the session's core budget. These queries
    hang ALL their per-row analyzer work (stemmer programs, diacritic
    folds, PSL chains, scoring) off this one scan, and the harness
    table is a single small parquet file — without the spread the
    entire heavy map stage serializes onto ONE scan task (guide §2.5
    input-skew: "one huge unsplittable file ... repartition
    immediately after the read"). ensure_parallelism's screen makes
    this a no-op wherever the scan already splits (any real corpus),
    so no constant is baked in: the target follows
    defaultParallelism."""
    from route81_spark.io import ensure_parallelism

    return ensure_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )

def _syn_text(docs: DataFrame, syn, *keep: str) -> DataFrame:
    """Bind a synthesized text column ONCE behind a 1-element explode.
    The Generate is an optimizer barrier that (a) keeps the heavy
    $match predicate ABOVE _docs_ids' round-robin spread — filters push
    through Repartition, and r14 measured the ENTIRE stemmer chain
    running as a DataFilter on the single-file scan task, serializing
    the whole map stage back onto one core — and (b) stops
    CollapseProject from inlining the synthesis expression separately
    into the filter and every scoring projection. Results are
    untouched: explode of a 1-element array is exactly one output row
    per input row (null included)."""
    from pyspark.sql import functions as _F

    return docs.select(
        *keep, _F.explode(_F.array(syn)).alias("text")
    )

_SH_SQL = (
    "list_distinct(list_transform(range(1, greatest(len(string_split_regex(trim(text),"
    " '\\s+')) - 2, 1) + 1), i -> array_to_string("
    "string_split_regex(trim(text), '\\s+')[i:i+2], ' ')))"
)

def _minhash_sql_expr(j: int) -> str:
    # mirror of ops.dedup.derived_hash: one md5 base, universal-hash seeds
    from route81_spark.ops.dedup import MINHASH_P, minhash_seed_params

    a, b = minhash_seed_params(j)
    base = "('0x' || substr(md5('0|' || s), 1, 15))::BIGINT"
    return (
        f"list_aggregate(list_transform(sh, s -> (({base} % {MINHASH_P}) * {a} + {b})"
        f" % {MINHASH_P}), 'min')"
    )

_TOKS = "string_split_regex(trim(text), '\\s+')"

def _use_tables(spark, sf_dir):
    from route81_spark.pipeline import compiler

    compiler.set_collection_resolver(lambda name: _t(spark, sf_dir, name))

_HTML_STEPS = [
    (r"\r\n?", "chr(10)"),
    (r"(?is)<script\b.*?</script\s*>|<style\b.*?</style\s*>|<head\b.*?</head\s*>",
     "' '"),
    (r"(?s)<!--.*?-->", "' '"),
    (r"(?i)</(p|div|li|tr|h[1-6])\s*>|<br\s*/?>", "chr(10)"),
    (r"(?s)<[^>]*>", "' '"),
    ("&nbsp;", "' '"),
    ("&lt;", "'<'"),
    ("&gt;", "'>'"),
    ("&quot;", "'\"'"),
    ("&#39;", "''''"),
    ("&amp;", "'&'"),
    (r"[ \t]+", "' '"),
    (r" ?\n ?", "chr(10)"),
    (r"\n{3,}", "chr(10)||chr(10)"),
    (r"^\s+|\s+$", "''"),
]

def _wh60(seed: str, x: str = "CAST(doc_id AS VARCHAR)") -> str:
    """DuckDB twin of ops.web._h60 (60-bit md5-slice hash)."""
    return f"('0x' || substr(md5('{seed}|' || {x}), 1, 15))::BIGINT"

def _wpick(options: str, h: str, n: int) -> str:
    """DuckDB twin of ops.web._pick: options[h % n] (1-based list)."""
    return f"({options})[CAST({h} % {n} AS INT) + 1]"

_W_SCHEME_RE = "'^([A-Za-z][A-Za-z0-9+.\\-]*)://'"

_W_TRACK_RE = "'^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=|$)'"

_W_SUFFIX_IN = (
    "('co.uk','org.uk','ac.uk','gov.uk','com.au','net.au','org.au',"
    "'co.jp','ne.jp','or.jp','com.br','co.in','co.nz','com.cn','com.mx')"
)

U_SNIPS = [
    "café du monde",                   # NFD -> café
    "über grüne äpfel",    # NFD -> über grüne äpfel
    "Ünified Über Text",           # precomposed Ü + case
    "ελληνικα γραμματα",  # greek
    "русский текст",  # russian
    "日本語 の テキスト",  # japanese
    "가 나 jamo",        # decomposed 가 나
    "plain ascii text",
]
