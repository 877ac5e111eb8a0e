"""File-based corpus ingestion (extension source for the training-data
pipeline): schema-on-read JSONL — the format raw text corpora actually
arrive in — with explicit corrupt-record accounting.

Implementation: text source + from_json, NOT spark.read.json. The JSON
file source forbids any query whose required schema is only the
internal corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_
CORRUPT_RECORD_COLUMN), which breaks exactly the corrupt-side
projections an ingest monitor needs unless the whole scan is cached;
parsing explicitly keeps every projection legal with zero caching.

Scale contract: the schema is DECLARED, never inferred (inference reads
the whole input twice at 100 TB and races appends); gzip splits are
handled by Spark's file source natively (.jsonl.gz just works, though
gzip is non-splittable — one task per file, so shard the input into
many files upstream). Corrupt lines are not dropped silently: they
surface in a side output with the raw line preserved — the same
not-silently-lossy stance as the consumer's partial-failure accounting
(route81.go:1100-1116).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt"


def _parse_lines(lines: DataFrame, doc_schema: T.StructType) -> DataFrame:
    """Shared parse/normalize projection for the batch and streaming
    readers (one contract, one implementation)."""
    if CORRUPT_COL in doc_schema.fieldNames():
        raise ValueError(f"doc_schema must not define {CORRUPT_COL!r}")
    parse_schema = T.StructType(
        list(doc_schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = lines.filter(F.trim(F.col("value")) != "").select(
        F.col("value"),
        F.from_json(
            F.col("value"),
            parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("__doc"),
    )
    # from_json yields a NULL struct (rather than a corrupt-filled one)
    # for some unparseable inputs — normalize both failure shapes into
    # the corrupt column so downstream sees ONE contract
    corrupt = F.when(
        F.col("__doc").isNull() | F.col(f"__doc.{CORRUPT_COL}").isNotNull(),
        F.col("value"),
    )
    return parsed.select(
        *[
            F.when(corrupt.isNull(), F.col(f"__doc.{f.name}")).alias(f.name)
            for f in doc_schema.fields
        ],
        corrupt.alias(CORRUPT_COL),
    )


def read_jsonl_corpus(
    spark: SparkSession, path: str, doc_schema: T.StructType
) -> DataFrame:
    """JSONL read against a declared schema: parseable lines fill the
    document fields; unparseable lines (bad JSON, or JSON that is not
    an object) land whole in `_corrupt` with every document field null.
    Blank lines are skipped (they are separators, not records)."""
    return _parse_lines(spark.read.text(path), doc_schema)


def read_jsonl_corpus_stream(
    spark: SparkSession, path: str, doc_schema: T.StructType
) -> DataFrame:
    """Streaming form of read_jsonl_corpus for a drop-directory intake
    (new JSONL files appear, micro-batches pick them up): identical
    parse/corrupt contract, so split_corrupt and the curation gates
    compose unchanged — feed it to ops.streaming.streaming_curate."""
    return _parse_lines(spark.readStream.text(path), doc_schema)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, bad): good = parsed documents without the corrupt column;
    bad = (raw) original lines that failed to parse. Independent lazy
    plans — each side's filter pushes into its own scan; no caching."""
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return good, bad


def ingest_stats(df: DataFrame) -> dict:
    """One-pass (parsed, corrupt) line counts for ingest monitoring —
    the counters a daily-drop loader alerts on."""
    row = df.select(
        F.count(F.lit(1)).alias("total"),
        F.count(F.col(CORRUPT_COL)).alias("corrupt"),
    ).collect()[0]
    return {
        "total": int(row["total"]),
        "corrupt": int(row["corrupt"]),
        "parsed": int(row["total"] - row["corrupt"]),
    }


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    doc_schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV corpus read with the same corrupt-record contract as the
    JSONL reader: declared schema (never inferred), malformed rows
    surfaced whole in `_corrupt` with document fields null.

    Built as text + from_csv (like the JSONL reader) so corrupt-side
    projections stay legal — the native CSV source forbids queries
    whose pruned schema is only the corrupt column. Quoting/escaped
    separators within a line are handled by from_csv; MULTILINE quoted
    fields are not — deliberately: multiline CSV defeats file
    splitting (one task per file at 100 TB), so corpora should not
    ship that way. Header lines (exact schema header, any file) are
    dropped when header=True."""
    if CORRUPT_COL in doc_schema.fieldNames():
        raise ValueError(f"doc_schema must not define {CORRUPT_COL!r}")
    parse_schema = T.StructType(
        list(doc_schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    lines = spark.read.text(path).filter(F.trim(F.col("value")) != "")
    if header:
        header_line = sep.join(f.name for f in doc_schema.fields)
        lines = lines.filter(F.col("value") != header_line)
    parsed = lines.select(
        F.col("value"),
        F.from_csv(
            F.col("value"),
            parse_schema.simpleString(),
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL, "sep": sep},
        ).alias("__doc"),
    )
    corrupt = F.when(
        F.col("__doc").isNull() | F.col(f"__doc.{CORRUPT_COL}").isNotNull(),
        F.col("value"),
    )
    return parsed.select(
        *[
            F.when(corrupt.isNull(), F.col(f"__doc.{f.name}")).alias(f.name)
            for f in doc_schema.fields
        ],
        corrupt.alias(CORRUPT_COL),
    )
