"""Consumer-side root-path extraction + upsert/delete classifier
(SURVEY §2 P13-P14).

Reference semantics (/root/reference/route81.go:1019-1069,
README.md:332-338), with `document-root-path` and `delete-id-path`
compiled dotted-path expressions:

  * root value = doc re-rooted at document-root-path (default: whole doc)
  * a message is a DELETE iff the root value is missing/null, or is an
    object whose only populated key is `_id`
  * delete `_id` comes from delete-id-path, falling back to the root
    value's own `_id` (route81.go:1044-1069)
  * an upsert whose root has no extractable `_id` is an error counted
    as failed, batch continues (route81.go:1100-1116)

The reference evaluates gval path expressions per document; here both
paths compile to nested-Column access so the classifier is a pure
`when()` chain over a declared schema.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class ClassifierConfig:
    document_root_path: str | None = None  # e.g. "data"
    delete_id_path: str | None = None  # e.g. "meta._id"


# identifier-ish field names only: a name with spaces/operators/parens
# is full gval syntax, outside the supported subset -> loud error
_SEG = re.compile(r"^([\w$-]+)((?:\[\d+\])*)$")


def _parse_path(path: str) -> list[str | int]:
    """`data.items[0]._id` -> ["data", "items", 0, "_id"]. The reference
    compiles these with gval.Full() (route81.go:323-336); the subset a
    consumer config actually uses — and the documented contract here
    (README "Path expressions") — is dotted fields + [n] indexing, which
    maps 1:1 onto nested-Column access (both are 0-based). Anything
    outside that subset fails loudly at config-compile time, naming the
    supported syntax, instead of surfacing a cryptic segment error."""
    out: list[str | int] = []
    for part in path.split("."):
        m = _SEG.match(part)
        if not m:
            raise ValueError(
                f"unsupported path expression {path!r} (at segment {part!r}): "
                "document-root-path / delete-id-path accept dot-separated "
                "field names with optional [n] array indexes, e.g. "
                "'data.items[0]._id'. Full gval syntax (quoted keys, "
                "arithmetic, function calls) is not supported; restructure "
                "the path or pre-shape the document with a pipeline stage."
            )
        out.append(m.group(1))
        for idx in re.findall(r"\[(\d+)\]", m.group(2)):
            out.append(int(idx))
    return out


def _path_col(path: str) -> Column:
    segs = _parse_path(path)
    col = F.col(str(segs[0]))
    for s in segs[1:]:
        col = col.getItem(s) if isinstance(s, int) else col.getField(s)
    return col


def _root_type(schema: T.StructType, path: str | None) -> T.DataType:
    if path is None:
        return schema
    dt: T.DataType = schema
    for part in _parse_path(path):
        if isinstance(part, int):
            if not isinstance(dt, T.ArrayType):
                raise ValueError(f"path {path} indexes a non-array field")
            dt = dt.elementType
        else:
            if not isinstance(dt, T.StructType):
                raise ValueError(f"path {path} does not resolve to a struct field")
            dt = dt[part].dataType
    return dt


def classify(
    df: DataFrame, cfg: ClassifierConfig | None = None, keep: list[str] | None = None
) -> DataFrame:
    """Project a decoded-message DataFrame to `is_delete`, `doc_id`,
    `doc` (the re-rooted replacement document struct), plus any `keep`
    passthrough columns (e.g. a kafka offset for per-key ordering)."""
    cfg = cfg or ClassifierConfig()
    keep = [c for c in (keep or []) if c in df.columns]
    if cfg.document_root_path:
        root = _path_col(cfg.document_root_path)
        root_type = _root_type(df.schema, cfg.document_root_path)
    else:
        # whole-message root: transport passthrough columns (kafka seq)
        # are NOT part of the document — folding them in would corrupt
        # the replacement doc and break id-only delete detection
        doc_cols = [c for c in df.columns if c not in set(keep)]
        root = F.struct(*[F.col(c) for c in doc_cols])
        root_type = T.StructType([df.schema[c] for c in doc_cols])

    if not isinstance(root_type, T.StructType):
        raise ValueError("document root must be a struct")

    non_id_fields = [f.name for f in root_type.fields if f.name != "_id"]
    id_only = F.lit(True)
    for f in non_id_fields:
        id_only = id_only & root.getField(f).isNull()

    is_delete = root.isNull() | id_only

    delete_id = (
        _path_col(cfg.delete_id_path)
        if cfg.delete_id_path
        else root.getField("_id") if "_id" in root_type.fieldNames() else F.lit(None)
    )
    upsert_id = root.getField("_id") if "_id" in root_type.fieldNames() else F.lit(None)

    doc_id = F.when(is_delete, delete_id).otherwise(upsert_id)
    return df.select(
        is_delete.alias("is_delete"),
        doc_id.cast("string").alias("doc_id"),
        root.alias("doc"),
        *[F.col(c) for c in keep],
    )
