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
`when()` chain over a declared schema. delete-id-path additionally
compiles the gval OPERATOR subset (arithmetic, comparisons, logical,
ternary, string concat — sinks/gvalexpr.py) for composite/derived ids,
matching the gval.Full surface route81 hands a config
(route81.go:323-336) minus functions, which no route81 config can call
either (none are registered).
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


# bare identifier-ish field names; anything else must use ["..."]
_IDENT = re.compile(r"[\w$-]+")
_INDEX = re.compile(r"\[(\d+)\]")


def _path_error(path: str, at: int, why: str) -> ValueError:
    return ValueError(
        f"unsupported path expression {path!r} (at offset {at}: {why}): "
        "document-root-path / delete-id-path accept dot-separated field "
        "names, [n] array indexes, and [\"quoted keys\"] for names with "
        "dots/spaces, e.g. 'data.items[0][\"weird.key\"]._id'. "
        "delete-id-path additionally accepts the gval operator subset "
        "(arithmetic, comparisons, logical, ternary, string concat — "
        "sinks/gvalexpr.py); function calls and dynamic subscripts are "
        "not supported anywhere — pre-shape the document with a "
        "pipeline stage."
    )


def _parse_path(path: str) -> list[str | int]:
    """`data.items[0]["weird.key"]._id` -> ["data", "items", 0,
    "weird.key", "_id"]. The reference compiles these with gval.Full()
    (route81.go:323-336); the subset a consumer config actually uses —
    and the documented contract here (README "Path expressions") — is
    dotted fields + [n] indexing + gval's ["..."]/['...'] selector for
    keys that aren't bare identifiers (dots, spaces, operators), all of
    which map 1:1 onto nested-Column access (indexes 0-based on both
    sides). Anything outside that subset fails loudly at config-compile
    time, naming the supported syntax, instead of surfacing a cryptic
    segment error."""
    out: list[str | int] = []
    i, n = 0, len(path)
    need_field = True  # a bare identifier is only legal at start / after '.'
    while i < n:
        c = path[i]
        if c == ".":
            if need_field:
                raise _path_error(path, i, "empty segment")
            i += 1
            need_field = True
            continue
        if c == "[":
            if need_field and out:
                raise _path_error(path, i, "'[' directly after '.'")
            if i + 1 < n and path[i + 1] in "\"'":
                # char-by-char scan so backslashes can escape themselves:
                # a find()-based scan treated ANY backslash before the
                # closing quote as escaping it, making a key that ENDS in
                # a backslash (["a\\"]) unparseable and leaving '\\'
                # sequences unescaped. Here \<quote> -> quote, \\ -> \,
                # and any other backslash is literal (gval-compatible).
                q = path[i + 1]
                buf: list[str] = []
                j = i + 2
                while j < n and path[j] != q:
                    if path[j] == "\\" and j + 1 < n and path[j + 1] in (q, "\\"):
                        buf.append(path[j + 1])
                        j += 2
                    else:
                        buf.append(path[j])
                        j += 1
                if j >= n or j + 1 >= n or path[j + 1] != "]":
                    raise _path_error(path, i, "unterminated quoted key")
                key = "".join(buf)
                if not key:
                    raise _path_error(path, i, "empty quoted key")
                out.append(key)
                i = j + 2
            else:
                m = _INDEX.match(path, i)
                if not m:
                    raise _path_error(path, i, "expected [n] or [\"key\"]")
                if not out:
                    # a root-level [n] would silently become F.col("0")
                    raise _path_error(path, i, "path cannot start with an index")
                out.append(int(m.group(1)))
                i = m.end()
            need_field = False
            continue
        m = _IDENT.match(path, i)
        if not m or not need_field:
            raise _path_error(path, i, f"unexpected {c!r}")
        out.append(m.group(0))
        i = m.end()
        need_field = False
    if need_field:
        raise _path_error(path, n, "empty segment" if out else "empty path")
    return out


def _path_col(path: str) -> Column:
    segs = _parse_path(path)
    first = str(segs[0])
    # a quoted first segment may contain dots (or backticks) — backtick
    # it, doubling embedded backticks, so F.col doesn't parse it as
    # nested access (getField below is exact-name)
    escaped = first.replace("`", "``")
    col = F.col(first if _IDENT.fullmatch(first) else f"`{escaped}`")
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


def _delete_id_col(schema: T.StructType, path: str) -> Column:
    """delete-id-path compiler: the plain-path fast lane (and its richer
    path diagnostics) when the config is just a path, else the bounded
    gval operator subset (sinks/gvalexpr.py) — composite ids like
    `meta.region + "-" + meta.id` compile to one Column expression, as
    the reference's gval.Full evaluable does per document
    (route81.go:323-336)."""
    from route81_spark.sinks.gvalexpr import compile_gval

    try:
        # plain contract first: it admits field names the expression
        # lexer must treat as operators (leading '-', leading digits),
        # so every previously-valid config compiles unchanged
        return _path_col(path)
    except ValueError:
        pass

    def resolve(segs: list) -> tuple[Column, T.DataType | None]:
        first = str(segs[0])
        escaped = first.replace("`", "``")
        col = F.col(first if _IDENT.fullmatch(first) else f"`{escaped}`")
        dt: T.DataType | None = schema
        # positional, not by-value: a later segment EQUAL to the root
        # name (`a.a`, `a[0].a`) must still descend, not alias the root
        for i, s in enumerate([first, *segs[1:]]):
            if i > 0:
                col = col.getItem(s) if isinstance(s, int) else col.getField(s)
            if dt is None:
                continue
            if isinstance(s, int):
                dt = dt.elementType if isinstance(dt, T.ArrayType) else None
            else:
                dt = (dt[s].dataType
                      if isinstance(dt, T.StructType) and s in dt.fieldNames()
                      else None)
        return col, dt

    return compile_gval(path, resolve)


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
        _delete_id_col(df.schema, cfg.delete_id_path)
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
