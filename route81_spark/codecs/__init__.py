"""Wire-format codecs (SURVEY §2 P8-P11).

ext-JSON / plain-JSON encoding are pure-Column, schema-driven
constructions (JVM-side, codegen'd) — the reference's reflection-based
Go codecs (/root/reference/encoding/encoding.go) become declarative
struct rebuilds + to_json here.
"""

from route81_spark.codecs.extjson import ext_json_col, ext_json_string
from route81_spark.codecs.plainjson import plain_json_col, plain_json_string

__all__ = ["ext_json_col", "ext_json_string", "plain_json_col", "plain_json_string"]
