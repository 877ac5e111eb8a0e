"""Mongo aggregation-pipeline -> Spark DataFrame compiler (SURVEY §2.B).

The reference ships pipeline stage arrays as opaque JSON to the MongoDB
server (/root/reference/route81.go:181-197, 268-282); here the same JSON
compiles to declarative DataFrame transformations so Catalyst performs
the pushdown/pruning MongoDB's planner would have done server-side.
"""

from route81_spark.pipeline.compiler import compile_pipeline, apply_pipeline
from route81_spark.pipeline.exprs import compile_expr
from route81_spark.pipeline.query import compile_match

__all__ = ["compile_pipeline", "apply_pipeline", "compile_expr", "compile_match"]
