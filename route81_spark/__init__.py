"""route81_spark — a PySpark-native rebuild of the capabilities of
rwynn/route81 (MongoDB <-> Kafka CDC dataflow engine).

The reference (route81 v1.2.1, /root/reference/route81.go) delegates all
query evaluation to MongoDB via aggregation-pipeline JSON; this package
*executes* those pipelines on Spark by compiling them to Column /
DataFrame operations so Catalyst optimizes them (predicate pushdown,
column pruning, whole-stage codegen).

Layout:
  pipeline/   Mongo aggregation pipeline -> DataFrame compiler (SURVEY §2.B)
  model/      schemas: change events, envelopes, ops (SURVEY §1)
  envelope    producer envelope / key / headers / topic routing (P5-P7)
  codecs/     ext-JSON, plain-JSON, avro encode/decode (P8-P11)
  sources/    direct reads + change-event streams (P1-P2)
  sinks/      upsert/delete classifier + keyed merge (P13-P15)
  jobs/       producer / consumer / direct-read wiring (§3)
  ops/        training-data extensions: dedup, similarity, text, multimodal
"""

__version__ = "0.1.0"
