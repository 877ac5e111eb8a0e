"""Change-stream source (SURVEY §2 P1) — harness shape.

In production this is a CDC read (mongodb-spark-connector change stream
with fullDocument: updateLookup — /root/reference/README.md:303-304);
for the harness it is a deterministic derivation of MongoDB change
events from the `events` testdata table (FIXTURES.md F1 recipe):

  * every row            -> one `insert`   (phase 0)
  * event_id % 10 == 0   -> one `update`   (phase 1; value doubled,
                            props removed — updateDescription set)
  * event_id % 25 == 0   -> one `delete`   (phase 2; fullDocument null)

ordered by (phase, event_id) into clusterTime {t: phase, i: event_id} so
both Spark and the DuckDB oracle can reproduce the stream bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from route81_spark.io import load_table

CHANGE_EVENT_META = {"db": "test", "coll": "events"}


def synthetic_change_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch DataFrame of change events in the F1 schema. The streaming
    jobs read the same shape from a stream source; semantics are
    identical because the pipeline compiler is schema-driven."""
    ev = load_table(spark, sf_dir, "events")
    doc = F.struct(*[F.col(c) for c in ev.columns])
    key = F.struct(F.col("event_id").cast("string").alias("_id"))
    ns = F.struct(F.lit(CHANGE_EVENT_META["db"]).alias("db"), F.lit(CHANGE_EVENT_META["coll"]).alias("coll"))

    def cluster_time(phase: int):
        return F.struct(F.lit(phase).cast("long").alias("t"), F.col("event_id").cast("long").alias("i"))

    inserts = ev.select(
        F.lit("insert").alias("operationType"),
        cluster_time(0).alias("clusterTime"),
        ns.alias("ns"),
        key.alias("documentKey"),
        doc.alias("fullDocument"),
        F.lit(None)
        .cast("struct<updatedFields:map<string,string>,removedFields:array<string>>")
        .alias("updateDescription"),
    )

    updated_doc = F.struct(
        *[
            (F.col("value") * 2).alias("value") if c == "value"
            else F.lit(None).cast("string").alias("props") if c == "props"
            else F.col(c)
            for c in ev.columns
        ]
    )
    updates = ev.filter(F.col("event_id") % 10 == 0).select(
        F.lit("update").alias("operationType"),
        cluster_time(1).alias("clusterTime"),
        ns.alias("ns"),
        key.alias("documentKey"),
        updated_doc.alias("fullDocument"),
        F.struct(
            F.create_map(F.lit("value"), (F.col("value") * 2).cast("string")).alias("updatedFields"),
            F.array(F.lit("props")).alias("removedFields"),
        ).alias("updateDescription"),
    )

    deletes = ev.filter(F.col("event_id") % 25 == 0).select(
        F.lit("delete").alias("operationType"),
        cluster_time(2).alias("clusterTime"),
        ns.alias("ns"),
        key.alias("documentKey"),
        F.lit(None).cast(_struct_of(ev)).alias("fullDocument"),
        F.lit(None)
        .cast("struct<updatedFields:map<string,string>,removedFields:array<string>>")
        .alias("updateDescription"),
    )

    return inserts.unionByName(updates).unionByName(deletes)


def _struct_of(df: DataFrame) -> str:
    return df.schema.simpleString()
