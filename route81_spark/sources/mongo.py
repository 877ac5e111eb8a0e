"""Production MongoDB seam (P1/P2/P15 production path).

The reference is a live-Mongo daemon: dialMongo builds the client
(/root/reference/route81.go:1449-1460), mustConnect retries forever
unless fail-fast (route81.go:1563-1583), startReads opens change
streams + direct reads (route81.go:1585-1597), and the consumer sink
issues Replace/Delete-by-_id bulk writes (route81.go:1088-1116).

This module maps that wiring onto the public MongoDB Spark connector
v10 surface (format "mongodb"), behind the same config switch as the
real-Kafka seam: `mongo = "mongodb://..."` in the TOML turns it on;
empty (the sandbox default) keeps the parquet stand-ins. Everything
here *constructs* readers/writers — no connector jar ships in this
container, so construction is unit-tested and live integration is
skipped.

Mapping notes (all public connector options):
  * direct read      -> batch `spark.read.format("mongodb")`; the
    connector's partitioner subsumes direct-read-split-max (the
    reference's per-collection cursor fan-out cap).
  * change stream    -> `spark.readStream.format("mongodb")` with
    `change.stream.publish.full.document.only=false` so operationType /
    updateDescription survive (README.md:303-304: fullDocument
    updateLookup is `change.stream.lookup.full.document`).
  * consumer upserts -> `operationType=replace` + `idFieldList=_id`,
    the connector equivalent of NewReplaceOneModel+SetUpsert
    (route81.go:1094-1100). Connector batch writes cannot express
    deletes; route the delete partition through `delete_writer` (a
    pymongo bulk, gated behind an import-try like the reference's
    DeleteOneModel path, route81.go:1110-1116).
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from route81_spark.config import Config


def _split_namespace(namespace: str) -> tuple[str, str]:
    db, _, coll = namespace.partition(".")
    return db, coll


def mongo_read_options(cfg: Config, namespace: str) -> dict[str, str]:
    """Batch-read option set for one direct-read namespace."""
    db, coll = _split_namespace(namespace)
    return {
        "connection.uri": cfg.mongo_uri,
        "database": db,
        "collection": coll,
    }


def mongo_stream_options(cfg: Config, namespace: str) -> dict[str, str]:
    """Change-stream option set for one namespace. fullDocument
    updateLookup (README.md:303-304) + raw events so the producer sees
    operationType/updateDescription like gtm hands the reference."""
    opts = mongo_read_options(cfg, namespace)
    opts.update(
        {
            "change.stream.lookup.full.document": "updateLookup",
            "change.stream.publish.full.document.only": "false",
        }
    )
    return opts


def mongo_write_options(cfg: Config, namespace: str) -> dict[str, str]:
    """Upsert (replace-by-_id) writer options for the consumer sink —
    the connector form of the reference's ReplaceOneModel+SetUpsert
    bulk (route81.go:1088-1108)."""
    opts = mongo_read_options(cfg, namespace)
    opts.update({"operationType": "replace", "idFieldList": "_id"})
    return opts


def mongo_reader(spark: SparkSession, cfg: Config, namespace: str):
    """Configured batch DataFrameReader (call .load() against a live
    cluster)."""
    reader = spark.read.format("mongodb")
    for k, v in mongo_read_options(cfg, namespace).items():
        reader = reader.option(k, v)
    return reader


def mongo_stream_reader(spark: SparkSession, cfg: Config, namespace: str):
    """Configured streaming DataStreamReader for the change stream."""
    reader = spark.readStream.format("mongodb")
    for k, v in mongo_stream_options(cfg, namespace).items():
        reader = reader.option(k, v)
    return reader


def mongo_writer(df: DataFrame, cfg: Config, namespace: str):
    """Configured DataFrameWriter for the upsert partition of a
    micro-batch (call .save() against a live cluster)."""
    writer = df.write.format("mongodb").mode("append")
    for k, v in mongo_write_options(cfg, namespace).items():
        writer = writer.option(k, v)
    return writer


def delete_writer(cfg: Config, namespace: str) -> Callable[[list], None]:
    """Delete-by-_id bulk for a micro-batch's delete partition
    (route81.go:1110-1116 DeleteOneModel). The Spark connector has no
    batch delete, so this is the one place a direct client is needed;
    pymongo is not in this container, hence the import gate."""
    try:
        import pymongo  # noqa: F401
    except ImportError as e:  # pragma: no cover - sandbox has no pymongo
        raise NotImplementedError(
            "delete bulk requires pymongo (reference: route81.go:1110-1116); "
            "not shipped in this container"
        ) from e

    db, coll = _split_namespace(namespace)

    def apply(ids: list) -> None:  # pragma: no cover - live only
        client = pymongo.MongoClient(cfg.mongo_uri)
        try:
            client[db][coll].bulk_write(
                [pymongo.DeleteOne({"_id": i}) for i in ids], ordered=False
            )
        finally:
            client.close()

    return apply


def with_mongo_retry(fn: Callable[[], "DataFrame"], cfg: Config, delay_s: float = 1.0):
    """mustConnect's retry contract (route81.go:1563-1583): loop until
    the action succeeds, unless fail-fast — then the first error is
    fatal. Wrap the .load()/.save() call, not the builder."""
    while True:
        try:
            return fn()
        except Exception:
            if cfg.fail_fast:
                raise
            time.sleep(delay_s)
