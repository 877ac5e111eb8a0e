"""Keyed upsert/delete merge sink (SURVEY §2 P15).

The reference buffers <= bulk-size docs / <= bulk-flush-duration and
issues one *unordered* BulkWrite of ReplaceOne(upsert)/DeleteOne models
(/root/reference/route81.go:1071-1131). Semantics to preserve:
whole-document replace (not patch), idempotent per-key last-writer-wins,
at-least-once safe (SURVEY §2.C).

Spark-first: the merge itself is a single DataFrame expression —
  new_state = latest-change-per-key  ⟂  (target anti-join changed-keys)
applied inside foreachBatch for streams or once for batch. At cluster
scale this becomes Delta `MERGE INTO` on the same (key, is_delete, doc)
shape; the parquet swap below is the dependency-free harness stand-in.
Per-key ordering under parallelism comes from ranking by `seq` within
each key — not from any global sort — so the plan is one hash shuffle
on the key, no matter how many executors.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def latest_per_key(changes: DataFrame, key: str = "doc_id", seq: str = "seq") -> DataFrame:
    """Collapse an at-least-once change feed to the last change per key.
    One shuffle on `key`; AQE handles skew."""
    w = Window.partitionBy(key).orderBy(F.col(seq).desc())
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes(
    target: DataFrame,
    changes: DataFrame,
    key: str = "doc_id",
    seq: str | None = "seq",
) -> DataFrame:
    """Pure merge: replace/delete-by-key (route81.go:1086-1098 semantics).

    `changes` columns: doc_id, is_delete, doc (struct matching target
    rows). Returns the new target state as a DataFrame of doc fields.
    """
    if seq is not None and seq in changes.columns:
        changes = latest_per_key(changes, key=key, seq=seq)
    upserts = changes.filter(~F.col("is_delete")).select("doc.*")
    changed_keys = changes.select(F.col("doc_id"))
    kept = target.join(changed_keys, target["_id"] == changed_keys["doc_id"], "left_anti")
    return kept.unionByName(upserts)


class KeyedParquetTable:
    """Mutable keyed table backed by a parquet directory with
    atomic-rename versioning — the harness stand-in for Delta MERGE /
    MongoDB bulk writes. Used from foreachBatch."""

    def __init__(self, spark: SparkSession, path: str, key: str = "_id"):
        self.spark = spark
        self.path = path
        self.key = key

    @property
    def _current(self) -> str:
        return os.path.join(self.path, "current")

    def exists(self) -> bool:
        return os.path.isdir(self._current)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self._current)

    def init(self, df: DataFrame) -> None:
        os.makedirs(self.path, exist_ok=True)
        df.write.mode("overwrite").parquet(self._current)

    def merge(self, changes: DataFrame, seq: str | None = "seq") -> None:
        """changes: doc_id, is_delete, doc struct (+ optional seq)."""
        new_state = apply_changes(self.read(), changes, seq=seq)
        tmp = os.path.join(self.path, "next")
        new_state.write.mode("overwrite").parquet(tmp)
        old = self._current
        swap = os.path.join(self.path, "prev")
        if os.path.isdir(swap):
            shutil.rmtree(swap)
        os.rename(old, swap)
        os.rename(tmp, old)
        shutil.rmtree(swap)
