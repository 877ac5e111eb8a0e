"""Table loading with schema normalization.

The driver's `events` parquet carries TIMESTAMP(NANOS), which Spark's
vectorized parquet reader rejects (PARQUET_TYPE_ILLEGAL). We read nanos
as long (spark.sql.legacy.parquet.nanosAsLong — settable at runtime on
the driver-provided session) and truncate to microseconds, the precision
of Spark's TimestampType. Oracles must CAST the same column to
microsecond TIMESTAMP for value parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

NANO_TS_COLS = {"events": ["ts"]}


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition when the input has fewer partitions than
    cores — the harness tables are single parquet files, which would
    otherwise serialize every heavy per-row expression onto one task.
    At cluster scale inputs arrive with many partitions and this is a
    no-op (the condition, not the shuffle, is the point)."""
    if df.isStreaming:
        return df  # micro-batch partitioning is the source's concern
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        # cheap file-count screen: >= target input files means the scan
        # already splits enough, no need to build the RDD plan at all
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        pass
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name in NANO_TS_COLS:
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in NANO_TS_COLS.get(name, []):
        if c in df.columns and isinstance(df.schema[c].dataType, T.LongType):
            # integer `div`, not fp division: a double ns/1000 can round
            # across the µs boundary and drift one µs off the oracle's
            # integer truncation
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df
