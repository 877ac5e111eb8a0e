"""Direct-read source (SURVEY §2 P2).

The reference bulk-reads whole collections split into
<= direct-read-split-max (9) parallel segments, <= direct-read-concur
(4) collections at a time (/root/reference/route81.go:446-450,
1592-1593). In Spark the split maps to input partitions — parquet scans
already split by file/rowgroup, so we only *guarantee a floor* on
parallelism for small inputs; we never force a shuffle on big ones
(repartitioning a 100 TB scan to 9 partitions would be catastrophic —
the reference's knob is a per-collection *maximum* for MongoDB cursor
fan-out, which Spark's scheduler subsumes)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from route81_spark.io import ensure_parallelism


def direct_read(
    spark: SparkSession,
    path: str,
    min_partitions: int | None = None,
) -> DataFrame:
    df = spark.read.parquet(path)
    if min_partitions:
        # ensure_parallelism handles small-file bin-packing correctly
        # (file count alone over-estimates split count)
        df = ensure_parallelism(df, min_partitions)
    return df
