"""Storage-layout operators: Z-order clustering and small-file
compaction — the table-maintenance half of running this engine against
100 TB of parquet.

Why it matters at scale: parquet readers prune row groups by min/max
statistics. A table sorted by one column skips well on that column
only; Z-ordering (Morton-interleaving the bits of several bucketed
columns) makes every file's bounding box small in ALL the interleaved
dimensions, so selective filters on any of them skip most files.
Delta/Iceberg expose the same operation as OPTIMIZE ... ZORDER BY.

The z-value here is a pure Column program over CALLER-SUPPLIED value
ranges (no sampling pass, rerun-stable, oracle-checkable); the layout
write is one range Exchange on the z-value plus an in-partition sort —
never a global ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Value -> integer cell in [0, 2^bits): linear scale over [lo, hi],
    clamped (out-of-range values land in the edge cells rather than
    corrupting the interleave)."""
    cells = 1 << bits
    scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(
        float(cells)
    )
    return F.least(
        F.lit(cells - 1), F.greatest(F.lit(0), F.floor(scaled).cast("long"))
    )


def morton_code(
    cols: list[Column], ranges: list[tuple[float, float]], bits: int = 8
) -> Column:
    """Z-order value: bucket each column to `bits` bits over its given
    (lo, hi) range and interleave the bits — dimension d contributes
    bit b to output position b*ndims + d, so nearby points in every
    dimension get nearby z-values. Pure integer/double expressions,
    whole-stage-codegen friendly, identical arithmetic in any engine
    (the DuckDB oracle replays it with SQL bit ops)."""
    if len(cols) != len(ranges):
        raise ValueError("one (lo, hi) range per column required")
    if not cols:
        raise ValueError("morton_code needs at least one column")
    for lo, hi in ranges:
        if not hi > lo:
            # a zero-width range divides by zero (ANSI abort) / NaNs
            raise ValueError(f"morton_code range must have hi > lo, got ({lo}, {hi})")
    nd = len(cols)
    cells = [_bucket(c, lo, hi, bits) for c, (lo, hi) in zip(cols, ranges)]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for d, cell in enumerate(cells):
            z = z + F.shiftleft(
                F.shiftright(cell, b).bitwiseAND(F.lit(1)), b * nd + d
            )
    return z


def morton_sql(exprs: list[str], ranges: list[tuple[float, float]], bits: int = 8) -> str:
    """The same z-value as ANSI/DuckDB SQL (for oracles and for pushing
    the layout key into engines that only speak SQL)."""
    nd = len(exprs)
    cells = []
    for e, (lo, hi) in zip(exprs, ranges):
        cells.append(
            f"least({(1 << bits) - 1}, greatest(0, CAST(floor(((CAST(({e}) AS DOUBLE))"
            f" - {float(lo)}) / {float(hi - lo)} * {float(1 << bits)}) AS BIGINT)))"
        )
    terms = [
        f"((({cell} >> {b}) & 1) << {b * nd + d})"
        for b in range(bits)
        for d, cell in enumerate(cells)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    ranges: list[tuple[float, float]],
    n_files: int,
    bits: int = 8,
) -> DataFrame:
    """Cluster `df` into `n_files` partitions by z-value: ONE range
    Exchange on the z-value plus an in-partition sort (no global
    ORDER BY — range partitioning samples boundaries, each partition
    sorts locally). Write the result with one file per partition and
    every file's min/max box is tight in all `cols`, so parquet
    row-group pruning works for filters on any of them."""
    z = morton_code([F.col(c) for c in cols], ranges, bits).alias("__z")
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def compact_small_files(
    spark,
    path: str,
    target_file_mb: int = 128,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction: rewrite a directory of many small files
    into ceil(total_size / target) right-sized ones. At 100 TB a
    streaming sink's per-trigger files degrade scans (open cost, tiny
    row groups, starved parallelism); periodic compaction is standard
    table maintenance. Coalesce, not repartition — merging files needs
    no shuffle. Returns the file count written.

    SCOPE: driver-local filesystem paths only. The size scan and the
    atomic-ish directory swap use os.walk/os.rename, which do not reach
    HDFS/S3; on an object-store table use a transactional table format
    (Delta/Iceberg OPTIMIZE) or route the rename through Hadoop
    FileSystem APIs. The swap is also not reader-atomic: a concurrent
    reader can observe a missing path for the instant between the two
    renames — schedule compaction in a maintenance window."""
    import math
    import os
    import shutil
    import tempfile

    df = spark.read.format(fmt).load(path)
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if not f.startswith(("_", "."))
    )
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    tmp = tempfile.mkdtemp(dir=os.path.dirname(os.path.abspath(path)))
    swap = path.rstrip("/") + ".__old__"
    # a crashed prior run can strand the swap dir; clear it or the
    # rename below fails ENOTEMPTY forever
    shutil.rmtree(swap, ignore_errors=True)
    try:
        df.coalesce(n).write.format(fmt).mode("overwrite").save(tmp)
        os.rename(path, swap)
        try:
            os.rename(tmp, path)
        except BaseException:
            # restore the original directory before surfacing the error:
            # readers must never find `path` missing
            os.rename(swap, path)
            raise
        shutil.rmtree(swap)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return n
