"""Storage-layout ops: Morton z-values, z-order file locality, and
small-file compaction."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from route81_spark.ops.layout import (
    compact_small_files,
    morton_code,
    morton_sql,
    zorder_layout,
)


def test_morton_known_values(spark):
    # 2 dims, 2 bits, unit ranges over [0,4): cell == value
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 3)], "x int, y int"
    )
    out = df.select(
        "x", "y",
        morton_code([F.col("x"), F.col("y")], [(0, 4), (0, 4)], bits=2).alias("z"),
    )
    got = {(r["x"], r["y"]): r["z"] for r in out.collect()}
    # interleave: x contributes bits 0,2; y bits 1,3
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(1, 1)] == 3
    assert got[(3, 3)] == 15


def test_morton_clamps_out_of_range(spark):
    df = spark.createDataFrame([(-5.0, 99.0)], "x double, y double")
    z = df.select(
        morton_code([F.col("x"), F.col("y")], [(0, 4), (0, 4)], bits=2).alias("z")
    ).collect()[0]["z"]
    # x clamps to cell 0, y clamps to cell 3 -> z = interleave(0, 3) = 10
    assert z == 10


def test_morton_sql_matches_column_program(spark):
    df = spark.range(0, 500).select(
        (F.col("id") % 37).cast("double").alias("x"),
        ((F.col("id") * 7) % 53).cast("double").alias("y"),
    )
    df.createOrReplaceTempView("pts")
    ranges = [(0.0, 37.0), (0.0, 53.0)]
    a = df.select(morton_code([F.col("x"), F.col("y")], ranges).alias("z"))
    b = spark.sql(f"SELECT {morton_sql(['x', 'y'], ranges)} AS z FROM pts")
    assert sorted(r["z"] for r in a.collect()) == sorted(r["z"] for r in b.collect())


def test_zorder_layout_tightens_file_boxes(spark, tmp_path):
    """Every z-ordered file's bounding box must be small in BOTH
    dimensions vs the global range — the property parquet min/max
    pruning exploits."""
    # 16 files = 4 z-prefix bits fixed per file = both dims quartered
    # (8 files would only halve x: prefix bits go y,x,y — the bound
    # below is geometrically impossible then)
    n, files = 4096, 16
    df = spark.range(n).select(
        ((F.col("id") * 2654435761) % n).cast("double").alias("x"),
        ((F.col("id") * 40503) % n).cast("double").alias("y"),
    )
    out = str(tmp_path / "zt")
    zorder_layout(df, ["x", "y"], [(0, n), (0, n)], n_files=files).write.parquet(out)
    boxes = (
        spark.read.parquet(out)
        .withColumn("__file", F.input_file_name())
        .groupBy("__file")
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .collect()
    )
    assert len(boxes) >= files - 1
    # random layout would give dx ~= dy ~= n per file; z-order keeps the
    # average box well under half the range in both dims simultaneously
    avg_dx = sum(r["dx"] for r in boxes) / len(boxes)
    avg_dy = sum(r["dy"] for r in boxes) / len(boxes)
    assert avg_dx < n / 2 and avg_dy < n / 2


def test_compact_small_files(spark, tmp_path):
    p = str(tmp_path / "frag")
    spark.range(10_000).repartition(37).write.parquet(p)
    n_before = len([f for f in os.listdir(p) if f.endswith(".parquet")])
    assert n_before == 37
    written = compact_small_files(spark, p, target_file_mb=128)
    n_after = len([f for f in os.listdir(p) if f.endswith(".parquet")])
    assert written == n_after == 1
    assert spark.read.parquet(p).count() == 10_000


def test_morton_rejects_degenerate_range(spark):
    import pyspark.sql.functions as SF

    with pytest.raises(ValueError, match="hi > lo"):
        morton_code([SF.col("x")], [(5.0, 5.0)])
