"""Corpus-level curation ops: the compositions a training-data pipeline
runs after per-doc analysis — filter -> dedup -> split -> shard.

Everything here is built from the scale-safe primitives in ops.text /
ops.dedup (pure Column filters, hash aggs, bucketed joins) and adds the
three missing pieces:

  * curate():        quality/language/length gate + exact + near dedup
  * train_val_split: deterministic hash split (no rand(): re-runnable,
                     resume-safe, stable under repartition)
  * shard():         deterministic global shuffle into N training
                     shards — shard by hash, order within shard by a
                     second hash; at scale this is ONE hash-partition
                     exchange + an in-partition sort (no global sort)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from route81_spark.ops.dedup import near_dedup
from route81_spark.ops.text import lang_id, quality_score, token_count


def curate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.05,
    min_tokens: int = 5,
    max_tokens: int = 1_000_000,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """The standard curation funnel: language gate -> quality gate ->
    token-length gate -> exact dedup -> near dedup. The gates are pure
    per-row Column predicates (pushed ahead of the expensive dedup
    stages, so shingling/minhash only run on surviving rows)."""
    c = F.col(text_col)
    gated = df.filter(
        lang_id(c).isin(*langs)
        & (quality_score(c) >= min_quality)
        & token_count(c).between(min_tokens, max_tokens)
    )
    # the funnel scans its input several times (exact-dedup agg + semi
    # join, signature build); cache the gated rows so the three
    # tokenizing gate expressions run once, and release the cache after
    # near_dedup's checkpoint-materialized result no longer needs it
    gated = gated.persist()
    try:
        return near_dedup(
            gated, text_col, id_col, jaccard_threshold=jaccard_threshold
        )
    finally:
        gated.unpersist()


def split_hash(id_col: Column, seed: str) -> Column:
    """Deterministic [0,1) hash for split/shuffle decisions:
    first 15 md5 hex digits -> 60-bit int -> /2^60."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|"), id_col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("double")
    return h / F.lit(float(2**60))


def train_val_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_fraction: float = 0.1,
    seed: str = "split0",
) -> DataFrame:
    """Adds a `split` column ('train'/'val') decided by a deterministic
    hash of the id — unlike rand(), the assignment survives reruns,
    repartitioning, and incremental appends (a doc never flips sides)."""
    return df.withColumn(
        "split",
        F.when(split_hash(F.col(id_col), seed) < val_fraction, F.lit("val")).otherwise(
            F.lit("train")
        ),
    )


def shard(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "shuffle0",
) -> DataFrame:
    """Deterministic global shuffle into `n_shards` training shards:
    shard id = hash(id) mod N, position = rank of a second hash within
    the shard. Equivalent to a seeded random permutation, but stable and
    re-runnable. The plan is one hash Exchange on shard + an
    in-partition sort — never a global ORDER BY."""
    shard_col = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}|s|"), F.col(id_col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % n_shards
    )
    order_h = F.md5(F.concat(F.lit(f"{seed}|o|"), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy("__oh")
    return (
        df.withColumn("shard", shard_col.cast("int"))
        .withColumn("__oh", order_h)
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("__oh")
    )
