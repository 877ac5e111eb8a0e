"""Cross-engine deterministic rounding.

Engine round() implementations disagree on doubles: Spark's F.round
converts the exact binary expansion to BigDecimal and rounds HALF_UP;
DuckDB multiplies by 10^s first (its own fp rounding) then nearbyints.
Values near a decimal half can round differently per engine, which
breaks value-hash comparisons.

floor(x * 10^s + 0.5) / 10^s uses only IEEE-exact deterministic ops
(multiply, add, floor, divide), so every engine produces bit-identical
results. This is round-half-up toward +inf — fine for score columns
where cross-engine determinism matters more than the tie direction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def det_round(col: Column, digits: int = 6) -> Column:
    scale = float(10**digits)
    return F.floor(col * scale + F.lit(0.5)) / scale


# ---------------------------------------------------------------------
# One-round-trip literal arrays.
#
# F.lit(seq) / F.array(*[F.lit(x) ...]) cost TWO Py4J gateway round
# trips PER ELEMENT; on this driver a round trip is ~0.5-5 ms, so a
# 16k-element bitmap literal burned ~33,000 calls ≈ seconds of pure
# driver latency per query CONSTRUCTION (measured, tools/py4j_count.py).
# Encoding the values into ONE string literal and splitting it is 3
# round trips total; split/cast of a foldable literal is itself
# foldable, so the optimizer's ConstantFolding collapses it to exactly
# the array Literal the per-element form produced — the executed plan
# is unchanged (verified: `element_at(split(lit(..)), 5)` optimizes to
# a plain literal).
# ---------------------------------------------------------------------

# Unit Separator: a control char that never occurs in stop lists,
# vocabulary fixtures, or rule tables (asserted per call — fall back to
# the per-element form on the first counterexample, never corrupt).
_LIT_SEP = "\x1f"


def lit_long_array(values) -> Column:
    """array<bigint> literal in O(1) gateway round trips."""
    vals = list(values)
    if not vals:
        return F.array().cast("array<bigint>")
    return F.split(
        F.lit(",".join(str(int(v)) for v in vals)), ","
    ).cast("array<bigint>")


def lit_string_array(values) -> Column:
    """array<string> literal in O(1) gateway round trips (empty
    strings round-trip fine; the separator itself must not occur)."""
    vals = [str(v) for v in values]
    if not vals:
        return F.array().cast("array<string>")
    if any(_LIT_SEP in v for v in vals):
        return F.array(*[F.lit(v) for v in vals])
    return F.split(F.lit(_LIT_SEP.join(vals)), _LIT_SEP)


def det_round_sql(expr: str, digits: int = 6) -> str:
    # the divisor must be a DOUBLE: `bigint / 1000000.0` parses the rhs
    # as DECIMAL(8,1) and produces DECIMAL(27,9) (floor() of a double
    # is BIGINT in Spark SQL) — a different column TYPE than the
    # Column-API det_round, surfacing as object-dtype in toPandas
    s = float(10**digits)
    return f"floor(({expr}) * {s} + 0.5) / cast({s} as double)"


def salted_join(
    big,
    small,
    on: str,
    salt: int = 16,
    how: str = "inner",
):
    """Skew-resistant equi-join: the big (skewed) side gets a
    deterministic per-row salt derived from a secondary hash of the
    whole row's key occurrence, the small side is replicated `salt`
    times, and the join runs on (key, salt) — one hot key spreads over
    `salt` reducer partitions instead of one straggler task.

    Use when AQE's runtime skew split cannot apply (e.g. the join
    feeds an operator that pins partitioning, or statistics hide the
    skew). `small` is replicated salt-fold, so keep it the dimension
    side. Deterministic: the salt is a hash of a monotonic row id
    substitute (the key + a crc of all columns) — no rand(), so reruns
    produce identical partitioning.

    At 100 TB this is the difference between a 2-hour straggler and
    even reducers; the cost is salt-fold replication of the small side
    (bounded: salt * |small|).

    Only big-side-preserving joins are supported (inner / left /
    left_semi / left_anti, any Spark spelling): the small side is
    replicated salt-fold, so right/full-outer would emit `salt` copies
    of every unmatched small-side row. left_anti stays correct — the
    replica set carries every (key, salt), so anti on (key, salt)
    equals anti on key. Known limitation: the salt is a hash of the
    whole big-side row, so EXACT-duplicate hot rows all land in one
    salt partition — dedupe-or-count duplicates first if the skew is
    duplicate-row-shaped rather than hot-key-shaped.
    """
    from pyspark.sql import DataFrame, functions as F

    assert isinstance(big, DataFrame) and isinstance(small, DataFrame)
    # normalize the way Spark's JoinType.apply does (casefold, drop _)
    norm = how.lower().replace("_", "")
    if norm not in ("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got "
            f"{how!r}: the small side is replicated per salt, so "
            "right/full-outer joins would duplicate unmatched small-side "
            "rows salt-fold"
        )
    # pmod, not abs(...)%: abs(Integer.MIN_VALUE) overflows (aborts the
    # job under ANSI; stays negative otherwise, silently dropping the
    # row from the inner join for non-power-of-two salt)
    big_salted = big.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt)).cast("int"),
    )
    small_rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = big_salted.join(small_rep, [on, "__salt"], how)
    return out.drop("__salt")


def bloom_semi_join(
    big,
    small,
    on: str,
    m_bits: int = 1 << 20,
    k: int = 3,
    seed: str = "bsj0",
    how: str = "inner",
):
    """Runtime-filter join (the Bloom semi-join reduction every big
    engine applies at scale): build a Bloom bitmap of the SMALL side's
    join keys — bounded at m/64 longs (128 KiB default) no matter how
    many keys — and prune the BIG side map-side BEFORE its shuffle,
    then run the exact join. Bloom filters have no false negatives, so
    the result is IDENTICAL to the plain join (the oracle is the plain
    join); false positives only cost a few extra shuffled rows.

    At 100 TB this is the difference between shuffling the whole fact
    table and shuffling ~the matching fraction: with a 1% selective
    dimension filter, ~99% of fact rows drop at the scan. Spark's own
    runtime row-group filters fire only under narrow conditions; this
    op makes the reduction explicit and unconditional.

    Only big-side-preserving joins (inner / left_semi): pruning big
    rows is invalid for left-outer (they must survive unmatched) and
    the small side is never pruned."""
    from pyspark.sql import DataFrame, functions as F

    assert isinstance(big, DataFrame) and isinstance(small, DataFrame)
    norm = how.lower().replace("_", "")
    if norm not in ("inner", "leftsemi", "semi"):
        raise ValueError(
            f"bloom_semi_join supports inner/left_semi, got {how!r}: "
            "pruning the big side drops rows an outer join must keep"
        )
    import numpy as np

    from route81_spark.ops.corpus import (
        _bloom_positions,
        bloom_dense_words,
        bloom_probe_expr,
    )

    key_pos = small.select(
        F.explode(
            _bloom_positions(F.col(on).cast("string"), m_bits, k, seed)
        ).alias("__p")
    )
    word = F.call_function("shiftright", F.col("__p"), F.lit(6))
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("long"), (F.col("__p") % 64).cast("int")
    )
    sparse = key_pos.groupBy(word.alias("word")).agg(F.bit_or(mask).alias("bits"))
    dense = bloom_dense_words(sparse, m_bits)  # bounded collect: <= m/64 rows
    lit_words = F.lit(np.asarray(dense, dtype=np.int64))
    probe = bloom_probe_expr(
        lit_words, F.col(on).cast("string"), m_bits, k, seed
    )
    return big.filter(probe).join(small, on, how)
