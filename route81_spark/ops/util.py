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


def det_round_sql(expr: str, digits: int = 6) -> str:
    scale = float(10**digits)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
