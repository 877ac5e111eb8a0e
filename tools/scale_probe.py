"""Scale-up probe: time corpus ops at 1x and Kx the sf0.1 documents
table and print the wall-time ratios.

Usage: python tools/scale_probe.py [K] [op ...]   (default K=20, all ops)

The Kx corpus is K copies of the base table with disjoint doc_id
ranges — duplication preserves the near-dup variant structure (each
base cluster becomes a K-times-larger cluster), which makes dedup/
clustering *harder* than organic growth, so sublinear ratios here are
conservative evidence. A ratio well under K means fixed job overhead
amortizes and no stage degenerates super-linearly; a ratio near or
above K is a scale smell worth a plan audit.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from route81_spark.io import load_table  # noqa: E402
from route81_spark.session import get_spark  # noqa: E402


def scaled(docs: DataFrame, k: int) -> DataFrame:
    # stride past the real max id so copies have disjoint id ranges for
    # ANY base table — colliding ids would corrupt the hash-keyed ops
    # (mixture, shards) and fake exact-dup merges in dedup
    stride = (docs.agg(F.max("doc_id")).first()[0] or 0) + 1
    out = None
    for i in range(k):
        c = docs.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(i * stride)).cast("long")
        )
        out = c if out is None else out.unionByName(c)
    return out


def _time(fn, df: DataFrame) -> float:
    t0 = time.time()
    fn(df).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def ops() -> dict:
    from route81_spark.ops.corpus import (
        build_vocab,
        curate,
        encode_token_ids,
        lm_logprob_score,
        mixture_resample,
        remove_boilerplate,
    )
    from route81_spark.ops.dedup import near_dedup
    from route81_spark.ops.text import gopher_struct

    return {
        "vocab": lambda d: build_vocab(d, max_vocab=64),
        "token_ids": lambda d: encode_token_ids(d, build_vocab(d, max_vocab=64)),
        "lm_nll": lm_logprob_score,
        "boilerplate": lambda d: remove_boilerplate(d, window=4, max_docs=2),
        "mixture": lambda d: mixture_resample(
            d, "source", {"src0": 0.5, "src1": 0.3, "src2": 0.2}
        ),
        "gopher": lambda d: d.select(
            "doc_id", gopher_struct(F.col("text")).alias("g")
        ),
        "near_dedup": lambda d: near_dedup(d),
        "curate": curate,
    }


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    selected = set(sys.argv[2:])
    spark = get_spark("scale_probe")
    base = load_table(
        spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), "documents"
    ).persist()
    big = scaled(base, k).persist()
    n1, nk = base.count(), big.count()
    print(f"base={n1} rows, scaled={nk} rows (K={k})")
    for name, fn in ops().items():
        if selected and name not in selected:
            continue
        t1 = min(_time(fn, base) for _ in range(2))
        tk = _time(fn, big)
        print(f"{name:12s} 1x={t1:6.2f}s  {k}x={tk:7.2f}s  ratio={tk / t1:5.1f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
