"""Extension pipeline stages (SURVEY §7 M5): the training-data ops
exposed through the same pipeline-JSON surface as the Mongo stages, so
a route81-style config can invoke them declaratively:

    [{"$dedupExact": {"textField": "text", "idField": "doc_id"}},
     {"$textAnalyze": {"textField": "text"}},
     {"$minhashLsh": {"textField": "text", "idField": "doc_id",
                      "k": 8, "bands": 2, "threshold": 0.5}},
     {"$similarityTopK": {"vecField": "embedding", "idField": "vec_id",
                          "queryModulo": 100, "k": 5}}]

Registered via pipeline.compiler.register_stage — unknown stages still
fail loudly at compile time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from route81_spark.ops import dedup as D
from route81_spark.ops import similarity as S
from route81_spark.ops import text as X
from route81_spark.pipeline.compiler import register_stage


def _dedup_exact(df: DataFrame, arg: dict) -> DataFrame:
    return D.exact_dedup(df, arg.get("textField", "text"), arg.get("idField", "doc_id"))


def _minhash_lsh(df: DataFrame, arg: dict) -> DataFrame:
    text_col = arg.get("textField", "text")
    id_col = arg.get("idField", "doc_id")
    pairs = D.lsh_candidates(
        df, text_col, id_col, k=int(arg.get("k", 16)), bands=int(arg.get("bands", 4))
    )
    return D.ngram_jaccard_pairs(
        df, pairs, text_col, id_col, threshold=float(arg.get("threshold", 0.0))
    )


def _simhash(df: DataFrame, arg: dict) -> DataFrame:
    text_col = arg.get("textField", "text")
    return df.withColumn(
        arg.get("as", "simhash"), D.simhash(F.col(text_col), int(arg.get("bits", 16)))
    )


def _text_analyze(df: DataFrame, arg: dict) -> DataFrame:
    return X.analyze(df, arg.get("textField", "text"))


def _similarity_topk(df: DataFrame, arg: dict) -> DataFrame:
    id_col = arg.get("idField", "vec_id")
    vec_col = arg.get("vecField", "embedding")
    queries = df.filter(
        F.col(id_col) % int(arg.get("queryModulo", 100)) == 0
    ).select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec"))
    fn = S.bucketed_topk if arg.get("approx") else S.brute_force_topk
    return fn(df, queries, k=int(arg.get("k", 5)), id_col=id_col, vec_col=vec_col)


register_stage("$dedupExact", _dedup_exact)
register_stage("$minhashLsh", _minhash_lsh)
register_stage("$simhash", _simhash)
register_stage("$textAnalyze", _text_analyze)
register_stage("$similarityTopK", _similarity_topk)
