"""Embedding similarity: brute-force/bucketed/IVF/IVFPQ/int8/matryoshka top-k, kNN graph, projections, sampling, triplets, semantic dedup."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from route81_spark.ops import similarity as S
from route81_spark.ops.util import det_round_sql
from route81_spark.pipeline import apply_pipeline
from ._shared import _cos_sql, _q, _t

@_q(
    "sim_ivf",
    f"""
    WITH c AS (
      SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < 16
    ),
    assign AS (
      SELECT vec_id, embedding, centroid_id FROM (
        SELECT e.vec_id, e.embedding, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY floor(({_cos_sql('e.embedding', 'c.cv')}) * 1000000.0 + 0.5) / 1000000.0 DESC,
                          c.centroid_id ASC) AS rn
        FROM embeddings e CROSS JOIN c
      ) WHERE rn = 1
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS qv, centroid_id
      FROM assign WHERE vec_id % 100 = 0
    ),
    scored AS (
      SELECT q.query_id, a.vec_id,
             floor(({_cos_sql('a.embedding', 'q.qv')}) * 1000000.0 + 0.5) / 1000000.0 AS score
      FROM assign a JOIN q USING (centroid_id)
    )
    SELECT query_id, vec_id, score, rank FROM (
      SELECT query_id, vec_id, score,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id ASC) AS INT) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def sim_ivf(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return S.ivf_topk(emb, queries, centroids, k=5)

@_q(
    "sim_ivf_nprobe",
    f"""
    WITH c AS (
      SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < 16
    ),
    assign AS (
      SELECT vec_id, embedding, centroid_id FROM (
        SELECT e.vec_id, e.embedding, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY floor(({_cos_sql('e.embedding', 'c.cv')}) * 1000000.0 + 0.5) / 1000000.0 DESC,
                          c.centroid_id ASC) AS rn
        FROM embeddings e CROSS JOIN c
      ) WHERE rn = 1
    ),
    q0 AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0
    ),
    probe AS (
      SELECT query_id, qv, centroid_id FROM (
        SELECT q0.query_id, q0.qv, c.centroid_id,
               row_number() OVER (
                 PARTITION BY q0.query_id
                 ORDER BY floor(({_cos_sql('q0.qv', 'c.cv')}) * 1000000.0 + 0.5) / 1000000.0 DESC,
                          c.centroid_id ASC) AS rn
        FROM q0 CROSS JOIN c
      ) WHERE rn <= 2
    ),
    scored AS (
      SELECT p.query_id, a.vec_id,
             floor(({_cos_sql('a.embedding', 'p.qv')}) * 1000000.0 + 0.5) / 1000000.0 AS score
      FROM assign a JOIN probe p USING (centroid_id)
    )
    SELECT query_id, vec_id, score, rank FROM (
      SELECT query_id, vec_id, score,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id ASC) AS INT) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def sim_ivf_nprobe(spark, sf_dir):
    # nprobe=2: each query scans its two closest cells — the recall/cost
    # knob of the two-level IVF scheme
    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return S.ivf_topk(emb, queries, centroids, k=5, nprobe=2)

_VS_QUERY = [0.1 * ((i * 7) % 13 - 6) for i in range(64)]

@_q(
    "vector_search_stage",
    f"""
    WITH q AS (SELECT [{', '.join(f'{x!r}' for x in _VS_QUERY)}] AS qv),
    scored AS (
      SELECT e.vec_id, e.label,
             {det_round_sql(
                 '(1 + (' + _cos_sql('e.embedding', 'q.qv') + ')) / 2'
             )} AS score
      FROM embeddings e, q
      WHERE e.label % 2 = 0
    )
    SELECT vec_id, label, score FROM scored
    ORDER BY score DESC, vec_id ASC LIMIT 10
    """,
)
def vector_search_stage(spark, sf_dir):
    """$vectorSearch (Atlas dialect) with pre-filter + $meta score
    projection, compiled to map-side cosine + global top-k."""
    return apply_pipeline(
        _t(spark, sf_dir, "embeddings"),
        [
            {
                "$vectorSearch": {
                    "index": "default",
                    "path": "embedding",
                    "queryVector": _VS_QUERY,
                    "numCandidates": 200,
                    "limit": 10,
                    "filter": {"$expr": {"$eq": [{"$mod": ["$label", 2]}, 0]}},
                    "tieBreaker": "vec_id",
                }
            },
            {
                "$project": {
                    "vec_id": 1,
                    "label": 1,
                    "score": {"$meta": "vectorSearchScore"},
                }
            },
        ],
    )

@_q(
    "sim_topk",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id % 100 = 0
    ),
    scored AS (
      SELECT q.query_id, e.vec_id,
             floor(({_cos_sql('e.embedding', 'q.qv')}) * 1000000.0 + 0.5) / 1000000.0 AS score
      FROM embeddings e CROSS JOIN q
    ),
    ranked AS (
      SELECT query_id, vec_id, score,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id ASC) AS INT) AS rank
      FROM scored
    )
    SELECT * FROM ranked WHERE rank <= 5
    """,
)
def sim_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return S.brute_force_topk(emb, queries, k=5)

@_q(
    "sim_pq",
    # Full SQL replica of the deterministic-PQ pipeline: seeded codebook
    # (centroids = the 16 lowest-id vectors, zero k-means iterations),
    # normalized components quantized at 1e-9, every distance a
    # left-fold — so encode -> ADC -> candidate ranking -> exact-cosine
    # refine are bit-identical between numpy and DuckDB. The k-means
    # path keeps its pytest recall pins; this registry configuration is
    # the oracle-checked one.
    f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    n0 AS (
      SELECT vec_id, v,
             greatest(sqrt(list_reduce(list_transform(v, y -> y*y), (a,b) -> a+b)), 1e-12) AS nrm
      FROM e
    ),
    n AS (
      SELECT vec_id,
             list_transform(v, x -> floor(x / nrm * 1000000000.0 + 0.5) / 1000000000.0) AS nv
      FROM n0
    ),
    cents AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS c, nv
      FROM (SELECT vec_id, nv FROM n ORDER BY vec_id LIMIT 16)
    ),
    cent_sub AS (
      SELECT c, sp.range AS s, nv[(sp.range*4+1):(sp.range*4+4)] AS cv
      FROM cents, range(16) sp
    ),
    vsub AS (
      SELECT vec_id, sp.range AS s, nv[(sp.range*4+1):(sp.range*4+4)] AS sv
      FROM n, range(16) sp
    ),
    code1 AS (
      SELECT vec_id, s, c FROM (
        SELECT v.vec_id, v.s, cs.c,
               row_number() OVER (
                 PARTITION BY v.vec_id, v.s
                 ORDER BY list_reduce(list_transform(range(1,5),
                            j -> (v.sv[j]-cs.cv[j])*(v.sv[j]-cs.cv[j])), (a,b) -> a+b) ASC,
                          cs.c ASC
               ) AS rn
        FROM vsub v JOIN cent_sub cs USING (s)
      ) WHERE rn = 1
    ),
    qsub AS (
      SELECT vec_id AS query_id, sp.range AS s,
             nv[(sp.range*4+1):(sp.range*4+4)] AS qv
      FROM n, range(16) sp WHERE vec_id % 100 = 0
    ),
    qtab AS (
      SELECT query_id, s, c,
             list_reduce(list_transform(range(1,5),
               j -> (qv[j]-cv[j])*(qv[j]-cv[j])), (a,b) -> a+b) AS qd2
      FROM qsub JOIN cent_sub USING (s)
    ),
    adc AS (
      SELECT t.query_id, cd.vec_id,
             floor(list_reduce(list(t.qd2 ORDER BY t.s), (a,b) -> a+b) * 1000000.0 + 0.5)
               / 1000000.0 AS dist6
      FROM code1 cd JOIN qtab t ON t.s = cd.s AND t.c = cd.c
      GROUP BY t.query_id, cd.vec_id
    ),
    cand AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                    ORDER BY dist6 ASC, vec_id ASC) AS rn
        FROM adc
      ) WHERE rn <= 50
    ),
    scored AS (
      SELECT c.query_id, c.vec_id,
             floor(({_cos_sql('e.embedding', 'qe.embedding')}) * 1000000.0 + 0.5)
               / 1000000.0 AS score
      FROM cand c
      JOIN embeddings e ON e.vec_id = c.vec_id
      JOIN embeddings qe ON qe.vec_id = c.query_id
    ),
    ranked AS (
      SELECT query_id, vec_id, score,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id ASC) AS INT) AS rank
      FROM scored
    )
    SELECT * FROM ranked WHERE rank <= 5
    """,
)
def sim_pq(spark, sf_dir):
    """Product-quantization ANN with exact re-ranking (compressed-domain
    retrieve -> cosine refine) — the 32x-compression scale path. The
    registry runs the deterministic configuration (prefix-seeded
    codebook, iters=0, 1e-9 quantization) so the whole pipeline is
    DuckDB-oracle-checked end to end; k-means training quality stays
    pinned by the pytest recall tests."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    books = S.pq_train_codebook(
        emb, m=16, ksub=16, sample=16, iters=0, init="prefix", det_quantize=9
    )
    return S.pq_refined_topk(emb, queries, books, k=5, refine=10, det_quantize=9)

@_q(
    "sim_ivfpq",
    # composed replica: sim_ivf's assignment + nprobe=2 probe CTEs
    # restrict sim_pq's encode -> ADC -> refine to each query's probed
    # cells. Every arithmetic shape (cosine folds, 1e-9 normalized
    # quantization, ordered qd2 fold, tie-break ranks) is identical to
    # the two already-green parents.
    f"""
    WITH c AS (
      SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < 16
    ),
    assign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT e0.vec_id, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e0.vec_id
                 ORDER BY floor(({_cos_sql('e0.embedding', 'c.cv')}) * 1000000.0 + 0.5) / 1000000.0 DESC,
                          c.centroid_id ASC) AS rn
        FROM embeddings e0 CROSS JOIN c
      ) WHERE rn = 1
    ),
    q0 AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
    probe AS (
      SELECT query_id, centroid_id FROM (
        SELECT q0.query_id, c.centroid_id,
               row_number() OVER (
                 PARTITION BY q0.query_id
                 ORDER BY floor(({_cos_sql('q0.qv', 'c.cv')}) * 1000000.0 + 0.5) / 1000000.0 DESC,
                          c.centroid_id ASC) AS rn
        FROM q0 CROSS JOIN c
      ) WHERE rn <= 2
    ),
    e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    n0 AS (
      SELECT vec_id, v,
             greatest(sqrt(list_reduce(list_transform(v, y -> y*y), (a,b) -> a+b)), 1e-12) AS nrm
      FROM e
    ),
    n AS (
      SELECT vec_id,
             list_transform(v, x -> floor(x / nrm * 1000000000.0 + 0.5) / 1000000000.0) AS nv
      FROM n0
    ),
    cents AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cc, nv
      FROM (SELECT vec_id, nv FROM n ORDER BY vec_id LIMIT 16)
    ),
    cent_sub AS (
      SELECT cc, sp.range AS s, nv[(sp.range*4+1):(sp.range*4+4)] AS csv
      FROM cents, range(16) sp
    ),
    vsub AS (
      SELECT vec_id, sp.range AS s, nv[(sp.range*4+1):(sp.range*4+4)] AS sv
      FROM n, range(16) sp
    ),
    code1 AS (
      SELECT vec_id, s, cc FROM (
        SELECT v.vec_id, v.s, cs.cc,
               row_number() OVER (
                 PARTITION BY v.vec_id, v.s
                 ORDER BY list_reduce(list_transform(range(1,5),
                            j -> (v.sv[j]-cs.csv[j])*(v.sv[j]-cs.csv[j])), (a,b) -> a+b) ASC,
                          cs.cc ASC
               ) AS rn
        FROM vsub v JOIN cent_sub cs USING (s)
      ) WHERE rn = 1
    ),
    qsub AS (
      SELECT vec_id AS query_id, sp.range AS s,
             nv[(sp.range*4+1):(sp.range*4+4)] AS qsv
      FROM n, range(16) sp WHERE vec_id % 100 = 0
    ),
    qtab AS (
      SELECT query_id, s, cc,
             list_reduce(list_transform(range(1,5),
               j -> (qsv[j]-csv[j])*(qsv[j]-csv[j])), (a,b) -> a+b) AS qd2
      FROM qsub JOIN cent_sub USING (s)
    ),
    adc AS (
      SELECT t.query_id, cd.vec_id,
             floor(list_reduce(list(t.qd2 ORDER BY t.s), (a,b) -> a+b) * 1000000.0 + 0.5)
               / 1000000.0 AS dist6
      FROM code1 cd
      JOIN assign a ON a.vec_id = cd.vec_id
      JOIN probe p ON p.centroid_id = a.centroid_id
      JOIN qtab t ON t.s = cd.s AND t.cc = cd.cc AND t.query_id = p.query_id
      GROUP BY t.query_id, cd.vec_id
    ),
    cand AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                    ORDER BY dist6 ASC, vec_id ASC) AS rn
        FROM adc
      ) WHERE rn <= 50
    ),
    scored AS (
      SELECT cnd.query_id, cnd.vec_id,
             floor(({_cos_sql('emb.embedding', 'qe.embedding')}) * 1000000.0 + 0.5)
               / 1000000.0 AS score
      FROM cand cnd
      JOIN embeddings emb ON emb.vec_id = cnd.vec_id
      JOIN embeddings qe ON qe.vec_id = cnd.query_id
    ),
    ranked AS (
      SELECT query_id, vec_id, score,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id ASC) AS INT) AS rank
      FROM scored
    )
    SELECT * FROM ranked WHERE rank <= 5
    """,
)
def sim_ivfpq(spark, sf_dir):
    """IVF + PQ composed (FAISS IVFPQ, by_residual=false): coarse cells
    restrict each query to nprobe=2 cells, PQ asymmetric distance ranks
    within them, exact cosine re-ranks the top refine*k. The registry
    runs the deterministic configuration (prefix codebook, iters=0,
    1e-9 quantization) so the ENTIRE two-level pipeline is
    DuckDB-oracle-checked end to end."""
    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    books = S.pq_train_codebook(
        emb, m=16, ksub=16, sample=16, iters=0, init="prefix", det_quantize=9
    )
    return S.ivfpq_topk(
        emb, queries, centroids, books, k=5, nprobe=2, refine=10, det_quantize=9
    )

@_q(
    "sim_recall_report",
    # composes the two green fragments: sim_topk's exact ranking and
    # sim_bucketed's bucket-join ranking, left-joined per (query, hit)
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id % 100 = 0
    ),
    exact AS (
      SELECT query_id, vec_id FROM (
        SELECT q.query_id, e.vec_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY floor(({_cos_sql('e.embedding', 'q.qv')}) * 1000000.0 + 0.5) / 1000000.0 DESC,
                          e.vec_id ASC) AS rn
        FROM embeddings e CROSS JOIN q
      ) WHERE rn <= 5
    ),
    eb AS (
      SELECT vec_id, embedding, band,
             list_sum(list_transform(range(8),
                 d -> CASE WHEN embedding[CAST(band * 8 + d AS INT) + 1] > 0
                      THEN (CAST(1 AS BIGINT) << d) ELSE 0 END)) AS bucket
      FROM embeddings, (SELECT unnest(range(8)) AS band) b
    ),
    qb AS (SELECT vec_id AS query_id, embedding AS qv, band, bucket
           FROM eb WHERE vec_id % 100 = 0),
    approx AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, vec_id ASC) AS rn
        FROM (
          SELECT qb.query_id, eb.vec_id,
                 max(floor(({_cos_sql('eb.embedding', 'qb.qv')}) * 1000000.0 + 0.5) / 1000000.0) AS score
          FROM eb JOIN qb ON qb.band = eb.band AND qb.bucket = eb.bucket
          GROUP BY qb.query_id, eb.vec_id
        )
      ) WHERE rn <= 5
    )
    SELECT e.query_id, CAST(count(*) AS INT) AS n_truth,
           CAST(count(a.vec_id) AS INT) AS n_hit
    FROM exact e LEFT JOIN approx a
      ON a.query_id = e.query_id AND a.vec_id = e.vec_id
    GROUP BY e.query_id
    """,
)
def sim_recall_report(spark, sf_dir):
    """ANN index health check: per-query recall@5 of the 8-band
    sign-bucket index (OR-amplification, same disjoint-slice bands as
    knn_graph) vs exact brute force on the sampled query set — integer
    (n_truth, n_hit) rows, the post-rebuild observability a serving
    platform runs. The corpus is scanned once (per-band buckets
    posexploded in flight), queries broadcast — map-only candidates."""
    from route81_spark.ops.similarity import ann_recall_report

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ann_recall_report(emb, queries, k=5, n_bands=8)

@_q(
    "sim_centroid_update",
    # assignment twin + lateral-unnest component quantization: every
    # sum is BIGINT over 1e6-quantized components, so reduction order
    # (Spark partitions vs DuckDB) cannot matter
    f"""
    WITH c AS (
      SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < 16
    ),
    assign AS (
      SELECT vec_id, embedding, centroid_id FROM (
        SELECT e.vec_id, e.embedding, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY floor(({_cos_sql('e.embedding', 'c.cv')}) * 1000000.0 + 0.5) / 1000000.0 DESC,
                          c.centroid_id ASC) AS rn
        FROM embeddings e CROSS JOIN c
        WHERE e.embedding IS NOT NULL
      ) WHERE rn = 1
    ),
    comp AS (
      SELECT centroid_id, CAST(s.i AS INT) AS dim,
             CAST(floor(CAST(embedding[s.i + 1] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS q
      FROM assign, LATERAL (SELECT unnest(range(0, 64)) AS i) s
    )
    SELECT centroid_id, dim, CAST(sum(q) AS BIGINT) AS sum_q,
           CAST(count(*) AS BIGINT) AS n
    FROM comp GROUP BY 1, 2
    """,
)
def sim_centroid_update(spark, sf_dir):
    """One distributed k-means M-step over the FULL corpus: zero-shuffle
    codegen assignment, then BIGINT-exact per-(centroid, dim) component
    sums (1e6-quantized before summing — float sums are reduction-order
    nondeterministic, integers are not). new_centroid = sum_q/(n*1e6)
    wherever the caller needs it."""
    from route81_spark.ops.similarity import centroid_update

    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    return centroid_update(emb, centroids)

@_q(
    "sim_ood_filter",
    f"""
    WITH c AS (
      SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < 16
    ),
    best AS (
      SELECT vec_id, score FROM (
        SELECT e.vec_id,
               floor(({_cos_sql('e.embedding', 'c.cv')}) * 1000000.0 + 0.5) / 1000000.0 AS score,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY floor(({_cos_sql('e.embedding', 'c.cv')}) * 1000000.0 + 0.5) / 1000000.0 DESC,
                          c.centroid_id ASC) AS rn
        FROM embeddings e CROSS JOIN c
      ) WHERE rn = 1
    )
    SELECT vec_id, score AS max_cos,
           (score IS NULL OR score < 0.2) AS is_outlier
    FROM best
    """,
)
def sim_ood_filter(spark, sf_dir):
    """Out-of-distribution pruning: max cosine to the 16-centroid
    reference set via the zero-shuffle codegen argmax (score emitted),
    outlier flag below 0.2 — the unmodeled-tail companion to SemDeDup's
    over-dense-core trim."""
    from route81_spark.ops.similarity import centroid_ood_scores

    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    return centroid_ood_scores(emb, centroids, threshold=0.2)

@_q(
    "sim_int8_topk",
    # bit-exact twin: 1e-9-quantized unit vectors, floor-round int8
    # codes, INTEGER dot products (BIGINT fold), one de-scale double
    # per pair in identical operation order
    """
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    n0 AS (
      SELECT vec_id, v,
             greatest(sqrt(list_reduce(list_transform(v, y -> y*y), (a,b) -> a+b)), 1e-12) AS nrm
      FROM e
    ),
    n AS (
      SELECT vec_id,
             list_transform(v, x -> floor(x / nrm * 1000000000.0 + 0.5) / 1000000000.0) AS nv
      FROM n0
    ),
    c AS (
      SELECT vec_id, nv,
             list_max(list_transform(nv, x -> abs(x))) AS amax
      FROM n
    ),
    codes AS (
      SELECT vec_id, amax,
             list_transform(nv, x -> CAST(floor(x * (127.0 / amax) + 0.5) AS BIGINT)) AS q
      FROM c
    ),
    qc AS (SELECT vec_id AS query_id, amax AS qamax, q AS qq FROM codes WHERE vec_id % 100 = 0),
    scored AS (
      SELECT qc.query_id, codes.vec_id,
             floor(CAST(list_reduce(list_transform(range(1, 65),
                     i -> codes.q[i] * qc.qq[i]), (a, b) -> a + b) AS DOUBLE)
                   * codes.amax * qc.qamax / 16129.0
                   * 1000000.0 + 0.5) / cast(1000000.0 as double) AS score
      FROM codes CROSS JOIN qc
    )
    SELECT query_id, vec_id, score, rank FROM (
      SELECT query_id, vec_id, score,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id ASC) AS INT) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def sim_int8_topk(spark, sf_dir):
    """Symmetric int8 retrieval: integer dot products over per-vector
    127/max|x| codes on 1e-9-quantized unit vectors — the 4x
    memory-bandwidth serving path, bit-exact across engines because
    the ranking math is integer until one final de-scale."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return S.int8_topk(emb, queries, k=5)

@_q(
    "sim_prefix_refine",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id % 100 = 0
    ),
    p0 AS (
      SELECT q.query_id, e.vec_id,
             floor((
               list_reduce(list_transform(range(1, 17),
                 i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)), (x, y) -> x + y)
               / (sqrt(list_reduce(list_transform(range(1, 17),
                    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), (x, y) -> x + y))
                  * sqrt(list_reduce(list_transform(range(1, 17),
                    i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)), (x, y) -> x + y)))
             ) * 1000000.0 + 0.5) / 1000000.0 AS ps
      FROM embeddings e CROSS JOIN q
    ),
    cand AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                    ORDER BY ps DESC, vec_id ASC) AS rn
        FROM p0
      ) WHERE rn <= 20
    ),
    scored AS (
      SELECT c.query_id, c.vec_id,
             floor(({_cos_sql('e.embedding', 'qe.embedding')}) * 1000000.0 + 0.5)
               / 1000000.0 AS score
      FROM cand c
      JOIN embeddings e ON e.vec_id = c.vec_id
      JOIN embeddings qe ON qe.vec_id = c.query_id
    )
    SELECT query_id, vec_id, score, rank FROM (
      SELECT query_id, vec_id, score,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id ASC) AS INT) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def sim_prefix_refine(spark, sf_dir):
    """Matryoshka adaptive retrieval: cheap cosine over the leading 16
    dims cuts candidates to refine*k, full-dimension cosine re-ranks
    only those. Pure Column funnel — the scale answer when embeddings
    are MRL-trained and the prefix is stored as its own column."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return S.prefix_refine_topk(emb, queries, k=5, prefix_dim=16, refine=4)

@_q(
    "sim_topk_blas",
    # Oracle = exact top-k. BLAS scores are measured bit-identical to
    # the fold at 1e-6 on the fixed sf0.01/sf0.1 fixtures, which is
    # what makes membership/rank comparable; the 1e-6 -> 1e-4 re-round
    # (replicated on both sides — the double rounding differs from
    # rounding the raw cosine at 1e-4) additionally absorbs a
    # future single-ulp summation flip in the VALUE. A flip at a 1e-6
    # boundary that changes ORDERING at the rank-k cut is not
    # absorbable — that residual risk rides on the measured equality
    # and the pinned fixtures (recall test in test_ops).
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id % 100 = 0
    ),
    scored AS (
      SELECT q.query_id, e.vec_id,
             floor(({_cos_sql('e.embedding', 'q.qv')}) * 1000000.0 + 0.5) / 1000000.0 AS score6
      FROM embeddings e CROSS JOIN q
    ),
    ranked AS (
      SELECT query_id, vec_id, score6,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY score6 DESC, vec_id ASC) AS INT) AS rank
      FROM scored
    )
    SELECT query_id, vec_id,
           floor(score6 * 10000.0 + 0.5) / 10000.0 AS score,
           rank
    FROM ranked WHERE rank <= 5
    """,
)
def sim_topk_blas(spark, sf_dir):
    from route81_spark.io import ensure_parallelism
    from route81_spark.ops.util import det_round

    emb = ensure_parallelism(_t(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = S.brute_force_topk_np(emb, queries, k=5)
    return out.select(
        "query_id",
        "vec_id",
        det_round(F.col("score"), 4).alias("score"),
        "rank",
    )

@_q(
    "sim_bucketed",
    f"""
    WITH e AS (
      SELECT vec_id, embedding,
             {" + ".join(f"(CASE WHEN embedding[{i + 1}] > 0 THEN {2**i} ELSE 0 END)" for i in range(8))}
               AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM e WHERE vec_id % 100 = 0),
    scored AS (
      SELECT q.query_id, e.vec_id,
             floor(({_cos_sql('e.embedding', 'q.qv')}) * 1000000.0 + 0.5) / 1000000.0 AS score
      FROM e JOIN q USING (bucket)
    ),
    ranked AS (
      SELECT query_id, vec_id, score,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id ASC) AS INT) AS rank
      FROM scored
    )
    SELECT * FROM ranked WHERE rank <= 5
    """,
)
def sim_bucketed(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return S.bucketed_topk(emb, queries, k=5)

@_q(
    "emb_near_dups",
    f"""
    WITH e AS (
      SELECT vec_id, embedding,
             {" + ".join(f"(CASE WHEN embedding[{i + 1}] > 0 THEN {2**i} ELSE 0 END)" for i in range(8))}
               AS bucket
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           floor(({_cos_sql('a.embedding', 'b.embedding')}) * 1000000.0 + 0.5) / 1000000.0 AS cos
    FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE floor(({_cos_sql('a.embedding', 'b.embedding')}) * 1000000.0 + 0.5) / 1000000.0 >= 0.3
    """,
)
def emb_near_dups(spark, sf_dir):
    return S.embedding_near_dups(_t(spark, sf_dir, "embeddings"), threshold=0.3)

@_q(
    "emb_semantic_dedup",
    f"""
    WITH RECURSIVE e AS (
      SELECT vec_id, embedding,
             {" + ".join(f"(CASE WHEN embedding[{i + 1}] > 0 THEN {2**i} ELSE 0 END)" for i in range(8))}
               AS bucket
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE floor(({_cos_sql('a.embedding', 'b.embedding')}) * 1000000.0 + 0.5) / 1000000.0 >= 0.3
    ),
    bi AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT DISTINCT src, src FROM bi
      UNION
      SELECT bi.src, reach.r FROM bi JOIN reach ON bi.dst = reach.id
    ),
    losers AS (SELECT id FROM reach GROUP BY id HAVING min(r) <> id)
    SELECT vec_id FROM embeddings WHERE vec_id NOT IN (SELECT id FROM losers)
    """,
)
def emb_semantic_dedup(spark, sf_dir):
    # SemDeDup-style survivor set: one representative per embedding
    # near-dup cluster (id only — embeddings stay columnar)
    return S.embedding_dedup(_t(spark, sf_dir, "embeddings"), threshold=0.3).select(
        "vec_id"
    )

@_q(
    "sim_knn_graph",
    # the bucket width self-scales from count(*): n_dims =
    # clamp(ceil(log2(n/16)), 2, 24), regenerated here so the oracle
    # follows the Spark side at ANY scale factor. OR-amplification:
    # band j buckets on the disjoint dim slice [j*n, (j+1)*n); the
    # candidate relation is the (band, bucket) equi-join (identical to
    # a union of per-band joins), deduped on the pair before the top-k
    # window. l = min(8, 64 // n) mirrors the Spark-side clamp.
    f"""
    WITH nd AS (
      SELECT GREATEST(2, LEAST(24, CAST(ceil(log2(count(*) / 16.0)) AS INT))) AS n
      FROM embeddings
    ),
    lb AS (SELECT LEAST(8, CAST(64 // (SELECT n FROM nd) AS INT)) AS l),
    bands AS (SELECT unnest(range((SELECT l FROM lb))) AS band),
    e AS (
      SELECT vec_id, embedding, band,
             list_sum(list_transform(range(nd.n),
                 d -> CASE WHEN embedding[CAST(band * nd.n + d AS INT) + 1] > 0
                      THEN (CAST(1 AS BIGINT) << d) ELSE 0 END)) AS bucket
      FROM embeddings, bands, nd
    ),
    scored AS (
      SELECT a.vec_id AS src, b.vec_id AS nbr,
             max(floor(({_cos_sql('a.embedding', 'b.embedding')}) * 1000000.0 + 0.5) / 1000000.0) AS score
      FROM e a JOIN e b ON a.band = b.band AND a.bucket = b.bucket
                        AND a.vec_id <> b.vec_id
      GROUP BY a.vec_id, b.vec_id
    ),
    ranked AS (
      SELECT src, nbr, score,
             CAST(row_number() OVER (PARTITION BY src
                  ORDER BY score DESC, nbr ASC) AS INT) AS rank
      FROM scored
    )
    SELECT src, nbr, score, rank, (SELECT CAST(n AS INT) FROM nd) AS n_dims
    FROM ranked WHERE rank <= 3
    """,
)
def sim_knn_graph(spark, sf_dir):
    """Corpus-wide approximate k-NN graph (each vector's 3 nearest
    sign-bucket candidates) — the graph primitive for graph-based
    curation: density scoring, cluster discovery past a hard threshold,
    label propagation. Bucketed self-join, never all-pairs; the bucket
    width self-scales from the corpus count (recorded in the n_dims
    column) so candidate pairs grow linearly with the corpus, and 8
    OR-amplification bands (disjoint dim slices) lift recall from the
    single-band ~0.05@5 to ~0.5@5 on the harness embeddings (recall
    1-(1-p^r)^l instead of p^r; floor-pinned in tests/test_ops.py,
    probe-measured by scale_probe knn_recall)."""
    return S.knn_graph(_t(spark, sf_dir, "embeddings"), k=3, n_bands=8)

@_q(
    "sim_random_projection",
    # regenerates the Achlioptas sign matrix from md5 exactly as
    # _achlioptas_signs does, then folds each component in the same
    # element order as the Spark zip_with/aggregate expression
    """
    WITH s AS (
      SELECT d.range AS d, j.range AS j,
             CAST(CASE (('0x' || substr(md5('jl|' || CAST(d.range AS VARCHAR) || ':'
                    || CAST(j.range AS VARCHAR)), 1, 15))::BIGINT % 6)
               WHEN 0 THEN 1.0 WHEN 1 THEN -1.0 ELSE 0.0 END AS DOUBLE) AS sgn
      FROM range(64) d, range(16) j
    ),
    sm AS (SELECT j, list(sgn ORDER BY d) AS sv FROM s GROUP BY j)
    SELECT e.vec_id, CAST(sm.j AS INT) AS dim,
           floor(list_reduce(list_transform(range(1, 65),
                 i -> CAST(e.embedding[i] AS DOUBLE) * sm.sv[i]), (a, b) -> a + b)
                 * 1000000.0 + 0.5) / 1000000.0 AS value
    FROM embeddings e, sm
    """,
)
def sim_random_projection(spark, sf_dir):
    """Sparse JL projection 64 -> 16 dims (hash-derived Achlioptas
    signs, zero shuffle): the standard pre-step before ANN on very wide
    embeddings. Exploded to (vec_id, dim, value) rows so the driver
    hash-compares scalar doubles."""
    return S.random_project(_t(spark, sf_dir, "embeddings"), out_dim=16)

@_q(
    "emb_quantize_int8",
    """
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS amax
      FROM embeddings
    ),
    p AS (
      SELECT vec_id, embedding, 127.0 / amax AS sc
      FROM s WHERE amax > 0
    )
    SELECT vec_id,
           CAST(unnest(range(len(embedding))) AS INT) AS pos,
           unnest(list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * sc + 0.5) AS INT))) AS q,
           floor(sc * 1000000.0 + 0.5) / 1000000.0 AS scale
    FROM p
    """,
)
def emb_quantize_int8(spark, sf_dir):
    # symmetric int8 embedding quantization (storage/serving
    # compression): per-vector scale, deterministic round, exploded to
    # oracle-comparable rows
    from route81_spark.ops.similarity import quantize_int8

    return quantize_int8(_t(spark, sf_dir, "embeddings"))

@_q(
    "emb_decontaminate",
    f"""
    WITH b AS (
      SELECT embedding AS bv FROM embeddings WHERE vec_id % 97 = 0
    ),
    s AS (
      SELECT e.vec_id,
             max({_cos_sql('e.embedding', 'b.bv')}) AS raw_max
      FROM embeddings e CROSS JOIN b
      GROUP BY e.vec_id
    )
    SELECT e.vec_id, e.label,
           {det_round_sql('s.raw_max', 6)} AS max_sim,
           coalesce({det_round_sql('s.raw_max', 6)} >= 0.6, FALSE) AS contaminated
    FROM embeddings e LEFT JOIN s USING (vec_id)
    """,
)
def emb_decontaminate(spark, sf_dir):
    """Semantic benchmark decontamination: max cosine of each corpus
    vector against a broadcast eval set (vec_id % 97 stand-in),
    flagged at >= 0.6 — catches paraphrased leakage the n-gram check
    (corpus_decontaminate) misses. Zero corpus shuffle: the eval set
    collapses to one broadcast row and the max-cosine fold runs
    map-side (floor-round commutes with max, so rounding after the
    fold matches the oracle's round-of-max)."""
    from route81_spark.ops.similarity import semantic_decontaminate

    emb = _t(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 97 == 0)
    return semantic_decontaminate(emb, bench, threshold=0.6).select(
        "vec_id", "label", "max_sim", "contaminated"
    )

@_q(
    "sim_hard_negatives",
    # sim_topk's oracle + the cross-label gate: negatives must be
    # semantically close but carry a DIFFERENT label than the query
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv, label AS ql
      FROM embeddings WHERE vec_id % 100 = 0
    ),
    scored AS (
      SELECT q.query_id, e.vec_id, e.label,
             floor(({_cos_sql('e.embedding', 'q.qv')}) * 1000000.0 + 0.5)
               / 1000000.0 AS score
      FROM embeddings e CROSS JOIN q
      WHERE e.label <> q.ql
    ),
    ranked AS (
      SELECT query_id, vec_id, label, score,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id ASC) AS INT) AS rank
      FROM scored
    )
    SELECT * FROM ranked WHERE rank <= 5
    """,
)
def sim_hard_negatives(spark, sf_dir):
    """Hard-negative mining (DPR/Contriever): per query embedding, the
    5 most-similar vectors with a different class label — map-side
    filtered before ranking."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    return S.hard_negatives(emb, queries, k=5)

@_q(
    "sim_cluster_sample",
    # mirror of ops.similarity.cluster_balanced_sample: the assign CTE
    # is sim_ivf's (det-rounded cosine argmax, ties -> lowest centroid
    # id); the per-cluster quota picks by md5 60-bit of the id (seed
    # 31) with the id as total tie-break.
    f"""
    WITH c AS (
      SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < 16
    ),
    assign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT e.vec_id, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY floor(({_cos_sql('e.embedding', 'c.cv')}) * 1000000.0 + 0.5) / 1000000.0 DESC,
                          c.centroid_id ASC) AS rn
        FROM embeddings e CROSS JOIN c
      ) WHERE rn = 1
    ),
    sz AS (SELECT centroid_id, CAST(count(*) AS BIGINT) AS cluster_size
           FROM assign GROUP BY 1),
    r AS (SELECT centroid_id, vec_id,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY centroid_id
                   ORDER BY ('0x' || substr(md5('31|' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
                            vec_id) AS INT) AS pick_rank
          FROM assign)
    SELECT centroid_id, vec_id, pick_rank, cluster_size
    FROM r JOIN sz USING (centroid_id)
    WHERE pick_rank <= 8
""",
)
def sim_cluster_sample(spark, sf_dir):
    """Cluster-balanced diversity sample: fixed deterministic quota of
    8 vectors per nearest-centroid cell — flattens over-represented
    semantic modes; embeddings never shuffle (codegen assign +
    WindowGroupLimit quota on integer rows)."""
    from route81_spark.ops.similarity import cluster_balanced_sample

    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    return cluster_balanced_sample(emb, centroids, n_per=8)

@_q(
    "sim_triplets",
    # mirror of ops.similarity.contrastive_triplets: anchors =
    # vec_id % 50 == 0; per anchor the best same-label (self excluded)
    # and best cross-label vectors by det-rounded cosine with id
    # tie-break; margin = difference of the rounded scores.
    f"""
    WITH a AS (
      SELECT vec_id AS anchor_id, embedding AS av, label AS anchor_label
      FROM embeddings WHERE vec_id % 50 = 0
    ),
    scored AS (
      SELECT a.anchor_id, a.anchor_label, e.vec_id,
             e.label = a.anchor_label AS pos,
             floor(({_cos_sql('e.embedding', 'a.av')}) * 1000000.0 + 0.5)
               / 1000000.0 AS s
      FROM embeddings e CROSS JOIN a
      WHERE e.vec_id <> a.anchor_id
    ),
    best AS (
      SELECT anchor_id, anchor_label, vec_id, pos, s FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id, pos
                                     ORDER BY s DESC, vec_id ASC) AS r
        FROM scored
      ) WHERE r = 1
    ),
    piv AS (
      SELECT anchor_id, anchor_label,
             max(CASE WHEN pos THEN vec_id END) AS pos_id,
             max(CASE WHEN pos THEN s END) AS pos_score,
             max(CASE WHEN NOT pos THEN vec_id END) AS neg_id,
             max(CASE WHEN NOT pos THEN s END) AS neg_score
      FROM best GROUP BY 1, 2
    )
    SELECT anchor_id, anchor_label, pos_id, pos_score, neg_id, neg_score,
           pos_score - neg_score AS margin
    FROM piv WHERE pos_id IS NOT NULL AND neg_id IS NOT NULL
""",
)
def sim_triplets(spark, sf_dir):
    """Contrastive (anchor, positive, hard-negative) triplet mining:
    one broadcast scoring pass, both winners from a single
    WindowGroupLimit rank, pivoted to one training row per anchor."""
    from route81_spark.ops.similarity import contrastive_triplets

    emb = _t(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("anchor_vec"),
        F.col("label").alias("anchor_label"),
    )
    return contrastive_triplets(emb, anchors)
