"""Training-data curation: funnels, sampling/mixtures, packing, decontamination, BPE, chat/FIM rendering, Bloom dedup, drift, budget selection, incremental curation."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from route81_spark.ops import similarity as S
from route81_spark.ops import text as X
from route81_spark.ops.util import det_round_sql
from route81_spark.pipeline import apply_pipeline
from ._shared import _SH_SQL, _TOKS, _minhash_sql_expr, _q, _t

@_q(
    "corpus_stats",
    f"""
    WITH t AS (
      SELECT source,
             len(string_split_regex(trim(text), '\\s+')) AS n_toks,
             string_split_regex(trim(text), '\\s+') AS toks
      FROM documents
    ),
    u AS (SELECT source, unnest(toks) AS tok FROM t)
    SELECT t.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(t.n_toks) AS BIGINT) AS total_toks,
           {det_round_sql('quantile_cont(t.n_toks, 0.5)', 4)} AS med_toks,
           (SELECT CAST(count(DISTINCT u.tok) AS BIGINT) FROM u WHERE u.source = t.source) AS vocab
    FROM t GROUP BY t.source
    """,
)
def corpus_stats(spark, sf_dir):
    """Corpus-level training-data statistics per source: doc counts,
    token totals, median doc length, vocabulary size. Vocab = distinct
    agg after an explode — the shuffle carries (source, token) pairs
    once, with map-side partial distinct."""
    from route81_spark.ops.text import tokens
    from route81_spark.ops.util import det_round

    docs = _t(spark, sf_dir, "documents").select(
        "source", tokens(F.col("text")).alias("toks")
    )
    per_doc = docs.select("source", F.size("toks").alias("n_toks"), "toks")
    base = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("total_toks"),
        det_round(F.percentile(F.col("n_toks"), F.lit(0.5)), 4).alias("med_toks"),
    )
    vocab = (
        per_doc.select("source", F.explode("toks").alias("tok"))
        .groupBy("source")
        .agg(F.count_distinct("tok").alias("vocab"))
    )
    return base.join(vocab, "source")

_LANG_SQL = """
    CASE WHEN greatest(
           len(list_filter({T}, t -> t IN ('der','die','und','das','ist'))),
           len(list_filter({T}, t -> t IN ('the','and','of','to','a'))),
           len(list_filter({T}, t -> t IN ('le','la','et','les','des')))) > 0 THEN
      CASE WHEN len(list_filter({T}, t -> t IN ('der','die','und','das','ist')))
                = greatest(
                    len(list_filter({T}, t -> t IN ('der','die','und','das','ist'))),
                    len(list_filter({T}, t -> t IN ('the','and','of','to','a'))),
                    len(list_filter({T}, t -> t IN ('le','la','et','les','des'))))
           THEN 'de'
           WHEN len(list_filter({T}, t -> t IN ('the','and','of','to','a')))
                = greatest(
                    len(list_filter({T}, t -> t IN ('der','die','und','das','ist'))),
                    len(list_filter({T}, t -> t IN ('the','and','of','to','a'))),
                    len(list_filter({T}, t -> t IN ('le','la','et','les','des'))))
           THEN 'en'
           ELSE 'fr' END
    ELSE 'und' END
"""

_QUALITY_SQL = """
    floor((least(length(text) / 400.0, 1.0)
          * (CAST(len(list_distinct({T})) AS DOUBLE) / len({T}))
          * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
             / length(text))) * 1000000.0 + 0.5) / 1000000.0
"""

@_q(
    "corpus_split",
    f"""
    SELECT doc_id,
           CASE WHEN ('0x' || substr(md5('split0|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                     / 1152921504606846976.0 < 0.1
                THEN 'val' ELSE 'train' END AS split
    FROM documents
    """,
)
def corpus_split(spark, sf_dir):
    # deterministic hash split: a doc never flips sides across reruns,
    # repartitions, or incremental appends (rand() guarantees none of that)
    from route81_spark.ops.corpus import train_val_split

    return train_val_split(_t(spark, sf_dir, "documents"), val_fraction=0.1).select(
        "doc_id", "split"
    )

@_q(
    "corpus_shard",
    """
    SELECT doc_id,
           CAST(('0x' || substr(md5('shuffle0|s|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                % 8 AS INT) AS shard,
           CAST(row_number() OVER (
             PARTITION BY ('0x' || substr(md5('shuffle0|s|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8
             ORDER BY md5('shuffle0|o|' || CAST(doc_id AS VARCHAR))
           ) - 1 AS BIGINT) AS pos
    FROM documents
    """,
)
def corpus_shard(spark, sf_dir):
    # deterministic global shuffle into 8 training shards: one hash
    # Exchange + in-partition sort, never a global ORDER BY
    from route81_spark.ops.corpus import shard

    return shard(_t(spark, sf_dir, "documents"), n_shards=8).select(
        "doc_id", "shard", "pos"
    )

@_q(
    "corpus_curation",
    f"""
    WITH RECURSIVE
    gated AS (
      SELECT * FROM documents
      WHERE {_LANG_SQL.format(T=_TOKS)} = 'en'
        AND {_QUALITY_SQL.format(T=_TOKS)} >= 0.05
        AND len({_TOKS}) BETWEEN 5 AND 1000000
    ),
    survivors AS (
      SELECT d.* FROM gated d
      JOIN (SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) h,
                   min(doc_id) keep_id
            FROM gated GROUP BY 1) x ON d.doc_id = x.keep_id
    ),
    t AS (SELECT doc_id, {_SH_SQL} AS sh FROM survivors),
    sigs AS (
      SELECT doc_id, sh,
             [{", ".join(_minhash_sql_expr(j) for j in range(8))}] AS sig
      FROM t
    ),
    bands AS (
      SELECT doc_id, b, md5(array_to_string(sig[b*4+1:b*4+4], ',')) AS bh
      FROM sigs, (SELECT unnest(range(2)) AS b)
    ),
    pairs0 AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
    ),
    pairs AS (
      SELECT p.id_a, p.id_b FROM pairs0 p
      JOIN sigs sa ON sa.doc_id = p.id_a
      JOIN sigs sb ON sb.doc_id = p.id_b
      WHERE floor((CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(sa.sh, sb.sh)))) * 1000000.0 + 0.5)
            / 1000000.0 >= 0.5
    ),
    bi AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT DISTINCT src, src FROM bi
      UNION
      SELECT bi.src, reach.r FROM bi JOIN reach ON bi.dst = reach.id
    ),
    losers AS (
      SELECT id AS doc_id FROM reach GROUP BY id HAVING min(r) <> id
    )
    SELECT s.doc_id FROM survivors s
    LEFT JOIN losers l ON s.doc_id = l.doc_id WHERE l.doc_id IS NULL
    """,
)
def corpus_curation(spark, sf_dir):
    # the full curation funnel: language -> quality -> length gates,
    # then exact + near dedup; gates run before shingling so the
    # expensive stages only see surviving rows
    from route81_spark.ops.corpus import curate

    return curate(_t(spark, sf_dir, "documents")).select("doc_id")

@_q(
    "corpus_decontaminate",
    """
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
               FROM documents),
    g AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(tk) - 4, 1) + 1),
                           i -> coalesce(array_to_string(tk[i:i+4], ' '), ''))) AS gs
      FROM t
    ),
    bench AS (SELECT DISTINCT unnest(gs) AS ng FROM g WHERE doc_id % 97 = 0),
    corp AS (SELECT doc_id, unnest(gs) AS ng FROM g WHERE doc_id % 97 <> 0),
    hits AS (SELECT c.doc_id, count(*) AS n FROM corp c
             JOIN bench b USING (ng) GROUP BY 1)
    SELECT d.doc_id,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
           coalesce(h.n, 0) >= 3 AS contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % 97 <> 0
    """,
)
def corpus_decontaminate(spark, sf_dir):
    # benchmark decontamination: every 97th doc plays the eval set; a
    # training doc is contaminated at >= 3 shared distinct 5-grams.
    # Benchmark n-gram set broadcasts; only matching rows shuffle.
    from route81_spark.ops.corpus import decontaminate

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corp = docs.filter(F.col("doc_id") % 97 != 0)
    return decontaminate(corp, bench, n=5, min_hits=3).select(
        "doc_id", "n_hits", "contaminated"
    )

@_q(
    "corpus_stratified_sample",
    """
    SELECT doc_id, lang FROM documents
    WHERE ('0x' || substr(md5('strat0|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
          / 1152921504606846976.0
          < CASE lang WHEN 'en' THEN 0.5 WHEN 'fr' THEN 0.25
                      WHEN 'de' THEN 0.125 ELSE 0.0 END
    """,
)
def corpus_stratified_sample(spark, sf_dir):
    # language rebalancing by deterministic per-stratum hash sampling —
    # re-runnable, zero shuffle, docs never flip across reruns
    from route81_spark.ops.corpus import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "lang", {"en": 0.5, "fr": 0.25, "de": 0.125}
    ).select("doc_id", "lang")

@_q(
    "corpus_pack",
    f"""
    WITH t AS (SELECT doc_id, len({_TOKS}) AS n_tokens FROM documents),
    s AS (
      SELECT doc_id, n_tokens,
             CAST(('0x' || substr(md5('shuffle0|s|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                  % 4 AS INT) AS shard,
             md5('shuffle0|o|' || CAST(doc_id AS VARCHAR)) AS oh
      FROM t
    )
    SELECT doc_id, shard,
           CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY oh
                       ROWS UNBOUNDED PRECEDING) - n_tokens) / 512.0) AS INT) AS bin
    FROM s
    """,
)
def corpus_pack(spark, sf_dir):
    # token-budget sequence packing: shard-shuffle, then bin consecutive
    # docs by exclusive running token count — per-shard window sorts,
    # never a global ORDER BY
    from route81_spark.ops.corpus import pack_sequences
    from route81_spark.ops.text import token_count

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    return pack_sequences(docs, budget_tokens=512, n_shards=4).select(
        "doc_id", "shard", "bin"
    )

@_q(
    "corpus_pack_layout",
    # corpus_pack's oracle + per-(shard, bin) running token offsets —
    # the attention/loss-mask layout inside each packed window
    f"""
    WITH t AS (SELECT doc_id, len({_TOKS}) AS n_tokens FROM documents),
    s AS (
      SELECT doc_id, n_tokens,
             CAST(('0x' || substr(md5('shuffle0|s|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                  % 4 AS INT) AS shard,
             md5('shuffle0|o|' || CAST(doc_id AS VARCHAR)) AS oh
      FROM t
    ),
    p AS (
      SELECT doc_id, n_tokens, shard, oh,
             CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY oh
                         ROWS UNBOUNDED PRECEDING) - n_tokens) / 512.0) AS INT) AS bin
      FROM s
    )
    SELECT doc_id, shard, bin,
           CAST(sum(n_tokens) OVER (PARTITION BY shard, bin ORDER BY oh
                ROWS UNBOUNDED PRECEDING) - n_tokens AS INT) AS off_start,
           CAST(sum(n_tokens) OVER (PARTITION BY shard, bin ORDER BY oh
                ROWS UNBOUNDED PRECEDING) AS INT) AS off_end
    FROM p
    """,
)
def corpus_pack_layout(spark, sf_dir):
    """Sequence-packing layout: (shard, bin) assignment plus each doc's
    [off_start, off_end) token offsets within its packed window — what
    boundary-aware attention masks consume."""
    from route81_spark.ops.corpus import pack_layout
    from route81_spark.ops.text import token_count

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    return pack_layout(docs, budget_tokens=512, n_shards=4)

@_q(
    "corpus_boilerplate",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    c AS (SELECT doc_id, tk,
                 greatest(CAST(floor((len(tk) + 3) / 4.0) AS INT), 1) AS nc
          FROM t),
    ch AS (
      SELECT doc_id,
             unnest(range(1, nc + 1)) AS i,
             unnest(list_transform(range(1, nc + 1),
                    i -> coalesce(array_to_string(tk[(i-1)*4+1:(i-1)*4+4], ' '), '')))
               AS txt
      FROM c
    ),
    freq AS (SELECT txt, count(DISTINCT doc_id) AS nd FROM ch GROUP BY 1),
    f AS (SELECT ch.doc_id, ch.i, ch.txt, freq.nd FROM ch JOIN freq USING (txt))
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_chunks,
           CAST(sum(CASE WHEN nd <= 2 THEN 1 ELSE 0 END) AS INT) AS n_kept,
           coalesce(string_agg(CASE WHEN nd <= 2 THEN txt END, ' ' ORDER BY i), '')
             AS clean_text
    FROM f GROUP BY doc_id
    """,
)
def corpus_boilerplate(spark, sf_dir):
    # corpus-wide repeated-segment removal (C4/RefinedWeb boilerplate
    # pass): 4-token chunks shared by >2 distinct docs are dropped and
    # the survivors reassembled in order
    from route81_spark.ops.corpus import remove_boilerplate

    return remove_boilerplate(
        _t(spark, sf_dir, "documents"), window=4, max_docs=2
    )

@_q(
    "corpus_mixture",
    """
    WITH c AS (
      SELECT source AS g, count(*) AS n FROM documents
      WHERE source IN ('src0', 'src1', 'src2') GROUP BY 1
    ),
    sh(g, s) AS (
      VALUES ('src0', CAST(0.5 AS DOUBLE)), ('src1', CAST(0.3 AS DOUBLE)),
             ('src2', CAST(0.2 AS DOUBLE))
    ),
    j AS (SELECT c.g, c.n, sh.s FROM c JOIN sh USING (g)),
    t AS (SELECT min(n / s) AS t FROM j),
    r AS (SELECT j.g, least(CAST(1.0 AS DOUBLE), t.t * j.s / j.n) AS rate
          FROM j CROSS JOIN t)
    SELECT d.doc_id, d.source FROM documents d JOIN r ON d.source = r.g
    WHERE ('0x' || substr(md5('mix0|' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
          / 1152921504606846976.0 < r.rate
    """,
)
def corpus_mixture(spark, sf_dir):
    # domain-mixture construction: rates derived from target shares at
    # the largest feasible total, selection by deterministic id-hash
    from route81_spark.ops.corpus import mixture_resample

    docs = _t(spark, sf_dir, "documents")
    return mixture_resample(
        docs, "source", {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    ).select("doc_id", "source")

@_q(
    "corpus_upsample",
    """
    WITH f(g, whole, frac) AS (
      VALUES ('src0', 2, CAST(0.0 AS DOUBLE)),
             ('src1', 1, CAST(0.5 AS DOUBLE)),
             ('src2', 0, CAST(0.25 AS DOUBLE))
    ),
    d AS (
      SELECT doc_id, source,
             coalesce(f.whole, 1) +
             CASE WHEN ('0x' || substr(md5('up0|' || f.g || '|' ||
                        CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       / 1152921504606846976.0 < coalesce(f.frac, 0.0)
                  THEN 1 ELSE 0 END AS n
      FROM documents LEFT JOIN f ON documents.source = f.g
    )
    SELECT doc_id, source, CAST(unnest(range(n)) AS INT) AS copy
    FROM d WHERE n > 0
    """,
)
def corpus_upsample(spark, sf_dir):
    # epoch-style repeat-factor upsampling: 2.0 epochs of src0, 1.5 of
    # src1, 0.25 of src2, 1.0 elsewhere — fractional epochs by
    # deterministic id-hash, output exploded with a copy index
    from route81_spark.ops.corpus import mixture_upsample

    docs = _t(spark, sf_dir, "documents")
    return mixture_upsample(
        docs, "source", {"src0": 2.0, "src1": 1.5, "src2": 0.25}
    ).select("doc_id", "source", "copy")

@_q(
    "corpus_select_topk",
    f"""
    WITH s AS (
      SELECT doc_id, source,
             floor((least(length(text) / 400.0, 1.0)
                   * (CAST(len(list_distinct({_TOKS})) AS DOUBLE) / len({_TOKS}))
                   * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                      / length(text))) * 1000000.0 + 0.5) / 1000000.0 AS quality
      FROM documents
    ),
    r AS (
      SELECT doc_id, source, quality,
             CAST(row_number() OVER (PARTITION BY source
                  ORDER BY quality DESC, doc_id ASC) AS INT) AS sel_rank
      FROM s
    )
    SELECT doc_id, source, quality, sel_rank FROM r WHERE sel_rank <= 5
    """,
)
def corpus_select_topk(spark, sf_dir):
    # quality-budgeted data selection: the 5 best docs per source by
    # det-rounded quality score — WindowGroupLimit prunes per partition
    # before the single group shuffle
    from route81_spark.io import ensure_parallelism
    from route81_spark.ops.corpus import select_topk_per_group

    docs = ensure_parallelism(_t(spark, sf_dir, "documents")).select(
        "doc_id", "source", X.quality_score(F.col("text")).alias("quality")
    )
    return select_topk_per_group(docs, "source", F.col("quality"), 5)

@_q(
    "corpus_weighted_sample",
    f"""
    WITH s AS (
      SELECT doc_id, {_QUALITY_SQL.format(T=_TOKS)} AS q,
             greatest(
               ('0x' || substr(md5('wsample0|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                 / 1152921504606846976.0,
               1.0 / 1152921504606846976.0) AS u
      FROM documents
    )
    SELECT doc_id, {det_round_sql('ln(u) / q', 6)} AS sample_key
    FROM s WHERE q > 0
    ORDER BY sample_key DESC, doc_id ASC LIMIT 50
    """,
)
def corpus_weighted_sample(spark, sf_dir):
    """Quality-weighted corpus subsample without replacement (A-ES:
    rank by ln(u)/w over a deterministic id-hash uniform) — the
    probabilistic counterpart of quality top-k. TakeOrderedAndProject
    ships k rows per partition; no global sort, no rand()."""
    from route81_spark.ops.corpus import weighted_sample
    from route81_spark.ops.text import quality_score

    docs = _t(spark, sf_dir, "documents")
    out = weighted_sample(
        docs.withColumn("__q", quality_score(F.col("text"))),
        F.col("__q"),
        k=50,
    )
    return out.select("doc_id", "sample_key")

@_q(
    "corpus_dataset_card",
    f"""
    WITH s AS (
      SELECT source, lang,
             CAST(len({_TOKS}) AS INT) AS tok,
             {_QUALITY_SQL.format(T=_TOKS)} AS q,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS chash
      FROM documents
    ),
    m AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(tok) AS BIGINT) AS total_tokens,
             {det_round_sql('avg(tok)', 4)} AS avg_tokens,
             CAST(max(tok) AS INT) AS max_tokens,
             {det_round_sql('quantile_cont(q, 0.5)', 6)} AS p50_quality,
             {det_round_sql("avg(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END)", 4)} AS en_share
      FROM s GROUP BY source
    ),
    u AS (
      SELECT source, CAST(count(DISTINCT chash) AS BIGINT) AS n_unique
      FROM s GROUP BY source
    )
    SELECT m.source, m.n_docs, m.total_tokens, m.avg_tokens, m.max_tokens,
           m.p50_quality, m.en_share,
           {det_round_sql('1.0 - u.n_unique / CAST(m.n_docs AS DOUBLE)', 4)} AS dup_rate
    FROM m JOIN u USING (source)
    """,
)
def corpus_dataset_card(spark, sf_dir):
    """Per-source dataset card (volumes, token profile, median quality,
    language share, exact-dup rate) — the release summary table. One
    tokenize-once narrow stage, two map-side-combined aggs, broadcast
    join of the source-sized results."""
    from route81_spark.ops.corpus import dataset_card

    return dataset_card(_t(spark, sf_dir, "documents"))

@_q(
    "corpus_dsir",
    # mirror of ops.corpus.dsir_importance: hashed-bigram buckets via
    # the md5-derived 60-bit hash (seed 11), integer-ratio model, one
    # Laplace +1 on both counts, per-doc integer importance sums
    f"""
    WITH t AS (SELECT doc_id, source, {_TOKS} AS tk FROM documents),
    p AS (
      SELECT doc_id, source IN ('src0', 'src1') AS tgt,
             unnest(list_transform(range(1, greatest(len(tk) - 1, 1) + 1),
                    i -> coalesce(array_to_string(tk[i:i+1], ' '), ''))) AS bg
      FROM t
    ),
    pairs AS (
      SELECT doc_id, tgt,
             ('0x' || substr(md5('11|' || bg), 1, 15))::BIGINT % 256 AS b
      FROM p WHERE contains(bg, ' ')
    ),
    doc_bucket AS (
      SELECT doc_id, tgt, b, count(*) AS n_db FROM pairs GROUP BY 1, 2, 3
    ),
    model AS (
      SELECT b,
             CAST(((sum(CASE WHEN tgt THEN n_db ELSE 0 END) + 1) * 1000000)
               // (sum(n_db) + 1) AS BIGINT) AS r
      FROM doc_bucket GROUP BY b
    ),
    s AS (
      SELECT d.doc_id, d.tgt,
             CAST(sum(d.n_db) AS BIGINT) AS n_bigrams,
             CAST(sum(d.n_db * m.r) AS BIGINT) AS importance
      FROM doc_bucket d JOIN model m USING (b)
      GROUP BY 1, 2
    )
    SELECT doc_id, CAST(tgt AS INT) AS is_target, n_bigrams, importance,
           floor((CAST(importance AS DOUBLE) / n_bigrams) * 10000.0 + 0.5)
             / 10000.0 AS avg_importance
    FROM s
    """,
)
def corpus_dsir(spark, sf_dir):
    """DSIR-style importance weights for domain-targeted data selection:
    target = src0/src1 documents, raw = the whole corpus; every doc gets
    the integer-exact hashed-bigram importance the mixture would sample
    by."""
    from route81_spark.ops.corpus import dsir_importance

    docs = _t(spark, sf_dir, "documents")
    return dsir_importance(docs, F.col("source").isin("src0", "src1"))

@_q(
    "corpus_line_dedup",
    # keep-first-occurrence global line dedup (C4/RefinedWeb): the
    # DuckDB twin picks each distinct line's winner with ROW_NUMBER
    # over (doc_id, pos) while Spark reduces min(struct(doc,pos)) per
    # line-hash — same winner, different algorithmic shape. Lines are
    # non-overlapping 4-token windows (this corpus has no newlines),
    # the same unit arithmetic as the boilerplate oracle.
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    c AS (SELECT doc_id, tk,
                 greatest(CAST(floor((len(tk) + 3) / 4.0) AS INT), 1) AS nc
          FROM t),
    ln AS (
      SELECT doc_id,
             unnest(range(1, nc + 1)) AS i,
             unnest(list_transform(range(1, nc + 1),
                    i -> coalesce(array_to_string(tk[(i-1)*4+1:(i-1)*4+4], ' '), '')))
               AS txt
      FROM c
    ),
    r AS (SELECT doc_id, i, txt,
                 ROW_NUMBER() OVER (PARTITION BY txt ORDER BY doc_id, i) AS rn
          FROM ln)
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_lines,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT) AS n_kept,
           coalesce(string_agg(CASE WHEN rn = 1 THEN txt END, ' ' ORDER BY i), '')
             AS clean_text
    FROM r GROUP BY doc_id
    """,
)
def corpus_line_dedup(spark, sf_dir):
    """Global exact line-level dedup: every distinct 4-token line unit
    survives only at its first corpus occurrence (min (doc_id, pos));
    repeats are dropped and documents rebuilt — the keep-first
    primitive remove_boilerplate's frequency threshold cannot express."""
    from route81_spark.io import ensure_parallelism
    from route81_spark.ops.corpus import line_dedup_global

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    return line_dedup_global(docs, window=4)

@_q(
    "corpus_span_dedup",
    # exact-substring dedup twin: stride-1 4-token spans, keep-first by
    # ROW_NUMBER over (doc, pos); repeats expand to their covered token
    # positions (DISTINCT union = the interval merge) and a left join
    # excises them. Spark reduces min(struct) per span hash + per-row
    # interval fold instead — same winner, same coverage.
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(range(1, greatest(len(tk) - 3, 0) + 1)) AS i,
             unnest(list_transform(range(1, greatest(len(tk) - 3, 0) + 1),
                    i -> array_to_string(tk[i:i+3], ' '))) AS span
      FROM t
    ),
    r AS (SELECT doc_id, i, span,
                 ROW_NUMBER() OVER (PARTITION BY span ORDER BY doc_id, i) AS rn
          FROM sh),
    cov AS (
      SELECT DISTINCT doc_id, unnest(range(i - 1, i + 3)) AS tpos
      FROM r WHERE rn > 1
    ),
    tok AS (
      SELECT doc_id, len(tk) AS n,
             unnest(range(0, len(tk))) AS tpos,
             unnest(tk) AS tok
      FROM t
    )
    SELECT tok.doc_id,
           CAST(max(tok.n) AS INT) AS n_tokens,
           CAST(count(cov.tpos) AS INT) AS n_dropped,
           coalesce(string_agg(CASE WHEN cov.tpos IS NULL THEN tok.tok END,
                               ' ' ORDER BY tok.tpos), '') AS clean_text
    FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.tpos = cov.tpos
    GROUP BY tok.doc_id
    """,
)
def corpus_span_dedup(spark, sf_dir):
    """Lee-et-al-style exact substring dedup: every repeated 4-token
    span keeps only its first corpus occurrence; later occurrences are
    excised at any alignment and the documents rebuilt."""
    from route81_spark.io import ensure_parallelism
    from route81_spark.ops.corpus import span_dedup_global

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    return span_dedup_global(docs, min_tokens=4)

@_q(
    "corpus_decontaminate_excise",
    # excision twin: corp = docs not in the %97 eval split; any corp
    # 5-gram present in the eval set marks tokens [pos, pos+5); merged
    # coverage excised via the span-dedup left-join pattern
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(range(1, greatest(len(tk) - 4, 0) + 1)) AS i,
             unnest(list_transform(range(1, greatest(len(tk) - 4, 0) + 1),
                    i -> coalesce(array_to_string(tk[i:i+4], ' '), '')))
               AS span
      FROM t WHERE doc_id % 97 <> 0
    ),
    bench AS (
      SELECT DISTINCT
             unnest(list_transform(range(1, greatest(len(tk) - 4, 0) + 1),
                    i -> coalesce(array_to_string(tk[i:i+4], ' '), '')))
               AS span
      FROM t WHERE doc_id % 97 = 0
    ),
    cov AS (
      SELECT DISTINCT doc_id, unnest(range(i - 1, i + 4)) AS tpos
      FROM sh JOIN bench USING (span)
    ),
    tok AS (
      SELECT doc_id, len(tk) AS n,
             unnest(range(0, len(tk))) AS tpos,
             unnest(tk) AS tok
      FROM t WHERE doc_id % 97 <> 0
    )
    SELECT tok.doc_id,
           CAST(max(tok.n) AS INT) AS n_tokens,
           CAST(count(cov.tpos) AS INT) AS n_dropped,
           coalesce(string_agg(CASE WHEN cov.tpos IS NULL THEN tok.tok END,
                               ' ' ORDER BY tok.tpos), '') AS clean_text
    FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.tpos = cov.tpos
    GROUP BY tok.doc_id
    """,
)
def corpus_decontaminate_excise(spark, sf_dir):
    """Decontamination by excision: every 97th doc plays the benchmark;
    training docs lose every verbatim 5-gram span shared with it (the
    flag-only variant is corpus_decontaminate)."""
    from route81_spark.io import ensure_parallelism
    from route81_spark.ops.corpus import decontaminate_excise

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corp = docs.filter(F.col("doc_id") % 97 != 0)
    return decontaminate_excise(corp, bench, n=5)

@_q(
    "corpus_temperature_mix",
    # XLM/mT5-style temperature sampling over the (skewed) language
    # distribution: integer weights floor(n^(1/T)*1e6+0.5) make the
    # normalizing sum order-independent; the rest is corpus_mixture's
    # largest-feasible-total acceptance with seed 'mixT'
    """
    WITH c AS (SELECT lang AS g, count(*) AS n FROM documents GROUP BY 1),
    w AS (SELECT g, n,
                 CAST(floor(pow(n, 1.0 / 2.0) * 1000000 + 0.5) AS BIGINT) AS w
          FROM c),
    tw AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM w),
    s AS (SELECT g, n, CAST(w AS DOUBLE) / wt AS s FROM w CROSS JOIN tw),
    t AS (SELECT min(n / s) AS t FROM s),
    r AS (SELECT s.g, least(CAST(1.0 AS DOUBLE), t.t * s.s / s.n) AS rate
          FROM s CROSS JOIN t)
    SELECT d.doc_id, d.lang, d.source FROM documents d JOIN r ON d.lang = r.g
    WHERE ('0x' || substr(md5('mixT|' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
          / 1152921504606846976.0 < r.rate
    """,
)
def corpus_temperature_mix(spark, sf_dir):
    """Temperature-flattened language mixture (T=2): head languages
    downsample toward sqrt-proportional shares so low-resource
    languages are over-represented relative to natural frequency."""
    from route81_spark.ops.corpus import temperature_mixture

    docs = _t(spark, sf_dir, "documents")
    return temperature_mixture(docs, "lang", 2.0).select(
        "doc_id", "lang", "source"
    )

@_q(
    "corpus_fim",
    # FIM split points regenerated from the md5-derived 60-bit hashes
    # (seed 7): sel = h(id) % 100 < 50, p1 = 1 + h(id|a) % (n-2),
    # p2 = p1 + 1 + h(id|b) % (n - p1 - 1); PSM re-ordering with the
    # same inclusive token slices
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    b AS (
      SELECT doc_id, tk, len(tk) AS n,
             ('0x' || substr(md5('7|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 100 AS sel,
             ('0x' || substr(md5('7|' || CAST(doc_id AS VARCHAR) || '|a'), 1, 15))::BIGINT AS ha,
             ('0x' || substr(md5('7|' || CAST(doc_id AS VARCHAR) || '|b'), 1, 15))::BIGINT AS hb
      FROM t
    ),
    c AS (
      SELECT doc_id, tk, n, hb, (sel < 50 AND n >= 4) AS pick,
             CASE WHEN n >= 4 THEN 1 + ha % (n - 2) END AS p1
      FROM b
    ),
    d AS (
      SELECT *, CASE WHEN pick THEN p1 + 1 + hb % (n - p1 - 1) END AS p2 FROM c
    )
    SELECT doc_id, CAST(pick AS INT) AS fim,
           CASE WHEN pick THEN
             '<fim_prefix> ' || coalesce(array_to_string(tk[1:p1], ' '), '')
             || ' <fim_suffix> ' || coalesce(array_to_string(tk[p2+1:n], ' '), '')
             || ' <fim_middle> ' || coalesce(array_to_string(tk[p1+1:p2], ' '), '')
           ELSE coalesce(array_to_string(tk, ' '), '') END AS text_out
    FROM d
    """,
)
def corpus_fim(spark, sf_dir):
    """Fill-in-the-middle augmentation at rate 0.5: hash-selected docs
    re-ordered as <fim_prefix> P <fim_suffix> S <fim_middle> M with
    integer split points; everything else passes through."""
    from route81_spark.io import ensure_parallelism
    from route81_spark.ops.corpus import fim_transform

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    return fim_transform(docs, rate=0.5)

def _bpe_oracle_sql(n: int, encode: bool = False) -> str:
    """Unrolled round-by-round DuckDB twin of ops.corpus.bpe_train_merges:
    the same wrapped-symbol wire format (chr(1) sym chr(2), chr(3)
    end-of-word), the same ONE literal replace per merge (left-to-right
    non-overlapping on both engines), the same count-desc/l-asc/r-asc
    argmax tie-break — but expressed as n chained CTE rounds with
    ROW-LIMIT argmax instead of a driver loop. MATERIALIZED pins each
    round's word table (referenced twice: pair counting + next round)
    so the unroll stays linear, not exponential.

    encode=True: instead of the merge table, return the ENCODING of
    every document against the learned merges — the final round's word
    table IS word -> merged-symbol-string, so encoding is one join of
    exploded doc tokens against it plus a positional unnest (the
    oracle stays fully self-contained: it re-derives the merges)."""
    S, E, W = "chr(1)", "chr(2)", "chr(3)"
    parts = [
        f"tok AS (SELECT unnest({_TOKS}) AS word FROM documents)",
        "wc AS (SELECT word, count(*) AS f FROM tok GROUP BY 1)",
        f"w0 AS MATERIALIZED (SELECT word, regexp_replace(word, '(.)', {S} || '\\1' || {E}, 'g')"
        f" || {S} || {W} || {E} AS w, f FROM wc)",
    ]
    for r in range(1, n + 1):
        parts += [
            f"s{r} AS (SELECT string_split(substr(w, 2, length(w) - 2), {E} || {S}) AS s, f FROM w{r - 1})",
            f"p{r} AS (SELECT unnest(range(1, len(s))) AS i, s, f FROM s{r})",
            f"pc{r} AS (SELECT s[i] AS sym_l, s[i + 1] AS sym_r, sum(f) AS cnt FROM p{r} GROUP BY 1, 2)",
            f"m{r} AS MATERIALIZED (SELECT sym_l, sym_r, cnt FROM pc{r} ORDER BY cnt DESC, sym_l, sym_r LIMIT 1)",
            # LEFT JOIN ON TRUE, not CROSS JOIN: if the corpus fully
            # merges before round r, m{r} is EMPTY and a cross join
            # would erase the word table (breaking encode mode and any
            # later round); the left join passes words through
            f"w{r} AS MATERIALIZED (SELECT word, CASE WHEN sym_l IS NULL THEN w ELSE"
            f" replace(w, {S} || sym_l || {E} || {S} || sym_r || {E},"
            f" {S} || sym_l || sym_r || {E}) END AS w, f FROM w{r - 1} LEFT JOIN m{r} ON TRUE)",
        ]
    if encode:
        parts += [
            f"dw AS (SELECT doc_id, unnest(range(0, len({_TOKS}))) AS wpos,"
            f" unnest({_TOKS}) AS word FROM documents)",
            f"enc AS (SELECT word, string_split(substr(w, 2, length(w) - 2),"
            f" {E} || {S}) AS syms FROM w{n})",
            "ex AS (SELECT doc_id, wpos, unnest(range(0, len(syms))) AS spos,"
            " unnest(syms) AS sym FROM dw JOIN enc USING (word))",
        ]
        final = (
            "SELECT doc_id, CAST(wpos AS INT) AS wpos,"
            " CAST(spos AS INT) AS spos, sym FROM ex"
        )
        return "WITH " + ",\n    ".join(parts) + "\n    " + final
    union = "\n      UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS step, sym_l, sym_r, CAST(cnt AS BIGINT) AS pair_count FROM m{r}"
        for r in range(1, n + 1)
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + union

@_q("corpus_bpe_merges", _bpe_oracle_sql(6))
def corpus_bpe_merges(spark, sf_dir):
    """Distributed BPE merge training over the corpus: 6 pair-merge
    rounds on the vocab-sized word-frequency table; the corpus itself
    is scanned once and never collected."""
    from route81_spark.ops.corpus import bpe_train_merges

    return bpe_train_merges(_t(spark, sf_dir, "documents"), 6)

@_q("corpus_bpe_encode", _bpe_oracle_sql(6, encode=True))
def corpus_bpe_encode(spark, sf_dir):
    """Train 6 BPE merges, then ENCODE the corpus with them: exploded
    (doc, word-pos, symbol-pos, subword) rows via a chain of literal
    replaces compiled from the (driver-side, vocab-bounded) merge
    table — zero joins on the Spark side; the oracle re-derives the
    merges itself and encodes by joining the final round's word table."""
    from route81_spark.ops.corpus import bpe_encode, bpe_train_merges

    docs = _t(spark, sf_dir, "documents")
    return bpe_encode(docs, bpe_train_merges(docs, 6))

@_q(
    "corpus_chat_render",
    # SQL twin: per-turn segments ordered by (ts, event_id); text via
    # ordered string_agg; mask offsets via a window sum of preceding
    # segment lengths (Spark folds the sorted turn array instead —
    # same arithmetic, no window). chr(10) = the template's literal
    # newline; '<|end|>' is 7 chars, '<|'+role+'|>\n' is len(role)+5.
    """
    WITH r AS (
      SELECT user_id AS conv_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN event_type IN ('view', 'click', 'signup')
                  THEN 'user' ELSE 'assistant' END AS role,
             event_type AS content
      FROM events
    ),
    seg AS (
      SELECT conv_id, event_id, ts, role, content,
             '<|' || role || '|>' || chr(10) || content || '<|end|>' || chr(10) AS seg,
             length(role) + 5 AS open_len,
             length(content) AS clen
      FROM r
    ),
    pos AS (
      SELECT *,
             coalesce(sum(length(seg)) OVER (
               PARTITION BY conv_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pos0
      FROM seg
    ),
    agg AS (
      SELECT conv_id, CAST(count(*) AS INT) AS n_turns,
             string_agg(seg, '' ORDER BY ts, event_id) AS text
      FROM pos GROUP BY 1
    ),
    mk AS (
      SELECT conv_id,
             flatten(list([pos0 + open_len, pos0 + open_len + clen + 7]
                          ORDER BY ts, event_id)) AS mask
      FROM pos WHERE role = 'assistant' GROUP BY 1
    )
    SELECT a.conv_id, a.n_turns, a.text,
           coalesce(array_to_string(mk.mask, ','), '') AS mask
    FROM agg a LEFT JOIN mk USING (conv_id)
""",
)
def corpus_chat_render(spark, sf_dir):
    """SFT chat-template rendering over the event log: each user's
    events become one conversation (ordered by ts, event_id; view/
    click/signup turns speak as 'user', purchase/error as
    'assistant'), rendered to '<|role|>\\n{content}<|end|>\\n' segments
    with [start, end) loss-mask char spans over assistant content +
    stop token. One conv-key shuffle; render + offsets are a pure
    Column fold over the sorted turn array."""
    from route81_spark.ops.corpus import chat_render

    ev = _t(spark, sf_dir, "events")
    turns = ev.select(
        F.col("user_id").alias("conv_id"),
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
        F.when(
            F.col("event_type").isin("view", "click", "signup"), "user"
        ).otherwise("assistant").alias("role"),
        F.col("event_type").alias("content"),
    )
    out = chat_render(turns, conv_col="conv_id", order_cols=("ts", "event_id"))
    # registry surface stringifies the span array (the checker's row
    # canonicalization str()s object cells: list vs ndarray reprs
    # diverge); the operator API keeps the typed array<long>
    return out.select(
        "conv_id",
        "n_turns",
        "text",
        F.array_join(
            F.transform("mask", lambda x: x.cast("string")), ","
        ).alias("mask"),
    )

@_q(
    "corpus_canary",
    # The oracle replants every canary from the hash arithmetic alone:
    # selection = h60 % 8 == 0, payload = decimal h60, splice position
    # p = h60 % (len+1) — the detected first-occurrence offset is then
    # p+2 by construction (substr(1..p) + ' ' + canary). Spark really
    # splices + regex-scans; SQL predicts where the scan must land.
    """
    SELECT doc_id,
           'CANARY-' || CAST(('0x' || substr(md5('canary0|payload|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS VARCHAR) AS canary,
           CAST(('0x' || substr(md5('canary0|pos|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                % (length(text) + 1) + 2 AS INT) AS found_at
    FROM documents
    WHERE ('0x' || substr(md5('canary0|sel|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 = 0
""",
)
def corpus_canary(spark, sf_dir):
    """Memorization-probe round trip through the pipeline surface:
    plant hash-rate canaries (1/8 of docs, unique 'CANARY-<h60>'
    markers at hash-derived splice points), then detect them by regex
    scan — (doc_id, canary, found_at). Both halves are pure map-side
    Column work; the planting is reproducible from the seed alone."""
    docs = _t(spark, sf_dir, "documents")
    out = apply_pipeline(
        docs,
        [
            {"$insertCanaries": {"rate": [1, 8], "seed": "canary0"}},
            {"$detectCanaries": {}},
        ],
    )
    return out

_NORM_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "{x},"
    r" '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),"
    " '[‘’‛]', '''', 'g'),"
    " '[“”‟]', '\"', 'g'),"
    " '[–—―]', '-', 'g'),"
    " '…', '...', 'g'),"
    " '[  -  　]', ' ', 'g'),"
    r" '[ \t]+', ' ', 'g'),"
    r" ' ?\n ?', chr(10), 'g'),"
    r" '\n{{3,}}', chr(10)||chr(10), 'g'),"
    r" '^\s+|\s+$', '', 'g')"
)

@_q(
    "corpus_normalize",
    # the wrapper first dirties each doc deterministically (NBSP for
    # every space, curly-quoted prefix, em dash, tab + newline runs +
    # ellipsis suffix) so the chain has real work to undo at any SF —
    # the raw synthetic docs are already clean ASCII.
    f"""
    WITH m AS (
      SELECT doc_id,
             '  “q” — ' || replace(text, ' ', chr(160))
             || ' ' || chr(9) || repeat(chr(10), 3) || '…  ' AS t
      FROM documents
    )
    SELECT doc_id, {_NORM_SQL.format(x='t')} AS clean
    FROM m
""",
)
def corpus_normalize(spark, sf_dir):
    """C4/Dolma-style character normalization: control-char strip,
    unicode punctuation/space folding, whitespace run collapse,
    paragraph-preserving newline squeeze, trim — one JVM regexp chain
    (zero shuffle, zero Python), applied here to deterministically
    dirtied docs so the oracle exercises every step."""
    from route81_spark.ops.text import normalize_text

    docs = _t(spark, sf_dir, "documents")
    messy = F.concat(
        F.lit("  “q” — "),
        F.translate(F.col("text"), " ", " "),
        F.lit(" \t\n\n\n…  "),
    )
    return docs.select("doc_id", normalize_text(messy).alias("clean"))

@_q(
    "corpus_snapshot_diff",
    # the 'new' snapshot is a deterministic mutation of documents:
    # %11==0 dropped (removed), %7==3 text-revised (changed), %13==0
    # re-added under shifted ids (added); both engines hash with
    # lowercase-hex sha256 so old/new hashes compare bytewise.
    """
    WITH newt AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 3 THEN text || ' [rev2]' ELSE text END AS text
      FROM documents WHERE doc_id % 11 <> 0
      UNION ALL
      SELECT doc_id + 10000000, 'new ' || text
      FROM documents WHERE doc_id % 13 = 0
    ),
    oh AS (SELECT doc_id, sha256(text) AS old_hash FROM documents),
    nh AS (SELECT doc_id, sha256(text) AS new_hash FROM newt)
    SELECT coalesce(oh.doc_id, nh.doc_id) AS doc_id,
           CASE WHEN oh.doc_id IS NULL THEN 'added'
                WHEN nh.doc_id IS NULL THEN 'removed'
                WHEN old_hash = new_hash THEN 'unchanged'
                ELSE 'changed' END AS status,
           old_hash, new_hash
    FROM oh FULL OUTER JOIN nh ON oh.doc_id = nh.doc_id
""",
)
def corpus_snapshot_diff(spark, sf_dir):
    """Incremental-curation diff between two corpus snapshots: each
    side reduces to (id, sha256) before ONE full-outer id join —
    added/removed/changed/unchanged per id, text never joins."""
    from route81_spark.ops.corpus import snapshot_diff

    docs = _t(spark, sf_dir, "documents")
    return snapshot_diff(docs, _snapshot_b(docs))

def _snapshot_b(docs):
    """The deterministic 'next-day' snapshot shared by the snapshot
    family (same mutation as corpus_snapshot_diff)."""
    mid = F.col("doc_id")
    return (
        docs.filter(mid % 11 != 0)
        .select(
            "doc_id",
            F.when(mid % 7 == 3, F.concat(F.col("text"), F.lit(" [rev2]")))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(mid % 13 == 0).select(
                (mid + 10000000).alias("doc_id"),
                F.concat(F.lit("new "), F.col("text")).alias("text"),
            )
        )
    )

@_q(
    "corpus_overlap_sketch",
    # exact replica of the KMV estimator: 60-bit md5 content hashes,
    # bottom-128 per side, union-sketch closure, integer counters and
    # ONE double division per estimate (det-rounded both sides)
    """
    WITH newt AS (
      SELECT CASE WHEN doc_id % 7 = 3 THEN text || ' [rev2]' ELSE text END AS text
      FROM documents WHERE doc_id % 11 <> 0
      UNION ALL
      SELECT 'new ' || text FROM documents WHERE doc_id % 13 = 0
    ),
    ah AS (SELECT DISTINCT ('0x' || substr(md5(text), 1, 15))::BIGINT AS h FROM documents),
    bh AS (SELECT DISTINCT ('0x' || substr(md5(text), 1, 15))::BIGINT AS h FROM newt),
    ak AS (SELECT h FROM ah ORDER BY h LIMIT 128),
    bk AS (SELECT h FROM bh ORDER BY h LIMIT 128),
    u AS (
      SELECT DISTINCT h FROM (SELECT h FROM ak UNION ALL SELECT h FROM bk)
      ORDER BY h LIMIT 128
    ),
    inter AS (SELECT ak.h FROM ak JOIN bk USING (h)),
    shared AS (SELECT u.h FROM u JOIN inter USING (h)),
    s AS (
      SELECT (SELECT count(*) FROM u) AS k_used,
             (SELECT max(h) FROM u) AS kth,
             (SELECT count(*) FROM ak) AS n_a,
             (SELECT count(*) FROM bk) AS n_b,
             (SELECT count(*) FROM shared) AS shared
    )
    SELECT CAST(k_used AS INT) AS k_used, CAST(n_a AS INT) AS n_a,
           CAST(n_b AS INT) AS n_b, CAST(shared AS INT) AS shared,
           floor(shared / CAST(k_used AS DOUBLE) * 1000000.0 + 0.5) / cast(1000000.0 as double) AS jaccard_est,
           CASE WHEN k_used < 128 THEN CAST(k_used AS DOUBLE)
                ELSE floor((k_used - 1) * 1152921504606846975.0 / CAST(kth AS DOUBLE)
                     * 10000.0 + 0.5) / cast(10000.0 as double)
           END AS union_est
    FROM s
    """,
)
def corpus_overlap_sketch(spark, sf_dir):
    """Cross-snapshot overlap estimated from bottom-128 KMV sketches:
    the cheap planning answer to "how much of today's crawl is already
    curated?" before paying for a real cross-corpus dedup. Kilobytes of
    sketch instead of a corpus join."""
    from route81_spark.ops.corpus import kmv_overlap_sketch

    docs = _t(spark, sf_dir, "documents")
    return kmv_overlap_sketch(docs, _snapshot_b(docs), k=128)

@_q(
    "corpus_preference_pairs",
    # ROW_NUMBER twin of the struct-max/min aggregate: chosen = rank 1
    # by (s DESC, id ASC), rejected = rank 1 by (s ASC, id DESC); the
    # quality expression is text_stats' (already green) wrapped in the
    # same empty-text guard as quality_score
    f"""
    WITH sc AS (
      SELECT doc_id, doc_id % 40 AS prompt_id,
             CASE WHEN length(text) > 0 AND len({_TOKS}) > 0 THEN
               floor((least(length(text) / 400.0, 1.0)
                     * (CAST(len(list_distinct({_TOKS})) AS DOUBLE) / len({_TOKS}))
                     * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                        / length(text))) * 1000000.0 + 0.5) / 1000000.0
             ELSE CAST(0.0 AS DOUBLE) END AS s
      FROM documents
    ),
    ch AS (
      SELECT prompt_id, doc_id AS chosen_id, s AS chosen_score FROM (
        SELECT *, row_number() OVER (PARTITION BY prompt_id
               ORDER BY s DESC, doc_id ASC) AS rn FROM sc
      ) WHERE rn = 1
    ),
    rj AS (
      SELECT prompt_id, doc_id AS rejected_id, s AS rejected_score FROM (
        SELECT *, row_number() OVER (PARTITION BY prompt_id
               ORDER BY s ASC, doc_id DESC) AS rn FROM sc
      ) WHERE rn = 1
    )
    SELECT ch.prompt_id, chosen_id, rejected_id, chosen_score, rejected_score,
           chosen_score - rejected_score AS margin
    FROM ch JOIN rj USING (prompt_id)
    WHERE chosen_score > rejected_score
    """,
)
def corpus_preference_pairs(spark, sf_dir):
    """DPO preference-pair construction: per prompt group (synthetic
    prompt_id = doc_id % 40 on the fixture), best-vs-worst candidate by
    the deterministic quality score, strict-margin pairs only. One
    map-side-combined aggregate; candidate text never shuffles."""
    from route81_spark.ops.corpus import preference_pairs

    docs = _t(spark, sf_dir, "documents").withColumn(
        "prompt_id", F.col("doc_id") % 40
    )
    return preference_pairs(docs, group_col="prompt_id")

@_q(
    "corpus_bloom_dedup",
    # mirror of ops.corpus.bloom_paragraph_dedup: the oracle replays
    # Bloom semantics with SET membership — a probe unit is 'seen' iff
    # all 3 of its md5-derived bit positions (mod 2^20) appear among
    # the reference slice's positions. Identical to the bitmap because
    # a bit is set iff some reference unit hashed onto that position
    # (false positives = cross-unit position collisions, reproduced
    # exactly). Units are the 4-token windows of the line-dedup
    # arithmetic; ref slice = md5 60-bit doc hash < 2^59.
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    c AS (SELECT doc_id, tk,
                 greatest(CAST(floor((len(tk) + 3) / 4.0) AS INT), 1) AS nc,
                 ('0x' || substr(md5('bloomsplit0|' || CAST(doc_id AS VARCHAR)),
                                 1, 15))::BIGINT < 576460752303423488 AS is_ref
          FROM t),
    ln AS (
      SELECT doc_id, is_ref,
             unnest(range(1, nc + 1)) AS i,
             unnest(list_transform(range(1, nc + 1),
                    i -> coalesce(array_to_string(tk[(i-1)*4+1:(i-1)*4+4], ' '), '')))
               AS txt
      FROM c
    ),
    hb AS (
      SELECT doc_id, is_ref, i, txt,
             ('0x' || substr(md5('bloom0|' || txt), 1, 15))::BIGINT AS base
      FROM ln
    ),
    hp AS (
      SELECT doc_id, is_ref, i, txt,
             (((base & 2147483647) + 0*(2*(base >> 31)+1))
               % 2147483647) % 1048576 AS h0,
             (((base & 2147483647) + 1*(2*(base >> 31)+1))
               % 2147483647) % 1048576 AS h1,
             (((base & 2147483647) + 2*(2*(base >> 31)+1))
               % 2147483647) % 1048576 AS h2
      FROM hb
    ),
    refbits AS (
      SELECT DISTINCT p FROM (
        SELECT unnest([h0, h1, h2]) AS p FROM hp WHERE is_ref)
    ),
    probe AS (
      SELECT doc_id, i, txt,
             (h0 IN (SELECT p FROM refbits))
             AND (h1 IN (SELECT p FROM refbits))
             AND (h2 IN (SELECT p FROM refbits)) AS s
      FROM hp WHERE NOT is_ref
    )
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_units,
           CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS INT) AS n_seen,
           coalesce(string_agg(CASE WHEN NOT s THEN txt END, ' ' ORDER BY i), '')
             AS clean_text
    FROM probe GROUP BY doc_id
""",
)
def corpus_bloom_dedup(spark, sf_dir):
    """Dolma-style incremental-ingestion Bloom dedup: the
    already-ingested half of the corpus (deterministic hash split)
    builds a 2^20-bit / 3-hash paragraph Bloom bitmap; every unit of
    the other half is dropped iff the filter claims it was seen, and
    the probe docs are rebuilt. The probe pass is a pure per-row
    projection against the 128 KiB bitmap literal — zero shuffles,
    stream-legal."""
    from route81_spark.ops.corpus import _h60, bloom_paragraph_dedup

    # NOT spread: interleaved A/B at sf0.1 (min of 5, one session) —
    # unspread 0.98 s vs spread 1.46 s: the round-robin exchange ships
    # the raw text (both the bitmap-build side and the probe side) and
    # costs more than the single-task map stages it parallelizes; at
    # scale multi-split inputs parallelize those stages for free
    docs = _t(spark, sf_dir, "documents")
    ref = _h60(F.col("doc_id"), "bloomsplit0") < F.lit(1 << 59)
    return bloom_paragraph_dedup(docs, ref, window=4)

@_q(
    "corpus_cdc_chunks",
    # mirror of ops.dedup.cdc_chunk_stats: boundary after 1-based char
    # position j (8 <= j < len) iff the md5 60-bit hash of the 8 chars
    # ending at j is 0 mod 16; chunks hashed with a second md5 seed;
    # each chunk-hash's first (doc, pos) occurrence is free, every
    # repeat charges its bytes as duplicated. DuckDB picks winners with
    # ROW_NUMBER where Spark reduces min(struct(doc,pos)) — same
    # winner, skew-safe shape on the Spark side.
    """
    WITH d AS (SELECT doc_id, text, CAST(length(text) AS INT) AS L FROM documents),
    b AS (SELECT doc_id, text, L,
            CASE WHEN L >= 9 THEN
              list_filter(range(8, L), j ->
                ('0x' || substr(md5('cdcb0|' || substr(text, CAST(j - 7 AS INT), 8)),
                                1, 15))::BIGINT % 16 = 0)
            ELSE []::BIGINT[] END AS bnd
          FROM d),
    s AS (SELECT doc_id, text, L,
                 [1] || list_transform(bnd, x -> x + 1) AS st,
                 bnd || [L] AS en
          FROM b),
    ch AS (SELECT doc_id,
                  unnest(range(1, len(st) + 1)) AS i,
                  unnest(list_transform(range(1, len(st) + 1),
                         i -> substr(text, CAST(st[i] AS INT),
                                     CAST(en[i] - st[i] + 1 AS INT)))) AS c,
                  unnest(list_transform(range(1, len(st) + 1),
                         i -> en[i] - st[i] + 1)) AS clen
           FROM s),
    h AS (SELECT doc_id, i, clen,
                 ('0x' || substr(md5('cdcc0|' || c), 1, 15))::BIGINT AS chash
          FROM ch),
    r AS (SELECT doc_id, i, clen,
                 ROW_NUMBER() OVER (PARTITION BY chash ORDER BY doc_id, i) AS rn
          FROM h)
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_chunks,
           CAST(sum(clen) AS BIGINT) AS total_chars,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS INT) AS n_dup_chunks,
           CAST(sum(CASE WHEN rn > 1 THEN clen ELSE 0 END) AS BIGINT) AS dup_chars
    FROM r GROUP BY doc_id
""",
)
def corpus_cdc_chunks(spark, sf_dir):
    """Content-defined chunking + corpus-wide chunk dedup accounting
    (the crawl-snapshot storage primitive): boundaries move with the
    content so local edits re-align, every repeated chunk's bytes are
    charged to the doc that repeats it. Chunk text reduces to
    (hash, len) per row; only integer tuples shuffle."""
    from route81_spark.io import ensure_parallelism
    from route81_spark.ops.dedup import cdc_chunk_stats

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    return cdc_chunk_stats(docs)

@_q(
    "corpus_zipf",
    # mirror of ops.corpus.zipf_fit: token counts, top-256 by
    # (cnt DESC, tok ASC), then the SAME sequential left fold over the
    # sorted counts both engines (0.0-init == first-element-init in
    # IEEE); ln() verified bit-identical libm both sides; final slope
    # det-rounded at 1e-6.
    f"""
    WITH t AS (SELECT {_TOKS} AS tk FROM documents),
    w AS (SELECT unnest(tk) AS tok FROM t),
    c AS (SELECT tok, count(*) AS cnt FROM w GROUP BY tok),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_types,
                   CAST(sum(cnt) AS BIGINT) AS n_tokens FROM c),
    top AS (SELECT cnt, tok FROM c ORDER BY cnt DESC, tok ASC LIMIT 256),
    l AS (SELECT list(cnt ORDER BY cnt DESC, tok ASC) AS cl FROM top),
    f AS (SELECT
      CAST(len(cl) AS INT) AS n_top,
      cl[1] AS top_count,
      CAST(len(cl) AS DOUBLE) AS n,
      list_reduce(list_transform(range(1, len(cl) + 1),
        i -> ln(CAST(i AS DOUBLE))), (a, b) -> a + b) AS sx,
      list_reduce(list_transform(cl,
        x -> ln(CAST(x AS DOUBLE))), (a, b) -> a + b) AS sy,
      list_reduce(list_transform(range(1, len(cl) + 1),
        i -> ln(CAST(i AS DOUBLE)) * ln(CAST(i AS DOUBLE))), (a, b) -> a + b) AS sxx,
      list_reduce(list_transform(range(1, len(cl) + 1),
        i -> ln(CAST(i AS DOUBLE)) * ln(CAST(cl[i] AS DOUBLE))), (a, b) -> a + b) AS sxy
      FROM l)
    SELECT n_types, n_tokens, n_top, top_count,
           floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1000000.0 + 0.5)
             / 1000000.0 AS zipf_slope
    FROM tot CROSS JOIN f
""",
)
def corpus_zipf(spark, sf_dir):
    """Zipf-law corpus diagnostic: ln-ln least-squares slope over the
    top-256 token frequencies — natural text sits near -1; the
    whole-corpus health check beside the dataset card."""
    from route81_spark.ops.corpus import zipf_fit

    # NOT spread: interleaved A/B at sf0.1 (min of 5, one session) —
    # with zipf_fit's fan-out checkpoint, unspread 0.345 s vs spread
    # 0.781 s: the round-robin exchange ships the raw text and costs
    # more than the single-task tokenize it parallelizes; at scale
    # multi-split inputs parallelize the map stage for free
    docs = _t(spark, sf_dir, "documents")
    return zipf_fit(docs)

@_q(
    "corpus_intradoc_dedup",
    # mirror of ops.corpus.intradoc_line_dedup: keep-first WITHIN each
    # doc (ROW_NUMBER per (doc, txt) in the oracle vs per-row
    # array_position in Spark — same winner), 4-token line units.
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    c AS (SELECT doc_id, tk,
                 greatest(CAST(floor((len(tk) + 3) / 4.0) AS INT), 1) AS nc
          FROM t),
    ln AS (
      SELECT doc_id,
             unnest(range(1, nc + 1)) AS i,
             unnest(list_transform(range(1, nc + 1),
                    i -> coalesce(array_to_string(tk[(i-1)*4+1:(i-1)*4+4], ' '), '')))
               AS txt
      FROM c
    ),
    r AS (SELECT doc_id, i, txt,
                 ROW_NUMBER() OVER (PARTITION BY doc_id, txt ORDER BY i) AS rn
          FROM ln)
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_lines,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT) AS n_kept,
           coalesce(string_agg(CASE WHEN rn = 1 THEN txt END, ' ' ORDER BY i), '')
             AS clean_text
    FROM r GROUP BY doc_id
""",
)
def corpus_intradoc_dedup(spark, sf_dir):
    """Within-document repeated-line removal (Gopher-class intra-doc
    repetition scrub): keep-first per doc, pure per-row projection —
    zero shuffles, stream-legal."""
    from route81_spark.io import ensure_parallelism
    from route81_spark.ops.corpus import intradoc_line_dedup

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    return intradoc_line_dedup(docs, window=4)

@_q(
    "corpus_budget_select",
    # quality_classifier's integer model (seed 13 oracle twin above)
    # feeding greedy budget selection: integer floor-div priority
    # (score*1e6 // n_bigrams), cumulative (n_bigrams+1) token proxy,
    # keep the prefix fitting 15000 tokens.
    f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS} AS tk FROM documents),
    p AS (
      SELECT doc_id, lang = 'en' AS tgt,
             unnest(list_transform(range(1, greatest(len(tk) - 1, 1) + 1),
                    i -> coalesce(array_to_string(tk[i:i+1], ' '), ''))) AS bg
      FROM t
    ),
    pairs AS (
      SELECT doc_id, tgt,
             ('0x' || substr(md5('13|' || bg), 1, 15))::BIGINT % 256 AS b
      FROM p WHERE contains(bg, ' ')
    ),
    doc_bucket AS (
      SELECT doc_id, tgt, b, count(*) AS n_db FROM pairs GROUP BY 1, 2, 3
    ),
    by_bucket AS (
      SELECT b,
             sum(CASE WHEN tgt THEN n_db ELSE 0 END) AS pos_c,
             sum(CASE WHEN NOT tgt THEN n_db ELSE 0 END) AS neg_c
      FROM doc_bucket GROUP BY b
    ),
    tot AS (SELECT sum(pos_c) AS npos, sum(neg_c) AS nneg FROM by_bucket),
    model AS (
      SELECT b,
             CAST(((pos_c + 1) * (nneg + 256) * 10000)
               // ((neg_c + 1) * (npos + 256)) AS BIGINT) AS w
      FROM by_bucket CROSS JOIN tot
    ),
    s AS (
      SELECT d.doc_id,
             CAST(sum(d.n_db) AS BIGINT) AS n_bigrams,
             CAST(sum(d.n_db * m.w) AS BIGINT) AS score
      FROM doc_bucket d JOIN model m USING (b)
      GROUP BY 1
    ),
    r AS (SELECT doc_id,
                 (score * 1000000) // n_bigrams AS priority,
                 n_bigrams + 1 AS n_tokens
          FROM s),
    c AS (SELECT doc_id, priority, n_tokens,
                 CAST(ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id) AS INT)
                   AS sel_rank,
                 CAST(sum(n_tokens) OVER (ORDER BY priority DESC, doc_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
          FROM r)
    SELECT doc_id, priority, n_tokens, sel_rank, cum_tokens
    FROM c WHERE cum_tokens <= 15000
""",
)
def corpus_budget_select(spark, sf_dir):
    """Greedy token-budget data selection: quality-classifier mean odds
    as integer priority, keep the best-first prefix fitting 15k tokens
    — the budget-bound tail of the curation funnel."""
    from route81_spark.ops.corpus import budget_select, quality_classifier

    docs = _t(spark, sf_dir, "documents")
    scored = quality_classifier(docs, F.col("lang") == "en").select(
        "doc_id",
        F.expr("CAST((score * 1000000) DIV n_bigrams AS LONG)").alias("priority"),
        (F.col("n_bigrams") + 1).cast("long").alias("n_tokens"),
    )
    return budget_select(scored, "priority", "n_tokens", budget=15000)

@_q(
    "corpus_gate_attribution",
    # mirror of ops.text.gate_attribution at (en, 0.05, 20..80):
    # per-rule marginal fails + waterfall first-fails in declared order
    # lang -> quality -> too_short -> too_long, plus the pass row.
    f"""
    WITH f AS (
      SELECT
        ({_LANG_SQL.format(T=_TOKS)}) <> 'en' AS f_lang,
        ({_QUALITY_SQL.format(T=_TOKS)}) < 0.05 AS f_quality,
        len({_TOKS}) < 20 AS f_short,
        len({_TOKS}) > 80 AS f_long
      FROM documents
    ),
    a AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN f_lang THEN 1 ELSE 0 END) AS BIGINT) AS m_lang,
        CAST(sum(CASE WHEN f_quality THEN 1 ELSE 0 END) AS BIGINT) AS m_quality,
        CAST(sum(CASE WHEN f_short THEN 1 ELSE 0 END) AS BIGINT) AS m_short,
        CAST(sum(CASE WHEN f_long THEN 1 ELSE 0 END) AS BIGINT) AS m_long,
        CAST(sum(CASE WHEN f_lang THEN 1 ELSE 0 END) AS BIGINT) AS w_lang,
        CAST(sum(CASE WHEN NOT f_lang AND f_quality THEN 1 ELSE 0 END) AS BIGINT)
          AS w_quality,
        CAST(sum(CASE WHEN NOT f_lang AND NOT f_quality AND f_short
                 THEN 1 ELSE 0 END) AS BIGINT) AS w_short,
        CAST(sum(CASE WHEN NOT f_lang AND NOT f_quality AND NOT f_short
                 AND f_long THEN 1 ELSE 0 END) AS BIGINT) AS w_long
      FROM f
    ),
    rows_ AS (
      SELECT n, 'lang' AS rule, m_lang AS n_fail, w_lang AS n_first_fail FROM a
      UNION ALL SELECT n, 'quality', m_quality, w_quality FROM a
      UNION ALL SELECT n, 'too_short', m_short, w_short FROM a
      UNION ALL SELECT n, 'too_long', m_long, w_long FROM a
      UNION ALL SELECT n, 'pass', 0,
                 n - w_lang - w_quality - w_short - w_long FROM a
    )
    SELECT rule, n_fail, n_first_fail,
           floor(CAST(n_first_fail AS DOUBLE) / n * 1000000.0 + 0.5)
             / 1000000.0 AS share
    FROM rows_
""",
)
def corpus_gate_attribution(spark, sf_dir):
    """Per-rule drop attribution for the curation gate (funnel
    observability): marginal fail counts + waterfall first-fail
    attribution summing to total drops, one bound tokenization per
    row, single map-side aggregate."""
    from route81_spark.ops.text import gate_attribution

    docs = _t(spark, sf_dir, "documents")
    return gate_attribution(docs, min_tokens=20, max_tokens=80)

@_q(
    "corpus_drift",
    # mirror of ops.corpus.distribution_drift over the snapshot_diff
    # mutation (drop %11, revise %7 adds a ' [rev2]' token, %13 docs
    # duplicated with a 'new' prefix token): integer cross-multiplied
    # TV numerator, one det-rounded division at the end.
    f"""
    WITH newt AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 3 THEN text || ' [rev2]' ELSE text END AS text
      FROM documents WHERE doc_id % 11 <> 0
      UNION ALL
      SELECT doc_id + 10000000, 'new ' || text
      FROM documents WHERE doc_id % 13 = 0
    ),
    ca AS (SELECT tok, CAST(count(*) AS BIGINT) AS ca FROM
             (SELECT unnest({_TOKS}) AS tok FROM documents) GROUP BY tok),
    cb AS (SELECT tok, CAST(count(*) AS BIGINT) AS cb FROM
             (SELECT unnest({_TOKS}) AS tok FROM newt) GROUP BY tok),
    j AS (SELECT coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
          FROM ca FULL OUTER JOIN cb USING (tok)),
    agg AS (SELECT CAST(count(*) AS INT) AS n_types_union,
                   CAST(sum(ca) AS BIGINT) AS n_tokens_a,
                   CAST(sum(cb) AS BIGINT) AS n_tokens_b
            FROM j),
    tv AS (SELECT CAST(sum(abs(ca * n_tokens_b - cb * n_tokens_a)) AS BIGINT)
                    AS tv_num
           FROM j CROSS JOIN agg)
    SELECT n_types_union, n_tokens_a, n_tokens_b, tv_num,
           floor(CAST(tv_num AS DOUBLE)
                 / (2.0 * n_tokens_a * n_tokens_b) * 1000000.0 + 0.5)
             / 1000000.0 AS tv_distance
    FROM agg CROSS JOIN tv
""",
)
def corpus_drift(spark, sf_dir):
    """Snapshot-to-snapshot token-distribution drift (total-variation
    distance, integer-exact numerator): each side reduces to its
    vocab-sized count table, one full-outer token join, one scalar agg
    — the source-health monitor ahead of recuration."""
    from route81_spark.ops.corpus import distribution_drift

    # NOT spread: measured A/B at sf0.1 — the round-robin exchange
    # ships the raw text and costs more than the single-task tokenize
    # it parallelizes (noop of the joined count table: 0.43 s raw scan
    # vs 1.25 s spread); at scale multi-split inputs parallelize the
    # map stage for free
    docs = _t(spark, sf_dir, "documents")
    mid = F.col("doc_id")
    new = (
        docs.filter(mid % 11 != 0)
        .select(
            "doc_id",
            F.when(mid % 7 == 3, F.concat(F.col("text"), F.lit(" [rev2]")))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(mid % 13 == 0).select(
                (mid + 10000000).alias("doc_id"),
                F.concat(F.lit("new "), F.col("text")).alias("text"),
            )
        )
    )
    return distribution_drift(docs, new)

@_q(
    "corpus_incremental_curation",
    # mirror of ops.corpus.incremental_curation — the composed day-2
    # pipeline from proven fragments: snapshot_diff's mutation + hash
    # classification, the corpus_curation gate (lang/quality/length),
    # and corpus_bloom_dedup's set-membership Bloom twin with the OLD
    # corpus as the reference slice.
    f"""
    WITH newt AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 3 THEN text || ' [rev2]' ELSE text END AS text
      FROM documents WHERE doc_id % 11 <> 0
      UNION ALL
      SELECT doc_id + 10000000, 'new ' || text
      FROM documents WHERE doc_id % 13 = 0
    ),
    oh AS (SELECT doc_id, sha256(text) AS h FROM documents),
    nh AS (SELECT doc_id, sha256(text) AS h FROM newt),
    delta AS (
      SELECT nh.doc_id,
             CASE WHEN oh.doc_id IS NULL THEN 'added' ELSE 'changed' END AS status
      FROM nh LEFT JOIN oh ON nh.doc_id = oh.doc_id
      WHERE oh.doc_id IS NULL OR oh.h <> nh.h
    ),
    cand AS (SELECT n.doc_id, n.text, d.status
             FROM newt n JOIN delta d ON n.doc_id = d.doc_id),
    gated AS (
      SELECT * FROM cand
      WHERE {_LANG_SQL.format(T=_TOKS)} = 'en'
        AND {_QUALITY_SQL.format(T=_TOKS)} >= 0.05
        AND len({_TOKS}) BETWEEN 5 AND 1000000
    ),
    t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    c AS (SELECT doc_id, tk,
                 greatest(CAST(floor((len(tk) + 3) / 4.0) AS INT), 1) AS nc
          FROM t),
    ln AS (
      SELECT doc_id,
             unnest(list_transform(range(1, nc + 1),
                    i -> coalesce(array_to_string(tk[(i-1)*4+1:(i-1)*4+4], ' '), '')))
               AS txt
      FROM c
    ),
    refbits AS (
      SELECT DISTINCT p FROM (
        SELECT unnest(list_transform(range(0, 3), i ->
          (((base & 2147483647) + i*(2*(base >> 31)+1))
            % 2147483647) % 1048576)) AS p
        FROM (SELECT ('0x' || substr(md5('bloom0|' || txt), 1, 15))::BIGINT
                AS base FROM ln))
    ),
    tg AS (SELECT doc_id, status, {_TOKS} AS tk FROM gated),
    cg AS (SELECT doc_id, status, tk,
                  greatest(CAST(floor((len(tk) + 3) / 4.0) AS INT), 1) AS nc
           FROM tg),
    lng AS (
      SELECT doc_id, status,
             unnest(range(1, nc + 1)) AS i,
             unnest(list_transform(range(1, nc + 1),
                    i -> coalesce(array_to_string(tk[(i-1)*4+1:(i-1)*4+4], ' '), '')))
               AS txt
      FROM cg
    ),
    probe AS (
      SELECT doc_id, status, i, txt,
             ((h1g % 2147483647) % 1048576 IN (SELECT p FROM refbits))
             AND (((h1g + st) % 2147483647) % 1048576 IN (SELECT p FROM refbits))
             AND (((h1g + 2*st) % 2147483647) % 1048576 IN (SELECT p FROM refbits))
               AS s
      FROM (SELECT doc_id, status, i, txt,
                   (('0x' || substr(md5('bloom0|' || txt), 1, 15))::BIGINT
                     & 2147483647) AS h1g,
                   (2*(('0x' || substr(md5('bloom0|' || txt), 1, 15))::BIGINT
                     >> 31)+1) AS st
            FROM lng)
    )
    SELECT doc_id, status,
           CAST(count(*) AS INT) AS n_units,
           CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS INT) AS n_seen,
           coalesce(string_agg(CASE WHEN NOT s THEN txt END, ' ' ORDER BY i), '')
             AS clean_text
    FROM probe GROUP BY doc_id, status
""",
)
def corpus_incremental_curation(spark, sf_dir):
    """End-to-end incremental (day-2) curation: snapshot diff finds
    added/changed ids, the quality gate screens them, and yesterday's
    Bloom index scrubs every paragraph already ingested — unchanged
    docs are never reprocessed, and only the day's delta pays the
    expensive paths."""
    from route81_spark.ops.corpus import incremental_curation

    # NOT spread: measured A/B at sf0.1 — the round-robin exchange
    # ships the raw text twice (old + new side) and cost more than the
    # single-task map stages it parallelized (exec 0.69 -> 1.6 s);
    # at scale multi-split inputs parallelize the map stages for free
    docs = _t(spark, sf_dir, "documents")
    return incremental_curation(docs, _snapshot_b(docs))
