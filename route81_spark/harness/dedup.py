"""Deduplication family: exact, minhash/LSH, simhash, containment, incremental, edit-distance, cluster assembly."""

from __future__ import annotations

from pyspark.sql import functions as F
from route81_spark.ops import dedup as D
from route81_spark.ops.util import det_round_sql
from ._shared import _SH_SQL, _TOKS, _minhash_sql_expr, _q, _t

@_q(
    "dedup_exact",
    """
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS chash,
           min(doc_id) AS keep_id, count(*) AS n_docs
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark, sf_dir):
    return D.exact_dedup_groups(_t(spark, sf_dir, "documents"))

@_q(
    "dedup_minhash_sig",
    f"""
    WITH t AS (SELECT doc_id, {_SH_SQL} AS sh FROM documents)
    SELECT doc_id,
           {", ".join(f"{_minhash_sql_expr(j)} AS mh{j}" for j in range(8))}
    FROM t
    """,
)
def dedup_minhash_sig(spark, sf_dir):
    return D.minhash_signatures(_t(spark, sf_dir, "documents"), k=8)

@_q(
    "dedup_lsh_jaccard",
    f"""
    WITH t AS (SELECT doc_id, {_SH_SQL} AS sh FROM documents),
    sigs AS (
      SELECT doc_id, sh,
             [{", ".join(_minhash_sql_expr(j) for j in range(8))}] AS sig
      FROM t
    ),
    bands AS (
      SELECT doc_id, b,
             md5(array_to_string(sig[b*4+1:b*4+4], ',')) AS bh
      FROM sigs, (SELECT unnest(range(2)) AS b)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
    )
    SELECT p.id_a, p.id_b,
           floor((CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa.sh, sb.sh)))) * 1000000.0 + 0.5)
             / 1000000.0 AS jaccard
    FROM pairs p
    JOIN sigs sa ON sa.doc_id = p.id_a
    JOIN sigs sb ON sb.doc_id = p.id_b
    """,
)
def dedup_lsh_jaccard(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = D.lsh_candidates(docs, k=8, bands=2)
    return D.ngram_jaccard_pairs(docs, pairs)

@_q(
    "dedup_simhash",
    """
    WITH t AS (
      SELECT doc_id,
             list_transform(string_split_regex(trim(text), '\\s+'),
                            tk -> ('0x' || substr(md5('0|' || tk), 1, 15))::BIGINT) AS hl
      FROM documents
    )
    SELECT doc_id,
           CAST({bits} AS BIGINT) AS sh
    FROM t
    """.format(
        bits=" + ".join(
            f"(CASE WHEN list_sum(list_transform(hl, h -> CASE WHEN (h >> {b}) & 1 = 1"
            f" THEN 1 ELSE -1 END)) > 0 THEN {2**b} ELSE 0 END)"
            for b in range(16)
        )
    ),
)
def dedup_simhash(spark, sf_dir):
    from route81_spark.io import ensure_parallelism

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    return docs.select("doc_id", D.simhash(F.col("text"), n_bits=16).alias("sh"))

@_q(
    "dedup_end_to_end",
    f"""
    WITH RECURSIVE
    survivors AS (
      SELECT d.* FROM documents d
      JOIN (SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) h,
                   min(doc_id) keep_id
            FROM documents GROUP BY 1) x ON d.doc_id = x.keep_id
    ),
    t AS (SELECT doc_id, {{sh}} AS sh FROM survivors),
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
    SELECT s.doc_id, s.lang, s.source
    FROM survivors s LEFT JOIN losers l ON s.doc_id = l.doc_id
    WHERE l.doc_id IS NULL
    """.replace(
        "{sh}",
        _SH_SQL.replace("FROM documents", "").replace("text", "text"),
    ),
)
def dedup_end_to_end(spark, sf_dir):
    out = D.near_dedup(_t(spark, sf_dir, "documents"), jaccard_threshold=0.5)
    return out.select("doc_id", "lang", "source")

_PAIRS_SQL = f"""
    t AS (SELECT doc_id, {_SH_SQL} AS sh FROM documents),
    sigs AS (
      SELECT doc_id, sh,
             [{", ".join(_minhash_sql_expr(j) for j in range(8))}] AS sig
      FROM t
    ),
    bands AS (
      SELECT doc_id, b,
             md5(array_to_string(sig[b*4+1:b*4+4], ',')) AS bh
      FROM sigs, (SELECT unnest(range(2)) AS b)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
    )
"""

@_q(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_PAIRS_SQL},
    bi AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT DISTINCT src, src FROM bi
      UNION
      SELECT bi.src, reach.r FROM bi JOIN reach ON bi.dst = reach.id
    )
    SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
    """,
)
def dedup_clusters(spark, sf_dir):
    # candidate pairs -> connected components -> one cluster id per doc
    docs = _t(spark, sf_dir, "documents")
    pairs = D.lsh_candidates(docs, k=8, bands=2)
    return D.near_dup_clusters(pairs)

@_q(
    "dedup_incremental",
    f"""
    WITH idx AS (SELECT * FROM documents WHERE doc_id % 3 = 0),
    nw AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
    surv AS (
      SELECT n.* FROM nw n
      WHERE md5(regexp_replace(lower(trim(n.text)), '\\s+', ' ', 'g')) NOT IN
            (SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
             FROM idx)
    ),
    tn AS (SELECT doc_id, {_SH_SQL} AS sh FROM surv),
    ti AS (SELECT doc_id, {_SH_SQL} AS sh FROM idx),
    sign AS (
      SELECT doc_id, sh,
             [{", ".join(_minhash_sql_expr(j) for j in range(8))}] AS sig
      FROM tn
    ),
    sigi AS (
      SELECT doc_id, sh,
             [{", ".join(_minhash_sql_expr(j) for j in range(8))}] AS sig
      FROM ti
    ),
    bandn AS (
      SELECT doc_id, b, md5(array_to_string(sig[b*4+1:b*4+4], ',')) AS bh
      FROM sign, (SELECT unnest(range(2)) AS b)
    ),
    bandi AS (
      SELECT doc_id, b, md5(array_to_string(sig[b*4+1:b*4+4], ',')) AS bh
      FROM sigi, (SELECT unnest(range(2)) AS b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandn a JOIN bandi b ON a.b = b.b AND a.bh = b.bh
    ),
    losers AS (
      SELECT DISTINCT c.id_a
      FROM cand c
      JOIN sign sa ON sa.doc_id = c.id_a
      JOIN sigi sb ON sb.doc_id = c.id_b
      WHERE floor((CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                  / len(list_distinct(list_concat(sa.sh, sb.sh))))
                  * 1000000.0 + 0.5) / 1000000.0 >= 0.5
    )
    SELECT doc_id FROM surv WHERE doc_id NOT IN (SELECT id_a FROM losers)
    """,
)
def dedup_incremental(spark, sf_dir):
    # incremental-ingest dedup: every 3rd doc plays the accepted index;
    # the rest are the new batch — exact + near dups vs the index drop,
    # index untouched, batch-internal dups out of scope by contract
    docs = _t(spark, sf_dir, "documents")
    index = docs.filter(F.col("doc_id") % 3 == 0)
    new = docs.filter(F.col("doc_id") % 3 != 0)
    return D.dedup_against(new, index).select("doc_id")

@_q(
    "dedup_edit_distance",
    f"""
    WITH {_PAIRS_SQL}
    SELECT p.id_a, p.id_b,
           CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist,
           {det_round_sql(
               "CAST(levenshtein(a.text, b.text) AS DOUBLE)"
               " / greatest(length(a.text), length(b.text))", 6)} AS norm_dist
    FROM pairs p
    JOIN documents a ON a.doc_id = p.id_a
    JOIN documents b ON b.doc_id = p.id_b
    WHERE CAST(levenshtein(a.text, b.text) AS DOUBLE)
          / greatest(length(a.text), length(b.text)) <= 0.2
    """,
)
def dedup_edit_distance(spark, sf_dir):
    """Character-level near-dup verification: LSH candidates scored by
    exact Levenshtein distance (built-in, JVM-side both engines) and
    kept under 20% normalized edit distance — the verifier of choice
    for short/near-identical texts where shingle Jaccard is coarse.
    The O(len^2) DP runs only on candidate pairs, never corpus-wide."""
    docs = _t(spark, sf_dir, "documents")
    pairs = D.lsh_candidates(docs, k=8, bands=2)
    return D.edit_distance_pairs(docs, pairs, max_norm=0.2)

@_q(
    "dedup_containment",
    # mirror of ops.dedup.containment_pairs: distinct 3-token shingle
    # sets (md5 60-bit, seed 19), stop-shingle prune at df>32, exact
    # intersection via the inverted-index self-join, integer
    # cross-product threshold 2*inter >= min(|A|,|B|). DuckDB joins
    # where Spark joins — same sets, same winners.
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    sg AS (
      SELECT DISTINCT doc_id AS i,
             ('0x' || substr(md5('19|' || s), 1, 15))::BIGINT AS h
      FROM (SELECT doc_id,
                   unnest(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
                          i -> coalesce(array_to_string(tk[i:i+2], ' '), ''))) AS s
            FROM t)
    ),
    sz AS (SELECT i, CAST(count(*) AS BIGINT) AS sz FROM sg GROUP BY i),
    hot AS (SELECT h FROM sg GROUP BY h HAVING count(*) > 32),
    pr AS (SELECT i, h FROM sg WHERE h NOT IN (SELECT h FROM hot)),
    pairs AS (
      SELECT a.i AS id_a, b.i AS id_b, CAST(count(*) AS BIGINT) AS inter
      FROM pr a JOIN pr b ON a.h = b.h AND a.i < b.i
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, inter, sa.sz AS size_a, sb.sz AS size_b,
           floor(CAST(inter AS DOUBLE) / least(sa.sz, sb.sz) * 1000000.0 + 0.5)
             / 1000000.0 AS containment
    FROM pairs JOIN sz sa ON sa.i = id_a JOIN sz sb ON sb.i = id_b
    WHERE inter * 2 >= least(sa.sz, sb.sz) * 1
""",
)
def dedup_containment(spark, sf_dir):
    """Asymmetric shingle-set containment pairs (quote/extraction
    detection): |A∩B|/min(|A|,|B|) >= 1/2 over exact 3-token shingle
    sets — the doc-inside-doc relation Jaccard resemblance scores near
    zero. Inverted-index self-join with a df>32 stop-shingle guard;
    never all-pairs."""
    from route81_spark.io import ensure_parallelism
    from route81_spark.ops.dedup import containment_pairs

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    return containment_pairs(docs)

@_q(
    "dedup_minhash_merge",
    # mirror of ops.dedup.merge_minhash_signatures: snapshot A = even
    # ids, snapshot B = ids % 3 == 0 (overlap at % 6 == 0, B's text
    # tagged with an extra token so shared ids genuinely differ);
    # elementwise least over a full-outer id join, one-sided ids pass
    # through. Signatures are the dedup_minhash_sig arithmetic.
    f"""
    WITH ta AS (SELECT doc_id, {_SH_SQL} AS sh FROM documents WHERE doc_id % 2 = 0),
    tb AS (SELECT doc_id,
                  {_SH_SQL.replace("trim(text)", "trim(text || ' snapB')")} AS sh
           FROM documents WHERE doc_id % 3 = 0),
    sa AS (SELECT doc_id,
                  {", ".join(f"{_minhash_sql_expr(j)} AS a{j}" for j in range(8))}
           FROM ta),
    sb AS (SELECT doc_id,
                  {", ".join(f"{_minhash_sql_expr(j)} AS b{j}" for j in range(8))}
           FROM tb)
    SELECT coalesce(sa.doc_id, sb.doc_id) AS doc_id,
           {", ".join(
               f"least(coalesce(a{j}, b{j}), coalesce(b{j}, a{j})) AS mh{j}"
               for j in range(8)
           )}
    FROM sa FULL OUTER JOIN sb ON sa.doc_id = sb.doc_id
""",
)
def dedup_minhash_merge(spark, sf_dir):
    """Incremental near-dup index maintenance: merge two snapshot
    signature tables by elementwise min (sig(S1 ∪ S2) identity — old
    text never rehashes). Full-outer id join carrying k longs per row."""
    from route81_spark.ops.dedup import merge_minhash_signatures, minhash_signatures

    # NOT spread: interleaved A/B at sf0.1 (min of 8, every run lower)
    # — unspread 1.06 s vs spread 1.51 s: the round-robin exchange
    # ships the raw text TWICE (once per snapshot side) and costs more
    # than the single-task signature maps it parallelizes; at scale
    # multi-split inputs parallelize those stages for free
    docs = _t(spark, sf_dir, "documents")
    a = minhash_signatures(docs.filter(F.col("doc_id") % 2 == 0), k=8)
    b = minhash_signatures(
        docs.filter(F.col("doc_id") % 3 == 0).select(
            "doc_id", F.concat(F.col("text"), F.lit(" snapB")).alias("text")
        ),
        k=8,
    )
    return merge_minhash_signatures(a, b, k=8)
