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
        bm25_scores,
        build_vocab,
        curate,
        dataset_card,
        dsir_importance,
        encode_token_ids,
        lm_logprob_score,
        mixture_resample,
        remove_boilerplate,
    )
    from route81_spark.ops.text import phrase_search
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
        "dataset_card": dataset_card,
        "bm25": lambda d: bm25_scores(d, ["join", "vector", "scan"]),
        "phrase": lambda d: phrase_search(d, ["table", "part"]),
        "dsir": lambda d: dsir_importance(
            d, F.col("source").isin("src0", "src1")
        ),
        "line_dedup": lambda d: _line_dedup(d),
        "span_dedup": lambda d: _span_dedup(d),
        "quality_cls": lambda d: _quality_cls(d),
        "excise": lambda d: _excise(d),
        "sbackoff": lambda d: _sbackoff(d),
        "normalize": lambda d: _normalize(d),
        "bloom": lambda d: _bloom(d),
        "cdc": lambda d: _cdc(d),
        "containment": lambda d: _contain(d),
        "novelty": lambda d: _novelty_p(d),
        "zipf": lambda d: _zipf_p(d),
        "entropy": lambda d: _entropy_p(d),
        "intradoc": lambda d: _intradoc_p(d),
        "budget": lambda d: _budget_p(d),
        "gate_attr": lambda d: _attr_p(d),
        "drift": lambda d: _drift_p(d),
        "overlap_sketch": lambda d: _overlap_p(d),
        "pref_pairs": lambda d: _pref_p(d),
        "html_extract": lambda d: _html_p(d),
        "bpe_encode256": lambda d: _bpe_encode256(d),
        "bpe_train12": lambda d: _bpe_train12(d),
        "porter_stem": lambda d: _porter_p(d),
        "url_canon": lambda d: _url_canon_p(d),
        "url_dedup": lambda d: _url_dedup_p(d),
        "domain_stats": lambda d: _domain_stats_p(d),
        "domain_gate": lambda d: _domain_gate_p(d),
        "robots": lambda d: _robots_p(d),
    }


def _porter_p(d: DataFrame) -> DataFrame:
    # full Snowball English over every corpus token (the $text/BM25
    # stem path): per-token scalar expression, map-only — but the HOF
    # steps are CodegenFallback (interpreted), so THIS is the probe
    # that prices that; the plan-analysis fixed cost (~3s) amortizes
    from route81_spark.ops.porter import porter2_stem
    from route81_spark.ops.text import tokens

    return d.select(
        "doc_id",
        F.transform(tokens(F.col("text")), porter2_stem).alias("st"),
    )


def _with_urls(d: DataFrame) -> DataFrame:
    from route81_spark.ops.web import synthetic_urls

    return synthetic_urls(d)


def _url_canon_p(d: DataFrame) -> DataFrame:
    from route81_spark.ops.web import (
        registrable_domain, url_canonicalize, url_host,
    )

    u = _with_urls(d)
    return u.select(
        "doc_id",
        url_canonicalize(F.col("url")).alias("canon"),
        registrable_domain(url_host(F.col("url"))).alias("dom"),
    )


def _url_dedup_p(d: DataFrame) -> DataFrame:
    from route81_spark.ops.web import url_dedup

    return url_dedup(_with_urls(d))


def _domain_stats_p(d: DataFrame) -> DataFrame:
    from route81_spark.ops.web import domain_stats

    return domain_stats(_with_urls(d))


def _domain_gate_p(d: DataFrame) -> DataFrame:
    from route81_spark.ops.web import domain_gate

    return domain_gate(_with_urls(d))


def _robots_p(d: DataFrame) -> DataFrame:
    from route81_spark.ops.web import robots_filter, synthetic_robots

    u = _with_urls(d)
    return robots_filter(u, synthetic_robots(u.sparkSession))


def _bpe_merges_256() -> list:
    """A 256-deep VALID merge table (trained single-node over a seeded
    synthetic vocab — any trainer-produced table satisfies bpe_encode's
    exactness contract; table origin doesn't change per-word encode
    cost, which is what the probe measures)."""
    import random

    rng = random.Random(41)
    vocab = sorted(
        {
            "".join(rng.choice("abcdefgh") for _ in range(rng.randint(3, 9)))
            for _ in range(300)
        }
    )
    words = {tuple(w) + ("\x03",): rng.randint(1, 40) for w in vocab}
    merges = []
    for _ in range(256):
        pairs: dict = {}
        for syms, f in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        (l, r), _c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r))
        out: dict = {}
        for syms, f in words.items():
            s, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    s.append(l + r)
                    i += 2
                else:
                    s.append(syms[i])
                    i += 1
            out[tuple(s)] = out.get(tuple(s), 0) + f
        words = out
    return merges


def _bpe_encode256(d: DataFrame) -> DataFrame:
    # realistic merge depth -> the vocab-level word-map regime:
    # distinct words pay the 256-replace chain once per TYPE, the
    # corpus joins the map back broadcast
    from route81_spark.ops.corpus import bpe_encode

    return bpe_encode(d, _bpe_merges_256())


def _bpe_train12(d: DataFrame) -> DataFrame:
    # trainer wall-time vs corpus scale: the corpus reduces ONCE to the
    # word-frequency table and all 12 rounds iterate THAT, so the ratio
    # tracks word-TYPE growth (strongly sublinear), not token growth
    from route81_spark.ops.corpus import bpe_train_merges

    return bpe_train_merges(d, 12, max_words=20_000)


def _sbackoff(d: DataFrame) -> DataFrame:
    from route81_spark.ops.corpus import split_hash, stupid_backoff_score

    return stupid_backoff_score(
        d, train_on=d.filter(split_hash(F.col("doc_id"), "sb0") < 0.9)
    )


def _bloom(d: DataFrame) -> DataFrame:
    from route81_spark.ops.corpus import _h60, bloom_paragraph_dedup

    return bloom_paragraph_dedup(
        d, _h60(F.col("doc_id"), "bloomsplit0") < F.lit(1 << 59), window=4
    )


def _cdc(d: DataFrame) -> DataFrame:
    from route81_spark.ops.dedup import cdc_chunk_stats

    return cdc_chunk_stats(d)


def _contain(d: DataFrame) -> DataFrame:
    from route81_spark.ops.dedup import containment_pairs

    return containment_pairs(d)


def _novelty_p(d: DataFrame) -> DataFrame:
    from route81_spark.ops.text import novelty_scores

    return novelty_scores(d)


def _zipf_p(d: DataFrame) -> DataFrame:
    from route81_spark.ops.corpus import zipf_fit

    return zipf_fit(d)


def _entropy_p(d: DataFrame) -> DataFrame:
    from route81_spark.ops.text import char_entropy

    return d.select("doc_id", char_entropy(F.col("text")).alias("e"))


def _intradoc_p(d: DataFrame) -> DataFrame:
    from route81_spark.ops.corpus import intradoc_line_dedup

    return intradoc_line_dedup(d, window=4)


def _budget_p(d: DataFrame) -> DataFrame:
    from route81_spark.ops.corpus import budget_select, quality_classifier

    scored = quality_classifier(d, F.col("lang") == "en").select(
        "doc_id",
        F.expr("CAST((score * 1000000) DIV n_bigrams AS LONG)").alias("priority"),
        (F.col("n_bigrams") + 1).cast("long").alias("n_tokens"),
    )
    return budget_select(scored, "priority", "n_tokens", budget=15000)


def _attr_p(d: DataFrame) -> DataFrame:
    from route81_spark.ops.text import gate_attribution

    return gate_attribution(d, min_tokens=20, max_tokens=80)


def _drift_p(d: DataFrame) -> DataFrame:
    from route81_spark.ops.corpus import distribution_drift

    return distribution_drift(
        d, d.filter(F.col("doc_id") % 11 != 0)
    )


def _normalize(d: DataFrame) -> DataFrame:
    from route81_spark.ops.text import normalize_text

    return d.select("doc_id", normalize_text(F.col("text")).alias("clean"))


def _line_dedup(d: DataFrame) -> DataFrame:
    from route81_spark.ops.corpus import line_dedup_global

    return line_dedup_global(d, window=4)


def _span_dedup(d: DataFrame) -> DataFrame:
    from route81_spark.ops.corpus import span_dedup_global

    return span_dedup_global(d, min_tokens=4)


def _quality_cls(d: DataFrame) -> DataFrame:
    from route81_spark.ops.corpus import quality_classifier

    return quality_classifier(d, F.col("source").isin("src0", "src1"))


def _excise(d: DataFrame) -> DataFrame:
    from route81_spark.ops.corpus import decontaminate_excise

    return decontaminate_excise(
        d.filter(F.col("doc_id") % 97 != 0), d.filter(F.col("doc_id") % 97 == 0), n=5
    )


def _html_p(d: DataFrame) -> DataFrame:
    from route81_spark.ops.text import html_to_text

    page = F.concat(
        F.lit('<html><head><style>p{a}</style></head><body><p>'),
        F.col("text"),
        F.lit('</p><div>footer &amp; legal</div></body></html>'),
    )
    return d.select("doc_id", html_to_text(page).alias("clean"))


def _pref_p(d: DataFrame) -> DataFrame:
    from route81_spark.ops.corpus import preference_pairs

    return preference_pairs(
        d.withColumn("prompt_id", F.col("doc_id") % 512), group_col="prompt_id"
    )


def _overlap_p(d: DataFrame) -> DataFrame:
    from route81_spark.ops.corpus import kmv_overlap_sketch

    other = d.filter(F.col("doc_id") % 3 != 0).withColumn(
        "text", F.concat(F.col("text"), F.lit(" [v2]"))
    )
    return kmv_overlap_sketch(d, other, k=128)


def scaled_events(ev: DataFrame, k: int) -> DataFrame:
    """K copies with disjoint user_id/event_id ranges — growth = new
    users, the organic axis for per-key temporal ops (per-user history
    length stays constant, as it would in production)."""
    ustride = (ev.agg(F.max("user_id")).first()[0] or 0) + 1
    estride = (ev.agg(F.max("event_id")).first()[0] or 0) + 1
    out = None
    for i in range(k):
        c = ev.withColumn(
            "user_id", (F.col("user_id") + F.lit(i * ustride)).cast("long")
        ).withColumn("event_id", (F.col("event_id") + F.lit(i * estride)).cast("long"))
        out = c if out is None else out.unionByName(c)
    return out


def event_ops() -> dict:
    from route81_spark.ops.streaming import sessionize
    from route81_spark.ops.temporal import asof_join, range_join, rollup_time

    def asof(ev: DataFrame) -> DataFrame:
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        purchases = (
            ev.filter(F.col("event_type") == "purchase")
            .groupBy("user_id", "ts")
            .agg(F.max("event_id").alias("p_event_id"))
        )
        return asof_join(clicks, purchases, on="user_id")

    def rjoin(ev: DataFrame) -> DataFrame:
        iv = ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("p_id"),
            "user_id",
            F.col("ts").alias("start"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end"),
        )
        clicks = ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "value"
        )
        return range_join(clicks, iv, on="user_id", bucket_s=1800)

    from route81_spark.ops.temporal import (
        funnel_counts,
        retention_cohorts,
        rolling_zscore_anomalies,
    )

    return {
        "asof": asof,
        "range_join": rjoin,
        "rollup": lambda ev: rollup_time(ev, "ts", "value"),
        "sessionize": lambda ev: sessionize(ev),
        "funnel": lambda ev: funnel_counts(ev, ["signup", "view", "purchase"]),
        "retention": retention_cohorts,
        "anomaly": lambda ev: rolling_zscore_anomalies(ev, order_tiebreak="event_id"),
        "chat_render": _chat_render_ev,
    }


def _chat_render_ev(ev: DataFrame) -> DataFrame:
    from route81_spark.ops.corpus import chat_render

    turns = ev.select(
        F.col("user_id").alias("conv_id"),
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
        F.when(
            F.col("event_type").isin("view", "click", "signup"), "user"
        ).otherwise("assistant").alias("role"),
        F.col("event_type").alias("content"),
    )
    return chat_render(turns, conv_col="conv_id", order_cols=("ts", "event_id"))


def hot_key_asof_probe(spark, n: int = 40_000_000) -> None:
    """Worst-case skew: EVERY event on one key, generated directly with
    spark.range (a K-way union would dominate the measurement). The
    plain as-of window serializes into one task; the (key, time-slice)
    form spreads the same work across slices. Prints both wall times so
    the straggler claim is measured, not asserted.

    Measured on local[32]: at 10^7 events/key the plain single-task
    sort still wins (sliced pays ~2x coordination); at 4x10^7 sliced is
    3.1x faster (28.8s vs 9.3s) and the gap widens with volume and with
    cores — plain is pinned to ONE core regardless of cluster size."""
    import time as _t

    from route81_spark.ops.temporal import asof_join, asof_join_sliced

    hot = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.lit(0).cast("long").alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.col("id") % 2_600_000
        ).alias("ts"),
        (F.col("id") % 7 == 0).alias("is_p"),
    ).persist()
    hot.count()
    clicks = hot.filter(~F.col("is_p")).select("event_id", "user_id", "ts")
    purchases = (
        hot.filter("is_p")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("p_event_id"))
    )

    def run(fn) -> float:
        t0 = _t.time()
        fn().write.format("noop").mode("overwrite").save()
        return _t.time() - t0

    t_plain = min(
        run(lambda: asof_join(clicks, purchases, on="user_id")) for _ in range(2)
    )
    t_sliced = min(
        run(lambda: asof_join_sliced(clicks, purchases, on="user_id", slice_s=3600))
        for _ in range(2)
    )
    hot.unpersist()
    print(
        f"hot_key_asof  plain={t_plain:6.2f}s  sliced={t_sliced:6.2f}s  "
        f"speedup={t_plain / t_sliced:4.1f}x (one key, {n} events)"
    )


def headline_probe(spark, k: int = 10) -> None:
    """Kx probe for the TPC-H-SHAPED headline queries (the 20x probes
    above cover documents/events ops): synthesize Kx lineitem/orders
    deterministically — K copies with disjoint orderkey ranges shifted
    by ONE shared stride, so every order keeps its lineitems and the
    join fan-out replicates instead of skewing — write them as parquet
    (the probe must include real scan/pushdown behavior), and run the
    HARNESS queries unmodified against the scaled directory. customer
    stays 1x (growth axis = more orders per customer); events scale by
    new users via scaled_events. Prints 1x-vs-Kx wall ratios; a ratio
    near/above K is a plan smell."""
    import shutil
    import tempfile

    from route81_spark import harness

    # abspath: the customer symlink below is created INSIDE the tempdir,
    # so a relative SPARK_GRAFT_SF_DIR would make it dangling
    sf = os.path.abspath(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    tmp = tempfile.mkdtemp(prefix="headline_probe_")

    def replicate(df: DataFrame, key: str, stride: int) -> DataFrame:
        out = None
        for i in range(k):
            c = df.withColumn(key, (F.col(key) + F.lit(i * stride)).cast("long"))
            out = c if out is None else out.unionByName(c)
        return out

    od = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    stride = (od.agg(F.max("o_orderkey")).first()[0] or 0) + 1
    replicate(li, "l_orderkey", stride).write.mode("overwrite").parquet(
        f"{tmp}/lineitem.parquet"
    )
    replicate(od, "o_orderkey", stride).write.mode("overwrite").parquet(
        f"{tmp}/orders.parquet"
    )
    scaled_events(load_table(spark, sf, "events"), k).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/events.parquet")
    os.symlink(f"{sf}/customer.parquet", f"{tmp}/customer.parquet")

    probes = {
        "envelope_build": harness.envelope_lineitem_build,
        "tpch_q3": harness.QUERIES["tpch_q3_pipeline"],
        "merge_matched": harness.QUERIES["merge_matched_pipeline"],
        "window_range_time": harness.QUERIES["window_range_time"],
    }

    def run(fn, d) -> float:
        t0 = time.time()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    try:
        for name, fn in probes.items():
            t1 = min(run(fn, sf) for _ in range(2))
            tk = run(fn, tmp)
            print(
                f"{name:18s} 1x={t1:6.2f}s  {k}x={tk:7.2f}s  ratio={tk / t1:5.1f}x"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def scaled_embeddings(emb: DataFrame, k: int) -> DataFrame:
    stride = (emb.agg(F.max("vec_id")).first()[0] or 0) + 1
    out = None
    for i in range(k):
        c = emb.withColumn(
            "vec_id", (F.col("vec_id") + F.lit(i * stride)).cast("long")
        )
        out = c if out is None else out.unionByName(c)
    return out


def embedding_ops() -> dict:
    def csample(e: DataFrame) -> DataFrame:
        from route81_spark.ops.similarity import cluster_balanced_sample

        cents = e.filter(F.col("vec_id") < 16).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
        return cluster_balanced_sample(e, cents, n_per=8)

    def triplets(e: DataFrame) -> DataFrame:
        from route81_spark.ops.similarity import contrastive_triplets

        anchors = e.filter(F.col("vec_id") % 1000 == 0).select(
            F.col("vec_id").alias("anchor_id"),
            F.col("embedding").alias("anchor_vec"),
            F.col("label").alias("anchor_label"),
        )
        return contrastive_triplets(e, anchors)

    def knn(e: DataFrame) -> DataFrame:
        from route81_spark.ops.similarity import knn_graph

        # n_dims=None -> the knob turns itself: bucket width derives
        # from the corpus count, pinning expected bucket population so
        # candidate pairs grow linearly with the corpus
        return knn_graph(e, k=3)

    def project(e: DataFrame) -> DataFrame:
        from route81_spark.ops.similarity import random_project

        return random_project(e, out_dim=16)

    def ivfpq(e: DataFrame) -> DataFrame:
        from route81_spark.ops.similarity import ivfpq_topk, pq_train_codebook

        cents = e.filter(F.col("vec_id") < 16).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
        queries = e.filter(F.col("vec_id") % 2000 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        books = pq_train_codebook(
            e, m=16, ksub=16, sample=16, iters=0, init="prefix", det_quantize=9
        )
        return ivfpq_topk(e, queries, cents, books, k=5, nprobe=2, refine=10,
                          det_quantize=9)

    def int8(e: DataFrame) -> DataFrame:
        from route81_spark.ops.similarity import int8_topk

        queries = e.filter(F.col("vec_id") % 2000 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        return int8_topk(e, queries, k=5)

    def prefix(e: DataFrame) -> DataFrame:
        from route81_spark.ops.similarity import prefix_refine_topk

        queries = e.filter(F.col("vec_id") % 2000 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        return prefix_refine_topk(e, queries, k=5)

    def cupdate(e: DataFrame) -> DataFrame:
        from route81_spark.ops.similarity import centroid_update

        cents = e.filter(F.col("vec_id") < 16).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
        return centroid_update(e, cents)

    return {"cluster_sample": csample, "triplets": triplets, "knn_graph": knn,
            "random_project": project, "ivfpq": ivfpq, "int8_topk": int8,
            "prefix_refine": prefix, "centroid_update": cupdate}


def knn_recall_probe(spark, k: int = 20) -> None:
    """(time-ratio, recall) probe for the self-scaling knn_graph: at 1x
    and Kx the sf embeddings, build the graph (n_dims self-scaled, 8
    OR-amplification bands) and score recall@5 against exact brute
    force on a fixed-size sampled query set. The Kx corpus is K exact
    copies, so the true nearest neighbours at Kx are duplicates
    (cos=1.0) — exactly the neighbour class curation cares about; sign
    buckets agree on identical vectors for ANY width, so recall at Kx
    measures whether self-scaling the width keeps the dup/near-dup
    structure reachable (it must stay ~1.0). Recall at 1x is the hard
    case: uniform-random neighbours (median true-top-k cos ~0.33 on
    the harness embeddings), floor-pinned in tests/test_ops.py."""
    from pyspark.sql import Window

    from route81_spark.ops.similarity import brute_force_topk, knn_graph

    kk = 5

    def recall_and_time(emb: DataFrame, qmod: int) -> tuple[float, float]:
        emb = emb.persist()
        emb.count()
        qs = emb.filter(F.col("vec_id") % qmod == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        exact = brute_force_topk(emb, qs, k=kk + 1).filter(
            F.col("vec_id") != F.col("query_id")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("vec_id").asc()
        )
        truth = (
            exact.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= kk)
            .select("query_id", "vec_id")
            .persist()
        )
        nt = truth.count()
        t0 = time.time()
        g = knn_graph(emb, k=kk, n_bands=8)
        g.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        hits = truth.join(
            g.select(F.col("src").alias("query_id"), F.col("nbr").alias("vec_id")),
            ["query_id", "vec_id"],
            "inner",
        ).count()
        emb.unpersist()
        truth.unpersist()
        return dt, hits / max(nt, 1)

    base = load_table(
        spark,
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "embeddings",
    )
    t1, r1 = recall_and_time(base, 7)
    # query modulus scales with K so the exact-truth side stays a
    # fixed-size sample instead of growing the brute-force quadratically
    tk, rk = recall_and_time(scaled_embeddings(base, k), 7 * k)
    print(
        f"knn_recall   1x={t1:6.2f}s recall@5={r1:.3f}   "
        f"{k}x={tk:7.2f}s recall@5={rk:.3f}   ratio={tk / t1:5.1f}x"
    )


def sf1_probe(spark, k: int = 100, only: set | None = None) -> None:
    """100x (sf1-equivalent) probe tier for the five most expensive
    bench queries — the 20x in-memory probes top out at ~100k docs;
    this tier writes a Kx documents corpus to parquet ONCE (so the
    probe includes real scan/pushdown behaviour and survives re-runs
    without re-writing ~500k docs) and runs the HARNESS queries
    unmodified against the scaled directory. Duplication preserves the
    near-dup variant structure (each base cluster becomes a K-times
    larger cluster), which makes dedup/clustering HARDER than organic
    growth — sublinear ratios here are conservative evidence."""
    from route81_spark import harness

    sf = os.path.abspath(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    cache = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"route81_sf1_probe_k{k}"
    )
    docs_path = os.path.join(cache, "documents.parquet")
    if not os.path.exists(docs_path):
        os.makedirs(cache, exist_ok=True)
        base = load_table(spark, sf, "documents")
        # write in stride-sized slices (one union branch per copy keeps
        # the plan linear; repartition bounds file count)
        scaled(base, k).repartition(64).write.mode("overwrite").parquet(docs_path)
        print(f"wrote {k}x documents -> {docs_path}")

    probes = [
        "corpus_incremental_curation",
        "corpus_curation",
        "corpus_bloom_dedup",
        "dedup_end_to_end",
        "corpus_bpe_encode",
        # the r8 crawl-curation layer at 100x (synthetic URLs derive
        # from doc_id, so the scaled corpus gets proportionally more
        # URLs/domains)
        "corpus_domain_stats",
        "corpus_domain_gate",
        "corpus_psl_domains",
        "corpus_crawl_funnel",
        # r9 text layer at 100x: porter/$text cost must stay
        # plan-analysis-fixed (the synth corpora grow with doc_id, the
        # stemmer is per-token map-only); weighted runs on the REAL
        # 100x text column
        "match_text_porter",
        "text_bm25_stemmed",
        "match_text_weighted",
        # r10 text layer at 100x: the French program and stop-word
        # filtering are per-token map-only like the English chain
        "match_text_french",
        "match_text_stopwords",
        # r11: the FRENCH stop list composed with the French program
        # (one extra array_contains per token against a 156-entry
        # literal list, ahead of the stemmer), and the bm25/$stem
        # stop-word registrations — all per-token map-only
        "match_text_french_stopwords",
        "text_bm25_stopwords",
        "stage_stem_stopwords",
        "match_text_german_stopwords",
        # r12: the GERMAN program (stop unfolded -> stem -> fold —
        # match_text_german_stopwords above now runs the full
        # analyzer), the stemmed-conflation query, bm25 under a
        # German stop_language, and the 14-list snowball lang-id over
        # unicode tokens of the 8-way mixed corpus — all per-token
        # map-only
        "match_text_german",
        "text_bm25_stop_language",
        "text_bm25_german",
        "text_lang_id_snowball",
        # r12 (late): the SWEDISH program — the same per-token
        # map-only chain shape as French/German (stop unfolded ->
        # stem -> fold), with the setlimit among compiled as ONE
        # anchored regexp over the R1 substring (ops/swedish.py
        # _longest_in_r1 — the descending-length CASE form was the
        # measured-out alternative, 3.10 s vs 2.47 s at this probe)
        "match_text_swedish",
        # r13: the NORWEGIAN program (the fifth carried chain, same
        # setlimit regexp-over-R1 form as Swedish) and its full
        # stop->stem bm25 composition; plus the Swedish bm25 driver
        # registration (shape-identical to the French/German bm25
        # chains, priced once here for the record)
        "match_text_norwegian",
        "text_bm25_norwegian",
        "text_bm25_swedish",
        # r14: the DANISH program (the sixth carried chain, same
        # setlimit regexp-over-R1 form, plus the igst pre-step and
        # the undouble tail) and its full stop->stem bm25
        # composition; plus the $stem driver registrations for the
        # norwegian/danish modes (per-token map-only, no fold)
        "match_text_danish",
        "text_bm25_danish",
        "stage_stem_danish",
        "stage_stem_norwegian",
    ]
    if only:
        probes = [p for p in probes if p in only]

    def run(name: str, d: str) -> float:
        t0 = time.time()
        harness.QUERIES[name](spark, d).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    n1 = load_table(spark, sf, "documents").count()
    nk = load_table(spark, cache, "documents").count()
    print(f"documents base={n1} rows, scaled={nk} rows (K={k})")
    for name in probes:
        t1 = min(run(name, sf) for _ in range(2))
        tk = run(name, cache)
        print(
            f"{name:28s} 1x={t1:6.2f}s  {k}x={tk:8.2f}s  ratio={tk / t1:6.1f}x"
        )


def domain_skew_probe(spark, k: int = 100) -> None:
    """Planted heavy-domain probe for the domain-grain crawl rollups
    (domain_stats / domain_gate) — real crawls carry blogspot/
    wikipedia-class domains at percent-level shares, and the domain
    key is the one aggregation grain the uniform synthetic URLs never
    stress. Plants ONE domain on 30% of a Kx corpus with DISTINCT
    texts (doc_id appended — so the (domain, texthash) pre-agg cannot
    collapse the hot key early) and compares wall time against the
    same corpus with uniform domains.

    Why flat is the expected shape: both rollup stages are hash
    aggregations with map-side partial combine — the heavy domain
    collapses to ONE row per map task before the final shuffle, so the
    hot reducer receives O(num_map_tasks) rows, not O(corpus share).
    If this probe ever shows a cliff (ratio >> 1), the fix is a salted
    two-stage aggregation on the domain key (groupBy(domain, salt)
    partials, then groupBy(domain) — the ops.util.salted_join pattern
    applied to an agg)."""
    from route81_spark.ops.web import domain_gate, domain_stats, synthetic_urls

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = load_table(spark, sf, "documents")
    big = synthetic_urls(scaled(base, k)).withColumn(
        "text",
        F.concat_ws(" ", F.col("text"), F.col("doc_id").cast("string")),
    )
    uni = big.persist()
    skew = big.withColumn(
        "url",
        F.when(
            F.col("doc_id") % 10 < 3,
            F.concat(
                F.lit("https://heavy.example.com/post/"),
                F.col("doc_id").cast("string"),
            ),
        ).otherwise(F.col("url")),
    ).persist()
    n = uni.count()
    skew.count()
    # sanity: the planted domain really is ~30% of the corpus and its
    # per-text rows really are distinct (n_dup_docs == 0)
    hot = (
        domain_stats(skew)
        .orderBy(F.col("n_docs").desc())
        .limit(1)
        .collect()[0]
    )
    assert hot["n_docs"] >= int(0.29 * n), hot
    assert hot["n_dup_docs"] == 0, hot
    print(
        f"domain_skew corpus: {n} rows, hot domain {hot['domain']!r} "
        f"carries {hot['n_docs']} docs ({100.0 * hot['n_docs'] / n:.0f}%)"
    )
    for name, fn in (("domain_stats", domain_stats),
                     ("domain_gate", domain_gate)):
        tu = min(_time(fn, uni) for _ in range(2))
        ts = min(_time(fn, skew) for _ in range(2))
        print(
            f"domain_skew {name:12s} uniform={tu:6.2f}s  "
            f"skew30={ts:6.2f}s  ratio={ts / tu:4.2f}x"
        )
    uni.unpersist()
    skew.unpersist()


def lsh_megacluster_probe(spark, k: int = 20) -> None:
    """Planted boilerplate-cluster probe for LSH near-dedup — the last
    un-probed quadratic surface. Real crawls carry template clusters
    (ToS pages, mirrored boilerplate) whose members share EVERY minhash
    band, landing the whole cluster in one LSH bucket: pair OUTPUT is
    inherently m(m-1)/2 in the cluster size m — no partitioning trick
    removes it; what the engine must guarantee is that the quadratic
    work SPREADS instead of sitting in one task/row.

    lsh_candidates has two lanes (ops/dedup.py): buckets <=
    max_bucket_size materialize their pairs as array expressions in a
    SINGLE row (cheap — no join), bigger buckets fall back to a
    per-row equi-join that spreads the pair generation across tasks.
    This probe plants ONE exact-template cluster at ~1% / just-under-
    cap / over-cap sizes in a 100k-doc corpus (all other texts made
    distinct by appending doc_id) and reports wall time + pair count
    per plant, so the cap semantics are measured, not assumed:
    expected shape is wall time tracking PAIR COUNT (the inherent
    output), with no single-lane cliff at the cap boundary. If the
    under-cap lane ever showed a cliff vs the join lane at equal m,
    the fix is lowering max_bucket_size (in-row materialization is
    m^2 structs in ONE row buffer)."""
    import inspect

    from route81_spark.ops.dedup import lsh_candidates

    # the lane boundary comes from the REAL default — a future change
    # to max_bucket_size must not silently mislabel which lane ran
    cap = inspect.signature(lsh_candidates).parameters[
        "max_bucket_size"
    ].default
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = load_table(spark, sf, "documents").select("doc_id", "text")
    big = scaled(base, k).withColumn(
        "text",
        F.concat_ws(" ", F.col("text"), F.col("doc_id").cast("string")),
    ).persist()
    n = big.count()
    boiler = (
        "terms of service boilerplate template reproduced verbatim "
        "across mirror sites of the same provider network"
    )
    # baseline first: distinct texts, candidate pairs ~ hash collisions
    t0 = time.time()
    base_pairs = lsh_candidates(big).count()
    tb = time.time() - t0
    print(f"lsh_megacluster corpus: {n} rows, baseline "
          f"pairs={base_pairs} in {tb:.2f}s (bucket cap {cap})")
    # plant sizes derive from the corpus and the cap so a small-K run
    # still probes all three regimes instead of planting the whole
    # corpus and tripping the pair-count assertion
    plants = [
        ("1pct", max(2, n // 100)),
        ("under_cap", min(cap - 96, n // 2)),
        ("over_cap", min(cap * 2 - 192, 9 * n // 10)),
    ]
    for tag, m in plants:
        planted = big.withColumn(
            "text",
            F.when(F.col("doc_id") < m, F.lit(boiler))
            .otherwise(F.col("text")),
        ).persist()
        planted.count()
        t0 = time.time()
        pairs = lsh_candidates(planted).count()
        dt = time.time() - t0
        want = m * (m - 1) // 2
        lane = "join-spread" if m > cap else "in-row"
        print(
            f"lsh_megacluster {tag:10s} m={m:5d} ({lane:11s}) "
            f"pairs={pairs} (cluster alone={want}) "
            f"time={dt:6.2f}s  vs baseline {tb:.2f}s "
            f"({dt / tb:4.2f}x for {pairs / max(base_pairs, 1):,.0f}x pairs)"
        )
        assert pairs >= want, (tag, pairs, want)
        planted.unpersist()
    big.unpersist()


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    selected = set(sys.argv[2:])
    spark = get_spark("scale_probe")
    if "lsh_megacluster" in selected:
        lsh_megacluster_probe(spark, k)
        selected = selected - {"lsh_megacluster"}
        if not selected:
            return 0
    if "domain_skew" in selected:
        domain_skew_probe(spark, k)
        selected = selected - {"domain_skew"}
        if not selected:
            return 0
    if "sf1" in selected:
        # names after 'sf1' restrict the probe list (e.g.
        # `scale_probe.py 100 sf1 match_text_german`)
        sf1_probe(spark, k if k != 20 else 100,
                  only=(selected - {"sf1"}) or None)
        return 0
    if "knn_recall" in selected:
        knn_recall_probe(spark, k)
        selected = selected - {"knn_recall"}
        if not selected:
            return 0
    if "headline" in selected:
        headline_probe(spark, k)
        selected = selected - {"headline"}
        if not selected:
            return 0
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

    eo = event_ops()
    if not selected or selected & set(eo):
        ev_base = load_table(
            spark,
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
            "events",
        ).withColumn("ts", F.col("ts").cast("timestamp")).persist()
        ev_big = scaled_events(ev_base, k).persist()
        print(f"events base={ev_base.count()} rows, scaled={ev_big.count()} (K={k})")
        for name, fn in eo.items():
            if selected and name not in selected:
                continue
            t1 = min(_time(fn, ev_base) for _ in range(2))
            tk = _time(fn, ev_big)
            print(f"{name:12s} 1x={t1:6.2f}s  {k}x={tk:7.2f}s  ratio={tk / t1:5.1f}x")
    emb_sel = selected & set(embedding_ops()) if selected else set()
    if emb_sel:
        em_base = load_table(
            spark,
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
            "embeddings",
        ).persist()
        em_big = scaled_embeddings(em_base, k).persist()
        print(f"embeddings base={em_base.count()} rows, scaled={em_big.count()} (K={k})")
        for name, fn in embedding_ops().items():
            if name not in emb_sel:
                continue
            t1 = min(_time(fn, em_base) for _ in range(2))
            tk = _time(fn, em_big)
            print(f"{name:12s} 1x={t1:6.2f}s  {k}x={tk:7.2f}s  ratio={tk / t1:5.1f}x")
    if "hot_key_asof" in selected:  # explicit opt-in: generates 40M rows
        hot_key_asof_probe(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
