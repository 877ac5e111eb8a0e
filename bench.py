"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric", "value", "unit", "queries", "sf"}.

Query set spans the engine's hot paths: pipeline-compiled aggregation
(q1-style), full producer envelope construction, CDC classify+merge,
MinHash LSH dedup, brute-force + bucketed similarity, text analysis.
Each query materializes via the noop sink (full execution, no driver
collect).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from route81_spark import harness
from route81_spark.session import get_spark

BENCH_QUERIES = [
    "group_sum_avg",      # pipeline-compiled Q1-style aggregation (lineitem)
    "match_project",      # filter+project scan path, pushdown-sensitive
    "envelope_lineitem",  # full-envelope wire-format construction, widest table
                          # (build only — comparable to the r1-r4 series)
    "envelope_lineitem_parseback",  # build + the oracle's from_json parse-back
                                    # (the r5 number; correctness-gate shape)
    "cdc_merge_state",    # change feed -> classify -> keyed merge
    "dedup_lsh_jaccard",  # MinHash LSH candidates + Jaccard verify
    "dedup_exact",        # hash-agg dedup
    "dedup_end_to_end",   # LSH + verify + label-propagation clustering loop
    "sim_topk",           # brute-force cosine top-k (bit-exact fold path)
    "sim_topk_blas",      # brute-force via Arrow+BLAS matmul (scale path)
    "sim_bucketed",       # sign-bucket LSH ANN
    "sim_ivf",            # IVF coarse-quantization ANN
    "text_stats",         # per-row text analysis expressions
    "unwind_group",       # explode + aggregate
    "tpch_q3_pipeline",   # 3-table join + agg + top-k via $lookup/$group
    "redact_pipeline",    # $redact recursive KEEP/DESCEND/PRUNE column program
    "corpus_curation",    # quality gates -> dedup funnel composition
    "text_gopher_flags",  # repetition/shape quality metrics (heavy per-row HOFs)
    "corpus_decontaminate",  # benchmark n-gram overlap, broadcast eval set
    "text_lm_nll",        # self-trained bigram-LM NLL (two corpus-wide aggs + join)
    "corpus_boilerplate", # repeated-chunk removal (chunk explode + reassembly)
    "events_asof_join",   # as-of join (union-tag + running last_value window)
    "events_asof_sliced", # hot-key as-of ((key, slice) segmented scan)
    "events_rollup",      # hour/day/month rollup (one Expand shuffle)
    "corpus_dataset_card",  # per-source release card (two map-side aggs)
    "sim_pq",             # PQ encode->ADC->exact refine (Arrow batches + joins)
    "sim_ivfpq",          # IVF cells + PQ ADC + exact refine (two-level ANN)
    "corpus_dsir",        # DSIR importance weights (bucket counts + tiny model)
    "corpus_line_dedup",  # keep-first global line dedup (int winner agg + 1 text join)
    "text_quality_classifier",  # hashed-bigram NB quality filter (DSIR-shaped)
    "corpus_bpe_merges",  # 6 BPE merge rounds on the vocab-sized word table
    "corpus_span_dedup",  # stride-1 shingle winner agg + interval excision
    "corpus_bpe_encode",  # train 6 merges + replace-chain subword encode
    "sim_hard_negatives", # cross-label top-k (map-side filter + window limit)
    "text_ccnet_buckets", # bigram-LM NLL + per-source ntile
    "corpus_fim",         # FIM PSM re-ordering (pure per-row projection)
    "corpus_chat_render", # SFT render + loss-mask fold (collect_list agg)
    "corpus_normalize",   # 10-step regexp normalization chain (per-row JVM)
    "corpus_canary",      # canary plant + regex detect (two map passes)
    "text_stupid_backoff",  # trigram count tables + type-level backoff scoring
    "corpus_bloom_dedup",  # bloom bitmap build + map-only probe projection
    "corpus_cdc_chunks",   # content-defined chunking + chunk dedup accounting
    "dedup_containment",   # shingle-set containment pairs (inverted-index join)
    "text_novelty",        # df==1 shingle share (two int aggs + hash join)
    "corpus_zipf",         # token freq agg + top-V TakeOrdered + one-row fold
    "text_char_entropy",   # per-row sorted-char entropy fold (pure Column)
    "corpus_intradoc_dedup",  # within-doc keep-first line scrub (map-only)
    "sim_cluster_sample",  # codegen assign + WindowGroupLimit per-cluster quota
    "corpus_budget_select",  # classifier priority + prefix-under-budget window
    "sim_triplets",        # one broadcast scoring pass -> pos/neg winners pivot
    "dedup_minhash_merge", # elementwise-min signature union (full-outer id join)
    "corpus_gate_attribution",  # one-pass gate flags -> waterfall unpivot
    "corpus_drift",        # two vocab-sized count tables -> TV distance
    "corpus_incremental_curation",  # diff -> gate -> bloom scrub (delta only)
    "corpus_url_canon",    # URL canonicalization chain (pure map, r7)
    "corpus_domain_stats", # per-domain rollup (hash-only shuffles, r7)
    "corpus_url_dedup",    # keep-first by canon URL (one winner agg, r7)
    "corpus_domain_gate",  # rollup -> broadcast-anti domain gate (r7)
    "corpus_robots_filter",  # robots parse (broadcast) + prefix filter (r7)
    "match_text_search",   # $text subset: per-row token/phrase scan (r7)
    "corpus_psl_domains",  # full-PSL broadcast rule-table extraction (r8)
    "corpus_unicode_text", # NFC (Arrow) + Unicode tokenization (r8)
    "match_text_unicode",  # $text unicode mode over NFC'd text (r8)
    "match_text_diacritics",  # $text diacritic folding (one translate, r8)
    "match_text_stem",     # $text S-stemmer conflation (CASE chain, r8)
    "sim_knn_graph",       # 8-band self-join kNN graph, self-scaled width (r8)
    "corpus_crawl_funnel", # composed canon -> URL dedup -> domain gate (r8)
    "match_text_porter",   # $text full Snowball English stemming (r9)
    "text_bm25_stemmed",   # stemmed Okapi BM25 (porter analyzer chain, r9)
    "match_text_weighted", # weighted multi-field text index analog (r9)
    "match_text_french",   # $text full Snowball French stemming (r10)
    "match_text_stopwords",  # $text Snowball stop-word removal (r10)
    "match_text_french_stopwords",  # French stop list + French stemmer (r11)
    "text_bm25_stopwords",  # BM25 stop->stem analyzer chain (r11)
    "match_text_german",   # $text full Snowball German stemming (r12)
    "text_lang_id_snowball",  # 14-list hashed lang-id, 8-way mix (r12)
    "match_text_norwegian",  # $text full Snowball Norwegian stemming (r13)
    "match_text_danish",   # $text full Snowball Danish stemming (r14)
]

# Round-over-round comparability cohorts (r6 verdict: the growing set mixes
# session noise into the 2x-of-baseline bar; report each cohort's subtotal
# so BENCH_r{N} deltas compare like with like).
COHORT_R1 = [  # the 13 queries of BENCH_r01 (baseline 18.59 s at sf0.1)
    "group_sum_avg", "match_project", "envelope_lineitem", "cdc_merge_state",
    "dedup_lsh_jaccard", "dedup_exact", "sim_topk", "sim_topk_blas",
    "sim_bucketed", "sim_ivf", "text_stats", "unwind_group",
    "tpch_q3_pipeline",
]
COHORT_PRE_R6 = COHORT_R1 + [  # the 26 queries of BENCH_r05 (23.52 s)
    "dedup_end_to_end", "redact_pipeline", "corpus_curation",
    "text_gopher_flags", "corpus_decontaminate", "text_lm_nll",
    "corpus_boilerplate", "events_asof_join", "events_asof_sliced",
    "events_rollup", "corpus_dataset_card", "sim_pq", "corpus_dsir",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _prev_round(here: str | None = None) -> tuple[str, dict] | None:
    """Newest USABLE BENCH_r{N}.json in the repo -> (tag, parsed) —
    the r-over-r comparison base, so the driver's tail capture alone
    tells the cohort story (totals stopped being cross-round
    comparable once the query set started growing). Rounds whose
    machine-readable line the driver could not parse (r9: the old
    single fat line overflowed the fixed 2000-char tail window) are
    skipped, falling back to the next older round. From r10 on the
    final line is compact — `queries` carries the cohort SUBTOTALS,
    not per-query timings, so the per-query "common" delta is only
    computed against rounds that still recorded full timings (the
    subtotal deltas always work)."""
    import glob

    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    rounds: list[tuple[int, str]] = []
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            rounds.append((int(m.group(1)), p))
    for n, p in sorted(rounds, reverse=True):
        try:
            with open(p) as f:
                parsed = json.load(f).get("parsed") or {}
        except Exception:
            continue
        if parsed.get("subtotals") or parsed.get("queries"):
            return f"r{n:02d}", parsed
    return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0
    spark = get_spark("route81_spark_bench")

    qs = harness.queries()
    # envelope_lineitem's REGISTERED form carries the r5 oracle's
    # parse-back of the produced wire bytes; the bench series wants the
    # raw producer build (r1-r4 comparable) AND the parse-back variant
    qs["envelope_lineitem_parseback"] = qs["envelope_lineitem"]
    qs["envelope_lineitem"] = harness.envelope_lineitem_build
    # warm phase: run every headline query once at sf0.001 — identical
    # plan shapes on tiny data — so whole-stage-codegen compilation and
    # JIT warmup are paid before measurement (first-run compile cost was
    # measured at 5-8s per plan vs 0.3s steady-state)
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for name in BENCH_QUERIES:
        materialize(qs[name](spark, warm_dir))

    # measured phase: min of 3 runs per query. Single runs at sf0.1 on a
    # shared box swing ±2-3x (GC pauses, page-cache state); the min is the
    # stable estimator of the plan's true cost (r2 recorded 37.6s of noise
    # against a true ~19.8s)
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for _ in range(n_runs):
        for name in BENCH_QUERIES:
            t0 = time.perf_counter()
            materialize(qs[name](spark, sf_dir))
            dt = round(time.perf_counter() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt

    total = round(sum(timings.values()), 3)
    subtotals = {
        "headline13": round(sum(timings[q] for q in COHORT_R1), 3),
        "pre_r6": round(sum(timings[q] for q in COHORT_PRE_R6), 3),
        "full": total,
    }
    # r-over-r cohort deltas vs the latest recorded round: the frozen
    # cohorts compare like with like; "common" restricts the full set
    # to queries present in BOTH rounds (new registrations excluded)
    deltas: dict | None = None
    prev = _prev_round()
    if prev is not None:
        tag, pp = prev
        pq = pp.get("queries", {})
        # r9+ rounds carry explicit subtotals; in the oldest rounds
        # `queries` was the per-query dict and subtotals don't exist —
        # derive the frozen-cohort sums from it when every member is
        # present, else leave the delta ABSENT (never a false +0.0%)
        psub = dict(pp.get("subtotals") or {})
        if "headline13" in pq:
            # compact format: `queries` IS the subtotal dict (r12 on,
            # the final line no longer duplicates it under
            # `subtotals` — the 300-byte tail-survival margin)
            if not psub:
                psub = dict(pq)
            pq = {}
        if not psub and pq:
            for c, members in (
                ("headline13", COHORT_R1), ("pre_r6", COHORT_PRE_R6),
            ):
                if all(q in pq for q in members):
                    psub[c] = round(sum(pq[q] for q in members), 3)
        deltas = {"vs": tag}
        for c in ("headline13", "pre_r6"):
            if psub.get(c):
                deltas[c] = round(
                    100.0 * (subtotals[c] - psub[c]) / psub[c], 1
                )
        common = [q for q in timings if q in pq]
        ps = sum(pq[q] for q in common)
        if ps:
            deltas["common"] = round(
                100.0 * (sum(timings[q] for q in common) - ps) / ps, 1
            )
            deltas["n_common"] = len(common)

    # human-readable cohort summary, frozen-cohort first — printed
    # immediately before the JSON line so the driver's tail capture
    # carries it too
    print(
        f"headline13={subtotals['headline13']}s "
        f"pre_r6={subtotals['pre_r6']}s full={total}s "
        f"({len(timings)} queries)"
    )
    if deltas is not None:
        # print only cohorts that were actually compared — a default
        # 0.0 would read as "no change" where nothing was computed
        line = "delta_vs_%s:" % deltas["vs"]
        for c in ("headline13", "pre_r6", "common"):
            if c in deltas:
                line += " %s %+.1f%%" % (c, deltas[c])
        print(line)
    # per-query timings on their OWN line: the driver's tail capture is a
    # fixed-size window that keeps the END of stdout — r9's single ~3 KB
    # JSON line overflowed it and lost its head ("parsed": null). The
    # FINAL line must stay compact (<~300 bytes at any future query
    # count) so it always survives and parses.
    print(json.dumps({"per_query": timings, "sf": sf}))
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": subtotals,
                "deltas_pct": deltas,
                "sf": sf,
                "runs": n_runs,
                "aggregation": "min",
            }
        )
    )


if __name__ == "__main__":
    main()
