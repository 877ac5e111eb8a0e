"""Harness query registry: every SURVEY §2 operator exercised as a
(spark query, DuckDB oracle SQL) pair over the testdata tables.

Each Spark query routes through the *real* engine surfaces — the
pipeline compiler (`apply_pipeline`), the envelope builder, the
classifier/merge sink, the dedup/similarity/text ops — never ad-hoc
DataFrame code, so a hash-match certifies the engine, not the fixture.

Determinism rules (so value-hashes match the oracle bit-for-bit):
  * double *aggregates* round to 4-6 dp (fp addition is not associative;
    Spark's partial aggregation order differs from DuckDB's)
  * per-row double arithmetic is left exact (same IEEE ops both sides)
  * hash ops use md5-derived integers (= DuckDB's md5)
  * every top-k has a total tie-break order

Layout: one registry module per domain (pipeline_core, pipeline_tier3,
expressions, cdc_envelope, dedup, similarity, text, corpus, temporal,
media, web, unitext), all registering into the shared (QUERIES,
ORACLES) dicts in _shared.py; this package re-exports every query
function plus the stable-order accessors the driver entry point uses.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ._shared import ORACLES, QUERIES, _use_tables  # noqa: F401
from .pipeline_core import *  # noqa: F401,F403
from .pipeline_tier3 import *  # noqa: F401,F403
from .expressions import *  # noqa: F401,F403
from .cdc_envelope import *  # noqa: F401,F403
from .dedup import *  # noqa: F401,F403
from .similarity import *  # noqa: F401,F403
from .text import *  # noqa: F401,F403
from .corpus import *  # noqa: F401,F403
from .temporal import *  # noqa: F401,F403
from .media import *  # noqa: F401,F403
from .web import *  # noqa: F401,F403
from .unitext import *  # noqa: F401,F403

# Registration order captured at the harness.py -> package split: the
# library accessors keep STABLE registration order (the r2 advice —
# rotation/coverage management belongs in __spark_entry__, which
# tie-breaks on this order), so the per-domain module import order
# above must not leak into the registry. New queries register after
# these in their module's import position.
_ORDER = [
    "match_project",
    "match_in_nin",
    "match_or_regex",
    "match_mod_expr",
    "match_null_ne",
    "addfields_unset",
    "count_match",
    "sort_skip_limit",
    "group_sum_avg",
    "group_expr_key",
    "sample_deterministic",
    "group_global",
    "group_addtoset",
    "unwind_group",
    "replace_root",
    "sort_by_count",
    "expr_strings",
    "expr_dates",
    "expr_cond_switch",
    "expr_higher_order",
    "elem_match_size",
    "group_first_last_sorted",
    "expr_convert",
    "json_dynamic_match",
    "json_dynamic_pipeline",
    "match_extjson_literal",
    "expr_string_ops",
    "expr_date_arith",
    "plainjson_roundtrip",
    "sim_ivf",
    "sim_ivf_nprobe",
    "cdc_counts",
    "cdc_match_stream",
    "cdc_merge_state",
    "envelope_nation",
    "envelope_roundtrip",
    "cdc_envelope_ops",
    "group_push_sorted",
    "expr_array_ops",
    "expr_math_bits",
    "expr_array_fold",
    "expr_let_fields",
    "expr_date_parts",
    "match_bits_geo_type",
    "vector_search_stage",
    "documents_stage",
    "expr_regex_sets_bytes",
    "window_ema_addtoset",
    "corpus_stats",
    "skew_two_stage_agg",
    "events_sessionize",
    "window_range_time",
    "window_median_rolling",
    "unwind_array_index",
    "unwind_preserve_empty",
    "group_stddev",
    "stage_dedup_then_analyze",
    "envelope_lineitem",
    "media_features",
    "media_frames",
    "media_resize",
    "dedup_exact",
    "dedup_minhash_sig",
    "dedup_lsh_jaccard",
    "dedup_simhash",
    "dedup_end_to_end",
    "dedup_clusters",
    "sim_topk",
    "sim_pq",
    "sim_ivfpq",
    "sim_recall_report",
    "sim_centroid_update",
    "sim_ood_filter",
    "sim_int8_topk",
    "sim_prefix_refine",
    "sim_topk_blas",
    "sim_bucketed",
    "emb_near_dups",
    "emb_semantic_dedup",
    "sim_knn_graph",
    "sim_random_projection",
    "text_stats",
    "text_langid",
    "redact_pipeline",
    "corpus_split",
    "corpus_shard",
    "corpus_curation",
    "text_winnow",
    "lookup_pipeline_form",
    "tpch_q3_pipeline",
    "tpch_q5_pipeline",
    "lookup_unwind",
    "lookup_order_counts",
    "bucket_totalprice",
    "bucket_auto_custkey",
    "window_rank_shift",
    "graph_lookup_chain",
    "fill_locf",
    "fill_linear",
    "densify_custkey",
    "densify_months",
    "replace_with_merge",
    "group_rank_accs",
    "group_median_pct",
    "union_with_pipeline",
    "window_calculus",
    "geo_near_planar",
    "merge_order_counts",
    "merge_matched_pipeline",
    "facet_summary",
    "text_pii_redact",
    "text_gopher_flags",
    "corpus_decontaminate",
    "corpus_stratified_sample",
    "corpus_pack",
    "corpus_pack_layout",
    "text_rare_bigrams",
    "text_tfidf_top",
    "emb_quantize_int8",
    "text_chunks",
    "text_winnow_pairs",
    "dedup_incremental",
    "text_vocab",
    "text_token_ids",
    "text_lm_nll",
    "corpus_boilerplate",
    "corpus_mixture",
    "corpus_upsample",
    "corpus_select_topk",
    "avro_roundtrip",
    "cdc_scd2_history",
    "corpus_weighted_sample",
    "events_asof_join",
    "events_asof_static",
    "events_asof_sliced",
    "events_funnel",
    "events_retention",
    "events_anomaly",
    "events_cooccurrence",
    "events_funnel_latency",
    "text_vocab_coverage",
    "events_transitions",
    "events_range_join",
    "events_rollup",
    "events_rollup_series",
    "dedup_edit_distance",
    "text_phrase_search",
    "text_bm25",
    "corpus_dataset_card",
    "emb_decontaminate",
    "events_zorder",
    "skew_salted_join",
    "opt_bloom_join",
    "corpus_dsir",
    "corpus_line_dedup",
    "text_quality_classifier",
    "media_image_tiles",
    "media_image_dedup",
    "corpus_span_dedup",
    "sim_hard_negatives",
    "text_ccnet_buckets",
    "corpus_decontaminate_excise",
    "corpus_temperature_mix",
    "text_quality_apply",
    "corpus_fim",
    "media_audio_dedup",
    "media_audio_segments",
    "media_video_dedup",
    "corpus_bpe_merges",
    "corpus_bpe_encode",
    "corpus_chat_render",
    "corpus_canary",
    "text_html_extract",
    "corpus_normalize",
    "text_stupid_backoff",
    "corpus_snapshot_diff",
    "corpus_overlap_sketch",
    "corpus_preference_pairs",
    "corpus_bloom_dedup",
    "corpus_cdc_chunks",
    "dedup_containment",
    "text_novelty",
    "corpus_zipf",
    "text_char_entropy",
    "corpus_intradoc_dedup",
    "sim_cluster_sample",
    "corpus_budget_select",
    "sim_triplets",
    "dedup_minhash_merge",
    "corpus_gate_attribution",
    "corpus_drift",
    "corpus_incremental_curation",
    "corpus_url_canon",
    "corpus_domain_stats",
    "corpus_domain_filter",
    "corpus_url_dedup",
    "corpus_domain_gate",
    "corpus_robots_filter",
    "corpus_domain_split",
    "corpus_psl_domains",
    "match_text_search",
    "corpus_unicode_text",
    "match_text_unicode",
]


def _restore_registration_order() -> None:
    missing = [n for n in _ORDER if n not in QUERIES]
    assert not missing, f"harness split lost queries: {missing}"
    tail = [n for n in QUERIES if n not in set(_ORDER)]
    for reg in (QUERIES, ORACLES):
        ordered = {n: reg[n] for n in _ORDER + tail if n in reg}
        reg.clear()
        reg.update(ordered)


_restore_registration_order()


# Library accessors keep STABLE registration order (the r2 advice:
# evaluation-round coverage management belongs in the driver entry
# point, not the library API). __spark_entry__ applies its own rotation
# over these dicts.


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    return group_sum_avg(spark, sf_dir)
