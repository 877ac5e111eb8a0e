"""Physical-plan audits: pin the scale-critical properties the README
claims — filter/projection pushdown to the parquet scan, map-side
partial aggregation, broadcast joins for dimension lookups, window
group-limit for top-k, and no Python UDFs in pure-Column paths.
These are the properties that decide whether a plan survives a 100x
scale-up; asserting them keeps refactors honest."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from route81_spark import harness

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_match_project_pushdown(spark):
    df = harness.QUERIES["match_project"](spark, SF)
    plan = plan_of(df)
    # the $match predicate must reach the parquet reader
    assert "PushedFilters:" in plan
    assert "l_returnflag" in plan.split("PushedFilters:")[1].splitlines()[0]
    # projection pruning: the scan schema must not contain columns the
    # query never touches (l_comment is the widest unused column)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema
    assert "l_extendedprice" in read_schema


def test_group_partial_aggregation(spark):
    df = harness.QUERIES["group_sum_avg"](spark, SF)
    plan = plan_of(df, "simple")
    # two HashAggregate nodes = map-side partial + final (the shuffle
    # carries one row per partition x group, not per input row)
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan


def test_lookup_broadcasts_dimension(spark):
    harness._use_tables(spark, SF)
    df = harness.QUERIES["lookup_unwind"](spark, SF)
    plan = plan_of(df, "simple")
    # the pre-aggregated customer side is dimension-sized: Catalyst
    # must pick a broadcast join, not a sort-merge join
    assert "BroadcastHashJoin" in plan


def test_no_python_udf_in_column_paths(spark):
    # pure-Column constructions must stay inside the JVM: a
    # BatchEvalPython / ArrowEvalPython node would mean a Python
    # round-trip snuck into the hot path
    for name in ("match_project", "group_sum_avg", "envelope_nation",
                 "cdc_merge_state", "text_stats", "dedup_exact"):
        df = harness.QUERIES[name](spark, SF)
        plan = plan_of(df, "simple")
        assert "EvalPython" not in plan, f"{name} has a Python UDF in its plan"


def test_topk_uses_window_group_limit(spark):
    df = harness.QUERIES["sim_topk"](spark, SF)
    plan = plan_of(df, "simple")
    # per-query top-k must prune before the shuffle (k rows per
    # partition), not globally sort
    assert "WindowGroupLimit" in plan


def test_whole_stage_codegen_covers_envelope(spark):
    df = harness.QUERIES["envelope_nation"](spark, SF)
    plan = plan_of(df)
    # formatted mode marks codegen stages with "[codegen id : N]"
    assert "codegen id" in plan


def test_vector_search_is_take_ordered(spark):
    df = harness.QUERIES["vector_search_stage"](spark, SF)
    plan = plan_of(df, "simple")
    # global top-k must be TakeOrderedAndProject (k rows per partition
    # to the driver), never a full Sort + Exchange
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_lookup_pipeline_form_broadcasts_and_pushes_down(spark):
    harness._use_tables(spark, SF)
    df = harness.QUERIES["lookup_pipeline_form"](spark, SF)
    plan = plan_of(df)
    # the uncorrelated conjuncts must reach the foreign parquet scan
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:")
    assert any("l_quantity" in p.splitlines()[0] for p in pushed[1:])


def test_dynamic_pipeline_stays_jvm_side(spark):
    df = harness.QUERIES["json_dynamic_pipeline"](spark, SF)
    plan = plan_of(df, "simple")
    assert "EvalPython" not in plan
    assert plan.count("HashAggregate") >= 2  # partial agg on JSON paths


def test_lookup_unwind_fuses_to_join(spark):
    # [$lookup, $unwind] must compile to a direct join — no
    # collect_list aggregate and no Generate (explode) in the plan
    harness._use_tables(spark, SF)
    df = harness.QUERIES["tpch_q3_pipeline"](spark, SF)
    plan = plan_of(df, "simple")
    assert "Generate" not in plan
    assert "collect_list" not in plan


def test_ivf_assign_never_shuffles_corpus(spark):
    """ivf_assign must be a narrow transform over the corpus: the only
    Exchange allowed is the SinglePartition agg that folds the (tiny)
    codebook into one broadcast row. A hashpartitioning Exchange — the
    old crossJoin + row_number(PARTITION BY vec_id) shape — would
    re-shuffle every embedding at 100 TB."""
    from pyspark.sql import functions as F
    from route81_spark.io import load_table
    from route81_spark.ops.similarity import ivf_assign

    emb = load_table(spark, SF, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    plan = plan_of(ivf_assign(emb, centroids), "simple")
    assert "hashpartitioning" not in plan, "corpus is being shuffled"
    assert "Window" not in plan  # per-vector top-1 window is gone
    assert "EvalPython" not in plan  # argmax stays JVM-side


def test_ivf_topk_corpus_side_joins_broadcast(spark):
    # candidate retrieval must be a broadcast equi-join on centroid_id;
    # the only hash Exchange is the final per-query window over the tiny
    # projected (query_id, vec_id, score) result — never the corpus
    df = harness.QUERIES["sim_ivf"](spark, SF)
    plan = plan_of(df, "simple")
    assert "BroadcastHashJoin" in plan
    # embedding payloads must not cross a hash Exchange
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "embedding" not in line, f"embedding shuffled: {line}"


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Scale pattern: pre-bucketing both sides of a repeated join key
    lets every subsequent join skip the shuffle entirely — at 100 TB
    this converts the dominant cost of orders x lineitem joins into a
    one-time layout decision. Pin: bucketed join plan has NO Exchange."""
    import uuid

    from pyspark.sql import functions as F
    from route81_spark.io import load_table

    db = f"bkt_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {db}")
    try:
        orders = load_table(spark, SF, "orders")
        lineitem = load_table(spark, SF, "lineitem")
        (
            orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .format("parquet").saveAsTable(f"{db}.orders_b")
        )
        (
            lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .format("parquet").saveAsTable(f"{db}.lineitem_b")
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = (
                spark.table(f"{db}.orders_b")
                .join(
                    spark.table(f"{db}.lineitem_b"),
                    F.col("o_orderkey") == F.col("l_orderkey"),
                )
                .groupBy("o_orderkey")
                .agg(F.sum("l_extendedprice").alias("rev"))
            )
            plan = plan_of(j, "simple")
            join_part = plan.split("HashAggregate")[-1]  # below the agg
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            assert "Exchange" not in join_part, "bucketed join still shuffles"
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    finally:
        spark.sql(f"DROP DATABASE {db} CASCADE")


def test_stratified_sample_no_shuffle(spark):
    # the sampling decision is a pure per-row expression: no Exchange of
    # any kind in the plan, and the filter math stays JVM-side
    df = harness.QUERIES["corpus_stratified_sample"](spark, SF)
    plan = plan_of(df, "simple")
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_decontaminate_broadcasts_benchmark(spark):
    # benchmark gram set must be the broadcast side; the corpus text
    # payload must never hash-shuffle (only the doc_id/hit rows may)
    df = harness.QUERIES["corpus_decontaminate"](spark, SF)
    plan = plan_of(df, "simple")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the per-doc hit count is the only aggregation shuffle; the wide
    # text column must not appear in any hashpartitioning clause
    for line in plan.splitlines():
        if "hashpartitioning" in line:
            assert "text" not in line


def test_pack_sequences_single_shard_exchange(spark):
    # one hash Exchange on the shard key + per-shard window sort; a
    # global ORDER BY (rangepartitioning) must never appear
    df = harness.QUERIES["corpus_pack"](spark, SF)
    plan = plan_of(df, "simple")
    assert "rangepartitioning" not in plan
    assert plan.count("hashpartitioning") >= 1
    assert "Window" in plan


def test_pii_redact_stays_jvm_side(spark):
    df = harness.QUERIES["text_pii_redact"](spark, SF)
    plan = plan_of(df, "simple")
    assert "EvalPython" not in plan
    assert "Exchange" not in plan  # narrow per-row regexps only


def test_exact_dedup_single_shuffle_group_limit(spark):
    # exact dedup must be ONE corpus shuffle (rank over content hash)
    # with the map-side WindowGroupLimit prune — never agg + a second
    # full-row semi-join shuffle
    from pyspark.sql import functions as F
    from route81_spark.io import load_table
    from route81_spark.ops.dedup import exact_dedup

    docs = load_table(spark, SF, "documents")
    plan = plan_of(exact_dedup(docs), "simple")
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange") == 1


def test_boilerplate_drop_set_broadcasts(spark):
    # the repeated-chunk drop set must come back as a broadcast left
    # join — chunk text shuffles once (reassembly), never for the
    # frequency filter
    df = harness.QUERIES["corpus_boilerplate"](spark, SF)
    plan = plan_of(df, "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_encode_token_ids_vocab_broadcasts(spark):
    # vocab tables are bounded by construction; encoding must join them
    # broadcast so the exploded corpus never shuffles
    df = harness.QUERIES["text_token_ids"](spark, SF)
    plan = plan_of(df, "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_select_topk_uses_window_group_limit(spark):
    # per-group selection must prune k rows per partition before the
    # group shuffle
    df = harness.QUERIES["corpus_select_topk"](spark, SF)
    plan = plan_of(df, "simple")
    assert "WindowGroupLimit" in plan


def test_no_row_python_udf_in_any_registered_query(spark):
    """Sweep EVERY registered query's physical plan: row-at-a-time
    Python UDFs (BatchEvalPython) are forbidden everywhere — Python is
    allowed only as Arrow-vectorized nodes (MapInPandas /
    ArrowEvalPython), and only in the queries built on them."""
    allowed_arrow = {"media_features", "media_frames", "media_resize",
                     "sim_topk_blas", "sim_pq", "avro_roundtrip",
                     "media_image_dedup",  # r6: synthetic corpus gen +
                     # dHash both run in the Arrow decode pass
                     "media_video_dedup",  # r6: two sample_frames passes
                     "sim_ivfpq",  # r6: PQ encode + ADC in the Arrow pass
                     "media_audio_segments",  # r6: WAV decode + run detection
                     "media_image_tiles",  # r6: BMP/PNG decode + tile sums
                     "corpus_unicode_text",  # r8: NFC pandas UDF (no
                     # Spark builtin carries the composition tables)
                     "match_text_unicode",   # r8: NFC prep before $text
                     "media_audio_dedup"}  # r6: WAV decode + integer
    # energy fingerprint in the Arrow pass (oracle regenerates samples)
    offenders, arrow_unexpected = [], []
    for name, fn in harness.queries().items():
        plan = plan_of(fn(spark, SF), "simple")
        if "BatchEvalPython" in plan:
            offenders.append(name)
        if ("MapInPandas" in plan or "ArrowEvalPython" in plan or
                "FlatMapGroupsInPandas" in plan) and name not in allowed_arrow:
            arrow_unexpected.append(name)
    assert not offenders, f"row-at-a-time Python UDFs in: {offenders}"
    assert not arrow_unexpected, (
        f"unexpected Python nodes (extend allowlist only with Arrow-"
        f"vectorized ops): {arrow_unexpected}"
    )


def test_salted_join_spreads_hot_key(spark):
    """salted_join must (a) produce exactly the plain-join result and
    (b) join on (key, salt) so a hot key spans multiple partitions."""
    from route81_spark.ops.util import salted_join
    import pyspark.sql.functions as SF

    big = spark.range(0, 10_000).select(
        (SF.col("id") % 3).alias("k"), SF.col("id").alias("v")
    )
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "k long, name string"
    )
    out = salted_join(big, small, on="k", salt=8)
    assert out.count() == 10_000
    plain = big.join(small, "k").groupBy("k").count().collect()
    salted = out.groupBy("k").count().collect()
    assert {(r["k"], r["count"]) for r in plain} == {
        (r["k"], r["count"]) for r in salted
    }
    # the join keys must include the salt column
    plan = out._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "__salt" in plan
    # replicating the small side makes right/full-outer wrong (salt-fold
    # duplicate unmatched rows) -> must be rejected loudly
    import pytest

    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, on="k", salt=8, how="full")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, on="k", salt=8, how="right")
    # left outer stays supported (null-extends the big side only)
    assert salted_join(big, small, on="k", salt=4, how="left").count() == 10_000


def test_dsir_model_broadcasts_and_text_never_shuffles(spark):
    # the n_buckets-row model must come back broadcast, and no Exchange
    # may carry the raw text — only (doc, bucket) count rows shuffle
    df = harness.QUERIES["corpus_dsir"](spark, SF)
    plan = plan_of(df, "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_line_dedup_text_shuffles_at_most_once(spark):
    """line_dedup_global's contract: the winner selection runs on
    (line-hash, doc, pos) integer rows — the ONLY Exchange allowed to
    carry the raw text column is the final rebuild join on doc id
    (round-robin ensure_parallelism repartitions are input artifacts,
    not algorithmic shuffles, and don't count)."""
    df = harness.QUERIES["corpus_line_dedup"](spark, SF)
    plan = plan_of(df, "formatted")
    text_shuffles = 0
    for block in plan.split("\n\n"):
        head = block.strip().splitlines()[0] if block.strip() else ""
        if "Exchange" not in head or "BroadcastExchange" in head:
            continue
        if "hashpartitioning" in block and "text#" in block:
            text_shuffles += 1
    assert text_shuffles <= 1, plan


def test_quality_classifier_model_broadcasts_and_text_never_shuffles(spark):
    # same contract as DSIR: the bucket model (n_buckets rows + one
    # totals row) comes back broadcast; no SortMergeJoin may drag the
    # corpus across the cluster — only (doc, bucket) count rows shuffle
    df = harness.QUERIES["text_quality_classifier"](spark, SF)
    plan = plan_of(df, "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_span_dedup_text_shuffles_at_most_once(spark):
    """span_dedup_global shares line_dedup_global's contract: winner
    selection and drop-list reduction run on (hash, doc, pos) integer
    rows; only the final rebuild join on doc id may carry text."""
    df = harness.QUERIES["corpus_span_dedup"](spark, SF)
    plan = plan_of(df, "formatted")
    text_shuffles = 0
    for block in plan.split("\n\n"):
        head = block.strip().splitlines()[0] if block.strip() else ""
        if "Exchange" not in head or "BroadcastExchange" in head:
            continue
        if "hashpartitioning" in block and "text#" in block:
            text_shuffles += 1
    assert text_shuffles <= 1, plan


def test_bloom_dedup_probe_is_map_only(spark):
    """bloom_apply's contract: the probe phase carries the bitmap as a
    128 KiB literal, so the returned plan has NO hash-partitioned
    Exchange at all — a pure per-row projection (the build phase ran
    as its own bounded job at construction time)."""
    df = harness.QUERIES["corpus_bloom_dedup"](spark, SF)
    plan = plan_of(df, "formatted")
    for block in plan.split("\n\n"):
        head = block.strip().splitlines()[0] if block.strip() else ""
        if "Exchange" in head and "hashpartitioning" in block:
            raise AssertionError(plan)


def test_cdc_chunks_text_never_shuffles(spark):
    """cdc_chunk_stats reduces chunk text to (hash, len) integers
    per-row; NO hash-partitioned Exchange may carry the text column."""
    df = harness.QUERIES["corpus_cdc_chunks"](spark, SF)
    plan = plan_of(df, "formatted")
    for block in plan.split("\n\n"):
        head = block.strip().splitlines()[0] if block.strip() else ""
        if "Exchange" not in head or "BroadcastExchange" in head:
            continue
        assert not ("hashpartitioning" in block and "text#" in block), plan


def test_cluster_sample_embeddings_never_shuffle(spark):
    """cluster_balanced_sample: assignment is map-side codegen and the
    quota window runs on integer rows — no hash-partitioned Exchange
    may carry the embedding payload, and the rank filter must compile
    to WindowGroupLimit (map-side partial top-k per cluster)."""
    df = harness.QUERIES["sim_cluster_sample"](spark, SF)
    plan = plan_of(df, "formatted")
    assert "WindowGroupLimit" in plan
    for block in plan.split("\n\n"):
        head = block.strip().splitlines()[0] if block.strip() else ""
        if "Exchange" not in head or "BroadcastExchange" in head:
            continue
        assert not ("hashpartitioning" in block and "embedding#" in block), plan


def test_containment_single_pipeline_and_text_never_shuffles(spark):
    """containment_pairs (r14 shape): ONE linear pipeline — a single
    documents scan (the explode + distinct is never re-evaluated), the
    stop-shingle prune is a window-count filter rather than a groupBy +
    broadcast anti-join, pair generation is a bounded posting-list
    explode with NO join of any kind, and no hash-partitioned Exchange
    carries raw text — only (doc, hash) integer rows move."""
    df = harness.QUERIES["dedup_containment"](spark, SF)
    plan = plan_of(df, "formatted")
    # formatted mode lists each node twice (tree + details)
    assert plan.count("Scan parquet") == 2, plan
    assert "Join" not in plan, plan
    assert plan.count("Window") >= 1, plan
    for block in plan.split("\n\n"):
        head = block.strip().splitlines()[0] if block.strip() else ""
        if "Exchange" not in head or "BroadcastExchange" in head:
            continue
        assert not ("hashpartitioning" in block and "text#" in block), plan


def test_triplets_single_scoring_pass_with_window_group_limit(spark):
    """contrastive_triplets: anchors broadcast (no corpus-side shuffle
    for scoring), winners via WindowGroupLimit."""
    df = harness.QUERIES["sim_triplets"](spark, SF)
    plan = plan_of(df, "formatted")
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_random_projection_zero_shuffle(spark):
    # JL projection is a pure per-row transform: the sign matrix lives
    # in the plan as literals, the corpus never moves — no Exchange of
    # any kind, no Python nodes
    df = harness.QUERIES["sim_random_projection"](spark, SF)
    plan = plan_of(df, "simple")
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_knn_graph_bucketed_never_all_pairs(spark):
    # the candidate relation is an equi-join on the LSH bucket key —
    # a cartesian/broadcast-nested-loop product would be the all-pairs
    # plan that dies at scale
    df = harness.QUERIES["sim_knn_graph"](spark, SF)
    plan = plan_of(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivfpq_corpus_never_hash_shuffles_embeddings(spark):
    # the two-level scheme's whole point: cell assignment is map-side,
    # ADC scoring is one Arrow pass over the assigned corpus, and only
    # (query_id, vec_id, adc_dist)/candidate rows ever hash-shuffle —
    # an embedding-payload Exchange would re-shuffle the corpus
    df = harness.QUERIES["sim_ivfpq"](spark, SF)
    plan = plan_of(df, "simple")
    assert "MapInPandas" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "embedding#" not in line, f"embedding shuffled: {line}"


def test_prefix_refine_pure_column_funnel(spark):
    # MRL funnel: candidate cut must prune per-partition before the
    # shuffle (WindowGroupLimit), and the whole two-pass funnel stays
    # JVM-side (no Python nodes)
    df = harness.QUERIES["sim_prefix_refine"](spark, SF)
    plan = plan_of(df, "simple")
    assert "WindowGroupLimit" in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_ood_filter_zero_shuffle(spark):
    # OOD scoring is the codegen argmax with the score emitted: a
    # narrow per-row transform — no hashpartitioning Exchange, no
    # Window, no Python
    df = harness.QUERIES["sim_ood_filter"](spark, SF)
    plan = plan_of(df, "simple")
    assert "hashpartitioning" not in plan
    assert "Window" not in plan
    assert "EvalPython" not in plan


def test_text_search_family_is_map_only(spark):
    """$text match + textScore (ASCII, diacritic-folded, stemmed) are
    per-row filter+projection work: the plan must contain NO
    algorithmic Exchange — folding is one translate, stemming one CASE
    chain over the token array, both inside the scan-side projection.
    The one Exchange tolerated is ensure_parallelism's round-robin
    spread of the narrow id scan (an input artifact: it moves only
    doc_id/lang bytes BEFORE the text is synthesized, exists only when
    the local scan is a single small file, and is a no-op at scale —
    see test_line_dedup_text_shuffles_at_most_once for the same
    convention). A hashpartitioning Exchange would mean real
    analyzer-work shuffling and stays forbidden."""
    for name in ("match_text_search", "match_text_diacritics",
                 "match_text_stem", "match_text_porter",
                 "match_text_weighted", "match_text_wildcard",
                 "match_text_langoverride", "match_text_french",
                 "match_text_wildcard_nested", "match_text_stopwords",
                 "match_text_french_stopwords",
                 "match_text_german_stopwords", "match_text_german",
                 "match_text_swedish", "match_text_norwegian"):
        plan = plan_of(harness.QUERIES[name](spark, SF), "simple")
        for line in plan.splitlines():
            if "Exchange" in line:
                assert "roundrobinpartitioning" in line.lower(), (
                    f"{name} has a non-round-robin Exchange:\n{plan}"
                )
        assert "hashpartitioning" not in plan, f"{name} shuffles:\n{plan}"
        assert "BatchEvalPython" not in plan, name


def test_crawl_funnel_no_payload_shuffles(spark):
    """The composed crawl funnel's contract: NO hash-partitioned
    Exchange carries text or url — the (canon, min-id) winner agg, the
    domain rollup, and the loser list all shuffle hash/int/domain rows
    only; the loser gate applies broadcast-anti; no Python anywhere."""
    df = harness.QUERIES["corpus_crawl_funnel"](spark, SF)
    plan = plan_of(df, "formatted").split("== Initial Plan ==")[0]
    for block in plan.split("\n\n"):
        head = block.strip().splitlines()[0] if block.strip() else ""
        if "Exchange" not in head or "BroadcastExchange" in head:
            continue
        if "hashpartitioning" in block:
            # \B-guard: canon_url# is a HASH-SIZED canonical string and
            # allowed; the raw text#/url# payload columns are not
            import re
            assert not re.search(r"(?<![\w])(text|url)#", block), block
    assert "BroadcastHashJoin LeftAnti" in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_dataset_card_single_corpus_pass(spark):
    """r15: the card aggregation and the distinct-hash count share ONE
    per-row tokenize/quality/hash pass — count_distinct in the same
    groupBy (planned via Expand) replaced the second distinct()+count
    consumer, which re-scanned and re-derived the whole projection."""
    import re

    df = harness.QUERIES["corpus_dataset_card"](spark, SF)
    plan = plan_of(df)
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.M)
    assert len(scans) == 1, f"expected one corpus scan, got {len(scans)}:\n{plan}"
    assert "Join" not in plan  # the broadcast join-back is gone


def test_drift_and_zipf_checkpoint_fanout(spark):
    """r15: distribution_drift and zipf_fit materialize their
    vocab-sized fan-out table once (lazy localCheckpoint) — every
    consumer reads the checkpoint blocks, so the final plan carries NO
    parquet scans (the one-pass tokenize lineage lives inside the
    checkpointed subtree; drift's unpinned plan ran 9 corpus scans)."""
    import re

    for name in ("corpus_drift", "corpus_zipf"):
        df = harness.QUERIES[name](spark, SF)
        plan = plan_of(df)
        assert "ExistingRDD" in plan, f"{name} lost its fan-out checkpoint"
        scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.M)
        assert not scans, (
            f"{name} re-expanded the corpus lineage per consumer:\n{plan}"
        )


def test_robots_rules_registered_fn(spark):
    """r15: the parse_robots fold registers as the once-per-session SQL
    temp function r81_robots_rules (STRUCT return) with NO silent
    inline fallback — the registration used to fail on a Cast the
    unanalyzed-plan .sql() drops (array() re-parsed as ARRAY<VOID>) —
    and the registered body is value-identical to the inline program."""
    import warnings

    from pyspark.sql import functions as F

    from route81_spark.ops import web as W

    robots = W.synthetic_robots(spark)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        registered = W.parse_robots(robots).orderBy("domain").collect()
    fallbacks = [w for w in caught if "registration" in str(w.message)]
    assert not fallbacks, f"scalar_fn fell back inline: {fallbacks[0].message}"
    # the function is callable directly (would raise if unregistered)
    row = spark.sql(
        "SELECT r81_robots_rules('User-agent: *\\nDisallow: /x') AS r"
    ).collect()[0]["r"]
    assert row["disallow"] == ["/x"] and row["allow"] == []
    # registered output == the inline Column program, value for value
    rules = W._robots_rules_scalar(F.col("robots_txt"))
    inline = robots.select(
        "domain",
        rules.getField("disallow").alias("disallow"),
        rules.getField("allow").alias("allow"),
    ).orderBy("domain").collect()
    assert registered == inline
