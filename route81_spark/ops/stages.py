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
from route81_spark.ops.util import lit_string_array
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


def _stem(df: DataFrame, arg: dict) -> DataFrame:
    """$stem: tokenize a text column (whitespace split — accented
    letters survive into the stemmer; lowercasing is the caller's
    prep) and stem every token — 'porter' (Snowball English,
    ops/porter.py), 'french' (Snowball French, ops/french.py),
    'german' (Snowball German, ops/german.py, r12), 'swedish'
    (Snowball Swedish, ops/swedish.py, r12), 'norwegian' (Snowball
    Norwegian, ops/norwegian.py, r13), 'danish' (Snowball Danish,
    ops/danish.py, r14) or 's'
    (Harman S-stemmer). Adds an array<string> column (default
    'stems'); per-row scalar work, no shuffle. The building block for
    stemmed vocabularies / inverted indexes outside the $text match
    path."""
    from route81_spark.pipeline.query import _CHAIN_LANGS, _chain_fns

    mode = arg.get("mode", "porter")
    if mode == "porter":
        # one call_function against the once-per-session SQL temp
        # function (ops/porter.py) — not a fresh ~13 KB tree per stage
        from route81_spark.ops.porter import porter2_stem_tokens as stem_toks
    elif mode in _CHAIN_LANGS:
        # the carried non-English Snowball programs, resolved from
        # the same registry as $text's dispatch — a new language
        # lands here with zero edits
        stem_toks = _chain_fns(mode)[0]
    elif mode == "s":
        stem_toks = X.s_stem_tokens
    else:
        raise ValueError(
            f"$stem: unsupported mode {mode!r} — 'porter' (Snowball"
            " English), the carried Snowball languages"
            f" {sorted(_CHAIN_LANGS)} and 's' (Harman S-stemmer) are"
            " the implemented modes"
        )
    toks = X.tokens(F.col(arg.get("textField", "text")))
    if arg.get("stopLanguage") is not None:
        # $stem ALWAYS stems and its carried programs' languages
        # whose language already picks the stop list — stopping a
        # different language while stemming another would be an
        # incoherent analyzer, and silently ignoring the key would be
        # worse; generic stop-only passes belong to bm25_scores(
        # stop_language=...) or a stop_list()+F.filter preprocessor
        raise ValueError(
            "$stem: stopLanguage is not composable with a stem mode —"
            " the mode's language already picks the list; for"
            " stop-only passes over other languages use"
            " ops.stopwords.stop_list with an array filter"
        )
    if arg.get("stopWords"):
        # same option as $text (r10): drop the MODE's language's
        # Snowball stop words BEFORE stemming (r11: the French list
        # composes with mode 'french'; its accented surface forms —
        # 'été', 'même' — are why the whitespace tokenizer must not
        # have folded diacritics first; r12: German likewise, its
        # raw list sees unfolded tokens and the stemmer's own
        # postlude removes the umlauts afterwards; r12: Swedish too —
        # its raw list sees unfolded tokens, and the stemmer KEEPS
        # ä/å/ö, so downstream folding is the caller's choice)
        from route81_spark.ops.stopwords import STOP_EN, stop_list

        stops = (stop_list(mode) if mode in _CHAIN_LANGS else STOP_EN)
        stop_arr = lit_string_array(stops)
        toks = F.filter(
            toks, lambda x: ~F.array_contains(stop_arr, F.lower(x))
        )
    return df.withColumn(arg.get("as", "stems"), stem_toks(toks))


def _text_analyze(df: DataFrame, arg: dict) -> DataFrame:
    return X.analyze(df, arg.get("textField", "text"))


def _lang_id(df: DataFrame, arg: dict) -> DataFrame:
    """$langId: per-document language ID column. mode 'markers' (the
    default — the original 3-language 5-word heuristic, stable for
    existing configs) or 'snowball' (r11 — stop-list overlap over all
    14 carried Snowball languages through the once-per-session SQL
    function; 'und' when nothing hits). Per-row map-only work, no
    shuffle, no Python."""
    mode = arg.get("mode", "markers")
    text = F.col(arg.get("textField", "text"))
    if mode == "markers":
        col = X.lang_id(text)
    elif mode == "snowball":
        col = X.snowball_lang_id(text)
    else:
        raise ValueError(
            f"$langId: unsupported mode {mode!r} — 'markers' and"
            " 'snowball' are the implemented modes"
        )
    return df.withColumn(arg.get("as", "lang_pred"), col)


def _similarity_topk(df: DataFrame, arg: dict) -> DataFrame:
    id_col = arg.get("idField", "vec_id")
    vec_col = arg.get("vecField", "embedding")
    queries = df.filter(
        F.col(id_col) % int(arg.get("queryModulo", 100)) == 0
    ).select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec"))
    fn = S.bucketed_topk if arg.get("approx") else S.brute_force_topk
    return fn(df, queries, k=int(arg.get("k", 5)), id_col=id_col, vec_col=vec_col)


def _chunk(df: DataFrame, arg: dict) -> DataFrame:
    return X.chunk_documents(
        df,
        chunk_tokens=int(arg.get("chunkTokens", 128)),
        overlap=int(arg.get("overlap", 16)),
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
    )


def _pii_redact(df: DataFrame, arg: dict) -> DataFrame:
    text_col = arg.get("textField", "text")
    out = df
    if arg.get("counts"):  # counts come from the ORIGINAL text
        for name, col in X.pii_counts(F.col(text_col)).items():
            out = out.withColumn(name, col)
    return out.withColumn(text_col, X.pii_redact(F.col(text_col)))


def _gopher_filter(df: DataFrame, arg: dict) -> DataFrame:
    return df.filter(X.gopher_keep(F.col(arg.get("textField", "text"))))


def _stratified_sample(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import stratified_sample

    return stratified_sample(
        df,
        strata_col=arg["strataField"],
        fractions={str(k): float(v) for k, v in arg["fractions"].items()},
        id_col=arg.get("idField", "doc_id"),
        seed=str(arg.get("seed", "strat0")),
        default_fraction=float(arg.get("defaultFraction", 0.0)),
    )


def _curate(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import curate

    return curate(
        df,
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
        langs=tuple(arg.get("langs", ["en"])),
        min_quality=float(arg.get("minQuality", 0.05)),
        min_tokens=int(arg.get("minTokens", 5)),
        max_tokens=int(arg.get("maxTokens", 1_000_000)),
        jaccard_threshold=float(arg.get("jaccardThreshold", 0.5)),
    )


def _lm_score(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import lm_logprob_score

    return lm_logprob_score(
        df, text_col=arg.get("textField", "text"), id_col=arg.get("idField", "doc_id")
    )


def _boilerplate(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import remove_boilerplate

    return remove_boilerplate(
        df,
        window=int(arg.get("window", 16)),
        max_docs=int(arg.get("maxDocs", 2)),
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
    )


def _mixture_resample(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import mixture_resample

    return mixture_resample(
        df,
        group_col=arg["groupField"],
        target_shares={str(k): float(v) for k, v in arg["shares"].items()},
        id_col=arg.get("idField", "doc_id"),
        seed=str(arg.get("seed", "mix0")),
    )


def _mixture_upsample(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import mixture_upsample

    return mixture_upsample(
        df,
        group_col=arg["groupField"],
        factors={str(k): float(v) for k, v in arg["factors"].items()},
        id_col=arg.get("idField", "doc_id"),
        seed=str(arg.get("seed", "up0")),
    )


def _select_topk(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import select_topk_per_group

    return select_topk_per_group(
        df,
        group_col=arg["groupField"],
        score=F.col(arg["scoreField"]),
        k=int(arg.get("k", 10)),
        id_col=arg.get("idField", "doc_id"),
    )


def _tokenize_ids(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import build_vocab, encode_token_ids

    text_col = arg.get("textField", "text")
    if "maxVocab" not in arg:
        # encode_token_ids broadcasts the vocab unconditionally — an
        # unbounded distinct-term vocabulary would blow the broadcast
        # at corpus scale, so the stage makes the bound explicit
        raise ValueError("$tokenizeIds requires maxVocab (the vocab broadcast bound)")
    vocab = build_vocab(
        df,
        text_col=text_col,
        min_count=int(arg.get("minCount", 1)),
        max_vocab=int(arg["maxVocab"]),
    )
    return encode_token_ids(
        df,
        vocab,
        text_col=text_col,
        id_col=arg.get("idField", "doc_id"),
        unk_id=int(arg.get("unkId", -1)),
    )


def _sessionize(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.streaming import sessionize

    return sessionize(
        df,
        ts_col=arg.get("tsField", "ts"),
        key_col=arg.get("keyField", "user_id"),
        gap=arg.get("gap", "30 minutes"),
        value_col=arg.get("valueField", "value"),
    )


def _rollup_time(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.temporal import rollup_time

    return rollup_time(
        df,
        ts_col=arg.get("tsField", "ts"),
        value_col=arg.get("valueField", "value"),
        resolutions=tuple(arg.get("resolutions", ["hour", "day", "month"])),
        series_cols=tuple(arg.get("seriesFields", [])),
    )


def _scd2_history(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.sinks.merge import scd2_history

    return scd2_history(
        df,
        key=arg.get("keyField", "doc_id"),
        seq=arg.get("seqField", "seq"),
        is_delete=arg.get("deleteField", "is_delete"),
    )


def _dataset_card(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import dataset_card

    return dataset_card(
        df,
        source_col=arg.get("sourceField", "source"),
        text_col=arg.get("textField", "text"),
        lang_col=arg.get("langField", "lang"),
    )


def _asof_join_stage(df: DataFrame, arg: dict) -> DataFrame:
    """{"$asofJoin": {"from": <collection>, "on": key(s), ...}} — the
    right side resolves through the same collection resolver $lookup
    uses, so pipelines join against named tables declaratively.
    "static": true selects the broadcast sorted-history form (zero
    left-side shuffle; required when the pipeline runs on a stream);
    "sliceS": N selects the hot-key (key, time-slice) form."""
    from route81_spark.ops.temporal import asof_join, asof_join_sliced, asof_join_static
    from route81_spark.pipeline.compiler import _resolve_collection

    right = _resolve_collection(arg["from"])
    common = dict(
        on=arg.get("on", "user_id"),
        left_ts=arg.get("leftTs", "ts"),
        right_ts=arg.get("rightTs", "ts"),
        suffix=arg.get("suffix", "_r"),
    )
    tol = arg.get("toleranceS")
    if arg.get("static") or arg.get("sliceS") is not None:
        if tol is not None:
            raise ValueError(
                "$asofJoin: toleranceS is only supported by the default window "
                "form — the static/sliced variants would silently ignore it"
            )
        if arg.get("static") and arg.get("sliceS") is not None:
            raise ValueError("$asofJoin: choose ONE of static / sliceS")
    if arg.get("static"):
        return asof_join_static(df, right, **common)
    if arg.get("sliceS") is not None:
        return asof_join_sliced(df, right, slice_s=int(arg["sliceS"]), **common)
    return asof_join(
        df, right, tolerance_s=float(tol) if tol is not None else None, **common
    )


def _range_join_stage(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.temporal import range_join
    from route81_spark.pipeline.compiler import _resolve_collection

    intervals = _resolve_collection(arg["from"])
    return range_join(
        df,
        intervals,
        on=arg.get("on", "user_id"),
        point_ts=arg.get("pointTs", "ts"),
        start_col=arg.get("startField", "start"),
        end_col=arg.get("endField", "end"),
        bucket_s=int(arg.get("bucketS", 3600)),
    )


register_stage("$dedupExact", _dedup_exact)
register_stage("$minhashLsh", _minhash_lsh)
register_stage("$simhash", _simhash)
register_stage("$stem", _stem)
register_stage("$textAnalyze", _text_analyze)
register_stage("$langId", _lang_id)
register_stage("$similarityTopK", _similarity_topk)
register_stage("$chunk", _chunk)
register_stage("$piiRedact", _pii_redact)
register_stage("$gopherFilter", _gopher_filter)
register_stage("$stratifiedSample", _stratified_sample)
register_stage("$curate", _curate)
register_stage("$lmScore", _lm_score)
register_stage("$boilerplate", _boilerplate)
register_stage("$mixtureResample", _mixture_resample)
register_stage("$mixtureUpsample", _mixture_upsample)
register_stage("$selectTopK", _select_topk)
register_stage("$tokenizeIds", _tokenize_ids)
register_stage("$sessionize", _sessionize)
register_stage("$rollupTime", _rollup_time)
register_stage("$scd2History", _scd2_history)
register_stage("$datasetCard", _dataset_card)
def _weighted_sample(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import weighted_sample

    return weighted_sample(
        df,
        weight=F.col(arg["weightField"]),
        k=int(arg["k"]),
        id_col=arg.get("idField", "doc_id"),
        seed=arg.get("seed", "wsample0"),
    )


def _bm25(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import bm25_scores

    return bm25_scores(
        df,
        query_terms=list(arg["terms"]),
        k1=float(arg.get("k1", 1.2)),
        b=float(arg.get("b", 0.75)),
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
    )


def _phrase_search(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.text import phrase_search

    return phrase_search(
        df,
        phrase=list(arg["phrase"]),
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
    )


register_stage("$asofJoin", _asof_join_stage)
register_stage("$rangeJoin", _range_join_stage)
register_stage("$weightedSample", _weighted_sample)
def _edit_distance_dedup(df: DataFrame, arg: dict) -> DataFrame:
    """LSH candidates verified by normalized Levenshtein (the short-text
    counterpart of $minhashLsh's Jaccard verification)."""
    text_col = arg.get("textField", "text")
    id_col = arg.get("idField", "doc_id")
    pairs = D.lsh_candidates(
        df, text_col, id_col, k=int(arg.get("k", 8)), bands=int(arg.get("bands", 2))
    )
    return D.edit_distance_pairs(
        df, pairs, text_col, id_col, max_norm=float(arg.get("maxNorm", 0.2))
    )


def _cluster_reps(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.dedup import cluster_representatives, near_dup_clusters

    text_col = arg.get("textField", "text")
    id_col = arg.get("idField", "doc_id")
    pairs = D.lsh_candidates(
        df, text_col, id_col, k=int(arg.get("k", 8)), bands=int(arg.get("bands", 2))
    )
    verified = D.ngram_jaccard_pairs(
        df, pairs, text_col, id_col, threshold=float(arg.get("threshold", 0.5))
    )
    clusters = near_dup_clusters(verified.select("id_a", "id_b"))
    return cluster_representatives(df, clusters, F.col(arg["scoreField"]), id_col=id_col)


def _mmr_select(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.similarity import mmr_select

    return mmr_select(
        df,
        score_col=arg["scoreField"],
        k=int(arg["k"]),
        lam=float(arg.get("lambda", 0.7)),
        candidate_pool=arg.get("candidatePool"),
        id_col=arg.get("idField", "vec_id"),
        vec_col=arg.get("vecField", "embedding"),
    )


register_stage("$bm25", _bm25)
def _funnel(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.temporal import funnel_counts

    return funnel_counts(
        df,
        steps=list(arg["steps"]),
        step_col=arg.get("stepField", "event_type"),
        ts_col=arg.get("tsField", "ts"),
        user_col=arg.get("userField", "user_id"),
    )


def _retention(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.temporal import retention_cohorts

    return retention_cohorts(
        df,
        ts_col=arg.get("tsField", "ts"),
        user_col=arg.get("userField", "user_id"),
        period_s=int(arg.get("periodS", 7 * 86400)),
    )


register_stage("$editDistanceDedup", _edit_distance_dedup)
register_stage("$clusterRepresentatives", _cluster_reps)
register_stage("$mmrSelect", _mmr_select)
def _anomaly(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.temporal import rolling_zscore_anomalies

    if "tiebreakField" not in arg:
        raise ValueError(
            "$anomaly requires tiebreakField (a unique column breaking "
            "equal-timestamp ties; determinism contract)"
        )
    return rolling_zscore_anomalies(
        df,
        ts_col=arg.get("tsField", "ts"),
        key_col=arg.get("keyField", "user_id"),
        value_col=arg.get("valueField", "value"),
        window_rows=int(arg.get("windowRows", 10)),
        threshold=float(arg.get("threshold", 2.0)),
        min_n=int(arg.get("minN", 5)),
        order_tiebreak=arg["tiebreakField"],
    )


register_stage("$funnel", _funnel)
register_stage("$anomaly", _anomaly)
register_stage("$retention", _retention)
def _compression_ratio(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.text import compression_ratio

    return compression_ratio(
        df,
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
    )


register_stage("$phraseSearch", _phrase_search)
register_stage("$compressionRatio", _compression_ratio)


def _image_dedup(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.multimodal import image_dedup

    return image_dedup(
        df,
        max_hamming=int(arg.get("maxHamming", 3)),
        bands=int(arg.get("bands", 4)),
    )


def _line_dedup(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import line_dedup_global

    return line_dedup_global(
        df,
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
        sep=arg.get("sep"),
        window=arg.get("window"),
    )


def _bpe_train(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import bpe_train_merges

    return bpe_train_merges(
        df, int(arg["merges"]), text_col=arg.get("textField", "text")
    )


def _quality_classify(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import quality_classifier

    if "seedField" not in arg:
        raise ValueError(
            "$qualityClassify requires seedField (the boolean/label column "
            "marking the positive seed set)"
        )
    seed = F.col(arg["seedField"])
    if "seedValue" in arg:
        seed = seed == F.lit(arg["seedValue"])
    return quality_classifier(
        df,
        seed,
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
    )


register_stage("$imageDedup", _image_dedup)
register_stage("$lineDedup", _line_dedup)
register_stage("$bpeTrain", _bpe_train)
register_stage("$qualityClassify", _quality_classify)


def _span_dedup(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import span_dedup_global

    return span_dedup_global(
        df,
        min_tokens=int(arg.get("minTokens", 8)),
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
    )


register_stage("$spanDedup", _span_dedup)


def _bpe_encode(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import bpe_encode, bpe_train_merges

    if "merges" in arg:
        merges = [tuple(p) for p in arg["merges"]]
    elif "trainMerges" in arg:
        merges = bpe_train_merges(
            df, int(arg["trainMerges"]), text_col=arg.get("textField", "text")
        )
    else:
        raise ValueError(
            "$bpeEncode requires merges ([[l, r], ...] in learned order) "
            "or trainMerges (train N merges on this corpus first)"
        )
    return bpe_encode(
        df,
        merges,
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
    )


register_stage("$bpeEncode", _bpe_encode)


def _audio_dedup(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.multimodal import audio_dedup

    return audio_dedup(
        df,
        max_hamming=int(arg.get("maxHamming", 4)),
        bands=int(arg.get("bands", 4)),
        method=arg.get("method", "spectral"),
    )


def _video_dedup(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.multimodal import video_dedup

    num, den = arg.get("threshold", [3, 10])
    return video_dedup(
        df,
        threshold_ratio=(int(num), int(den)),
        id_col=arg.get("idField", "media_id"),
        sha_col=arg.get("shaField", "frame_sha"),
    )


def _chat_render(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import chat_render

    return chat_render(
        df,
        conv_col=arg.get("convField", "conv_id"),
        order_cols=tuple(arg.get("orderFields", ["ts"])),
        role_col=arg.get("roleField", "role"),
        content_col=arg.get("contentField", "content"),
        assistant_role=arg.get("assistantRole", "assistant"),
    )


def _insert_canaries(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import insert_canaries

    num, den = arg.get("rate", [1, 8])
    return insert_canaries(
        df,
        rate=(int(num), int(den)),
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
        seed=arg.get("seed", "canary0"),
    )


def _detect_canaries(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import detect_canaries

    return detect_canaries(
        df,
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
        pattern=arg.get("pattern", "CANARY-[0-9]+"),
    )


register_stage("$audioDedup", _audio_dedup)
register_stage("$videoDedup", _video_dedup)
register_stage("$chatRender", _chat_render)
def _normalize_text(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.text import normalize_text

    src = arg.get("textField", "text")
    return df.withColumn(arg.get("outputField", src), normalize_text(F.col(src)))


def _stupid_backoff(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import split_hash, stupid_backoff_score

    frac = float(arg.get("trainFraction", 1.0))
    train = (
        df.filter(
            split_hash(F.col(arg.get("idField", "doc_id")), arg.get("seed", "sb0"))
            < frac
        )
        if frac < 1.0
        else None
    )
    return stupid_backoff_score(
        df,
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
        train_on=train,
        alpha=float(arg.get("alpha", 0.4)),
    )


def _snapshot_diff(df: DataFrame, arg: dict) -> DataFrame:
    """Pipeline input = the NEW snapshot; `from` names the OLD one
    (resolved through the same collection hook $lookup uses)."""
    from route81_spark.ops.corpus import snapshot_diff
    from route81_spark.pipeline.compiler import _resolve_collection

    return snapshot_diff(
        _resolve_collection(arg["from"]),
        df,
        id_col=arg.get("idField", "doc_id"),
        text_col=arg.get("textField", "text"),
    )


def _bloom_dedup(df: DataFrame, arg: dict) -> DataFrame:
    """Incremental-ingestion Bloom dedup: `refSplit` carves the
    already-ingested slice by deterministic hash (or pass a
    pre-built dense `words` bitmap to skip the build phase)."""
    from route81_spark.ops.corpus import _h60, bloom_apply, bloom_paragraph_dedup

    kw = dict(
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
        sep=arg.get("sep"),
        window=arg.get("window", 4 if arg.get("sep") is None else None),
        k=int(arg.get("k", 3)),
        seed=arg.get("seed", "bloom0"),
    )
    if "words" in arg:
        return bloom_apply(df, [int(w) for w in arg["words"]], **kw)
    num, den = arg.get("refSplit", [1, 2])
    thr = (int(num) << 60) // int(den)
    ref = _h60(F.col(kw["id_col"]), arg.get("splitSeed", "bloomsplit0")) < F.lit(thr)
    return bloom_paragraph_dedup(
        df, ref, m_bits=int(arg.get("mBits", 1 << 20)), **kw
    )


def _cdc_chunks(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.dedup import cdc_chunk_stats

    return cdc_chunk_stats(
        df,
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
        k=int(arg.get("window", 8)),
        divisor=int(arg.get("divisor", 16)),
        seed=arg.get("seed", "cdcb0"),
        content_seed=arg.get("contentSeed", "cdcc0"),
    )


def _containment(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.dedup import containment_pairs

    num, den = arg.get("threshold", [1, 2])
    return containment_pairs(
        df,
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
        n=int(arg.get("shingle", 3)),
        threshold=(int(num), int(den)),
        max_df=int(arg.get("maxDf", 32)),
        seed=int(arg.get("seed", 19)),
    )


def _novelty(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.text import novelty_scores

    return novelty_scores(
        df,
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
        n=int(arg.get("shingle", 3)),
        seed=int(arg.get("seed", 23)),
    )


def _zipf_fit(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import zipf_fit

    return zipf_fit(
        df,
        text_col=arg.get("textField", "text"),
        top_v=int(arg.get("topV", 256)),
    )


def _char_entropy(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.text import char_entropy

    src = arg.get("textField", "text")
    return df.withColumn(
        arg.get("outputField", "entropy_bits"), char_entropy(F.col(src))
    )


def _intradoc_dedup(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import intradoc_line_dedup

    return intradoc_line_dedup(
        df,
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
        sep=arg.get("sep"),
        window=arg.get("window", 4 if arg.get("sep") is None else None),
    )


def _cluster_sample(df: DataFrame, arg: dict) -> DataFrame:
    """Pipeline input = the embedding table; `centroids` names the
    codebook collection (resolved via the $lookup collection hook)."""
    from route81_spark.ops.similarity import cluster_balanced_sample
    from route81_spark.pipeline.compiler import _resolve_collection

    return cluster_balanced_sample(
        df,
        _resolve_collection(arg["centroids"]),
        n_per=int(arg.get("nPer", 8)),
        id_col=arg.get("idField", "vec_id"),
        vec_col=arg.get("vecField", "embedding"),
        seed=int(arg.get("seed", 31)),
    )


def _budget_select(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import budget_select

    return budget_select(
        df,
        priority_col=arg.get("priorityField", "priority"),
        tokens_col=arg.get("tokensField", "n_tokens"),
        budget=int(arg["budget"]),
        id_col=arg.get("idField", "doc_id"),
    )


def _triplets(df: DataFrame, arg: dict) -> DataFrame:
    """Pipeline input = the embedding table; anchors default to the
    whole input re-aliased, or a hash-sampled slice via `anchorEvery`."""
    from route81_spark.ops.similarity import contrastive_triplets

    idc = arg.get("idField", "vec_id")
    vec = arg.get("vecField", "embedding")
    lab = arg.get("labelField", "label")
    anchors = df
    if "anchorEvery" in arg:
        anchors = df.filter(F.col(idc) % int(arg["anchorEvery"]) == 0)
    anchors = anchors.select(
        F.col(idc).alias("anchor_id"),
        F.col(vec).alias("anchor_vec"),
        F.col(lab).alias("anchor_label"),
    )
    return contrastive_triplets(
        df, anchors, id_col=idc, vec_col=vec, label_col=lab
    )


def _gate_attribution(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.text import gate_attribution

    return gate_attribution(
        df,
        langs=tuple(arg.get("langs", ["en"])),
        min_quality=float(arg.get("minQuality", 0.05)),
        min_tokens=int(arg.get("minTokens", 5)),
        max_tokens=int(arg.get("maxTokens", 1_000_000)),
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
    )


def _drift(df: DataFrame, arg: dict) -> DataFrame:
    """Pipeline input = the NEW snapshot; `from` names the OLD one
    (the $snapshotDiff convention)."""
    from route81_spark.ops.corpus import distribution_drift
    from route81_spark.pipeline.compiler import _resolve_collection

    return distribution_drift(
        _resolve_collection(arg["from"]),
        df,
        text_col=arg.get("textField", "text"),
    )


def _incremental_curate(df: DataFrame, arg: dict) -> DataFrame:
    """Pipeline input = the NEW snapshot; `from` names the accepted
    OLD corpus (the $snapshotDiff convention)."""
    from route81_spark.ops.corpus import incremental_curation
    from route81_spark.pipeline.compiler import _resolve_collection

    return incremental_curation(
        _resolve_collection(arg["from"]),
        df,
        langs=tuple(arg.get("langs", ["en"])),
        min_quality=float(arg.get("minQuality", 0.05)),
        min_tokens=int(arg.get("minTokens", 5)),
        max_tokens=int(arg.get("maxTokens", 1_000_000)),
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
        window=int(arg.get("window", 4)),
        m_bits=int(arg.get("mBits", 1 << 20)),
        k=int(arg.get("k", 3)),
        seed=arg.get("seed", "bloom0"),
    )


register_stage("$incrementalCurate", _incremental_curate)
register_stage("$distributionDrift", _drift)
register_stage("$gateAttribution", _gate_attribution)
register_stage("$tripletMine", _triplets)
register_stage("$budgetSelect", _budget_select)
register_stage("$clusterSample", _cluster_sample)
register_stage("$intradocDedup", _intradoc_dedup)
register_stage("$novelty", _novelty)
register_stage("$zipfFit", _zipf_fit)
register_stage("$charEntropy", _char_entropy)
register_stage("$containment", _containment)
register_stage("$cdcChunks", _cdc_chunks)
register_stage("$bloomDedup", _bloom_dedup)
register_stage("$insertCanaries", _insert_canaries)
register_stage("$detectCanaries", _detect_canaries)
register_stage("$normalizeText", _normalize_text)
register_stage("$stupidBackoff", _stupid_backoff)
register_stage("$snapshotDiff", _snapshot_diff)


def _decontaminate_excise(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import decontaminate_excise
    from route81_spark.pipeline import compiler

    if "from" not in arg:
        raise ValueError("$decontaminateExcise requires 'from' (benchmark collection)")
    bench = compiler._resolve_collection(arg["from"])
    return decontaminate_excise(
        df,
        bench,
        n=int(arg.get("n", 5)),
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
        bench_text_col=arg.get("benchTextField", arg.get("textField", "text")),
    )


register_stage("$decontaminateExcise", _decontaminate_excise)


def _temperature_mix(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import temperature_mixture

    if "groupField" not in arg or "T" not in arg:
        raise ValueError("$temperatureMix requires groupField and T")
    return temperature_mixture(
        df,
        arg["groupField"],
        float(arg["T"]),
        id_col=arg.get("idField", "doc_id"),
        seed=arg.get("seed", "mixT"),
    )


register_stage("$temperatureMix", _temperature_mix)


def _quality_apply(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import apply_quality_model, quality_model
    from route81_spark.pipeline import compiler

    if "modelFrom" in arg:
        model = compiler._resolve_collection(arg["modelFrom"])
    elif "trainSeedField" in arg:
        seed = F.col(arg["trainSeedField"])
        if "seedValue" in arg:
            seed = seed == F.lit(arg["seedValue"])
        model = quality_model(
            df,
            seed,
            text_col=arg.get("textField", "text"),
            id_col=arg.get("idField", "doc_id"),
        )
    else:
        raise ValueError(
            "$qualityApply requires modelFrom (a trained (b, w) collection) "
            "or trainSeedField (train on this corpus first)"
        )
    return apply_quality_model(
        df,
        model,
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
    )


register_stage("$qualityApply", _quality_apply)


def _fim(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import fim_transform

    return fim_transform(
        df,
        rate=float(arg.get("rate", 0.5)),
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
        seed=int(arg.get("seed", 7)),
    )


register_stage("$fimTransform", _fim)


def _knn_graph(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.similarity import knn_graph

    return knn_graph(
        df,
        k=int(arg.get("k", 3)),
        # omitted nDims -> self-scaling bucket width from the count
        n_dims=int(arg["nDims"]) if "nDims" in arg else None,
        id_col=arg.get("idField", "vec_id"),
        vec_col=arg.get("vecField", "embedding"),
        # OR-amplification bands (disjoint dim slices); clamped to the
        # vector width inside knn_graph
        n_bands=int(arg.get("nBands", 1)),
        vec_dim=int(arg.get("vecDim", 64)),
        corpus_count=int(arg["corpusCount"]) if "corpusCount" in arg else None,
    )


def _random_project(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.similarity import random_project

    return random_project(
        df,
        out_dim=int(arg.get("outDim", 16)),
        in_dim=int(arg.get("inDim", 64)),
        seed=str(arg.get("seed", "jl")),
        id_col=arg.get("idField", "vec_id"),
        vec_col=arg.get("vecField", "embedding"),
    )


def _overlap_sketch(df: DataFrame, arg: dict) -> DataFrame:
    """Pipeline input = snapshot A; `other` names snapshot B's
    collection (resolved via the $lookup collection hook)."""
    from route81_spark.ops.corpus import kmv_overlap_sketch
    from route81_spark.pipeline.compiler import _resolve_collection

    return kmv_overlap_sketch(
        df,
        _resolve_collection(arg["other"]),
        k=int(arg.get("k", 128)),
        text_col=arg.get("textField", "text"),
    )


register_stage("$knnGraph", _knn_graph)
register_stage("$randomProject", _random_project)
register_stage("$overlapSketch", _overlap_sketch)


def _preference_pairs(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.corpus import preference_pairs

    return preference_pairs(
        df,
        group_col=arg.get("groupField", "prompt_id"),
        id_col=arg.get("idField", "doc_id"),
        text_col=arg.get("textField", "text"),
    )


register_stage("$preferencePairs", _preference_pairs)


def _audio_segments(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.multimodal import audio_segments

    return audio_segments(
        df,
        threshold=int(arg.get("threshold", 3_000_000_000)),
        frame=int(arg.get("frame", 30)),
        min_frames=int(arg.get("minFrames", 2)),
    )


register_stage("$audioSegments", _audio_segments)


def _image_tiles(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.multimodal import image_tiles

    return image_tiles(df, patch=int(arg.get("patch", 4)))


register_stage("$imageTiles", _image_tiles)


def _ood_filter(df: DataFrame, arg: dict) -> DataFrame:
    """Input = the embedding table; `centroids` names the reference
    codebook collection (via the $lookup collection hook)."""
    from route81_spark.ops.similarity import centroid_ood_scores
    from route81_spark.pipeline.compiler import _resolve_collection

    return centroid_ood_scores(
        df,
        _resolve_collection(arg["centroids"]),
        threshold=float(arg.get("threshold", 0.2)),
        id_col=arg.get("idField", "vec_id"),
        vec_col=arg.get("vecField", "embedding"),
    )


def _centroid_update(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.similarity import centroid_update
    from route81_spark.pipeline.compiler import _resolve_collection

    return centroid_update(
        df,
        _resolve_collection(arg["centroids"]),
        digits=int(arg.get("digits", 6)),
        id_col=arg.get("idField", "vec_id"),
        vec_col=arg.get("vecField", "embedding"),
    )


register_stage("$oodFilter", _ood_filter)
register_stage("$centroidUpdate", _centroid_update)


def _html_extract(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.text import html_to_text

    src = arg.get("textField", "text")
    out = arg.get("as", "clean_text")
    return df.withColumn(out, html_to_text(F.col(src)))


register_stage("$htmlExtract", _html_extract)


def _url_canon(df: DataFrame, arg: dict) -> DataFrame:
    """$urlCanon: canonicalize a URL column (and optionally project the
    host / registrable domain alongside). All pure-Column, zero shuffle."""
    from route81_spark.ops.web import (
        registrable_domain,
        url_canonicalize,
        url_host,
    )

    src = arg.get("field", "url")
    out = df.withColumn(
        arg.get("as", "canon_url"),
        url_canonicalize(
            F.col(src), strip_tracking=bool(arg.get("tracking", True))
        ),
    )
    if arg.get("hostAs"):
        out = out.withColumn(arg["hostAs"], url_host(F.col(src)))
    if arg.get("domainAs"):
        out = out.withColumn(
            arg["domainAs"], registrable_domain(url_host(F.col(src)))
        )
    return out


def _domain_filter(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.web import domain_filter

    return domain_filter(
        df,
        url_col=arg.get("field", "url"),
        block=arg.get("block", ()),
        allow=arg.get("allow", ()),
    )


def _url_dedup(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.web import url_dedup

    return url_dedup(
        df,
        url_col=arg.get("field", "url"),
        id_col=arg.get("idField", "doc_id"),
    )


def _domain_gate(df: DataFrame, arg: dict) -> DataFrame:
    from route81_spark.ops.web import domain_gate

    num, den = arg.get("maxDupRatio", [1, 4])
    return domain_gate(
        df,
        url_col=arg.get("field", "url"),
        text_col=arg.get("textField", "text"),
        id_col=arg.get("idField", "doc_id"),
        max_dup_ratio=(int(num), int(den)),
    )


def _robots_filter(df: DataFrame, arg: dict) -> DataFrame:
    """$robotsFilter: `robots` names the (key, robots_txt) collection
    via the $lookup collection hook."""
    from route81_spark.ops.web import robots_filter
    from route81_spark.pipeline.compiler import _resolve_collection

    return robots_filter(
        df,
        _resolve_collection(arg["robots"]),
        url_col=arg.get("field", "url"),
        key_col=arg.get("keyField", "domain"),
        text_col=arg.get("textField", "robots_txt"),
    )


register_stage("$urlCanon", _url_canon)
register_stage("$domainFilter", _domain_filter)
register_stage("$urlDedup", _url_dedup)
register_stage("$domainGate", _domain_gate)
register_stage("$robotsFilter", _robots_filter)
