"""Streaming stateful operators: cross-batch exact dedup and
applyInPandasWithState running stats, driven by a JSON file stream with
two sequential input files so state must survive micro-batches."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_batch(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_available_now(df, out_dir, checkpoint):
    q = (
        df.writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(checkpoint))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    from route81_spark.ops.streaming import streaming_exact_dedup

    src = tmp_path / "src"
    # batch 1: doc 1 and 2 (2 is a whitespace/case variant of 1 -> dup)
    _write_batch(
        src / "b1.json",
        [
            {"doc_id": 1, "text": "Hello  World", "ts": "2024-01-01T00:00:00"},
            {"doc_id": 2, "text": "hello world", "ts": "2024-01-01T00:00:01"},
            {"doc_id": 3, "text": "unique A", "ts": "2024-01-01T00:00:02"},
        ],
    )
    stream = (
        spark.readStream.schema(DOC_SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    deduped = streaming_exact_dedup(stream, "text")
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    _run_available_now(deduped, out, ckpt)

    got = {r["doc_id"] for r in spark.read.schema(DOC_SCHEMA).parquet(str(out)).collect()}
    assert len(got) == 2 and 3 in got and len(got & {1, 2}) == 1

    # batch 2 arrives later: all dups of batch 1 plus one new doc —
    # state must persist across the restarted availableNow run (same
    # checkpoint), so only the new doc is emitted
    _write_batch(
        src / "b2.json",
        [
            {"doc_id": 4, "text": "HELLO   world", "ts": "2024-01-01T00:01:00"},
            {"doc_id": 5, "text": "unique a", "ts": "2024-01-01T00:01:01"},
            {"doc_id": 6, "text": "brand new", "ts": "2024-01-01T00:01:02"},
        ],
    )
    _run_available_now(deduped, out, ckpt)
    got2 = {r["doc_id"] for r in spark.read.schema(DOC_SCHEMA).parquet(str(out)).collect()}
    assert got2 - got == {6}


def test_running_group_stats_matches_batch_agg(spark, tmp_path):
    from route81_spark.ops.streaming import running_group_stats

    src = tmp_path / "src"
    rows1 = [{"event_id": i, "user_id": f"u{i % 3}", "value": float(i)} for i in range(30)]
    rows2 = [
        {"event_id": 100 + i, "user_id": f"u{i % 3}", "value": float(100 + i)}
        for i in range(15)
    ]
    _write_batch(src / "b1.json", rows1)
    _write_batch(src / "b2.json", rows2)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    stats = running_group_stats(stream, "user_id", "value")
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    # stateful update-mode output needs an update-capable sink:
    # foreachBatch appending each emission to parquet
    q = (
        stats.writeStream.outputMode("update")
        .foreachBatch(
            lambda batch, _id: batch.write.mode("append").parquet(str(out))
        )
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    result = spark.read.parquet(str(out))
    # the last emission per key must equal the batch aggregate over all rows
    batch = (
        spark.createDataFrame(rows1 + rows2, EVENT_SCHEMA)
        .groupBy(F.col("user_id").alias("key"))
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("total"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
    )
    final = (
        result.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "key"
                ).orderBy(F.col("n").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    got = {r["key"]: (r["n"], r["total"], r["vmin"], r["vmax"]) for r in final.collect()}
    want = {r["key"]: (r["n"], r["total"], r["vmin"], r["vmax"]) for r in batch.collect()}
    assert got == want


def test_windowed_counts_matches_batch(spark, tmp_path):
    from route81_spark.ops.streaming import windowed_counts

    src = tmp_path / "src"
    rows = [
        {
            "event_id": i,
            "user_id": f"u{i % 2}",
            "value": float(i),
            "ts": f"2024-01-01T00:{i % 50:02d}:00",
        }
        for i in range(100)
    ]
    _write_batch(src / "b1.json", rows[:60])
    _write_batch(src / "b2.json", rows[60:])

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(str(src))
    agg = windowed_counts(stream, "ts", "user_id", "value", window="10 minutes")
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits watermark-closed windows; re-run with a
    # far-future row to flush the rest
    _write_batch(
        src / "b3.json",
        [{"event_id": 999, "user_id": "u0", "value": 0.0, "ts": "2024-01-02T00:00:00"}],
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(out))
    batch = (
        spark.createDataFrame(
            [(r["event_id"], r["user_id"], r["value"], r["ts"]) for r in rows],
            "event_id long, user_id string, value double, ts string",
        )
        .withColumn("ts", F.to_timestamp("ts"))
        .groupBy(F.window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(F.col("w.start").alias("w_start"), "user_id", "n", "total")
    )
    g = {(r["w_start"], r["user_id"]): (r["n"], r["total"]) for r in got.collect()}
    w = {(r["w_start"], r["user_id"]): (r["n"], r["total"]) for r in batch.collect()}
    # every original window must have been flushed and match exactly
    # (the flush row's own window may or may not be closed yet)
    for k, v in w.items():
        assert g[k] == v


def test_sessionize_streaming_matches_batch(spark, tmp_path):
    """session_window is the rare stateful op whose EXPRESSION is
    identical batch vs stream: sessions split across two micro-batches
    must merge in state and the final parquet must equal the batch
    result over the union of inputs."""
    from route81_spark.ops.streaming import sessionize

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    rows1 = [
        {"user_id": 1, "ts": "2024-01-01T00:00:00", "value": 1.0},
        {"user_id": 1, "ts": "2024-01-01T00:10:00", "value": 2.0},
        {"user_id": 2, "ts": "2024-01-01T02:00:00", "value": 5.0},
    ]
    # batch 2 extends user 1's open session (10:00 + <30m gap) and opens
    # a fresh one much later
    rows2 = [
        {"user_id": 1, "ts": "2024-01-01T00:25:00", "value": 3.0},
        {"user_id": 1, "ts": "2024-01-01T05:00:00", "value": 4.0},
    ]
    src = tmp_path / "src"
    _write_batch(src / "b1.json", rows1)
    # 3h watermark: after batch 1 (max ts 02:00) the watermark sits at
    # 23:00 the previous day, so user 1's session stays OPEN in state and
    # batch 2's 00:25 event must merge into it (not count as late data)
    stream = (
        spark.readStream.schema(schema).json(str(src)).withWatermark("ts", "3 hours")
    )
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    _run_available_now(sessionize(stream), out, ckpt)
    _write_batch(src / "b2.json", rows2)
    _run_available_now(sessionize(stream), out, ckpt)

    got = {
        (r["user_id"], r["start_us"]): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(str(out)).collect()
    }
    batch_df = spark.createDataFrame(
        [(r["user_id"], r["ts"], r["value"]) for r in rows1 + rows2],
        "user_id long, ts string, value double",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    want = {
        (r["user_id"], r["start_us"]): (r["n_events"], r["total_value"])
        for r in sessionize(batch_df).collect()
    }
    # after batch 2 the watermark is 05:00-3h = 02:00: exactly user 1's
    # merged first session (ends 00:55) has finalized — it must match the
    # batch result over the UNION of inputs (3 events, 6.0), proving the
    # cross-batch merge; the still-open sessions must not be emitted yet
    u1_first = min(k for k in want if k[0] == 1)
    assert got == {u1_first: want[u1_first]}
    assert want[u1_first] == (3, 6.0)


def test_streaming_curate_gate_index_and_dedup(spark, tmp_path):
    """streaming_curate: the batch curation gate streams unchanged, the
    static accepted index prunes via stream-static anti-join, and
    cross-batch dedup holds — all in one availableNow run."""
    from pyspark.sql import Row

    from route81_spark.ops.streaming import streaming_curate

    en = "the cat and the dog of a to a walk"          # passes en gate
    src = tmp_path / "src"
    _write_batch(
        src / "b1.json",
        [
            {"doc_id": 1, "text": en, "ts": "2024-01-01T00:00:00"},
            # whitespace variant of doc 1 -> in-stream dup
            {"doc_id": 2, "text": en.replace(" cat ", "  cat "), "ts": "2024-01-01T00:00:01"},
            # fails the language gate
            {"doc_id": 3, "text": "der hund und die katze ist das gut ja", "ts": "2024-01-01T00:00:02"},
            # already in the accepted index -> anti-joined away
            {"doc_id": 4, "text": "the bird and the fish of a to a swim", "ts": "2024-01-01T00:00:03"},
            # fails min_tokens
            {"doc_id": 5, "text": "the a", "ts": "2024-01-01T00:00:04"},
        ],
    )
    index = spark.createDataFrame(
        [Row(doc_id=100, text="THE bird and the fish of a to a   swim")],
        "doc_id long, text string",
    )
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
    curated = streaming_curate(stream, index=index, min_quality=0.0, min_tokens=5)
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    _run_available_now(curated, out, ckpt)
    got = {r["doc_id"] for r in spark.read.schema(DOC_SCHEMA).parquet(str(out)).collect()}
    assert len(got) == 1 and got <= {1, 2}


def test_jsonl_stream_intake_to_curation(spark, tmp_path):
    """Drop-dir JSONL stream -> parse/corrupt split -> streaming_curate:
    the full streaming intake path, one availableNow run."""
    from route81_spark.ops.streaming import streaming_curate
    from route81_spark.sources.corpus_files import (
        CORRUPT_COL,
        read_jsonl_corpus_stream,
        split_corrupt,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "the cat and the dog of a to a walk"}\n'
        "not json\n"
        '{"doc_id": 2, "text": "der hund und die katze ist das gut ja"}\n'
    )
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = read_jsonl_corpus_stream(spark, str(drop), schema)
    good, _ = split_corrupt(stream)
    curated = streaming_curate(good, min_quality=0.0, min_tokens=5)
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = (
        curated.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.schema(schema).parquet(str(out)).collect()
    assert [r["doc_id"] for r in rows] == [1]  # corrupt + de doc filtered


def test_streaming_rollup_compacts_to_batch_rollup(spark, tmp_path):
    """Stream hour partials (availableNow), compact to hour/day/month,
    and the result must equal the pure-batch rollup_time over the same
    rows — the continuous-aggregate contract."""
    import datetime as dtm

    from route81_spark.ops.streaming import compact_rollup, streaming_rollup
    from route81_spark.ops.temporal import rollup_time

    src = tmp_path / "roll_src"
    rows = [
        {"event_id": i, "user_id": "u0", "value": float(i),
         "ts": f"2024-01-{1 + i % 3:02d}T{i % 24:02d}:15:00"}
        for i in range(60)
    ]
    # files arrive in event-time order: the watermark advances between
    # micro-batches, so out-of-order files would (correctly) be dropped
    # as late data — this test pins the no-late-data equivalence
    rows.sort(key=lambda r: r["ts"])
    _write_batch(src / "b1.json", rows[:30])
    _write_batch(src / "b2.json", rows[30:])
    # the file source orders micro-batches by mtime; same-tick writes
    # tie arbitrarily and a reordered file would be watermark-dropped —
    # pin strictly increasing mtimes (b3 pinned after its write below)
    import os as _os

    _os.utime(src / "b1.json", (1_000_000, 1_000_000))
    _os.utime(src / "b2.json", (1_000_100, 1_000_100))
    # far-future row so the watermark closes every real bucket
    _write_batch(
        src / "b3.json",
        [{"event_id": 999, "user_id": "u0", "value": 0.0,
          "ts": "2024-06-01T00:00:00"}],
    )
    _os.utime(src / "b3.json", (1_000_200, 1_000_200))
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(str(src))
    out, ckpt = tmp_path / "roll_out", tmp_path / "roll_ckpt"
    q = (
        streaming_rollup(stream, "ts", "value")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    hourly = spark.read.parquet(str(out))
    got = {
        (r["resolution"], r["bucket"]): (r["n"], r["total"])
        for r in compact_rollup(hourly).collect()
    }
    batch_df = spark.createDataFrame(
        [(dtm.datetime.fromisoformat(r["ts"]), r["value"]) for r in rows],
        "ts timestamp, value double",
    )
    want = {
        (r["resolution"], r["bucket"]): (r["n"], r["total"])
        for r in rollup_time(batch_df, "ts", "value").collect()
    }
    assert got == want


def test_streaming_rollup_per_series(spark, tmp_path):
    """Series-keyed streaming partials compact to the per-series batch
    rollup."""
    import datetime as dtm

    from route81_spark.ops.streaming import compact_rollup, streaming_rollup
    from route81_spark.ops.temporal import rollup_time

    src = tmp_path / "sroll_src"
    rows = [
        {"event_id": i, "user_id": "a" if i % 2 else "b", "value": float(i),
         "ts": f"2024-01-01T{i % 12:02d}:10:00"}
        for i in range(48)
    ]
    rows.sort(key=lambda r: r["ts"])
    _write_batch(src / "b1.json", rows)
    _write_batch(
        src / "b2.json",
        [{"event_id": 999, "user_id": "a", "value": 0.0,
          "ts": "2024-06-01T00:00:00"}],
    )
    import os as _os

    _os.utime(src / "b1.json", (1_000_000, 1_000_000))
    _os.utime(src / "b2.json", (1_000_100, 1_000_100))
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(str(src))
    out, ckpt = tmp_path / "sroll_out", tmp_path / "sroll_ckpt"
    q = (
        streaming_rollup(stream, "ts", "value", series_cols=("user_id",))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    hourly = spark.read.parquet(str(out))
    got = {
        (r["user_id"], r["resolution"], r["bucket"]): (r["n"], r["total"])
        for r in compact_rollup(
            hourly, resolutions=("hour", "day"), series_cols=("user_id",)
        ).collect()
    }
    batch_df = spark.createDataFrame(
        [(r["user_id"], dtm.datetime.fromisoformat(r["ts"]), r["value"]) for r in rows],
        "user_id string, ts timestamp, value double",
    )
    want = {
        (r["user_id"], r["resolution"], r["bucket"]): (r["n"], r["total"])
        for r in rollup_time(
            batch_df, "ts", "value", resolutions=("hour", "day"),
            series_cols=("user_id",),
        ).collect()
    }
    assert got == want


def test_streaming_quality_model_scoring(spark, tmp_path):
    """apply_quality_model is stateless per-row, so the CCNet recipe's
    'train on curated batch, filter the firehose' runs on a Structured
    Stream in append mode with NO watermark/state — and produces the
    exact integer scores the batch classifier computes."""
    from pyspark.sql import Row

    from route81_spark.ops.corpus import (
        apply_quality_model, quality_classifier, quality_model,
    )

    good = "the quick brown fox jumps over the lazy dog near the river"
    bad = "zz yy xx ww vv uu tt ss rr qq pp oo"
    train = spark.createDataFrame(
        [Row(doc_id=i, lab="seed" if i < 3 else "raw",
             text=good if i < 3 else bad) for i in range(6)]
    )
    model = quality_model(train, F.col("lab") == "seed")

    src = tmp_path / "src"
    _write_batch(
        src / "b1.json",
        [
            {"doc_id": 101, "text": good, "ts": "2024-01-01T00:00:00"},
            {"doc_id": 102, "text": bad, "ts": "2024-01-01T00:00:01"},
            {"doc_id": 103, "text": "solo", "ts": "2024-01-01T00:00:02"},
        ],
    )
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
    scored = apply_quality_model(stream, model)
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    _run_available_now(scored, out, ckpt)
    got = {r["doc_id"]: r for r in spark.read.parquet(str(out)).collect()}
    assert got[101]["pred_keep"] == 1 and got[102]["pred_keep"] == 0
    assert 103 not in got  # no bigram -> omitted, matching the batch contract
    # stream scores == batch classifier scores for the same docs
    batch_docs = spark.createDataFrame(
        [Row(doc_id=i, lab="seed" if i < 3 else "raw",
             text=good if i < 3 else bad) for i in range(6)]
    )
    batch = {r["doc_id"]: r for r in
             quality_classifier(batch_docs, F.col("lab") == "seed").collect()}
    assert (got[101]["score"], got[101]["n_bigrams"]) == (
        batch[0]["score"], batch[0]["n_bigrams"])
    assert (got[102]["score"], got[102]["n_bigrams"]) == (
        batch[3]["score"], batch[3]["n_bigrams"])


def test_streaming_normalize_and_canary_detection(spark, tmp_path):
    """normalize_text and detect_canaries are stateless Column maps, so
    they run on a Structured Stream in append mode with no watermark —
    and produce exactly the batch results for the same rows (the
    firehose-hygiene shape: normalize + scan-for-probes at intake)."""
    from pyspark.sql import Row

    from route81_spark.ops.corpus import detect_canaries, insert_canaries
    from route81_spark.ops.text import normalize_text

    base = spark.createDataFrame(
        [Row(doc_id=i, text=f"  “doc {i}”  with junk\t\n\n\n\n end ")
         for i in range(32)]
    )
    planted = insert_canaries(base, rate=(1, 2), seed="s")
    rows = [
        {"doc_id": r["doc_id"], "text": r["text"], "ts": "2024-01-01T00:00:00"}
        for r in planted.collect()
    ]
    src = tmp_path / "src"
    _write_batch(src / "b1.json", rows[:16])
    _write_batch(src / "b2.json", rows[16:])
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
    cleaned = stream.select(
        "doc_id", normalize_text(F.col("text")).alias("text")
    )
    out1, ck1 = tmp_path / "out1", tmp_path / "ck1"
    _run_available_now(cleaned, out1, ck1)
    got_norm = {r["doc_id"]: r["text"]
                for r in spark.read.parquet(str(out1)).collect()}
    want_norm = {r["doc_id"]: r["text"] for r in planted.select(
        "doc_id", normalize_text(F.col("text")).alias("text")).collect()}
    assert got_norm == want_norm

    detected = detect_canaries(spark.readStream.schema(DOC_SCHEMA).json(str(src)))
    out2, ck2 = tmp_path / "out2", tmp_path / "ck2"
    _run_available_now(detected, out2, ck2)
    got_det = {(r["doc_id"], r["canary"])
               for r in spark.read.parquet(str(out2)).collect()}
    want_det = {(r["doc_id"], r["canary_id"])
                for r in planted.collect() if r["is_canary"]}
    assert got_det == want_det and len(want_det) > 0


def test_streaming_html_extract_and_url_canon_match_batch(spark, tmp_path):
    """html_to_text and url_canonicalize complete the stateless
    intake-hygiene set (with normalize_text / apply_quality_model /
    intradoc dedup, pinned above): pure Column maps, stream-legal in
    append mode with no watermark, bit-identical to batch on the same
    rows — the crawl-firehose shape (strip markup, canonicalize the
    source URL) runs on a Structured Stream unchanged."""
    from pyspark.sql import Row

    from route81_spark.ops.text import html_to_text
    from route81_spark.ops.web import synthetic_urls, url_canonicalize

    base = spark.createDataFrame([Row(doc_id=i) for i in range(24)])
    urls = {r["doc_id"]: r["url"] for r in synthetic_urls(base).collect()}
    rows = [
        {"doc_id": i,
         "text": f"<html><head><style>p{{}}</style></head><body>"
                 f"<p>doc {i} &amp; more</p><br><div>at {urls[i]}</div>"
                 f"<!-- c --></body></html>",
         "ts": "2024-01-01T00:00:00"}
        for i in range(24)
    ]
    src = tmp_path / "src"
    _write_batch(src / "b1.json", rows[:12])
    _write_batch(src / "b2.json", rows[12:])
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
    hygiene = stream.select(
        "doc_id",
        html_to_text(F.col("text")).alias("clean"),
        url_canonicalize(
            F.regexp_extract(F.col("text"), r"at ([^<]+)<", 1)
        ).alias("canon"),
    )
    out, ck = tmp_path / "out", tmp_path / "ck"
    _run_available_now(hygiene, out, ck)
    got = {r["doc_id"]: (r["clean"], r["canon"])
           for r in spark.read.parquet(str(out)).collect()}
    batch_df = spark.createDataFrame(
        [Row(doc_id=r["doc_id"], text=r["text"]) for r in rows]
    )
    want = {r["doc_id"]: (r["clean"], r["canon"])
            for r in batch_df.select(
                "doc_id",
                html_to_text(F.col("text")).alias("clean"),
                url_canonicalize(
                    F.regexp_extract(F.col("text"), r"at ([^<]+)<", 1)
                ).alias("canon"),
            ).collect()}
    assert got == want and len(got) == 24
    # the extraction really stripped markup and the canon really fired
    assert all("<" not in c and "&amp;" not in c for c, _ in got.values())
    assert sum(1 for _, u in got.values() if u is not None) == 24


def test_streaming_domain_partials_compact_to_batch_stats(spark, tmp_path):
    """Crawl-intake domain rollup: hour-windowed hash-grain partials
    maintained on the stream, then compact_domain_stats over the
    accumulated partials must equal web.domain_stats over the same raw
    rows — including exact dup counts across micro-batches AND across
    hour buckets (the same page refetched in a later hour still counts
    as a dup after compaction)."""
    from pyspark.sql import Row

    from route81_spark.ops.streaming import (
        compact_domain_stats, streaming_domain_partials,
    )
    from route81_spark.ops.web import domain_stats

    rows = []
    for i in range(24):
        # 6 domains; every third doc repeats a text within its domain,
        # split across two hours and two files
        rows.append({
            "doc_id": i,
            "text": f"page body {i % 4} of d{i % 6}",
            "url": f"http://www.d{i % 6}.com/p/{i}",
            "ts": f"2024-01-01T{i % 2:02d}:05:00",
        })
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    src = tmp_path / "dsrc"
    _write_batch(src / "b1.json", rows[:12])
    _write_batch(src / "b2.json", rows[12:])
    # flush row: far-future event closes every window in append mode
    _write_batch(
        src / "b3.json",
        [{"doc_id": 999, "text": "flush", "url": "http://flush.com/",
          "ts": "2024-01-03T00:00:00"}],
    )
    stream = spark.readStream.schema(schema).json(str(src))
    out, ck = tmp_path / "dout", tmp_path / "dck"
    _run_available_now(streaming_domain_partials(stream), out, ck)
    partials = spark.read.parquet(str(out))
    got = {
        r["domain"]: (r["n_docs"], r["n_dup_docs"], r["total_chars"], r["n_langs"])
        for r in compact_domain_stats(partials).collect()
        if r["domain"] is not None and r["domain"] != "flush.com"
    }
    batch = spark.createDataFrame(
        [Row(doc_id=r["doc_id"], text=r["text"], url=r["url"]) for r in rows]
    )
    want = {
        r["domain"]: (r["n_docs"], r["n_dup_docs"], r["total_chars"], r["n_langs"])
        for r in domain_stats(batch).collect()
    }
    assert got == want and len(want) == 6
    # the repeats really registered as dups
    assert any(d[1] > 0 for d in want.values())


def test_streaming_robots_filter_matches_batch(spark, tmp_path):
    """robots_filter is a stream x static-BROADCAST join + per-row
    prefix predicate — stream-legal in append mode with no state; the
    streamed survivors equal the batch survivors for the same rows.
    With this, the whole crawl-intake chain (canon -> robots -> bloom
    url dedup -> normalize/quality) is pinned stream-legal."""
    from pyspark.sql import Row

    from route81_spark.ops.web import robots_filter

    robots = spark.createDataFrame(
        [("d.com", "User-agent: *\nDisallow: /private\n")],
        "domain string, robots_txt string",
    )
    rows = [
        {"doc_id": i,
         "text": "body",
         "ts": "2024-01-01T00:00:00",
         "url": (f"http://a.d.com/private/{i}" if i % 2 == 0
                 else f"http://a.d.com/ok/{i}")}
        for i in range(12)
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("url", T.StringType()),
    ])
    src = tmp_path / "rsrc"
    _write_batch(src / "b1.json", rows[:6])
    _write_batch(src / "b2.json", rows[6:])
    stream = spark.readStream.schema(schema).json(str(src))
    out, ck = tmp_path / "rout", tmp_path / "rck"
    _run_available_now(robots_filter(stream, robots), out, ck)
    got = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
    batch = spark.createDataFrame(
        [Row(doc_id=r["doc_id"], url=r["url"]) for r in rows]
    )
    want = {r["doc_id"] for r in robots_filter(batch, robots).collect()}
    assert got == want == {i for i in range(12) if i % 2 == 1}


def test_streaming_url_bloom_dedup_intake(spark, tmp_path):
    """Crawl-refetch suppression at intake: a Bloom index over DAY-1
    CANONICAL URLs scrubs day-2 refetches — including tracking-param /
    case / fragment variants the canonicalizer folds — inside a
    stateless streaming projection (canon + 128 KiB-literal probe,
    zero state). The URL layer and the Bloom intake compose."""
    from pyspark.sql import Row

    from route81_spark.ops.corpus import (
        bloom_apply, bloom_build, bloom_dense_words)
    from route81_spark.ops.web import url_canonicalize

    day1 = spark.createDataFrame(
        [Row(doc_id=i, text=f"http://site{i}.com/p?a=1") for i in range(8)]
    )
    canon1 = day1.select(
        "doc_id", url_canonicalize(F.col("text")).alias("text")
    )
    words = bloom_dense_words(
        bloom_build(canon1, sep="\n", m_bits=1 << 12, k=3), m_bits=1 << 12
    )
    # day-2: even ids are refetches under messier spellings of the SAME
    # page; odd ids are genuinely new pages
    rows = [
        {"doc_id": 100 + i,
         "text": (f"HTTP://SITE{i}.com:80/p?a=1&utm_source=feed#frag"
                  if i % 2 == 0 else f"http://site{i}.com/brand-new"),
         "ts": "2024-01-01T00:00:00"}
        for i in range(8)
    ]
    src = tmp_path / "usrc"
    _write_batch(src / "b1.json", rows)
    stream = (
        spark.readStream.schema(DOC_SCHEMA).json(str(src))
        .select("doc_id", url_canonicalize(F.col("text")).alias("text"))
    )
    out, ck = tmp_path / "uout", tmp_path / "uck"
    _run_available_now(bloom_apply(stream, words, sep="\n", k=3), out, ck)
    got = {r["doc_id"]: r["n_seen"]
           for r in spark.read.parquet(str(out)).collect()}
    assert got == {100 + i: (1 if i % 2 == 0 else 0) for i in range(8)}


def test_streaming_bloom_apply_matches_batch(spark, tmp_path):
    """bloom_apply against a pre-built (static) bitmap is a stateless
    per-row projection — stream-legal in append mode with no watermark
    — and produces exactly the batch results: the incremental-crawl
    intake shape (yesterday's index filters today's firehose)."""
    from pyspark.sql import Row

    from route81_spark.ops.corpus import (
        bloom_apply, bloom_build, bloom_dense_words)

    ref = spark.createDataFrame(
        [Row(doc_id=i, text=f"seen unit {i} | common tail") for i in range(8)]
    )
    words = bloom_dense_words(
        bloom_build(ref, sep=" | ", m_bits=1 << 12, k=3), m_bits=1 << 12)
    rows = [
        {"doc_id": 100 + i,
         "text": (f"seen unit {i % 8} | fresh unit {i}" if i % 2
                  else f"fresh unit {i} | common tail"),
         "ts": "2024-01-01T00:00:00"}
        for i in range(16)
    ]
    src = tmp_path / "src"
    _write_batch(src / "b1.json", rows[:8])
    _write_batch(src / "b2.json", rows[8:])
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
    out, ck = tmp_path / "out", tmp_path / "ck"
    _run_available_now(bloom_apply(stream, words, sep=" | "), out, ck)
    got = {r["doc_id"]: (r["n_units"], r["n_seen"], r["clean_text"])
           for r in spark.read.parquet(str(out)).collect()}
    batch_df = spark.createDataFrame([Row(doc_id=r["doc_id"], text=r["text"])
                                      for r in rows])
    want = {r["doc_id"]: (r["n_units"], r["n_seen"], r["clean_text"])
            for r in bloom_apply(batch_df, words, sep=" | ").collect()}
    assert got == want
    assert all(n_seen == 1 for (_, n_seen, _) in want.values())


def test_streaming_intradoc_dedup_and_entropy_match_batch(spark, tmp_path):
    """intradoc_line_dedup and char_entropy are pure per-row
    projections — stream-legal in append mode, bit-identical to batch
    on the same rows (intake-hygiene companions to normalize_text)."""
    from pyspark.sql import Row

    from route81_spark.ops.corpus import intradoc_line_dedup
    from route81_spark.ops.text import char_entropy

    rows = [
        {"doc_id": i,
         "text": f"rep unit {i % 3} | rep unit {i % 3} | tail {i}",
         "ts": "2024-01-01T00:00:00"}
        for i in range(12)
    ]
    src = tmp_path / "src"
    _write_batch(src / "b1.json", rows[:6])
    _write_batch(src / "b2.json", rows[6:])
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
    out, ck = tmp_path / "out", tmp_path / "ck"
    deduped = intradoc_line_dedup(stream, sep=" | ").withColumn(
        "e", char_entropy(F.col("clean_text"))
    )
    _run_available_now(deduped, out, ck)
    got = {r["doc_id"]: (r["n_kept"], r["clean_text"], r["e"])
           for r in spark.read.parquet(str(out)).collect()}
    batch_df = spark.createDataFrame([Row(doc_id=r["doc_id"], text=r["text"])
                                      for r in rows])
    want = {r["doc_id"]: (r["n_kept"], r["clean_text"], r["e"])
            for r in intradoc_line_dedup(batch_df, sep=" | ").withColumn(
                "e", char_entropy(F.col("clean_text"))).collect()}
    assert got == want
    assert all(k == 2 for (k, _, _) in want.values())  # repeat dropped


def test_streaming_bloom_intake_bounded_state_across_restart(spark, tmp_path):
    """The fixed-size dedup intake: state is one 128 KiB-bounded bitmap
    regardless of volume. Units seen in earlier micro-batches are
    scrubbed from later ones, the bitmap survives a full query restart
    (new stream, same checkpoint + state dir), and replaying a batch id
    reloads the PRE-state (idempotent output partitions)."""
    import os

    from route81_spark.ops.streaming import bloom_intake

    src = tmp_path / "src"
    out, ck, st = str(tmp_path / "out"), str(tmp_path / "ck"), str(tmp_path / "st")
    _write_batch(src / "b1.json", [
        {"doc_id": 1, "text": "unit alpha | unit beta", "ts": "2024-01-01T00:00:00"}])
    _write_batch(src / "b2.json", [
        {"doc_id": 2, "text": "unit beta | unit gamma", "ts": "2024-01-01T00:01:00"}])

    def run():
        stream = (spark.readStream.schema(DOC_SCHEMA)
                  .option("maxFilesPerTrigger", 1).json(str(src)))
        q = (stream.writeStream
             .foreachBatch(bloom_intake(out, st, sep=" | ", window=None,
                                        m_bits=1 << 12))
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run()
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert got[1]["n_seen"] == 0 and got[1]["clean_text"] == "unit alpha | unit beta"
    assert got[2]["n_seen"] == 1 and got[2]["clean_text"] == "unit gamma"

    # restart: a third file arrives; alpha+gamma are in the bitmap now
    _write_batch(src / "b3.json", [
        {"doc_id": 3, "text": "unit alpha | unit gamma | unit delta",
         "ts": "2024-01-01T00:02:00"}])
    run()
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert got[3]["n_seen"] == 2 and got[3]["clean_text"] == "unit delta"
    # state stayed bounded in BYTES and FILES: each snapshot is one
    # 2^12-bit bitmap, and commit-time pruning keeps only the newest two
    sizes = {f: os.path.getsize(os.path.join(st, f)) for f in os.listdir(st)}
    assert all(sz <= (1 << 12) // 8 + 128 for sz in sizes.values()), sizes
    assert len([f for f in sizes if f.startswith("words_")]) <= 2, sizes


def test_streaming_random_projection_matches_batch(spark, tmp_path):
    """random_project is a pure per-row projection (the sign matrix is
    plan-time literals) — stream-legal in append mode, bit-identical
    to batch: an embedding firehose can be reduced 4x at intake."""
    from pyspark.sql import Row

    from route81_spark.ops.similarity import random_project

    vec_schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    rows = [
        {"vec_id": i, "embedding": [((i * 13 + j * 5) % 17 - 8) / 3.0 for j in range(64)]}
        for i in range(10)
    ]
    src = tmp_path / "src"
    _write_batch(src / "b1.json", rows[:5])
    _write_batch(src / "b2.json", rows[5:])
    stream = spark.readStream.schema(vec_schema).json(str(src))
    out, ck = tmp_path / "out", tmp_path / "ck"
    _run_available_now(random_project(stream, out_dim=8), out, ck)
    got = {(r["vec_id"], r["dim"]): r["value"]
           for r in spark.read.parquet(str(out)).collect()}
    batch = spark.createDataFrame([Row(**r) for r in rows], schema=vec_schema)
    want = {(r["vec_id"], r["dim"]): r["value"]
            for r in random_project(batch, out_dim=8).collect()}
    assert got == want and len(want) == 80


def test_streaming_text_search_matches_batch(spark, tmp_path):
    """The whole $text family (folding default, unicode tokens, stem
    mode, textScore projection) is per-row filter+projection work — no
    state, stream-legal in append mode; the streamed matches and
    scores equal the batch pipeline's for the same rows."""
    from route81_spark.pipeline import apply_pipeline

    rows = [
        {"doc_id": 1, "text": "fast queries over café tables"},
        {"doc_id": 2, "text": "one query plan for the cafe"},
        {"doc_id": 3, "text": "café press salsa"},      # decomposed
        {"doc_id": 4, "text": "nothing relevant"},
        {"doc_id": 5, "text": "query query salsa"},
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    src = tmp_path / "tsrc"
    _write_batch(src / "b1.json", rows[:3])
    _write_batch(src / "b2.json", rows[3:])
    pipe = [
        {"$match": {"$text": {
            "$search": "café queries -salsa", "unicode": True, "stem": "s",
        }}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ]
    stream = spark.readStream.schema(schema).json(str(src))
    out, ck = tmp_path / "tout", tmp_path / "tck"
    _run_available_now(apply_pipeline(stream, pipe), out, ck)
    got = {
        (r["doc_id"], r["score"])
        for r in spark.read.parquet(str(out)).collect()
    }
    batch = spark.createDataFrame([tuple(r.values()) for r in rows],
                                  "doc_id long, text string")
    want = {(r["doc_id"], r["score"])
            for r in apply_pipeline(batch, pipe).collect()}
    assert got == want and len(want) >= 2


def test_streaming_psl_table_and_pii_redact_match_batch(spark, tmp_path):
    """The two r8/r9 intake surfaces without stream pins yet:
    psl_domain_table (full-PSL registrable-domain extraction — the
    rule table is STATIC, so its per-(kind,depth) broadcast joins are
    stream-static joins, append-legal with no watermark; the one
    collect reads the rule table at plan-build, never the stream) and
    the checksum-gated pii_redact chain (pure per-row expressions).
    Streamed output must be bit-identical to the batch operators on
    the same rows."""
    from route81_spark.ops.psl import DEFAULT_PSL_RULES, psl_domain_table
    from route81_spark.ops.text import pii_redact

    hosts = [
        "a.b.example.com", "www.example.co.uk", "x.y.kobe.jp",
        "city.kobe.jp", "foo.bar.ck", "www.ck", "deep.sub.blogspot.com",
        "localhost",
    ]
    rows = [
        {"doc_id": i,
         "text": f"doc {i} mail a{i}@mail.example.com "
                 f"card 4111 1111 1111 1111 ref 4111 1111 1111 1112 "
                 f"wire GB82WEST12345698765432 call 555-123-4567 end",
         "ts": "2024-01-01T00:00:00"}
        for i in range(24)
    ]
    rules_df = spark.createDataFrame(
        [(r,) for r in DEFAULT_PSL_RULES], "rule string"
    )
    host_col = F.element_at(
        F.array(*[F.lit(h) for h in hosts]),
        (F.col("doc_id") % len(hosts) + 1).cast("int"),
    )

    def pipeline(df):
        with_host = df.select(
            "doc_id", host_col.alias("host"),
            pii_redact(F.col("text")).alias("redacted"),
        )
        return psl_domain_table(
            with_host, rules_df, host_col="host", rule_col="rule"
        ).select("doc_id", "host", "domain", "redacted")

    src = tmp_path / "src"
    _write_batch(src / "b1.json", rows[:12])
    _write_batch(src / "b2.json", rows[12:])
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
    out, ck = tmp_path / "out", tmp_path / "ck"
    _run_available_now(pipeline(stream), out, ck)
    got = {r["doc_id"]: (r["host"], r["domain"], r["redacted"])
           for r in spark.read.parquet(str(out)).collect()}

    batch = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
    )
    want = {r["doc_id"]: (r["host"], r["domain"], r["redacted"])
            for r in pipeline(batch).collect()}
    assert got == want and len(got) == 24
    # the scrub really fired (valid card/IBAN/email/phone redacted, the
    # check-digit-bumped sibling survived) and the PSL really resolved
    sample = got[0][2]
    assert "<CC>" in sample and "<IBAN>" in sample
    assert "<EMAIL>" in sample and "<PHONE>" in sample
    assert "4111 1111 1111 1112" in sample
    assert any(d is not None for _, d, _r in got.values())


def test_streaming_text_weighted_and_wildcard_match_batch(spark, tmp_path):
    """The r9 multi-field $text forms stream unchanged: the weighted
    {fields: {...}} index analog and the '$**' wildcard expansion
    (schema-driven, resolved at compile — identical on the stream's
    declared schema) are per-row work, append-legal; streamed matches
    and weighted scores equal the batch pipeline's."""
    from route81_spark.pipeline import apply_pipeline

    rows = [
        {"doc_id": 1, "title": "spark query engine", "body": "rows here"},
        {"doc_id": 2, "title": "intro", "body": "query planning inside"},
        {"doc_id": 3, "title": "misc", "body": "nothing"},
        {"doc_id": 4, "title": "query", "body": "batch query query"},
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("body", T.StringType()),
    ])
    src = tmp_path / "wsrc"
    _write_batch(src / "b1.json", rows[:2])
    _write_batch(src / "b2.json", rows[2:])
    for tag, spec in (
        ("w", {"$search": "query -batch", "fields": {"title": 5, "body": 1}}),
        ("wc", {"$search": "query", "fields": "$**"}),
    ):
        pipe = [
            {"$match": {"$text": spec}},
            {"$addFields": {"score": {"$meta": "textScore"}}},
            {"$project": {"doc_id": 1, "score": 1}},
        ]
        stream = spark.readStream.schema(schema).json(str(src))
        out, ck = tmp_path / f"wout{tag}", tmp_path / f"wck{tag}"
        _run_available_now(apply_pipeline(stream, pipe), out, ck)
        got = {(r["doc_id"], r["score"])
               for r in spark.read.parquet(str(out)).collect()}
        batch = spark.createDataFrame(
            [tuple(r.values()) for r in rows],
            "doc_id long, title string, body string",
        )
        want = {(r["doc_id"], r["score"])
                for r in apply_pipeline(batch, pipe).collect()}
        assert got == want and len(want) >= 2, (tag, got, want)


def test_streaming_text_wildcard_nested_matches_batch(spark, tmp_path):
    """The r10 nested '$**' descent streams unchanged: the expansion
    recurses the stream's DECLARED schema into struct children at
    compile time (dotted paths), so streamed matches/scores over a
    struct column equal the batch pipeline's."""
    from route81_spark.pipeline import apply_pipeline

    rows = [
        {"doc_id": 1, "body": "rows here",
         "meta": {"head": "spark query", "sub": {"note": "query deep"}}},
        {"doc_id": 2, "body": "query planning",
         "meta": {"head": "intro", "sub": {"note": "none"}}},
        {"doc_id": 3, "body": "nothing",
         "meta": {"head": "misc", "sub": {"note": "plain"}}},
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("body", T.StringType()),
        T.StructField("meta", T.StructType([
            T.StructField("head", T.StringType()),
            T.StructField("sub", T.StructType([
                T.StructField("note", T.StringType()),
            ])),
        ])),
    ])
    pipe = [
        {"$match": {"$text": {"$search": "query", "fields": "$**"}}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ]
    src = tmp_path / "wnsrc"
    _write_batch(src / "b1.json", rows[:2])
    _write_batch(src / "b2.json", rows[2:])
    stream = spark.readStream.schema(schema).json(str(src))
    out, ck = tmp_path / "wnout", tmp_path / "wnck"
    _run_available_now(apply_pipeline(stream, pipe), out, ck)
    got = {(r["doc_id"], r["score"])
           for r in spark.read.parquet(str(out)).collect()}
    batch = spark.createDataFrame(rows, schema)
    want = {(r["doc_id"], r["score"])
            for r in apply_pipeline(batch, pipe).collect()}
    assert got == want == {(1, 2), (2, 1)}


def test_streaming_text_langoverride_matches_batch(spark, tmp_path):
    """languageOverride is a per-row CASE over the lang column — no
    state, append-legal; streamed matches/scores equal batch (en docs
    stem, fr docs match only literal stemmed query terms)."""
    from route81_spark.pipeline import apply_pipeline

    rows = [
        {"doc_id": 1, "lang": "en", "text": "running relational work"},
        {"doc_id": 2, "lang": "fr", "text": "running relational work"},
        {"doc_id": 3, "lang": "fr", "text": "run the line"},
        {"doc_id": 4, "lang": "en", "text": "relations hold"},
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    pipe = [
        {"$match": {"$text": {
            "$search": "runs relation", "$language": "english",
            "languageOverride": "lang",
        }}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ]
    src = tmp_path / "losrc"
    _write_batch(src / "b1.json", rows[:2])
    _write_batch(src / "b2.json", rows[2:])
    stream = spark.readStream.schema(schema).json(str(src))
    out, ck = tmp_path / "loout", tmp_path / "lock"
    _run_available_now(apply_pipeline(stream, pipe), out, ck)
    got = {(r["doc_id"], r["score"])
           for r in spark.read.parquet(str(out)).collect()}
    batch = spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        "doc_id long, lang string, text string",
    )
    want = {(r["doc_id"], r["score"])
            for r in apply_pipeline(batch, pipe).collect()}
    assert got == want == {(1, 2), (3, 1), (4, 1)}


def test_streaming_text_french_matches_batch(spark, tmp_path):
    """$language: "french" (the Snowball French program, r10) streams
    unchanged: per-row scalar analysis (tokenize -> stem -> fold, the
    French analyzer order), no state, append-legal; streamed matches
    and scores equal the batch pipeline's, including the accented
    conflation ('générale' matching 'générales' requires stemming
    BEFORE the diacritic fold on both paths)."""
    from route81_spark.pipeline import apply_pipeline

    rows = [
        {"doc_id": 1, "text": "elle continuait librement"},
        {"doc_id": 2, "text": "générales activités"},
        {"doc_id": 3, "text": "continuait des nationaux"},
        {"doc_id": 4, "text": "rien de notable ici"},
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    pipe = [
        {"$match": {"$text": {
            "$search": "continuer générale -nationaux",
            "$language": "french",
        }}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ]
    src = tmp_path / "frsrc"
    _write_batch(src / "b1.json", rows[:2])
    _write_batch(src / "b2.json", rows[2:])
    stream = spark.readStream.schema(schema).json(str(src))
    out, ck = tmp_path / "frout", tmp_path / "frck"
    _run_available_now(apply_pipeline(stream, pipe), out, ck)
    got = {(r["doc_id"], r["score"])
           for r in spark.read.parquet(str(out)).collect()}
    batch = spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        "doc_id long, text string",
    )
    want = {(r["doc_id"], r["score"])
            for r in apply_pipeline(batch, pipe).collect()}
    assert got == want == {(1, 1), (2, 1)}


def test_streaming_text_german_matches_batch(spark, tmp_path):
    """$language: "german" (the Snowball German program, r12) streams
    unchanged: per-row scalar analysis (tokenize -> stop unfolded ->
    stem -> fold, the German analyzer order), no state, append-legal;
    streamed matches and scores equal the batch pipeline's, including
    the umlaut conflation ('bücher' matching 'buch' requires stemming
    BEFORE the diacritic fold on both paths) and the stop-then-stem
    composition."""
    from route81_spark.pipeline import apply_pipeline

    rows = [
        {"doc_id": 1, "text": "die kindern spielen"},
        {"doc_id": 2, "text": "das buch gefällt"},
        {"doc_id": 3, "text": "über die der und"},
        {"doc_id": 4, "text": "nichts relevantes hier"},
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    pipe = [
        {"$match": {"$text": {
            "$search": "kinder bücher",
            "$language": "german",
            "unicode": True, "stopWords": True,
        }}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ]
    src = tmp_path / "desrc"
    _write_batch(src / "b1.json", rows[:2])
    _write_batch(src / "b2.json", rows[2:])
    stream = spark.readStream.schema(schema).json(str(src))
    out, ck = tmp_path / "deout", tmp_path / "deck"
    _run_available_now(apply_pipeline(stream, pipe), out, ck)
    got = {(r["doc_id"], r["score"])
           for r in spark.read.parquet(str(out)).collect()}
    batch = spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        "doc_id long, text string",
    )
    want = {(r["doc_id"], r["score"])
            for r in apply_pipeline(batch, pipe).collect()}
    assert got == want == {(1, 1), (2, 1)}


def test_streaming_text_swedish_matches_batch(spark, tmp_path):
    """$language: "swedish" (the Snowball Swedish program, r12)
    streams unchanged: per-row scalar analysis (tokenize -> stop
    unfolded -> stem -> fold, the same chain shape as French/German),
    no state, append-legal; streamed matches and scores equal the
    batch pipeline's, including the setlimit conflation ('nyheter'
    matching 'nyheterna') and the stop-then-stem composition ('är'
    stopping on its accented surface)."""
    from route81_spark.pipeline import apply_pipeline

    rows = [
        {"doc_id": 1, "text": "nyheterna är stora"},
        {"doc_id": 2, "text": "flickorna läser nyheter"},
        {"doc_id": 3, "text": "och det att över"},
        {"doc_id": 4, "text": "inget relevant alls"},
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    pipe = [
        {"$match": {"$text": {
            "$search": "nyheter är",
            "$language": "swedish",
            "unicode": True, "stopWords": True,
        }}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ]
    src = tmp_path / "svsrc"
    _write_batch(src / "b1.json", rows[:2])
    _write_batch(src / "b2.json", rows[2:])
    stream = spark.readStream.schema(schema).json(str(src))
    out, ck = tmp_path / "svout", tmp_path / "svck"
    _run_available_now(apply_pipeline(stream, pipe), out, ck)
    got = {(r["doc_id"], r["score"])
           for r in spark.read.parquet(str(out)).collect()}
    batch = spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        "doc_id long, text string",
    )
    want = {(r["doc_id"], r["score"])
            for r in apply_pipeline(batch, pipe).collect()}
    assert got == want == {(1, 1), (2, 1)}


def test_streaming_text_norwegian_matches_batch(spark, tmp_path):
    """$language: "norwegian" (the Snowball Norwegian program, r13)
    streams unchanged: per-row scalar analysis (tokenize -> stop
    unfolded -> stem -> fold, the shared carried-language chain
    shape), no state, append-legal; streamed matches and scores equal
    the batch pipeline's, including the setlimit conflation
    ('nyheter' matching 'nyhetene') and the stop-then-stem
    composition ('når' stopping on its accented surface)."""
    from route81_spark.pipeline import apply_pipeline

    rows = [
        {"doc_id": 1, "text": "nyhetene er over alt"},
        {"doc_id": 2, "text": "jentene leser nyheter"},
        {"doc_id": 3, "text": "og det at når"},
        {"doc_id": 4, "text": "ingenting relevant her"},
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    pipe = [
        {"$match": {"$text": {
            "$search": "nyheter når",
            "$language": "norwegian",
            "unicode": True, "stopWords": True,
        }}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ]
    src = tmp_path / "nosrc"
    _write_batch(src / "b1.json", rows[:2])
    _write_batch(src / "b2.json", rows[2:])
    stream = spark.readStream.schema(schema).json(str(src))
    out, ck = tmp_path / "noout", tmp_path / "nock"
    _run_available_now(apply_pipeline(stream, pipe), out, ck)
    got = {(r["doc_id"], r["score"])
           for r in spark.read.parquet(str(out)).collect()}
    batch = spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        "doc_id long, text string",
    )
    want = {(r["doc_id"], r["score"])
            for r in apply_pipeline(batch, pipe).collect()}
    assert got == want == {(1, 1), (2, 1)}


def test_streaming_text_stopwords_matches_batch(spark, tmp_path):
    """stopWords (r10) is per-row token filtering ahead of the
    (optional) stemmer — no state, append-legal; streamed matches and
    scores equal the batch pipeline's, including the all-stop-words
    document never matching."""
    from route81_spark.pipeline import apply_pipeline

    rows = [
        {"doc_id": 1, "text": "the data is in the lake"},
        {"doc_id": 2, "text": "data processing runs daily"},
        {"doc_id": 3, "text": "the the same very should now"},
        {"doc_id": 4, "text": "is it about data"},
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    pipe = [
        {"$match": {"$text": {
            "$search": "the data is processing", "stopWords": True,
        }}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ]
    src = tmp_path / "swsrc"
    _write_batch(src / "b1.json", rows[:2])
    _write_batch(src / "b2.json", rows[2:])
    stream = spark.readStream.schema(schema).json(str(src))
    out, ck = tmp_path / "swout", tmp_path / "swck"
    _run_available_now(apply_pipeline(stream, pipe), out, ck)
    got = {(r["doc_id"], r["score"])
           for r in spark.read.parquet(str(out)).collect()}
    batch = spark.createDataFrame(
        [tuple(r.values()) for r in rows], "doc_id long, text string"
    )
    want = {(r["doc_id"], r["score"])
            for r in apply_pipeline(batch, pipe).collect()}
    assert got == want == {(1, 1), (2, 2), (4, 1)}


def test_streaming_text_french_stopwords_matches_batch(spark, tmp_path):
    """French stop removal (r11) composed with the French stemmer is
    still per-row token filtering — no state, append-legal; streamed
    matches and scores equal the batch pipeline's, including the
    all-French-stop-words document never matching."""
    from route81_spark.pipeline import apply_pipeline

    rows = [
        {"doc_id": 1, "text": "les continuations ont été majestueuses"},
        {"doc_id": 2, "text": "elle continuait librement"},
        {"doc_id": 3, "text": "été les de la même"},
        {"doc_id": 4, "text": "rien de notable ici"},
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    pipe = [
        {"$match": {"$text": {
            "$search": "les continuer été", "$language": "french",
            "stopWords": True,
        }}},
        {"$addFields": {"score": {"$meta": "textScore"}}},
        {"$project": {"doc_id": 1, "score": 1}},
    ]
    src = tmp_path / "fswsrc"
    _write_batch(src / "b1.json", rows[:2])
    _write_batch(src / "b2.json", rows[2:])
    stream = spark.readStream.schema(schema).json(str(src))
    out, ck = tmp_path / "fswout", tmp_path / "fswck"
    _run_available_now(apply_pipeline(stream, pipe), out, ck)
    got = {(r["doc_id"], r["score"])
           for r in spark.read.parquet(str(out)).collect()}
    batch = spark.createDataFrame(
        [tuple(r.values()) for r in rows], "doc_id long, text string"
    )
    want = {(r["doc_id"], r["score"])
            for r in apply_pipeline(batch, pipe).collect()}
    assert got == want == {(1, 1), (2, 1)}
