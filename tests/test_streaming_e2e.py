"""End-to-end Structured Streaming loopback (SURVEY §5-2, M3+M4):
change-event JSON file stream -> producer job (pipeline + envelope +
kafka-shaped parquet sink + checkpoint + observe stats) -> consumer job
(decode ext-JSON -> classify -> foreachBatch keyed merge) -> final
table state matches the batch-derived expectation."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from route81_spark.config import load_config
from route81_spark.jobs.consumer import consumer_job
from route81_spark.jobs.producer import namespace_filter, streaming_producer_job
from route81_spark.model.schemas import change_event_schema
from route81_spark.sinks.merge import KeyedParquetTable
from route81_spark.stats import StatsListener, serve_stats

DOC_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType()),
        T.StructField("i", T.IntegerType()),
        T.StructField("tag", T.StringType()),
    ]
)

TOML = """
change-stream-namespaces = ["test.test"]
topic-name-prefix = ""

[[pipeline]]
namespace = "test.test"
stages = '[{"$match": {"operationType": {"$in": ["insert", "update", "delete"]}}}]'

[[consumer]]
topics = ["test.test"]
namespace = "test.test2"
document-root-path = "data"
delete-id-path = "meta._id"
bulk-flush-duration = "1s"
"""


def _event(op, _id, i=None, t=0):
    doc = {"_id": _id, "i": i, "tag": f"t{i}"} if i is not None else None
    return {
        "operationType": op,
        "clusterTime": {"t": t, "i": int(_id)},
        "ns": {"db": "test", "coll": "test"},
        "documentKey": {"_id": _id},
        "fullDocument": doc,
        "updateDescription": None,
    }


def _await(predicate, timeout=60, every=0.5):
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            if predicate():
                return True
        except Exception:
            pass  # e.g. sink dir exists but holds no parquet yet
        time.sleep(every)
    return False


def test_streaming_loopback(spark, tmp_path):
    cfg = load_config(TOML)
    events_dir = tmp_path / "events_in"
    topic_dir = tmp_path / "topic"
    events_dir.mkdir()

    # phase files: 20 inserts, 10 updates, 5 deletes
    with open(events_dir / "p1.json", "w") as f:
        for i in range(20):
            f.write(json.dumps(_event("insert", str(i), i, t=1)) + "\n")
    with open(events_dir / "p2.json", "w") as f:
        for i in range(0, 20, 2):
            f.write(json.dumps(_event("update", str(i), i * 10, t=2)) + "\n")
        for i in range(0, 20, 4):
            f.write(json.dumps(_event("delete", str(i), None, t=3)) + "\n")

    listener = StatsListener()
    spark.streams.addListener(listener)
    stream = (
        spark.readStream.schema(change_event_schema(DOC_SCHEMA))
        .json(str(events_dir))
        .withColumn("ns_full", F.concat_ws(".", "ns.db", "ns.coll"))
    )
    stream = namespace_filter(stream, cfg).drop("ns_full")

    pq = streaming_producer_job(
        spark, cfg, stream, "test.test",
        sink_dir=str(topic_dir), checkpoint_dir=str(tmp_path / "ckpt_p"),
        trigger_seconds=0.5,
    )
    try:
        assert _await(
            lambda: topic_dir.exists()
            and spark.read.parquet(str(topic_dir)).count() >= 35
        ), "producer did not emit all records"
    finally:
        pq.stop()

    # producer restart with the same checkpoint: a new event file is
    # picked up, already-seen files are not re-emitted (resume ≡ P17)
    with open(events_dir / "p3.json", "w") as f:
        f.write(json.dumps(_event("insert", "99", 99, t=4)) + "\n")
    pq2 = streaming_producer_job(
        spark, cfg, stream, "test.test",
        sink_dir=str(topic_dir), checkpoint_dir=str(tmp_path / "ckpt_p"),
        trigger_seconds=0.5,
    )
    try:
        assert _await(
            lambda: spark.read.parquet(str(topic_dir)).count() == 36
        ), f"expected exactly 36 records after resume, got {spark.read.parquet(str(topic_dir)).count()}"
    finally:
        pq2.stop()

    records = spark.read.parquet(str(topic_dir))
    assert set(records.columns) == {"key", "value", "headers", "topic"}
    assert records.select("topic").distinct().collect()[0][0] == "test.test"
    sample = json.loads(
        records.filter(F.col("key").cast("string") == '"3"').collect()[0]["value"].decode()
    )
    assert sample["meta"]["op"] == "i" and sample["data"]["i"] == {"$numberInt": "3"}

    # consumer: stream the topic dir into the keyed table, ordered by
    # the envelope timestamp as seq
    table = KeyedParquetTable(spark, str(tmp_path / "t2"))
    table.init(spark.createDataFrame([], DOC_SCHEMA))
    spec = cfg.consumers[0]

    # seq from the envelope's oplog timestamp — on the wire ts is the
    # tagged {"$timestamp":{t,i}} form
    seq_schema = T.StructType(
        [
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField(
                            "ts",
                            T.StructType(
                                [
                                    T.StructField(
                                        "$timestamp",
                                        T.StructType(
                                            [
                                                T.StructField("t", T.LongType()),
                                                T.StructField("i", T.LongType()),
                                            ]
                                        ),
                                    )
                                ]
                            ),
                        )
                    ]
                ),
            )
        ]
    )
    ts = F.from_json(F.col("value").cast("string"), seq_schema)["meta"]["ts"]["$timestamp"]
    rec_stream = (
        spark.readStream.schema(records.schema).parquet(str(topic_dir))
        .withColumn("seq", ts.getField("t") * F.lit(10_000_000_000) + ts.getField("i"))
    )
    consumer_stats: dict = {}
    cq = consumer_job(
        spark, spec, rec_stream, table, DOC_SCHEMA, str(tmp_path / "ckpt_c"),
        stats=consumer_stats,
    )
    try:
        # expected: 20 inserts + the resumed "99", evens updated to
        # i*10, multiples of 4 deleted
        assert _await(lambda: table.exists() and table.read().count() == 16), (
            f"consumer state wrong: {table.read().count() if table.exists() else 'missing'}"
        )
    finally:
        cq.stop()

    got = {r["_id"]: r for r in table.read().collect()}
    assert set(got) == {str(i) for i in range(20) if i % 4 != 0} | {"99"}
    assert got["2"]["i"] == 20 and got["2"]["tag"] == "t20"   # updated (replace)
    assert got["3"]["i"] == 3 and got["3"]["tag"] == "t3"     # untouched insert

    # consumer-side counters (route81.go:497-505)
    assert consumer_stats["success"] == 36 and consumer_stats["failed"] == 0

    # stats listener accumulated producer observe() metrics
    snap = listener.snapshot()
    assert snap["inserted"] == 21 and snap["updated"] == 10 and snap["removed"] == 5

    # HTTP endpoints (route81.go:937-980)
    import urllib.request

    srv = serve_stats(listener)
    try:
        port = srv.server_port
        ok = urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz").read()
        assert ok == b"ok"
        stats = json.loads(
            urllib.request.urlopen(f"http://127.0.0.1:{port}/stats").read()
        )
        assert stats["inserted"] == 21
    finally:
        srv.shutdown()
    spark.streams.removeListener(listener)


def test_multi_namespace_single_query(spark, tmp_path):
    """Two namespaces through one streaming query/checkpoint
    (route81.go:1224-1234: one producer loop, one resume point)."""
    from route81_spark.jobs.producer import streaming_producer_multi

    cfg = load_config('topic-name-prefix = "p"\n')
    dirs = {}
    for ns in ("test.a", "test.b"):
        d = tmp_path / ns
        d.mkdir()
        with open(d / "e.json", "w") as f:
            for i in range(5):
                f.write(json.dumps(_event("insert", str(i), i, t=1)) + "\n")
        dirs[ns] = spark.readStream.schema(change_event_schema(DOC_SCHEMA)).json(str(d))
    q = streaming_producer_multi(
        spark, cfg, dirs, str(tmp_path / "out"), str(tmp_path / "ck"), 0.5
    )
    try:
        assert _await(
            lambda: spark.read.parquet(str(tmp_path / "out")).count() == 10
        )
    finally:
        q.stop()
    topics = {
        r["topic"] for r in spark.read.parquet(str(tmp_path / "out")).select("topic").collect()
    }
    assert topics == {"p.test.a", "p.test.b"}


def test_command_envelope_contract(spark):
    """Commands: key = namespace (db for dropDatabase), op='c', no data,
    no _id header; dropDatabase routes by db name (route81.go:1330-1398)."""
    from route81_spark.config import Config
    from route81_spark.jobs.producer import envelope_change_stream

    cfg = Config()  # no pipeline: a $match on operationType would
    # (faithfully) filter commands before the envelope, like the server
    evs = spark.createDataFrame(
        [
            json.dumps(_event("insert", "1", 1, t=1)),
            json.dumps({**_event("drop", "0", None, t=2), "fullDocument": None}),
            json.dumps({**_event("dropDatabase", "0", None, t=3), "fullDocument": None}),
        ],
        "string",
    ).select(F.from_json("value", change_event_schema(DOC_SCHEMA)).alias("e")).select("e.*")
    recs = envelope_change_stream(evs, "test.test", cfg).collect()
    by_key = {bytes(r["key"]).decode(): r for r in recs}
    # command keys are JSON-encoded like doc keys (route81.go:1362-1371)
    assert set(by_key) == {'"1"', '"test.test"', '"test"'}
    cmd = by_key['"test.test"']
    v = json.loads(bytes(cmd["value"]).decode())
    assert v["meta"]["op"] == "c" and "data" not in v and "_id" not in v["meta"]
    hdr_keys = [h["key"] for h in cmd["headers"]]
    assert "_id" not in hdr_keys and "ns" in hdr_keys
    dropdb = by_key['"test"']
    assert dropdb["topic"] == "test"  # routed by db name


def test_namespace_filter_blocks_consumer_targets(spark):
    cfg = load_config(TOML)
    df = spark.createDataFrame(
        [("test.test",), ("test.test2",), ("route81.resume",)], "ns_full string"
    )
    out = namespace_filter(df, cfg)
    assert [r["ns_full"] for r in out.collect()] == ["test.test"]


def test_pprof_endpoints_config_gated():
    """/debug/pprof/* family (route81.go:967-973): served only when the
    pprof toggle is on (route81.go:141), 404 otherwise."""
    import urllib.error
    import urllib.request

    from route81_spark.config import load_config
    from route81_spark.stats import StatsListener, serve_stats

    assert load_config("pprof = true").pprof is True
    assert load_config("").pprof is False

    listener = StatsListener(log=False)
    srv = serve_stats(listener, pprof=True)
    try:
        base = f"http://127.0.0.1:{srv.server_port}/debug/pprof"
        assert b"profiles" in urllib.request.urlopen(f"{base}/").read()
        assert urllib.request.urlopen(f"{base}/cmdline").read()
        stacks = urllib.request.urlopen(f"{base}/goroutine").read().decode()
        assert "thread" in stacks
        prof = urllib.request.urlopen(f"{base}/profile?seconds=0.2").read().decode()
        assert prof.startswith("samples:")
        # malformed / out-of-range seconds -> 400, not a handler crash
        for bad in ("abc", "-1", "9999"):
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(f"{base}/profile?seconds={bad}")
            assert ei.value.code == 400
    finally:
        srv.shutdown()

    srv_off = serve_stats(listener, pprof=False)
    try:
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv_off.server_port}/debug/pprof/"
            )
    finally:
        srv_off.shutdown()


def test_resume_toggle_checkpoint_paths():
    """resume=true -> stable checkpoint path keyed by resume-name
    (restart resumes, route81.go:199-224); resume=false (reference
    default) -> per-process path, restart starts fresh."""
    from route81_spark.config import load_config
    from route81_spark.main import ckpt_dir

    on = load_config('resume = true\nresume-name = "alpha"')
    assert ckpt_dir(on, "/c", "ns") == "/c/resume/alpha/ns"
    assert ckpt_dir(on, "/c", "ns") == ckpt_dir(on, "/c", "ns")  # stable
    off = load_config("")
    p = ckpt_dir(off, "/c", "ns")
    assert p != ckpt_dir(on, "/c", "ns") and "fresh_" in p


def test_main_cli_end_to_end(spark, tmp_path, sf_dir):
    """The daemon entry point end-to-end, in-process: batch direct-read
    producer (pipeline + producer-map + prefix) into parquet topic dirs,
    then a consumer daemon run that decodes ext-JSON, re-roots at
    `data`, and merges into the seeded keyed table — the README loopback
    scenario (README.md:339-345) through the real CLI surface."""
    from pyspark.sql import functions as F

    from route81_spark.main import main
    from route81_spark.sinks.merge import KeyedParquetTable

    prod_cfg = tmp_path / "producer.toml"
    prod_cfg.write_text(
        """
direct-read-namespaces = ["test.nation"]
exit-after-direct-reads = true
topic-name-prefix = "demo"

[[pipeline]]
namespace = "test.nation"
direct = true
stages = '[{"$match": {"n_regionkey": {"$lte": 1}}}]'
"""
    )
    rc = main(
        [
            "--config", str(prod_cfg),
            "--tables", f"test.nation={sf_dir}/nation.parquet",
            "--ids", "test.nation=n_nationkey",
            "--sink-dir", str(tmp_path / "topics"),
        ]
    )
    assert rc == 0
    produced = spark.read.parquet(str(tmp_path / "topics"))
    n_expected = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .filter(F.col("n_regionkey") <= 1)
        .count()
    )
    assert produced.count() == n_expected
    assert produced.select("topic").distinct().collect()[0][0] == "demo.test.nation"

    # seed the consumer target with the doc schema, then run the daemon
    src = spark.read.parquet(f"{sf_dir}/nation.parquet")
    doc = src.withColumn("_id", F.col("n_nationkey").cast("string")).limit(0)
    table = KeyedParquetTable(spark, str(tmp_path / "tables" / "test.nation2"))
    table.init(doc)

    cons_cfg = tmp_path / "consumer.toml"
    cons_cfg.write_text(
        """
[[consumer]]
namespace = "test.nation2"
topics = ["demo.test.nation"]
message-format = "json-ext"
document-root-path = "data"
bulk-flush-duration = "1s"
"""
    )
    rc = main(
        [
            "--config", str(cons_cfg),
            "--sink-dir", str(tmp_path / "topics"),
            "--tables-out", str(tmp_path / "tables"),
            "--duration", "20",
        ]
    )
    assert rc == 0
    merged = table.read()
    assert merged.count() == n_expected
    assert set(merged.columns) == {"n_nationkey", "n_name", "n_regionkey", "_id"}


def test_effective_bootstrap_flag_or_toml():
    # the TOML `kafka` key must select the real sink even without the
    # CLI flag (route81's flag/TOML merge, route81.go:342-404)
    from argparse import Namespace

    from route81_spark.main import effective_bootstrap

    toml_cfg = load_config('kafka = "broker:9092"')
    plain = load_config("")
    none_args = Namespace(kafka_bootstrap=None)
    flag_args = Namespace(kafka_bootstrap="flag:9092")
    assert effective_bootstrap(toml_cfg, none_args) == "broker:9092"
    assert effective_bootstrap(plain, none_args) == ""
    assert effective_bootstrap(toml_cfg, flag_args) == "flag:9092"  # flag wins


def test_envelope_change_stream_live_applies_suffix_only(spark, monkeypatch):
    """Live change stream: the $match-compatible prefix runs SERVER-side
    (shipped by mongo_stream_options) — envelope_change_stream must
    compile only the suffix; with the harness source it compiles all."""
    from route81_spark.config import load_config
    from route81_spark.jobs import producer

    toml = (
        '[[pipeline]]\nnamespace = "test.test"\ndirect = false\n'
        'stages = \'[{"$match": {"operationType": "insert"}}, '
        '{"$group": {"_id": "$x", "n": {"$sum": 1}}}]\'\n'
    )
    applied = []
    monkeypatch.setattr(
        producer, "apply_pipeline", lambda df, st: applied.append(st) or df
    )
    evs = (
        spark.createDataFrame([json.dumps(_event("insert", "1", 1, t=1))], "string")
        .select(F.from_json("value", change_event_schema(DOC_SCHEMA)).alias("e"))
        .select("e.*")
    )
    live = load_config('mongo = "mongodb://db:27017"\n' + toml)
    producer.envelope_change_stream(evs, "test.test", live)
    assert applied == [[{"$group": {"_id": "$x", "n": {"$sum": 1}}}]]

    applied.clear()
    producer.envelope_change_stream(evs, "test.test", load_config(toml))
    assert applied == [
        [
            {"$match": {"operationType": "insert"}},
            {"$group": {"_id": "$x", "n": {"$sum": 1}}},
        ]
    ]
