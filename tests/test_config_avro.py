"""Config validation tests (SURVEY §5-6) + avro codec round-trips
(SURVEY §5-4)."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st

from route81_spark.codecs.avro import avro_decode, avro_encode
from route81_spark.config import ConfigError, load_config


def test_config_defaults_and_parsing():
    cfg = load_config(
        """
direct-read-namespaces = ["test.lineitem"]
topic-name-prefix = "pfx"
stats-duration = "10s"

[[producer-map]]
mongo-namespace = "test.lineitem"
kafka-topic = "li"

[[pipeline]]
namespace = "test.lineitem"
direct = true
stages = '[{"$match": {"l_returnflag": "R"}}]'

[[consumer]]
topics = ["li"]
namespace = "test.copy"
bulk-flush-duration = "500ms"
"""
    )
    assert cfg.direct_read_split_max == 9 and cfg.direct_read_concur == 4
    assert cfg.producer_maps[0].kafka_topic == "li"
    assert cfg.pipeline_for("test.lineitem", stream=False) == [
        {"$match": {"l_returnflag": "R"}}
    ]
    assert cfg.pipeline_for("test.lineitem", stream=True) is None
    c = cfg.consumers[0]
    assert c.bulk_size == 100 and c.bulk_flush_seconds == 0.5 and c.workers == 4
    assert cfg.consumer_target_namespaces() == ["test.copy"]


def test_config_rejections():
    with pytest.raises(ConfigError, match="unknown config keys"):
        load_config("no-such-key = 1")  # route81.go:477-479
    with pytest.raises(ConfigError, match="kafka-topic"):
        load_config('[[producer-map]]\nmongo-namespace = "a.b"')
    with pytest.raises(ConfigError, match="db.collection"):
        load_config('[[consumer]]\ntopics=["t"]\nnamespace = "nodot"')
    with pytest.raises(ConfigError, match="stages JSON"):
        load_config("[[pipeline]]\nstages = 'not json'")
    with pytest.raises(ConfigError, match="message-format"):
        load_config('[[consumer]]\ntopics=["t"]\nnamespace="a.b"\nmessage-format="xml"')
    with pytest.raises(ConfigError, match="avro-schema-spec"):
        load_config('[[consumer]]\ntopics=["t"]\nnamespace="a.b"\nmessage-format="avro"')
    with pytest.raises(ConfigError, match="duplicate pipeline"):
        load_config("[[pipeline]]\nstages='[]'\n\n[[pipeline]]\nstages='[]'")


AVRO_SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "_id", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "x", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "maybe", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "kv", "type": {"type": "map", "values": "long"}},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "inner",
                "fields": [{"name": "y", "type": "int"}],
            },
        },
    ],
}


def test_avro_round_trip_golden():
    doc = {
        "_id": "abc", "n": -(2**40), "x": 1.5, "flag": True, "maybe": None,
        "tags": ["a", "b"], "kv": {"k1": 1, "k2": -2}, "nested": {"y": 7},
    }
    assert avro_decode(AVRO_SCHEMA, avro_encode(AVRO_SCHEMA, doc)) == doc


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=-(2**63), max_value=2**63 - 1),
    x=st.floats(allow_nan=False),
    s=st.text(max_size=40),
    flag=st.booleans(),
    maybe=st.none() | st.text(max_size=10),
    tags=st.lists(st.text(max_size=8), max_size=6),
)
def test_avro_round_trip_property(n, x, s, flag, maybe, tags):
    doc = {"_id": s, "n": n, "x": x, "flag": flag, "maybe": maybe,
           "tags": tags, "kv": {}, "nested": {"y": 0}}
    out = avro_decode(AVRO_SCHEMA, avro_encode(AVRO_SCHEMA, doc))
    assert out == doc


def test_avro_textual_round_trip():
    from route81_spark.codecs.avro import avro_decode_textual, avro_encode_textual

    doc = {
        "_id": "abc", "n": 5, "x": 1.5, "flag": True, "maybe": "yes",
        "tags": ["a"], "kv": {"k": 1}, "nested": {"y": 7},
    }
    payload = avro_encode_textual(AVRO_SCHEMA, doc)
    # union branches wrap as {"<type>": value} (goavro textual form)
    import json as _json

    assert _json.loads(payload)["maybe"] == {"string": "yes"}
    assert avro_decode_textual(AVRO_SCHEMA, payload) == doc
    doc["maybe"] = None
    assert avro_decode_textual(AVRO_SCHEMA, avro_encode_textual(AVRO_SCHEMA, doc)) == doc


def test_avro_spark_decode(spark):
    import json as _json

    from pyspark.sql import Row

    from route81_spark.codecs.avro import decode_avro_records

    docs = [
        {"_id": str(i), "n": i, "x": i / 2, "flag": i % 2 == 0, "maybe": None,
         "tags": [f"t{i}"], "kv": {"a": i}, "nested": {"y": i}}
        for i in range(10)
    ]
    records = spark.createDataFrame(
        [Row(value=avro_encode(AVRO_SCHEMA, d), seq=i) for i, d in enumerate(docs)],
        "value binary, seq long",
    )
    out = decode_avro_records(records, _json.dumps(AVRO_SCHEMA)).collect()
    got = {r["_id"]: r for r in out}
    assert len(got) == 10
    assert got["3"]["n"] == 3 and got["3"]["nested"]["y"] == 3 and got["3"]["seq"] == 3


def test_kafka_settings_passthrough_mapping():
    import pytest
    from route81_spark.config import ConfigError, kafka_sink_options, load_config

    cfg = load_config(
        'kafka = "b:9092"\n'
        "[kafka-settings]\n"
        "enable-idempotence = true\n"
        "message-max-retries = 3\n"
        'sasl-mechanisms = "PLAIN"\n'
        'sasl-username = "u"\n'
        'sasl-password = "p"\n'
        'broker-version-fallback = "0.10"\n'  # librdkafka-only: accepted, dropped
    )
    opts = kafka_sink_options(cfg)
    assert opts["kafka.enable.idempotence"] == "true"
    assert opts["kafka.retries"] == "3"
    assert "PlainLoginModule" in opts["kafka.sasl.jaas.config"]
    assert not any("broker-version" in k for k in opts)
    # unknown settings keys are a hard error, like route81's config validation
    bad = load_config('kafka = "b:9092"\n[kafka-settings]\nnot-a-key = 1\n')
    with pytest.raises(ConfigError):
        kafka_sink_options(bad)


def test_avro_binary_config_toggle():
    # route81.go:108: avro-binary is a plain bool whose Go zero value is
    # false -> textual decode is the default (decoding/decoding.go:45-57)
    tmpl = (
        '[[consumer]]\ntopics=["t"]\nnamespace="a.b"\n'
        'message-format="avro"\n'
        'avro-schema-spec=\'{"type":"record","name":"d","fields":[]}\'\n'
    )
    assert load_config(tmpl).consumers[0].avro_binary is False
    assert load_config(tmpl + "avro-binary=true\n").consumers[0].avro_binary is True
    assert load_config(tmpl + "avro-binary=false\n").consumers[0].avro_binary is False


def test_avro_textual_consumer_loopback(spark, tmp_path):
    """End-to-end textual-avro consume (route81.go:718-722 default path):
    encode TextualFromNative-style, run a full consumer batch, target
    table tracks the documents."""
    import json as _json

    from pyspark.sql import Row
    from pyspark.sql import types as T

    from route81_spark.codecs.avro import avro_encode_textual
    from route81_spark.config import ConsumerSpec
    from route81_spark.jobs.consumer import apply_consumer_batch
    from route81_spark.sinks.merge import KeyedParquetTable

    schema = {
        "type": "record",
        "name": "doc",
        "fields": [
            {"name": "_id", "type": "string"},
            {"name": "n", "type": "long"},
        ],
    }
    doc_schema = T.StructType(
        [T.StructField("_id", T.StringType()), T.StructField("n", T.LongType())]
    )
    table = KeyedParquetTable(spark, str(tmp_path / "t"))
    table.init(spark.createDataFrame([], doc_schema))
    docs = [{"_id": str(i), "n": i} for i in range(5)]
    batch = spark.createDataFrame(
        [Row(value=avro_encode_textual(schema, d), seq=i) for i, d in enumerate(docs)],
        "value binary, seq long",
    )
    spec = ConsumerSpec(
        kafka_topics=["t"],
        mongo_namespace="a.b",
        message_format="avro",
        avro_schema_spec=_json.dumps(schema),
    )
    assert spec.avro_binary is False  # default matches the reference
    res = apply_consumer_batch(table, batch, spec, doc_schema)
    assert res == {"success": 5, "failed": 0}
    got = {r["_id"]: r["n"] for r in table.read().collect()}
    assert got == {str(i): i for i in range(5)}


def test_config_reference_toml_surface():
    """A verbatim reference-style TOML (README.md:323-329 consumer form,
    route81.go:120-147 toggles) must parse: the consumer table is
    [[consumer]] with `namespace`/`topics` keys."""
    cfg = load_config(
        """
mongo = "mongodb://localhost:27017"
kafka = "localhost:9092"
resume = true
disable-stats-log = true
http-server = true
http-server-addr = ":8081"
disable-change-stream = true

[[consumer]]
namespace = "test.test2"
topics = ["test.test"]
message-format = "json-ext"
document-root-path = "data"
delete-id-path = "meta._id"
"""
    )
    assert cfg.resume and cfg.disable_stats_log and cfg.http_server
    assert cfg.http_server_addr == ":8081" and cfg.disable_change_stream
    c = cfg.consumers[0]
    assert c.mongo_namespace == "test.test2" and c.kafka_topics == ["test.test"]
    # strict unknown-key errors inside each block, like the top level
    with pytest.raises(ConfigError, match="unknown consumer keys"):
        load_config('[[consumer]]\nnamespace="a.b"\nkafka-topics=["t"]')
    with pytest.raises(ConfigError, match="unknown producer-map keys"):
        load_config('[[producer-map]]\nkafka-topic="t"\nnamespace="a.b"')
    with pytest.raises(ConfigError, match="unknown pipeline keys"):
        load_config("[[pipeline]]\nstages='[]'\nbogus=1")


def test_toml_pipeline_with_extension_stages(spark):
    """A route81-style TOML [[pipeline]] can carry the $-extension
    stages: config parses them like Mongo stages and apply_pipeline
    executes them — the declarative curation story end to end."""
    from route81_spark.config import load_config
    from route81_spark.pipeline import apply_pipeline

    cfg = load_config(
        """
[[pipeline]]
namespace = "corpus.docs"
direct = true
stages = '''
[{"$dedupExact": {}},
 {"$textAnalyze": {}},
 {"$match": {"pred_lang": "en"}}]
'''
"""
    )
    stages = cfg.pipeline_for("corpus.docs", stream=False)
    assert stages and "$dedupExact" in stages[0]
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "der hund und die katze ist das haus"),
        ],
        "doc_id long, text string",
    )
    out = apply_pipeline(docs, stages).collect()
    assert [r["doc_id"] for r in out] == [1]  # dup collapsed, German gated
