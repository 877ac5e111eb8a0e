"""Production MongoDB seam: spec construction + retry contract
(route81.go:1449-1460, 1563-1583, 1088-1116). No live Mongo in this
container, so these pin the constructed format/options; the live path
is an explicit skip."""

from __future__ import annotations

import pytest

from route81_spark.config import load_config
from route81_spark.sources.mongo import (
    delete_writer,
    mongo_read_options,
    mongo_reader,
    mongo_stream_options,
    mongo_stream_reader,
    mongo_write_options,
    mongo_writer,
    with_mongo_retry,
)

CFG = 'mongo = "mongodb://db:27017/?replicaSet=rs0"\nfail-fast = false\n'


def test_mongo_config_key_parses():
    cfg = load_config(CFG)
    assert cfg.mongo_uri == "mongodb://db:27017/?replicaSet=rs0"
    assert load_config("").mongo_uri == ""  # sandbox default: stand-ins


def test_mongo_read_options():
    cfg = load_config(CFG)
    assert mongo_read_options(cfg, "test.nation") == {
        "connection.uri": "mongodb://db:27017/?replicaSet=rs0",
        "database": "test",
        "collection": "nation",
    }


def test_mongo_stream_options_update_lookup():
    # README.md:303-304: change streams run with fullDocument updateLookup;
    # raw events (not full-document-only) so operationType survives
    opts = mongo_stream_options(load_config(CFG), "test.events")
    assert opts["change.stream.lookup.full.document"] == "updateLookup"
    assert opts["change.stream.publish.full.document.only"] == "false"
    assert opts["collection"] == "events"


def test_mongo_write_options_replace_by_id():
    # the connector form of ReplaceOneModel+SetUpsert (route81.go:1094-1100)
    opts = mongo_write_options(load_config(CFG), "db.c")
    assert opts["operationType"] == "replace"
    assert opts["idFieldList"] == "_id"


def test_mongo_builders_construct_without_jar(spark):
    # format/option wiring is lazy — only .load()/.save() needs the
    # connector jar, so construction must succeed in this container
    cfg = load_config(CFG)
    mongo_reader(spark, cfg, "test.nation")
    mongo_stream_reader(spark, cfg, "test.events")
    df = spark.createDataFrame([("a", 1)], "_id string, x int")
    mongo_writer(df, cfg, "db.c")


def test_mongo_retry_contract():
    cfg_retry = load_config(CFG)
    cfg_fast = load_config(CFG.replace("fail-fast = false", "fail-fast = true"))
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("down")
        return "ok"

    # mustConnect loops until connected (route81.go:1563-1583)...
    assert with_mongo_retry(flaky, cfg_retry, delay_s=0.0) == "ok"
    assert calls["n"] == 3
    # ...but fail-fast makes the first error fatal (route81.go:1574-1576)
    calls["n"] = 0
    with pytest.raises(ConnectionError):
        with_mongo_retry(flaky, cfg_fast, delay_s=0.0)
    assert calls["n"] == 1


def test_delete_writer_gated_on_pymongo():
    cfg = load_config(CFG)
    try:
        import pymongo  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="pymongo"):
            delete_writer(cfg, "db.c")
    else:
        assert callable(delete_writer(cfg, "db.c"))


@pytest.mark.skip(reason="no live MongoDB in this container")
def test_mongo_live_roundtrip(spark):  # pragma: no cover
    cfg = load_config(CFG)
    with_mongo_retry(lambda: mongo_reader(spark, cfg, "test.nation").load(), cfg)
