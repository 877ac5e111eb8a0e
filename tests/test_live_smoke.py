"""Env-gated live-seam smoke (see tools/live_smoke.md): runs only when
SPARK_GRAFT_LIVE_SMOKE=1 AND the docker-compose infra from
tools/live_smoke/ is up; skips cleanly everywhere else (this sandbox
has no servers or connector jars — the seams are construction-tested
by test_mongo_seam.py / test_jobs.py)."""

from __future__ import annotations

import os
import socket

import pytest

LIVE = os.environ.get("SPARK_GRAFT_LIVE_SMOKE") == "1"


def _reachable(host: str, port: int) -> bool:
    try:
        with socket.create_connection((host, port), timeout=2):
            return True
    except OSError:
        return False


pytestmark = pytest.mark.skipif(
    not LIVE, reason="live smoke: set SPARK_GRAFT_LIVE_SMOKE=1 with "
    "tools/live_smoke infra up (see tools/live_smoke.md)"
)


def test_live_mongo_direct_read_ships_pipeline(spark):
    if not _reachable("localhost", 27017):
        pytest.skip("mongo not reachable on localhost:27017")
    from route81_spark.config import load_config
    from route81_spark.sources.mongo import mongo_reader

    cfg = load_config(
        'mongo = "mongodb://localhost:27017/?replicaSet=rs0&directConnection=true"\n'
        'direct-read-namespaces = ["smoke.items"]\n'
        "[[pipeline]]\n"
        'namespace = "smoke.items"\n'
        "direct = true\n"
        'stages = """[{"$match": {"qty": {"$gt": 0}}}]"""\n'
    )
    df = mongo_reader(spark, cfg, "smoke.items").load()
    assert df.count() == 4  # the $match ran server-side on the 6 seeds


def test_live_kafka_round_trip(spark, tmp_path):
    if not _reachable("localhost", 9092):
        pytest.skip("kafka not reachable on localhost:9092")
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    topic = "smoke.pytest"
    df = spark.createDataFrame([Row(key=str(i), value=f"v{i}") for i in range(5)])
    (
        df.select(
            F.col("key").cast("binary"), F.col("value").cast("binary")
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", "localhost:9092")
        .option("topic", topic)
        .save()
    )
    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", "localhost:9092")
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    got = {r["value"].decode() for r in back.select("value").collect()}
    assert {f"v{i}" for i in range(5)} <= got
