"""Tier-3 server stages and plan patterns: $lookup/$facet/$bucket/$graphLookup/$fill/$densify/$merge/$unionWith/$geoNear, TPC-H-shaped pipelines, skew/bloom join strategies."""

from __future__ import annotations

from pyspark.sql import functions as F
from route81_spark.ops.util import det_round_sql
from route81_spark.pipeline import apply_pipeline
from ._shared import _q, _t, _use_tables

@_q(
    "documents_stage",
    """
    SELECT * FROM (VALUES ('a', 1, 10.0), ('b', 2, 20.5), ('c', 2, 0.25))
      AS t(name, grp, v)
    WHERE grp = 2
    ORDER BY name
    """,
)
def documents_stage(spark, sf_dir):
    """$documents literal source stage + downstream pipeline over it."""
    return apply_pipeline(
        _t(spark, sf_dir, "nation"),  # replaced by the literal docs
        [
            {
                "$documents": [
                    {"name": "a", "grp": 1, "v": 10.0},
                    {"name": "b", "grp": 2, "v": 20.5},
                    {"name": "c", "grp": 2, "v": 0.25},
                ]
            },
            {"$match": {"grp": 2}},
            {"$sort": {"name": 1}},
        ],
    )

@_q(
    "skew_two_stage_agg",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           {det_round_sql('sum(value)', 4)} AS total
    FROM events GROUP BY event_type
    """,
)
def skew_two_stage_agg(spark, sf_dir):
    """Salted two-stage aggregation for skewed keys: stage 1 aggregates
    (key, salt) — spreading one hot key over 16 reducers — stage 2
    combines the 16 partials per key. Same result as a direct groupBy;
    at 100 TB with a dominant key this is the difference between one
    straggler task and even reducers. (Spark's partial agg already
    map-side-combines; salting additionally splits the REDUCE side.)"""
    from route81_spark.ops.util import det_round

    ev = _t(spark, sf_dir, "events").withColumn(
        "__salt", (F.crc32(F.col("event_id").cast("string")) % 16).cast("int")
    )
    partial = ev.groupBy("event_type", "__salt").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
    )
    return (
        partial.groupBy("event_type")
        .agg(F.sum("n").alias("n"), det_round(F.sum("total"), 4).alias("total"))
    )

@_q(
    "redact_pipeline",
    """
    WITH p AS (
      SELECT o_orderkey, o_custkey % 3 AS level,
             o_orderkey % 3 AS d_level, o_orderstatus AS d_status
      FROM orders
    )
    SELECT o_orderkey, level,
           CASE WHEN level = 0 OR d_level IN (0, 1) THEN d_level END AS detail_level,
           CASE WHEN level = 0 OR d_level IN (0, 1) THEN d_status END AS detail_status
    FROM p WHERE level IN (0, 1)
    """,
)
def redact_pipeline(spark, sf_dir):
    # $redact over a nested doc built from orders: root level decides
    # KEEP/DESCEND/PRUNE; the embedded detail doc re-evaluates the same
    # condition against ITS level field
    return apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$project": {
                    "o_orderkey": 1,
                    "level": {"$mod": ["$o_custkey", 3]},
                    "detail": {
                        "level": {"$mod": ["$o_orderkey", 3]},
                        "status": "$o_orderstatus",
                    },
                }
            },
            {
                "$redact": {
                    "$switch": {
                        "branches": [
                            {"case": {"$eq": ["$level", 0]}, "then": "$$KEEP"},
                            {"case": {"$eq": ["$level", 1]}, "then": "$$DESCEND"},
                        ],
                        "default": "$$PRUNE",
                    }
                }
            },
            {
                "$project": {
                    "o_orderkey": 1,
                    "level": 1,
                    "detail_level": "$detail.level",
                    "detail_status": "$detail.status",
                }
            },
        ],
    )

def _mround(expr, digits: int = 4) -> dict:
    """Mongo-dialect deterministic rounding: floor(x*10^d + 0.5)/10^d —
    the same IEEE-exact form as ops.util.det_round (both engines)."""
    scale = float(10**digits)
    return {"$divide": [{"$floor": {"$add": [{"$multiply": [expr, scale]}, 0.5]}}, scale]}

@_q(
    "lookup_pipeline_form",
    f"""
    WITH li AS (
      SELECT l_orderkey, l_quantity, l_extendedprice
      FROM lineitem WHERE l_quantity >= 45 AND l_returnflag = 'R'
    ),
    agg AS (
      SELECT l_orderkey,
             CAST(count(*) AS INT) AS n_heavy,
             {det_round_sql('sum(l_extendedprice)', 4)} AS heavy_rev
      FROM li GROUP BY l_orderkey
    )
    SELECT o.o_orderkey,
           COALESCE(a.n_heavy, 0) AS n_heavy,
           COALESCE(a.heavy_rev, 0.0) AS heavy_rev
    FROM orders o LEFT JOIN agg a ON o.o_orderkey = a.l_orderkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def lookup_pipeline_form(spark, sf_dir):
    """$lookup pipeline/let form: correlated $eq -> join key, the
    uncorrelated conjunct + $project pushed to the foreign scan."""
    _use_tables(spark, sf_dir)
    df = apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {"$match": {"o_orderstatus": "F"}},
            {
                "$lookup": {
                    "from": "lineitem",
                    "let": {"okey": "$o_orderkey"},
                    "pipeline": [
                        {
                            "$match": {
                                "$expr": {
                                    "$and": [
                                        {"$eq": ["$$okey", "$l_orderkey"]},
                                        {"$gte": ["$l_quantity", 45]},
                                        {"$eq": ["$l_returnflag", "R"]},
                                    ]
                                }
                            }
                        },
                        {"$project": {"l_extendedprice": 1}},
                    ],
                    "as": "heavy",
                }
            },
            {
                "$project": {
                    "o_orderkey": 1,
                    "n_heavy": {"$size": "$heavy"},
                    "heavy_rev": {
                        "$sum": {
                            "$map": {"input": "$heavy", "in": "$$this.l_extendedprice"}
                        }
                    },
                }
            },
        ],
    )
    from route81_spark.ops.util import det_round

    return df.select(
        "o_orderkey", "n_heavy", det_round(F.col("heavy_rev"), 4).alias("heavy_rev")
    )

@_q(
    "tpch_q3_pipeline",
    f"""
    SELECT l.l_orderkey,
           {det_round_sql("sum(l.l_extendedprice * (1 - l.l_discount))", 4)} AS revenue,
           CAST(o.o_orderdate AS TIMESTAMP_NS) AS o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3_pipeline(spark, sf_dir):
    """TPC-H Q3 expressed entirely in the Mongo pipeline dialect:
    $match -> $lookup (x2, both broadcast-shaped) -> $unwind -> computed
    $group -> $sort/$limit (TakeOrderedAndProject top-k)."""
    _use_tables(spark, sf_dir)
    from route81_spark.ops.util import det_round

    df = apply_pipeline(
        _t(spark, sf_dir, "customer"),
        [
            {"$match": {"c_mktsegment": "BUILDING"}},
            {
                "$lookup": {
                    "from": "orders",
                    "localField": "c_custkey",
                    "foreignField": "o_custkey",
                    "as": "orders",
                }
            },
            {"$unwind": "$orders"},
            {"$match": {"orders.o_orderdate": {"$lt": {"$date": "1995-03-15 00:00:00"}}}},
            {
                "$lookup": {
                    "from": "lineitem",
                    "localField": "orders.o_orderkey",
                    "foreignField": "l_orderkey",
                    "as": "items",
                }
            },
            {"$unwind": "$items"},
            {"$match": {"items.l_shipdate": {"$gt": {"$date": "1995-03-15 00:00:00"}}}},
            {
                "$group": {
                    "_id": {
                        "okey": "$items.l_orderkey",
                        "odate": "$orders.o_orderdate",
                    },
                    "revenue": {
                        "$sum": {
                            "$multiply": [
                                "$items.l_extendedprice",
                                {"$subtract": [1, "$items.l_discount"]},
                            ]
                        }
                    },
                }
            },
            {"$sort": {"revenue": -1, "_id.okey": 1}},
            {"$limit": 10},
            {
                "$project": {
                    "_id": 0,
                    "l_orderkey": "$_id.okey",
                    "revenue": 1,
                    "o_orderdate": "$_id.odate",
                }
            },
        ],
    )
    return df.select(
        "l_orderkey", det_round(F.col("revenue"), 4).alias("revenue"), "o_orderdate"
    )

@_q(
    "tpch_q5_pipeline",
    f"""
    SELECT n.n_name,
           {det_round_sql("sum(l.l_extendedprice * (1 - l.l_discount))", 4)} AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name ASC
    """,
)
def tpch_q5_pipeline(spark, sf_dir):
    """TPC-H Q5 in the pipeline dialect: a five-deep fused
    $lookup+$unwind join chain (each compiles to a direct join —
    broadcast for the dims, shuffle for orders x lineitem) plus a
    cross-field $expr equality (local-supplier condition)."""
    _use_tables(spark, sf_dir)
    from route81_spark.ops.util import det_round

    df = apply_pipeline(
        _t(spark, sf_dir, "region"),
        [
            {"$match": {"r_name": "ASIA"}},
            {"$lookup": {"from": "nation", "localField": "r_regionkey",
                         "foreignField": "n_regionkey", "as": "n"}},
            {"$unwind": "$n"},
            {"$lookup": {"from": "customer", "localField": "n.n_nationkey",
                         "foreignField": "c_nationkey", "as": "c"}},
            {"$unwind": "$c"},
            {"$lookup": {"from": "orders", "localField": "c.c_custkey",
                         "foreignField": "o_custkey", "as": "o"}},
            {"$unwind": "$o"},
            {
                "$match": {
                    "o.o_orderdate": {
                        "$gte": {"$date": "1996-01-01 00:00:00"},
                        "$lt": {"$date": "1997-01-01 00:00:00"},
                    }
                }
            },
            {"$lookup": {"from": "lineitem", "localField": "o.o_orderkey",
                         "foreignField": "l_orderkey", "as": "l"}},
            {"$unwind": "$l"},
            {"$lookup": {"from": "supplier", "localField": "l.l_suppkey",
                         "foreignField": "s_suppkey", "as": "s"}},
            {"$unwind": "$s"},
            {"$match": {"$expr": {"$eq": ["$s.s_nationkey", "$n.n_nationkey"]}}},
            {
                "$group": {
                    "_id": "$n.n_name",
                    "revenue": {
                        "$sum": {
                            "$multiply": [
                                "$l.l_extendedprice",
                                {"$subtract": [1, "$l.l_discount"]},
                            ]
                        }
                    },
                }
            },
            {"$sort": {"revenue": -1, "_id": 1}},
            {"$project": {"_id": 0, "n_name": "$_id", "revenue": 1}},
        ],
    )
    return df.select("n_name", det_round(F.col("revenue"), 4).alias("revenue"))

@_q(
    "lookup_unwind",
    """
    SELECT o_orderkey, c.c_name AS cust_name, o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def lookup_unwind(spark, sf_dir):
    _use_tables(spark, sf_dir)
    return apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {"$match": {"o_orderstatus": "F"}},
            {
                "$lookup": {
                    "from": "customer",
                    "localField": "o_custkey",
                    "foreignField": "c_custkey",
                    "as": "cust",
                }
            },
            {"$unwind": "$cust"},
            {
                "$project": {
                    "_id": 0,
                    "o_orderkey": 1,
                    "cust_name": "$cust.c_name",
                    "o_totalprice": 1,
                }
            },
        ],
    )

@_q(
    "lookup_order_counts",
    """
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def lookup_order_counts(spark, sf_dir):
    _use_tables(spark, sf_dir)
    return apply_pipeline(
        _t(spark, sf_dir, "customer"),
        [
            {
                "$lookup": {
                    "from": "orders",
                    "localField": "c_custkey",
                    "foreignField": "o_custkey",
                    "as": "ords",
                }
            },
            {
                "$project": {
                    "_id": 0,
                    "c_custkey": 1,
                    "n_orders": {"$toLong": {"$size": "$ords"}},
                }
            },
        ],
    )

@_q(
    "bucket_totalprice",
    f"""
    SELECT CASE
             WHEN o_totalprice >= 0 AND o_totalprice < 50000 THEN 0
             WHEN o_totalprice >= 50000 AND o_totalprice < 150000 THEN 50000
             WHEN o_totalprice >= 150000 AND o_totalprice < 300000 THEN 150000
             WHEN o_totalprice >= 300000 AND o_totalprice < 700000 THEN 300000
             ELSE -1 END AS _id,
           COUNT(*) AS n,
           {det_round_sql('SUM(o_totalprice)', 4)} AS total
    FROM orders GROUP BY 1
    """,
)
def bucket_totalprice(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$bucket": {
                    "groupBy": "$o_totalprice",
                    "boundaries": [0, 50000, 150000, 300000, 700000],
                    "default": -1,
                    "output": {"n": {"$sum": 1}, "total": {"$sum": "$o_totalprice"}},
                }
            },
            {"$project": {"_id": 1, "n": 1, "total": _mround("$total")}},
        ],
    )

@_q(
    "bucket_auto_custkey",
    f"""
    WITH b AS (
      SELECT c_custkey, c_acctbal, ntile(8) OVER (ORDER BY c_custkey) AS bk
      FROM customer
    ), per AS (
      SELECT bk, min(c_custkey) AS mn, max(c_custkey) AS mx,
             COUNT(*) AS n, {det_round_sql('AVG(c_acctbal)', 4)} AS avg_bal
      FROM b GROUP BY bk
    )
    SELECT mn AS lo, coalesce(lead(mn) OVER (ORDER BY bk), mx) AS hi, n, avg_bal
    FROM per
    """,
)
def bucket_auto_custkey(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "customer"),
        [
            {
                "$bucketAuto": {
                    "groupBy": "$c_custkey",
                    "buckets": 8,
                    "output": {"n": {"$sum": 1}, "avg_bal": {"$avg": "$c_acctbal"}},
                }
            },
            {
                "$project": {
                    "_id": 0,
                    "lo": "$_id.min",
                    "hi": "$_id.max",
                    "n": 1,
                    "avg_bal": _mround("$avg_bal"),
                }
            },
        ],
    )

@_q(
    "graph_lookup_chain",
    """
    WITH RECURSIVE reach(start, node, depth) AS (
      SELECT s.start, c.c_custkey, CAST(0 AS BIGINT)
      FROM (SELECT DISTINCT c_nationkey AS start FROM customer) s
      JOIN customer c ON c.c_custkey = s.start
      UNION
      SELECT r.start, c.c_custkey, r.depth + 1
      FROM reach r
      JOIN customer prev ON prev.c_custkey = r.node
      JOIN customer c ON c.c_custkey = prev.c_nationkey
      WHERE r.depth < 20
    ), closure AS (
      SELECT start, node, MIN(depth) AS d FROM reach GROUP BY start, node
    )
    SELECT cu.c_custkey, cl.node, cl.d
    FROM customer cu JOIN closure cl ON cl.start = cu.c_nationkey
    """,
)
def graph_lookup_chain(spark, sf_dir):
    """BFS closure over customer self-edges (c_nationkey -> c_custkey):
    an org-chart-shaped $graphLookup, flattened for value comparison."""
    _use_tables(spark, sf_dir)
    return apply_pipeline(
        _t(spark, sf_dir, "customer"),
        [
            {
                "$graphLookup": {
                    "from": "customer",
                    "startWith": "$c_nationkey",
                    "connectFromField": "c_nationkey",
                    "connectToField": "c_custkey",
                    "as": "chain",
                    "depthField": "d",
                }
            },
            {"$unwind": "$chain"},
            {"$project": {"_id": 0, "c_custkey": 1, "node": "$chain.c_custkey", "d": "$chain.d"}},
        ],
    )

@_q(
    "fill_locf",
    """
    WITH s AS (
      SELECT o_custkey, o_orderkey,
             CASE WHEN o_orderkey % 3 = 1 THEN NULL ELSE o_totalprice END AS q
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           last_value(q IGNORE NULLS) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS q
    FROM s
    """,
)
def fill_locf(spark, sf_dir):
    # o_orderkey is unique within each customer partition — window fills
    # over tied sort keys are order-dependent in ANY engine, so the
    # fixture must sort on a key that cannot tie
    return apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$project": {
                    "_id": 0,
                    "o_custkey": 1,
                    "o_orderkey": 1,
                    "q": {
                        "$cond": [
                            {"$eq": [{"$mod": ["$o_orderkey", 3]}, 1]},
                            None,
                            "$o_totalprice",
                        ]
                    },
                }
            },
            {
                "$fill": {
                    "partitionByFields": ["o_custkey"],
                    "sortBy": {"o_orderkey": 1},
                    "output": {"q": {"method": "locf"}},
                }
            },
        ],
    )

@_q(
    "fill_linear",
    """
    WITH s AS (
      SELECT o_custkey, o_orderkey,
             CASE WHEN o_orderkey % 3 = 1 THEN NULL ELSE o_totalprice END AS q
      FROM orders
    ), w AS (
      SELECT o_custkey, o_orderkey, q,
             last_value(q IGNORE NULLS) OVER before AS pv,
             last_value(CASE WHEN q IS NOT NULL THEN o_orderkey END IGNORE NULLS)
               OVER before AS pk,
             first_value(q IGNORE NULLS) OVER after AS nv,
             first_value(CASE WHEN q IS NOT NULL THEN o_orderkey END IGNORE NULLS)
               OVER after AS nk
      FROM s
      WINDOW before AS (PARTITION BY o_custkey ORDER BY o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             after AS (PARTITION BY o_custkey ORDER BY o_orderkey
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT o_custkey, o_orderkey,
           CASE WHEN q IS NOT NULL THEN q
                WHEN pv IS NOT NULL AND nv IS NOT NULL
                  THEN pv + (nv - pv) * (o_orderkey - pk) / (nk - pk)
           END AS q
    FROM w
    """,
)
def fill_linear(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$project": {
                    "_id": 0,
                    "o_custkey": 1,
                    "o_orderkey": 1,
                    "q": {
                        "$cond": [
                            {"$eq": [{"$mod": ["$o_orderkey", 3]}, 1]},
                            None,
                            "$o_totalprice",
                        ]
                    },
                }
            },
            {
                "$fill": {
                    "partitionByFields": ["o_custkey"],
                    "sortBy": {"o_orderkey": 1},
                    "output": {"q": {"method": "linear"}},
                }
            },
        ],
    )

@_q(
    "densify_custkey",
    """
    WITH f AS (
      SELECT c_custkey, c_name FROM customer WHERE c_custkey % 7 = 0
    ), b AS (
      SELECT min(c_custkey) AS lo, max(c_custkey) AS hi FROM f
    ), gs AS (
      SELECT unnest(generate_series(lo, hi, 1)) AS c_custkey FROM b
    )
    SELECT c_custkey, c_name FROM f
    UNION ALL
    SELECT gs.c_custkey, NULL
    FROM gs LEFT JOIN f ON f.c_custkey = gs.c_custkey
    WHERE f.c_custkey IS NULL
    """,
)
def densify_custkey(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "customer"),
        [
            {"$match": {"c_custkey": {"$mod": [7, 0]}}},
            {"$project": {"_id": 0, "c_custkey": 1, "c_name": 1}},
            {"$densify": {"field": "c_custkey", "range": {"step": 1, "bounds": "full"}}},
        ],
    )

@_q(
    "densify_months",
    """
    WITH t AS (
      SELECT o_orderpriority AS p, date_trunc('month', o_orderdate) AS m,
             count(*) AS n
      FROM orders GROUP BY 1, 2
    ), b AS (
      SELECT p, min(m) AS lo, max(m) AS hi FROM t GROUP BY p
    ), gs AS (
      SELECT p, unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS m FROM b
    )
    SELECT t.p, CAST(t.m AS TIMESTAMP_NS) AS m, CAST(t.n AS BIGINT) AS n FROM t
    UNION ALL
    SELECT gs.p, CAST(gs.m AS TIMESTAMP_NS) AS m, CAST(NULL AS BIGINT) AS n
    FROM gs LEFT JOIN t ON t.p = gs.p AND t.m = gs.m
    WHERE t.p IS NULL
    """,
)
def densify_months(spark, sf_dir):
    """$densify with a temporal unit: fill missing months per partition
    (sequence-explode from per-partition bounds + anti-join)."""
    return apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$project": {
                    "_id": 0,
                    "p": "$o_orderpriority",
                    "m": {"$dateTrunc": {"date": "$o_orderdate", "unit": "month"}},
                }
            },
            {"$group": {"_id": {"p": "$p", "m": "$m"}, "n": {"$count": {}}}},
            {"$project": {"_id": 0, "p": "$_id.p", "m": "$_id.m", "n": 1}},
            {
                "$densify": {
                    "field": "m",
                    "partitionByFields": ["p"],
                    "range": {"step": 1, "unit": "month", "bounds": "partition"},
                }
            },
        ],
    )

@_q(
    "union_with_pipeline",
    """
    SELECT o_orderkey, o_orderstatus, NULL AS src FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_orderstatus, 'other' AS src FROM orders WHERE o_orderstatus = 'O'
    """,
)
def union_with_pipeline(spark, sf_dir):
    _use_tables(spark, sf_dir)
    return apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {"$match": {"o_orderstatus": "F"}},
            {"$project": {"_id": 0, "o_orderkey": 1, "o_orderstatus": 1}},
            {
                "$unionWith": {
                    "coll": "orders",
                    "pipeline": [
                        {"$match": {"o_orderstatus": "O"}},
                        {
                            "$project": {
                                "_id": 0,
                                "o_orderkey": 1,
                                "o_orderstatus": 1,
                                "src": {"$literal": "other"},
                            }
                        },
                    ],
                }
            },
        ],
    )

@_q(
    "geo_near_planar",
    f"""
    WITH pts AS (
      SELECT c_custkey, c_custkey % 100 AS lon, c_nationkey AS lat FROM customer
    ), d AS (
      SELECT c_custkey, lon, lat,
             sqrt((lon - 10) * (lon - 10) + (lat - 20) * (lat - 20)) AS dist
      FROM pts
    )
    SELECT c_custkey, {det_round_sql('dist', 6)} AS dist
    FROM d WHERE dist <= 30
    """,
)
def geo_near_planar(spark, sf_dir):
    """$geoNear (planar) over coordinates derived in-pipeline —
    deterministic fixture without a geo column in the testdata."""
    df = apply_pipeline(
        _t(spark, sf_dir, "customer"),
        [
            {
                "$addFields": {
                    "lon": {"$mod": ["$c_custkey", 100]},
                    "lat": "$c_nationkey",
                }
            },
            {
                "$geoNear": {
                    "near": [10, 20],
                    "key": ["lon", "lat"],
                    "distanceField": "dist",
                    "maxDistance": 30,
                }
            },
            {"$project": {"_id": 0, "c_custkey": 1, "dist": 1}},
        ],
    )
    from route81_spark.ops.util import det_round

    return df.select("c_custkey", det_round(F.col("dist"), 6).alias("dist"))

@_q(
    "merge_order_counts",
    """
    WITH s AS (
      SELECT o_custkey AS c_custkey, COUNT(*) AS order_cnt
      FROM orders GROUP BY 1
    )
    SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment,
           s.order_cnt
    FROM customer c LEFT JOIN s USING (c_custkey)
    """,
)
def merge_order_counts(spark, sf_dir):
    """$merge whenMatched=merge / whenNotMatched=discard: graft a
    computed per-customer aggregate onto the customer collection —
    the resulting state is a left join in SQL."""
    _use_tables(spark, sf_dir)
    return apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {"$group": {"_id": "$o_custkey", "order_cnt": {"$count": {}}}},
            {"$project": {"_id": 0, "c_custkey": "$_id", "order_cnt": 1}},
            {
                "$merge": {
                    "into": "customer",
                    "on": "c_custkey",
                    "whenMatched": "merge",
                    "whenNotMatched": "discard",
                }
            },
        ],
    )

@_q(
    "merge_matched_pipeline",
    f"""
    WITH s AS (
      SELECT o_custkey AS c_custkey,
             COUNT(*) AS n_orders,
             {det_round_sql('sum(o_totalprice)', 4)} AS spend
      FROM orders GROUP BY 1
    )
    SELECT c.c_custkey, c.c_name,
           CASE WHEN s.c_custkey IS NOT NULL
                THEN {det_round_sql('c.c_acctbal + s.spend', 4)}
                ELSE {det_round_sql('c.c_acctbal', 4)} END AS bal,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.n_orders END AS n_orders
    FROM customer c LEFT JOIN s USING (c_custkey)
    """,
)
def merge_matched_pipeline(spark, sf_dir):
    """$merge whenMatched as a custom update pipeline: bare paths read
    the existing doc, $$new the incoming doc — per-row expressions on
    the matched pair, no extra shuffle."""
    _use_tables(spark, sf_dir)
    from route81_spark.ops.util import det_round

    out = apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$group": {
                    "_id": "$o_custkey",
                    "n_orders": {"$count": {}},
                    "spend": {"$sum": "$o_totalprice"},
                }
            },
            {"$project": {"_id": 0, "c_custkey": "$_id", "n_orders": 1, "spend": 1}},
            {
                "$merge": {
                    "into": "customer",
                    "on": "c_custkey",
                    "whenMatched": [
                        {
                            "$set": {
                                "bal": {"$add": ["$c_acctbal", "$$new.spend"]},
                                "n_orders": "$$new.n_orders",
                            }
                        },
                        {"$unset": ["c_nationkey", "c_mktsegment", "c_acctbal", "spend"]},
                    ],
                    "whenNotMatched": "discard",
                }
            },
        ],
    )
    return out.select(
        "c_custkey",
        "c_name",
        det_round(F.coalesce(F.col("bal"), F.col("c_acctbal")), 4).alias("bal"),
        "n_orders",
    )

@_q(
    "facet_summary",
    """
    SELECT (SELECT COUNT(*) FROM orders) AS total_orders,
           (SELECT CAST(COUNT(DISTINCT o_orderstatus) AS INT) FROM orders) AS n_statuses,
           (SELECT max(o_totalprice) FROM orders) AS max_price
    """,
)
def facet_summary(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$facet": {
                    "counts": [{"$count": "n"}],
                    "by_status": [
                        {"$group": {"_id": "$o_orderstatus", "n": {"$sum": 1}}}
                    ],
                    "extremes": [
                        {"$group": {"_id": None, "mx": {"$max": "$o_totalprice"}}}
                    ],
                }
            },
            {
                "$project": {
                    "total_orders": {"$arrayElemAt": ["$counts.n", 0]},
                    "n_statuses": {"$size": "$by_status"},
                    "max_price": {"$arrayElemAt": ["$extremes.mx", 0]},
                }
            },
        ],
    )

@_q(
    "skew_salted_join",
    f"""
    WITH d AS (
      SELECT event_type, {det_round_sql('avg(value)', 4)} AS type_avg
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type,
           {det_round_sql('e.value - d.type_avg', 4)} AS delta
    FROM events e JOIN d USING (event_type)
    """,
)
def skew_salted_join(spark, sf_dir):
    """Skew-resistant fact-to-dimension join via explicit salting
    (ops.util.salted_join): the 5-value event_type key is maximally
    hot, so the big side gets a deterministic 16-way salt and the
    dimension replicates 16-fold — a hot key spreads over 16 reducers
    instead of one straggler. Result identical to the plain join
    (oracle), partitioning rerun-stable (no rand())."""
    from route81_spark.ops.util import det_round, salted_join

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    dim = ev.groupBy("event_type").agg(
        det_round(F.avg("value"), 4).alias("type_avg")
    )
    j = salted_join(ev, dim, on="event_type", salt=16)
    return j.select(
        "event_id",
        "event_type",
        det_round(F.col("value") - F.col("type_avg"), 4).alias("delta"),
    )

@_q(
    "opt_bloom_join",
    # identity oracle: the Bloom semi-join reduction is semantics-
    # preserving (no false negatives), so the oracle is the PLAIN join
    f"""
    SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n,
           {det_round_sql("sum(l.l_extendedprice * (1 - l.l_discount))", 4)} AS revenue
    FROM lineitem l
    JOIN (SELECT o_orderkey FROM orders
          WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 250000) o
      ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def opt_bloom_join(spark, sf_dir):
    """Runtime-filter join: a 128 KiB Bloom bitmap of the selective
    order subset's keys prunes lineitem MAP-SIDE before its shuffle —
    at 100 TB the fact table shuffles ~the matching fraction instead of
    everything. Result provably identical to the plain join (the
    oracle runs no Bloom at all)."""
    from route81_spark.ops.util import bloom_semi_join, det_round

    li = _t(spark, sf_dir, "lineitem")
    orders_sel = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 250000)
        )
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    j = bloom_semi_join(li, orders_sel, on="l_orderkey")
    return j.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        det_round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
    )
