"""Core pipeline-stage queries: $match dialect, $project/$addFields/$unset, $group accumulators, $sort/$skip/$limit/$count, $unwind, $replaceRoot, $setWindowFields."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from route81_spark.ops.util import det_round_sql
from route81_spark.pipeline import apply_pipeline
from ._shared import _q, _t

@_q(
    "match_project",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 30
    """,
)
def match_project(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "lineitem"),
        [
            {"$match": {"l_returnflag": "R", "l_quantity": {"$gt": 30}}},
            {
                "$project": {
                    "l_orderkey": 1,
                    "l_linenumber": 1,
                    "revenue": {
                        "$multiply": ["$l_extendedprice", {"$subtract": [1, "$l_discount"]}]
                    },
                }
            },
        ],
    )

@_q(
    "match_in_nin",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_linestatus IN ('O')
      AND NOT COALESCE(l_returnflag IN ('A', 'N'), FALSE)
      AND l_quantity >= 48
    """,
)
def match_in_nin(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "lineitem"),
        [
            {
                "$match": {
                    "l_linestatus": {"$in": ["O"]},
                    "l_returnflag": {"$nin": ["A", "N"]},
                    "l_quantity": {"$gte": 48},
                }
            },
            {"$project": {"l_orderkey": 1, "l_linenumber": 1, "l_quantity": 1}},
        ],
    )

@_q(
    "match_or_regex",
    """
    SELECT p_partkey, p_type, p_size
    FROM part
    WHERE regexp_matches(p_type, 'PROMO') OR p_size >= 45
    """,
)
def match_or_regex(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "part"),
        [
            {"$match": {"$or": [{"p_type": {"$regex": "PROMO"}}, {"p_size": {"$gte": 45}}]}},
            {"$project": {"p_partkey": 1, "p_type": 1, "p_size": 1}},
        ],
    )

@_q(
    "match_mod_expr",
    """
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_orderkey % 7 = 3
      AND COALESCE(l_discount > l_tax / 2, FALSE)
    """,
)
def match_mod_expr(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "lineitem"),
        [
            {
                "$match": {
                    "l_orderkey": {"$mod": [7, 3]},
                    "$expr": {"$gt": ["$l_discount", {"$divide": ["$l_tax", 2]}]},
                }
            },
            {"$project": {"l_orderkey": 1, "l_linenumber": 1}},
        ],
    )

@_q(
    "match_null_ne",
    """
    SELECT event_id,
           CASE WHEN event_id % 3 = 0 THEN NULL ELSE event_type END AS maybe
    FROM events
    WHERE (CASE WHEN event_id % 3 = 0 THEN NULL ELSE event_type END)
          IS DISTINCT FROM 'click'
    """,
)
def match_null_ne(spark, sf_dir):
    # pins Mongo null semantics: $ne matches rows where the field is null
    return apply_pipeline(
        _t(spark, sf_dir, "events"),
        [
            {
                "$addFields": {
                    "maybe": {
                        "$cond": [
                            {"$eq": [{"$mod": ["$event_id", 3]}, 0]},
                            None,
                            "$event_type",
                        ]
                    }
                }
            },
            {"$match": {"maybe": {"$ne": "click"}}},
            {"$project": {"event_id": 1, "maybe": 1}},
        ],
    )

@_q(
    "addfields_unset",
    """
    SELECT event_id, CAST(ts AS TIMESTAMP_NS) AS ts, user_id, event_type, value,
           value * 2 AS value_x2,
           event_type || ':' || CAST(user_id AS VARCHAR) AS tag
    FROM events
    """,
)
def addfields_unset(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "events"),
        [
            {
                "$set": {
                    "value_x2": {"$multiply": ["$value", 2]},
                    "tag": {"$concat": ["$event_type", ":", {"$toString": "$user_id"}]},
                }
            },
            {"$unset": "props"},
        ],
    )

@_q(
    "count_match",
    "SELECT count(*) AS returned FROM lineitem WHERE l_returnflag = 'R'",
)
def count_match(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "lineitem"),
        [{"$match": {"l_returnflag": "R"}}, {"$count": "returned"}],
    )

@_q(
    "sort_skip_limit",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 10 OFFSET 5
    """,
)
def sort_skip_limit(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "lineitem"),
        [
            {"$sort": {"l_extendedprice": -1, "l_orderkey": 1, "l_linenumber": 1}},
            {"$skip": 5},
            {"$limit": 10},
            {"$project": {"l_orderkey": 1, "l_linenumber": 1, "l_extendedprice": 1}},
        ],
    )

@_q(
    "group_sum_avg",
    """
    SELECT l_returnflag AS rf, l_linestatus AS ls,
           floor((CAST(sum(l_quantity) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
           floor((CAST(sum(l_extendedprice) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS sum_base,
           floor((avg(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
           floor((avg(l_discount)) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def group_sum_avg(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "lineitem"),
        [
            {"$match": {"l_shipdate": {"$lte": "1998-09-02"}}},
            {
                "$group": {
                    "_id": {"rf": "$l_returnflag", "ls": "$l_linestatus"},
                    "sum_qty": {"$sum": "$l_quantity"},
                    "sum_base": {"$sum": "$l_extendedprice"},
                    "avg_qty": {"$avg": "$l_quantity"},
                    "avg_disc": {"$avg": "$l_discount"},
                    "n": {"$sum": 1},
                }
            },
            {
                "$project": {
                    "_id": 0,
                    "rf": "$_id.rf",
                    "ls": "$_id.ls",
                    "sum_qty": {"$divide": [{"$floor": {"$add": [{"$multiply": ["$sum_qty", 10000.0]}, 0.5]}}, 10000.0]},
                    "sum_base": {"$divide": [{"$floor": {"$add": [{"$multiply": ["$sum_base", 10000.0]}, 0.5]}}, 10000.0]},
                    "avg_qty": {"$divide": [{"$floor": {"$add": [{"$multiply": ["$avg_qty", 10000.0]}, 0.5]}}, 10000.0]},
                    "avg_disc": {"$divide": [{"$floor": {"$add": [{"$multiply": ["$avg_disc", 10000.0]}, 0.5]}}, 10000.0]},
                    "n": 1,
                }
            },
        ],
    )

@_q(
    "group_expr_key",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS y, o_orderpriority AS pr,
           floor((CAST(sum(o_totalprice) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS total,
           floor((min(o_totalprice)) * 10000.0 + 0.5) / 10000.0 AS lo,
           floor((max(o_totalprice)) * 10000.0 + 0.5) / 10000.0 AS hi,
           count(*) AS n
    FROM orders
    GROUP BY 1, 2
    """,
)
def group_expr_key(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$group": {
                    "_id": {"y": {"$year": "$o_orderdate"}, "pr": "$o_orderpriority"},
                    "total": {"$sum": "$o_totalprice"},
                    "lo": {"$min": "$o_totalprice"},
                    "hi": {"$max": "$o_totalprice"},
                    "n": {"$sum": 1},
                }
            },
            {
                "$project": {
                    "_id": 0,
                    "y": "$_id.y",
                    "pr": "$_id.pr",
                    "total": {"$divide": [{"$floor": {"$add": [{"$multiply": ["$total", 10000.0]}, 0.5]}}, 10000.0]},
                    "lo": {"$divide": [{"$floor": {"$add": [{"$multiply": ["$lo", 10000.0]}, 0.5]}}, 10000.0]},
                    "hi": {"$divide": [{"$floor": {"$add": [{"$multiply": ["$hi", 10000.0]}, 0.5]}}, 10000.0]},
                    "n": 1,
                }
            },
        ],
    )

@_q(
    "sample_deterministic",
    """
    SELECT doc_id, lang FROM documents
    ORDER BY md5('s|' || CAST(doc_id AS VARCHAR)) LIMIT 25
    """,
)
def sample_deterministic(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "documents"),
        [
            {"$sample": {"size": 25, "key": "$doc_id"}},
            {"$project": {"doc_id": 1, "lang": 1}},
        ],
    )

@_q(
    "group_global",
    """
    SELECT floor((CAST(sum(l_extendedprice) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
             AS total_price,
           floor((avg(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
           count(*) AS n,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
)
def group_global(spark, sf_dir):
    # $group with _id: null — one global aggregation row
    df = apply_pipeline(
        _t(spark, sf_dir, "lineitem"),
        [
            {
                "$group": {
                    "_id": None,
                    "total_price": {"$sum": "$l_extendedprice"},
                    "avg_qty": {"$avg": "$l_quantity"},
                    "n": {"$sum": 1},
                    "orders": {"$addToSet": "$l_orderkey"},
                }
            },
            {
                "$project": {
                    "_id": 0,
                    "total_price": {
                        "$divide": [
                            {"$floor": {"$add": [{"$multiply": ["$total_price", 10000.0]}, 0.5]}},
                            10000.0,
                        ]
                    },
                    "avg_qty": {
                        "$divide": [
                            {"$floor": {"$add": [{"$multiply": ["$avg_qty", 10000.0]}, 0.5]}},
                            10000.0,
                        ]
                    },
                    "n": 1,
                    "n_orders": {"$toLong": {"$size": "$orders"}},
                }
            },
        ],
    )
    return df

@_q(
    "group_addtoset",
    """
    SELECT o_orderpriority AS pr,
           array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def group_addtoset(spark, sf_dir):
    df = apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$group": {
                    "_id": "$o_orderpriority",
                    "statuses": {"$addToSet": "$o_orderstatus"},
                    "n": {"$sum": 1},
                }
            },
        ],
    )
    return df.select(
        F.col("_id").alias("pr"), F.concat_ws(",", "statuses").alias("statuses"), "n"
    )

@_q(
    "unwind_group",
    """
    SELECT tok AS token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok ORDER BY n DESC, token ASC LIMIT 20
    """,
)
def unwind_group(spark, sf_dir):
    from route81_spark.io import ensure_parallelism

    return apply_pipeline(
        ensure_parallelism(_t(spark, sf_dir, "documents")),
        [
            {"$addFields": {"tok": {"$split": ["$text", " "]}}},
            {"$unwind": "$tok"},
            {"$group": {"_id": "$tok", "n": {"$sum": 1}}},
            {"$sort": {"n": -1, "_id": 1}},
            {"$limit": 20},
            {"$project": {"_id": 0, "token": "$_id", "n": 1}},
        ],
    )

@_q(
    "replace_root",
    "SELECT l_orderkey AS a, l_quantity AS b FROM lineitem WHERE l_linenumber = 1",
)
def replace_root(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "lineitem"),
        [
            {"$match": {"l_linenumber": 1}},
            {"$project": {"nested": {"a": "$l_orderkey", "b": "$l_quantity"}}},
            {"$replaceRoot": {"newRoot": "$nested"}},
        ],
    )

@_q(
    "sort_by_count",
    """
    SELECT event_type AS _id, count(*) AS count
    FROM events GROUP BY event_type
    ORDER BY count DESC, _id ASC
    """,
)
def sort_by_count(spark, sf_dir):
    return apply_pipeline(_t(spark, sf_dir, "events"), [{"$sortByCount": "$event_type"}])

@_q(
    "elem_match_size",
    """
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_toks
    FROM documents
    WHERE len(list_filter(list_transform(string_split(text, ' '), t -> length(t)),
              x -> x >= 8)) > 0
    """,
)
def elem_match_size(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "documents"),
        [
            {
                "$addFields": {
                    "lens": {
                        "$map": {
                            "input": {"$split": ["$text", " "]},
                            "as": "t",
                            "in": {"$strLenCP": "$$t"},
                        }
                    }
                }
            },
            {"$match": {"lens": {"$elemMatch": {"$gte": 8}}}},
            {"$project": {"doc_id": 1, "n_toks": {"$size": {"$split": ["$text", " "]}}}},
        ],
    )

@_q(
    "group_first_last_sorted",
    """
    SELECT user_id,
           arg_max(event_type, event_id) AS latest_type,
           arg_max(value, event_id) AS latest_value,
           arg_min(event_type, event_id) AS first_type,
           count(*) AS n
    FROM events GROUP BY user_id
    """,
)
def group_first_last_sorted(spark, sf_dir):
    # the CDC latest-per-key pattern: $sort desc + $group $first compiles
    # to max_by/min_by (deterministic under parallelism)
    return apply_pipeline(
        _t(spark, sf_dir, "events"),
        [
            {"$sort": {"event_id": -1}},
            {
                "$group": {
                    "_id": "$user_id",
                    "latest_type": {"$first": "$event_type"},
                    "latest_value": {"$first": "$value"},
                    "first_type": {"$last": "$event_type"},
                    "n": {"$sum": 1},
                }
            },
            {
                "$project": {
                    "_id": 0,
                    "user_id": "$_id",
                    "latest_type": 1,
                    "latest_value": 1,
                    "first_type": 1,
                    "n": 1,
                }
            },
        ],
    )

@_q(
    "json_dynamic_match",
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 50
      AND (CAST(json_extract_string(props, '$.k') AS DOUBLE))
          IS DISTINCT FROM 77
    """,
)
def json_dynamic_match(spark, sf_dir):
    # schemaless path: the $match dialect over an opaque JSON column
    # (SURVEY §1.1-2 option b) — no declared schema for `props`
    from route81_spark.pipeline.jsonpath import compile_match_json, json_field

    ev = _t(spark, sf_dir, "events")
    pred = compile_match_json({"k": {"$gte": 50, "$ne": 77}}, F.col("props"))
    return ev.filter(pred).select(
        "event_id",
        "event_type",
        json_field(F.col("props"), "k").cast("double").alias("k"),
    )

@_q(
    "json_dynamic_pipeline",
    f"""
    WITH t AS (
      SELECT floor(CAST(json_extract_string(props, '$.k') AS DOUBLE) / 10) AS cat,
             CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
      FROM events
      WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) < 900
    )
    SELECT cat AS _id,
           CAST(count(*) AS BIGINT) AS n,
           {det_round_sql('sum(k * 2)', 4)} AS dk,
           {det_round_sql('avg(k)', 4)} AS mk
    FROM t GROUP BY cat
    HAVING count(*) > 1
    """,
)
def json_dynamic_pipeline(spark, sf_dir):
    """Dynamic pipeline over the opaque JSON column: $match -> $group on
    JSON paths, then post-materialization stages on the schema'd
    compiler ($match over the aggregate)."""
    from route81_spark.ops.util import det_round
    from route81_spark.pipeline.jsonpath import apply_pipeline_json

    ev = _t(spark, sf_dir, "events")
    out = apply_pipeline_json(
        ev,
        "props",
        [
            {"$match": {"k": {"$lt": 900}}},
            {
                "$group": {
                    "_id": {"$floor": {"$divide": ["$k", 10]}},
                    "n": {"$count": {}},
                    "dk": {"$sum": {"$multiply": ["$k", 2]}},
                    "mk": {"$avg": "$k"},
                }
            },
            {"$match": {"n": {"$gt": 1}}},
        ],
    )
    return out.select(
        "_id", "n", det_round(F.col("dk"), 4).alias("dk"), det_round(F.col("mk"), 4).alias("mk")
    )

@_q(
    "match_extjson_literal",
    """
    SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP_NS) AS o_orderdate
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND o_totalprice > 100000
    """,
)
def match_extjson_literal(spark, sf_dir):
    # Mongo-shell-authored configs carry ext-JSON literals in pipeline
    # JSON ({"$date": ...}, {"$numberLong": ...}) — compile as literals
    return apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$match": {
                    "o_orderdate": {"$gte": {"$date": "1997-06-01T00:00:00Z"}},
                    "o_totalprice": {"$gt": {"$numberLong": "100000"}},
                }
            },
            {"$project": {"o_orderkey": 1, "o_orderdate": 1}},
        ],
    )

@_q(
    "group_push_sorted",
    """
    SELECT o_orderstatus AS st,
           array_to_string(list_sort(list(o_orderpriority ORDER BY o_orderkey)), '|') AS prios,
           count(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def group_push_sorted(spark, sf_dir):
    df = apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {"$group": {"_id": "$o_orderstatus", "prios": {"$push": "$o_orderpriority"}, "n": {"$sum": 1}}},
        ],
    )
    # $push order is source order (unstable under parallelism) — sort for
    # a deterministic comparison, as Mongo users must too
    return df.select(
        F.col("_id").alias("st"),
        F.concat_ws("|", F.array_sort("prios")).alias("prios"),
        "n",
    )

@_q(
    "match_bits_geo_type",
    """
    WITH pts AS (
      SELECT c_custkey, c_name, c_custkey % 100 AS lon, c_nationkey AS lat
      FROM customer
    )
    SELECT c_custkey, c_name
    FROM pts
    WHERE ((lon BETWEEN 10 AND 60 AND lat BETWEEN 2 AND 15)
           OR ((lon - 80) * (lon - 80) + (lat - 20) * (lat - 20)) <= 100
           OR 2 * asin(sqrt(
                sin((radians(CAST(lat AS DOUBLE)) - radians(5.0)) / 2)
                  * sin((radians(CAST(lat AS DOUBLE)) - radians(5.0)) / 2)
                + cos(radians(5.0)) * cos(radians(CAST(lat AS DOUBLE)))
                  * sin((radians(CAST(lon AS DOUBLE)) - radians(90.0)) / 2)
                  * sin((radians(CAST(lon AS DOUBLE)) - radians(90.0)) / 2)
              )) <= 0.1)
      AND (c_custkey & 3) = 3
      AND (c_custkey & 4) != 4
    """,
)
def match_bits_geo_type(spark, sf_dir):
    """$bitsAllSet/$bitsAnyClear, $type (schema constant-fold), and
    $geoWithin $box/$center/$centerSphere over legacy [lon,lat] pairs."""
    return apply_pipeline(
        _t(spark, sf_dir, "customer"),
        [
            {
                "$addFields": {
                    "coords": [{"$mod": ["$c_custkey", 100]}, "$c_nationkey"]
                }
            },
            {
                "$match": {
                    "$or": [
                        {"coords": {"$geoWithin": {"$box": [[10, 2], [60, 15]]}}},
                        {"coords": {"$geoWithin": {"$center": [[80, 20], 10]}}},
                        {"coords": {"$geoWithin": {"$centerSphere": [[90, 5], 0.1]}}},
                    ],
                    "c_custkey": {"$bitsAllSet": [0, 1], "$bitsAnyClear": 4},
                    "c_name": {"$type": "string"},
                }
            },
            {"$project": {"c_custkey": 1, "c_name": 1}},
        ],
    )

@_q(
    "window_ema_addtoset",
    f"""
    WITH w AS (
      SELECT event_id, user_id,
             list(CAST(value AS DOUBLE)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pfx,
             list(event_type) OVER (PARTITION BY user_id) AS types
      FROM events
    )
    SELECT event_id, user_id,
           {det_round_sql('list_reduce(pfx, (acc, x) -> acc * (1 - 1.0/3) + x * (1.0/3))')} AS ema,
           array_to_string(list_sort(list_distinct(types)), ',') AS types
    FROM w
    """,
)
def window_ema_addtoset(spark, sf_dir):
    """$setWindowFields $expMovingAvg (recursive EMA via ordered-prefix
    fold) and $addToSet window accumulator."""
    df = apply_pipeline(
        _t(spark, sf_dir, "events"),
        [
            {
                "$setWindowFields": {
                    "partitionBy": "$user_id",
                    "sortBy": {"ts": 1, "event_id": 1},
                    "output": {
                        "ema": {"$expMovingAvg": {"input": "$value", "N": 5}},
                        "types": {"$addToSet": "$event_type"},
                    },
                }
            }
        ],
    )
    from route81_spark.ops.util import det_round

    return df.select(
        "event_id",
        "user_id",
        det_round(F.col("ema"), 6).alias("ema"),
        F.concat_ws(",", "types").alias("types"),
    )

@_q(
    "window_range_time",
    f"""
    SELECT event_id, user_id,
           {det_round_sql("sum(value) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) RANGE BETWEEN INTERVAL 5 MINUTES PRECEDING AND CURRENT ROW)", 4)} AS roll_5m,
           CAST(count(*) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) RANGE BETWEEN INTERVAL 5 MINUTES PRECEDING AND CURRENT ROW) AS BIGINT) AS n_5m
    FROM events
    """,
)
def window_range_time(spark, sf_dir):
    """$setWindowFields range window with a time unit: per-user rolling
    5-minute sum/count — Spark rangeBetween over epoch seconds."""
    df = apply_pipeline(
        _t(spark, sf_dir, "events"),
        [
            {
                "$setWindowFields": {
                    "partitionBy": "$user_id",
                    "sortBy": {"ts": 1},
                    "output": {
                        "roll_5m": {
                            "$sum": "$value",
                            "window": {"range": [-5, "current"], "unit": "minute"},
                        },
                        "n_5m": {
                            "$count": {},
                            "window": {"range": [-5, "current"], "unit": "minute"},
                        },
                    },
                }
            }
        ],
    )
    from route81_spark.ops.util import det_round

    return df.select(
        "event_id", "user_id", det_round(F.col("roll_5m"), 4).alias("roll_5m"), "n_5m"
    )

@_q(
    "window_median_rolling",
    f"""
    SELECT o_orderkey, o_custkey,
           {det_round_sql("quantile_cont(o_totalprice, 0.5) OVER w", 4)} AS med3,
           {det_round_sql("quantile_cont(o_totalprice, 0.25) OVER w", 4)} AS p25
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def window_median_rolling(spark, sf_dir):
    """$setWindowFields $median/$percentile window operators (rolling
    3-document window, exact interpolated percentile both engines)."""
    df = apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$setWindowFields": {
                    "partitionBy": "$o_custkey",
                    "sortBy": {"o_orderdate": 1, "o_orderkey": 1},
                    "output": {
                        "med3": {
                            "$median": {"input": "$o_totalprice", "method": "approximate"},
                            "window": {"documents": [-2, "current"]},
                        },
                        "p": {
                            "$percentile": {
                                "input": "$o_totalprice",
                                "p": [0.25],
                                "method": "approximate",
                            },
                            "window": {"documents": [-2, "current"]},
                        },
                    },
                }
            }
        ],
    )
    from route81_spark.ops.util import det_round

    return df.select(
        "o_orderkey",
        "o_custkey",
        det_round(F.col("med3"), 4).alias("med3"),
        det_round(F.col("p")[0], 4).alias("p25"),
    )

@_q(
    "unwind_array_index",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    )
    SELECT t.doc_id, CAST(s.i - 1 AS BIGINT) AS idx, t.toks[CAST(s.i AS INT)] AS tok
    FROM t, generate_series(1, 5) s(i)
    WHERE s.i <= len(t.toks)
    """,
)
def unwind_array_index(spark, sf_dir):
    """$unwind with includeArrayIndex (posexplode) — first five tokens
    per document with their positions."""
    return apply_pipeline(
        _t(spark, sf_dir, "documents"),
        [
            {"$addFields": {"toks": {"$slice": [{"$split": ["$text", " "]}, 5]}}},
            {"$unwind": {"path": "$toks", "includeArrayIndex": "idx"}},
            {"$project": {"doc_id": 1, "idx": 1, "tok": "$toks"}},
        ],
    )

@_q(
    "unwind_preserve_empty",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> length(x) >= 9) AS longs
      FROM documents
    ),
    u AS (SELECT doc_id, unnest(longs) AS tok FROM t)
    SELECT t.doc_id, u.tok
    FROM t LEFT JOIN u ON t.doc_id = u.doc_id
    """,
)
def unwind_preserve_empty(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "documents"),
        [
            {
                "$addFields": {
                    "longs": {
                        "$filter": {
                            "input": {"$split": ["$text", " "]},
                            "as": "x",
                            "cond": {"$gte": [{"$strLenCP": "$$x"}, 9]},
                        }
                    }
                }
            },
            {"$unwind": {"path": "$longs", "preserveNullAndEmptyArrays": True}},
            {"$project": {"doc_id": 1, "tok": "$longs"}},
        ],
    )

@_q(
    "group_stddev",
    """
    SELECT l_returnflag AS rf,
           floor((stddev_pop(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS sd_pop,
           floor((stddev_samp(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS sd_samp,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def group_stddev(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "lineitem"),
        [
            {
                "$group": {
                    "_id": "$l_returnflag",
                    "sd_pop": {"$stdDevPop": "$l_quantity"},
                    "sd_samp": {"$stdDevSamp": "$l_quantity"},
                    "n": {"$sum": 1},
                }
            },
            {
                "$project": {
                    "_id": 0,
                    "rf": "$_id",
                    "sd_pop": {"$divide": [{"$floor": {"$add": [{"$multiply": ["$sd_pop", 10000.0]}, 0.5]}}, 10000.0]},
                    "sd_samp": {"$divide": [{"$floor": {"$add": [{"$multiply": ["$sd_samp", 10000.0]}, 0.5]}}, 10000.0]},
                    "n": 1,
                }
            },
        ],
    )

@_q(
    "stage_dedup_then_analyze",
    """
    WITH kept AS (
      SELECT d.* FROM documents d
      JOIN (SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) h,
                   min(doc_id) keep_id
            FROM documents GROUP BY 1) k
        ON d.doc_id = k.keep_id
    )
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
           lang
    FROM kept
    """,
)
def stage_dedup_then_analyze(spark, sf_dir):
    # extension stages invoked through the pipeline-JSON surface itself
    df = apply_pipeline(
        _t(spark, sf_dir, "documents"),
        [
            {"$dedupExact": {"textField": "text", "idField": "doc_id"}},
            {"$textAnalyze": {"textField": "text"}},
            {"$project": {"doc_id": 1, "n_tokens": 1, "lang": 1}},
        ],
    )
    return df

@_q(
    "window_rank_shift",
    """
    SELECT o_orderkey, o_custkey,
           CAST(RANK() OVER w AS INT) AS rk,
           CAST(ROW_NUMBER() OVER w AS INT) AS rn,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_n,
           CAST(LAG(o_orderdate) OVER w AS TIMESTAMP_NS) AS prev_date
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
)
def window_rank_shift(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$setWindowFields": {
                    "partitionBy": "$o_custkey",
                    "sortBy": {"o_orderkey": 1},
                    "output": {
                        "rk": {"$rank": {}},
                        "rn": {"$documentNumber": {}},
                        "run_n": {
                            "$count": {},
                            "window": {"documents": ["unbounded", "current"]},
                        },
                        "prev_date": {"$shift": {"output": "$o_orderdate", "by": -1}},
                    },
                }
            },
            {
                "$project": {
                    "_id": 0,
                    "o_orderkey": 1,
                    "o_custkey": 1,
                    "rk": 1,
                    "rn": 1,
                    "run_n": 1,
                    "prev_date": 1,
                }
            },
        ],
    )

@_q(
    "replace_with_merge",
    """
    SELECT n_nationkey AS k,
           n_regionkey AS r,
           n_name AS name,
           'dim' AS kind
    FROM nation
    """,
)
def replace_with_merge(spark, sf_dir):
    """$replaceWith {$mergeObjects: [...]}: later non-null fields win
    (the standard document-defaulting idiom)."""
    return apply_pipeline(
        _t(spark, sf_dir, "nation"),
        [
            {
                "$replaceWith": {
                    "$mergeObjects": [
                        {"k": "$n_nationkey", "r": None, "kind": "dim"},
                        {"r": "$n_regionkey", "name": "$n_name"},
                    ]
                }
            }
        ],
    )

@_q(
    "group_rank_accs",
    """
    WITH o AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_orderpriority AS pr,
           arg_max(o_orderkey, o_totalprice) AS best,
           array_to_string(list(o_orderkey ORDER BY o_totalprice DESC, o_orderkey DESC)[1:3], '|') AS top3,
           array_to_string(list(cents ORDER BY cents)[1:2], '|') AS min2,
           array_to_string(list(cents ORDER BY cents DESC)[1:2], '|') AS max2,
           array_to_string(list(o_orderkey ORDER BY o_orderkey)[1:2], '|') AS f2,
           array_to_string(CASE WHEN count(*) >= 2
             THEN list(o_orderkey ORDER BY o_orderkey)[CAST(count(*) AS INT)-1:CAST(count(*) AS INT)]
             ELSE list(o_orderkey ORDER BY o_orderkey) END, '|') AS l2,
           count(*) AS n
    FROM o GROUP BY o_orderpriority
    """,
)
def group_rank_accs(spark, sf_dir):
    """Modern accumulators: $top/$topN/$minN/$maxN/$firstN/$lastN.
    Prices compare as integer cents — double->string formatting differs
    across engines even when values are identical."""
    df = apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {"$addFields": {"cents": {"$toLong": {"$floor": {"$add": [{"$multiply": ["$o_totalprice", 100]}, 0.5]}}}}},
            {"$sort": {"o_orderkey": 1}},
            {
                "$group": {
                    "_id": "$o_orderpriority",
                    "best": {"$top": {"sortBy": {"o_totalprice": -1}, "output": "$o_orderkey"}},
                    "top3": {"$topN": {"n": 3, "sortBy": {"o_totalprice": -1}, "output": "$o_orderkey"}},
                    "min2": {"$minN": {"input": "$cents", "n": 2}},
                    "max2": {"$maxN": {"input": "$cents", "n": 2}},
                    "f2": {"$firstN": {"input": "$o_orderkey", "n": 2}},
                    "l2": {"$lastN": {"input": "$o_orderkey", "n": 2}},
                    "n": {"$count": {}},
                }
            },
        ],
    )
    return df.select(
        F.col("_id").alias("pr"),
        "best",
        F.concat_ws("|", "top3").alias("top3"),
        F.concat_ws("|", "min2").alias("min2"),
        F.concat_ws("|", "max2").alias("max2"),
        F.concat_ws("|", "f2").alias("f2"),
        F.concat_ws("|", "l2").alias("l2"),
        "n",
    )

@_q(
    "group_median_pct",
    f"""
    SELECT o_orderstatus AS st,
           {det_round_sql('quantile_cont(o_totalprice, 0.5)', 4)} AS med,
           {det_round_sql('quantile_cont(o_totalprice, 0.25)', 4)} AS p25,
           {det_round_sql('quantile_cont(o_totalprice, 0.75)', 4)} AS p75
    FROM orders GROUP BY o_orderstatus
    """,
)
def group_median_pct(spark, sf_dir):
    df = apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$group": {
                    "_id": "$o_orderstatus",
                    "med": {"$median": {"input": "$o_totalprice", "method": "approximate"}},
                    "pct": {"$percentile": {"input": "$o_totalprice", "p": [0.25, 0.75], "method": "approximate"}},
                }
            },
        ],
    )
    from route81_spark.ops.util import det_round

    return df.select(
        F.col("_id").alias("st"),
        det_round(F.col("med"), 4).alias("med"),
        det_round(F.col("pct")[0], 4).alias("p25"),
        det_round(F.col("pct")[1], 4).alias("p75"),
    )

@_q(
    "window_calculus",
    f"""
    WITH w AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             first_value(o_totalprice) OVER win AS fv,
             last_value(o_totalprice) OVER win AS lv,
             first_value(o_orderkey) OVER win AS fk,
             last_value(o_orderkey) OVER win AS lk,
             list(struct_pack(k := o_orderkey, v := o_totalprice)) OVER win AS samples
      FROM orders
      WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderkey
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    )
    SELECT o_custkey, o_orderkey,
           {det_round_sql('CASE WHEN lk != fk THEN (lv - fv) / (lk - fk) END', 4)} AS deriv,
           {det_round_sql('''list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             [ (samples[i+1].v + samples[i].v) / 2 * (samples[i+1].k - samples[i].k)
               for i in range(1, len(samples)) ]), (a, b) -> a + b)''', 4)} AS integ
    FROM w
    """,
)
def window_calculus(spark, sf_dir):
    """$derivative + $integral over a trailing 3-document window."""
    df = apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$setWindowFields": {
                    "partitionBy": "$o_custkey",
                    "sortBy": {"o_orderkey": 1},
                    "output": {
                        "deriv": {
                            "$derivative": {"input": "$o_totalprice"},
                            "window": {"documents": [-2, "current"]},
                        },
                        "integ": {
                            "$integral": {"input": "$o_totalprice"},
                            "window": {"documents": [-2, "current"]},
                        },
                    },
                }
            },
            {"$project": {"_id": 0, "o_custkey": 1, "o_orderkey": 1, "deriv": 1, "integ": 1}},
        ],
    )
    from route81_spark.ops.util import det_round

    return df.select(
        "o_custkey",
        "o_orderkey",
        det_round(F.col("deriv"), 4).alias("deriv"),
        det_round(F.col("integ"), 4).alias("integ"),
    )

@_q(
    "match_text_search",
    # mirrors the documented $text subset: phrase conjunctive
    # (substring), negated term excluded, engine textScore = plain-term
    # token occurrences + phrase substring occurrences (integer)
    """
    WITH t AS (
      SELECT doc_id, lower(text) AS lt,
             string_split_regex(lower(text), '[^0-9a-z]+') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(toks, x -> x = 'spark'))
              + len(list_filter(toks, x -> x = 'vector'))
              + (length(lt) - length(replace(lt, 'value table', '')))
                // length('value table') AS BIGINT) AS score
    FROM t
    WHERE contains(lt, 'value table')
      AND NOT coalesce(list_contains(toks, 'merge'), false)
    """,
)
def match_text_search(spark, sf_dir):
    """$text — the engine-backed documented subset of MongoDB text
    search (the reference delegates $text to the server's text index;
    here the same query document compiles to pure-Column token/phrase
    predicates over a declared text column): conjunctive phrases,
    disjunctive terms, negations, case folding, and the {$meta:
    "textScore"} integer relevance. Zero shuffle — a per-row filter +
    projection the optimizer can push around."""
    docs = _t(spark, sf_dir, "documents")
    return apply_pipeline(
        docs,
        [
            {"$match": {"$text": {
                "$search": 'spark vector -merge "value table"'
            }}},
            {"$addFields": {"score": {"$meta": "textScore"}}},
            {"$project": {"doc_id": 1, "score": 1}},
        ],
    )
