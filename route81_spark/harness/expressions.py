"""Expression-dialect queries: $cond/$switch, strings, dates, arrays + higher-order, sets, bytes, $convert, $let."""

from __future__ import annotations

from pyspark.sql import functions as F
from route81_spark.ops import text as X
from route81_spark.ops.util import det_round_sql
from route81_spark.pipeline import apply_pipeline
from ._shared import _q, _t

@_q(
    "expr_strings",
    """
    SELECT c_custkey,
           upper(c_name) AS name_up,
           substr(c_name, 1, 8) AS prefix,
           CAST(len(string_split(c_name, '#')) AS INT) AS n_parts,
           c_mktsegment || '/' || lower(c_name) AS tagged
    FROM customer
    """,
)
def expr_strings(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "customer"),
        [
            {
                "$project": {
                    "c_custkey": 1,
                    "name_up": {"$toUpper": "$c_name"},
                    "prefix": {"$substrCP": ["$c_name", 0, 8]},
                    "n_parts": {"$size": {"$split": ["$c_name", "#"]}},
                    "tagged": {"$concat": ["$c_mktsegment", "/", {"$toLower": "$c_name"}]},
                }
            }
        ],
    )

@_q(
    "expr_dates",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           strftime(o_orderdate, '%Y-%m-%d') AS ds
    FROM orders
    """,
)
def expr_dates(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$project": {
                    "o_orderkey": 1,
                    "y": {"$year": "$o_orderdate"},
                    "m": {"$month": "$o_orderdate"},
                    "d": {"$dayOfMonth": "$o_orderdate"},
                    "ds": {"$dateToString": {"format": "%Y-%m-%d", "date": "$o_orderdate"}},
                }
            }
        ],
    )

@_q(
    "expr_cond_switch",
    """
    SELECT CASE
             WHEN c_acctbal < 0 THEN 'debt'
             WHEN c_acctbal < 5000 THEN 'mid'
             ELSE 'high'
           END AS seg,
           count(*) AS n,
           floor((CAST(sum(c_acctbal) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS bal
    FROM customer GROUP BY 1
    """,
)
def expr_cond_switch(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "customer"),
        [
            {
                "$addFields": {
                    "seg": {
                        "$switch": {
                            "branches": [
                                {"case": {"$lt": ["$c_acctbal", 0]}, "then": "debt"},
                                {"case": {"$lt": ["$c_acctbal", 5000]}, "then": "mid"},
                            ],
                            "default": "high",
                        }
                    }
                }
            },
            {"$group": {"_id": "$seg", "n": {"$sum": 1}, "bal": {"$sum": "$c_acctbal"}}},
            {
                "$project": {
                    "_id": 0,
                    "seg": "$_id",
                    "n": 1,
                    "bal": {"$divide": [{"$floor": {"$add": [{"$multiply": ["$bal", 10000.0]}, 0.5]}}, 10000.0]},
                }
            },
        ],
    )

@_q(
    "expr_higher_order",
    """
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), t -> length(t) >= 6)) AS INT)
             AS long_toks,
           CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t)))
             AS BIGINT) AS total_len,
           CAST(len(list_filter(list_transform(string_split(text, ' '),
                t -> length(t)), x -> x >= 6)) AS INT) AS long_lens
    FROM documents
    """,
)
def expr_higher_order(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "documents"),
        [
            {"$addFields": {"toks": {"$split": ["$text", " "]}}},
            {
                "$project": {
                    "doc_id": 1,
                    "long_toks": {
                        "$size": {
                            "$filter": {
                                "input": "$toks",
                                "as": "t",
                                "cond": {"$gte": [{"$strLenCP": "$$t"}, 6]},
                            }
                        }
                    },
                    "total_len": {
                        "$toLong": {
                            "$reduce": {
                                "input": {
                                    "$map": {
                                        "input": "$toks",
                                        "as": "t",
                                        "in": {"$strLenCP": "$$t"},
                                    }
                                },
                                "initialValue": 0,
                                "in": {"$add": ["$$value", "$$this"]},
                            }
                        }
                    },
                    "long_lens": {
                        "$size": {
                            "$filter": {
                                "input": {
                                    "$map": {
                                        "input": "$toks",
                                        "as": "t",
                                        "in": {"$strLenCP": "$$t"},
                                    }
                                },
                                "as": "x",
                                "cond": {"$gte": ["$$x", 6]},
                            }
                        }
                    },
                }
            },
        ],
    )

@_q(
    "expr_convert",
    """
    SELECT event_id,
           CAST(trunc(value) AS BIGINT) AS v_long,
           CAST(event_id AS VARCHAR) AS id_str,
           COALESCE(CAST(trunc(CASE WHEN event_id % 3 = 0 THEN NULL
                                    ELSE value END) AS INT), -1) AS v_or_default
    FROM events
    """,
    # NB: DuckDB CAST(double AS BIGINT) rounds; Mongo $convert (and
    # Spark cast) truncate toward zero — the oracle must trunc() first
)
def expr_convert(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "events"),
        [
            {
                "$project": {
                    "event_id": 1,
                    "v_long": {"$convert": {"input": "$value", "to": "long"}},
                    "id_str": {"$convert": {"input": "$event_id", "to": "string"}},
                    "v_or_default": {
                        "$convert": {
                            "input": {
                                "$cond": [
                                    {"$eq": [{"$mod": ["$event_id", 3]}, 0]},
                                    None,
                                    "$value",
                                ]
                            },
                            "to": "int",
                            "onNull": -1,
                        }
                    },
                }
            }
        ],
    )

@_q(
    "expr_string_ops",
    """
    SELECT c_custkey,
           replace(c_name, '#', '-') AS dashed,
           CASE WHEN strpos(c_name, '0') > 0 THEN
             substr(c_name, 1, strpos(c_name, '0') - 1) || 'X'
               || substr(c_name, strpos(c_name, '0') + 1)
           ELSE c_name END AS one_x,
           CAST(strpos(c_name, '#') - 1 AS INT) AS hash_idx,
           regexp_matches(c_name, '00[0-9]$') AS ends_low
    FROM customer
    """,
)
def expr_string_ops(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "customer"),
        [
            {
                "$project": {
                    "c_custkey": 1,
                    "dashed": {
                        "$replaceAll": {"input": "$c_name", "find": "#", "replacement": "-"}
                    },
                    "one_x": {
                        "$replaceOne": {"input": "$c_name", "find": "0", "replacement": "X"}
                    },
                    "hash_idx": {"$indexOfCP": ["$c_name", "#"]},
                    "ends_low": {"$regexMatch": {"input": "$c_name", "regex": "00[0-9]$"}},
                }
            }
        ],
    )

@_q(
    "expr_date_arith",
    """
    SELECT o_orderkey,
           CAST(week(o_orderdate) AS INT) AS wk,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP_NS) AS due,
           date_diff('day', o_orderdate, TIMESTAMP '1998-12-31') AS days_left,
           date_diff('month', o_orderdate, TIMESTAMP '1998-12-31') AS months_left
    FROM orders
    """,
)
def expr_date_arith(spark, sf_dir):
    return apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$project": {
                    "o_orderkey": 1,
                    "wk": {"$week": "$o_orderdate"},
                    "due": {
                        "$dateAdd": {"startDate": "$o_orderdate", "unit": "day", "amount": 30}
                    },
                    "days_left": {
                        "$dateDiff": {
                            "startDate": "$o_orderdate",
                            "endDate": {"$toDate": "1998-12-31"},
                            "unit": "day",
                        }
                    },
                    "months_left": {
                        "$dateDiff": {
                            "startDate": "$o_orderdate",
                            "endDate": {"$toDate": "1998-12-31"},
                            "unit": "month",
                        }
                    },
                }
            }
        ],
    )

@_q(
    "expr_array_ops",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           array_to_string(toks[1:3], ',') AS first3,
           array_to_string(list_sort(list_distinct(toks[1:4] || toks[3:6])), ',') AS uni,
           CAST(len(toks) AS INT) AS n,
           array_to_string(list_reverse(toks[1:3]), ',') AS rev3,
           CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END AS has_the
    FROM t
    """,
)
def expr_array_ops(spark, sf_dir):
    df = apply_pipeline(
        _t(spark, sf_dir, "documents"),
        [
            {"$addFields": {"toks": {"$split": ["$text", " "]}}},
            {
                "$project": {
                    "doc_id": 1,
                    "first3": {"$slice": ["$toks", 3]},
                    "uni": {
                        "$setUnion": [
                            {"$slice": ["$toks", 4]},
                            {"$slice": ["$toks", 2, 4]},
                        ]
                    },
                    "n": {"$size": "$toks"},
                    "rev3": {"$reverseArray": {"$slice": ["$toks", 3]}},
                    "has_the": {"$cond": [{"$in": ["the", "$toks"]}, 1, 0]},
                }
            },
        ],
    )
    return df.select(
        "doc_id",
        F.concat_ws(",", "first3").alias("first3"),
        F.concat_ws(",", "uni").alias("uni"),
        "n",
        F.concat_ws(",", "rev3").alias("rev3"),
        "has_the",
    )

def _dr(expr, digits: int = 6) -> dict:
    """det_round as a Mongo pipeline expression — floor(x*10^s+0.5)/10^s,
    the IEEE-exact cross-engine rounding of ops.util.det_round, expressed
    in the dialect itself so the compiler is what's exercised."""
    scale = float(10**digits)
    return {"$divide": [{"$floor": {"$add": [{"$multiply": [expr, scale]}, 0.5]}}, scale]}

@_q(
    "expr_math_bits",
    f"""
    SELECT l_orderkey, l_linenumber,
           {det_round_sql('sin(l_quantity)')} AS sin_q,
           {det_round_sql('cos(l_discount)')} AS cos_d,
           {det_round_sql('atan2(l_tax, l_discount + 1)')} AS atan2_v,
           {det_round_sql('log2(l_quantity)')} AS log2_q,
           {det_round_sql('ln(l_quantity + 1) / ln(3)')} AS logb,
           {det_round_sql('radians(l_quantity)')} AS rad,
           CAST(l_orderkey & 255 AS BIGINT) AS band,
           CAST(l_linenumber | 8 AS BIGINT) AS bor,
           CAST(xor(l_orderkey, l_linenumber) AS BIGINT) AS bxor,
           CAST(~l_linenumber AS BIGINT) AS bnot,
           CAST(CASE WHEN upper(l_returnflag) < 'N' THEN -1
                     WHEN upper(l_returnflag) > 'N' THEN 1 ELSE 0 END AS INT) AS scmp
    FROM lineitem
    """,
)
def expr_math_bits(spark, sf_dir):
    """Trig / log-base / bit / strcasecmp expression operators
    (SURVEY §2.B expression table extension)."""
    return apply_pipeline(
        _t(spark, sf_dir, "lineitem"),
        [
            {
                "$project": {
                    "l_orderkey": 1,
                    "l_linenumber": 1,
                    "sin_q": _dr({"$sin": "$l_quantity"}),
                    "cos_d": _dr({"$cos": "$l_discount"}),
                    "atan2_v": _dr({"$atan2": ["$l_tax", {"$add": ["$l_discount", 1]}]}),
                    "log2_q": _dr({"$log2": "$l_quantity"}),
                    "logb": _dr({"$log": [{"$add": ["$l_quantity", 1]}, 3]}),
                    "rad": _dr({"$degreesToRadians": "$l_quantity"}),
                    "band": {"$toLong": {"$bitAnd": ["$l_orderkey", 255]}},
                    "bor": {"$toLong": {"$bitOr": ["$l_linenumber", 8]}},
                    "bxor": {"$toLong": {"$bitXor": ["$l_orderkey", "$l_linenumber"]}},
                    "bnot": {"$toLong": {"$bitNot": "$l_linenumber"}},
                    "scmp": {"$strcasecmp": ["$l_returnflag", "n"]},
                }
            }
        ],
    )

_EMB_SUM = (
    "list_reduce(list_prepend(0.0, list_transform({arr}, x -> CAST(x AS DOUBLE))),"
    " (a, b) -> a + b)"
)

@_q(
    "expr_array_fold",
    f"""
    WITH t AS (
      SELECT vec_id, embedding,
             {_EMB_SUM.format(arr='embedding')} AS s,
             len(embedding) AS n
      FROM embeddings
    ),
    u AS (SELECT vec_id, embedding, s, n, s / n AS mean FROM t)
    SELECT vec_id,
           CAST(n AS INT) AS n,
           {det_round_sql('CAST(list_max(embedding) AS DOUBLE)')} AS amax,
           {det_round_sql('CAST(list_min(embedding) AS DOUBLE)')} AS amin,
           {det_round_sql('s')} AS asum,
           {det_round_sql('mean')} AS aavg,
           {det_round_sql(
               "sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,"
               " x -> (CAST(x AS DOUBLE) - mean) * (CAST(x AS DOUBLE) - mean))),"
               " (a, b) -> a + b) / n)"
           )} AS sdp,
           {det_round_sql(_EMB_SUM.format(arr='embedding[1:3]'))} AS first3_sum,
           {det_round_sql(_EMB_SUM.format(arr='embedding[len(embedding)-1:len(embedding)]'))} AS last2_sum,
           {det_round_sql(_EMB_SUM.format(arr="list_sort(embedding, 'DESC')[1:2]"))} AS max2_sum,
           {det_round_sql('CAST(list_min(embedding) AS DOUBLE)')} AS min_first
    FROM u
    """,
)
def expr_array_fold(spark, sf_dir):
    """Array-aggregation expression forms of $sum/$avg/$max/$min/
    $stdDevPop plus $firstN/$lastN/$maxN/$sortArray/$first — the
    project-context (non-accumulator) dialect."""
    return apply_pipeline(
        _t(spark, sf_dir, "embeddings"),
        [
            {
                "$project": {
                    "vec_id": 1,
                    "n": {"$size": "$embedding"},
                    "amax": _dr({"$toDouble": {"$max": "$embedding"}}),
                    "amin": _dr({"$toDouble": {"$min": "$embedding"}}),
                    "asum": _dr({"$sum": "$embedding"}),
                    "aavg": _dr({"$avg": "$embedding"}),
                    "sdp": _dr({"$stdDevPop": "$embedding"}),
                    "first3_sum": _dr({"$sum": {"$firstN": {"input": "$embedding", "n": 3}}}),
                    "last2_sum": _dr({"$sum": {"$lastN": {"input": "$embedding", "n": 2}}}),
                    "max2_sum": _dr({"$sum": {"$maxN": {"input": "$embedding", "n": 2}}}),
                    "min_first": _dr({"$toDouble": {"$first": {"$sortArray": {"input": "$embedding", "sortBy": 1}}}}),
                }
            }
        ],
    )

@_q(
    "expr_let_fields",
    """
    SELECT n_nationkey,
           (n_nationkey + 10) * (n_regionkey * 3) - (n_nationkey + 10) AS letv,
           n_name AS gf,
           n_nationkey + 100 AS sf_key,
           '|key=' || CAST(n_nationkey AS VARCHAR)
             || '|region=' || CAST(n_regionkey AS VARCHAR)
             || '|name=' || n_name AS kv,
           array_to_string(
             list_transform(
               list_sort([n_nationkey % 7, n_regionkey, 3], 'DESC'),
               x -> CAST(x AS VARCHAR)), ',') AS srt,
           TRUE AS isn
    FROM nation
    """,
)
def expr_let_fields(spark, sf_dir):
    """$let bindings, $getField/$setField, $objectToArray + $reduce,
    $sortArray (desc), $isNumber — structured-document expression ops."""
    return apply_pipeline(
        _t(spark, sf_dir, "nation"),
        [
            {
                "$addFields": {
                    "doc": {"key": "$n_nationkey", "region": "$n_regionkey", "name": "$n_name"}
                }
            },
            {
                "$project": {
                    "n_nationkey": 1,
                    "letv": {
                        "$let": {
                            "vars": {
                                "a": {"$add": ["$n_nationkey", 10]},
                                "b": {"$multiply": ["$n_regionkey", 3]},
                            },
                            "in": {"$subtract": [{"$multiply": ["$$a", "$$b"]}, "$$a"]},
                        }
                    },
                    "gf": {"$getField": {"input": "$doc", "field": "name"}},
                    "sf_key": {
                        "$getField": {
                            "input": {
                                "$setField": {
                                    "field": "key",
                                    "input": "$doc",
                                    "value": {"$add": ["$n_nationkey", 100]},
                                }
                            },
                            "field": "key",
                        }
                    },
                    "kv": {
                        "$reduce": {
                            "input": {"$objectToArray": "$doc"},
                            "initialValue": "",
                            "in": {"$concat": ["$$value", "|", "$$this.k", "=", "$$this.v"]},
                        }
                    },
                    "srt": {
                        "$reduce": {
                            "input": {
                                "$map": {
                                    "input": {
                                        "$sortArray": {
                                            "input": [
                                                {"$mod": ["$n_nationkey", 7]},
                                                "$n_regionkey",
                                                3,
                                            ],
                                            "sortBy": -1,
                                        }
                                    },
                                    "in": {"$toString": "$$this"},
                                }
                            },
                            "initialValue": "",
                            "in": {
                                "$cond": [
                                    {"$eq": ["$$value", ""]},
                                    "$$this",
                                    {"$concat": ["$$value", ",", "$$this"]},
                                ]
                            },
                        }
                    },
                    "isn": {"$isNumber": "$n_nationkey"},
                }
            },
        ],
    )

@_q(
    "expr_date_parts",
    """
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(weekofyear(o_orderdate) AS INT) AS iw,
           CAST(isoyear(o_orderdate) AS INT) AS iwy,
           CAST(isodow(o_orderdate) AS INT) AS idw,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP_NS) AS mstart,
           CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP_NS) AS qstart,
           CAST(date_trunc('week', o_orderdate) AS TIMESTAMP_NS) AS wstart,
           CAST(make_timestamp(CAST(year(o_orderdate) AS BIGINT),
                          CAST(month(o_orderdate) AS BIGINT),
                          CAST(day(o_orderdate) AS BIGINT), 0, 0, 0) AS TIMESTAMP_NS) AS rebuilt,
           CAST(year(o_orderdate) AS INT) AS pyear,
           CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS TIMESTAMP_NS) AS parsed
    FROM orders
    """,
)
def expr_date_parts(spark, sf_dir):
    """$quarter/$isoWeek/$isoWeekYear/$isoDayOfWeek, $dateTrunc,
    $dateFromParts/$dateToParts/$dateFromString round-trips."""
    return apply_pipeline(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$project": {
                    "o_orderkey": 1,
                    "q": {"$quarter": "$o_orderdate"},
                    "iw": {"$isoWeek": "$o_orderdate"},
                    "iwy": {"$toInt": {"$isoWeekYear": "$o_orderdate"}},
                    "idw": {"$isoDayOfWeek": "$o_orderdate"},
                    "mstart": {"$dateTrunc": {"date": "$o_orderdate", "unit": "month"}},
                    "qstart": {"$dateTrunc": {"date": "$o_orderdate", "unit": "quarter"}},
                    "wstart": {
                        "$dateTrunc": {
                            "date": "$o_orderdate",
                            "unit": "week",
                            "startOfWeek": "monday",
                        }
                    },
                    "rebuilt": {
                        "$dateFromParts": {
                            "year": {"$year": "$o_orderdate"},
                            "month": {"$month": "$o_orderdate"},
                            "day": {"$dayOfMonth": "$o_orderdate"},
                        }
                    },
                    "pyear": {
                        "$getField": {
                            "input": {"$dateToParts": {"date": "$o_orderdate"}},
                            "field": "year",
                        }
                    },
                    "parsed": {
                        "$dateFromString": {
                            "dateString": {
                                "$dateToString": {"format": "%Y-%m-%d", "date": "$o_orderdate"}
                            },
                            "format": "%Y-%m-%d",
                        }
                    },
                }
            }
        ],
    )

@_q(
    "expr_regex_sets_bytes",
    """
    WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)i(n)g', 0) AS m0,
           regexp_extract(text, '([a-z]+)i(n)g', 1) AS g1,
           coalesce(array_to_string(regexp_extract_all(text, 'th[a-z]+'), ','), '') AS caps,
           list_has_all(toks, ['the']) AS has_the,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           decode(from_hex(substr(hex(encode(text)), 1, 32))) AS head16
    FROM t
    """,
)
def expr_regex_sets_bytes(spark, sf_dir):
    """$regexFind/$regexFindAll, $setIsSubset, $strLenBytes/$substrBytes."""
    df = apply_pipeline(
        _t(spark, sf_dir, "documents"),
        [
            {"$addFields": {"toks": {"$split": ["$text", " "]}}},
            {
                "$project": {
                    "doc_id": 1,
                    "rf": {"$regexFind": {"input": "$text", "regex": "([a-z]+)i(n)g"}},
                    "rfa": {"$regexFindAll": {"input": "$text", "regex": "th[a-z]+"}},
                    "has_the": {"$setIsSubset": [["the"], "$toks"]},
                    "n_bytes": {"$strLenBytes": "$text"},
                    "head16": {"$substrBytes": ["$text", 0, 16]},
                }
            },
        ],
    )
    return df.select(
        "doc_id",
        F.coalesce(F.col("rf.match"), F.lit("")).alias("m0"),
        F.coalesce(F.element_at(F.col("rf.captures"), 1), F.lit("")).alias("g1"),
        F.concat_ws(",", "rfa").alias("caps"),
        "has_the",
        "n_bytes",
        "head16",
    )
