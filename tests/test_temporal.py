"""Unit semantics for ops.temporal (as-of join, range join, rollup).

The driver-facing oracles (events_asof_join vs DuckDB's native ASOF
JOIN, events_range_join vs a raw inequality join, events_rollup vs
per-resolution GROUP BYs) pin the bulk semantics; these tests pin the
edge cases oracles can miss: boundary inclusivity, ties, tolerance,
empty matches, multi-bucket intervals, and level labeling.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from route81_spark.ops.temporal import asof_join, range_join, rollup_time


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100.0),
            (1, _ts("2024-01-01 10:05:00"), 101.0),
            (1, _ts("2024-01-01 10:10:00"), 102.0),
            (2, _ts("2024-01-01 10:03:00"), 200.0),
        ],
        "key int, ts timestamp, px double",
    )


def test_asof_backward_inclusive(spark, quotes):
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:04:59")),  # after 10:00 quote
            (1, _ts("2024-01-01 10:05:00")),  # ties 10:05 quote -> inclusive
            (1, _ts("2024-01-01 10:20:00")),  # after last quote
            (1, _ts("2024-01-01 09:00:00")),  # before any quote -> null
            (2, _ts("2024-01-01 10:04:00")),  # other key sees only its quotes
        ],
        "key int, ts timestamp",
    )
    out = asof_join(trades, quotes, on="key").orderBy("key", "ts")
    got = [(r["key"], r["px"]) for r in out.collect()]
    assert got == [(1, None), (1, 100.0), (1, 101.0), (1, 102.0), (2, 200.0)]
    # left row count is preserved (left join semantics)
    assert out.count() == trades.count()


def test_asof_tolerance_nulls_stale_matches(spark, quotes):
    trades = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:12:00")), (1, _ts("2024-01-01 10:30:00"))],
        "key int, ts timestamp",
    )
    out = asof_join(trades, quotes, on="key", tolerance_s=300).orderBy("ts")
    got = [r["px"] for r in out.collect()]
    # 10:12 is 2min after the 10:10 quote (in tolerance); 10:30 is 20min (stale)
    assert got == [102.0, None]


def test_asof_renames_colliding_payload(spark, quotes):
    trades = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:06:00"), 5.0)], "key int, ts timestamp, px double"
    )
    out = asof_join(trades, quotes, on="key")
    assert set(out.columns) == {"key", "ts", "px", "ts_r", "px_r"}
    row = out.collect()[0]
    assert row["px"] == 5.0 and row["px_r"] == 101.0
    assert row["ts_r"] == _ts("2024-01-01 10:05:00")


def test_asof_multi_key(spark):
    right = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 00:00:00"), 1.0),
         (1, "b", _ts("2024-01-01 00:00:00"), 2.0)],
        "k1 int, k2 string, ts timestamp, v double",
    )
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 01:00:00")),
         (1, "b", _ts("2024-01-01 01:00:00")),
         (2, "a", _ts("2024-01-01 01:00:00"))],
        "k1 int, k2 string, ts timestamp",
    )
    out = asof_join(left, right, on=["k1", "k2"]).orderBy("k1", "k2")
    assert [r["v"] for r in out.collect()] == [1.0, 2.0, None]


def test_range_join_half_open_boundaries(spark):
    iv = spark.createDataFrame(
        [(10, 1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        "iv_id int, key int, start timestamp, end timestamp",
    )
    pts = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:59:59")),  # before start -> no
            (1, _ts("2024-01-01 10:00:00")),  # == start -> yes (closed)
            (1, _ts("2024-01-01 10:59:59")),  # inside -> yes
            (1, _ts("2024-01-01 11:00:00")),  # == end -> no (open)
            (2, _ts("2024-01-01 10:30:00")),  # wrong key -> no
        ],
        "key int, ts timestamp",
    )
    out = range_join(pts, iv, on="key", bucket_s=600)
    got = sorted(r["ts"] for r in out.collect())
    assert got == [_ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:59:59")]


def test_range_join_long_interval_pairs_once(spark):
    # interval spans many buckets; each qualifying point pairs exactly once
    iv = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"))],
        "iv_id int, key int, start timestamp, end timestamp",
    )
    pts = spark.createDataFrame(
        [(1, _ts(f"2024-01-01 {h:02d}:30:00")) for h in range(24)],
        "key int, ts timestamp",
    )
    out = range_join(pts, iv, on="key", bucket_s=3600)
    assert out.count() == 24
    assert out.select("ts").distinct().count() == 24


def test_range_join_overlapping_intervals_all_match(spark):
    iv = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 12:00:00")),
            (2, 1, _ts("2024-01-01 11:00:00"), _ts("2024-01-01 13:00:00")),
        ],
        "iv_id int, key int, start timestamp, end timestamp",
    )
    pts = spark.createDataFrame(
        [(1, _ts("2024-01-01 11:30:00"))], "key int, ts timestamp"
    )
    out = range_join(pts, iv, on="key", bucket_s=3600)
    assert sorted(r["iv_id"] for r in out.collect()) == [1, 2]


def test_rollup_levels_and_reaggregation(spark):
    df = spark.createDataFrame(
        [
            (_ts("2024-01-01 10:15:00"), 1.0),
            (_ts("2024-01-01 10:45:00"), 2.0),
            (_ts("2024-01-01 11:05:00"), 4.0),
            (_ts("2024-01-02 00:30:00"), 8.0),
            (_ts("2024-02-01 00:00:00"), 16.0),
        ],
        "ts timestamp, value double",
    )
    out = rollup_time(df, "ts", "value")
    rows = {(r["resolution"], r["bucket"]): r for r in out.collect()}
    # hour level
    assert rows[("hour", _ts("2024-01-01 10:00:00"))]["total"] == 3.0
    assert rows[("hour", _ts("2024-01-01 10:00:00"))]["n"] == 2
    # day level re-aggregates hours
    assert rows[("day", _ts("2024-01-01 00:00:00"))]["total"] == 7.0
    # month level re-aggregates days
    assert rows[("month", _ts("2024-01-01 00:00:00"))]["total"] == 15.0
    assert rows[("month", _ts("2024-02-01 00:00:00"))]["n"] == 1
    # avg derived, grand total excluded, no null labels
    assert rows[("day", _ts("2024-01-02 00:00:00"))]["avg"] == 8.0
    assert all(k[0] in ("hour", "day", "month") for k in rows)
    # 4 hours + 3 days + 2 months
    assert len(rows) == 9


def test_rollup_subset_resolutions(spark):
    df = spark.createDataFrame(
        [(_ts("2024-01-01 10:15:00"), 1.0), (_ts("2024-01-01 11:15:00"), 2.0)],
        "ts timestamp, value double",
    )
    out = rollup_time(df, "ts", "value", resolutions=("day", "hour"))
    labels = {r["resolution"] for r in out.collect()}
    assert labels == {"day", "hour"}
    with pytest.raises(ValueError):
        rollup_time(df, "ts", "value", resolutions=("week",))


def test_asof_single_exchange_no_join_node(spark, quotes):
    """Scale pin: the as-of construction is ONE hash shuffle on the key
    plus a window — never an inequality join node."""
    trades = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:04:00"))], "key int, ts timestamp"
    )
    plan = asof_join(trades, quotes, on="key")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_is_equi_join(spark):
    """Scale pin: the bucketed construction must plan a hash/sort-merge
    EQUI-join on (key, bucket), never a nested-loop over the range
    predicate."""
    iv = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        "iv_id int, key int, start timestamp, end timestamp",
    )
    pts = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:30:00"))], "key int, ts timestamp"
    )
    plan = range_join(pts, iv, on="key")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan)


def test_rollup_one_expand_one_shuffle(spark):
    df = spark.range(10).select(
        F.timestamp_seconds(F.col("id") * 3600 + 1_700_000_000).alias("ts"),
        F.col("id").cast("double").alias("value"),
    )
    plan = rollup_time(df, "ts", "value")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    # partial agg before the shuffle collapses the expansion
    assert "partial_" in plan


# ---------------------------------------------------------------------
# Property-based: random feeds vs independent reference implementations
# ---------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_events = st.lists(
    st.tuples(
        st.integers(1, 3),            # key
        st.integers(0, 2000),         # ts (seconds)
        st.booleans(),                # side: left/right
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(evs=_events)
def test_asof_matches_pandas_merge_asof(spark, evs):
    import pandas as pd

    left_rows = [(k, t) for k, t, side in evs if side]
    right_rows = sorted({(k, t) for k, t, side in evs if not side})
    if not left_rows or not right_rows:
        return
    left = spark.createDataFrame(
        [(k, float(t)) for k, t in left_rows], "key int, ts double"
    )
    right = spark.createDataFrame(
        [(k, float(t), float(k * 10000 + t)) for k, t in right_rows],
        "key int, ts double, v double",
    )
    got = sorted(
        (r["key"], r["ts"], r["v"])
        for r in asof_join(left, right, on="key").collect()
    )
    lp = pd.DataFrame(left_rows, columns=["key", "ts"]).astype(float).sort_values("ts")
    rp = (
        pd.DataFrame(
            [(k, t, k * 10000 + t) for k, t in right_rows],
            columns=["key", "ts", "v"],
        )
        .astype(float)
        .sort_values("ts")
    )
    ref = pd.merge_asof(lp, rp, on="ts", by="key", direction="backward")
    want = sorted(
        (int(r.key), float(r.ts), None if pd.isna(r.v) else float(r.v))
        for r in ref.itertuples()
    )
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    pts=st.lists(st.tuples(st.integers(1, 2), st.integers(0, 500)), max_size=30),
    ivs=st.lists(
        st.tuples(st.integers(1, 2), st.integers(0, 500), st.integers(1, 400)),
        max_size=10,
    ),
    bucket=st.integers(7, 120),
)
def test_range_join_matches_bruteforce(spark, pts, ivs, bucket):
    if not pts or not ivs:
        return
    points = spark.createDataFrame(
        [(k, float(t)) for k, t in pts], "key int, ts double"
    )
    intervals = spark.createDataFrame(
        [(i, k, float(s), float(s + ln)) for i, (k, s, ln) in enumerate(ivs)],
        "iv_id int, key int, start double, end double",
    )
    got = sorted(
        (r["iv_id"], r["key"], r["ts"])
        for r in range_join(points, intervals, on="key", bucket_s=bucket).collect()
    )
    want = sorted(
        (i, k, float(t))
        for i, (ik, s, ln) in enumerate(ivs)
        for (k, t) in pts
        if k == ik and s <= t < s + ln
    )
    assert got == want


def test_ntz_timestamps_supported(spark):
    """The raw testdata parquet reads as TIMESTAMP_NTZ, which cannot
    cast to double — the ops must reinterpret via the session zone
    instead of failing analysis."""
    l = spark.sql("select 1 as key, timestamp_ntz'2024-01-01 10:12:00' as ts")
    r = spark.sql(
        "select 1 as key, timestamp_ntz'2024-01-01 10:10:00' as ts, 1.5 as v"
    )
    out = asof_join(l, r, on="key", tolerance_s=300).collect()
    assert out[0]["v"] == 1.5
    stale = asof_join(l, r, on="key", tolerance_s=60).collect()
    assert stale[0]["v"] is None
    iv = spark.sql(
        "select 1 as key, timestamp_ntz'2024-01-01 10:00:00' as start,"
        " timestamp_ntz'2024-01-01 11:00:00' as end"
    )
    assert range_join(l, iv, on="key").count() == 1
    ntz = spark.sql(
        "select timestamp_ntz'2024-01-01 10:30:00' as ts, 2.0 as value"
    )
    assert rollup_time(ntz, "ts", "value").count() == 3


def test_asof_static_matches_window_form(spark, quotes):
    """asof_join_static (broadcast sorted-history probe) must agree
    with the window-based asof_join on the same inputs."""
    from route81_spark.ops.temporal import asof_join_static

    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00")),
            (1, _ts("2024-01-01 10:05:00")),
            (1, _ts("2024-01-01 10:07:00")),
            (2, _ts("2024-01-01 11:00:00")),
            (3, _ts("2024-01-01 11:00:00")),  # key absent from right
        ],
        "key int, ts timestamp",
    )
    a = sorted(
        (r["key"], r["ts"], r["px"], r["ts_r"])
        for r in asof_join(trades, quotes, on="key").collect()
    )
    b = sorted(
        (r["key"], r["ts"], r["px"], r["ts_r"])
        for r in asof_join_static(trades, quotes, on="key").collect()
    )
    assert a == b
    # scale pin: zero Exchange on the left side (broadcast join + probe)
    plan = (
        asof_join_static(trades, quotes, on="key")
        ._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert "BroadcastHashJoin" in plan


def test_asof_static_streams(spark, tmp_path, quotes):
    """The static form must run as a stream-static enrichment."""
    import json

    from route81_spark.ops.temporal import asof_join_static

    src = tmp_path / "asof_src"
    src.mkdir()
    rows = [
        {"key": 1, "ts": "2024-01-01T10:06:00"},
        {"key": 1, "ts": "2024-01-01T09:00:00"},
        {"key": 2, "ts": "2024-01-01T10:04:00"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema("key int, ts timestamp").json(str(src))
    out, ckpt = tmp_path / "asof_out", tmp_path / "asof_ckpt"
    q = (
        asof_join_static(stream, quotes, on="key")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["key"], r["ts"]): r["px"] for r in spark.read.parquet(str(out)).collect()
    }
    assert got[(1, _ts("2024-01-01 10:06:00"))] == 101.0
    assert got[(1, _ts("2024-01-01 09:00:00"))] is None
    assert got[(2, _ts("2024-01-01 10:04:00"))] == 200.0


def test_rollup_per_series(spark):
    df = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 10:15:00"), 1.0),
            ("a", _ts("2024-01-01 11:15:00"), 2.0),
            ("b", _ts("2024-01-01 10:30:00"), 8.0),
        ],
        "series string, ts timestamp, value double",
    )
    out = rollup_time(
        df, "ts", "value", resolutions=("day", "hour"), series_cols=("series",)
    )
    rows = {(r["series"], r["resolution"], r["bucket"]): r for r in out.collect()}
    assert rows[("a", "day", _ts("2024-01-01 00:00:00"))]["total"] == 3.0
    assert rows[("b", "day", _ts("2024-01-01 00:00:00"))]["total"] == 8.0
    assert rows[("a", "hour", _ts("2024-01-01 11:00:00"))]["n"] == 1
    # no series subtotals (null series) and no grand total
    assert all(k[0] in ("a", "b") for k in rows)
    assert len(rows) == 5  # a: 2 hours + 1 day; b: 1 hour + 1 day
    # still one Expand + one shuffle
    plan = (
        out._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Expand") == 1
    assert plan.count("Exchange hashpartitioning") == 1


@settings(max_examples=15, deadline=None)
@given(evs=_events, slice_s=st.integers(5, 500))
def test_asof_sliced_matches_plain(spark, evs, slice_s):
    """The (key, time-slice) segmented-scan form must be row-for-row
    identical to the plain window form across random feeds and slice
    widths (slice boundaries landing anywhere in the data)."""
    from route81_spark.ops.temporal import asof_join_sliced

    left_rows = [(k, t) for k, t, side in evs if side]
    right_rows = sorted({(k, t) for k, t, side in evs if not side})
    if not left_rows or not right_rows:
        return
    left = spark.createDataFrame(
        [(k, float(t)) for k, t in left_rows], "key int, ts double"
    )
    right = spark.createDataFrame(
        [(k, float(t), float(k * 10000 + t)) for k, t in right_rows],
        "key int, ts double, v double",
    )
    plain = sorted(
        (r["key"], r["ts"], r["v"])
        for r in asof_join(left, right, on="key").collect()
    )
    sliced = sorted(
        (r["key"], r["ts"], r["v"])
        for r in asof_join_sliced(left, right, on="key", slice_s=slice_s).collect()
    )
    assert sliced == plain


def test_asof_sliced_partitions_by_slice(spark, quotes):
    """Scale pin: the heavy window must partition by (key, slice) —
    the hot-key parallelism claim — with the per-key pass only over
    slice summaries."""
    from route81_spark.ops.temporal import asof_join_sliced

    trades = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:04:00"))], "key int, ts timestamp"
    )
    plan = (
        asof_join_sliced(trades, quotes, on="key", slice_s=60)
        ._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert "partitionspec=[key#" in plan.replace(" ", "").lower() or "__slice" in plan
    # the in-slice window's partition spec includes the slice column
    import re

    windows = re.findall(r"Window .*?windowspecdefinition\(([^)]*)\)", plan)
    assert any("__slice" in w for w in windows), plan


def test_range_join_stream_static(spark, tmp_path):
    """The bucketed range join is a plain equi-join + filter, so it
    runs stream-static natively: a stream of points against a static
    interval table."""
    import json

    iv = spark.createDataFrame(
        [(7, 1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        "iv_id int, key int, start timestamp, end timestamp",
    )
    src = tmp_path / "rj_src"
    src.mkdir()
    rows = [
        {"key": 1, "ts": "2024-01-01T10:30:00"},   # inside
        {"key": 1, "ts": "2024-01-01T12:00:00"},   # outside
        {"key": 2, "ts": "2024-01-01T10:30:00"},   # wrong key
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema("key int, ts timestamp").json(str(src))
    out, ckpt = tmp_path / "rj_out", tmp_path / "rj_ckpt"
    q = (
        range_join(stream, iv, on="key", bucket_s=600)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(out)).collect()
    assert len(got) == 1 and got[0]["iv_id"] == 7
    assert got[0]["ts"] == _ts("2024-01-01 10:30:00")


def test_funnel_order_matters(spark):
    from route81_spark.ops.temporal import funnel_counts

    ev = spark.createDataFrame(
        [
            # u1 completes in order
            (1, "a", _ts("2024-01-01 10:00:00")),
            (1, "b", _ts("2024-01-01 11:00:00")),
            (1, "c", _ts("2024-01-01 12:00:00")),
            # u2 does b BEFORE a: b must not count
            (2, "b", _ts("2024-01-01 09:00:00")),
            (2, "a", _ts("2024-01-01 10:00:00")),
            # u3 stops after a
            (3, "a", _ts("2024-01-01 10:00:00")),
        ],
        "user_id long, event_type string, ts timestamp",
    )
    out = {r["step_name"]: r["n_users"] for r in
           funnel_counts(ev, ["a", "b", "c"]).collect()}
    assert out == {"a": 3, "b": 1, "c": 1}
    # same-timestamp step events count (at-or-after semantics)
    tie = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 10:00:00")), (1, "b", _ts("2024-01-01 10:00:00"))],
        "user_id long, event_type string, ts timestamp",
    )
    out2 = {r["step_name"]: r["n_users"] for r in
            funnel_counts(tie, ["a", "b"]).collect()}
    assert out2 == {"a": 1, "b": 1}


def test_retention_cohorts_basics(spark):
    from route81_spark.ops.temporal import retention_cohorts

    day = 86400
    ev = spark.createDataFrame(
        [
            # cohort P0: users 1,2. User 1 returns in P1; user 2 doesn't.
            (1, _ts("1970-01-02 00:00:00")),
            (2, _ts("1970-01-03 00:00:00")),
            (1, _ts("1970-01-09 00:00:00")),
            # cohort P1: user 3 only
            (3, _ts("1970-01-10 00:00:00")),
        ],
        "user_id long, ts timestamp",
    )
    out = {(r["cohort"], r["offset"]): (r["n_active"], r["n_cohort"], r["retention"])
           for r in retention_cohorts(ev, period_s=7 * day).collect()}
    p0 = _ts("1970-01-01 00:00:00")
    p1 = _ts("1970-01-08 00:00:00")
    assert out[(p0, 0)] == (2, 2, 1.0)
    assert out[(p0, 1)] == (1, 2, 0.5)
    assert out[(p1, 0)] == (1, 1, 1.0)
    assert len(out) == 3


def test_rolling_zscore_flags_spike(spark):
    from route81_spark.ops.temporal import rolling_zscore_anomalies

    rows = [(1, _ts(f"2024-01-01 00:{m:02d}:00"), 10.0 + (m % 2)) for m in range(9)]
    rows.append((1, _ts("2024-01-01 00:09:00"), 100.0))  # spike
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    import pytest as pt

    with pt.raises(ValueError, match="order_tiebreak"):
        rolling_zscore_anomalies(df)  # determinism contract: tiebreak required
    out = {r["ts"]: r for r in
           rolling_zscore_anomalies(df, order_tiebreak="value").collect()}
    spike = out[_ts("2024-01-01 00:09:00")]
    assert spike["is_anomaly"] and spike["z"] > 2
    # steady rows are not anomalous; early short-window rows have null z
    assert not out[_ts("2024-01-01 00:05:00")]["is_anomaly"]
    assert out[_ts("2024-01-01 00:01:00")]["z"] is None  # window < min_n
    # flat series: std ~ 0 -> null z, never a divide-by-zero
    flat = spark.createDataFrame(
        [(1, _ts(f"2024-01-01 00:{m:02d}:00"), 5.0) for m in range(8)],
        "user_id long, ts timestamp, value double",
    )
    fo = rolling_zscore_anomalies(flat, order_tiebreak="value").collect()
    assert all(r["z"] is None and not r["is_anomaly"] for r in fo)


def test_funnel_latency_values(spark):
    from route81_spark.ops.temporal import funnel_latency

    ev = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 10:00:00")),
            (1, "b", _ts("2024-01-01 10:00:30")),   # 30s
            (2, "a", _ts("2024-01-01 10:00:00")),
            (2, "b", _ts("2024-01-01 10:01:30")),   # 90s
            (3, "a", _ts("2024-01-01 10:00:00")),   # never reaches b
        ],
        "user_id long, event_type string, ts timestamp",
    )
    out = {r["step_name"]: r for r in funnel_latency(ev, ["a", "b"]).collect()}
    b = out["b"]
    assert b["n_users"] == 2
    assert b["p50_s"] == 60.0   # interpolated median of {30, 90}
    assert abs(b["p90_s"] - 84.0) < 1e-6


def test_funnel_single_job(spark, monkeypatch):
    """Both funnel entry points must aggregate all steps in ONE Spark
    action (tagged union over the persisted levels), not one action per
    step — a long funnel used to pay k sequential scheduler
    round-trips. (AQE splits one action into several jobs, so count
    actions at the API layer, not job ids.)"""
    # patch the concrete class — pyspark.sql.DataFrame is an abstract
    # facade in Spark 4; instances are the classic implementation
    from pyspark.sql.classic.dataframe import DataFrame

    from route81_spark.ops.temporal import funnel_counts, funnel_latency

    steps = ["a", "b", "c", "d"]
    ev = spark.createDataFrame(
        [
            (u, s, _ts(f"2024-01-01 10:0{i}:00"))
            for u in (1, 2, 3)
            for i, s in enumerate(steps)
        ],
        "user_id long, event_type string, ts timestamp",
    )
    actions = {"n": 0}
    for name in ("collect", "count", "first", "take", "head"):
        orig = getattr(DataFrame, name)

        def wrapped(self, *a, _orig=orig, **kw):
            actions["n"] += 1
            return _orig(self, *a, **kw)

        monkeypatch.setattr(DataFrame, name, wrapped)
    for fn in (funnel_counts, funnel_latency):
        actions["n"] = 0
        res = fn(ev, steps).collect()
        assert len(res) >= len(steps) - 1
        # 1 internal action + the test's own .collect() on the result
        assert actions["n"] == 2, (fn.__name__, actions["n"])
    # counts stay correct with unreached steps (zero-filled rows)
    short = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 10:00:00"))],
        "user_id long, event_type string, ts timestamp",
    )
    out = {r["step_name"]: r["n_users"] for r in funnel_counts(short, steps).collect()}
    assert out == {"a": 1, "b": 0, "c": 0, "d": 0}
    lat = {r["step_name"]: r for r in funnel_latency(short, steps).collect()}
    assert lat["b"]["n_users"] == 0 and lat["b"]["p50_s"] is None


_funnel_events = st.lists(
    st.tuples(
        st.integers(1, 4),            # user
        st.sampled_from(["a", "b", "c"]),
        st.integers(0, 100),          # ts seconds
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=15, deadline=None)
@given(evs=_funnel_events)
def test_funnel_matches_python_replay(spark, evs):
    from route81_spark.ops.temporal import funnel_counts

    df = spark.createDataFrame(
        [(u, t, float(s)) for u, t, s in evs],
        "user_id long, event_type string, ts double",
    )
    got = {r["step_name"]: r["n_users"] for r in
           funnel_counts(df, ["a", "b", "c"], ts_col="ts").collect()}

    # reference replay: reach[i] = earliest step-i event at-or-after reach[i-1]
    by_user: dict = {}
    for u, t, s in evs:
        by_user.setdefault(u, []).append((s, t))
    want = {"a": 0, "b": 0, "c": 0}
    for u, items in by_user.items():
        prev = None
        for step in ["a", "b", "c"]:
            cand = [s for s, t in items if t == step and (prev is None or s >= prev)]
            if not cand:
                break
            prev = min(cand)
            want[step] += 1
    assert got == want


@settings(max_examples=15, deadline=None)
@given(evs=_funnel_events)
def test_transitions_match_python_replay(spark, evs):
    """Per-user time-ordered next-event pairs; a synthetic unique seq
    breaks ts ties identically in both implementations."""
    from route81_spark.ops.temporal import transition_counts

    rows = [(u, t, float(s), i) for i, (u, t, s) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts double, event_id long"
    )
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in transition_counts(df).collect()
    }
    by_user: dict = {}
    for u, t, s, i in rows:
        by_user.setdefault(u, []).append((s, i, t))
    want: dict = {}
    for items in by_user.values():
        items.sort()
        for cur, nxt in zip(items, items[1:]):
            key = (cur[2], nxt[2])
            want[key] = want.get(key, 0) + 1
    assert got == want
