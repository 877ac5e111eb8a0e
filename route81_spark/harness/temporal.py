"""Event-time queries over the events table: as-of and range joins, sessionization, funnels, retention, rollups, anomalies, Z-order layout."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from route81_spark.ops.layout import morton_sql
from route81_spark.ops.util import det_round_sql
from ._shared import _q, _t

@_q(
    "events_sessionize",
    f"""
    WITH o AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                  OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w
                     >= INTERVAL 30 MINUTES
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), value)
    ),
    s AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, value
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           epoch_us(min(ts)) AS start_us,
           epoch_us(max(ts) + INTERVAL 30 MINUTES) AS end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           {det_round_sql("sum(value)", 4)} AS total_value
    FROM s GROUP BY user_id, sid
    """,
)
def events_sessionize(spark, sf_dir):
    # gap-and-island sessions per user: the oracle re-derives Spark's
    # session_window semantics (new session iff inter-event gap >= 30m;
    # session end = last event + gap)
    from route81_spark.ops.streaming import sessionize

    return sessionize(_t(spark, sf_dir, "events"), gap="30 minutes")

@_q(
    "events_asof_join",
    f"""
    WITH c AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             max(event_id) AS p_event_id,
             arg_max(value, event_id) AS p_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
           p.p_event_id AS p_event_id,
           {det_round_sql('p.p_value', 4)} AS p_value
    FROM c ASOF LEFT JOIN p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def events_asof_join(spark, sf_dir):
    """As-of join (pandas merge_asof 'backward', DuckDB ASOF JOIN):
    each click picks up the user's most recent purchase at-or-before
    it. Spark has no ASOF JOIN; ops.temporal.asof_join is the
    union-tag + running-last-value construction — ONE hash shuffle on
    user_id, no inequality join (the oracle IS a native ASOF JOIN, so
    the semantics are checked against a real implementation)."""
    from route81_spark.ops.temporal import asof_join
    from route81_spark.ops.util import det_round

    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    # right side unique per (user_id, ts): asof_join's determinism contract
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("p_event_id"),
            F.max_by("value", "event_id").alias("p_value"),
        )
    )
    j = asof_join(clicks, purchases, on="user_id", left_ts="ts", right_ts="ts")
    return j.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "p_event_id",
        det_round(F.col("p_value"), 4).alias("p_value"),
    )

@_q(
    "events_asof_static",
    f"""
    WITH c AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             max(event_id) AS p_event_id,
             arg_max(value, event_id) AS p_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
           p.p_event_id AS p_event_id,
           {det_round_sql('p.p_value', 4)} AS p_value
    FROM c ASOF LEFT JOIN p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def events_asof_static(spark, sf_dir):
    """The broadcast sorted-history as-of construction
    (ops.temporal.asof_join_static — zero left-side shuffle, legal on
    streams) against the same DuckDB native ASOF JOIN oracle as the
    window form: both constructions value-checked to the same
    semantics."""
    from route81_spark.ops.temporal import asof_join_static
    from route81_spark.ops.util import det_round

    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("p_event_id"),
            F.max_by("value", "event_id").alias("p_value"),
        )
    )
    j = asof_join_static(clicks, purchases, on="user_id")
    return j.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "p_event_id",
        det_round(F.col("p_value"), 4).alias("p_value"),
    )

@_q(
    "events_asof_sliced",
    f"""
    WITH c AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             max(event_id) AS p_event_id,
             arg_max(value, event_id) AS p_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
           p.p_event_id AS p_event_id,
           {det_round_sql('p.p_value', 4)} AS p_value
    FROM c ASOF LEFT JOIN p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def events_asof_sliced(spark, sf_dir):
    """The hot-key as-of construction (ops.temporal.asof_join_sliced —
    heavy scan partitioned by (key, day-slice), per-key stitch over
    slice summaries only) against the same native ASOF JOIN oracle:
    all three as-of constructions value-checked to one semantics."""
    from route81_spark.ops.temporal import asof_join_sliced
    from route81_spark.ops.util import det_round

    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("p_event_id"),
            F.max_by("value", "event_id").alias("p_value"),
        )
    )
    j = asof_join_sliced(clicks, purchases, on="user_id", slice_s=86400)
    return j.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "p_event_id",
        det_round(F.col("p_value"), 4).alias("p_value"),
    )

@_q(
    "events_funnel",
    """
    WITH u1 AS (
      SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    u2 AS (
      SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t
      FROM events e JOIN u1 ON e.user_id = u1.user_id
      WHERE e.event_type = 'view' AND CAST(e.ts AS TIMESTAMP) >= u1.t
      GROUP BY 1
    ),
    u3 AS (
      SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t
      FROM events e JOIN u2 ON e.user_id = u2.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= u2.t
      GROUP BY 1
    )
    SELECT 1 AS step, 'signup' AS step_name,
           CAST((SELECT count(*) FROM u1) AS BIGINT) AS n_users
    UNION ALL
    SELECT 2, 'view', CAST((SELECT count(*) FROM u2) AS BIGINT)
    UNION ALL
    SELECT 3, 'purchase', CAST((SELECT count(*) FROM u3) AS BIGINT)
    """,
)
def events_funnel(spark, sf_dir):
    """Ordered funnel (signup -> view -> purchase): users counted at
    each step only if reached IN ORDER (earliest step event at-or-
    after the previous step's reach time). One filtered user-level
    min-agg per step; the event log never self-joins at event
    granularity."""
    from route81_spark.ops.temporal import funnel_counts

    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return funnel_counts(ev, ["signup", "view", "purchase"])

@_q(
    "events_retention",
    f"""
    WITH a AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 604800.0) AS BIGINT) AS p
      FROM events
    ),
    f AS (SELECT user_id, min(p) AS cohort FROM a GROUP BY 1),
    sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_cohort FROM f GROUP BY 1),
    cell AS (
      SELECT f.cohort, a.p - f.cohort AS "offset",
             CAST(count(*) AS BIGINT) AS n_active
      FROM a JOIN f USING (user_id) GROUP BY 1, 2
    )
    SELECT epoch_us(to_timestamp(cell.cohort * 604800)) AS cohort_us,
           cell."offset", cell.n_active, sz.n_cohort,
           {det_round_sql('cell.n_active / CAST(sz.n_cohort AS DOUBLE)', 4)} AS retention
    FROM cell JOIN sz USING (cohort)
    """,
)
def events_retention(spark, sf_dir):
    """Weekly cohort retention: users bucketed by first-activity week;
    per (cohort, week offset) the active count and share. User-level
    tables throughout — one distinct agg over the log, then tiny
    cohort-level joins."""
    from route81_spark.ops.temporal import retention_cohorts

    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    r = retention_cohorts(ev)
    return r.select(
        F.unix_micros(F.col("cohort")).alias("cohort_us"),
        "offset",
        "n_active",
        "n_cohort",
        "retention",
    )

@_q(
    "events_anomaly",
    f"""
    WITH s AS (
      SELECT event_id, user_id, value,
             count(*) OVER w AS roll_n,
             avg(value) OVER w AS m,
             stddev_samp(value) OVER w AS sd
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, CAST(roll_n AS BIGINT) AS roll_n,
           {det_round_sql("CASE WHEN roll_n >= 5 AND sd IS NOT NULL AND sd > 1e-9 THEN (value - m) / sd END", 4)} AS z,
           coalesce(abs(CASE WHEN roll_n >= 5 AND sd IS NOT NULL AND sd > 1e-9
                             THEN (value - m) / sd END) > 2.0, FALSE) AS is_anomaly
    FROM s
    """,
)
def events_anomaly(spark, sf_dir):
    """Rolling z-score anomaly flags per user (trailing 10-event
    window, |z| > 2, min 5 events): one shuffle on the series key,
    bounded rows-window state — the standard cheap metric-stream
    change detector."""
    from route81_spark.ops.temporal import rolling_zscore_anomalies

    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = rolling_zscore_anomalies(ev, order_tiebreak="event_id")
    return out.select("event_id", "roll_n", "z", "is_anomaly")

@_q(
    "events_cooccurrence",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_users
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
)
def events_cooccurrence(spark, sf_dir):
    """Market-basket co-occurrence: for each unordered pair of event
    types, how many users performed both. The (user, type) DISTINCT
    projection collapses the event log first, so the self-join runs at
    |users| x |types-per-user| granularity — never event granularity —
    and the pair space is bounded by the (small) type vocabulary."""
    ev = _t(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    a = ut.alias("a")
    b = ut.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )

@_q(
    "events_funnel_latency",
    f"""
    WITH u1 AS (
      SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    u2 AS (
      SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t
      FROM events e JOIN u1 ON e.user_id = u1.user_id
      WHERE e.event_type = 'view' AND CAST(e.ts AS TIMESTAMP) >= u1.t
      GROUP BY 1
    ),
    u3 AS (
      SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t
      FROM events e JOIN u2 ON e.user_id = u2.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= u2.t
      GROUP BY 1
    ),
    d2 AS (
      SELECT epoch(u2.t) - epoch(u1.t) AS d
      FROM u2 JOIN u1 USING (user_id)
    ),
    d3 AS (
      SELECT epoch(u3.t) - epoch(u2.t) AS d
      FROM u3 JOIN u2 USING (user_id)
    )
    SELECT 2 AS step, 'view' AS step_name,
           CAST((SELECT count(*) FROM d2) AS BIGINT) AS n_users,
           {det_round_sql('(SELECT quantile_cont(d, 0.5) FROM d2)', 4)} AS p50_s,
           {det_round_sql('(SELECT quantile_cont(d, 0.9) FROM d2)', 4)} AS p90_s
    UNION ALL
    SELECT 3, 'purchase',
           CAST((SELECT count(*) FROM d3) AS BIGINT),
           {det_round_sql('(SELECT quantile_cont(d, 0.5) FROM d3)', 4)},
           {det_round_sql('(SELECT quantile_cont(d, 0.9) FROM d3)', 4)}
    """,
)
def events_funnel_latency(spark, sf_dir):
    """Funnel step latency: median / p90 seconds between consecutive
    reach times (funnel_counts semantics) per transition — exact
    interpolated percentiles over user-level tables."""
    from route81_spark.ops.temporal import funnel_latency

    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return funnel_latency(ev, ["signup", "view", "purchase"])

@_q(
    "events_transitions",
    """
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                  ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(count(*) AS BIGINT) AS n
    FROM o WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def events_transitions(spark, sf_dir):
    """First-order (Markov) transition counts: for each user's
    time-ordered event sequence, count (current type -> next type)
    pairs — the behavioral-flow matrix behind sankeys and next-action
    models. One lead() window shuffle on the user key + a tiny
    type-pair aggregation; deterministic via the event_id tiebreak."""
    from route81_spark.ops.temporal import transition_counts

    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return transition_counts(ev)

@_q(
    "events_range_join",
    f"""
    WITH p AS (
      SELECT event_id AS p_id, user_id, CAST(ts AS TIMESTAMP) AS s
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'click'
    )
    SELECT p.p_id, p.user_id, CAST(count(*) AS BIGINT) AS n_clicks,
           {det_round_sql('sum(c.value)', 4)} AS click_value
    FROM p JOIN c
      ON p.user_id = c.user_id
     AND c.ts >= p.s AND c.ts < p.s + INTERVAL 30 MINUTES
    GROUP BY 1, 2
    """,
)
def events_range_join(spark, sf_dir):
    """Interval (range) join via time-bucketing: clicks landing in the
    30-minute window after each purchase, aggregated per purchase. A
    raw range predicate would plan a BroadcastNestedLoopJoin
    (O(n x m)); ops.temporal.range_join explodes each interval to its
    covered fixed-width buckets and equi-joins on (user_id, bucket),
    then refines — linear shuffle, pair produced exactly once."""
    from route81_spark.ops.temporal import range_join
    from route81_spark.ops.util import det_round

    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    iv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    pairs = range_join(
        clicks, iv, on="user_id", point_ts="ts",
        start_col="start", end_col="end", bucket_s=1800,
    )
    return pairs.groupBy("p_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        det_round(F.sum("value"), 4).alias("click_value"),
    )

@_q(
    "events_rollup",
    f"""
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events)
    SELECT 'hour' AS resolution, epoch_us(date_trunc('hour', ts)) AS bucket_us,
           CAST(count(*) AS BIGINT) AS n,
           {det_round_sql('sum(value)', 4)} AS total,
           {det_round_sql('sum(value) / count(*)', 4)} AS avg
    FROM e GROUP BY 2
    UNION ALL
    SELECT 'day', epoch_us(date_trunc('day', ts)),
           CAST(count(*) AS BIGINT),
           {det_round_sql('sum(value)', 4)},
           {det_round_sql('sum(value) / count(*)', 4)}
    FROM e GROUP BY 2
    UNION ALL
    SELECT 'month', epoch_us(date_trunc('month', ts)),
           CAST(count(*) AS BIGINT),
           {det_round_sql('sum(value)', 4)},
           {det_round_sql('sum(value) / count(*)', 4)}
    FROM e GROUP BY 2
    """,
)
def events_rollup(spark, sf_dir):
    """Hypertable-style hour/day/month rollup in ONE scan + ONE shuffle
    (rollup() = Expand + partial hash agg; map-side combine collapses
    the 4x expansion before the Exchange). Re-aggregable stats only;
    avg derived at the end — the continuous-aggregate contract."""
    from route81_spark.ops.temporal import rollup_time
    from route81_spark.ops.util import det_round

    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    r = rollup_time(ev, "ts", "value", resolutions=("hour", "day", "month"))
    return r.select(
        "resolution",
        F.unix_micros(F.col("bucket")).alias("bucket_us"),
        "n",
        det_round(F.col("total"), 4).alias("total"),
        det_round(F.col("avg"), 4).alias("avg"),
    )

@_q(
    "events_rollup_series",
    f"""
    WITH e AS (
      SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    )
    SELECT event_type, 'day' AS resolution,
           epoch_us(date_trunc('day', ts)) AS bucket_us,
           CAST(count(*) AS BIGINT) AS n,
           {det_round_sql('sum(value)', 4)} AS total
    FROM e GROUP BY 1, 3
    UNION ALL
    SELECT event_type, 'month', epoch_us(date_trunc('month', ts)),
           CAST(count(*) AS BIGINT),
           {det_round_sql('sum(value)', 4)}
    FROM e GROUP BY 1, 3
    """,
)
def events_rollup_series(spark, sf_dir):
    """Per-series rollup (the timeseries-DB continuous-aggregate
    shape): day/month buckets per event_type in one Expand shuffle;
    series subtotals and the grand total excluded by grouping_id."""
    from route81_spark.ops.temporal import rollup_time
    from route81_spark.ops.util import det_round

    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    r = rollup_time(
        ev, "ts", "value", resolutions=("day", "month"),
        series_cols=("event_type",),
    )
    return r.select(
        "event_type",
        "resolution",
        F.unix_micros(F.col("bucket")).alias("bucket_us"),
        "n",
        det_round(F.col("total"), 4).alias("total"),
    )

_Z_RANGES = [(0.0, 2048.0), (0.0, 1024.0)]

@_q(
    "events_zorder",
    f"""
    SELECT event_id, user_id,
           {morton_sql(['user_id', 'value'], _Z_RANGES)} AS z
    FROM events
    """,
)
def events_zorder(spark, sf_dir):
    """Z-order (Morton) clustering key over (user_id, value): the
    layout key OPTIMIZE ... ZORDER BY computes, as a pure Column
    program over fixed ranges — bucket each dimension to 8 bits,
    interleave. The oracle replays the identical arithmetic with SQL
    bit ops, so bucketing, clamping, and interleaving are all
    value-checked. ops.layout.zorder_layout uses this key to write
    files whose min/max boxes are tight in both dimensions (parquet
    row-group pruning on either column)."""
    from route81_spark.ops.layout import morton_code

    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        morton_code([F.col("user_id"), F.col("value")], _Z_RANGES).alias("z"),
    )
