"""Window-function suite + sessionization + as-of join (SURVEY.md §2.2/§2.3).

All tiebreaks are explicit (ts, id) so results are deterministic and
hash-comparable against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_hbase_connector_spark.catalogs import load
from spark_hbase_connector_spark.operators.asof import asof_join
from spark_hbase_connector_spark.operators.gapfill import dense_time_grid
from spark_hbase_connector_spark.queries.registry import query


@query(
    "window_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window", "topn"),
    bench=True,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: the canonical top-k-per-group pattern."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("int").alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
    FROM events
    """,
    tags=("window",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per user over event time."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 4).alias("running_value")
    )


@query(
    "window_lag_delta",
    oracle="""
    SELECT event_id, user_id,
           round(value - lag(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id), 4) AS delta
    FROM events
    """,
    tags=("window",),
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG: per-user change in value between consecutive events."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
    )


@query(
    "window_rank_kinds",
    oracle="""
    SELECT s_suppkey,
           CAST(rank()       OVER (ORDER BY s_acctbal DESC, s_suppkey) AS INTEGER) AS rnk,
           CAST(dense_rank() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS INTEGER) AS drnk,
           CAST(ntile(4)     OVER (ORDER BY s_acctbal DESC, s_suppkey) AS INTEGER) AS quartile
    FROM supplier
    """,
    tags=("window",),
)
def window_rank_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile on one global window."""
    s = load(spark, sf_dir, "supplier")
    w = Window.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return s.select(
        "s_suppkey",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


@query(
    "sessionize_events",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sess AS (
      SELECT user_id, event_id, value,
             CAST(sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, count(*) AS n_events, round(sum(value), 4) AS session_value
    FROM sess GROUP BY user_id, session_id
    """,
    tags=("window", "sessionize"),
    bench=True,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute inactivity gap starts a new session
    (lag + cumulative-sum pattern; single shuffle on user_id). Gap is
    measured in epoch MICROSECONDS — casting a timestamp to long floors
    to whole seconds, which silently shifts the boundary for sub-second
    gaps over the threshold (the `window_trailing_1h` precision trap)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_micros("ts") - F.unix_micros(prev_ts) > 30 * 60 * 1_000_000),
        1,
    ).otherwise(0)
    sess = e.select(
        "user_id",
        "event_id",
        "value",
        F.sum(is_new).over(wsum).cast("bigint").alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


@query(
    "sessionize_events_segmented",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sess AS (
      SELECT user_id, event_id, value,
             CAST(sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, count(*) AS n_events, round(sum(value), 4) AS session_value
    FROM sess GROUP BY user_id, session_id
    """,
    tags=("window", "sessionize", "skew"),
)
def sessionize_events_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sessionize_events`' SKEW-PROOF twin (r5, VERDICT ask #7), same
    oracle: the plain lag+cumsum plan serializes each key's whole
    timeline into one task — a 90%-one-user stream runs on one core no
    matter the cluster. `operators/sessionize.sessionize_segmented` is
    the segmented-scan decomposition: chunk-local sessionize partitioned
    by (key, 6h time chunk) — TIME is the salt, so session contiguity
    survives — then the same gap rule over the sessions-sized summary
    relation stitches chunk boundaries. Output identical by construction
    (boundary cases unit-proven in tests/test_sessionize_segmented.py);
    hot keys spread over n_chunks tasks (90%-one-key stress in
    SCALE.md)."""
    from spark_hbase_connector_spark.operators.sessionize import (
        sessionize_segmented,
    )

    e = load(spark, sf_dir, "events")
    return sessionize_segmented(
        e, gap_seconds=1800, chunk_seconds=21_600
    )


@query(
    "asof_join_events",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           round((SELECT c.value FROM c
                  WHERE c.user_id = p.user_id AND c.ts <= p.ts
                  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1), 4) AS value_asof
    FROM p
    """,
    tags=("join", "asof"),
    bench=True,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase gets the latest prior click value
    for the same user. Single-shuffle union/carry-forward operator
    (operators/asof.py) — no range-join explosion."""
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase")
    clicks = e.where(F.col("event_type") == "click")
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
        tiebreak="event_id",
    )
    return joined.select(
        "event_id", "user_id", F.round(F.col("value_asof"), 4).alias("value_asof")
    )


@query(
    "range_join_windows",
    oracle="""
    WITH win AS (
      SELECT i AS window_id,
             TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (i * 48) HOUR AS w_start,
             TIMESTAMP '2024-01-01 06:00:00' + INTERVAL (i * 48) HOUR AS w_end
      FROM range(0, 15) t(i)
    )
    SELECT w.window_id, count(*) AS n_events,
           CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE) / 100
             AS total_value
    FROM events e JOIN win w ON e.ts >= w.w_start AND e.ts < w.w_end
    GROUP BY w.window_id
    """,
    tags=("join", "range"),
    bench=True,
)
def range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join via the chunked equi-join operator
    (operators/rangejoin.py): events matched to 6-hour maintenance windows
    (every 48h) with zero nested-loop compares — points join on their
    single time chunk, intervals explode to covered chunks only. The
    oracle is the plain inequality join.

    total_value sums EXACT decimals (money rule, CLAUDE.md): each window
    matches ~8e5 events at sf100, enough for double summation-order
    noise to flip round(sum(double), 4)'s last digit between engines —
    caught by the round-7e sf100 sweep."""
    from spark_hbase_connector_spark.operators.rangejoin import range_join

    ev = load(spark, sf_dir, "events")
    i = F.col("id")
    win = spark.range(0, 15).select(
        i.cast("long").alias("window_id"),
        F.expr("timestampadd(HOUR, id * 48, timestamp'2024-01-01 00:00:00')").alias(
            "w_start"
        ),
        F.expr("timestampadd(HOUR, id * 48 + 6, timestamp'2024-01-01 00:00:00')").alias(
            "w_end"
        ),
    )
    joined = range_join(ev, win, "ts", "w_start", "w_end", chunk_seconds=21_600)
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        # money rule: exact cents (q1 recipe) — bit-identical to the r7d
        # decimal sum without the per-row BigDecimal cost
        (
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
            / 100
        ).alias("total_value"),
    )


@query(
    "hypertable_rollup_merge",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS chunk, event_type,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
             AS total
    FROM events GROUP BY 1, 2
    """,
    tags=("rollup", "timeseries"),
)
def hypertable_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate read (operators/rollup.py): daily rollup for
    complete days is MATERIALIZED to chunk-partitioned Parquet; only the
    newest (incomplete) day aggregates from raw events at query time; the
    union equals a direct aggregation — which is what the oracle checks.
    At 100 TB the query scans chunk_count x dims rollup rows plus one day
    of raw data instead of all history."""
    import os

    from spark_hbase_connector_spark.operators.rollup import (
        materialize_rollup,
        rollup_with_tail,
    )

    ev = load(spark, sf_dir, "events")
    # sf-scoped like every other fixture path (`{name}_{sf}`): a shared
    # path let two interpreters at different SFs overwrite each other's
    # rollup mid-read (observed as a transient schema-parity failure when
    # a full sweep and the test suite ran concurrently).
    sf = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(
        os.environ.get("SPARK_GRAFT_TMP", "/tmp"),
        "spark_hbase_connector_fixtures",
        f"events_rollup_{sf}",
    )
    cutoff = materialize_rollup(ev, path, ts_col="ts", dims=["event_type"])
    return rollup_with_tail(
        spark, ev, path, cutoff, ts_col="ts", dims=["event_type"]
    )


@query(
    "gapfill_locf",
    oracle="""
    WITH sub AS (
      SELECT user_id,
             make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS bucket,
             value
      FROM events WHERE user_id < 5
    ),
    agg AS (
      SELECT user_id, bucket, sum(value) AS total,
             CAST(count(*) AS BIGINT) AS n_events
      FROM sub GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
      FROM agg GROUP BY 1
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(lo, hi, INTERVAL 15 MINUTE)) AS bucket
      FROM bounds
    ),
    j AS (
      SELECT g.user_id, g.bucket, a.total, coalesce(a.n_events, 0) AS n_events
      FROM grid g LEFT JOIN agg a USING (user_id, bucket)
    )
    SELECT user_id, bucket AS bucket_start, n_events,
           round(last_value(total IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS filled_total
    FROM j
    """,
    tags=("window", "timeseries", "gapfill"),
)
def gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with last-observation-carried-forward (the
    hypertable `time_bucket_gapfill` + `locf` shape): per-user 15-minute
    value totals on a dense bucket grid, empty buckets emitted with
    n_events=0 and the previous bucket's total carried forward. The grid
    is `sequence(min, max, 15 min)` exploded per key — generated worker-
    side from each key's bounds (two rows per key shuffle, not a
    calendar's worth of driver rows) and guarded by the operator's
    `max_buckets_per_key` cap (a sentinel-timestamp key fails loudly
    instead of OOMing a task); LOCF is one `last(ignorenulls)`
    window over the same user partitioning the aggregation already
    shuffled on."""
    e = load(spark, sf_dir, "events").where(F.col("user_id") < 5)
    bucket = F.expr("timestamp_micros((unix_micros(ts) div 900000000) * 900000000)")
    agg = e.groupBy("user_id", bucket.alias("bucket")).agg(
        F.sum("value").alias("total"), F.count(F.lit(1)).alias("n_events")
    )
    bounds = agg.groupBy("user_id").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = dense_time_grid(bounds, ["user_id"], step_seconds=900)
    j = grid.join(agg, ["user_id", "bucket"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        F.col("bucket").alias("bucket_start"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.round(F.last("total", ignorenulls=True).over(w), 4).alias("filled_total"),
    )


@query(
    "cohort_retention",
    oracle="""
    WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
               FROM events GROUP BY 1),
    act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(day - cohort_day AS INTEGER) AS day_offset,
           CAST(count(DISTINCT act.user_id) AS INTEGER) AS n_users
    FROM act JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("window", "analytics"),
    bench=True,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day, counted
    on each subsequent active day (the product-analytics staple). r10:
    ONE event-sized pass — the cohort day is min(day) over the DISTINCT
    (user, day) activity relation (identical to min over raw events, the
    duplicates it drops cannot change a min), so the former second
    events scan + event-sized shuffle for the first-day aggregate now
    reads the persisted distinct-activity relation (days-per-user sized,
    orders of magnitude below event volume)."""
    e = load(spark, sf_dir, "events")
    act = (
        e.select("user_id", F.to_date("ts").alias("day")).distinct().persist()
    )
    first = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        act.join(first, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").cast("int").alias("n_users"))
    )


@query(
    "funnel_steps",
    oracle="""
    WITH c AS (SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type = 'click' GROUP BY 1),
    v AS (SELECT e.user_id, min(ts) AS t2 FROM events e
          JOIN c ON e.user_id = c.user_id
          WHERE event_type = 'view' AND ts > c.t1 GROUP BY 1),
    p AS (SELECT e.user_id, min(ts) AS t3 FROM events e
          JOIN v ON e.user_id = v.user_id
          WHERE event_type = 'purchase' AND ts > v.t2 GROUP BY 1)
    SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS n_clicked,
           CAST((SELECT count(*) FROM v) AS BIGINT) AS n_viewed_after,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchased_after
    """,
    tags=("window", "analytics"),
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: click -> later view -> later purchase, anchored at
    each user's FIRST qualifying event per stage (min-ts semantics, so a
    user converts once). Each stage is a per-user aggregate joined to the
    previous stage's user-sized relation — event volume is scanned once
    per stage, everything after the first aggregation is user-cardinality;
    at 100 TB the stage relations broadcast."""
    e = load(spark, sf_dir, "events")
    c = e.where(F.col("event_type") == "click").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    v = (
        e.where(F.col("event_type") == "view")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        c.agg(F.count(F.lit(1)).alias("n_clicked"))
        .crossJoin(v.agg(F.count(F.lit(1)).alias("n_viewed_after")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after")))
    )


@query(
    "window_ewma",
    oracle="""
    WITH s AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs
               FROM events GROUP BY 1)
    SELECT user_id,
           round(list_reduce(vs,
                 (acc, v) -> CAST(0.3 AS DOUBLE) * v
                           + CAST(0.7 AS DOUBLE) * acc), 4) AS ewma
    FROM s
    """,
    tags=("window", "timeseries"),
    bench=True,
)
def window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of `value` per user (alpha
    0.3, seeded with the first observation) — the time-series smoothing
    primitive that plain window frames cannot express (each output depends
    recursively on the previous). Expressed as a JVM higher-order FOLD
    over the user's time-sorted value array: one shuffle (groupBy user),
    one linear interpreted pass per group — not the O(n^2) re-evaluation
    trap, since `aggregate` folds a materialized array once. Per-group
    state is the user's event list, the same bound as any
    collect_list-style session feature; DuckDB's list_reduce replays the
    identical double-precision fold order, so values hash-match exactly."""
    e = load(spark, sf_dir, "events")
    arr = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", F.col("value").alias("v")))
    )
    folded = F.expr(
        "round(aggregate(slice(__arr, 2, size(__arr) - 1), __arr[0].v,"
        " (acc, x) -> CAST(0.3 AS DOUBLE) * x.v + CAST(0.7 AS DOUBLE) * acc), 4)"
    )
    return (
        e.groupBy("user_id")
        .agg(arr.alias("__arr"))
        .select("user_id", folded.alias("ewma"))
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
               AS day_value
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, day_value,
           round((day_value - avg(day_value) OVER (PARTITION BY event_type))
                 / stddev(day_value) OVER (PARTITION BY event_type), 4) AS zscore,
           (abs((day_value - avg(day_value) OVER (PARTITION BY event_type))
                / stddev(day_value) OVER (PARTITION BY event_type)) > 2.0)
             AS is_anomaly
    FROM daily
    """,
    tags=("window", "analytics", "timeseries"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly detection per event type: z-score of each day's
    total against that type's distribution, flagging |z| > 2 — the
    monitoring query every event pipeline runs. Event volume collapses to
    (type x day) in one partial-aggregated shuffle; the z-score windows
    run over that tiny relation partitioned by type. Sample stddev on both
    engines (Spark stddev == stddev_samp == DuckDB stddev)."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        # money rule: per-(type, day) sums grow with corpus size — exact
        # fixed-point cents (q1 recipe); downstream avg/stddev/zscore then
        # see identical doubles in both engines
        (
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
            / 100
        ).alias("day_value")
    )
    w = Window.partitionBy("event_type")
    z = (F.col("day_value") - F.avg("day_value").over(w)) / F.stddev("day_value").over(w)
    return daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "day_value",
        F.round(z, 4).alias("zscore"),
        (F.abs(z) > 2.0).alias("is_anomaly"),
    )


@query(
    "window_trailing_1h",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS INTEGER) AS n_trailing_1h,
           round(sum(value) OVER w, 4) AS value_trailing_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "timeseries"),
)
def window_trailing_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing one-hour per-user activity (count + value sum) — the
    RANGE-frame window shape (frame bounded by event-TIME distance, not
    row offsets; ties in the order key share a frame, which ROWS frames
    get wrong). One shuffle on user_id; Spark's rangeBetween needs a
    numeric order key, so both engines order by epoch MICROSECONDS —
    whole seconds (unix_timestamp/epoch) would FLOOR the key and create
    false ties whenever two events share a second, silently changing
    frame membership (found by the full sf0.1 sweep; sub-second
    precision differences between the engines' key functions are a
    classic range-frame trap)."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("int").alias("n_trailing_1h"),
        F.round(F.sum("value").over(w), 4).alias("value_trailing_1h"),
    )


@query(
    "window_time_weighted_avg",
    oracle="""
    WITH ord AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             ts, event_id, value
      FROM events
    ),
    iv AS (
      SELECT event_type, day, value,
             (epoch_us(lead(ts) OVER w) - epoch_us(ts)) / 1000000.0 AS dt
      FROM ord
      WINDOW w AS (PARTITION BY event_type, day ORDER BY ts, event_id)
    )
    SELECT event_type, day,
           round(sum(value * dt) / sum(dt), 4) AS twa,
           CAST(count(*) AS BIGINT) AS n_intervals
    FROM iv WHERE dt IS NOT NULL GROUP BY 1, 2
    """,
    tags=("window", "timeseries"),
)
def window_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (the hypertable `time_weight` shape): each
    observation holds until the next one, so the daily mean weights each
    value by its holding duration — irregular sampling no longer biases
    toward chatty periods. One lead window per (type, day); the final
    aggregation reuses the window's partitioning key, so the plan
    shuffles once."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    iv = (
        e.select("event_type", F.date_trunc("day", "ts").alias("day"), "ts", "event_id", "value")
        .withColumn(
            "dt",
            (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")) / 1000000.0,
        )
        .where(F.col("dt").isNotNull())
    )
    return iv.groupBy("event_type", "day").agg(
        F.round(F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 4).alias("twa"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


@query(
    "events_ohlc_bars",
    oracle="""
    WITH b AS (
      SELECT event_type,
             make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS bucket,
             ts, event_id, value
      FROM events
    ),
    rn AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY ts, event_id) AS ra,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY ts DESC, event_id DESC) AS rd
      FROM b
    )
    SELECT event_type, bucket,
           round(max(CASE WHEN ra = 1 THEN value END), 4) AS open,
           round(max(value), 4) AS high,
           round(min(value), 4) AS low,
           round(max(CASE WHEN rd = 1 THEN value END), 4) AS close,
           CAST(count(*) AS BIGINT) AS n
    FROM rn GROUP BY 1, 2
    """,
    tags=("window", "timeseries"),
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars per (event_type, 15-minute bucket): first /
    max / min / last value. Delegates to the streaming module's
    ``ohlc_window_agg`` — ONE definition of OHLC serves batch and stream
    (commutative min_by/max_by over the (ts, event_id) struct; a single
    partial-aggregatable groupBy, no per-bucket window sorts). The oracle
    replays open/close as row_number extremes over the same total
    order."""
    from spark_hbase_connector_spark.streaming.events import ohlc_window_agg

    e = load(spark, sf_dir, "events")
    return ohlc_window_agg(e, "15 minutes").withColumnRenamed("window_start", "bucket")


@query(
    "window_counter_increase",
    oracle="""
    WITH ord AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             ts, event_id, value
      FROM events
    ),
    d AS (
      SELECT event_type, day,
             value - lag(value) OVER (PARTITION BY event_type, day
                                      ORDER BY ts, event_id) AS delta
      FROM ord
    )
    SELECT event_type, day,
           round(sum(CASE WHEN delta > 0 THEN delta ELSE 0 END), 4) AS increase,
           CAST(count(*) AS BIGINT) AS n_deltas
    FROM d WHERE delta IS NOT NULL GROUP BY 1, 2
    """,
    tags=("window", "timeseries"),
)
def window_counter_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter-style increase per (type, day) — the `counter_agg`/`rate`
    shape: sum of positive consecutive deltas, ignoring resets (negative
    deltas contribute zero). Same single-shuffle lag-window-plus-
    reused-partitioning plan as `window_time_weighted_avg`."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    d = (
        e.select("event_type", F.date_trunc("day", "ts").alias("day"), "ts", "event_id", "value")
        .withColumn("delta", F.col("value") - F.lag("value").over(w))
        .where(F.col("delta").isNotNull())
    )
    return d.groupBy("event_type", "day").agg(
        F.round(
            F.sum(F.when(F.col("delta") > 0, F.col("delta")).otherwise(F.lit(0.0))), 4
        ).alias("increase"),
        F.count(F.lit(1)).alias("n_deltas"),
    )


@query(
    "gapfill_interpolate",
    oracle="""
    WITH sub AS (
      SELECT user_id,
             make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS bucket,
             value
      FROM events WHERE user_id < 5
    ),
    agg AS (
      SELECT user_id, bucket, sum(value) AS total,
             CAST(count(*) AS BIGINT) AS n_events
      FROM sub GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
      FROM agg GROUP BY 1
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(lo, hi, INTERVAL 15 MINUTE)) AS bucket
      FROM bounds
    ),
    j AS (
      SELECT g.user_id, g.bucket, a.total, coalesce(a.n_events, 0) AS n_events
      FROM grid g LEFT JOIN agg a USING (user_id, bucket)
    ),
    ctx AS (
      SELECT user_id, bucket, total, n_events,
             last_value(total IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN total IS NOT NULL THEN bucket END IGNORE NULLS)
               OVER wp AS pb,
             first_value(total IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN total IS NOT NULL THEN bucket END IGNORE NULLS)
               OVER wf AS nb
      FROM j
      WINDOW wp AS (PARTITION BY user_id ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, bucket AS bucket_start, n_events,
           floor((CASE WHEN total IS NOT NULL THEN total
                  ELSE pv + (nv - pv) * (epoch_us(bucket) - epoch_us(pb))
                       / (epoch_us(nb) - epoch_us(pb)) END) * 10000 + 0.5)
             / 10000 AS filled_total
    FROM ctx
    """,
    tags=("window", "timeseries", "gapfill"),
)
def gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling by linear interpolation (the `interpolate` sibling of
    `gapfill_locf`): empty buckets get the time-proportional blend of the
    surrounding observed totals. Same worker-side dense grid; the
    prev/next context is two ignore-nulls windows over the partitioning
    the aggregation already shuffled on. Grid endpoints are observed
    buckets by construction, so interior gaps always have both
    neighbors. Rounding is the explicit floor(x*1e4 + 0.5)/1e4 HALF_UP
    emulation on BOTH engines: 15-minute grids make interpolation
    fractions small rationals (1/2, 1/4, ...), so exact half-boundary
    values are common enough that the engines' native round()
    implementations visibly disagree."""
    e = load(spark, sf_dir, "events").where(F.col("user_id") < 5)
    bucket = F.expr("timestamp_micros((unix_micros(ts) div 900000000) * 900000000)")
    agg = e.groupBy("user_id", bucket.alias("bucket")).agg(
        F.sum("value").alias("total"), F.count(F.lit(1)).alias("n_events")
    )
    bounds = agg.groupBy("user_id").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = dense_time_grid(bounds, ["user_id"], step_seconds=900)
    j = grid.join(agg, ["user_id", "bucket"], "left")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_bucket = F.when(F.col("total").isNotNull(), F.col("bucket"))
    ctx = j.select(
        "user_id",
        "bucket",
        "total",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("total", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_bucket, ignorenulls=True).over(wp).alias("pb"),
        F.first("total", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_bucket, ignorenulls=True).over(wf).alias("nb"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.unix_micros("bucket") - F.unix_micros("pb")
    ) / (F.unix_micros("nb") - F.unix_micros("pb"))
    return ctx.select(
        "user_id",
        F.col("bucket").alias("bucket_start"),
        "n_events",
        (
            F.floor(
                F.when(F.col("total").isNotNull(), F.col("total")).otherwise(interp)
                * 10000
                + 0.5
            )
            / 10000
        ).alias("filled_total"),
    )


@query(
    "window_rolling_median",
    oracle="""
    SELECT event_id, event_type,
           round(quantile_cont(value, 0.5) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS med5
    FROM events
    WHERE user_id < 3
    """,
    tags=("window", "timeseries"),
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over the trailing 5 observations per event type —
    an aggregate-as-window with an explicit ROWS frame (the robust
    smoother percentile dashboards use where EWMA is outlier-sensitive).
    Spark's exact interpolated `percentile` and DuckDB's `quantile_cont`
    share the interpolation formula (verified bit-identical by
    `agg_quantiles`); per-key frames keep window state bounded at 5
    rows."""
    e = load(spark, sf_dir, "events").where(F.col("user_id") < 3)
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return e.select(
        "event_id",
        "event_type",
        F.round(F.expr("percentile(value, 0.5)").over(w), 4).alias("med5"),
    )


@query(
    "asof_join_forward",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT c.event_id, c.user_id,
           round((SELECT p.value FROM p
                  WHERE p.user_id = c.user_id AND p.ts >= c.ts
                  ORDER BY p.ts ASC, p.event_id ASC LIMIT 1), 4)
             AS value_asof
    FROM c
    """,
    tags=("join", "asof"),
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each click gets the value of the next purchase
    at-or-after it for the same user (time-to-conversion attribution
    shape). Same single-shuffle union/carry operator as the backward
    entry, traversed in descending time (`operators/asof.py`
    ``direction="forward"``) — still no range-join explosion."""
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase")
    clicks = e.where(F.col("event_type") == "click")
    joined = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
        tiebreak="event_id",
        direction="forward",
    )
    return joined.select(
        "event_id", "user_id", F.round(F.col("value_asof"), 4).alias("value_asof")
    )


@query(
    "sessionize_dynamic_gap",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_type, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >
                     CASE WHEN event_type = 'click'
                          THEN INTERVAL 10 MINUTE ELSE INTERVAL 30 MINUTE END
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_type, ts, value,
             sum(is_new) OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM gaps
    )
    SELECT user_id, event_type, min(ts) AS session_start,
           count(*) AS n_events, round(sum(value), 4) AS session_value
    FROM sess GROUP BY user_id, event_type, sid
    """,
    tags=("window", "sessionize", "dynamic-gap"),
)
def sessionize_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC-gap sessionization: the inactivity threshold is a per-row
    EXPRESSION (clicks time out after 10 minutes, everything else 30) —
    Spark's ``session_window(ts, gap_expr)`` form, which fixed-gap
    sessionize can't express. Keyed by (user, type), so the oracle
    replays each partition as fixed-gap islands with a CASE gap; the
    same expression drives true per-row gaps when keys mix types.
    Same single-shuffle cost as any keyed session window; merge-at-
    exactly-gap boundary matches the empirically pinned semantics
    (strict > starts a new session, see `streaming_session_windows`)."""
    e = load(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "click", F.lit("10 minutes")).otherwise(
        F.lit("30 minutes")
    )
    return (
        e.groupBy("user_id", "event_type", F.session_window("ts", gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
            F.min("ts").alias("session_start"),
        )
        .select(
            "user_id", "event_type", "session_start", "n_events", "session_value"
        )
    )


@query(
    "events_pattern_3seq",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             lead(event_type, 1) OVER w AS t1,
             lead(event_type, 2) OVER w AS t2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, count(*) AS n_patterns
    FROM seq
    WHERE event_type = 'click' AND t1 = 'click' AND t2 = 'purchase'
    GROUP BY user_id ORDER BY user_id
    """,
    tags=("window", "pattern"),
)
def events_pattern_3seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern detection (the MATCH_RECOGNIZE shape Spark
    lacks natively): click -> click -> purchase as three CONSECUTIVE
    events per user, via lead() over the per-user timeline — fixed-length
    contiguous patterns compile to lead/lag columns on ONE keyed window
    (single shuffle); variable-length patterns (A+ B* C) compile to the
    gaps-and-islands cumulative-sum form `sessionize_events` uses.
    Overlapping matches both count (each position starts its own
    window), matching the oracle's semantics exactly."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    )
    return (
        seq.where(
            (F.col("event_type") == "click")
            & (F.col("t1") == "click")
            & (F.col("t2") == "purchase")
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_patterns"))
        .orderBy("user_id")
    )


@query(
    "events_pattern_runs",
    oracle="""
    WITH flags AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, event_type,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run_id
      FROM flags
    ),
    sized AS (
      SELECT user_id, event_type, run_id, count(*) AS run_len
      FROM runs GROUP BY user_id, event_type, run_id
    )
    SELECT user_id, event_type,
           count(*) AS n_runs, max(run_len) AS longest_run
    FROM sized WHERE run_len >= 3
    GROUP BY user_id, event_type ORDER BY user_id, event_type
    """,
    tags=("window", "pattern", "runs"),
)
def events_pattern_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length pattern detection (the A+ shape): maximal runs of
    >=3 consecutive same-type events per user — run-length encoding via
    gaps-and-islands (break flag -> cumulative run id -> run sizes), the
    compile target promised in `events_pattern_3seq` for unbounded
    patterns. All three windows/aggregations share the per-user key:
    one shuffle."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    brk = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    runs = e.select(
        "user_id", "event_type", F.sum(brk).over(wsum).alias("run_id")
    )
    sized = runs.groupBy("user_id", "event_type", "run_id").agg(
        F.count("*").alias("run_len")
    )
    return (
        sized.where(F.col("run_len") >= 3)
        .groupBy("user_id", "event_type")
        .agg(
            F.count("*").alias("n_runs"), F.max("run_len").alias("longest_run")
        )
        .orderBy("user_id", "event_type")
    )


@query(
    "events_rolling_active_users",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day FROM events
    ),
    du AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      FROM events
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day, count(DISTINCT u.user_id) AS wau
    FROM days d JOIN du u
      ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY 1 ORDER BY 1
    """,
    tags=("window", "distinct", "timeseries"),
)
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) per day — the rolling-DISTINCT
    problem, which no window frame can express exactly (distinct doesn't
    decompose over sliding frames). The scalable exact form: reduce to
    per-day distinct (user, day) pairs FIRST (one shuffle, corpus ->
    day x users), then a day-spine range join fans each day-user row to
    <=7 trailing days before the final distinct count — join volume is
    7 x |daily active|, independent of raw event count. The approximate
    path at extreme scale is per-day HLL sketches union-merged over the
    trailing window (`hll_sketch_union_qa`'s mergeability is exactly
    what enables it). The fan-out is an EXPLODE to the <=7 spine days
    each day-user row contributes to — a pure equi-aggregation, so no
    nested-loop range join ever enters the plan; the semi join against
    the observed day spine drops fanned-out days beyond the data."""
    e = load(spark, sf_dir, "events")
    du = e.select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    fan = du.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias(
            "day"
        ),
        "user_id",
    )
    return (
        fan.join(days, "day", "semi")
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("wau"))
        .orderBy("day")
    )


@query(
    "scd2_build_intervals",
    oracle="""
    SELECT user_id, ts AS valid_from,
           coalesce(lead(ts) OVER w, TIMESTAMP '2100-01-01 00:00:00')
             AS valid_to,
           round(value, 4) AS value,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM events
    WHERE event_type = 'purchase' AND user_id <= 200
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, valid_from
    """,
    tags=("window", "scd2", "cdc"),
)
def scd2_build_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history construction: a change stream (per-user
    purchase values) becomes validity intervals [valid_from, valid_to)
    with an is_current flag — each version closed by its successor's
    timestamp, open tail pinned to a far-future sentinel (2100-01-01 — far enough for the contract, small enough for nanosecond engines: 9999-12-31 overflows int64 nanos). One lead()
    per keyed window = one shuffle; this is the dimension-history build
    step that pairs with the as-of join (`asof_join_events` queries the
    SAME semantics without materializing intervals — materialize when
    many readers share the history, as-of when one does)."""
    e = load(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & (F.col("user_id") <= 200)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        e.select(
            "user_id",
            F.col("ts").alias("valid_from"),
            F.coalesce(nxt, F.lit("2100-01-01 00:00:00").cast("timestamp")).alias(
                "valid_to"
            ),
            F.round("value", 4).alias("value"),
            nxt.isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from")
    )


@query(
    "events_max_concurrency",
    oracle="""
    WITH iv AS (
      SELECT event_type, ts AS s,
             ts + to_minutes(CAST(greatest(1.0, value) AS BIGINT)) AS e
      FROM events WHERE user_id <= 500
    ),
    pts AS (
      SELECT event_type, s AS t, 1 AS delta FROM iv
      UNION ALL
      SELECT event_type, e AS t, -1 AS delta FROM iv
    ),
    run AS (
      SELECT event_type,
             sum(delta) OVER (PARTITION BY event_type
                              ORDER BY t, delta
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS live
      FROM pts
    )
    SELECT event_type, CAST(max(live) AS BIGINT) AS max_concurrent
    FROM run GROUP BY event_type ORDER BY event_type
    """,
    tags=("window", "interval", "sweep"),
)
def events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per type — the interval-overlap sweep: each
    interval (start = ts, end = ts + value minutes) contributes +1/-1
    boundary points; a running sum over the time-ordered points peaks at
    the max overlap. O(n log n) via one keyed window — never the O(n²)
    interval self-join. Boundary ordering puts -1 before +1 at equal
    timestamps (delta ascending), so back-to-back intervals don't count
    as overlapping — the oracle pins that convention."""
    e = load(spark, sf_dir, "events").where(F.col("user_id") <= 500)
    iv = e.select(
        "event_type",
        F.col("ts").alias("s"),
        (
            F.col("ts")
            + F.make_dt_interval(
                F.lit(0), F.lit(0), F.greatest(F.lit(1.0), F.col("value")).cast("bigint").cast("int")
            )
        ).alias("e"),
    )
    pts = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        iv.select("event_type", F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pts.select("event_type", F.sum("delta").over(w).alias("live"))
        .groupBy("event_type")
        .agg(F.max("live").cast("bigint").alias("max_concurrent"))
        .orderBy("event_type")
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    t AS (SELECT src, dst FROM seq WHERE dst IS NOT NULL)
    SELECT src, dst, count(*) AS n,
           round(count(*) * 1.0 /
                 sum(count(*)) OVER (PARTITION BY src), 4) AS p
    FROM t GROUP BY src, dst ORDER BY src, dst
    """,
    tags=("window", "sequence", "markov"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition statistics over per-user event
    sequences: count and conditional probability of each (current ->
    next) event-type pair — the behavioral-model fit that generalizes
    the fixed patterns of `events_pattern_3seq` (any pattern's likelihood
    falls out of this matrix). One keyed window for the successor, one
    5x5-keyed aggregation, and a type-partitioned normalization window
    over the TRANSITION MATRIX (25 rows), never the event stream."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    counts = seq.groupBy("src", "dst").agg(F.count("*").alias("n"))
    wsrc = Window.partitionBy("src")
    return (
        counts.select(
            "src",
            "dst",
            "n",
            F.round(F.col("n") / F.sum("n").over(wsrc), 4).alias("p"),
        )
        .orderBy("src", "dst")
    )


@query(
    "events_gap_percentiles",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) AS gap_us
      FROM events
    ),
    g AS (SELECT event_type, gap_us / 60000000.0 AS gap_min
          FROM gaps WHERE gap_us IS NOT NULL)
    SELECT event_type,
           round(quantile_cont(gap_min, 0.5), 4) AS p50_min,
           round(quantile_cont(gap_min, 0.9), 4) AS p90_min,
           round(quantile_cont(gap_min, 0.99), 4) AS p99_min,
           CAST(count(*) AS BIGINT) AS n_gaps
    FROM g GROUP BY event_type ORDER BY event_type
    """,
    tags=("window", "timeseries", "calibration"),
)
def events_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap distribution per type (P50/P90/P99 minutes) — the
    calibration tool for sessionization: the inactivity threshold should
    sit in the gap distribution's valley, and this is the query that
    finds it (pairs with `sessionize_events` / `sessionize_dynamic_gap`,
    whose 10-vs-30-minute knobs this justifies empirically). One keyed
    lag window + one exact-percentile aggregation, both on the same
    (user, type)-then-type key family."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = e.select(
        "event_type",
        (
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w))
            / 60000000.0
        ).alias("gap_min"),
    ).where(F.col("gap_min").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(gap_min, 0.5)"), 4).alias("p50_min"),
            F.round(F.expr("percentile(gap_min, 0.9)"), 4).alias("p90_min"),
            F.round(F.expr("percentile(gap_min, 0.99)"), 4).alias("p99_min"),
            F.count("*").alias("n_gaps"),
        )
        .orderBy("event_type")
    )
