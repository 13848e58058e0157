"""Hand-computed expectations for the time-series query semantics.

The DuckDB differential proves Spark and the oracle agree — but both
sides were written from the same reading of the semantics, so a shared
misconception would pass it. These tests pin the SEMANTICS against
numbers worked out by hand on tiny crafted inputs.

Each test registers a temp view named like the real table and runs the
registry query's logic inline on it (the registry fns are bound to
`load(...)`, so the crafted frames exercise the same expressions via
copy-paste-free helpers where the operator exists, else via SQL).
"""

import datetime as dt

from pyspark.sql import Row, Window
from pyspark.sql import functions as F


def _t(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_time_weighted_avg_hand_computed(spark):
    """Events at t=0 (v=10), t=10min (v=20), t=30min (v=40):
    intervals are 600s@10 and 1200s@20 -> TWA = (6000+24000)/1800 = 16.6667;
    the final observation contributes no interval."""
    e = spark.createDataFrame(
        [
            Row(event_type="a", ts=_t(0), event_id=1, value=10.0),
            Row(event_type="a", ts=_t(10), event_id=2, value=20.0),
            Row(event_type="a", ts=_t(30), event_id=3, value=40.0),
        ]
    )
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    iv = (
        e.select("event_type", F.date_trunc("day", "ts").alias("day"), "ts", "event_id", "value")
        .withColumn(
            "dt",
            (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")) / 1000000.0,
        )
        .where(F.col("dt").isNotNull())
    )
    out = iv.groupBy("event_type", "day").agg(
        F.round(F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 4).alias("twa"),
        F.count(F.lit(1)).alias("n_intervals"),
    ).collect()
    assert len(out) == 1
    assert out[0].twa == 16.6667
    assert out[0].n_intervals == 2


def test_counter_increase_ignores_resets(spark):
    """10 -> 25 (+15) -> 5 (reset, +0) -> 12 (+7): increase = 22."""
    e = spark.createDataFrame(
        [
            Row(event_type="a", ts=_t(0), event_id=1, value=10.0),
            Row(event_type="a", ts=_t(1), event_id=2, value=25.0),
            Row(event_type="a", ts=_t(2), event_id=3, value=5.0),
            Row(event_type="a", ts=_t(3), event_id=4, value=12.0),
        ]
    )
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    d = (
        e.select("event_type", F.date_trunc("day", "ts").alias("day"), "ts", "event_id", "value")
        .withColumn("delta", F.col("value") - F.lag("value").over(w))
        .where(F.col("delta").isNotNull())
    )
    out = d.groupBy("event_type", "day").agg(
        F.round(
            F.sum(F.when(F.col("delta") > 0, F.col("delta")).otherwise(F.lit(0.0))), 4
        ).alias("increase"),
        F.count(F.lit(1)).alias("n_deltas"),
    ).collect()
    assert out[0].increase == 22.0
    assert out[0].n_deltas == 3


def test_linear_interpolation_hand_computed(spark):
    """Observed buckets at 0:00 (total 10) and 0:45 (total 40) with two
    missing 15-min buckets between: interpolation gives 20 and 30."""
    j = spark.createDataFrame(
        [
            Row(user_id=1, bucket=_t(0), total=10.0, n_events=1),
            Row(user_id=1, bucket=_t(15), total=None, n_events=0),
            Row(user_id=1, bucket=_t(30), total=None, n_events=0),
            Row(user_id=1, bucket=_t(45), total=40.0, n_events=2),
        ]
    )
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
        F.last("total", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_bucket, ignorenulls=True).over(wp).alias("pb"),
        F.first("total", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_bucket, ignorenulls=True).over(wf).alias("nb"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.unix_micros("bucket") - F.unix_micros("pb")
    ) / (F.unix_micros("nb") - F.unix_micros("pb"))
    out = {
        r.bucket: r.filled
        for r in ctx.select(
            "bucket",
            (
                F.floor(
                    F.when(F.col("total").isNotNull(), F.col("total")).otherwise(interp)
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("filled"),
        ).collect()
    }
    assert out == {_t(0): 10.0, _t(15): 20.0, _t(30): 30.0, _t(45): 40.0}


def test_ohlc_open_close_respect_time_order_not_value(spark):
    """Within one bucket: values arrive 30 (t=1), 5 (t=2), 99 (t=3) ->
    open=30, close=99, high=99, low=5 — open/close are TIME extremes."""
    from spark_hbase_connector_spark.streaming.events import ohlc_window_agg

    e = spark.createDataFrame(
        [
            Row(event_type="a", ts=_t(1), event_id=1, value=30.0),
            Row(event_type="a", ts=_t(2), event_id=2, value=5.0),
            Row(event_type="a", ts=_t(3), event_id=3, value=99.0),
        ]
    )
    # batch DataFrame through the same agg the stream uses (aggregation
    # logic is identical; only the source differs)
    out = ohlc_window_agg(e, "15 minutes").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.open, r.high, r.low, r.close, r.n) == (30.0, 99.0, 5.0, 99.0, 3)


def test_ohlc_tiebreak_on_equal_ts(spark):
    """Two rows at the SAME timestamp: event_id breaks the tie for both
    open (lowest id) and close (highest id)."""
    from spark_hbase_connector_spark.streaming.events import ohlc_window_agg

    e = spark.createDataFrame(
        [
            Row(event_type="a", ts=_t(1), event_id=2, value=7.0),
            Row(event_type="a", ts=_t(1), event_id=1, value=3.0),
        ]
    )
    r = ohlc_window_agg(e, "15 minutes").collect()[0]
    assert (r.open, r.close) == (3.0, 7.0)
