"""Streaming delivery-semantics tests (the batch-equivalence of every
streaming query is covered by the oracle differential; these cover the
sink/checkpoint contract instead)."""

from spark_hbase_connector_spark.streaming.events import events_stream

SF = "/root/testdata/sf0.001"


def test_stateful_query_on_rocksdb_state_store(spark):
    """The keyed-state operators must run unchanged on the RocksDB state
    store provider — the bounded-memory state backend a 100 TB streaming
    deployment uses (per-key state lives in per-partition RocksDB
    instances on local disk + changelog in the checkpoint, instead of the
    default HDFS-backed in-memory map). Same processor, same results:
    the per-user running totals on RocksDB equal the default-provider
    output row-for-row."""
    import uuid

    from spark_hbase_connector_spark.streaming.events import (
        running_totals_stateful,
    )

    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key)

    def run(provider):
        if provider:
            spark.conf.set(conf_key, provider)
        else:
            spark.conf.set(conf_key, prev)
        name = f"rocks_{uuid.uuid4().hex[:8]}"
        q = (
            running_totals_stateful(events_stream(spark, SF))
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return sorted(map(tuple, spark.table(name).collect()))

    try:
        rocks = run(
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
        default = run(None)
    finally:
        spark.conf.set(conf_key, prev)
    assert rocks == default and len(rocks) == 1000


def test_file_sink_checkpoint_exactly_once(spark, tmp_path):
    """Checkpointed parquet sink is exactly-once across restarts: the
    first run drains the finite source and commits offsets; a second run
    over the same checkpoint must re-deliver NOTHING (no duplicate files,
    no re-appended rows). This is the production deployment shape —
    writeStream + checkpointLocation — where `run_stream_to_memory` in the
    query entries is only the test harness."""
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        s = events_stream(spark, SF).select("event_id", "user_id", "value")
        q = (
            s.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    n1 = spark.read.parquet(out).count()
    run_once()
    n2 = spark.read.parquet(out).count()
    expected = spark.read.parquet(SF + "/events.parquet").count()
    assert n1 == expected
    assert n2 == expected


def _split_events_time_ordered(spark, tmp_path, n_files=4):
    """Write sf0.001 events as n_files time-ordered parquet files so the
    file stream source (maxFilesPerTrigger=1) replays them as n_files
    successive micro-batches in event-time order."""
    import pyspark.sql.functions as F

    from spark_hbase_connector_spark.catalogs import load

    src = load(spark, SF, "events").orderBy("ts")
    rows = src.count()
    per = (rows + n_files - 1) // n_files
    ranked = src.withColumn(
        "__rn", F.row_number().over(__import__("pyspark").sql.Window.orderBy("ts", "event_id"))
    )
    d = str(tmp_path / "events_batches")
    for i in range(n_files):
        (
            ranked.where((F.col("__rn") > i * per) & (F.col("__rn") <= (i + 1) * per))
            .drop("__rn")
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )
    return d, rows


def test_state_carries_across_microbatches(spark, tmp_path):
    """Stateful aggregation must accumulate across micro-batches, not
    within one: the same input split into 4 time-ordered files and driven
    one file per trigger yields the same complete-mode tumbling counts as
    the batch computation — and the run really does execute >1 batch."""
    import pyspark.sql.functions as F

    from spark_hbase_connector_spark.catalogs import load
    from spark_hbase_connector_spark.streaming.events import tumbling_window_agg

    d, _ = _split_events_time_ordered(spark, tmp_path)
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    agg = tumbling_window_agg(stream, "15 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("mb_counts")
        .start()
    )
    q.processAllAvailable()
    n_batches = len(q.recentProgress)
    q.stop()
    got = spark.table("mb_counts")

    batch = load(spark, SF, "events")
    want = (
        batch.groupBy(F.window("ts", "15 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n", "total_value")
    )
    assert n_batches >= 4, f"expected >=4 micro-batches, got {n_batches}"
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_watermark_drops_late_rows_across_batches(spark, tmp_path):
    """Append-mode watermarked aggregation must DROP events that arrive
    after the watermark passed their window — the bounded-state contract.
    Batch 1 advances event time far ahead; batch 2 replays an event 3
    hours older than the max (watermark delay is 10 minutes), whose window
    already closed. Its contribution must not appear."""
    import pyspark.sql.functions as F
    import pyspark.sql.types as T

    from spark_hbase_connector_spark.streaming.events import (
        tumbling_window_agg_watermarked,
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    d = str(tmp_path / "late_events")
    base = "2024-01-01 00:07:00"
    rows1 = [
        (1, "2024-01-01 00:07:00", 1, "click", 1.0),
        (2, "2024-01-01 06:00:00", 1, "click", 1.0),  # advances watermark hours ahead
    ]
    rows2 = [(3, "2024-01-01 03:00:00", 1, "click", 100.0)]  # late: window long closed

    def write_batch(rows, part):
        pdf = spark.createDataFrame(
            [(i, __import__("datetime").datetime.fromisoformat(t), u, e, v) for i, t, u, e, v in rows],
            schema,
        )
        pdf.coalesce(1).write.mode("append").parquet(d)

    write_batch(rows1, 0)
    agg = None
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(d)
    )
    agg = tumbling_window_agg_watermarked(stream, "15 minutes", "10 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_late")
        .start()
    )
    q.processAllAvailable()
    write_batch(rows2, 1)  # arrives in a LATER micro-batch, after watermark moved
    q.processAllAvailable()
    # observability: the drop must be VISIBLE in the state-operator
    # metrics (numRowsDroppedByWatermark), not just inferable from absence
    # — this is the counter a production monitor alerts on
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    q.stop()
    assert dropped >= 1, "late row not recorded in numRowsDroppedByWatermark"
    got = {(r.window_start.isoformat(), r.n, r.total_value) for r in spark.table("wm_late").collect()}
    # the 00:00 window was finalized with ONLY event 1; the late 03:00
    # event's window is beyond the final watermark and must never emit
    assert ("2024-01-01T00:00:00", 1, 1.0) in got
    assert not any(t.startswith("2024-01-01T03:00:00") for t, _, _ in got), got
    assert not any(v == 100.0 for _, _, v in got), got


def test_tws_runs_on_either_engine_with_state_across_batches(spark, tmp_path):
    """running_totals_tws must RUN in every environment: native
    transformWithStateInPandas where google.protobuf exists, the
    vendor-free v1 shim (tws_shim) otherwise — same StatefulProcessor,
    same results. Multi-batch input proves the shim genuinely carries
    named state across micro-batches (not per-batch recompute)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    from spark_hbase_connector_spark.catalogs import load
    from spark_hbase_connector_spark.streaming.events import (
        running_totals_tws,
        run_stream_to_memory,
        tws_native_available,
    )

    d, _ = _split_events_time_ordered(spark, tmp_path)
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    got = run_stream_to_memory(running_totals_tws(stream), spark, mode="append")
    batch = load(spark, SF, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    want = batch.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # in THIS container the shim path is what just ran; elsewhere native
    assert isinstance(tws_native_available(), bool)


def test_tws_shim_refuses_remaining_nongoals_loudly(spark):
    """The shim's remaining non-goals must fail loudly, never drift
    silently. After r5 widened the surface (EventTime timeMode, TTL,
    list/map state are now SUPPORTED), the loud refusals that remain are:
    an unknown timeMode string, and timer calls when timers were not
    enabled (timeMode 'None' — the native API rejects those too)."""
    import pytest

    from spark_hbase_connector_spark.streaming.tws_shim import (
        ShimHandle,
        transform_with_state_shim,
    )

    stream = events_stream(spark, SF)
    with pytest.raises(ValueError, match="timeMode"):
        transform_with_state_shim(
            stream, ["user_id"], object, "user_id long", time_mode="IngestTime"
        )
    h = ShimHandle({}, now=0)  # timers=None: timeMode 'None'
    with pytest.raises(NotImplementedError, match="registerTimer"):
        h.registerTimer(1000)
    with pytest.raises(NotImplementedError, match="deleteTimer"):
        h.deleteTimer(1000)
    with pytest.raises(NotImplementedError, match="listTimers"):
        h.listTimers()
    # the supported surface round-trips (value, TTL'd value, list)
    s = h.getValueState("total", "total double")
    assert not s.exists()
    s.update((1.5,))
    assert s.exists() and s.get() == (1.5,)
    s.clear()
    assert not s.exists()
    t = h.getValueState("ttl", "ttl double", ttlDurationMs=1000)
    t.update((2.5,))
    assert t.exists() and t.get() == (2.5,)
    lst = h.getListState("l", "l double")
    lst.appendValue((1.0,))
    assert [tuple(v) for v in lst.get()] == [(1.0,)]


def test_tws_shim_timer_surface_roundtrip():
    """Processing-time timer bookkeeping on the handle (r5): registration
    keeps the expiry list sorted and deduplicated, deleteTimer removes
    exactly the named expiry, listTimers snapshots — the contract the
    session-timeout-close re-arm idiom (delete all + register) relies on."""
    from spark_hbase_connector_spark.streaming.tws_shim import ShimHandle

    timers: list = []
    h = ShimHandle({}, now=0, timers=timers)
    h.registerTimer(3000)
    h.registerTimer(1000)
    h.registerTimer(2000)
    h.registerTimer(1000)  # duplicate expiry registers once (native dedups)
    assert list(h.listTimers()) == [1000, 2000, 3000]
    h.deleteTimer(2000)
    h.deleteTimer(99999)  # absent expiry is a no-op
    assert list(h.listTimers()) == [1000, 3000]
    assert timers == [1000, 3000]  # backing store IS the pickled state list
    for t in h.listTimers():  # the re-arm idiom: snapshot survives mutation
        h.deleteTimer(t)
    assert list(h.listTimers()) == []


def test_event_time_timer_fires_for_quiet_user(spark, tmp_path):
    """The EVENT-TIME timer path, isolated: user 1 sends two events and
    goes silent FOREVER (no beyond-horizon input row ever arrives), so
    the only way its first-hour profile can emit is the watermark-driven
    timer registered at first_ts + horizon firing once other users'
    events push the watermark past it. A multi-file time-ordered replay
    (maxFilesPerTrigger=1) advances the watermark across micro-batches;
    user 2 also proves the input-close path in the same run."""
    from datetime import datetime, timedelta

    import pyspark.sql.functions as F

    from spark_hbase_connector_spark.streaming.events import first_horizon_profile

    t0 = datetime(2024, 3, 1, 12, 0, 0)
    m = lambda mins: t0 + timedelta(minutes=mins)
    rows = [
        # (user_id, event_id, ts, value)
        (1, 1, m(0), 1.0),
        (1, 2, m(10), 2.0),  # then silent forever
        (2, 3, m(0), 10.0),
        (2, 4, m(30), 20.0),
        (2, 5, m(120), 40.0),  # beyond user 2's 60-min horizon -> input close
        (2, 6, m(300), 80.0),
        (2, 7, m(480), 160.0),  # drives final watermark to t0+479min
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    d = str(tmp_path / "fh_batches")
    for lo, hi in ((0, 31), (31, 200), (200, 1000)):  # minute cuts, 3 files
        (
            df.where(
                (F.col("ts") >= m(lo)) & (F.col("ts") < m(hi))
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    out = first_horizon_profile(stream, horizon_minutes=60, delay="1 minute")
    import uuid

    name = f"fh_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.user_id: (r.first_us, r.last_us, r.n_events, r.total_value)
        for r in spark.table(name).collect()
    }
    us = lambda dt: int(dt.timestamp() * 1_000_000)
    # user 1 emitted PURELY by the event-time timer (no later input exists)
    assert got[1] == (us(m(0)), us(m(10)), 2, 3.0)
    # user 2 closed by its first beyond-horizon row
    assert got[2] == (us(m(0)), us(m(30)), 2, 30.0)
    assert set(got) == {1, 2}


def test_latest_per_key_state_across_batches(spark, tmp_path):
    """The latest-per-key CDC view must track the newest row ACROSS
    micro-batches: same input split time-ordered one file per trigger;
    applying the update stream (newest update per key) equals the batch
    latest-row-per-key — and a key updated in an early batch then again
    later reflects the later value."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    from spark_hbase_connector_spark.catalogs import load
    from spark_hbase_connector_spark.streaming.events import latest_per_key_stateful

    d, _ = _split_events_time_ordered(spark, tmp_path)
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    q = (
        latest_per_key_stateful(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("mb_latest")
        .start()
    )
    q.processAllAvailable()
    n_batches = len(q.recentProgress)
    q.stop()
    emitted = spark.table("mb_latest")
    w = W.partitionBy("user_id").orderBy(
        F.col("last_ts_us").desc(), F.col("last_event_id").desc()
    )
    got = (
        emitted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "last_ts_us", "last_event_id", "last_value")
    )
    batch = load(spark, SF, "events")
    want = (
        batch.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(
                    F.col("ts").desc(), F.col("event_id").desc()
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.unix_micros("ts").alias("last_ts_us"),
            F.col("event_id").alias("last_event_id"),
            F.round("value", 4).alias("last_value"),
        )
    )
    assert n_batches >= 4
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # a key present in >1 batch must have emitted >1 update (state visibly
    # revised across batches, not recomputed within one)
    multi = emitted.groupBy("user_id").count().where(F.col("count") > 1).count()
    assert multi > 0


def test_trigger_available_now_backfill_drains_and_stops(spark, tmp_path):
    """trigger(availableNow=True) — the BACKFILL pattern: drain everything
    currently in the source (across multiple rate-limited micro-batches),
    then stop on its own; a second invocation picks up only files added
    since. This is how a batch-cadence job reuses the streaming
    checkpoint/exactly-once machinery."""
    import os
    import time

    import pyspark.sql.functions as F

    d, n_files = _split_events_time_ordered(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(d).schema

    def run_once(qname):
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(qname)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive  # stopped by itself — the backfill contract
        return q

    total = spark.read.parquet(d).count()
    run_once("an_first")
    assert spark.table("an_first").collect()[0].n == total

    # append one more file; a new availableNow run processes ONLY the delta
    extra_src = spark.read.parquet(d).limit(7)
    extra_src.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "extra"))
    part = next(
        f for f in os.listdir(tmp_path / "extra") if f.endswith(".parquet")
    )
    os.replace(
        str(tmp_path / "extra" / part), os.path.join(d, "zzz-late.parquet")
    )
    run_once("an_second")
    assert spark.table("an_second").collect()[0].n == total + 7


def test_dedup_state_metrics_visible(spark, tmp_path):
    """Stateful dedup must report its state size (numRowsTotal) in query
    progress — the number capacity planning watches; a silent state store
    is unoperable at scale."""
    import pyspark.sql.functions as F

    d, _ = _split_events_time_ordered(spark, tmp_path)
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(d)
    )
    dedup = stream.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName("state_metrics")
        .start()
    )
    q.processAllAvailable()
    state_rows = max(
        (
            op.get("numRowsTotal", 0)
            for p in q.recentProgress
            for op in p.get("stateOperators", [])
        ),
        default=0,
    )
    q.stop()
    distinct_keys = spark.read.parquet(d).select("user_id", "event_type").distinct().count()
    assert state_rows == distinct_keys, (state_rows, distinct_keys)
