"""operators/sessionize.py — segmented (skew-proof) sessionization must be
output-identical to the plain one-task-per-key lag+cumsum plan, including
on every boundary the chunking could get wrong."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_hbase_connector_spark.operators.sessionize import sessionize_segmented

GAP_S = 1800


def _plain(events):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull()
        | (F.unix_micros("ts") - F.unix_micros(prev) > GAP_S * 1_000_000),
        1,
    ).otherwise(0)
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = events.withColumn("session_id", F.sum(is_new).over(wr).cast("bigint"))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, s, float(v), i) for i, (u, s, v) in enumerate(rows)],
        "user_id long, sec long, value double, event_id long",
    ).select(
        "user_id", F.timestamp_seconds("sec").alias("ts"), "value", "event_id"
    )


def _cmp(spark, rows, chunk_seconds):
    e = _events(spark, rows)
    got = sorted(
        map(tuple, sessionize_segmented(
            e, gap_seconds=GAP_S, chunk_seconds=chunk_seconds
        ).collect())
    )
    want = sorted(map(tuple, _plain(e).collect()))
    assert got == want, (got[:5], want[:5])
    return got


def test_sessions_spanning_many_chunks_merge(spark):
    """A session whose events straddle several chunk boundaries (every gap
    under threshold) must come back as ONE session."""
    rows = [(1, s, 1.0) for s in range(0, 40_000, 1000)]  # 40 events, 1000s apart
    got = _cmp(spark, rows, chunk_seconds=3600)  # ~11 chunk crossings
    assert got == [(1, 1, 40, 40.0)]


def test_gap_exactly_threshold_does_not_split(spark):
    rows = [(1, 0, 1.0), (1, GAP_S, 1.0), (1, 2 * GAP_S, 1.0)]
    got = _cmp(spark, rows, chunk_seconds=3600)
    assert got == [(1, 1, 3, 3.0)]


def test_gap_one_second_over_threshold_splits(spark):
    rows = [(1, 0, 1.0), (1, GAP_S + 1, 2.0)]
    got = _cmp(spark, rows, chunk_seconds=3600)
    assert got == [(1, 1, 1, 1.0), (1, 2, 1, 2.0)]


def test_event_on_exact_chunk_boundary(spark):
    """Events AT the chunk boundary timestamp belong to the later chunk;
    the merge rule must still stitch them to the prior chunk's session."""
    rows = [(1, 3599, 1.0), (1, 3600, 2.0), (1, 7200 + GAP_S + 1, 3.0)]
    got = _cmp(spark, rows, chunk_seconds=3600)
    assert got == [(1, 1, 2, 3.0), (1, 2, 1, 3.0)]


def test_mixed_users_and_empty_chunks(spark):
    rows = (
        [(1, s, 0.5) for s in (0, 100, 50_000, 50_200)]
        + [(2, s, 1.0) for s in (10, 99_000)]
        + [(3, 5, 2.0)]
    )
    got = _cmp(spark, rows, chunk_seconds=3600)
    assert (3, 1, 1, 2.0) in got and len(got) == 2 + 2 + 1


def test_fuzz_equivalence(spark):
    """Random timelines across several users/chunk sizes — segmented must
    equal plain everywhere."""
    import random

    rnd = random.Random(42)
    rows = []
    for u in range(8):
        s = 0
        for _ in range(rnd.randint(1, 120)):
            s += rnd.choice([5, 60, 900, 1799, 1800, 1801, 5000, 90_000])
            rows.append((u, s, round(rnd.uniform(0, 10), 2)))
    for chunk in (1800, 3600, 86_400):
        _cmp(spark, rows, chunk_seconds=chunk)
