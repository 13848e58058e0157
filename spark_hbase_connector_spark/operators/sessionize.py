"""Skew-proof sessionization — the segmented-scan answer to the hot-key
wall VERDICT r4 flagged for the window/time-series family.

The plain pattern (lag + cumulative sum over ``partitionBy(key)``) puts a
key's ENTIRE timeline in one task: a 90%-one-user stream concentrates 90%
of all rows on one core no matter how many executors exist, and neither
AQE nor salting helps — session boundaries are a sequential prefix
computation per key, and a random salt would split sessions.

``sessionize_segmented`` decomposes the prefix scan the classic
segmented-scan way, using TIME as the salt (which, unlike a hash salt,
respects session contiguity):

1. stage A — partition by ``(key, time_chunk)``: local sessionization
   inside each chunk (window over chunk-local rows), then aggregate each
   local session to one summary row (start, end, n, sum). A hot key now
   spreads over ``n_chunks`` tasks; per-task work is bounded by rows per
   chunk, not rows per key.
2. stage B — partition by ``key`` over SUMMARIES: consecutive local
   sessions whose boundary gap <= threshold merge (the same lag+cumsum
   rule, but over a relation that is sessions-sized, not events-sized —
   at 100 TB that is the difference between 10^11 rows and 10^7).
3. final aggregate by ``(key, global session id)``.

Output is identical to the one-task plan: within-chunk splits use the
same strictly-greater gap rule, and cross-chunk merging depends only on
boundary gaps between summaries (within-chunk summaries are > gap apart
by construction, so stage B never merges them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_segmented(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    order_col: str = "event_id",
    gap_seconds: int = 1800,
    chunk_seconds: int = 86_400,
) -> DataFrame:
    """Per-key session aggregates (key, session_id, n_events,
    session_value) with sessions split on event-time gaps strictly
    greater than ``gap_seconds``; session_id numbers a key's sessions
    1..k in time order — byte-compatible with the plain
    lag+cumsum-over-key plan, but hot keys parallelize over
    ``chunk_seconds`` time chunks."""
    gap_us = gap_seconds * 1_000_000
    chunk = (F.unix_micros(F.col(ts_col)) / (chunk_seconds * 1_000_000)).cast(
        "long"
    )
    e = events.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("t"),
        F.col(val_col).alias("v"),
        F.col(order_col).alias("o"),
        chunk.alias("ch"),
    )
    # stage A: chunk-local sessionize (hot key -> n_chunks parallel tasks)
    wa = Window.partitionBy("k", "ch").orderBy("t", "o")
    prev_t = F.lag("t").over(wa)
    is_new = F.when(
        prev_t.isNull()
        | (F.unix_micros("t") - F.unix_micros(prev_t) > gap_us),
        1,
    ).otherwise(0)
    wa_run = wa.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = e.withColumn("lsid", F.sum(is_new).over(wa_run))
    summaries = local.groupBy("k", "ch", "lsid").agg(
        F.min("t").alias("s_start"),
        F.max("t").alias("s_end"),
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("tot"),
    )
    # stage B: merge across chunk boundaries over the sessions-sized
    # summary relation (lag of the RUNNING max end handles a long local
    # session that fully covers a later-starting one — gap is measured
    # against everything seen so far, exactly like the row-level scan)
    wb = Window.partitionBy("k").orderBy("s_start", "ch", "lsid")
    wb_run = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_end = F.lag(F.col("s_end")).over(wb)
    prev_max_end = F.lag(F.max(F.unix_micros("s_end")).over(wb_run)).over(wb)
    g_new = F.when(
        prev_end.isNull()
        | (F.unix_micros("s_start") - prev_max_end > gap_us),
        1,
    ).otherwise(0)
    merged = summaries.withColumn(
        "session_id", F.sum(g_new).over(wb_run).cast("bigint")
    )
    return merged.groupBy(F.col("k").alias(key_col), "session_id").agg(
        F.sum("n").alias("n_events"),
        F.round(F.sum("tot"), 4).alias("session_value"),
    )
