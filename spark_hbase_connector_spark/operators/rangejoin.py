"""Range (interval) join — points joined to containing intervals.

Spark's only native plan for ``l.ts BETWEEN r.start AND r.end`` is a
broadcast-nested-loop (or worse, a cartesian + filter): O(n·m) compares.
The chunked formulation makes it an EQUI-join:

- pick a chunk width W ~ the typical interval length;
- each point belongs to exactly ONE chunk (``floor(epoch/W)``);
- each interval explodes to the chunks it covers (``sequence`` — ~len/W+1
  rows, bounded);
- equi-join on the chunk, then apply the exact containment predicate.

A (point, interval) pair can only meet in the point's single chunk, so no
dedup pass is needed. Shuffle volume: points once + intervals × chunks
covered — at 100 TB this is the difference between a hash join and a
nested loop. Long outlier intervals multiply the explode: cap them by
splitting at ingestion, or route the few giants through a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    chunk_seconds: int = 21_600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval with
    ``start <= ts < end`` (half-open). Output = point columns + interval
    columns. ``how='inner'`` only (the chunked shape; left-outer = inner +
    anti-join union, composed by the caller)."""
    if how != "inner":
        raise ValueError("range_join supports how='inner'")
    w = F.lit(chunk_seconds)
    p = points.withColumn("__chunk", (F.unix_timestamp(F.col(ts_col)) / w).cast("long"))
    iv = intervals.withColumn(
        "__chunk",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / w).cast("long"),
                # end is exclusive, but a point in the end's chunk can still
                # precede it — cover through the end chunk
                (F.unix_timestamp(F.col(end_col)) / w).cast("long"),
            )
        ),
    )
    joined = p.join(iv, "__chunk").where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("__chunk")
