"""Hypertable-style continuous aggregate: materialized rollup + live tail.

The time-series pattern (TimescaleDB continuous aggregates, Druid rollup
segments): keep a MATERIALIZED aggregate for complete time chunks and
aggregate only the current (still-mutating) chunk at query time, then
union. At 100 TB the rollup table is ~chunk_count x dims rows — queries
touch it instead of the raw fact table, and each nightly refresh
aggregates one chunk, not history.

Both halves are plain DataFrame aggregations; the cutoff is data-derived
(max complete chunk), so results are identical to aggregating the raw
table directly — which is exactly what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_col(ts_col: str, width: str = "day") -> Column:
    """The chunk (time bucket) a row belongs to."""
    return F.date_trunc(width, F.col(ts_col))


def materialize_rollup(
    events: DataFrame,
    path: str,
    ts_col: str = "ts",
    dims: list[str] | None = None,
    value_col: str = "value",
    width: str = "day",
) -> Column:
    """Aggregate all COMPLETE chunks (chunk < the last chunk present) into
    a rollup Parquet at ``path``, partitioned by chunk for pruning.
    Returns the cutoff literal (start of the newest, incomplete chunk).
    """
    dims = dims or []
    chunk = chunk_col(ts_col, width).alias("chunk")
    cutoff = events.agg(F.max(chunk_col(ts_col, width))).collect()[0][0]
    rollup = (
        events.where(chunk_col(ts_col, width) < F.lit(cutoff))
        .groupBy(chunk, *dims)
        .agg(
            F.count(F.lit(1)).alias("n"),
            # money rule (CLAUDE.md): value_col is 2dp money — exact
            # fixed-point cents (q1 recipe); per-chunk sums grow with
            # corpus size, the class round(sum(double), 4) flips
            (
                F.sum(F.round(F.col(value_col) * 100).cast("long")).cast(
                    "double"
                )
                / 100
            ).alias("total"),
        )
    )
    rollup.write.mode("overwrite").partitionBy("chunk").parquet(path)
    return F.lit(cutoff)


def rollup_with_tail(
    spark,
    events: DataFrame,
    rollup_path: str,
    cutoff: Column,
    ts_col: str = "ts",
    dims: list[str] | None = None,
    value_col: str = "value",
    width: str = "day",
) -> DataFrame:
    """The continuous-aggregate read: materialized rollup for complete
    chunks UNION a live aggregation of only the tail chunk. Chunk groups
    are disjoint across the two sides, so the result equals aggregating
    the raw table — at a fraction of the scan."""
    dims = dims or []
    stored = spark.read.parquet(rollup_path).select(
        F.col("chunk").cast("timestamp").alias("chunk"), *dims, "n", "total"
    )
    chunk = chunk_col(ts_col, width).alias("chunk")
    tail = (
        events.where(chunk_col(ts_col, width) >= cutoff)
        .groupBy(chunk, *dims)
        .agg(
            F.count(F.lit(1)).alias("n"),
            # money rule (CLAUDE.md): value_col is 2dp money — exact
            # fixed-point cents (q1 recipe); per-chunk sums grow with
            # corpus size, the class round(sum(double), 4) flips
            (
                F.sum(F.round(F.col(value_col) * 100).cast("long")).cast(
                    "double"
                )
                / 100
            ).alias("total"),
        )
    )
    return stored.unionByName(tail)
