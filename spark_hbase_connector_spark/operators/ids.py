"""Contiguous global ID assignment without a global sort.

Training-data exports need stable, dense row indices (shard offsets,
sample addressing). The naive `row_number() OVER (ORDER BY key)` is an
all-data single-partition sort at 100 TB; `zipWithIndex` drops to RDDs
and is tied to physical partitioning. The scale shape used here:

1. bucket each row by a deterministic, ORDER-PRESERVING key range
   (bucket = key div width — bucket b's keys all sort before bucket
   b+1's);
2. rank within each bucket (parallel windows, one shuffle on bucket);
3. cumulative bucket counts (a bucket-count-sized relation — thousands
   of rows, windowed without a partition clause at negligible cost)
   broadcast-join back as per-bucket offsets.

idx = offset(bucket) + rank_in_bucket - 1 is exactly the global dense
rank, computed with one corpus shuffle and no global sort. Deterministic:
every step is a pure function of the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_contiguous_ids(
    df: DataFrame, key: str, bucket_width: int = 1024, out_col: str = "idx"
) -> DataFrame:
    """Add ``out_col`` = dense 0-based global index of ``key`` order.

    ``key`` must be unique and numeric (rowkey-like). ``bucket_width``
    controls window parallelism: ~(key range / bucket_width) buckets."""
    b = (F.col(key) / bucket_width).cast("long").alias("__bucket")
    rows = df.withColumn("__bucket", b)
    w_in = Window.partitionBy("__bucket").orderBy(key)
    counts = rows.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    w_off = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = counts.select(
        "__bucket", (F.sum("__n").over(w_off) - F.col("__n")).alias("__off")
    )
    return (
        rows.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, F.col("__off") + F.row_number().over(w_in) - 1)
        .drop("__bucket", "__off")
    )


def assign_prefix_sums(
    df: DataFrame,
    key: str,
    value: str,
    bucket_width: int = 1024,
    out_col: str = "prefix",
) -> DataFrame:
    """Add ``out_col`` = EXCLUSIVE prefix sum of ``value`` in global ``key``
    order — the shard-budgeting primitive (cumulative tokens before this
    row decides which shard it lands in). Same no-global-sort shape as
    `assign_contiguous_ids`: per-bucket running sums in parallel windows +
    broadcast cumulative bucket totals; one corpus shuffle."""
    b = (F.col(key) / bucket_width).cast("long").alias("__bucket")
    rows = df.withColumn("__bucket", b)
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    totals = rows.groupBy("__bucket").agg(F.sum(value).alias("__n"))
    w_off = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "__bucket", (F.sum("__n").over(w_off) - F.col("__n")).alias("__off")
    )
    return (
        rows.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            out_col,
            F.col("__off") + F.coalesce(F.sum(value).over(w_in), F.lit(0)),
        )
        .drop("__bucket", "__off")
    )
