"""Z-order layout effectiveness: the Morton-clustered rewrite must let
row-group statistics prune a 2-D box on BOTH columns, where a 1-D sort
leaves the second column scattered (every row group overlaps)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from spark_hbase_connector_spark.functions.zorder import zorder_sql_expr


def _overlapping_row_groups(path: str, box: dict) -> tuple[int, int]:
    """(overlapping, total) row groups whose per-column min/max intersect
    the box on EVERY constrained column — the groups a stats-pruning scan
    must read."""
    total = overlapping = 0
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(path, f)).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            total += 1
            hit = True
            for col, (lo, hi) in box.items():
                st = meta.row_group(rg).column(names[col]).statistics
                if st.min > hi or st.max < lo:
                    hit = False
                    break
            if hit:
                overlapping += 1
    return overlapping, total


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    n = 1 << 14
    df = spark.range(n).select(
        (F.col("id") % 128).alias("x"),
        (F.col("id") * 2654435761 % 16384).alias("y"),
    )
    # the box constrains ONLY the second dimension: a 1-D x-sort scatters
    # y uniformly, so NO row group can be skipped on y — while z-order
    # clusters y's high bits, so groups carry sub-range y stats. (A box
    # selective on x would let BOTH layouts prune via x and the margin
    # would come down to sampling-dependent file boundaries — the
    # second-dimension case is the one a 1-D sort structurally loses.)
    box = {"y": (1000, 2000)}

    p1 = str(tmp_path / "by_x")
    (
        df.repartitionByRange(8, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(p1)
    )
    pz = str(tmp_path / "by_z")
    (
        df.withColumn("z", F.expr(zorder_sql_expr("x", "y", bits=14)))
        .repartitionByRange(8, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(pz)
    )
    hit1, tot1 = _overlapping_row_groups(p1, box)
    hitz, totz = _overlapping_row_groups(pz, box)
    # same rows either way — layout must not change the answer
    cond = F.col("y").between(1000, 2000)
    assert (
        spark.read.parquet(p1).where(cond).count()
        == spark.read.parquet(pz).where(cond).count()
    )
    # x-sorted layout: y is uniform in every group -> zero skipping
    assert hit1 == tot1, (hit1, tot1)
    # z layout: the narrow y-range must skip at least half the groups
    assert hitz <= totz // 2, (hitz, totz)
