"""Self-releasing operators must STAY self-releasing (CACHE.md class 1;
the r8 `hamming_band_pairs` defect leaked one cached relation per call
for the life of the session). Measured behavior on a healthy operator:
the persistent-RDD count PLATEAUS under repeated invocation — explicit
unpersists drop the working set, and the ContextCleaner reclaims each
call's superseded localCheckpoints with a one-to-two call lag once the
Python references die. A leaking operator instead grows the set by its
internal working-set size (>= 2) on EVERY call, linearly. The assertion
targets the tail growth (calls 3 and 4), past the cleaner's lag window."""

from __future__ import annotations

import gc

import pytest
from pyspark.sql import functions as F

from spark_hbase_connector_spark.operators.dedup import hamming_band_pairs
from spark_hbase_connector_spark.operators.graph import (
    connected_components,
    pagerank,
)


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


@pytest.mark.parametrize(
    "name",
    ["hamming_band_pairs", "connected_components", "pagerank"],
)
def test_no_per_call_cache_growth(spark, name):
    words = spark.range(0, 200).select(
        F.col("id"), (F.col("id") % 7).cast("long").alias("h")
    )
    # star graph: diameter 2, converges in one fused double-hop
    edges = spark.range(1, 100).select(
        F.lit(0).alias("id1"), F.col("id").alias("id2")
    )
    fns = {
        "hamming_band_pairs": lambda: hamming_band_pairs(words, max_hamming=3),
        "connected_components": lambda: connected_components(
            edges, max_iter=4
        ),
        "pagerank": lambda: pagerank(edges, iters=3, src="id1", dst="id2"),
    }
    spark.catalog.clearCache()
    gc.collect()
    counts = []
    for _ in range(4):
        fns[name]().collect()
        gc.collect()
        counts.append(_n_persistent(spark))
    tail_growth = counts[3] - counts[1]
    assert tail_growth <= 4, (
        "persistent-RDD count kept growing across calls (leaked working "
        f"set): {counts}"
    )
