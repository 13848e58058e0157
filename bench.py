"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Protocol (BASELINE.md): warm SparkSession, AQE on, median of 3 runs per
query; each run fully materializes the result through the noop sink (count()
would let Spark prune the plan).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_hbase_connector_spark import get_spark
from spark_hbase_connector_spark.queries import REGISTRY

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    bench_specs = {n: s for n, s in REGISTRY.items() if s.bench}
    # optional subset (comma-separated names) for scale probes where the
    # full headline set is impractical — e.g. the sf100 decade measurement
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if subset:
        keep = [n.strip() for n in subset.split(",") if n.strip()]
        unknown = [n for n in keep if n not in REGISTRY]
        if unknown:
            raise SystemExit(f"unknown bench queries: {unknown}")
        bench_specs = {n: REGISTRY[n] for n in keep}
    # warm-up: JVM/codegen/files (flagship touches the catalog path; fall
    # back to the subset's first entry when the flagship isn't selected)
    warm = bench_specs.get("scan_flagship") or next(iter(bench_specs.values()))
    materialize(warm.fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for name, spec in bench_specs.items():
        runs = []
        for _ in range(RUNS):
            # drop persisted relations so every run pays its operator's own
            # intermediate materialization (CacheManager would otherwise
            # serve run 2+ from run 1's persisted postings — warm-session
            # timing is the protocol, cross-run result reuse is not)
            spark.catalog.clearCache()
            t0 = time.time()
            materialize(spec.fn(spark, sf_dir))
            runs.append(time.time() - t0)
        timings[name] = round(statistics.median(runs), 3)
        # progress on stderr so long runs (sf10+) are observable; stdout
        # stays the single JSON line the driver parses
        print(f"  {name}: {timings[name]}s", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_median_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "spark_version": spark.version,
                "runs_per_query": RUNS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
