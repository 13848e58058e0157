"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Protocol (BASELINE.md): warm SparkSession, AQE on, median of 3 runs per
query; each run fully materializes the result through the noop sink (count()
would let Spark prune the plan).

Load sentinel (round-8 protocol fix): the same machine produced 24.6 s and
33.0 s for the identical commit in round 7 — a ±35% host-load band that made
the committed artifact meaningless against the 2x regression gate. The suite
now times a cheap sentinel query (median of 3) immediately before AND after
the measured set; if the two medians disagree by >1.3x the host was loaded
mid-run and the whole suite reruns once. Both attempts are recorded in the
JSON (``attempts``) and the FASTER total is reported as the headline — the
slower one measures background load, not this engine.
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
SENTINEL_RATIO = 1.3


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def time_query(spark, spec, sf_dir: str, runs: int = RUNS) -> float:
    samples = []
    for _ in range(runs):
        # drop persisted relations so every run pays its operator's own
        # intermediate materialization (CacheManager would otherwise
        # serve run 2+ from run 1's persisted postings — warm-session
        # timing is the protocol, cross-run result reuse is not)
        spark.catalog.clearCache()
        t0 = time.time()
        materialize(spec.fn(spark, sf_dir))
        samples.append(time.time() - t0)
    return round(statistics.median(samples), 3)


def run_suite(spark, bench_specs, sentinel, sf_dir: str) -> dict:
    first = time_query(spark, sentinel, sf_dir)
    timings: dict[str, float] = {}
    for name, spec in bench_specs.items():
        timings[name] = time_query(spark, spec, sf_dir)
        # progress on stderr so long runs (sf10+) are observable; stdout
        # stays the single JSON line the driver parses
        print(f"  {name}: {timings[name]}s", file=sys.stderr, flush=True)
    last = time_query(spark, sentinel, sf_dir)
    lo, hi = min(first, last), max(first, last)
    return {
        "total": round(sum(timings.values()), 3),
        "queries": timings,
        "sentinel": {
            "query": "scan_flagship",
            "first": first,
            "last": last,
            "ratio": round(hi / lo, 3) if lo > 0 else None,
        },
    }


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
    # warm-up: JVM/codegen/files (flagship touches the catalog path; it
    # also serves as the load sentinel bracketing the measured suite).
    # Three rounds, not one — the first post-startup sentinel median was
    # still 2x slow from JIT warm-up alone, which would trip the load
    # sentinel and force a spurious full rerun.
    sentinel = REGISTRY["scan_flagship"]
    for _ in range(3):
        materialize(sentinel.fn(spark, sf_dir))

    attempts = [run_suite(spark, bench_specs, sentinel, sf_dir)]
    ratio = attempts[0]["sentinel"]["ratio"]
    if ratio is not None and ratio > SENTINEL_RATIO:
        print(
            f"  load sentinel tripped (ratio {ratio} > {SENTINEL_RATIO}):"
            " rerunning suite once",
            file=sys.stderr,
            flush=True,
        )
        attempts.append(run_suite(spark, bench_specs, sentinel, sf_dir))
    best = min(attempts, key=lambda a: a["total"])
    # If even the chosen attempt's sentinel tripped, the headline is still
    # load-contaminated — flag it so downstream regression gates can
    # discount the number instead of reading min-of-two as clean.
    best_ratio = best["sentinel"]["ratio"]
    sentinel_clean = best_ratio is not None and best_ratio <= SENTINEL_RATIO

    print(
        json.dumps(
            {
                "metric": "headline_queries_median_total",
                "value": best["total"],
                "unit": "sec",
                "queries": best["queries"],
                "sf": sf,
                "spark_version": spark.version,
                "runs_per_query": RUNS,
                "sentinel": best["sentinel"],
                "sentinel_clean": sentinel_clean,
                "attempts": [
                    {"total": a["total"], "sentinel": a["sentinel"]}
                    for a in attempts
                ],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
