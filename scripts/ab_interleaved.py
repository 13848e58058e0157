"""Interleaved fresh-process A/B for one bench query between two checkouts
(VERDICT r10 ask #1: re-earn per-query perf claims on a noisy box with a
committed, sentinel-clean, alternated A/B instead of one contended run).

Protocol: for each of N pairs, run side A then side B, each as a FRESH
process executing that checkout's own ``bench.py`` restricted to the one
query (median of SPARK_GRAFT_BENCH_RUNS noop-sink runs, load-sentinel
bracketed, exactly the headline methodology). Alternating fresh processes
cancels slow drift; the per-row sentinel flags fast transients. The
summary reports the median and min of each side's CLEAN rows plus the
ratio B/A on both.

Usage:
    python scripts/ab_interleaved.py out.json QUERY ROOT_A ROOT_B [pairs]
Env forwarded: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_RUNS
(default 3).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def run_one(root: str, query: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_QUERIES"] = query
    env.setdefault("SPARK_GRAFT_BENCH_RUNS", "3")
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        cwd=root,
    )
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    try:
        parsed = json.loads(line)
    except (json.JSONDecodeError, IndexError):
        return {"error": f"rc={proc.returncode}", "stderr": proc.stderr[-2000:]}
    return {
        "sec": parsed["queries"][query],
        "sentinel_ratio": parsed["sentinel"]["ratio"],
        "sentinel_clean": parsed["sentinel_clean"],
    }


def side_summary(rows: list[dict]) -> dict:
    clean = [r["sec"] for r in rows if r.get("sentinel_clean")]
    return {
        "rows": rows,
        "n_clean": len(clean),
        "median_clean": round(statistics.median(clean), 3) if clean else None,
        "min_clean": round(min(clean), 3) if clean else None,
    }


def main() -> None:
    out_path, query, root_a, root_b = sys.argv[1:5]
    pairs = int(sys.argv[5]) if len(sys.argv) > 5 else 5
    a_rows, b_rows = [], []
    for i in range(pairs):
        ra = run_one(root_a, query)
        print(f"pair {i} A: {ra}", flush=True)
        a_rows.append(ra)
        rb = run_one(root_b, query)
        print(f"pair {i} B: {rb}", flush=True)
        b_rows.append(rb)
    a, b = side_summary(a_rows), side_summary(b_rows)
    artifact = {
        "metric": "interleaved_fresh_process_ab",
        "query": query,
        "sf_dir": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "runs_per_process": int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")),
        "pairs": pairs,
        "root_a": root_a,
        "root_b": root_b,
        "a": a,
        "b": b,
        "ratio_b_over_a_median": (
            round(b["median_clean"] / a["median_clean"], 3)
            if a["median_clean"] and b["median_clean"]
            else None
        ),
        "ratio_b_over_a_min": (
            round(b["min_clean"] / a["min_clean"], 3)
            if a["min_clean"] and b["min_clean"]
            else None
        ),
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: artifact[k] for k in
                      ("query", "ratio_b_over_a_median", "ratio_b_over_a_min")}))


if __name__ == "__main__":
    main()
