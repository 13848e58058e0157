"""Isolated per-query bench protocol for sf>=100 (VERDICT r9 ask #1).

The single-session sf100 suite self-contaminates: a 236 s shuffle-heavy
row leaves the JVM (GC, page cache, shuffle dirs) degraded for the next
row, which is how r9's `dedup_ngram_jaccard_prefix` measured 396 s vs
167 s isolated at r7. This sibling runs `bench.py` ONE QUERY PER FRESH
PROCESS (same timing methodology, same noop-sink materialization, same
per-query load sentinel bracketing) and merges the JSON lines into one
artifact whose every row is independently sentinel-stamped.

Usage:
    python scripts/bench_isolated.py out.json [query ...]
    # no names -> every spec with bench=True
Env (forwarded to each child): SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
SPARK_GRAFT_BENCH_RUNS (default here: 1, the sf100 protocol).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from spark_hbase_connector_spark.queries import REGISTRY  # noqa: E402


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:] or [n for n, s in REGISTRY.items() if s.bench]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    rows = {}
    for name in names:
        env = dict(os.environ)
        env["SPARK_GRAFT_BENCH_QUERIES"] = name
        env.setdefault("SPARK_GRAFT_BENCH_RUNS", "1")
        proc = subprocess.run(
            [sys.executable, os.path.join(_ROOT, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            parsed = json.loads(line)
        except (json.JSONDecodeError, IndexError):
            rows[name] = {"error": f"rc={proc.returncode}", "stderr": proc.stderr[-2000:]}
            print(f"FAIL {name} rc={proc.returncode}", flush=True)
            continue
        rows[name] = {
            "sec": parsed["queries"][name],
            "sentinel": parsed["sentinel"],
            "sentinel_clean": parsed["sentinel_clean"],
            "attempts": len(parsed["attempts"]),
        }
        print(
            f"OK   {name}: {rows[name]['sec']}s"
            f" (sentinel ratio {parsed['sentinel']['ratio']},"
            f" clean={parsed['sentinel_clean']})",
            flush=True,
        )
    clean = all(isinstance(r, dict) and r.get("sentinel_clean") for r in rows.values())
    artifact = {
        "metric": "isolated_per_query_fresh_process",
        "unit": "sec",
        "sf": sf,
        "runs_per_query": int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "1")),
        "all_sentinels_clean": clean,
        "value": round(
            sum(r["sec"] for r in rows.values() if "sec" in r), 3
        ),
        "queries": rows,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_path} (all_sentinels_clean={clean})", flush=True)


if __name__ == "__main__":
    main()
