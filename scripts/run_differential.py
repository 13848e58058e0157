"""Run the DuckDB differential per-query with timings. Usage:
python scripts/run_differential.py [sf_dir] [name ...]

Set DIFF_JSON_OUT=<path> to also write a machine-readable per-query
record (the committed-artifact form the round-2 advisor asked for).

Set DIFF_EXCLUDE_SUPERLINEAR=1 for sf>=10 sweeps: the entries (see
ORACLE_SUPERLINEAR below) whose
DUCKDB ORACLES are super-linear by construction (not Spark-plan gaps) are
skipped but still stamped into the JSON as self-describing
``{"excluded": "oracle_superlinear", "reason": ...}`` rows, so a full
sweep artifact enumerates the entire registry (VERDICT r7 ask #4).
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

from spark_hbase_connector_spark import get_spark
from spark_hbase_connector_spark.oracle import compare_frames, duckdb_connection
from spark_hbase_connector_spark.queries import REGISTRY

# The Spark side of each of these is scale-safe (measured decades in
# SCALE.md); it would be the ORACLE that cannot follow past sf1 — each
# would be kept strict-green at sf0.01/0.1/1, which is what certifies
# correctness. r9 EMPTIED the set (VERDICT r8 ask 4):
# `dedup_edit_distance` replays the PassJoin segment blocking as an
# EQUI-join (259 s at sf10, completes), `embedding_cosine_pairs`
# reports the exact operator on a fixed 200-vector panel (58 s at sf10),
# and `pipeline_semantic_dedup`'s oracle was restructured to the
# vector-attached IVF self-join (`_DUCK_IVF_AV` in queries/northstar.py
# — the r8 shape built a hash table on a 200M-row materialized candidate
# CTE and spilled 42-54 GB; the new shape completes sf10 in ~114 s).
# The stamping machinery stays for any future genuinely-superlinear
# oracle.
ORACLE_SUPERLINEAR: dict[str, str] = {}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(REGISTRY)
    excluded = {}
    if os.environ.get("DIFF_EXCLUDE_SUPERLINEAR"):
        excluded = {
            n: r for n, r in ORACLE_SUPERLINEAR.items() if n in names
        }
        names = [n for n in names if n not in excluded]
        for n, r in excluded.items():
            print(f"EXCL  {n} (oracle_superlinear)", flush=True)
    # 16 leaves headroom for DuckDB oracles at small SFs; sf>=10 sweeps are
    # Spark-side dominated, so allow widening (DIFF_CPUS=32) there.
    spark = get_spark("diff", cpus=int(os.environ.get("DIFF_CPUS", "16")))
    con = duckdb_connection(sf_dir)
    n_ok = 0
    n_run = 0
    records = {}
    for name in names:
        spec = REGISTRY[name]
        if spec.oracle is None:
            print(f"SKIP  {name} (no oracle)", flush=True)
            continue
        n_run += 1
        t0 = time.time()
        try:
            spark_pdf = spec.fn(spark, sf_dir).toPandas()
            t1 = time.time()
            oracle_pdf = con.execute(spec.oracle).df()
            t2 = time.time()
            r = compare_frames(name, spark_pdf, oracle_pdf)
            status = "PASS " if r.ok else "FAIL "
            n_ok += r.ok
            records[name] = {
                "ok": bool(r.ok),
                "rows": int(len(spark_pdf)),
                "spark_sec": round(t1 - t0, 2),
                "detail": None if r.ok else r.detail[:300],
            }
            print(
                f"{status} {name}  spark={t1-t0:.1f}s oracle={t2-t1:.1f}s rows={len(spark_pdf)}"
                + ("" if r.ok else f"\n      {r.detail[:400]}"),
                flush=True,
            )
        except Exception as exc:
            records[name] = {"ok": False, "error": str(exc)[:300]}
            print(f"ERROR {name}  {time.time()-t0:.1f}s: {str(exc)[:400]}", flush=True)
        # Crash-safe checkpoint: long sf>=10 sweeps can sit tens of minutes
        # inside ONE oracle; a kill must not lose every completed record.
        # The final write below replaces this with the stamped payload.
        out_ckpt = os.environ.get("DIFF_JSON_OUT")
        if out_ckpt:
            # Atomic: a kill mid-dump must not truncate the very file the
            # checkpoint exists to preserve — write a sibling temp, then
            # os.replace (atomic on POSIX within one filesystem).
            tmp = out_ckpt + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {"sf_dir": sf_dir, "passed": n_ok, "run": n_run,
                     "in_progress": True, "queries": records}, f, indent=1)
            os.replace(tmp, out_ckpt)
    print(f"== {n_ok}/{n_run} passed ==", flush=True)
    # Invariant (VERDICT r6 ask 3): a sweep launched before a registry edit
    # silently misses entries added mid-sweep. A full (un-scoped) sweep must
    # cover the registry AS OF WRITE TIME — re-read it in a FRESH interpreter
    # (reload would trip the duplicate-name guard) and compare; stamp the
    # artifact INCOMPLETE and exit non-zero if anything is missing.
    import subprocess

    full_sweep = len(sys.argv) <= 2
    missing = []
    if full_sweep:
        probe = subprocess.run(
            [sys.executable, "-c",
             "from spark_hbase_connector_spark.queries import REGISTRY;"
             "print('\\n'.join(n for n, s in REGISTRY.items()"
             " if s.oracle is not None))"],
            capture_output=True, text=True, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
        )
        if probe.returncode == 0:
            current = set(probe.stdout.split())
            missing = sorted(current - set(records) - set(excluded))
        else:
            print(f"WARN: registry re-probe failed: {probe.stderr[:300]}",
                  flush=True)
    out = os.environ.get("DIFF_JSON_OUT")
    if out:
        for n, reason in excluded.items():
            records[n] = {"excluded": "oracle_superlinear", "reason": reason}
        payload = {"sf_dir": sf_dir, "passed": n_ok, "run": n_run,
                   "queries": records}
        if missing:
            payload["INCOMPLETE_missing"] = missing
        with open(out, "w") as f:
            json.dump(payload, f, indent=1)
    if missing:
        print(f"== INCOMPLETE: registry grew mid-sweep, missing {missing} ==",
              flush=True)
        spark.stop()
        sys.exit(2)
    spark.stop()
    if n_ok != n_run:
        sys.exit(1)


if __name__ == "__main__":
    main()
