"""One-shot r6 helper: merge the sf1 sweep parts into
CORRECTNESS_r06_sf1_local.json.

The sf1 sweep ran in three parts because it surfaced (and the round fixed)
two genuine scale defects mid-flight: part 1 stopped at
dedup_edit_distance (length-bucket blocking hung in one quadratic task —
replaced with PassJoin segments), part 2 stopped at
pipeline_semantic_dedup (the recursive-closure oracle hit 92 GB —
replaced with bounded min-label rounds). Earlier parts' per-entry results
are reconstructed from the runner's PASS/FAIL lines; later parts override
earlier ones (re-runs of fixed entries win).

Usage: python scripts/merge_sf1_parts.py out.json log1 [log2 ...] json3
"""

import json
import re
import sys

out = sys.argv[1]
records = {}
pat = re.compile(
    r"^(PASS|FAIL)\s+(\S+)\s+spark=([0-9.]+)s oracle=[0-9.]+s rows=(\d+)"
)
sf_dir = None
for src in sys.argv[2:]:
    if src.endswith(".json"):
        part = json.load(open(src))
        sf_dir = part["sf_dir"]
        records.update(part["queries"])
        continue
    for line in open(src):
        m = pat.match(line)
        if m:
            status, name, sec, rows = m.groups()
            records[name] = {
                "ok": status == "PASS",
                "rows": int(rows),
                "spark_sec": float(sec),
                "detail": None,
            }
passed = sum(1 for r in records.values() if r.get("ok"))
json.dump(
    {"sf_dir": sf_dir or "/tmp/spark_hbase_connector_testdata/sf1",
     "passed": passed, "run": len(records), "queries": records},
    open(out, "w"), indent=1,
)
print(f"{passed}/{len(records)} merged -> {out}")
