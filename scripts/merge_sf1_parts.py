"""One-shot r6 helper: merge the interrupted sf1 sweep (part 1, parsed from
its log) with the part-2 JSON into CORRECTNESS_r06_sf1_local.json.

Part 1 ran entries up to (not including) dedup_edit_distance before the
sweep was stopped to fix that entry's blocking scheme; its per-entry
results are reconstructed from the runner's PASS/ERROR lines. Entries
re-run in part 2 (everything from dedup_edit_distance on, plus the fixed
recursive_tree_rollup) take the part-2 record.
"""

import json
import re
import sys

log1, json2, out = sys.argv[1], sys.argv[2], sys.argv[3]

records = {}
pat = re.compile(
    r"^(PASS|FAIL)\s+(\S+)\s+spark=([0-9.]+)s oracle=[0-9.]+s rows=(\d+)"
)
for line in open(log1):
    m = pat.match(line)
    if m:
        status, name, sec, rows = m.groups()
        records[name] = {
            "ok": status == "PASS",
            "rows": int(rows),
            "spark_sec": float(sec),
            "detail": None,
        }
part2 = json.load(open(json2))
records.update(part2["queries"])  # part-2 reruns win
passed = sum(1 for r in records.values() if r.get("ok"))
json.dump(
    {"sf_dir": part2["sf_dir"], "passed": passed, "run": len(records),
     "queries": records},
    open(out, "w"), indent=1,
)
print(f"{passed}/{len(records)} merged -> {out}")
