"""Dump `.explain("formatted")` output for named registry queries to
plans/<tag>/<query>_<suffix>.txt — the before/after plan evidence for
optimization rounds. Usage:

    python scripts/dump_plans.py <suffix> <query> [<query> ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PLANS_TAG (default r10).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_hbase_connector_spark import get_spark  # noqa: E402
from spark_hbase_connector_spark.plans.audit import explain_string  # noqa: E402
from spark_hbase_connector_spark.queries import REGISTRY  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("PLANS_TAG", "r10")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump")
    for name in names:
        plan = explain_string(REGISTRY[name].fn(spark, sf_dir))
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
