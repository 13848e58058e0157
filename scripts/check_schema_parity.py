"""Arrow-type parity sweep: every registry oracle's PLANNED DuckDB schema vs
the Spark DataFrame's ANALYZED schema (VERDICT r6 ask 2). Neither side
executes (Spark entries may still run bounded side work building the frame —
fixtures, streaming replays — so run at sf0.001).

Usage: python scripts/check_schema_parity.py [sf_dir] [name ...]
"""

import sys
import time

sys.path.insert(0, ".")

from spark_hbase_connector_spark import get_spark
from spark_hbase_connector_spark.oracle import duckdb_connection, schema_parity
from spark_hbase_connector_spark.queries import REGISTRY


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(REGISTRY)
    spark = get_spark("schema-parity", cpus=8)
    con = duckdb_connection(sf_dir)
    bad = []
    t0 = time.time()
    for name in names:
        spec = REGISTRY[name]
        if spec.oracle is None:
            continue
        try:
            df = spec.fn(spark, sf_dir)
            rel = con.sql(spec.oracle)
            r = schema_parity(name, df, rel)
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {str(exc)[:300]}", flush=True)
            bad.append(name)
            continue
        if not r.ok:
            print(f"FAIL  {name}: {r.detail[:400]}", flush=True)
            bad.append(name)
    print(f"== {len(names) - len(bad)}/{len(names)} type-parity ok "
          f"({time.time()-t0:.0f}s) ==")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
