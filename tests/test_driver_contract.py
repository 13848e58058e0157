"""Drive the __spark_entry__ contract the way the DRIVER does: a fresh,
default-conf SparkSession (no get_spark tuning) in a subprocess, under a
deliberately non-UTC OS timezone. Queries must pin everything they need
(_pin_session_confs) — a query that is only correct on our tuned session
is a latent driver failure.
"""

from __future__ import annotations

import os
import subprocess
import sys

_SCRIPT = r"""
import sys

from pyspark.sql import SparkSession

sys.path.insert(0, {repo!r})
import __spark_entry__ as e

spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-emulation")
    .getOrCreate()
)

# entry() on sf0.001, like the driver smoke
n = e.entry(spark).count()
assert n > 0, "entry() returned no rows"

# one representative per family, compared against the oracle like the gate
import duckdb

sf = "/root/testdata/sf0.01"
names = [
    "scan_flagship",
    "q1_pricing_summary",
    "agg_quantiles",
    "scalar_json",
    "sessionize_events",
    "asof_join_events",
    "window_ewma",
    "cohort_retention",
    "dedup_minhash_lsh",
    "dedup_components",
    "ann_topk_cosine",
    "text_repetition_signals",
    "text_char_entropy",
    "pipeline_curation",
    "streaming_tumbling_counts",
    "streaming_stream_join_outer",
]
qs, oracles = e.queries(), e.oracle_sql()
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(
        f"CREATE VIEW {{t}} AS SELECT * FROM read_parquet('{{sf}}/{{t}}.parquet')"
    )

sys.path.insert(0, {repo!r})
from spark_hbase_connector_spark.oracle import compare_frames

failures = []
for name in names:
    spark_pdf = qs[name](spark, sf).toPandas()
    oracle_pdf = con.execute(oracles[name]).df()
    r = compare_frames(name, spark_pdf, oracle_pdf)
    if not r.ok:
        failures.append((name, r.detail))
assert not failures, failures
print("DRIVER_CONTRACT_OK", len(names))
"""


def test_contract_on_vanilla_session_non_utc_tz():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # a driver box could run in any zone; the engine must pin its own
    env["TZ"] = "America/New_York"
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=repo)],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
        cwd=repo,
    )
    assert "DRIVER_CONTRACT_OK" in out.stdout, (
        f"stdout:\n{out.stdout[-3000:]}\n\nstderr:\n{out.stderr[-5000:]}"
    )
