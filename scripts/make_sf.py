"""Generate a larger scale factor by deterministic replication of the
driver's sf0.1 testdata (TESTDATA.md layout), for SCALING MEASUREMENT —
the bench decade VERDICT r4 asked for (sf0.1 -> sf1).

Usage:
    python scripts/make_sf.py [replicas] [src_dir] [out_dir]
    # defaults: 10 /root/testdata/sf0.1 /tmp/spark_hbase_connector_testdata/sf1

Weak-scaling construction (replica 0 is the original data verbatim):

- ``region``/``nation`` stay fixed (TPC-H dims are SF-invariant);
- every key column is offset by ``replica * 10_000_000`` with ONE shared
  stride, so all FK relationships (orders->customer, lineitem->orders/
  part/supplier, events.user_id->customer) hold within each replica and
  never collide across replicas: per-key fan-outs, join selectivities and
  group sizes are preserved while distinct-key cardinality grows 10x;
- timestamps are left unchanged: the time range is constant and density
  grows 10x, so window/sessionize/as-of workloads weak-scale in rows per
  bucket (the realistic shape for a fixed-retention corpus);
- ``documents`` replicas r>0 suffix every token with ``_r{r}``: replicas
  are mutually dissimilar, so near-dup pair structure grows ~10x (linear)
  instead of ~100x (every doc pairing with its 9 clones) — text-work
  per row is unchanged;
- ``embeddings`` replicas r>0 are FRESH draws from the per-label
  component-wise Gaussian fitted on the original vectors (seeded):
  cluster geometry and IVF cell occupancy scale 10x without 10 exact
  copies of every vector. Pair-listing queries over a denser corpus
  still grow super-linearly in OUTPUT — that is their semantics, and the
  scaling report names them rather than hiding it.

Each table is written as a DIRECTORY ``{name}.parquet/`` of one part file
per replica, giving the scan the multi-file split a real lake layout has
(duckdb oracles glob directories via ``oracle.duckdb_connection``).

Pure pyarrow/numpy — no Spark session needed.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDE = 10_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]


def _offset_keys(tbl: pa.Table, cols: list[str], r: int) -> pa.Table:
    for c in cols:
        i = tbl.schema.get_field_index(c)
        arr = tbl.column(i)
        typ = arr.type
        shifted = pa.array(
            (arr.to_numpy(zero_copy_only=False) + r * STRIDE), type=typ
        )
        tbl = tbl.set_column(i, tbl.schema.field(i), shifted)
    return tbl


def _salt_documents(tbl: pa.Table, r: int) -> pa.Table:
    texts = tbl.column("text").to_pylist()
    tag = f"_r{r}"
    salted = [" ".join(t + tag for t in s.split(" ")) for s in texts]
    tbl = tbl.set_column(
        tbl.schema.get_field_index("text"),
        tbl.schema.field("text"),
        pa.array(salted, type=pa.string()),
    )
    return tbl.set_column(
        tbl.schema.get_field_index("n_chars"),
        tbl.schema.field("n_chars"),
        pa.array([len(s) for s in salted], type=pa.int64()),
    )


def _fresh_embeddings(tbl: pa.Table, r: int) -> pa.Table:
    labels = tbl.column("label").to_numpy(zero_copy_only=False)
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float32)
    rng = np.random.default_rng(42_000 + r)
    out = np.empty_like(vecs)
    for lab in np.unique(labels):
        m = labels == lab
        mu, sd = vecs[m].mean(axis=0), vecs[m].std(axis=0) + 1e-6
        out[m] = rng.normal(mu, sd, size=(int(m.sum()), vecs.shape[1]))
    emb = pa.array(
        [row.tolist() for row in out.astype(np.float32)],
        type=tbl.schema.field("embedding").type,
    )
    return tbl.set_column(
        tbl.schema.get_field_index("embedding"),
        tbl.schema.field("embedding"),
        emb,
    )


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "/tmp/spark_hbase_connector_testdata/sf1"
    )
    os.makedirs(out, exist_ok=True)
    for t in FIXED:
        shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"{t}: copied (SF-invariant dim)", flush=True)
    for t, keys in KEY_COLS.items():
        base = pq.read_table(f"{src}/{t}.parquet")
        # Replication must start from the PRISTINE sf0.1: a generated sf
        # already carries replica strides, and re-offsetting collides
        # (replica r of stride p lands on p+r — e.g. sf1 -> "sf10" had
        # 500k rows but only 95k distinct doc_ids). Make sf10 with
        # `make_sf.py 100 /root/testdata/sf0.1 ...`, never by chaining.
        for c in keys:
            mx = pc.max(base.column(c)).as_py()
            if mx is not None and mx >= STRIDE:
                raise SystemExit(
                    f"{t}.{c} max={mx} >= STRIDE: {src} is already a "
                    "generated scale factor — replicate from the original "
                    "sf0.1 with a larger replica count instead"
                )
        d = f"{out}/{t}.parquet"
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        for r in range(replicas):
            part = _offset_keys(base, keys, r)
            if r > 0 and t == "documents":
                part = _salt_documents(part, r)
            if r > 0 and t == "embeddings":
                part = _fresh_embeddings(part, r)
            pq.write_table(part, f"{d}/part-{r:02d}.parquet")
        print(f"{t}: {base.num_rows} x {replicas} rows", flush=True)


if __name__ == "__main__":
    main()
