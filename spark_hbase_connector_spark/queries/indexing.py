"""Secondary-index lookup and snapshot-diff (CDC) queries.

HBase can only range-scan the rowkey; querying by attribute value means
either a full-table scan with server-side filters or a maintained *index
table* whose rowkey is ``attr#rowkey`` — the canonical HBase secondary-
index pattern (the reference has no index support at all; its attribute
predicates become full scans with client-side filtering,
`HbasePartitionReader.scala:147` TODO). This module re-expresses the
pattern Spark-first:

- the index table is rowkey-sorted Parquet written by ``write_table`` —
  a prefix predicate on ``attr#`` prunes to the index files covering that
  range (same file-level rowkey-bounds pruning as any scan);
- the matched rowkeys then semi-join the base table. The index result for
  one attribute value is selective by construction, so it broadcasts —
  at 100 TB the base side is never shuffled.

``kv_snapshot_diff`` is the complementary read-side story for HBase's
versioned cells: given two snapshots (e.g. yesterday's and today's
compaction output), emit the changefeed — insert/update/delete per rowkey
with old/new cell values — via one co-partitioned full-outer join
(`operators/upsert.py:snapshot_diff`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hbase_connector_spark.catalogs import load
from spark_hbase_connector_spark.queries.fixtures import _PEOPLE_ORACLE_SRC, people_df
from spark_hbase_connector_spark.queries.registry import query
from spark_hbase_connector_spark.sources.table import load_table, write_table

IDX_CATALOG = {
    "table": "fixtures:cust_seg_idx",
    "rowkey": "ikey",
    "columns": {
        "ikey": {"cf": "rowkey", "col": "ikey", "type": "string"},
        "ref": {"cf": "ref", "col": "ref", "type": "long"},
    },
}


def _fixture_path(name: str, sf_dir: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(
        os.environ.get("SPARK_GRAFT_TMP", "/tmp"),
        "spark_hbase_connector_fixtures",
        f"{name}_{sf}",
    )


@query(
    "secondary_index_lookup",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment
    FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    tags=("index", "scan", "join"),
)
def secondary_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute lookup through a maintained secondary-index table:
    index rowkey = ``mktsegment#custkey(zero-padded)``, written
    rowkey-sorted so the ``BUILDING#`` prefix scan prunes index files;
    the matched base rowkeys broadcast into a semi-join against the base
    table — the base is never shuffled or fully scanned client-side."""
    base = load(spark, sf_dir, "customer")
    path = _fixture_path("cust_seg_idx", sf_dir)
    idx_df = base.select(
        F.concat_ws(
            "#", F.col("c_mktsegment"), F.lpad(F.col("c_custkey").cast("string"), 10, "0")
        ).alias("ikey"),
        F.col("c_custkey").alias("ref"),
    )
    write_table(idx_df, IDX_CATALOG, path, num_partitions=4)
    idx = load_table(spark, IDX_CATALOG, path, physical_naming="cf:col")
    hits = idx.where(F.col("ikey").startswith("BUILDING#")).select("ref")
    return base.join(
        F.broadcast(hits), F.col("c_custkey") == F.col("ref"), "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")


@query(
    "kv_snapshot_diff",
    oracle=f"""
    WITH {_PEOPLE_ORACLE_SRC},
    updates AS (
      SELECT i::BIGINT AS id,
             CASE WHEN i % 2 = 0 THEN 'renamed' || i ELSE NULL END AS name,
             CAST(i % 97 AS INTEGER) AS age
      FROM range(900, 1101) t(i)
    ),
    v1 AS (SELECT id, name, age FROM people),
    v2 AS (
      SELECT coalesce(u.id, p.id) AS id,
             coalesce(u.name, p.name) AS name,
             coalesce(u.age, p.age) AS age
      FROM (SELECT * FROM v1 WHERE id > 10) p
      FULL OUTER JOIN updates u ON p.id = u.id
    )
    SELECT coalesce(v2.id, v1.id) AS id,
           CASE WHEN v1.id IS NULL THEN 'insert'
                WHEN v2.id IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           v1.name AS old_name, v2.name AS new_name,
           v1.age AS old_age, v2.age AS new_age
    FROM v1 FULL OUTER JOIN v2 ON v1.id = v2.id
    WHERE v1.id IS NULL OR v2.id IS NULL
       OR (v1.name IS DISTINCT FROM v2.name)
       OR (v1.age IS DISTINCT FROM v2.age)
    """,
    tags=("cdc", "upsert", "join"),
)
def kv_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changefeed between two snapshots of the people table: v2 deletes
    rowkeys 1..10 and overlays the sparse put batch (900..1100). The diff
    classifies every rowkey insert/update/delete with old/new cell values;
    unchanged rows (including puts that wrote identical values) drop out."""
    from spark_hbase_connector_spark.operators.upsert import overlay_cells, snapshot_diff

    v1 = people_df(spark).select("id", "name", "age")
    i = F.col("id")
    updates = spark.range(900, 1101).select(
        i.cast("long").alias("id"),
        F.when(i % 2 == 0, F.concat(F.lit("renamed"), i)).alias("name"),
        (i % 97).cast("int").alias("age"),
    )
    v2 = overlay_cells(v1.where(F.col("id") > 10), updates, "id")
    return snapshot_diff(v1, v2, "id", ["name", "age"])


@query(
    "secondary_index_maintain",
    oracle="""
    WITH after AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 0 THEN 'MACHINERY'
                  ELSE c_mktsegment END AS seg,
             c_acctbal
      FROM customer
    )
    SELECT seg AS query_segment, c_custkey, round(c_acctbal, 2) AS c_acctbal
    FROM after WHERE seg IN ('MACHINERY', 'BUILDING')
    """,
    tags=("index", "maintenance", "cdc"),
)
def secondary_index_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary-index MAINTENANCE under an update batch — the
    consistency problem HBase secondary indexes are famous for: when a
    row's indexed attribute changes, the index needs a DELETE of the old
    entry and an INSERT of the new one (Phoenix does this server-side;
    done wrong you get ghosts under the old value and misses under the
    new). Update batch: every custkey ≡ 0 (mod 10) moves to MACHINERY.
    The index is delta-MAINTAINED (anti-join out the old ikeys, union in
    the new — never rebuilt from base), then BOTH affected segments are
    looked up through it against the post-update base. A missed insert
    drops moved-in rows from MACHINERY; a missed delete resurrects
    moved-out rows under BUILDING — either is a row-set mismatch against
    the rebuilt-truth oracle. Scale: the delta is update-batch-sized
    (anti join + union), vs an O(table) rebuild."""
    base = load(spark, sf_dir, "customer")
    moved = F.col("c_custkey") % 10 == 0
    after = base.withColumn(
        "seg",
        F.when(moved, F.lit("MACHINERY")).otherwise(F.col("c_mktsegment")),
    )

    def ikey(seg_col, key_col):
        return F.concat_ws(
            "#", seg_col, F.lpad(key_col.cast("string"), 10, "0")
        )

    # the full index as it existed BEFORE the update
    idx0 = base.select(
        ikey(F.col("c_mktsegment"), F.col("c_custkey")).alias("ikey"),
        F.col("c_custkey").alias("ref"),
    )
    # delta maintenance: delete old entries for updated rows, insert new
    upd = base.where(moved)
    old_keys = upd.select(
        ikey(F.col("c_mktsegment"), F.col("c_custkey")).alias("ikey")
    )
    new_rows = upd.select(
        ikey(F.lit("MACHINERY"), F.col("c_custkey")).alias("ikey"),
        F.col("c_custkey").alias("ref"),
    )
    idx1 = idx0.join(old_keys, "ikey", "left_anti").unionByName(new_rows)
    # look up BOTH affected segments through the MAINTAINED index
    hits = idx1.where(
        F.col("ikey").startswith("MACHINERY#")
        | F.col("ikey").startswith("BUILDING#")
    ).select(F.split(F.col("ikey"), "#").getItem(0).alias("query_segment"), "ref")
    return (
        after.join(hits, F.col("c_custkey") == F.col("ref"), "inner")
        .select(
            "query_segment",
            "c_custkey",
            F.round("c_acctbal", 2).alias("c_acctbal"),
        )
    )
