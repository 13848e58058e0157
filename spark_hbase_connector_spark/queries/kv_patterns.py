"""HBase client-pattern parity: Increment / Append mutations and salted
rowkey tables.

The reference connector serves tables its users mutate through the full
HBase client verb set and lay out with the standard hot-region patterns;
these entries express those patterns over the engine's immutable-Parquet
kv layout (operators/mutations.py, sources/salting.py) and prove them
against plain-SQL oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hbase_connector_spark.catalogs import load
from spark_hbase_connector_spark.queries.registry import query

SALTED_CUST_CATALOG = {
    "table": "fixtures:cust_salted",
    "rowkey": "skey",
    "columns": {
        "skey": {"cf": "rowkey", "col": "skey", "type": "string"},
        "c_name": {"cf": "info", "col": "c_name", "type": "string"},
        "c_custkey": {"cf": "info", "col": "c_custkey", "type": "long"},
        "c_acctbal": {"cf": "info", "col": "c_acctbal", "type": "double"},
    },
}


@query(
    "kv_counter_increments",
    oracle="""
    SELECT o_custkey,
           count(*)::BIGINT AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders GROUP BY o_custkey ORDER BY o_custkey
    """,
    tags=("kv", "mutation", "increment"),
)
def kv_counter_increments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HBase ``Increment`` semantics (`operators/mutations.apply_increments`):
    a counter table built from the order history up to key 30000, then the
    remaining orders applied as single-row increment mutations. The deltas
    collapse map-side (partial aggregation per rowkey BEFORE the shuffle —
    a hot counter moves one partial per task, the memstore-coalescing
    analogue), then one co-partitioned full-outer overlay. New custkeys
    (first order after the cutoff) initialize from 0, exactly HBase's
    absent-counter rule. Money counted in exact integer cents — counters
    are longs, no float drift. Determinism: cents derive via
    ``round(x * 100)::long`` (q1 recipe — exact for any stored 2dp
    double, identical in Spark and DuckDB, no per-row decimal cast);
    output carries a total ORDER BY. Output TYPE: the
    oracle wraps the sum in an outer ``CAST(.. AS BIGINT)`` — DuckDB's
    ``sum(BIGINT)`` returns HUGEINT (arrow decimal128(38,0)), which
    hash-mismatches Spark's int64 under the driver's exact-arrow-type
    hash even when every value is equal (root cause of the r5/r6 driver
    reds; see tests/test_oracle_schema_parity.py for the repo-wide gate).
    The oracle is the plain full-history aggregate: base + increments
    must reproduce it key-for-key."""
    from spark_hbase_connector_spark.operators.mutations import apply_increments

    orders = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    head = orders.where(F.col("o_orderkey") <= 30000)
    tail = orders.where(F.col("o_orderkey") > 30000)
    base = head.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(cents).alias("total_cents"),
    )
    increments = tail.select(
        "o_custkey",
        F.lit(1).cast("bigint").alias("n_orders"),
        cents.alias("total_cents"),
    )
    return (
        apply_increments(base, increments, "o_custkey", ["n_orders", "total_cents"])
        .select(
            "o_custkey",
            F.col("n_orders").cast("bigint").alias("n_orders"),
            F.col("total_cents").cast("bigint").alias("total_cents"),
        )
        .orderBy("o_custkey")
    )


@query(
    "kv_append_mutation",
    oracle="""
    WITH p AS (
        SELECT o_custkey,
               string_agg(o_orderpriority, '|'
                          ORDER BY lpad(o_orderkey::VARCHAR, 12, '0'),
                                   o_orderpriority) AS app
        FROM orders GROUP BY o_custkey
    )
    SELECT c_custkey,
           CASE WHEN p.app IS NULL THEN c_mktsegment
                ELSE c_mktsegment || '|' || p.app END AS journey
    FROM customer LEFT JOIN p ON p.o_custkey = c_custkey
    """,
    tags=("kv", "mutation", "append"),
)
def kv_append_mutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HBase ``Append`` semantics (`operators/mutations.apply_appends`):
    every order appends its priority onto the customer's journey cell, in
    mutation order — ts = zero-padded orderkey (unique, so the order is
    total; the operator additionally tie-breaks on the piece so ANY ts
    collisions stay deterministic). Customers with no orders keep their
    base cell untouched. Per-key state in the aggregation is the appended
    payload itself (collect_list of this key's pieces), never the table —
    the same reason HBase can apply Append under a row lock. The oracle
    replays the concatenation with ordered string_agg."""
    from spark_hbase_connector_spark.operators.mutations import apply_appends

    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    base = customer.select(
        "c_custkey", F.col("c_mktsegment").alias("journey")
    )
    appends = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("mut_ts"),
        F.col("o_orderpriority").alias("journey"),
    )
    return apply_appends(
        base, appends, "c_custkey", value_col="journey", ts_col="mut_ts", sep="|"
    )


@query(
    "kv_merge_into",
    oracle="""
    WITH src AS (
      SELECT o_custkey AS k,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100 AS s_total,
             count(*)::BIGINT AS n_orders
      FROM orders GROUP BY o_custkey
      UNION ALL SELECT 10000001, 111.11, 1
      UNION ALL SELECT 10000002, 222.22, 0
    ),
    surviving AS (
      SELECT c.c_custkey,
             CASE WHEN s.k IS NOT NULL
                  THEN round(c.c_acctbal + s.s_total, 2)
                  ELSE round(c.c_acctbal, 2) END AS c_acctbal,
             CASE WHEN s.k IS NOT NULL THEN 'ACTIVE'
                  ELSE c.c_mktsegment END AS c_mktsegment
      FROM customer c LEFT JOIN src s ON s.k = c.c_custkey
      WHERE NOT (s.k IS NOT NULL AND s.n_orders >= 25)
    ),
    inserted AS (
      SELECT s.k AS c_custkey, round(s.s_total, 2) AS c_acctbal,
             'NEW' AS c_mktsegment
      FROM src s LEFT JOIN customer c ON c.c_custkey = s.k
      WHERE c.c_custkey IS NULL AND s.n_orders > 0
    )
    SELECT * FROM surviving UNION ALL SELECT * FROM inserted
    """,
    tags=("kv", "mutation", "merge"),
)
def kv_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI MERGE INTO over the kv layout (`operators/upsert.merge_rows`):
    per-customer order aggregates merge into the customer table in ONE
    full-outer join — WHEN MATCHED AND n_orders >= 25 THEN DELETE (close
    over-limit accounts), WHEN MATCHED THEN UPDATE SET acctbal :=
    b.acctbal + s.total (the full ANSI SET form referencing BOTH sides),
    segment := 'ACTIVE'; WHEN NOT MATCHED AND n_orders > 0 THEN INSERT
    (two synthetic prospect custkeys ride along in the source; the
    zero-order one proves the insert condition gates). Base-only
    customers pass through byte-untouched. The oracle replays the MERGE
    as surviving ∪ inserted CTEs. HBase expresses this workload as
    interleaved put/delete batches — here it is one deterministic
    transform whose output can be written straight back via
    write_table."""
    from spark_hbase_connector_spark.operators.upsert import merge_rows

    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    agg = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        # exact cents sum (money rule, q1 recipe)
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast(
                "double"
            )
            / 100
        ).alias("s_total"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    synth = spark.createDataFrame(
        [(10000001, 111.11, 1), (10000002, 222.22, 0)],
        "c_custkey long, s_total double, n_orders long",
    )
    source = agg.unionByName(synth)
    base = customer.select("c_custkey", "c_acctbal", "c_mktsegment")
    merged = merge_rows(
        base,
        source,
        "c_custkey",
        update_set={
            "c_acctbal": F.round(F.col("b.c_acctbal") + F.col("s.s_total"), 2),
            "c_mktsegment": F.lit("ACTIVE"),
        },
        delete_cond=F.col("s.n_orders") >= 25,
        insert_values={
            "c_acctbal": F.round(F.col("s.s_total"), 2),
            "c_mktsegment": F.lit("NEW"),
        },
        insert_cond=F.col("s.n_orders") > 0,
    )
    return merged.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
    )


@query(
    "scan_salted_rowkey",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE c_name LIKE 'Customer#00000001%'
    """,
    tags=("scan", "salting", "kv"),
)
def scan_salted_rowkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted rowkey table round trip (`sources/salting.py` — the HBase
    hot-region pattern / Phoenix SALT_BUCKETS): customer written under
    ``{xxhash64(c_name)%8:02d}#c_name`` so a monotone key stream spreads
    over 8 buckets, then the prefix scan ``c_name LIKE 'Customer#00000001%'``
    fans out into 8 ``startswith`` ranges (one per salt — each sargable,
    each pruned by its own row-group stats). The oracle runs the unsalted
    LIKE: salting must change the layout, never the answer."""
    from spark_hbase_connector_spark.sources.salting import (
        add_salt,
        salted_prefix_predicate,
    )
    from spark_hbase_connector_spark.sources.table import load_table, write_table

    sf = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(
        os.environ.get("SPARK_GRAFT_TMP", "/tmp"),
        "spark_hbase_connector_fixtures",
        f"cust_salted_{sf}",
    )
    customer = load(spark, sf_dir, "customer")
    salted = add_salt(
        customer.select("c_name", "c_custkey", "c_acctbal"),
        rowkey="c_name",
        n_salts=8,
        out_col="skey",
    )
    write_table(salted, SALTED_CUST_CATALOG, path, num_partitions=8)
    tbl = load_table(spark, SALTED_CUST_CATALOG, path, physical_naming="cf:col")
    return tbl.where(
        salted_prefix_predicate("Customer#00000001", n_salts=8, key_col="skey")
    ).select("c_custkey", "c_name", "c_acctbal")
