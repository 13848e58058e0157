"""Fixture-1 (`people`) end-to-end query — the reference's de-facto test
table, driven through THIS engine's write path, catalog, and codec types.

The reference's only automated-ish coverage is a manual ``main()`` against a
live HBase table ``lidong:test`` with 1000 rows and a catalog mixing
boolean/byte/date/timestamp plus a declared-but-never-written column ``c``
(``ScalaDatasourceTest.scala:10-69``, ``TestDataWriter.scala:47-68``,
FIXTURES.md fixture 1). This module regenerates that dataset
deterministically (value distributions per FIXTURES.md; ``height`` made
deterministic instead of ``random()``), writes it with ``write_table``
(rowkey-sorted, cf:qualifier naming — including a rowkey whose physical
qualifier differs from its logical name, the round-trip the naming
convention must survive), reads it back through the catalog, and runs the
reference's flagship predicate ``id IN (1..5) OR name = 'people1000'``
(``ScalaDatasourceTest.scala:88-91``).

The DuckDB oracle regenerates the same 1000 rows from ``range()`` with the
same formulas — so a codec error in ANY of boolean/byte/int/long/double/
date/timestamp/string, a broken sparse-column NULL projection, or a rowkey
naming regression all surface as a hash mismatch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hbase_connector_spark.catalogs import _pin_session_confs
from spark_hbase_connector_spark.queries.registry import query
from spark_hbase_connector_spark.sources.table import load_table, write_table

PEOPLE_CATALOG = {
    "table": "fixtures:people",
    "rowkey": "id",
    "columns": {
        # rowkey physical qualifier intentionally != logical name: the
        # write->read round-trip must resolve both through one convention
        "id": {"cf": "rowkey", "col": "rk", "type": "long"},
        "name": {"cf": "info", "col": "name", "type": "string"},
        "alive": {"cf": "info", "col": "alive", "type": "boolean"},
        "age": {"cf": "info", "col": "age", "type": "int"},
        "birthDateStr": {"cf": "info", "col": "bds", "type": "string"},
        "birthDateTime": {"cf": "info", "col": "bdt", "type": "timestamp"},
        "birthDate": {"cf": "info", "col": "bd", "type": "date"},
        "height": {"cf": "extra", "col": "height", "type": "double"},
        "b": {"cf": "extra", "col": "b", "type": "byte"},
        # declared, never written -> must read back as NULL (sparse cell)
        "c": {"cf": "extra", "col": "c", "type": "string"},
    },
}

_BASE_TS = "2023-01-01 00:00:00"


def people_df(spark: SparkSession) -> DataFrame:
    """The deterministic 1000-row people dataset (FIXTURES.md fixture 1)."""
    # timestamp literals parse in the session TZ: pin UTC so the dataset is
    # identical on ANY session (e.g. the driver's), matching the oracle's
    # TZ-naive timestamps
    _pin_session_confs(spark)
    bdt = F.expr(f"timestampadd(DAY, id, timestamp'{_BASE_TS}')")
    return spark.range(1, 1001).select(
        F.col("id").cast("long").alias("id"),
        F.concat(F.lit("people"), F.col("id")).alias("name"),
        (F.col("id") % 2 == 0).alias("alive"),
        (F.col("id") % 60).cast("int").alias("age"),
        F.date_format(bdt, "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("birthDateStr"),
        bdt.alias("birthDateTime"),
        F.to_date(bdt).alias("birthDate"),
        F.round(((F.col("id") * 7919) % 1000) / 100.0, 2).alias("height"),
        F.lit(5).cast("byte").alias("b"),
        F.lit(None).cast("string").alias("c"),
    )


_PEOPLE_ORACLE_SRC = f"""
    people AS (
      SELECT i::BIGINT AS id,
             'people' || i AS name,
             (i % 2 = 0) AS alive,
             CAST(i % 60 AS INTEGER) AS age,
             strftime(TIMESTAMP '{_BASE_TS}' + INTERVAL (i) DAY,
                      '%Y-%m-%dT%H:%M:%SZ') AS birthDateStr,
             TIMESTAMP '{_BASE_TS}' + INTERVAL (i) DAY AS birthDateTime,
             CAST(CAST(TIMESTAMP '{_BASE_TS}' + INTERVAL (i) DAY AS DATE)
                  AS VARCHAR) AS birthDate,
             round(((i * 7919) % 1000) / 100.0, 2) AS height,
             CAST(5 AS TINYINT) AS b,
             CAST(NULL AS VARCHAR) AS c
      FROM range(1, 1001) t(i)
    )
"""


@query(
    "people_upsert_overlay",
    oracle=f"""
    WITH {_PEOPLE_ORACLE_SRC},
    updates AS (
      SELECT i::BIGINT AS id,
             CASE WHEN i % 2 = 0 THEN 'renamed' || i ELSE NULL END AS name,
             CAST(i % 97 AS INTEGER) AS age
      FROM range(900, 1101) t(i)
    ),
    merged AS (
      SELECT coalesce(u.id, p.id) AS id,
             coalesce(u.name, p.name) AS name,
             coalesce(u.age, p.age) AS age,
             p.alive
      FROM people p FULL OUTER JOIN updates u ON p.id = u.id
    )
    SELECT id, name, age,
           coalesce(CAST(alive AS VARCHAR), '<NULL>') AS alive_display
    FROM merged
    WHERE id >= 890 AND id <= 1110
    """,
    tags=("fixture", "upsert"),
)
def people_upsert_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HBase put semantics on immutable storage: a batch of sparse puts
    (ids 900..1100; every odd put has no `name` cell) overlaid on the
    people table. Update cells win, absent cells keep base values, new
    rowkeys (1001..1100) are inserted with NULLs for never-put columns —
    exactly a region server's view after the puts."""
    from spark_hbase_connector_spark.operators.upsert import overlay_cells

    base = people_df(spark).select("id", "name", "age", "alive")
    i = F.col("id")
    updates = spark.range(900, 1101).select(
        i.cast("long").alias("id"),
        F.when(i % 2 == 0, F.concat(F.lit("renamed"), i)).alias("name"),
        (i % 97).cast("int").alias("age"),
        F.lit(None).cast("boolean").alias("alive"),
    )
    merged = overlay_cells(base, updates, "id")
    # NULL booleans canonicalize differently across engines (None vs NaN);
    # project through an explicit marker so the comparison is unambiguous
    return merged.where((F.col("id") >= 890) & (F.col("id") <= 1110)).select(
        "id",
        "name",
        "age",
        F.coalesce(F.col("alive").cast("string"), F.lit("<NULL>")).alias(
            "alive_display"
        ),
    )


ATM_CATALOG = {
    "table": "fixtures:atm",
    "rowkey": "key",
    "columns": {
        "key": {"cf": "rowkey", "col": "key", "type": "string"},
        "chinese_name": {"cf": "info", "col": "cn", "type": "string"},
    },
}

# bank names as in the reference's t_atm_info shape (CJK — exercises
# non-ASCII UTF-8 through write/read and string comparison)
_ATM_NAMES = ["工商银行", "建设银行", "农业银行", "中国银行", "交通银行"]


def atm_df(spark: SparkSession) -> DataFrame:
    """Fixture 2: 1000 rows, 32-hex-uppercase string rowkey (md5-derived,
    deterministic), CJK attribute strings (FIXTURES.md fixture 2)."""
    return spark.range(1, 1001).select(
        F.upper(F.md5(F.concat(F.lit("atm"), F.col("id")))).alias("key"),
        F.element_at(
            F.array(*[F.lit(n) for n in _ATM_NAMES]),
            (F.col("id") % len(_ATM_NAMES) + 1).cast("int"),
        ).alias("chinese_name"),
    )


_ATM_ORACLE_SRC = f"""
    atm AS (
      SELECT upper(md5('atm' || i)) AS key,
             (['{_ATM_NAMES[0]}', '{_ATM_NAMES[1]}', '{_ATM_NAMES[2]}',
               '{_ATM_NAMES[3]}', '{_ATM_NAMES[4]}'])[(i % 5 + 1)::INTEGER]
               AS chinese_name
      FROM range(1, 1001) t(i)
    )
"""


@query(
    "atm_key_range_desc",
    oracle=f"""
    WITH {_ATM_ORACLE_SRC}
    SELECT key, chinese_name FROM atm
    WHERE key <= '88888888888888888888888888888888'
    ORDER BY key DESC
    """,
    tags=("fixture", "scan", "utf8"),
)
def atm_key_range_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference fixture 2 (JavaDatasourceTest.java:40): STRING-rowkey range
    + global DESC sort over a write_table round-trip — string rowkey range
    pruning, UTF-8 (CJK) values, lexicographic ordering parity."""
    path = os.path.join(
        os.environ.get("SPARK_GRAFT_TMP", "/tmp"),
        "spark_hbase_connector_fixtures",
        "atm",
    )
    write_table(atm_df(spark), ATM_CATALOG, path, num_partitions=4)
    atm = load_table(spark, ATM_CATALOG, path, physical_naming="cf:col")
    return (
        atm.where(F.col("key") <= "88888888888888888888888888888888")
        .orderBy(F.col("key").desc())
        .select("key", "chinese_name")
    )


EDGE_CATALOG = {
    "table": "fixtures:edge",
    "rowkey": "k",
    "columns": {
        "k": {"cf": "rowkey", "col": "k", "type": "long"},
        "sint": {"cf": "d", "col": "sint", "type": "int"},
        "sfloat": {"cf": "d", "col": "sfloat", "type": "double"},
        "dec": {"cf": "d", "col": "dec", "type": "decimal(12,2)"},
        "s": {"cf": "d", "col": "s", "type": "string"},
        "bin": {"cf": "d", "col": "bin", "type": "binary"},
    },
}


def edge_df(spark: SparkSession) -> DataFrame:
    """Fixture 3 (FIXTURES.md): negative rowkeys, signed ints, ±0.0
    doubles, decimal(12,2) (a type the reference lacks), empty-vs-NULL
    strings, raw binary."""
    i = F.col("id")
    return spark.range(-100, 100).select(
        i.alias("k"),
        (i * 3).cast("int").alias("sint"),
        F.when(i % 7 == 0, F.lit(-0.0)).otherwise(i / 8).alias("sfloat"),
        ((i * 37 % 100000) / 100).cast("decimal(12,2)").alias("dec"),
        F.when(i % 5 == 0, F.lit(None).cast("string"))
        .when(i % 5 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("edge"), i))
        .alias("s"),
        F.encode(F.concat(F.lit("b"), i), "UTF-8").alias("bin"),
    )


_EDGE_ORACLE_SRC = """
    edge AS (
      SELECT i AS k,
             (i * 3)::INTEGER AS sint,
             CASE WHEN i % 7 = 0 THEN -0.0 ELSE i / 8.0 END AS sfloat,
             CAST((i * 37 % 100000) / 100.0 AS DECIMAL(12,2)) AS dec,
             CASE WHEN i % 5 = 0 THEN NULL
                  WHEN i % 5 = 1 THEN ''
                  ELSE 'edge' || i END AS s,
             'b' || i AS bin_str
      FROM range(-100, 100) t(i)
    )
"""


@query(
    "edge_typed_predicates",
    oracle=f"""
    WITH {_EDGE_ORACLE_SRC}
    SELECT k, sint, round(sfloat, 4) AS sfloat,
           CAST(dec AS DOUBLE) AS dec_d,
           coalesce(s, '<NULL>') AS s_display,
           md5(bin_str) AS bin_md5
    FROM edge
    WHERE k < -40 OR (sint >= -15 AND sint <= 15) OR s = ''
    """,
    tags=("fixture", "codec", "scan"),
)
def edge_typed_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture 3: typed predicate semantics the reference gets wrong
    (negative numbers under unsigned byte-order comparison) plus
    decimal(12,2) and binary columns the reference cannot express — all
    through a write_table/load_table round-trip. Output normalizes decimal
    to double and binary to md5 so both engines compare identically;
    NULL-vs-empty-string distinction is asserted via the coalesce marker."""
    path = os.path.join(
        os.environ.get("SPARK_GRAFT_TMP", "/tmp"),
        "spark_hbase_connector_fixtures",
        "edge",
    )
    write_table(edge_df(spark), EDGE_CATALOG, path, num_partitions=4)
    edge = load_table(spark, EDGE_CATALOG, path, physical_naming="cf:col")
    mod = (F.col("k") < -40) | (
        (F.col("sint") >= -15) & (F.col("sint") <= 15)
    ) | (F.col("s") == "")
    return edge.where(mod).select(
        "k",
        "sint",
        F.round("sfloat", 4).alias("sfloat"),
        F.col("dec").cast("double").alias("dec_d"),
        F.coalesce(F.col("s"), F.lit("<NULL>")).alias("s_display"),
        F.md5(F.col("bin")).alias("bin_md5"),
    )


@query(
    "people_flagship",
    oracle=f"""
    WITH {_PEOPLE_ORACLE_SRC}
    SELECT id, name, alive, age, birthDateStr, birthDateTime, birthDate,
           height, b, c
    FROM people
    WHERE id IN (1, 2, 3, 4, 5) OR name = 'people1000'
    """,
    tags=("fixture", "codec", "scan"),
)
def people_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference flagship over fixture 1: write 1000 rows through
    write_table (cf:qualifier layout, rowkey under its catalog qualifier),
    read back through the catalog, filter ``id IN (1..5) OR name =
    'people1000'``. Exercises every codec type end-to-end, the phantom
    column ``c`` -> NULL, and rowkey-range file pruning on the IN list."""
    path = os.path.join(
        os.environ.get("SPARK_GRAFT_TMP", "/tmp"),
        "spark_hbase_connector_fixtures",
        "people",
    )
    write_table(people_df(spark), PEOPLE_CATALOG, path, num_partitions=4)
    ppl = load_table(spark, PEOPLE_CATALOG, path, physical_naming="cf:col")
    out = ppl.where(
        F.col("id").isin(1, 2, 3, 4, 5) | (F.col("name") == "people1000")
    )
    # DATE is exercised through the codec/write/read path above; project it
    # as an ISO string because pandas has no date dtype, so a raw DATE
    # column compares as objects-vs-datetime64 between Spark and DuckDB
    return out.withColumn("birthDate", F.col("birthDate").cast("string"))


@query(
    "schema_evolution_merge",
    oracle="""
    SELECT i::BIGINT AS id, 'u' || i AS name, CAST(NULL AS VARCHAR) AS email
    FROM range(1, 501) t(i)
    UNION ALL
    SELECT i::BIGINT, 'u' || i, 'u' || i || '@example.com'
    FROM range(501, 1001) t(i)
    """,
    tags=("fixture", "schema-evolution"),
)
def schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on a long-lived table: batch 1 was written before
    the ``email`` column existed; batch 2 carries it. Reading both with
    ``mergeSchema`` reconciles footers into the superset schema and
    NULL-fills the missing column for old files — the additive-column
    migration every multi-year ingest hits. (At 100 TB, pin the merged
    schema in the catalog instead of paying footer reconciliation per
    query; column-add stays a metadata-only operation either way.)"""
    root = os.path.join(
        os.environ.get("SPARK_GRAFT_TMP", "/tmp"),
        "spark_hbase_connector_fixtures",
        "schema_evo",
    )
    i = F.col("id")
    uname = F.concat(F.lit("u"), i.cast("string"))
    spark.range(1, 501).select(i.alias("id"), uname.alias("name")).write.mode(
        "overwrite"
    ).parquet(root + "/batch1")
    spark.range(501, 1001).select(
        i.alias("id"),
        uname.alias("name"),
        F.concat(uname, F.lit("@example.com")).alias("email"),
    ).write.mode("overwrite").parquet(root + "/batch2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        root + "/batch1", root + "/batch2"
    )
    return merged.select("id", "name", "email")


@query(
    "kv_major_compact_versions",
    oracle="""
    WITH ks AS (SELECT k FROM range(1, 201) t(k)),
    cells AS (
      SELECT k AS rowkey, 'd' AS cf,
             CASE WHEN k % 2 = 0 THEN 'x' ELSE 'y' END AS qualifier,
             k * 10 + v AS ts, k * 1000 + v AS value,
             (k % 7 = 0 AND v = k % 3 + 1) AS deleted
      FROM ks, unnest(range(1, k % 3 + 2)) t(v)
    ),
    live AS (SELECT * FROM cells WHERE ts >= 500),
    del AS (
      SELECT rowkey, cf, qualifier, max(ts) AS del_ts
      FROM live WHERE deleted GROUP BY 1, 2, 3
    ),
    kept AS (
      SELECT l.* FROM live l LEFT JOIN del
        ON l.rowkey = del.rowkey AND l.cf = del.cf AND l.qualifier = del.qualifier
      WHERE (del.del_ts IS NULL OR l.ts > del.del_ts) AND NOT l.deleted
    ),
    ranked AS (
      SELECT rowkey, qualifier, ts, value,
             row_number() OVER (PARTITION BY rowkey, cf, qualifier
                                ORDER BY ts DESC) AS v
      FROM kept
    )
    SELECT rowkey, qualifier, ts, value FROM ranked WHERE v <= 2
    ORDER BY rowkey, qualifier, ts
    """,
    tags=("kv", "compaction", "versions"),
)
def kv_major_compact_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HBase major-compaction read view (VERSIONS=2 + TTL + delete
    markers) over a deterministic generated cell history, via
    `operators/upsert.py:major_compact_cells`: newest tombstone hides all
    versions at-or-below it, expired cells (explicit now, never
    wall-clock) drop map-side, then the newest 2 versions per
    (rowkey, cf, qualifier) survive. One coordinate-keyed shuffle;
    WindowGroupLimit prunes to max_versions rows per coordinate below
    the exchange. The oracle replays the identical policy in SQL."""
    from spark_hbase_connector_spark.operators.upsert import major_compact_cells

    ks = spark.range(1, 201).select(F.col("id").alias("k"))
    cells = (
        ks.select(
            "k", F.explode(F.sequence(F.lit(1), F.col("k") % 3 + 1)).alias("v")
        )
        .select(
            F.col("k").alias("rowkey"),
            F.lit("d").alias("cf"),
            F.when(F.col("k") % 2 == 0, "x").otherwise("y").alias("qualifier"),
            (F.col("k") * 10 + F.col("v")).alias("ts"),
            (F.col("k") * 1000 + F.col("v")).alias("value"),
            ((F.col("k") % 7 == 0) & (F.col("v") == F.col("k") % 3 + 1)).alias(
                "deleted"
            ),
        )
    )
    compacted = major_compact_cells(
        cells,
        max_versions=2,
        ttl_micros=2500,
        now_micros=3000,
        tombstone_col="deleted",
    )
    return compacted.select("rowkey", "qualifier", "ts", "value").orderBy(
        "rowkey", "qualifier", "ts"
    )


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderkey,
           CAST((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) + 50)
                // 100 AS DOUBLE) / 100 AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY o.o_orderkey
    ORDER BY revenue DESC, o_orderkey LIMIT 50
    """,
    tags=("fixture", "join", "bucketed"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ZERO-SHUFFLE fact-fact join: orders and lineitem written as
    hash-bucketed tables on the join key (`write_bucketed`), then joined
    with broadcast disabled — Spark proves co-location from the bucket
    spec and plans a sort-merge join with NO Exchange on either side
    (asserted at build time below, and unit-tested in
    `tests/test_source.py`). At 100 TB this is the strategy for a join
    repeated across a pipeline: bucket both fact tables once, and every
    subsequent join/aggregation on that key is shuffle-free. Fixture
    entry: rebuilds the bucketed tables from the sf parquet each run."""
    import shutil

    from spark_hbase_connector_spark.catalogs import load as _load
    from spark_hbase_connector_spark.plans.audit import explain_string

    orders = _load(spark, sf_dir, "orders")
    lineitem = _load(spark, sf_dir, "lineitem")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("bkt_orders", "bkt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (
        orders.repartition(8, "o_orderkey")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bkt_orders")
    )
    (
        lineitem.repartition(8, "l_orderkey")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("bkt_lineitem")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        o = spark.table("bkt_orders").where(F.col("o_orderstatus") == "O")
        l = spark.table("bkt_lineitem")
        # Money rule (CLAUDE.md): per-order groups are <= 7 addends, but
        # rounding a scale-4-exact sum to 2dp lands exactly ON a .xx50
        # tie for ~1%% of orders, where Spark (BigDecimal expansion) and
        # DuckDB (multiply-first) can disagree — the q1 fixed-point
        # recipe makes the half-up tie-break integer-exact on both.
        j = o.join(l, o.o_orderkey == l.l_orderkey).groupBy("o_orderkey").agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (
                    F.lit(100)
                    - F.round(F.col("l_discount") * 100).cast("long")
                )
            ).alias("__rev4")
        ).select(
            "o_orderkey",
            (F.expr("CAST((__rev4 + 50) div 100 AS DOUBLE)") / 100).alias(
                "revenue"
            ),
        )
        plan = explain_string(j)
        assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan}"
        return j.orderBy(F.col("revenue").desc(), "o_orderkey").limit(50)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@query(
    "dq_expectations_report",
    oracle="""
    WITH rowstats AS (
      SELECT
        CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS nn_qty,
        CAST(sum(CASE WHEN l_discount BETWEEN 0 AND 0.1 THEN 0 ELSE 1 END)
             AS BIGINT) AS rng_disc,
        CAST(sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END)
             AS BIGINT) AS acc_flag,
        CAST(sum(CASE WHEN regexp_matches(l_shipmode_like, '^[A-Z ]+$')
                      THEN 0 ELSE 1 END) AS BIGINT) AS rx_status
      FROM (SELECT l_quantity, l_discount, l_returnflag,
                   upper(l_linestatus) AS l_shipmode_like
            FROM lineitem)
    ),
    uq AS (
      SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS n FROM (
        SELECT count(*) AS c FROM lineitem
        GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1
      )
    ),
    fk AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem l
      LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderkey IS NULL
    )
    SELECT rule, n_violations, n_violations = 0 AS passed FROM (
      SELECT 'accepted_values(l_returnflag)' AS rule, acc_flag AS n_violations FROM rowstats
      UNION ALL SELECT 'foreign_key(l_orderkey)', fk.n FROM fk
      UNION ALL SELECT 'in_range(l_discount,0,0.1)', rng_disc FROM rowstats
      UNION ALL SELECT 'matches(status_u)', rx_status FROM rowstats
      UNION ALL SELECT 'not_null(l_quantity)', nn_qty FROM rowstats
      UNION ALL SELECT 'unique(l_orderkey,l_linenumber)', uq.n FROM uq
    ) ORDER BY rule
    """,
    tags=("fixture", "quality", "expectations"),
)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (`operators/expectations.py`): six
    expectations over lineitem — four ROW-level rules compiled into ONE
    aggregation pass (single scan regardless of rule count), one
    uniqueness rule (one partial-aggregated groupBy), one referential
    rule (broadcast anti join against orders keys). The report is the
    publish gate: a pipeline promotes the table only when every row of
    this result has passed=true. Oracle replays each rule in SQL."""
    from spark_hbase_connector_spark.catalogs import load as _load
    from spark_hbase_connector_spark.operators.expectations import (
        accepted_values,
        expect,
        foreign_key,
        in_range,
        matches,
        not_null,
        unique,
    )

    li = _load(spark, sf_dir, "lineitem").withColumn(
        "status_u", F.upper("l_linestatus")
    )
    orders = _load(spark, sf_dir, "orders")
    rules = [
        not_null("l_quantity"),
        in_range("l_discount", 0, 0.1),
        accepted_values("l_returnflag", ["A", "N", "R"]),
        matches("status_u", "^[A-Z ]+$"),
        unique("l_orderkey", "l_linenumber"),
        foreign_key("l_orderkey", orders, "o_orderkey"),
    ]
    return expect(li, rules)


@query(
    "kv_time_travel_read",
    oracle="""
    WITH ks AS (SELECT k FROM range(1, 201) t(k)),
    cells AS (
      SELECT k AS rowkey, k * 10 + v AS ts, k * 1000 + v AS value
      FROM ks, unnest(range(1, k % 3 + 2)) t(v)
    ),
    st AS (
      SELECT rowkey, max_by(value, ts) AS value_asof, max(ts) AS ts_asof
      FROM cells WHERE ts <= 1000 GROUP BY rowkey
    )
    SELECT rowkey, value_asof, ts_asof FROM st ORDER BY rowkey
    """,
    tags=("kv", "versions", "time-travel"),
)
def kv_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel read over versioned cells: table state AS OF ts=1000 —
    filter versions to ts <= T (map-side, rides the scan; at rest the
    row-group ts min/max prunes whole files), then newest-version-wins
    per rowkey via max_by (one partial-aggregated shuffle, the same
    VERSIONS=1 read view `from_kv(ts_col=...)` implements). Rows whose
    every version is later than T are absent — exactly HBase's
    timerange scan semantics. Deterministic generated history shared
    with the oracle (same recipe as `kv_major_compact_versions`)."""
    ks = spark.range(1, 201).select(F.col("id").alias("k"))
    cells = (
        ks.select(
            "k", F.explode(F.sequence(F.lit(1), F.col("k") % 3 + 1)).alias("v")
        )
        .select(
            F.col("k").alias("rowkey"),
            (F.col("k") * 10 + F.col("v")).alias("ts"),
            (F.col("k") * 1000 + F.col("v")).alias("value"),
        )
    )
    return (
        cells.where(F.col("ts") <= 1000)
        .groupBy("rowkey")
        .agg(
            F.max_by("value", "ts").alias("value_asof"),
            F.max("ts").alias("ts_asof"),
        )
        .orderBy("rowkey")
    )
