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
