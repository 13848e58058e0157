"""Catalog definitions for the driver's testdata tables + typed loaders.

Every testdata table gets a catalog document (the engine's native table
description, SURVEY.md §1.1) so the whole query surface exercises the
catalog -> schema -> scan path, exactly like the reference's own tests did
via the `catalog` option (``ScalaDatasourceTest.scala:78-82``).

``load`` returns the logical DataFrame; ``register_all`` exposes each table
as a temp view named like the file (the SQL entry point,
``ScalaDatasourceTest.scala:84``).

Quirk handled here once: ``events.ts`` has shipped as BOTH nanosecond-
precision Parquet (physical int64, Spark reads it via
``spark.sql.legacy.parquet.nanosAsLong``) and as plain ``timestamp[us]``
(TIMESTAMP_NTZ) — the driver's testdata changed encodings between rounds.
``load`` probes the file's actual physical type with pyarrow (one footer
read, no Spark job) and branches:

- ``timestamp[us]``/``[ms]``/``[s]`` -> declare ``timestamp`` and read
  directly (NTZ wall-clock == UTC instant under the pinned UTC session);
- ``timestamp[ns]`` or raw ``int64`` -> declare ``bigint`` and convert with
  ``timestamp_micros(ts div 1000)`` — floor division, byte-identical to
  DuckDB's own ns->us conversion.

Either encoding yields an identical logical schema, so every downstream
query (and the streaming loader, which reuses the same probe) is immune to
this class of drift. ``load`` also re-verifies the resolved schema against
the catalog's declared types — type drift fails loudly at load, never as a
silent NULL column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hbase_connector_spark.sources.table import load_table

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _cat(name: str, rowkey: str, cols: dict[str, str], cf: str = "d") -> dict:
    columns = {}
    for col, typ in cols.items():
        columns[col] = {"cf": "rowkey" if col == rowkey else cf, "col": col, "type": typ}
    return {"table": f"testdata:{name}", "rowkey": rowkey, "columns": columns}


TESTDATA_CATALOGS: dict[str, dict] = {
    "region": _cat("region", "r_regionkey", {"r_regionkey": "int", "r_name": "string"}),
    "nation": _cat(
        "nation",
        "n_nationkey",
        {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    ),
    "customer": _cat(
        "customer",
        "c_custkey",
        {
            "c_custkey": "long",
            "c_name": "string",
            "c_nationkey": "int",
            "c_acctbal": "double",
            "c_mktsegment": "string",
        },
    ),
    "supplier": _cat(
        "supplier",
        "s_suppkey",
        {"s_suppkey": "long", "s_name": "string", "s_nationkey": "int", "s_acctbal": "double"},
    ),
    "part": _cat(
        "part",
        "p_partkey",
        {
            "p_partkey": "long",
            "p_name": "string",
            "p_brand": "string",
            "p_type": "string",
            "p_size": "int",
            "p_retailprice": "double",
        },
    ),
    "orders": _cat(
        "orders",
        "o_orderkey",
        {
            "o_orderkey": "long",
            "o_custkey": "long",
            "o_orderstatus": "string",
            "o_totalprice": "double",
            "o_orderdate": "timestamp",
            "o_orderpriority": "string",
        },
    ),
    "lineitem": _cat(
        "lineitem",
        "l_orderkey",
        {
            "l_orderkey": "long",
            "l_partkey": "long",
            "l_suppkey": "long",
            "l_linenumber": "int",
            "l_quantity": "double",
            "l_extendedprice": "double",
            "l_discount": "double",
            "l_tax": "double",
            "l_returnflag": "string",
            "l_linestatus": "string",
            "l_shipdate": "timestamp",
        },
    ),
    "events": _cat(
        "events",
        "event_id",
        {
            "event_id": "long",
            "ts": "timestamp",  # physical encoding probed per file in load()
            "user_id": "long",
            "event_type": "string",
            "value": "double",
            "props": "string",
        },
    ),
    "documents": _cat(
        "documents",
        "doc_id",
        {
            "doc_id": "long",
            "text": "string",
            "lang": "string",
            "source": "string",
            "n_chars": "long",
        },
    ),
    "embeddings": _cat(
        "embeddings",
        "vec_id",
        {"vec_id": "long", "embedding": "array<float>", "label": "int"},
    ),
}


def _pin_session_confs(spark: SparkSession) -> None:
    """Make queries self-sufficient on ANY session (e.g. the driver's):
    UTC timestamps (oracle comparability) and ns-parquet-as-long reads."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


# physical ts encoding per events file, probed once per path (footer-only
# pyarrow read — no Spark job, no data scan)
_TS_KIND_CACHE: dict[str, str] = {}


def probe_ts_kind(path: str) -> str:
    """'timestamp' (us/ms/s — Spark reads it natively) or 'nanos' (int64 or
    timestamp[ns] — read as raw long under nanosAsLong, floor-divided to us).

    The driver's events.parquet has shipped with both encodings across
    rounds; probing the footer instead of trusting a hardcoded type is what
    keeps every events query green under either."""
    kind = _TS_KIND_CACHE.get(path)
    if kind is None:
        import pyarrow as pa
        import pyarrow.dataset as pads

        t = pads.dataset(path, format="parquet").schema.field("ts").type
        if pa.types.is_timestamp(t) and t.unit != "ns":
            kind = "timestamp"
        else:  # timestamp[ns] or bare int64: both surface as long in Spark
            kind = "nanos"
        _TS_KIND_CACHE[path] = kind
    return kind


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table through the catalog layer."""
    _pin_session_confs(spark)
    cat = TESTDATA_CATALOGS[name]
    path = f"{sf_dir}/{name}.parquet"
    if name == "events" and probe_ts_kind(path) == "nanos":
        nanos_cat = dict(cat, columns=dict(cat["columns"]))
        nanos_cat["columns"]["ts"] = dict(cat["columns"]["ts"], type="bigint")
        df = load_table(spark, nanos_cat, path)
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        df = df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    else:
        df = load_table(spark, cat, path)
    _assert_declared_types(name, cat, df)
    return df


def _assert_declared_types(name: str, cat: dict, df: DataFrame) -> None:
    """Type-drift tripwire: the resolved DataFrame must carry exactly the
    catalog's declared logical types (post-adaptation). A physical file whose
    encoding `load_table` cannot reconcile fails HERE, loudly, instead of
    surfacing as a NULL column three queries later."""
    from spark_hbase_connector_spark.sources.catalog import type_for

    resolved = {f.name: f.dataType for f in df.schema.fields}
    for col, spec in cat["columns"].items():
        want = type_for("timestamp" if col == "ts" and name == "events" else spec["type"], col)
        got = resolved.get(col)
        if got != want:
            raise TypeError(
                f"type drift on {name}.{col}: catalog declares {want.simpleString()}, "
                f"resolved {got.simpleString() if got else 'MISSING'} — physical file "
                "encoding changed; extend the loader's adaptation rules"
            )


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns the DataFrames."""
    out = {}
    for name in TABLE_NAMES:
        df = load(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
