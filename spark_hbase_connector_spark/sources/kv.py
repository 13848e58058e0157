"""KV-fidelity layout: cell-level HBase data model on Spark.

The reference's physical model is a sorted key-value store: each row is a
set of cells ``(rowkey: bytes, cf, qualifier, value: bytes)`` and the reader
re-assembles one logical row per rowkey, decoding each cell by its declared
type (``HbasePartitionReader.scala:35-81``). This module reproduces that
model *distributed*, for workloads that need byte-level fidelity (e.g.
migrating real HBase exports):

- ``to_kv``: logical DataFrame -> cell DataFrame. One output row per
  non-NULL cell (HBase stores no cell for NULL — sparse semantics).
- ``from_kv``: cell DataFrame -> logical DataFrame. Missing cell decodes to
  SQL NULL (parity: ``HbasePartitionReader.scala:58``).

Scale notes: ``from_kv`` is a single shuffle on rowkey (groupBy + first over
conditional projection — no Python in the grouping path); the byte codec
runs as Arrow-vectorized pandas UDFs, never row-at-a-time Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_hbase_connector_spark.sources import codec
from spark_hbase_connector_spark.sources.catalog import TableCatalog, parse_catalog

KV_SCHEMA = T.StructType(
    [
        T.StructField("rowkey", T.BinaryType(), False),
        T.StructField("cf", T.StringType(), False),
        T.StructField("qualifier", T.StringType(), False),
        T.StructField("value", T.BinaryType(), True),
    ]
)


def _encoder_udf(type_string: str):
    enc, _ = codec.CODECS[type_string.lower()]

    @F.pandas_udf(T.BinaryType())
    def encode_series(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else enc(v))

    return encode_series


def _decoder_udf(type_string: str, spark_type: T.DataType):
    _, dec = codec.CODECS[type_string.lower()]

    @F.pandas_udf(spark_type)
    def decode_series(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else dec(bytes(v)))

    return decode_series


def to_kv(df: DataFrame, catalog: str | dict | TableCatalog) -> DataFrame:
    """Explode a logical DataFrame into HBase-encoded cells.

    NULL values produce no cell (HBase sparsity); the rowkey itself is
    encoded with its declared type's codec (``Result.getRow`` analogue).
    """
    cat = catalog if isinstance(catalog, TableCatalog) else parse_catalog(catalog)
    rk = cat.columns[cat.rowkey]
    rowkey_bytes = _encoder_udf(rk.type_string)(F.col(cat.rowkey)).alias("rowkey")
    pieces = []
    for name, col in cat.columns.items():
        if col.is_rowkey:
            continue
        cell = df.select(
            rowkey_bytes,
            F.lit(col.column_family).alias("cf"),
            F.lit(col.column).alias("qualifier"),
            _encoder_udf(col.type_string)(F.col(name)).alias("value"),
        ).where(F.col(name).isNotNull())
        pieces.append(cell)
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def from_kv(kv: DataFrame, catalog: str | dict | TableCatalog) -> DataFrame:
    """Re-assemble logical rows from cells (one shuffle on rowkey).

    Equivalent to the reference's per-Result decode loop
    (``HbasePartitionReader.scala:35-81``) but expressed as a pivot-style
    aggregation: for each declared column, take the value of the matching
    (cf, qualifier) cell if present, else NULL.
    """
    cat = catalog if isinstance(catalog, TableCatalog) else parse_catalog(catalog)
    aggs = []
    for name, col in cat.columns.items():
        if col.is_rowkey:
            continue
        match = (F.col("cf") == col.column_family) & (F.col("qualifier") == col.column)
        aggs.append(
            F.first(F.when(match, F.col("value")), ignorenulls=True).alias(f"__raw_{name}")
        )
    grouped = kv.groupBy("rowkey").agg(*aggs)
    rk = cat.columns[cat.rowkey]
    projections = []
    for name, col in cat.columns.items():
        typ = col.spark_type(name)
        if col.is_rowkey:
            expr = _decoder_udf(rk.type_string, typ)(F.col("rowkey"))
        else:
            expr = _decoder_udf(col.type_string, typ)(F.col(f"__raw_{name}"))
        projections.append(
            expr.alias(name, metadata={"columnFamily": col.column_family, "column": col.column})
        )
    return grouped.select(*projections)
