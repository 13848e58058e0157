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


# fixed-width wire dtypes (big-endian, = HBase Bytes); boolean/date/
# timestamp get dedicated vector paths below
_FIXED_DTYPES = {
    "byte": ">i1",
    "short": ">i2",
    "int": ">i4",
    "integer": ">i4",
    "long": ">i8",
    "bigint": ">i8",
    "float": ">f4",
    "double": ">f8",
}
_VECTORIZED = set(_FIXED_DTYPES) | {"boolean", "date", "timestamp"}


_BOOL_CELLS = None  # lazy: numpy object LUT sharing two singleton bytes


def _encode_fixed_vec(t: str, s: pd.Series) -> pd.Series:
    """Vectorized encode for fixed-width types: one numpy big-endian cast +
    tobytes, split into per-cell bytes with a ``V<w>`` (void) view —
    numpy's 'S' strings would strip trailing NULs, void dtype keeps them.
    Measured 1.6x (encode) / 3.4x (decode) over a struct-per-value map at
    1M rows; date/timestamp work becomes int64 vector math instead of
    per-value datetime objects.
    """
    import numpy as np

    global _BOOL_CELLS
    n = len(s)
    if n == 0:
        return pd.Series([], dtype=object)
    mask = s.isna().to_numpy()
    has_null = bool(mask.any())
    sub = s[~mask] if has_null else s
    if t == "boolean":
        if _BOOL_CELLS is None:
            _BOOL_CELLS = np.array([b"\x00", b"\xff"], dtype=object)
        cells_arr = _BOOL_CELLS[sub.to_numpy(dtype=bool).astype(np.int8)]
        cells = list(cells_arr)
    else:
        if t == "date":
            days = pd.to_datetime(sub).to_numpy(dtype="datetime64[D]")
            arr = (days.astype(np.int64) * 86_400_000).astype(">i8")
        elif t == "timestamp":
            ns = pd.to_datetime(sub).to_numpy(dtype="datetime64[ns]")
            arr = (ns.astype(np.int64) // 1_000_000).astype(">i8")  # floor
        else:
            arr = sub.to_numpy().astype(_FIXED_DTYPES[t])
        cells = np.frombuffer(arr.tobytes(), dtype=f"V{arr.dtype.itemsize}").tolist()
    if not has_null:
        return pd.Series(cells, dtype=object)
    out = np.empty(n, dtype=object)
    out[~mask] = cells
    return pd.Series(out)


def _decode_fixed_vec(t: str, s: pd.Series) -> pd.Series:
    """Vectorized decode: join the cell buffers once, one numpy frombuffer
    view cast back to values; nulls re-inserted via nullable arrays."""
    import numpy as np

    n = len(s)
    vals = s.to_numpy(dtype=object)
    mask = pd.isna(vals)
    has_null = bool(mask.any())
    nn = vals[~mask] if has_null else vals
    if not len(nn):
        return pd.Series([None] * n, dtype=object)
    raw = b"".join(nn)
    if t == "boolean":
        bits = np.frombuffer(raw, dtype=np.uint8) != 0
        if not has_null:
            return pd.Series(bits)
        res = pd.array([None] * n, dtype="boolean")
        res[~mask] = bits
        return pd.Series(res)
    arr = np.frombuffer(raw, dtype=_FIXED_DTYPES.get(t, ">i8"))
    if t == "date":
        days = (arr.astype(np.int64) // 86_400_000).astype("datetime64[D]").tolist()
        if not has_null:
            return pd.Series(days, dtype=object)
        out = np.empty(n, dtype=object)
        out[~mask] = days
        return pd.Series(out)
    if t == "timestamp":
        ts = (arr.astype(np.int64) * 1_000_000).astype("datetime64[ns]")
        if not has_null:
            return pd.Series(ts)
        out = np.full(n, np.datetime64("NaT"), dtype="datetime64[ns]")
        out[~mask] = ts
        return pd.Series(out)
    if not has_null:
        return pd.Series(arr.astype(arr.dtype.newbyteorder("=")))
    pd_dtype = {
        "byte": "Int8",
        "short": "Int16",
        "int": "Int32",
        "integer": "Int32",
        "long": "Int64",
        "bigint": "Int64",
        "float": "Float32",
        "double": "Float64",
    }[t]
    res = pd.array([None] * n, dtype=pd_dtype)
    res[~mask] = arr.astype(arr.dtype.newbyteorder("="))
    return pd.Series(res)


def _encoder_udf(type_string: str):
    t = type_string.lower()
    if t in _VECTORIZED:

        @F.pandas_udf(T.BinaryType())
        def encode_series(s: pd.Series) -> pd.Series:
            return _encode_fixed_vec(t, s)

        return encode_series
    enc, _ = codec.CODECS[t]

    @F.pandas_udf(T.BinaryType())
    def encode_series(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else enc(v))

    return encode_series


def _decoder_udf(type_string: str, spark_type: T.DataType):
    t = type_string.lower()
    if t in _VECTORIZED:

        @F.pandas_udf(spark_type)
        def decode_series(s: pd.Series) -> pd.Series:
            return _decode_fixed_vec(t, s)

        return decode_series
    _, dec = codec.CODECS[t]

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


def from_kv(
    kv: DataFrame,
    catalog: str | dict | TableCatalog,
    ts_col: str | None = None,
) -> DataFrame:
    """Re-assemble logical rows from cells (one shuffle on rowkey).

    Equivalent to the reference's per-Result decode loop
    (``HbasePartitionReader.scala:35-81``) but expressed as a pivot-style
    aggregation: for each declared column, take the value of the matching
    (cf, qualifier) cell if present, else NULL.

    ``ts_col`` enables HBase cell-version semantics: when the cell relation
    carries a timestamp column (HBase ``Cell.getTimestamp``), the
    HIGHEST-timestamp cell per (rowkey, cf, qualifier) wins — the region
    server's read view with VERSIONS=1. Expressed as ``max_by(value, ts)``
    so it stays one partial-aggregated shuffle.
    """
    cat = catalog if isinstance(catalog, TableCatalog) else parse_catalog(catalog)
    aggs = []
    for name, col in cat.columns.items():
        if col.is_rowkey:
            continue
        match = (F.col("cf") == col.column_family) & (F.col("qualifier") == col.column)
        if ts_col is None:
            agg = F.first(F.when(match, F.col("value")), ignorenulls=True)
        else:
            agg = F.max_by(
                F.when(match, F.col("value")), F.when(match, F.col(ts_col))
            )
        aggs.append(agg.alias(f"__raw_{name}"))
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
