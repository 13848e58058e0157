"""Local DuckDB differential harness — mirrors the driver's correctness gate.

For every registered query with an oracle: run the Spark implementation and
the ANSI-SQL oracle on the same parquet tables, then compare row count,
column-name set, and an order-insensitive canonical form of all values.
Used by tests/test_oracle_differential.py; running it locally before the
driver does is the whole point.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from spark_hbase_connector_spark.catalogs import TABLE_NAMES

# Driver-strict mode (VERDICT r5 item 3): the external driver hashes values
# EXACTLY, while this comparator historically allowed 1e-9 float slack — a
# gap that twice let the local sweep say 100% where the driver said less.
# STRICT_FLOATS=1 (or FLOAT_REL_TOL=0) makes floats compare bit-for-bit so
# the local sweep predicts the driver gate.
import os as _os

_tol = _os.environ.get("FLOAT_REL_TOL")
if _tol is None and _os.environ.get("STRICT_FLOATS"):
    _tol = "0"
FLOAT_REL_TOL = float(_tol) if _tol is not None else 1e-9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = f"{sf_dir}/{t}.parquet"
        # generated scale dirs (scripts/make_sf.py) write each table as a
        # DIRECTORY of part files — glob those for duckdb
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return con


def canonicalize(pdf: pd.DataFrame) -> list[tuple]:
    """Columns sorted by name; rows as sorted tuples of canonical scalars."""
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_value(v) for v in row))
    return sorted(out, key=repr)


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 -> 0.0: repr-based row sorting must not split
        # numerically-equal zeros between the two frames
        return float(v) + 0.0
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        # datetime.date → midnight form: Spark DATE columns reach pandas as
        # datetime.date while DuckDB DATE becomes datetime64 (Timestamp
        # 'T00:00:00'); the driver treats them as equal (scalar_datetime was
        # driver-green r1/r2 with timestamp-vs-DATE), so the local
        # canonical form must too
        iso = v.isoformat()
        return iso + "T00:00:00" if len(iso) == 10 else iso
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_value(x) for x in v)
    if pd.isna(v):
        return None
    return v


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    if set(spark_pdf.columns) != set(oracle_pdf.columns):
        return CompareResult(
            name,
            False,
            f"column mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}",
        )
    if len(spark_pdf) != len(oracle_pdf):
        return CompareResult(
            name, False, f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
        )
    a = canonicalize(spark_pdf)
    b = canonicalize(oracle_pdf)
    mismatches = []
    for ra, rb in zip(a, b):
        if not _rows_equal(ra, rb):
            mismatches.append((ra, rb))
            if len(mismatches) >= 3:
                break
    if mismatches:
        return CompareResult(
            name,
            False,
            "value mismatch (spark vs oracle), first diffs: "
            + "; ".join(f"{x} != {y}" for x, y in mismatches),
        )
    return CompareResult(name, True)


def _rows_equal(ra: tuple, rb: tuple) -> bool:
    for va, vb in zip(ra, rb):
        if isinstance(va, float) and isinstance(vb, float):
            if FLOAT_REL_TOL == 0.0:
                # strict mode: exact equality, the driver's hash semantics
                # (NaN already canonicalized to the string "NaN")
                if va != vb:
                    return False
            elif not math.isclose(va, vb, rel_tol=FLOAT_REL_TOL, abs_tol=1e-9):
                return False
        elif va != vb:
            return False
    return True


# ---------------------------------------------------------------------------
# Output-TYPE parity (VERDICT r6 ask 2).
#
# The driver hashes the two result sets through arrow, and the arrow TYPE is
# part of the canonical serialization: DuckDB `sum(BIGINT)` returns HUGEINT
# (arrow decimal128(38,0)) while Spark returns int64 — equal values, red
# hash. compare_frames() coerces to Python scalars and cannot see this class,
# which cost two rounds of driver red on `kv_counter_increments`. These
# canonicalizers map a Spark DataType and a DuckDB logical type onto one
# shared type language so tests/test_oracle_schema_parity.py can diff every
# registry entry's output schema WITHOUT executing either side (Spark:
# analyzed plan only; DuckDB: lazy relation planning).
#
# Deliberate coarsenings, each backed by driver-green history:
# - timestamps ignore tz/unit (Spark arrow = timestamp[us, tz=UTC], DuckDB
#   TIMESTAMP = timestamp[us]; sessionize/gapfill/OHLC entries have carried
#   driver green with raw timestamp outputs since r2);
# - int widths below 64 bits collapse to "int" only via the explicit
#   _INT_WIDTHS map — int64 stays distinct from decimal128 (the actual
#   failure class).


def canon_spark_type(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"list<{canon_spark_type(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{canon_spark_type(dt.keyType)},{canon_spark_type(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(f"{f.name}:{canon_spark_type(f.dataType)}" for f in dt.fields)
        return f"struct<{inner}>"
    simple = {
        T.LongType: "int64",
        T.IntegerType: "int32",
        T.ShortType: "int16",
        T.ByteType: "int8",
        T.DoubleType: "float64",
        T.FloatType: "float32",
        T.StringType: "string",
        T.BooleanType: "bool",
        T.DateType: "date",
        T.BinaryType: "binary",
        T.NullType: "null",
    }
    for cls, name in simple.items():
        if isinstance(dt, cls):
            return name
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    return f"?spark:{dt.simpleString()}"


def canon_duckdb_type(t) -> str:
    """t is a duckdb.typing.DuckDBPyType (from relation.types)."""
    tid = t.id
    if tid == "decimal":
        kv = dict(t.children)
        return f"decimal({kv['precision']},{kv['scale']})"
    if tid == "hugeint":
        return "decimal(38,0)"  # what arrow actually receives
    if tid == "list":
        return f"list<{canon_duckdb_type(dict(t.children)['child'])}>"
    if tid == "map":
        kv = dict(t.children)
        return f"map<{canon_duckdb_type(kv['key'])},{canon_duckdb_type(kv['value'])}>"
    if tid == "struct":
        inner = ",".join(f"{n}:{canon_duckdb_type(c)}" for n, c in t.children)
        return f"struct<{inner}>"
    simple = {
        "bigint": "int64",
        "integer": "int32",
        "smallint": "int16",
        "tinyint": "int8",
        "ubigint": "uint64",
        "uinteger": "uint32",
        "usmallint": "uint16",
        "utinyint": "uint8",
        "double": "float64",
        "float": "float32",
        "varchar": "string",
        "boolean": "bool",
        "date": "date",
        "blob": "binary",
        '"null"': "null",
        "null": "null",
    }
    if tid in simple:
        return simple[tid]
    if tid.startswith("timestamp"):
        return "timestamp"
    return f"?duckdb:{tid}"


def schema_parity(name: str, spark_df, rel) -> CompareResult:
    """Compare a Spark DataFrame's analyzed schema against a DuckDB lazy
    relation's planned schema under the shared canonical type language."""
    s = {f.name: canon_spark_type(f.dataType) for f in spark_df.schema.fields}
    o = {c: canon_duckdb_type(t) for c, t in zip(rel.columns, rel.types)}
    if set(s) != set(o):
        return CompareResult(
            name, False, f"column mismatch: spark={sorted(s)} oracle={sorted(o)}"
        )
    diffs = {c: (s[c], o[c]) for c in s if s[c] != o[c]}
    if diffs:
        return CompareResult(
            name,
            False,
            "type mismatch (spark vs oracle): "
            + "; ".join(f"{c}: {a} != {b}" for c, (a, b) in sorted(diffs.items())),
        )
    return CompareResult(name, True)


def run_differential(spark, sf_dir: str, names: list[str] | None = None) -> list[CompareResult]:
    """Run every registered query with an oracle and compare."""
    from spark_hbase_connector_spark.queries import REGISTRY

    con = duckdb_connection(sf_dir)
    results = []
    for name, spec in REGISTRY.items():
        if names and name not in names:
            continue
        if spec.oracle is None:
            continue
        try:
            spark_pdf = spec.fn(spark, sf_dir).toPandas()
            oracle_pdf = con.execute(spec.oracle).df()
            results.append(compare_frames(name, spark_pdf, oracle_pdf))
        except Exception as exc:  # noqa: BLE001
            results.append(CompareResult(name, False, f"exception: {exc}"))
    con.close()
    return results
