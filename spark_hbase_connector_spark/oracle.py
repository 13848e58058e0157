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
        return v.isoformat()
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
