"""Query registry: one entry per operator the engine claims as done.

Each :class:`QuerySpec` pairs a PySpark implementation with the equivalent
ANSI SQL a DuckDB oracle can run on the same parquet views — the driver's
correctness gate runs both and hash-compares. Column names/types must match
exactly (alias both sides identically; cast aggregates so DuckDB's HUGEINT
sums don't leak into the schema).

Conventions:
- float aggregates rounded to 4 decimals on BOTH sides (double summation
  order differs between engines; 4dp is far above the ~1e-9 relative noise);
- outputs that use LIMIT/top-k are made deterministic with a total order;
- ``oracle=None`` marks genuinely non-SQL-expressible ops (driver records a
  rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Register a (spark, sf_dir) -> DataFrame callable as a declared query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, bench=bench, doc=fn.__doc__ or ""
        )
        return fn

    return deco
