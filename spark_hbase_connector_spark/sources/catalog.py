"""Catalog JSON -> typed Spark schema.

Re-implements (Spark-first, in Python) the catalog model of the reference
connector:

- JSON shape ``{table, rowkey, columns}`` with two accepted column syntaxes
  (object-per-column, or compact ``"name type cf [col]"`` strings) —
  behavioral parity with ``HbaseTableCatalog.scala:52-78`` in the reference.
- ``table`` may be a plain string ``"namespace:name"`` / ``"name"`` or an
  object ``{"namespace": ..., "name": ...}``; namespace defaults to
  ``"default"`` (``HbaseTableCatalog.scala:14,33-39``).
- The rowkey is an ordinary logical column whose pseudo column-family is the
  literal string ``"rowkey"``; it is the only non-nullable column
  (``DefaultSource.scala:24``). All other columns are nullable — a missing
  cell decodes to SQL NULL (``HbasePartitionReader.scala:58``).
- The physical ``(columnFamily, column)`` address rides along as
  ``StructField.metadata`` so column pruning stays compositional
  (``DefaultSource.scala:25-28``).

Deliberate improvements over the reference (documented divergences):

- ``decimal(p,s)``, ``array<...>``, ``map<...>``, ``struct<...>`` are
  supported (the reference comments decimal out, ``DefaultSource.scala:56``,
  and has no nested types).
- ``calendar`` (``CalendarIntervalType``) is rejected *at parse time* with a
  clear error — in the reference it is declared but has no decode case, so
  reading one throws an opaque ``scala.MatchError``
  (``DefaultSource.scala:54`` vs ``HbasePartitionReader.scala:62-79``).
- Unknown types raise ``CatalogError`` naming the column.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

ROWKEY_CF = "rowkey"

#: catalog type string -> Spark type. Superset of DefaultSource.scala:45-64.
_SIMPLE_TYPES: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "char": T.StringType(),
    "varchar": T.StringType(),
    "string": T.StringType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "binary": T.BinaryType(),
    "byte": T.ByteType(),
    "date": T.DateType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "short": T.ShortType(),
    "timestamp": T.TimestampType(),
}

_DECIMAL_RE = re.compile(r"^decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$")


class CatalogError(ValueError):
    """Raised for malformed catalogs or unsupported declared types."""


def type_for(type_string: str, column: str = "?") -> T.DataType:
    """Map a declared catalog type string to a Spark ``DataType``.

    Parity: ``DefaultSource.scala:45-64`` (plus decimal/array/map/struct,
    which the reference lacks; ``calendar`` is rejected eagerly instead of
    failing at read time).
    """
    s = type_string.strip()
    low = s.lower()
    if low in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[low]
    if low == "calendar":
        raise CatalogError(
            f"column {column!r}: type 'calendar' (CalendarInterval) is not "
            "readable from cell bytes; declare 'string' or 'long' instead"
        )
    m = _DECIMAL_RE.match(low)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    # Nested types (array<...>, map<...>, struct<...>) — parsed without
    # needing an active SparkSession.
    if low.startswith(("array", "map", "struct")):
        try:
            return _parse_nested(s)
        except CatalogError:
            raise
        except Exception as exc:  # noqa: BLE001 - surface as CatalogError
            raise CatalogError(f"column {column!r}: bad nested type {s!r}: {exc}") from None
    raise CatalogError(f"column {column!r}: unsupported type {type_string!r}")


def _split_args(body: str) -> list[str]:
    """Split on top-level commas (ignoring commas inside <...> or (...))."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def _parse_nested(s: str) -> T.DataType:
    s = s.strip()
    low = s.lower()
    if low.startswith("array<") and s.endswith(">"):
        return T.ArrayType(type_for(s[6:-1]))
    if low.startswith("map<") and s.endswith(">"):
        args = _split_args(s[4:-1])
        if len(args) != 2:
            raise CatalogError(f"map type needs 2 args: {s!r}")
        return T.MapType(type_for(args[0]), type_for(args[1]))
    if low.startswith("struct<") and s.endswith(">"):
        fields = []
        for part in _split_args(s[7:-1]):
            if ":" not in part:
                raise CatalogError(f"struct field needs 'name:type': {part!r}")
            name, typ = part.split(":", 1)
            fields.append(T.StructField(name.strip(), type_for(typ)))
        return T.StructType(fields)
    raise CatalogError(f"bad nested type {s!r}")


@dataclass(frozen=True)
class TableName:
    """``namespace:name``; namespace defaults to 'default'."""

    name: str
    namespace: str = "default"

    @staticmethod
    def parse(value: object) -> "TableName":
        if isinstance(value, str):
            parts = value.split(":")
            if len(parts) == 1:
                return TableName(name=parts[0])
            if len(parts) == 2:
                return TableName(namespace=parts[0], name=parts[1])
            raise CatalogError(f"bad table name {value!r}")
        if isinstance(value, dict):
            if "name" not in value:
                raise CatalogError(f"table object missing 'name': {value!r}")
            return TableName(name=value["name"], namespace=value.get("namespace", "default"))
        raise CatalogError(f"bad 'table' entry: {value!r}")

    def qualified(self) -> str:
        return f"{self.namespace}:{self.name}"


@dataclass(frozen=True)
class TableColumn:
    """Logical column -> physical (cf, col) + declared type."""

    column_family: str
    column: str
    type_string: str

    @property
    def is_rowkey(self) -> bool:
        return self.column_family == ROWKEY_CF

    def spark_type(self, name: str = "?") -> T.DataType:
        return type_for(self.type_string, column=name)


@dataclass(frozen=True)
class TableCatalog:
    """Parsed catalog: table identity, rowkey column, column map."""

    table: TableName
    rowkey: str
    columns: dict[str, TableColumn] = field(default_factory=dict)

    @property
    def name(self) -> str:
        return self.table.qualified()

    def to_struct_type(self) -> T.StructType:
        """Materialize the declared schema.

        Rowkey is the only non-nullable column; the physical address is
        carried in field metadata (parity: ``DefaultSource.scala:20-31``).
        """
        fields = []
        for name, col in self.columns.items():
            fields.append(
                T.StructField(
                    name,
                    col.spark_type(name),
                    nullable=not col.is_rowkey,
                    metadata={"columnFamily": col.column_family, "column": col.column},
                )
            )
        return T.StructType(fields)


def _parse_column_compact(spec: str) -> tuple[str, TableColumn]:
    """``"name type cf"`` or ``"name type cf col"``.

    Parity: ``HbaseTableCatalog.scala:60-71`` (when col is omitted the
    logical name doubles as the qualifier).
    """
    parts = spec.split()
    if len(parts) == 4:
        name, typ, cf, col = parts
    elif len(parts) == 3:
        name, typ, cf = parts
        col = name
    else:
        raise CatalogError(f"bad compact column spec {spec!r} (want 'name type cf [col]')")
    return name, TableColumn(column_family=cf, column=col, type_string=typ)


def parse_catalog(catalog: str | dict) -> TableCatalog:
    """Parse a catalog JSON document (string or already-loaded dict)."""
    if isinstance(catalog, str):
        try:
            doc = json.loads(catalog)
        except json.JSONDecodeError as exc:
            raise CatalogError(f"catalog is not valid JSON: {exc}") from None
    else:
        doc = catalog
    if not isinstance(doc, dict):
        raise CatalogError(f"catalog must be a JSON object, got {type(doc).__name__}")
    for key in ("table", "rowkey", "columns"):
        if key not in doc:
            raise CatalogError(f"catalog missing required key {key!r}")

    table = TableName.parse(doc["table"])
    rowkey = doc["rowkey"]
    if not isinstance(rowkey, str):
        raise CatalogError(f"'rowkey' must be a string, got {rowkey!r}")

    raw_cols = doc["columns"]
    columns: dict[str, TableColumn] = {}
    if isinstance(raw_cols, list):
        for spec in raw_cols:
            if not isinstance(spec, str):
                raise CatalogError(f"compact column entry must be a string: {spec!r}")
            name, col = _parse_column_compact(spec)
            columns[name] = col
    elif isinstance(raw_cols, dict):
        for name, spec in raw_cols.items():
            if not isinstance(spec, dict):
                raise CatalogError(f"column {name!r}: spec must be an object, got {spec!r}")
            missing = {"cf", "col", "type"} - spec.keys()
            if missing:
                raise CatalogError(f"column {name!r}: spec missing {sorted(missing)}")
            columns[name] = TableColumn(
                column_family=spec["cf"], column=spec["col"], type_string=spec["type"]
            )
    else:
        raise CatalogError("'columns' must be a list of compact specs or an object map")

    if rowkey not in columns:
        raise CatalogError(f"rowkey column {rowkey!r} not declared in columns")
    if not columns[rowkey].is_rowkey:
        raise CatalogError(
            f"rowkey column {rowkey!r} must use column family {ROWKEY_CF!r}, "
            f"got {columns[rowkey].column_family!r}"
        )
    # Validate every declared type eagerly — never a runtime MatchError
    # (fixes the reference's 'calendar' defect, SURVEY.md appendix).
    for name, col in columns.items():
        col.spark_type(name)
    return TableCatalog(table=table, rowkey=rowkey, columns=columns)
