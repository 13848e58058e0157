"""Catalog parse + type mapping (reference parity: HbaseTableCatalog.scala,
DefaultSource.scala:20-31,45-64)."""

import json

import pytest
from pyspark.sql import types as T

from spark_hbase_connector_spark.sources.catalog import (
    CatalogError,
    TableName,
    parse_catalog,
    type_for,
)

PEOPLE_CATALOG = {
    "table": {"namespace": "lidong", "name": "test"},
    "rowkey": "id",
    "columns": {
        "id": {"cf": "rowkey", "col": "id", "type": "long"},
        "name": {"cf": "info", "col": "name", "type": "string"},
        "alive": {"cf": "info", "col": "alive", "type": "boolean"},
        "age": {"cf": "info", "col": "age", "type": "int"},
        "height": {"cf": "info", "col": "height", "type": "double"},
        "birthDate": {"cf": "info", "col": "birthDate", "type": "date"},
        "birthDateTime": {"cf": "info", "col": "birthDateTime", "type": "timestamp"},
        "b": {"cf": "info", "col": "b", "type": "byte"},
        "c": {"cf": "info", "col": "c", "type": "string"},
    },
}


def test_object_syntax_roundtrip():
    cat = parse_catalog(json.dumps(PEOPLE_CATALOG))
    assert cat.name == "lidong:test"
    assert cat.rowkey == "id"
    assert cat.columns["name"].column_family == "info"
    schema = cat.to_struct_type()
    by_name = {f.name: f for f in schema.fields}
    assert by_name["id"].dataType == T.LongType()
    assert by_name["id"].nullable is False  # rowkey is the only non-nullable
    assert by_name["name"].nullable is True
    assert by_name["name"].metadata == {"columnFamily": "info", "column": "name"}


def test_compact_syntax():
    # "name type cf [col]" — col defaults to the logical name
    cat = parse_catalog(
        {
            "table": "t_atm_info",
            "rowkey": "key",
            "columns": ["key string rowkey", "chinese_name string columns col_x"],
        }
    )
    assert cat.table == TableName(name="t_atm_info", namespace="default")
    assert cat.columns["key"].column == "key"
    assert cat.columns["chinese_name"].column == "col_x"
    assert cat.columns["chinese_name"].column_family == "columns"


def test_table_name_namespace_split():
    assert TableName.parse("ns1:tbl") == TableName(name="tbl", namespace="ns1")
    assert TableName.parse("tbl") == TableName(name="tbl", namespace="default")


@pytest.mark.parametrize(
    "ts,expected",
    [
        ("boolean", T.BooleanType()),
        ("char", T.StringType()),
        ("varchar", T.StringType()),
        ("string", T.StringType()),
        ("int", T.IntegerType()),
        ("integer", T.IntegerType()),
        ("binary", T.BinaryType()),
        ("byte", T.ByteType()),
        ("date", T.DateType()),
        ("double", T.DoubleType()),
        ("float", T.FloatType()),
        ("long", T.LongType()),
        ("bigint", T.LongType()),
        ("short", T.ShortType()),
        ("timestamp", T.TimestampType()),
        # superset beyond the reference:
        ("decimal(12,2)", T.DecimalType(12, 2)),
        ("array<float>", T.ArrayType(T.FloatType())),
        ("map<string,double>", T.MapType(T.StringType(), T.DoubleType())),
    ],
)
def test_type_mapping(ts, expected):
    assert type_for(ts) == expected


def test_calendar_rejected_at_parse_time():
    # the reference declares 'calendar' but cannot read it (MatchError);
    # we reject eagerly with a clear message (SURVEY.md appendix).
    with pytest.raises(CatalogError, match="calendar"):
        type_for("calendar", column="x")


def test_unknown_type_and_missing_keys():
    with pytest.raises(CatalogError, match="unsupported type"):
        type_for("uuid", column="x")
    with pytest.raises(CatalogError, match="missing required key"):
        parse_catalog({"table": "t", "rowkey": "k"})
    with pytest.raises(CatalogError, match="not declared"):
        parse_catalog({"table": "t", "rowkey": "k", "columns": ["a string cf"]})
    with pytest.raises(CatalogError, match="must use column family"):
        parse_catalog({"table": "t", "rowkey": "a", "columns": ["a string cf"]})
