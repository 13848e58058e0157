"""Byte-codec parity with HBase Bytes (HbasePartitionReader.scala:62-101)."""

import datetime as dt
import struct

import pytest
from hypothesis import given, strategies as st

from spark_hbase_connector_spark.sources import codec


def test_known_encodings():
    # HBase Bytes wire format: big-endian signed two's complement
    assert codec.encode("int", 1) == b"\x00\x00\x00\x01"
    assert codec.encode("int", -1) == b"\xff\xff\xff\xff"
    assert codec.encode("long", 1000) == struct.pack(">q", 1000)
    assert codec.encode("short", -2) == b"\xff\xfe"
    assert codec.encode("boolean", True) == b"\xff"
    assert codec.encode("boolean", False) == b"\x00"
    assert codec.encode("string", "people1000") == b"people1000"
    assert codec.encode("string", "中文") == "中文".encode("utf-8")
    assert codec.encode("binary", b"\x00\x01") == b"\x00\x01"


def test_date_is_epoch_millis_at_midnight():
    # TestDataWriter.scala:62-63 stores dates as epoch-millis long
    d = dt.date(2000, 1, 2)
    encoded = codec.encode("date", d)
    assert codec.decode_long(encoded) == 946771200000
    assert codec.decode("date", encoded) == d


def test_timestamp_millis_precision():
    # HbasePartitionReader.scala:78: timestamps stored as epoch millis
    ts = dt.datetime(2020, 6, 1, 12, 30, 15, 123000)
    encoded = codec.encode("timestamp", ts)
    assert codec.decode_long(encoded) == int(
        ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1000
    )
    assert codec.decode("timestamp", encoded) == ts


def test_null_cell_is_sql_null():
    # missing cell -> NULL (HbasePartitionReader.scala:58)
    assert codec.decode("int", None) is None
    assert codec.encode("int", None) is None


@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
def test_int_roundtrip(v):
    assert codec.decode("int", codec.encode("int", v)) == v


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_long_roundtrip(v):
    assert codec.decode("long", codec.encode("long", v)) == v


@given(st.floats(allow_nan=False, width=64))
def test_double_roundtrip(v):
    assert codec.decode("double", codec.encode("double", v)) == v


@given(st.text())
def test_string_roundtrip(v):
    assert codec.decode("string", codec.encode("string", v)) == v


@given(st.dates(min_value=dt.date(1900, 1, 1), max_value=dt.date(2100, 1, 1)))
def test_date_roundtrip(v):
    assert codec.decode("date", codec.encode("date", v)) == v


def test_reference_unsigned_byte_order_defect_documented():
    """SURVEY.md §2.1: HBase BinaryComparator orders encoded bytes unsigned,
    so -1 sorts AFTER 1 for ints — numerically wrong. We document it here and
    never use byte order for comparisons (Spark compares typed values)."""
    enc_neg, enc_pos = codec.encode("int", -1), codec.encode("int", 1)
    assert codec.sort_key(enc_neg) > codec.sort_key(enc_pos)  # byte order: wrong
    assert -1 < 1  # typed order: what our engine uses


@pytest.mark.parametrize("t", ["float", "double"])
def test_float_types_roundtrip_specials(t):
    for v in [0.0, -0.0, 1.5, -2.25]:
        assert codec.decode(t, codec.encode(t, v)) == v


# ---- vectorized KV codec paths agree with the scalar codec, per value ----

_VEC_INT_TYPES = ["byte", "short", "int", "long"]
_VEC_RANGES = {"byte": 2**7, "short": 2**15, "int": 2**31, "long": 2**63}


@given(st.data())
def test_vectorized_encode_matches_scalar(data):
    import pandas as pd

    from spark_hbase_connector_spark.sources.kv import _encode_fixed_vec

    t = data.draw(st.sampled_from(_VEC_INT_TYPES))
    lim = _VEC_RANGES[t]
    vals = data.draw(
        st.lists(
            st.one_of(st.none(), st.integers(min_value=-lim, max_value=lim - 1)),
            min_size=1,
            max_size=50,
        )
    )
    got = _encode_fixed_vec(t, pd.Series(vals, dtype=object))
    want = [None if v is None else codec.encode(t, v) for v in vals]
    assert list(got) == want


@given(
    st.lists(
        st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
        min_size=1,
        max_size=50,
    )
)
def test_vectorized_double_roundtrip(vals):
    import pandas as pd

    from spark_hbase_connector_spark.sources.kv import (
        _decode_fixed_vec,
        _encode_fixed_vec,
    )

    enc = _encode_fixed_vec("double", pd.Series(vals, dtype=object))
    assert list(enc) == [None if v is None else codec.encode("double", v) for v in vals]
    dec = _decode_fixed_vec("double", enc)
    for got, v in zip(dec, vals):
        if v is None:
            assert got is None or got is pd.NA
        else:
            assert got == v


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.datetimes(
                min_value=dt.datetime(1900, 1, 1), max_value=dt.datetime(2100, 1, 1)
            ),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_vectorized_timestamp_matches_scalar(vals):
    import pandas as pd

    from spark_hbase_connector_spark.sources.kv import _encode_fixed_vec

    got = _encode_fixed_vec("timestamp", pd.Series(vals, dtype=object))
    want = [None if v is None else codec.encode("timestamp", v) for v in vals]
    assert list(got) == want
