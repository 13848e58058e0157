"""HBase ``Bytes``-compatible value codec.

The reference stores every cell as raw bytes and decodes/encodes with HBase's
``Bytes`` utility (decode sites ``HbasePartitionReader.scala:62-79``, encode
``HbasePartitionReader.scala:89-101``). Our engine stores natively-typed
Parquet, so this codec exists only for (a) the optional KV-fidelity layout
(``sources.kv``) and (b) byte-level parity tests.

Wire format (= org.apache.hadoop.hbase.util.Bytes):

- boolean: 1 byte, ``-1`` for true / ``0`` for false (decode: != 0)
- byte: the first byte of the cell
- short/int/long: 2/4/8-byte big-endian *signed* two's complement
- float/double: IEEE-754 bits, big-endian
- string: UTF-8
- date / timestamp: epoch **milliseconds** as an 8-byte big-endian long
  (``HbasePartitionReader.scala:69,78`` — note Spark timestamps are
  microseconds internally; the conversion loses sub-millisecond precision,
  matching the reference)
- binary: passthrough

A decoded missing cell (``None``) is SQL NULL (``HbasePartitionReader.scala:58``).

Known reference caveat we intentionally do NOT reproduce: HBase's
``BinaryComparator`` orders these encodings as *unsigned* bytes, which
disagrees with numeric order for negative numbers (SURVEY.md §2.1). Our
comparisons are always typed (Spark-side); ``sort_key`` below documents the
byte-order behaviour for tests.
"""

from __future__ import annotations

import datetime as dt
import struct
from typing import Callable

_EPOCH_DATE = dt.date(1970, 1, 1)
_EPOCH_DT = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)


def encode_boolean(v: bool) -> bytes:
    return b"\xff" if v else b"\x00"


def decode_boolean(b: bytes) -> bool:
    return b[0] != 0


def encode_byte(v: int) -> bytes:
    return struct.pack(">b", v)


def decode_byte(b: bytes) -> int:
    return struct.unpack(">b", b[:1])[0]


def encode_short(v: int) -> bytes:
    return struct.pack(">h", v)


def decode_short(b: bytes) -> int:
    return struct.unpack(">h", b)[0]


def encode_int(v: int) -> bytes:
    return struct.pack(">i", v)


def decode_int(b: bytes) -> int:
    return struct.unpack(">i", b)[0]


def encode_long(v: int) -> bytes:
    return struct.pack(">q", v)


def decode_long(b: bytes) -> int:
    return struct.unpack(">q", b)[0]


def encode_float(v: float) -> bytes:
    return struct.pack(">f", v)


def decode_float(b: bytes) -> float:
    return struct.unpack(">f", b)[0]


def encode_double(v: float) -> bytes:
    return struct.pack(">d", v)


def decode_double(b: bytes) -> float:
    return struct.unpack(">d", b)[0]


def encode_string(v: str) -> bytes:
    return v.encode("utf-8")


def decode_string(b: bytes) -> str:
    return b.decode("utf-8")


def encode_date(v: dt.date) -> bytes:
    """Date -> epoch-millis-at-UTC-midnight long (TestDataWriter.scala:62-63)."""
    days = (v - _EPOCH_DATE).days
    return encode_long(days * 86_400_000)


def decode_date(b: bytes) -> dt.date:
    millis = decode_long(b)
    return _EPOCH_DATE + dt.timedelta(days=millis // 86_400_000)


def encode_timestamp(v: dt.datetime) -> bytes:
    """Timestamp -> epoch-millis long; naive datetimes are taken as UTC.

    Exact integer arithmetic (timedelta floor-div): float64 epoch seconds
    only carry ~5e-7 s precision, so ``int(v.timestamp() * 1000)`` can be
    1 ms off for microsecond-precision inputs — breaking byte-level parity
    with the reference's ``Bytes.toBytes(getTime)``.
    """
    if v.tzinfo is None:
        v = v.replace(tzinfo=dt.timezone.utc)
    millis = (v - _EPOCH_DT) // dt.timedelta(milliseconds=1)
    return encode_long(millis)


def decode_timestamp(b: bytes) -> dt.datetime:
    millis = decode_long(b)
    return (_EPOCH_DT + dt.timedelta(milliseconds=millis)).replace(tzinfo=None)


def encode_binary(v: bytes) -> bytes:
    return bytes(v)


def decode_binary(b: bytes) -> bytes:
    return bytes(b)


#: catalog type string -> (encode, decode)
CODECS: dict[str, tuple[Callable, Callable]] = {
    "boolean": (encode_boolean, decode_boolean),
    "byte": (encode_byte, decode_byte),
    "short": (encode_short, decode_short),
    "int": (encode_int, decode_int),
    "integer": (encode_int, decode_int),
    "long": (encode_long, decode_long),
    "bigint": (encode_long, decode_long),
    "float": (encode_float, decode_float),
    "double": (encode_double, decode_double),
    "char": (encode_string, decode_string),
    "varchar": (encode_string, decode_string),
    "string": (encode_string, decode_string),
    "date": (encode_date, decode_date),
    "timestamp": (encode_timestamp, decode_timestamp),
    "binary": (encode_binary, decode_binary),
}


def encode(type_string: str, value):
    """Encode a python value per the declared catalog type; None -> None."""
    if value is None:
        return None
    enc, _ = CODECS[type_string.lower()]
    return enc(value)


def decode(type_string: str, cell: bytes | None):
    """Decode cell bytes per the declared type; missing cell -> SQL NULL."""
    if cell is None:
        return None
    _, dec = CODECS[type_string.lower()]
    return dec(cell)


def sort_key(encoded: bytes) -> bytes:
    """The order HBase's BinaryComparator would use: raw unsigned bytes.

    Provided so tests can *demonstrate* the reference's negative-number
    ordering defect (SURVEY.md §2.1) — the engine itself never compares
    encoded bytes.
    """
    return bytes(encoded)
