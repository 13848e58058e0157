"""Salted rowkey tables — the classic HBase hot-region pattern.

A monotonically increasing rowkey (timestamps, sequence ids) writes every
new row into the LAST region, so one region server takes the whole write
stream. The standard cure (HBase book, "salted tables"; same idea as
Phoenix ``SALT_BUCKETS``) prefixes the key with a deterministic hash
bucket: ``{salt:02d}#{rowkey}``. Writes spread across ``n_salts``
regions; the cost is that a rowkey *prefix* scan must fan out into one
range per salt.

This module is that pattern over the write_table layout:

- :func:`add_salt` — deterministic salt from ``xxhash64(rowkey)`` (NOT
  random: re-writing the same row must land in the same bucket, and a
  point-read can recompute the salt instead of fanning out).
- :func:`salted_prefix_predicate` — the read-side fan-out: OR of
  ``n_salts`` ``startswith`` ranges. Each disjunct is a contiguous range
  of the salted sort order, so Parquet row-group statistics (and region
  boundaries, on real HBase) prune each salt's files independently —
  the scan touches ~selectivity × n_files files, not all of them.
- :func:`point_key` — salt recomputation for a single-key get: one
  range, no fan-out (the reason the salt is a hash, not a random byte).

At 100 TB the decision is write-skew vs read-fan-out: n_salts multiplies
the number of scan ranges per prefix query but divides the per-region
write rate. 2-digit zero-padded salts keep the encoding sortable up to
100 buckets — enough to spread any realistic region count.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_WIDTH = 2  # zero-padded decimal buckets, sortable up to n_salts=100


def _salt_str(salt: Column) -> Column:
    return F.lpad(salt.cast("string"), SALT_WIDTH, "0")


def add_salt(
    df: DataFrame, rowkey: str, n_salts: int, out_col: str = "skey"
) -> DataFrame:
    """Add the salted key column ``{salt}#{rowkey}`` with
    ``salt = xxhash64(rowkey) mod n_salts`` — deterministic per key."""
    if not 1 <= n_salts <= 10**SALT_WIDTH:
        raise ValueError(f"n_salts must be in [1, {10**SALT_WIDTH}]")
    salt = F.pmod(F.xxhash64(F.col(rowkey).cast("string")), F.lit(n_salts))
    return df.withColumn(
        out_col,
        F.concat(_salt_str(salt), F.lit("#"), F.col(rowkey).cast("string")),
    )


def salted_prefix_predicate(
    prefix: str, n_salts: int, key_col: str = "skey"
) -> Column:
    """Read-side fan-out for ``rowkey LIKE 'prefix%'`` over a salted
    table: one ``startswith`` range per salt, OR-combined. Every disjunct
    is sargable — Catalyst pushes the OR of StartsWith into the scan and
    per-salt row-group stats prune independently."""
    ranges = [
        F.col(key_col).startswith(f"{s:0{SALT_WIDTH}d}#{prefix}")
        for s in range(n_salts)
    ]
    return reduce(lambda a, b: a | b, ranges)


def point_key(rowkey_value, n_salts: int) -> Column:
    """The salted key for ONE rowkey — recomputed, not fanned out: a
    point get stays a single range."""
    v = F.lit(str(rowkey_value))
    salt = F.pmod(F.xxhash64(v), F.lit(n_salts))
    return F.concat(_salt_str(salt), F.lit("#"), v)
