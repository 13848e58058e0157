"""HBase mutation verbs beyond Put: Increment and Append, as transforms.

The reference connector reads tables that HBase clients mutate with four
verbs — Put (``operators/upsert.overlay_cells``), Delete (tombstones,
``major_compact_cells``), Increment, and Append (``Table.increment`` /
``Table.append`` in the public HBase client API). A corpus migrated onto
immutable Parquet expresses the last two as batch transforms that produce
the post-mutation table:

- :func:`apply_increments` — HBase ``Increment``: each mutation adds a
  signed delta to a counter cell; an absent counter starts at 0. The
  increment batch collapses map-side (partial aggregation of deltas per
  rowkey BEFORE the shuffle — a hot counter with millions of increments
  moves one partial row per task, the same reason HBase coalesces
  increments in the memstore), then one co-partitioned FULL OUTER join
  applies the summed deltas. At 100 TB both sides are rowkey-sorted
  write_table layouts: sort-merge join without re-sorting.

- :func:`apply_appends` — HBase ``Append``: each mutation concatenates
  bytes onto a cell in mutation order. Order is the whole contract, so
  the caller must supply a totally-ordered ``ts_col`` (HBase uses
  mutation timestamp + region sequence id); ties break on the appended
  value itself so the result is deterministic under any shuffle. The
  append batch collapses per rowkey in one aggregation
  (``array_sort(collect_list(struct(ts, piece)))`` — per-key state is
  the appended payload itself, never the table), then the same
  co-partitioned overlay join.

Neither verb needs read-modify-write loops or driver round trips — the
race HBase serializes with row locks is resolved here by the batch
boundary: one deterministic merge per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_increments(
    base: DataFrame,
    increments: DataFrame,
    rowkey: str,
    counter_cols: list[str],
) -> DataFrame:
    """Apply an ``Increment`` mutation batch to a counter table.

    ``base``: (rowkey, *counter_cols) current counters — NULL counts as 0
    (HBase initializes absent counter cells on first increment).
    ``increments``: (rowkey, *counter_cols) signed deltas, any number of
    rows per key. Keys present only in ``increments`` are created; keys
    with no increments pass through unchanged.
    """
    missing = [c for c in counter_cols if c not in increments.columns]
    if missing:
        raise ValueError(f"increment batch lacks counter columns: {missing}")
    deltas = increments.groupBy(rowkey).agg(
        *[F.sum(c).alias(c) for c in counter_cols]
    )
    b, d = base.alias("b"), deltas.alias("d")
    joined = b.join(d, F.col(f"b.{rowkey}") == F.col(f"d.{rowkey}"), "full_outer")
    out = [F.coalesce(F.col(f"d.{rowkey}"), F.col(f"b.{rowkey}")).alias(rowkey)]
    for c in base.columns:
        if c == rowkey:
            continue
        if c in counter_cols:
            out.append(
                (
                    F.coalesce(F.col(f"b.{c}"), F.lit(0))
                    + F.coalesce(F.col(f"d.{c}"), F.lit(0))
                ).alias(c)
            )
        else:
            out.append(F.col(f"b.{c}").alias(c))
    return joined.select(*out)


def apply_appends(
    base: DataFrame,
    appends: DataFrame,
    rowkey: str,
    value_col: str,
    ts_col: str,
    sep: str = "",
) -> DataFrame:
    """Apply an ``Append`` mutation batch to a string-cell table.

    ``base``: (rowkey, value_col, ...) current cells. ``appends``:
    (rowkey, ts_col, value_col) pieces; per key they concatenate in
    ``(ts_col, value_col)`` order (value breaks ts ties — deterministic
    under any partitioning; supply a unique sequence in ``ts_col`` for
    full HBase fidelity). An append to an absent/NULL cell creates it
    (no leading separator); a key with no appends keeps its cell, NULL
    included.
    """
    pieces = appends.groupBy(rowkey).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(ts_col), F.col(value_col)))
                ),
                lambda s: s[value_col],
            ),
            sep,
        ).alias("__appended")
    )
    b, p = base.alias("b"), pieces.alias("p")
    joined = b.join(p, F.col(f"b.{rowkey}") == F.col(f"p.{rowkey}"), "full_outer")
    bval = F.col(f"b.{value_col}")
    app = F.col("__appended")
    new_val = (
        F.when(app.isNull(), bval)
        .when(bval.isNull(), app)
        .otherwise(F.concat(bval, F.lit(sep), app))
    )
    out = [F.coalesce(F.col(f"p.{rowkey}"), F.col(f"b.{rowkey}")).alias(rowkey)]
    for c in base.columns:
        if c == rowkey:
            continue
        out.append(new_val.alias(c) if c == value_col else F.col(f"b.{c}").alias(c))
    return joined.select(*out)
