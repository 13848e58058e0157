"""Cell-level upsert (HBase put semantics) as a DataFrame transform.

In the reference's storage model a write is a *put*: it creates/overwrites
individual cells, and a column absent from the put leaves the stored cell
untouched. Migrating that workload onto immutable Parquet means expressing
"apply this batch of puts" as a transform that produces the post-put table:

- ``overlay_cells``: FULL OUTER join base/updates on the rowkey, then per
  column ``coalesce(update, base)`` — a NULL in the update row is "no cell
  in the put" (the HBase sparse semantics), so the base value survives.
  New rowkeys appear; existing rowkeys keep un-put cells. One shuffle
  (join on rowkey); at scale both sides are rowkey-sorted Parquet written
  by ``write_table``, so sort-merge join runs without re-sorting, and the
  result can be written straight back with the same layout.

Cell deletion (HBase Delete) is a different verb and is intentionally NOT
expressible through a put — model deletes as an explicit tombstone batch
filtered with an anti-join before the overlay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def overlay_cells(base: DataFrame, updates: DataFrame, rowkey: str) -> DataFrame:
    """Apply a batch of sparse puts to ``base``: per cell, the update wins
    when present (non-NULL); absent cells keep their base value; rowkeys
    only in ``updates`` are inserted. Column sets must match."""
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            f"column sets differ: {sorted(base.columns)} vs {sorted(updates.columns)}"
        )
    b, u = base.alias("b"), updates.alias("u")
    joined = b.join(u, F.col(f"b.{rowkey}") == F.col(f"u.{rowkey}"), "full_outer")
    out_cols = [
        F.coalesce(F.col(f"u.{rowkey}"), F.col(f"b.{rowkey}")).alias(rowkey)
    ] + [
        F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c)
        for c in base.columns
        if c != rowkey
    ]
    return joined.select(*out_cols)
