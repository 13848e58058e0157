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


def snapshot_diff(
    old: DataFrame, new: DataFrame, rowkey: str, cols: list[str]
) -> DataFrame:
    """CDC-style diff of two table snapshots: one FULL OUTER join on the
    rowkey classifies every key as insert (new only), delete (old only),
    or update (both present, any compared cell differing null-safely);
    unchanged keys are dropped. Output carries old_/new_ value pairs per
    compared column — a changefeed a downstream consumer can apply.

    Scale: a single co-partitioned shuffle on the rowkey; with both
    snapshots rowkey-sorted Parquet (write_table layout) the join is
    sort-merge without re-sorting, and AQE handles count asymmetry between
    a full snapshot and a small delta."""
    o = old.select(rowkey, *cols).alias("o")
    n = new.select(rowkey, *cols).alias("n")
    joined = o.join(n, F.col(f"o.{rowkey}") == F.col(f"n.{rowkey}"), "full_outer")
    changed = F.lit(False)
    for c in cols:
        changed = changed | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change_type = (
        F.when(F.col(f"o.{rowkey}").isNull(), F.lit("insert"))
        .when(F.col(f"n.{rowkey}").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    out = [
        F.coalesce(F.col(f"n.{rowkey}"), F.col(f"o.{rowkey}")).alias(rowkey),
        change_type.alias("change_type"),
    ]
    for c in cols:
        out += [F.col(f"o.{c}").alias(f"old_{c}"), F.col(f"n.{c}").alias(f"new_{c}")]
    return joined.where(
        F.col(f"o.{rowkey}").isNull() | F.col(f"n.{rowkey}").isNull() | changed
    ).select(*out)


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
