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


def merge_rows(
    base: DataFrame,
    source: DataFrame,
    rowkey: str,
    update_set: dict,
    delete_cond=None,
    insert_values: dict | None = None,
    insert_cond=None,
) -> DataFrame:
    """ANSI ``MERGE INTO`` as ONE co-partitioned transform — the
    three-verb batch lakehouse engines expose::

        MERGE INTO base b USING source s ON b.rowkey = s.rowkey
        WHEN MATCHED AND <delete_cond> THEN DELETE
        WHEN MATCHED THEN UPDATE SET <update_set>
        WHEN NOT MATCHED [AND <insert_cond>] THEN INSERT <insert_values>

    (The reference's HBase world runs this workload as interleaved
    put/delete mutation batches; on immutable Parquet it is one
    deterministic merge producing the post-MERGE table.)

    ``update_set`` maps base column -> Column EXPRESSION over the joined
    row (reference both sides: ``F.col("b.x") + F.col("s.y")`` — the
    full ANSI SET form, not just source projection). ``insert_values``
    maps base column -> Column over the source row; None means there is
    no WHEN NOT MATCHED clause (source-only rows are dropped); an
    insert-value mapping missing a column inserts NULL (sparse-cell
    semantics). ``delete_cond`` / ``insert_cond`` are predicates over
    the joined row; per ANSI three-valued logic a NULL condition means
    the verb does NOT apply (coalesced to False internally). ``source``
    must be unique per rowkey — MERGE's own precondition (ANSI raises
    on duplicate matches; enforce upstream with `dedup_latest_by_key`).

    Scale: ONE full-outer join on the rowkey — sort-merge without
    re-sorting on two write_table layouts, AQE-broadcast when the
    source batch is small. No verb needs its own pass: delete is a
    filter, update and insert are projections of the same joined row.
    """
    unknown = (set(update_set) | set(insert_values or {})) - set(base.columns)
    if unknown:
        raise ValueError(
            f"merge_rows: SET/INSERT columns not in base: {sorted(unknown)}"
        )
    b, s = base.alias("b"), source.alias("s")
    joined = b.join(s, F.col(f"b.{rowkey}") == F.col(f"s.{rowkey}"), "full_outer")
    matched = F.col(f"b.{rowkey}").isNotNull() & F.col(f"s.{rowkey}").isNotNull()
    source_only = F.col(f"b.{rowkey}").isNull()
    keep_matched = (
        F.lit(True)
        if delete_cond is None
        else ~F.coalesce(delete_cond, F.lit(False))
    )
    if insert_values is None:
        keep_insert = F.lit(False)  # no WHEN NOT MATCHED clause
    elif insert_cond is None:
        keep_insert = F.lit(True)
    else:
        keep_insert = F.coalesce(insert_cond, F.lit(False))
    keep = (
        F.when(matched, keep_matched)
        .when(source_only, keep_insert)
        .otherwise(F.lit(True))  # base-only rows always survive untouched
    )
    out_cols = [F.coalesce(F.col(f"b.{rowkey}"), F.col(f"s.{rowkey}")).alias(rowkey)]
    for c in base.columns:
        if c == rowkey:
            continue
        upd = update_set.get(c, F.col(f"b.{c}"))
        ins = (insert_values or {}).get(c, F.lit(None))
        expr = (
            F.when(matched, upd)
            .when(source_only, ins)
            .otherwise(F.col(f"b.{c}"))
        )
        out_cols.append(expr.alias(c))
    return joined.where(keep).select(*out_cols)


def cdc_apply_mutations(
    base: DataFrame,
    batch: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    tombstone_type: str = "error",
    type_col: str = "event_type",
    value_cols: tuple[str, ...] = ("value",),
) -> DataFrame:
    """Apply one micro-batch of CDC mutations to a last-writer-wins state
    table, BATCH-SPLIT-INDEPENDENTLY: the post-apply state for a key is a
    pure function of its globally newest mutation ((ts, seq) total order),
    no matter how mutations were sliced into batches or in what order the
    batches arrive. Two properties make that true where a naive
    MERGE-the-batch-latest is not:

    1. every matched verb is gated on the mutation being NEWER than the
       stored state ((s.ts, s.seq) > (b.ts, b.seq)) — a late/stale
       mutation is a no-op instead of overwriting newer state;
    2. deletes are retained as TOMBSTONE rows (``deleted`` flag + the
       tombstone's own ts/seq) rather than physically removed — otherwise
       a stale pre-delete mutation arriving later would see "not matched"
       and resurrect the key.

    State schema: (key, *value_cols, ts, seq, deleted). Read the live view
    with ``where(~deleted)``. Physical tombstone purge is a compaction
    concern (`major_compact_cells`), safe once no in-flight mutation can
    be older than the tombstone (the stream's watermark).

    Scale: one co-partitioned full-outer join per batch via `merge_rows`
    (AQE broadcasts the small batch side); the batch is pre-reduced to its
    newest mutation per key so state rewrite cost is one pass.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(ts_col).desc(), F.col(seq_col).desc())
    latest = (
        batch.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(key, *value_cols, ts_col, seq_col, type_col)
    )
    newer = (F.col(f"s.{ts_col}") > F.col(f"b.{ts_col}")) | (
        (F.col(f"s.{ts_col}") == F.col(f"b.{ts_col}"))
        & (F.col(f"s.{seq_col}") >= F.col(f"b.{seq_col}"))
    )
    is_tomb = F.col(f"s.{type_col}") == tombstone_type
    update_set = {
        c: F.when(newer, F.col(f"s.{c}")).otherwise(F.col(f"b.{c}"))
        for c in (*value_cols, ts_col, seq_col)
    }
    update_set["deleted"] = F.when(newer, is_tomb).otherwise(F.col("b.deleted"))
    insert_values = {c: F.col(f"s.{c}") for c in (*value_cols, ts_col, seq_col)}
    insert_values["deleted"] = is_tomb
    return merge_rows(
        base,
        latest,
        key,
        update_set=update_set,
        insert_values=insert_values,
    )


def major_compact_cells(
    cells: DataFrame,
    max_versions: int = 1,
    ttl_micros: int | None = None,
    now_micros: int | None = None,
    ts_col: str = "ts",
    tombstone_col: str | None = None,
) -> DataFrame:
    """HBase major-compaction semantics over a versioned cell relation
    (rowkey, cf, qualifier, ``ts_col``, value, ...): keep the newest
    ``max_versions`` cells per (rowkey, cf, qualifier) coordinate, drop
    cells older than ``ttl_micros`` relative to the EXPLICIT ``now_micros``
    (determinism: replaying the same compaction yields the same files —
    wall-clock "now" would not), and, when ``tombstone_col`` names a
    boolean delete-marker column, drop every version at-or-below the
    newest tombstone and the tombstone itself.

    This is what the reference's region server does server-side during
    compaction (the store the connector reads, VERSIONS/TTL table
    attributes); Parquet-native, it runs as the cell-level sibling of
    `compact_flush_files`: one hash shuffle on the cell coordinate, a
    rank window (WindowGroupLimit prunes to max_versions rows per
    coordinate below the exchange), and map-side filters for TTL.
    """
    from pyspark.sql import Window

    out = cells
    if ttl_micros is not None:
        if now_micros is None:
            raise ValueError("ttl_micros requires an explicit now_micros")
        out = out.where(
            F.col(ts_col).cast("long") >= F.lit(now_micros - ttl_micros)
        )
    key = ["rowkey", "cf", "qualifier"]
    if tombstone_col is not None:
        # NULL delete-marker means "not a tombstone" (common in changefeeds
        # where only deletes set the flag) — coalesce to False so live cells
        # with a NULL flag survive SQL three-valued logic
        is_tomb = F.coalesce(F.col(tombstone_col), F.lit(False))
        newest_del = (
            out.where(is_tomb)
            .groupBy(*key)
            .agg(F.max(ts_col).alias("__del_ts"))
        )
        out = (
            out.join(newest_del, key, "left")
            .where(F.col("__del_ts").isNull() | (F.col(ts_col) > F.col("__del_ts")))
            .drop("__del_ts")
        )
        out = out.where(~is_tomb)
    w = Window.partitionBy(*key).orderBy(F.col(ts_col).desc())
    return (
        out.withColumn("__v", F.row_number().over(w))
        .where(F.col("__v") <= max_versions)
        .drop("__v")
    )
