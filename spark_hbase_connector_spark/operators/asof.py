"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as a *composition of built-in ops* (the preferred strategy per
the build rules): tag both sides, union, and carry the most recent right-side
value forward with ``last(..., ignorenulls=True)`` over a
(key, time)-ordered window. This is the sort-merge formulation of as-of:

- exactly ONE shuffle (hash on the key) + per-partition sort — no
  range-join row explosion, no driver-side state;
- skew behaves like any window: AQE or salting on pathological keys;
- at equal timestamps the right row sorts *before* the left row, giving
  ``right.ts <= left.ts`` semantics (ties broken by the right tiebreaker).

Contrast: a naive ``left join ON key AND r.ts <= l.ts`` + row_number builds
an O(n*m) intermediate per key — unusable at 100 TB. `pd.merge_asof` via
``applyInPandas`` would work but moves all data through Python; this stays
entirely JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach right-side ``value_cols`` from the
    nearest right row at-or-before (``direction="backward"``, the default:
    latest ``right_ts <= left_ts``) or at-or-after
    (``direction="forward"``: earliest ``right_ts >= left_ts``) within the
    same ``on`` key.

    Both directions are the SAME single-shuffle union+window plan — the
    forward pass just traverses the (key, time) order descending, so the
    carried right row is the nearest future one. (kdb's ``aj`` /
    pd.merge_asof expose the same pair; "nearest" = run both and pick the
    smaller delta.)

    Returns all left columns plus ``{value_col}{suffix}`` columns (NULL when
    no prior/next right row exists).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)

    left_cols = left.columns
    marked_right = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),  # right sorts before left at equal ts
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in keys],
    )
    marked_left = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
        F.lit(0).alias("__tie"),
        *[F.col(c) for c in left_cols if c not in keys],
    )
    unioned = marked_right.unionByName(marked_left)
    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc()]
    else:
        # descending time: the most recently carried right row is the
        # EARLIEST right_ts >= left_ts; right still sorts before left at
        # equal ts so the boundary is inclusive both ways
        order = [F.col("__ts").desc(), F.col("__side").asc(), F.col("__tie").desc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry ONE struct per right row (NULL on left rows), not the value
    # columns individually: backward as-of attaches the latest right ROW
    # even when an individual value in it is NULL (pd.merge_asof
    # semantics). Per-column last(value, ignorenulls=True) would skip over
    # a NULL in the newest row and resurrect an older value.
    row_struct = F.when(
        F.col("__side") == 0, F.struct(*[F.col(f"__v_{c}") for c in value_cols])
    )
    carried = unioned.select(
        "*", F.last(row_struct, ignorenulls=True).over(w).alias("__asof_row")
    )
    out_cols = [c for c in left_cols] + [
        F.col(f"__asof_row.__v_{c}").alias(f"{c}{suffix}") for c in value_cols
    ]
    return carried.where(F.col("__side") == 1).select(*out_cols)
