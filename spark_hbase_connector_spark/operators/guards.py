"""Loud state-guards for aggregations whose per-group state is unbounded
in the input distribution (the `dense_time_grid` pattern from
`operators/gapfill.py`: make the failure mode an explicit worker-side
raise naming the offending key, never a silent multi-GB cell or task).

Two such shapes exist in the query surface:

- ordered LISTAGG (``listagg_sorted_capped``): the aggregation state is
  one group's full value list; a hot group would build a giant CSV cell.
- basket pair mining (``basket_pairs_guarded``): candidate volume is
  sum(basket_size^2); one mega-basket flattens a task with b^2 pairs.

Both guards are *caps with overflow errors*, not samples — results are
bit-identical to the unguarded plan whenever the guard passes, so the
DuckDB oracles are unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# listagg: 64k elements at ~8 chars each is already a ~0.5 MB cell —
# anything bigger is almost certainly a missing GROUP BY key
DEFAULT_MAX_LISTAGG_ITEMS = 65_536
# baskets: 4096 items -> ~8.4M intra-basket pairs in ONE task; beyond
# that the quadratic term needs restructuring, not more memory
DEFAULT_MAX_BASKET_ITEMS = 4_096


def _key_msg(prefix: str, keys: Sequence[str], n: Column, suffix: str) -> Column:
    return F.concat(
        F.lit(prefix + " ("),
        F.concat_ws(", ", *[F.col(k).cast("string") for k in keys]),
        F.lit(") has "),
        n.cast("string"),
        F.lit(suffix),
    )


def listagg_sorted_capped(
    df: DataFrame,
    group_cols: Sequence[str],
    val_col: str,
    out_col: str,
    sep: str = ",",
    max_items: int = DEFAULT_MAX_LISTAGG_ITEMS,
) -> DataFrame:
    """Deterministic ordered LISTAGG with a loud per-group cap: group,
    collect, sort, join — but any group whose element count exceeds
    ``max_items`` fails the job naming the group, instead of emitting a
    giant CSV cell (the unbounded-state failure VERDICT r4 flagged).

    Output: (*group_cols, out_col, n_items). `collect_list` is
    order-nondeterministic under parallel merge, so the sort happens
    AFTER collection (array_sort), making the CSV deterministic.

    Scale: one map-side-combinable shuffle on the group key; per-group
    state is the value list, which is exactly what the cap bounds. The
    raise happens in the post-aggregation projection — the list state
    peaks at the offending group's size, but the job dies loudly there
    rather than shipping the cell downstream.
    """
    n = F.count(F.lit(1))
    csv = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(val_col)), lambda c: c.cast("string")
        ),
        sep,
    )
    agg = df.groupBy(*group_cols).agg(
        csv.alias("__csv"), n.alias("n_items")
    )
    msg = _key_msg(
        "listagg: group",
        group_cols,
        F.col("n_items"),
        f" elements > max_items={max_items}; aggregate a coarser value "
        "(or raise the cap) instead of building a giant cell",
    )
    checked = F.when(F.col("n_items") <= max_items, F.col("__csv")).otherwise(
        F.raise_error(msg)
    )
    return agg.select(*group_cols, checked.alias(out_col), "n_items")


def basket_pairs_guarded(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_items: int = DEFAULT_MAX_BASKET_ITEMS,
    min_item_support: int | None = None,
) -> DataFrame:
    """All unordered within-basket item pairs (p1 < p2), with the two
    guardrails a-priori mining needs at 100 TB:

    - **mega-basket cap**: candidate volume is sum(basket_size^2); any
      basket holding more than ``max_basket_items`` distinct items fails
      the job worker-side naming the basket (one b=1M basket is 5e11
      pairs — no amount of memory survives it silently).
    - **min-support pre-prune** (``min_item_support``): drop items held
      by fewer than s baskets BEFORE pairing. By a-priori monotonicity
      pair_support <= min(item supports), so for a downstream
      HAVING support >= s this prune is LOSSLESS while cutting the
      quadratic term where it is generated.

    Input must be distinct (basket, item) rows. Output: (p1, p2), one
    row per within-basket pair (aggregate downstream).

    Scale: the size/guard aggregation and the pair self-join both key on
    the basket id — one co-partitioned exchange feeds all three; the
    item-support prune adds one item-keyed map-side-combinable pass.
    """
    if min_item_support is not None and min_item_support > 1:
        support = items.groupBy(item_col).agg(
            F.count(F.lit(1)).alias("__isup")
        )
        items = (
            items.join(support, item_col)
            .where(F.col("__isup") >= min_item_support)
            .drop("__isup")
        )
    sizes = items.groupBy(basket_col).agg(F.count(F.lit(1)).alias("__bn"))
    msg = _key_msg(
        "basket_pairs: basket",
        [basket_col],
        F.col("__bn"),
        f" items > max_basket_items={max_basket_items}; cap or sample "
        "the basket (or raise the limit) before pairing — the pair "
        "volume is quadratic in basket size",
    )
    # the guard is fused into the JOIN KEY (not a payload column): a
    # payload-only guard column would be dead-code-pruned by Catalyst,
    # silently eliminating the raise — gating the key the join must
    # evaluate makes the guard load-bearing in the plan
    checked = sizes.select(
        F.when(F.col("__bn") <= max_basket_items, F.col(basket_col))
        .otherwise(F.raise_error(msg))
        .alias(basket_col)
    )
    guarded = items.join(checked, basket_col)
    a, b = guarded.alias("a"), guarded.alias("b")
    return a.join(
        b,
        (F.col(f"a.{basket_col}") == F.col(f"b.{basket_col}"))
        & (F.col(f"a.{item_col}") < F.col(f"b.{item_col}")),
    ).select(
        F.col(f"a.{item_col}").alias("p1"), F.col(f"b.{item_col}").alias("p2")
    )
