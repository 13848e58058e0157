"""Z-order (Morton) curve keys — multi-dimensional clustering for scan
pruning.

`write_table` sorts by the 1-D rowkey, so row-group min/max stats prune
single-key ranges (SURVEY.md §2.1 S8). When queries filter on TWO
dimensions (tenant + time, user + feature), sorting by either one leaves
the other scattered across every file. Interleaving the bits of both
keys (the Morton curve) gives one sort key whose contiguous ranges are
2-D locality squares: files sorted by z-value carry tight min/max on
BOTH original columns, so either predicate prunes row groups.

The interleave is pure integer bit arithmetic — the same expression text
evaluates identically in Spark SQL and DuckDB (used verbatim by the
registry oracle), and it stays inside whole-stage codegen (no UDF).
"""

from __future__ import annotations


def zorder_sql_expr(xcol: str, ycol: str, bits: int = 16) -> str:
    """SQL expression interleaving the low ``bits`` bits of two
    non-negative integer columns into a Morton key (x gets even bit
    positions, y odd). Valid in both Spark SQL and DuckDB: only ``>>``,
    ``<<``, ``&`` and ``+`` (bit ranges are disjoint, so + == |)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)
