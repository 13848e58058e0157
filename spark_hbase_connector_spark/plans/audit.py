"""Physical-plan auditor — *verifies* pushdown instead of implementing it.

The reference hand-implements filter pushdown (11 shapes,
``HbaseScanBuilder.scala:29-52`` compiled at
``HbasePartitionReader.scala:87-175``) and column pruning
(``HbaseScanBuilder.scala:54-59``). On Parquet, Catalyst's
``V2ScanRelationPushDown`` does both natively — so parity here means
*proving the plan has them*, not re-coding them. These helpers parse
``EXPLAIN FORMATTED`` output:

- ``PushedFilters: [...]`` — predicate pushdown reached the scan
  (reference parity: S5/S9, filter shapes F1-F11 of SURVEY.md §2.1);
- ``ReadSchema: ...`` — column pruning reached the scan (S6);
- ``WholeStageCodegen`` spans — expressions stayed JVM-side.

Used by tests (``tests/test_pushdown.py``) and available to users as a
plan-quality gate in CI at any scale.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """Capture df.explain(mode) output as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the Parquet scan, e.g. ``IsNotNull(l_quantity)``."""
    text = explain_string(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(_split_top_level(body))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the file (post column-pruning)."""
    text = explain_string(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        body = m.group(1)
        for part in _split_top_level(body):
            name = part.split(":", 1)[0].strip()
            if name:
                cols.append(name)
    return cols


def _replan_without_aqe(df: DataFrame) -> DataFrame | None:
    """Re-plan the same logical plan in a CLONED session with AQE off.

    Cloned sessions share the SparkContext/cache but have independent conf,
    so the probe never mutates (or races with) the user's session state."""
    spark = df.sparkSession
    try:
        probe = spark.newSession()
        probe.conf.set("spark.sql.adaptive.enabled", "false")
        jvm = spark.sparkContext._jvm
        for cls in (
            "org.apache.spark.sql.classic.Dataset",
            "org.apache.spark.sql.Dataset",
        ):
            try:
                jdf = getattr(jvm, cls).ofRows(
                    probe._jsparkSession, df._jdf.logicalPlan()
                )
                return DataFrame(jdf, probe)
            except Exception:
                continue
    except Exception:
        pass
    return None


def whole_stage_codegen_count(df: DataFrame) -> int:
    """Number of distinct whole-stage-codegen spans in the physical plan
    (formatted explain tags operators with ``[codegen id : N]``)."""
    # Under AQE the pre-execution plan is opaque (AdaptiveSparkPlan wrapper
    # hides codegen subtrees until runtime); explain() re-plans with session
    # conf, so probe through a cloned session with AQE off.
    probe_df = _replan_without_aqe(df)
    if probe_df is not None:
        text = explain_string(probe_df, "codegen")
    else:  # fallback (e.g. Spark Connect): toggle-and-restore on the session
        spark = df.sparkSession
        old = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            text = explain_string(df, "codegen")
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", old)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    """Assert some pushed filter mentions ``fragment`` (e.g. a column name)."""
    filters = pushed_filters(df)
    if not any(fragment in f for f in filters):
        raise AssertionError(
            f"expected a pushed filter containing {fragment!r}; got {filters}\n"
            f"{explain_string(df)}"
        )


def assert_columns_pruned(df: DataFrame, expected: set[str]) -> None:
    """Assert the scan reads exactly ``expected`` columns (projection pushdown)."""
    actual = set(read_schema_columns(df))
    if actual != expected:
        raise AssertionError(
            f"expected scan ReadSchema {sorted(expected)}, got {sorted(actual)}\n"
            f"{explain_string(df)}"
        )


def _split_top_level(body: str) -> list[str]:
    """Split a comma-separated list ignoring commas inside (...) or <...>."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch in "(<[":
            depth += 1
        elif ch in ")>]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        tail = "".join(cur).strip()
        if tail:
            parts.append(tail)
    return parts
