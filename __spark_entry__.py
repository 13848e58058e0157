"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query on sf0.001; ``queries`` exposes every
implemented operator from SURVEY.md §2 (scan/pushdown parity, the
relational suite, and the north-star dedup/similarity/text/multimodal/
streaming extensions); ``oracle_sql`` gives the DuckDB-equivalent SQL for
each (omitted only for genuinely non-SQL-expressible ops, e.g. SimHash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_hbase_connector_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's own flagship shape (ScalaDatasourceTest.scala:88-91):
    rowkey IN (...) OR attribute equality, through the catalog layer.
    """
    return REGISTRY["scan_flagship"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (same column
    names/types; float aggregates rounded identically on both sides)."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
