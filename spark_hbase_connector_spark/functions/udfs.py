"""User-defined function registration (reference parity).

The reference's only UDF story is registering a plain Spark UDF from the
host language (``from_iso_string``, ``ScalaDatasourceTest.scala:72``;
``JavaDatasourceTest.java:21``). PySpark equivalent: ``spark.udf.register``
with an Arrow-vectorized pandas UDF — never row-at-a-time Python in a hot
path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.TimestampType())
def _from_iso_string(s: pd.Series) -> pd.Series:
    """ISO-8601 string (offset or naive) -> UTC-naive timestamp."""
    parsed = pd.to_datetime(s, format="ISO8601", utc=True)
    return parsed.dt.tz_localize(None)


def register_builtin_udfs(spark: SparkSession) -> None:
    """Register the engine's UDFs on a session (idempotent)."""
    spark.udf.register("from_iso_string", _from_iso_string)
