"""Skew mitigation: salted equi-join.

At 100 TB a handful of hot keys (one viral user, one default value) can pin
an entire shuffle join on a few reducers. Spark's own answers are (a) AQE
skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in our
session defaults) and (b) broadcast when one side is small. Salting is the
third tool, for when the hot side is too big to broadcast and AQE's
post-shuffle splitting isn't available (e.g. a sort-merge join feeding a
stateful op, or pre-Spark-3 clusters): spread each fact key over
``salt`` sub-keys and replicate the other side once per sub-key.

The salt value never appears in the output, so correctness is independent
of how rows are salted — only the distribution changes. Cost model: the
small side is replicated ``salt``-fold, so pick
``salt ~ hot_key_rows / target_partition_rows`` and keep the replicated
side per-partition-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    other: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join where ``fact``'s keys may be skewed: fact rows get a
    uniform salt in [0, salt); ``other`` is replicated once per salt value;
    the join runs on (keys..., salt), splitting each hot key's rows across
    ``salt`` reducers. Output columns = fact columns + other's non-key
    columns (the salt column is internal).

    Supported ``how``: inner / left — joins where every fact row joins
    against the replicated side exactly as it would unsalted.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    fs = fact.withColumn("__salt", (F.rand(42) * salt).cast("int"))
    rep = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = fs.join(rep, [*keys, "__salt"], how)
    return out.drop("__salt")
