"""Dense time-grid generation for gapfill operators, with a loud
per-key bucket cap.

The gapfill family (`gapfill_locf`, `gapfill_interpolate` in
`queries/windows.py`) densifies each key's [min(bucket), max(bucket)]
range with `sequence(lo, hi, step)`. That grid is keys x buckets rows:
one key with a pathological range (a 1970 sentinel timestamp next to a
current one is the classic) silently explodes a single task into
millions of rows. At 100 TB that is an OOM with no actionable message.

`dense_time_grid` makes the failure mode explicit instead: the bucket
count per key is checked WORKER-SIDE (a `when`/`raise_error` on the
sequence's upper bound — no driver collect, no extra action) and any key
whose grid would exceed ``max_buckets_per_key`` fails the job with the
offending key and its bucket count in the error message. The cap
defaults to 1M buckets/key (~28 years of 15-minute buckets) — generous
for real series, far below the row volume that flattens an executor.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_BUCKETS_PER_KEY = 1_000_000


def dense_time_grid(
    bounds: DataFrame,
    keys: Sequence[str],
    lo: str = "lo",
    hi: str = "hi",
    step_seconds: int = 900,
    bucket_name: str = "bucket",
    max_buckets_per_key: int = DEFAULT_MAX_BUCKETS_PER_KEY,
) -> DataFrame:
    """Explode each key's [lo, hi] timestamp range into a dense grid of
    ``step_seconds`` buckets, raising (worker-side, per offending key)
    if any key would produce more than ``max_buckets_per_key`` rows.

    ``bounds`` is the per-key bounds relation (one row per key with
    ``lo``/``hi`` timestamp columns) — two rows per key of shuffle, the
    grid itself is generated on the workers.
    """
    n_buckets: Column = (
        F.floor((F.unix_timestamp(hi) - F.unix_timestamp(lo)) / step_seconds)
        + 1
    )
    msg = F.concat(
        F.lit("gapfill: key ("),
        F.concat_ws(", ", *[F.col(k).cast("string") for k in keys]),
        F.lit(") needs "),
        n_buckets.cast("string"),
        F.lit(f" buckets > max_buckets_per_key={max_buckets_per_key}; "),
        F.lit(
            "bound the time range (or raise the cap) instead of "
            "densifying it"
        ),
    )
    checked_hi = F.when(n_buckets <= max_buckets_per_key, F.col(hi)).otherwise(
        F.raise_error(msg)
    )
    step = F.expr(f"interval {int(step_seconds)} seconds")
    return bounds.select(
        *keys, F.explode(F.sequence(F.col(lo), checked_hi, step)).alias(bucket_name)
    )
