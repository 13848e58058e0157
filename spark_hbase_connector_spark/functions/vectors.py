"""Vector (embedding) column expressions — built-in array ops, JVM-side.

Embeddings are ``array<float>`` columns. All arithmetic is done in double
precision with strict left-to-right summation (``F.aggregate``), which the
DuckDB oracle reproduces with ``list_sum(list_transform(...))``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product via zip_with + sequential fold (no Python)."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe on zero vectors (returns NULL)."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


@F.pandas_udf(T.DoubleType())
def cosine_arrow(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-vectorized cosine for pair-heavy paths.

    Spark's higher-order array lambdas (``aggregate``/``zip_with``) run
    interpreted — fine per-row, ~100x too slow across millions of pairs.
    This batches pairs through Arrow into one numpy einsum per batch.
    Double precision. NULL inputs and zero vectors -> SQL NULL (emitted
    through pandas' nullable Float64 so Arrow carries a real null mask,
    not a NaN that would pass ``IS NOT NULL``).
    """
    n = len(a)
    out = np.full(n, np.nan)
    valid = np.array(
        [x is not None and y is not None for x, y in zip(a, b)], dtype=bool
    )
    if valid.any():
        idx = np.flatnonzero(valid)
        A = np.vstack([np.asarray(a.iloc[i], dtype=np.float64) for i in idx])
        B = np.vstack([np.asarray(b.iloc[i], dtype=np.float64) for i in idx])
        dots = np.einsum("ij,ij->i", A, B)
        na = np.sqrt(np.einsum("ij,ij->i", A, A))
        nb = np.sqrt(np.einsum("ij,ij->i", B, B))
        denom = na * nb
        ok = denom > 0
        out[idx] = np.where(ok, dots / np.where(ok, denom, 1.0), np.nan)
    # pd.array maps NaN -> <NA>, which Arrow transports as a true null
    return pd.Series(pd.array(out, dtype="Float64"))
