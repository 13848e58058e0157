"""Text column expressions — all JVM-side (no Python UDFs in the hot path).

Tokenization contract (shared with every oracle): tokens are obtained by
splitting on single spaces; word w-shingles are space-joined runs of w
consecutive tokens. Keeping the contract trivially simple is what lets the
DuckDB oracle replay it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of a document."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def shingles(text: Column | str, w: int = 3) -> Column:
    """Distinct word w-shingles (the MinHash/Jaccard unit).

    Documents with fewer than w tokens yield an empty array (guarded so
    F.sequence never sees a negative range).
    """
    toks = tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (w - 1))  # 1-based start positions
    make = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + off).cast("int")) for off in range(w)]
        ),
    )
    return F.when(n >= w, F.array_distinct(make)).otherwise(
        F.array().cast("array<string>")
    )


def canonical_fingerprint(text: Column | str) -> Column:
    """Order/duplicate-insensitive document fingerprint: md5 over the sorted
    distinct token set. Same expression is replayable in DuckDB
    (md5 + list_sort + list_distinct)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text)))))
