"""URL canonicalization expressions — the first stage of every crawl-derived
curation pipeline (exact-URL / normalized-URL dedup, per-domain caps).

All JVM-side regex (whole-stage codegen, map-only); every pattern is RE2-safe
(no lookaround, no backreferences in the pattern itself) so the DuckDB
oracles replay the chain verbatim with ``regexp_replace(.., 'g')``.

Canonicalization contract (shared with the oracles, step order matters):

1. lowercase the whole URL (this is a DEDUP KEY, not a fetchable address —
   aggressive full-lowercase is the standard crawl-dedup canonicalization;
   host case never matters, and path-case-only variants are near-certain
   duplicates in crawl data);
2. strip the scheme (``http://`` vs ``https://`` variants collapse);
3. strip the ``#fragment``;
4. strip a leading ``www.``;
5. strip an explicit default port (``:80``/``:443``) off the host;
6. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``) and any
   separator debris they leave behind;
7. collapse a trailing slash (also directly before ``?``).

The result is ``host/path[?query]`` — equal iff the URLs are duplicates
under the contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# step 6's parameter pattern, shared verbatim with the oracles
TRACKING_PARAM_RE = r"(utm_[a-z]+|fbclid|gclid)=[^&#]*&?"


def normalize_url(url: Column | str) -> Column:
    """Canonical dedup key for an absolute http(s) URL (contract above)."""
    u = F.lower(F.trim(F.col(url) if isinstance(url, str) else url))
    u = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, r"^([^/:]+):(80|443)(/|$)", r"$1$3")
    u = F.regexp_replace(u, TRACKING_PARAM_RE, "")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, r"/+\?", "?")
    u = F.regexp_replace(u, r"/+$", "")
    return u


def url_domain(canonical: Column | str) -> Column:
    """Registrable host of an already-canonicalized URL (everything before
    the first ``/`` or ``?``)."""
    c = F.col(canonical) if isinstance(canonical, str) else canonical
    return F.regexp_extract(c, r"^[^/?]+", 0)


def duckdb_normalize_url(expr: str) -> str:
    """The identical canonicalization chain as DuckDB SQL over ``expr`` —
    keeps the oracle and the Spark expression one definition apart instead
    of two drifting copies."""
    u = f"lower(trim({expr}))"
    u = f"regexp_replace({u}, '^[a-z][a-z0-9+.-]*://', '')"
    u = f"regexp_replace({u}, '#.*$', '')"
    u = f"regexp_replace({u}, '^www\\.', '')"
    u = f"regexp_replace({u}, '^([^/:]+):(80|443)(/|$)', '\\1\\3')"
    u = f"regexp_replace({u}, '{TRACKING_PARAM_RE}', '', 'g')"
    u = f"regexp_replace({u}, '[?&]+$', '')"
    u = f"regexp_replace({u}, '/+\\?', '?')"
    u = f"regexp_replace({u}, '/+$', '')"
    return u
