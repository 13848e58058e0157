"""Unit tests for the URL canonicalization contract (functions/urls.py).

Each case is one step of the documented chain plus the interactions that
bite real crawl data (tracking param first/middle/last, slash-before-query,
port with and without path). The same expectations run through BOTH engines
so the contract provably has one semantics.
"""

import duckdb
import pytest

from spark_hbase_connector_spark.functions.urls import (
    duckdb_normalize_url,
    normalize_url,
    url_domain,
)

CASES = [
    # (raw, canonical)
    ("https://Example.com/A/B", "example.com/a/b"),
    ("http://example.com/a/b", "example.com/a/b"),
    ("HTTPS://WWW.EXAMPLE.COM/a/b/", "example.com/a/b"),
    ("https://example.com:443/a/b", "example.com/a/b"),
    ("http://example.com:80/a/b", "example.com/a/b"),
    ("https://example.com:8080/a/b", "example.com:8080/a/b"),  # non-default kept
    ("https://example.com/a/b#frag", "example.com/a/b"),
    ("https://example.com/a/b?utm_source=x", "example.com/a/b"),
    ("https://example.com/a/b?utm_source=x&utm_campaign=y", "example.com/a/b"),
    ("https://example.com/a/b?id=2&utm_source=x", "example.com/a/b?id=2"),
    ("https://example.com/a/b?utm_source=x&id=2", "example.com/a/b?id=2"),
    ("https://example.com/a/b/?gclid=z#s", "example.com/a/b"),
    ("https://example.com/a/b?fbclid=q&id=7", "example.com/a/b?id=7"),
    ("https://example.com/", "example.com"),
    ("https://example.com:443/", "example.com"),
    ("https://www.example.com", "example.com"),
    # www as the registrable domain itself is kept (only the prefix strips)
    ("https://wwwx.example.com/p", "wwwx.example.com/p"),
    # query-only URL, nothing to strip
    ("https://example.com/p?id=1&z=2", "example.com/p?id=1&z=2"),
    ("  https://example.com/p  ", "example.com/p"),
]


def test_normalize_url_spark(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = [r[0] for r in df.select(normalize_url("url")).collect()]
    assert got == [c for _, c in CASES]


def test_normalize_url_duckdb_identical():
    con = duckdb.connect()
    expr = duckdb_normalize_url("url")
    got = [
        con.execute(f"SELECT {expr} FROM (SELECT ? AS url)", [raw]).fetchone()[0]
        for raw, _ in CASES
    ]
    assert got == [c for _, c in CASES]


@pytest.mark.parametrize(
    "canonical,domain",
    [
        ("example.com/a/b", "example.com"),
        ("example.com", "example.com"),
        ("example.com:8080/a", "example.com:8080"),
        ("example.com?id=1", "example.com"),
    ],
)
def test_url_domain(spark, canonical, domain):
    df = spark.createDataFrame([(canonical,)], "c string")
    assert df.select(url_domain("c")).collect()[0][0] == domain
