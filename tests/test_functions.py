"""The JVM-expression function variants (per-row convenience API).

The hot paths use Arrow/numpy (see operators.*); these expression forms
exist for per-row or ad-hoc SQL use. They must agree exactly with their
vectorized counterparts — asserted here so the equivalence is a tested
contract, not a comment.
"""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_hbase_connector_spark.functions.text import shingles, tokens
from spark_hbase_connector_spark.functions.vectors import cosine, dot, norm
from spark_hbase_connector_spark.operators.dedup import shingle_postings


def test_vector_expressions_match_numpy(spark):
    rows = [
        Row(id=1, a=[1.0, 2.0, 3.0], b=[4.0, 5.0, 6.0]),
        Row(id=2, a=[0.0, 0.0], b=[1.0, 1.0]),  # zero vector -> NULL cosine
        Row(id=3, a=[-1.5, 2.5], b=[3.0, -4.0]),
    ]
    df = spark.createDataFrame(rows)
    got = {
        r.id: (r.d, r.n, r.c)
        for r in df.select(
            "id",
            dot("a", "b").alias("d"),
            norm("a").alias("n"),
            cosine("a", "b").alias("c"),
        ).collect()
    }
    import numpy as np

    for r in rows:
        a, b = np.array(r.a), np.array(r.b)
        assert got[r.id][0] == float(a @ b)
        assert got[r.id][1] == float(math.sqrt(a @ a))
        na, nb = math.sqrt(a @ a), math.sqrt(b @ b)
        if na > 0 and nb > 0:
            assert abs(got[r.id][2] - float(a @ b) / (na * nb)) < 1e-12
        else:
            assert got[r.id][2] is None


def test_shingles_expression_matches_arrow_postings(spark):
    """The expression form and the Arrow shingler implement the same
    contract: distinct word w-shingles, docs shorter than w yield none."""
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e"),
            Row(doc_id=2, text="x y"),  # shorter than w=3 -> no shingles
            Row(doc_id=3, text="p q p q p q"),  # repeats -> distinct only
        ]
    )
    expr_sets = {
        r.doc_id: set(r.s)
        for r in df.select("doc_id", shingles("text", 3).alias("s")).collect()
    }
    arrow_sets: dict = {1: set(), 2: set(), 3: set()}
    for r in shingle_postings(df, "text", "doc_id", 3).collect():
        arrow_sets[r.id].add(r.s)
    assert expr_sets == arrow_sets
    assert expr_sets[2] == set()
    # tokens() is the shared contract both build on
    assert df.select(F.size(tokens("text")).alias("n")).collect()[0].n == 5


def test_chunk_windows_reconstruct_documents(spark):
    """Lossless-coverage property of chunk_sliding_windows: chunk 0 plus
    each later chunk minus its 8 leading overlap tokens re-concatenates to
    exactly the document's token sequence — no token dropped, none
    duplicated, for every document."""
    from spark_hbase_connector_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    chunks = REGISTRY["chunk_sliding_windows"].fn(spark, sf).toPandas()
    docs = (
        spark.read.parquet(sf + "/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
        .set_index("doc_id")
    )
    overlap = 32 - 24
    assert set(chunks["doc_id"]) == set(docs.index)
    for doc_id, g in chunks.groupby("doc_id"):
        g = g.sort_values("chunk_id")
        toks = []
        for j, chunk_text in enumerate(g["chunk_text"]):
            ct = chunk_text.split(" ")
            toks.extend(ct if j == 0 else ct[overlap:])
        assert toks == docs.loc[doc_id, "text"].split(" "), doc_id
