"""operators/dedup.py bloom prefilter — the incremental-dedup 100 TB
accelerant (VERDICT r4 ask #5): exact-output equivalence with the plain
anti join, zero false negatives by construction, and a measured corpus
prune ratio at a 10x corpus:batch stress."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_hbase_connector_spark.operators.dedup import (
    bloom_build_words,
    bloom_might_contain,
    incremental_new_fingerprints,
)


def _fp(df):
    return df.select(F.md5(F.col("k").cast("string")).alias("fingerprint"))


def test_bloom_has_no_false_negatives(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    keys = _fp(df)
    num_bits = ((2000 * 10 + 63) // 64) * 64
    words = bloom_build_words(keys, "fingerprint", num_bits)
    # every inserted key must probe positive
    n_hit = keys.where(
        bloom_might_contain(words, "fingerprint", num_bits)
    ).count()
    assert n_hit == 2000


def test_bloom_false_positive_rate_in_spec(spark):
    ins = _fp(spark.range(0, 5000).select(F.col("id").alias("k")))
    num_bits = ((5000 * 10 + 63) // 64) * 64
    words = bloom_build_words(ins, "fingerprint", num_bits)
    absent = _fp(spark.range(1_000_000, 1_050_000).select(F.col("id").alias("k")))
    fp_hits = absent.where(
        bloom_might_contain(words, "fingerprint", num_bits)
    ).count()
    # ~0.9% design point; assert an order-of-magnitude bound, not luck
    assert fp_hits / 50_000 < 0.03


def test_incremental_bloom_output_identical_to_plain_anti_join(spark):
    # batch overlaps corpus on even keys; odd keys are genuinely new
    batch = spark.range(0, 1000).select(F.col("id").alias("k"))
    corpus = spark.range(0, 2000, 2).select(F.col("id").alias("k"))
    b = batch.select(  # payload column rides alongside the fingerprint
        F.md5(F.col("k").cast("string")).alias("fingerprint"),
        (F.col("k") * 10).alias("doc_id"),
    )
    c = _fp(corpus)
    got = sorted(
        (r.doc_id, r.fingerprint)
        for r in incremental_new_fingerprints(b, c).collect()
    )
    want = sorted(
        (r.doc_id, r.fingerprint)
        for r in b.join(c, "fingerprint", "left_anti").collect()
    )
    assert got == want and len(got) == 500  # the odd keys, payload intact


def test_bloom_prunes_corpus_at_10x_stress(spark):
    """The scale claim, measured: with corpus 10x the batch and 1% true
    overlap, the bloom passes ~overlap + fp-rate of the corpus into the
    anti join — >90% of the corpus-side rows never reach the exchange."""
    n_batch, n_corpus = 5_000, 50_000
    batch = _fp(spark.range(0, n_batch).select(F.col("id").alias("k")))
    # corpus: 1% of batch keys + disjoint tail
    overlap = spark.range(0, n_batch, 100).select(F.col("id").alias("k"))
    tail = spark.range(10_000_000, 10_000_000 + n_corpus - overlap.count()).select(
        F.col("id").alias("k")
    )
    corpus = _fp(overlap.unionAll(tail))
    num_bits = ((n_batch * 10 + 63) // 64) * 64
    words = bloom_build_words(batch, "fingerprint", num_bits)
    survivors = corpus.where(
        bloom_might_contain(words, "fingerprint", num_bits)
    ).count()
    assert survivors < 0.1 * n_corpus, survivors
    # and the guarded output still equals the exact anti join
    got = incremental_new_fingerprints(batch, corpus).count()
    want = batch.join(corpus, "fingerprint", "left_anti").count()
    assert got == want
