"""Tests for corpus-pipeline operators added in round 7: BPE tokenizer
application and hybrid lexical+vector retrieval."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_hbase_connector_spark.queries import REGISTRY
from spark_hbase_connector_spark.queries.corpus_pipeline import (
    _train_bpe_merges_local,
)


def test_local_bpe_training_matches_distributed(spark, sf_dir):
    """`_train_bpe_merges_local` (driver-side loop over the bounded top-100
    vocab, used by `bpe_encode_corpus`) must pick the IDENTICAL merge
    sequence as the distributed `bpe_train_merges` entry — same pair
    counts, same (count DESC, pair ASC) argmax, same replace semantics."""
    from spark_hbase_connector_spark.catalogs import load

    distributed = (
        REGISTRY["bpe_train_merges"].fn(spark, sf_dir).orderBy("round").collect()
    )
    d = load(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w"))
        .limit(100)
        .collect()
    )
    local = _train_bpe_merges_local([(r["w"], int(r["cnt"])) for r in vocab], 3)
    assert [r["pair"] for r in distributed] == local


def test_local_bpe_merge_overlap_semantics():
    """Leftmost-non-overlapping replace: merging the 'a·a' pair in '·a·a·a'
    must give '·aa·a', matching SQL replace on both engines (the probe
    case documented in `bpe_train_merges`)."""
    merges = _train_bpe_merges_local([("aaa", 10)], rounds=1)
    assert merges == ["a·a"]
    # one application: "·a·a·a".replace("·a·a", "·aa") -> "·aa·a"
    assert "·a·a·a".replace(
        "·a·a", "·aa"
    ) == "·aa·a"


def test_bpe_encode_fertility_bounds(spark, sf_dir):
    """Fertility is tokens/word over chars-per-word symbols: every word of
    length L encodes to between ceil(L/2^3)=1 and L tokens, so fertility
    must land in [1, max word length]; n_tokens <= total chars."""
    out = REGISTRY["bpe_encode_corpus"].fn(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_words"] > 0
        assert r["n_tokens"] >= r["n_words"]  # merges never cross words
        assert 1.0 <= r["fertility"]


def test_hybrid_rrf_fuses_both_legs(spark, sf_dir_t2):
    """The fused top-10 must be deterministic across runs, carry at least
    one leg rank per row, bound rrf by its analytic max 2/61, rank a
    both-legs doc above any single-leg doc whose solo rank is no better
    than either of its ranks, and come back rrf-sorted."""
    fn = REGISTRY["search_hybrid_rrf"].fn
    a = fn(spark, sf_dir_t2).collect()
    b = fn(spark, sf_dir_t2).collect()
    assert a == b
    assert 0 < len(a) <= 10
    for r in a:
        assert r["lex_rank"] is not None or r["vec_rank"] is not None
        assert r["rrf_score"] <= round(2.0 / 61.0, 4) + 1e-12
    both = [r for r in a if r["lex_rank"] and r["vec_rank"]]
    solo = [
        r for r in a if (r["lex_rank"] is None) != (r["vec_rank"] is None)
    ]
    for rb in both:
        for ro in solo:
            solo_rank = ro["lex_rank"] or ro["vec_rank"]
            if max(rb["lex_rank"], rb["vec_rank"]) <= solo_rank:
                # 1/(60+l) + 1/(60+v) > 1/(60+s) when l, v <= s
                assert rb["rrf_score"] >= ro["rrf_score"]
    scores = [r["rrf_score"] for r in a]
    assert scores == sorted(scores, reverse=True)


def test_overlap_matrix_invariants(spark, sf_dir):
    """Every pair must satisfy src_a < src_b, 0 < jaccard <= containment
    <= 1, and n_inter bounded by the smaller source's shingle count."""
    rows = REGISTRY["corpus_overlap_matrix"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert r["n_inter"] > 0
        assert 0.0 < r["jaccard"] <= r["containment"] <= 1.0


def test_drift_psi_invariants(spark, sf_dir):
    """PSI is a sum of (q-p)*ln(q/p) terms, each non-negative, over at
    most 10 fixed-width buckets; the reference source itself is absent."""
    rows = REGISTRY["corpus_drift_psi"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["source"] != "src0"
        assert r["psi"] >= 0.0
        assert 1 <= r["n_buckets"] <= 10


def _docs_texts(spark, sf_dir):
    return {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }


def test_bm25_topk_matches_bruteforce(spark, sf_dir):
    """The registry's scan-side BM25 must equal a plain-Python
    reimplementation of Okapi BM25 (Lucene idf, k1=1.2, b=0.75) over the
    same corpus — same top-10 docs, same 4dp scores, score-sorted with
    doc_id tiebreak."""
    import math

    texts = _docs_texts(spark, sf_dir)
    n = len(texts)
    toks = {d: t.split(" ") for d, t in texts.items()}
    dl = {d: len(ts) for d, ts in toks.items()}
    avgdl = sum(dl.values()) / n
    scores = {}
    for term in ("scan", "join"):
        tf = {d: ts.count(term) for d, ts in toks.items()}
        df = sum(1 for v in tf.values() if v > 0)
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, f_ in tf.items():
            if f_ > 0:
                scores[d] = scores.get(d, 0.0) + idf * (f_ * 2.2) / (
                    f_ + 1.2 * (0.25 + 0.75 * dl[d] / avgdl)
                )
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = REGISTRY["search_bm25_topk"].fn(spark, sf_dir).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in expect]
    for r, (_, s) in zip(got, expect):
        assert abs(r["bm25_score"] - round(s * 10000) / 10000) < 1e-9
    vals = [r["bm25_score"] for r in got]
    assert vals == sorted(vals, reverse=True)


def test_phrase_positions_matches_bruteforce(spark, sf_dir):
    """The positional-postings phrase join must equal per-doc adjacent-
    pair counting in plain Python, including multi-occurrence docs and
    the first-offset column."""
    texts = _docs_texts(spark, sf_dir)
    expect = {}
    for d, t in texts.items():
        ts = t.split(" ")
        pos = [i for i in range(len(ts) - 1) if ts[i] == "scan" and ts[i + 1] == "join"]
        if pos:
            expect[d] = (len(pos), pos[0])
    got = {
        r["doc_id"]: (r["n_occurrences"], r["first_pos"])
        for r in REGISTRY["search_phrase_positions"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    assert expect, "fixture must contain at least one phrase match"


def test_mmr_rerank_diversifies(spark, sf_dir_t2):
    """MMR invariants: 10 unique docs ranked 1..10; the first pick is the
    cosine argmax (lambda scales it by 0.7); every later pick's stored
    score equals 0.7*sim_q - 0.3*max-sim-to-prior-picks, so scores are
    bounded above by 0.7*sim_q; deterministic across runs."""
    from spark_hbase_connector_spark.operators.similarity import brute_force_topk

    fn = REGISTRY["search_mmr_rerank"].fn
    a = fn(spark, sf_dir_t2).collect()
    b = fn(spark, sf_dir_t2).collect()
    assert a == b
    assert [r["mmr_rank"] for r in a] == list(range(1, 11))
    assert len({r["doc_id"] for r in a}) == 10
    e = spark.read.parquet(f"{sf_dir_t2}/embeddings.parquet")
    top1 = brute_force_topk(e.where(F.col("vec_id") == 0), e, k=1).collect()[0]
    assert a[0]["doc_id"] == top1["neighbor_id"]
    assert abs(a[0]["mmr_score"] - round(0.7 * top1["score"] * 10000) / 10000) < 1e-9
