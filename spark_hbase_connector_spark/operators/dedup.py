"""Deduplication operators (north-star, SURVEY.md §2.3).

Four strategies, all pure-DataFrame (no collect, no driver-side state):

- ``dedup_exact``: hash-groupBy on a key expression; one shuffle.
- ``shingle_jaccard_pairs``: *exact* near-dup pairs via an inverted-index
  self-join on word shingles — never a cross join. At 100 TB add a
  document-frequency cap on shingles (hot shingles contribute pairs
  quadratically); exposed as ``max_df``.
- ``minhash_lsh_pairs``: MinHash signatures + banded LSH candidate
  generation + exact-Jaccard verification. The scale path: candidate volume
  is tunable via (num_hashes, bands) and verification touches only
  candidates. Deterministic (fixed permutation seed) so results replay.
- ``simhash_pairs``: 64-bit SimHash + pigeonhole banding on 16-bit chunks +
  Hamming-distance verification via bit_count(xor).

Performance architecture (measured, not guessed): Spark's higher-order
array lambdas (transform/aggregate) are *interpreted* — and nested lambdas
re-evaluate subexpressions (a per-position ``element_at(split(text))``
re-splits the text every call). So everything here runs on an exploded
*postings* relation (doc_id, shingle) built with posexplode + window
``lead`` — whole-stage-codegen'd, split() evaluated once per token — and
signatures are plain groupBy aggregates (map-side partial agg applies).
All hashing is xxhash64 (JVM-side); no Python anywhere.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_hbase_connector_spark.functions.text import hash32

# MinHash affine permutations h_j(x) = (a_j * x + b_j) mod P32 over 32-bit
# hashes; constants are deterministic (seed 42) so every run and the test
# oracle agree. P32 is the smallest prime > 2^32. a < 2^31 keeps
# a*x + b < 2^63 for x < 2^32 — no long overflow under Spark 4 ANSI mode.
_P32 = 4294967311
_rng = random.Random(42)
_MINHASH_AB = [(_rng.randrange(1, 2**31), _rng.randrange(0, _P32)) for _ in range(256)]


def dedup_exact(df: DataFrame, key: Column, id_col: str) -> DataFrame:
    """Keep one representative (min id) per exact key; returns
    (id_col, copies). Scale: single hash-shuffle on the key."""
    return (
        df.groupBy(key.alias("__key"))
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("copies"))
        .drop("__key")
    )


def shingle_postings(
    df: DataFrame, text_col: str, id_col: str, w: int = 3
) -> DataFrame:
    """(id, s): the distinct word w-shingles of each document.

    Formulation chosen by measurement (sf0.1, 5k docs / 800k tokens):

    - pure-expression variants are all FRAGILE: Spark's higher-order array
      lambdas run interpreted, and CollapseProject re-inlines a separately
      projected token array back into per-position element accesses when the
      postings subtree is consumed by joins/broadcast builds — re-splitting
      the text per shingle position (observed: a 0.8s subtree ballooning to
      260 CPU-seconds inside a broadcast build);
    - window ``lead`` over posexplode'd tokens is codegen'd but pays a
      per-doc shuffle + sort + dedup shuffle on every re-execution;
    - an Arrow-batched ``mapInPandas`` is a hard optimizer barrier (Python
      eval cannot be collapsed into), vectorized, shuffle-free, and costs
      ~1s at sf0.1 regardless of what consumes it.
    """
    import pandas as pd

    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text"))
    id_type = df.schema[id_col].dataType.simpleString()

    def gen(batches):
        for pdf in batches:
            ids: list = []
            shs: list[str] = []
            for i, t in zip(pdf["id"], pdf["__text"]):
                if t is None:
                    continue
                toks = t.split(" ")
                if len(toks) < w:
                    continue
                seen = set()
                for p in range(len(toks) - w + 1):
                    s = " ".join(toks[p : p + w])
                    if s not in seen:
                        seen.add(s)
                        ids.append(i)
                        shs.append(s)
            yield pd.DataFrame({"id": ids, "s": shs})

    return src.mapInPandas(gen, schema=f"id {id_type}, s string")


def shingle_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.85,
    w: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard >= threshold pairs over distinct word w-shingles.

    Inverted-index join on the postings: count common shingles per pair,
    then Jaccard from the pair intersection and per-doc set sizes.
    ``max_df`` drops shingles occurring in more than that many docs
    (stop-shingles) — essential at scale, off by default so the result is
    exactly the naive definition.

    Output columns: (id1, id2, jaccard).
    """
    posts = shingle_postings(df, text_col, id_col, w)
    sizes = posts.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    if max_df is not None:
        hot = posts.groupBy("s").count().where(F.col("count") > max_df).select("s")
        posts = posts.join(F.broadcast(hot), "s", "left_anti")
    a, b = posts.alias("a"), posts.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("id").alias("id1"), F.col("n").alias("n1"))
    sb = sizes.select(F.col("id").alias("id2"), F.col("n").alias("n2"))
    jac = F.col("i") / (F.col("n1") + F.col("n2") - F.col("i"))
    return (
        inter.join(sa, "id1")
        .join(sb, "id2")
        .select("id1", "id2", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    posts: DataFrame, num_hashes: int = 64
) -> DataFrame:
    """(id, s) postings -> (id, sig: array<long>) MinHash signatures.

    Shape matters here (measured): a single groupBy with 64 separate
    min-aggregate expressions blows past codegen limits and runs
    interpreted (~60s at sf0.1); instead we explode each shingle hash into
    64 (j, h_j) rows and take ONE codegen'd `min` over (id, j). The
    explode multiplies rows by num_hashes, but postings are first
    repartitioned by id so map-side partial aggregation collapses each
    (id, j) group to a single row before the shuffle — the shuffle volume
    is docs x num_hashes regardless of shingle count.
    """
    params = F.array(
        *[
            F.struct(F.lit(j).alias("j"), F.lit(a).alias("a"), F.lit(b).alias("b"))
            for j, (a, b) in enumerate(_MINHASH_AB[:num_hashes])
        ]
    )
    # Two load-bearing physical choices (each measured ~30-70x at sf0.1):
    # 1. Project the shingle hash BEFORE the exchange. CollapseProject will
    #    otherwise inline `xxhash64(shingle)` past the shuffle into the
    #    row-multiplied post-explode stage, re-evaluating the string hash
    #    num_hashes times per posting (70s -> 1s when materialized here).
    # 2. Explicit partition count: AQE coalesces shuffles by BYTE size, but
    #    the next stage multiplies rows x num_hashes, so byte heuristics
    #    would squeeze the CPU burn onto ~3 tasks. User repartitions are
    #    exempt from AQE coalescing.
    n_parts = posts.sparkSession.sparkContext.defaultParallelism
    h = posts.select("id", hash32(F.col("s")).alias("__h")).repartition(n_parts, "id")
    ex = h.select("id", "__h", F.explode(params).alias("p"))
    hj = (F.col("p.a") * F.col("__h") + F.col("p.b")) % F.lit(_P32)
    m = ex.groupBy("id", F.col("p.j").alias("j")).agg(F.min(hj).alias("m"))
    return m.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "m"))), lambda x: x["m"]
        ).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.85,
    num_hashes: int = 64,
    bands: int = 16,
    w: int = 3,
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, exact-Jaccard verified.

    Pipeline: postings -> signatures -> ``bands`` band keys (xxhash of each
    signature row-group) -> explode -> self-join per band bucket -> distinct
    candidate pairs -> verify exact Jaccard by re-joining the postings.
    With (64, 16) the LSH s-curve threshold is (1/16)^(1/4) = 0.5: a
    0.9-similar pair is missed with p < 1e-7, and everything reported is
    exact-verified, so at these parameters the output equals the exact
    ``shingle_jaccard_pairs`` result with near-certainty while only ever
    comparing candidate pairs.

    Output columns: (id1, id2, jaccard).
    """
    rows = num_hashes // bands
    posts = shingle_postings(df, text_col, id_col, w)
    sizes = posts.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    sig = minhash_signatures(posts, num_hashes)
    band_cols = F.array(
        *[
            F.xxhash64(F.lit(j), F.concat_ws(",", F.slice("sig", j * rows + 1, rows)))
            for j in range(bands)
        ]
    )
    buckets = sig.select("id", F.posexplode(band_cols).alias("band", "bkey"))
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    # verification: count common shingles only for candidate pairs
    p1 = posts.select(F.col("id").alias("id1"), "s")
    p2 = posts.select(F.col("id").alias("id2"), "s")
    inter = (
        cand.join(p1, "id1")
        .join(p2, ["id2", "s"])
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("id").alias("id1"), F.col("n").alias("n1"))
    sb = sizes.select(F.col("id").alias("id2"), F.col("n").alias("n2"))
    jac = F.col("i") / (F.col("n1") + F.col("n2") - F.col("i"))
    return (
        inter.join(sa, "id1")
        .join(sb, "id2")
        .select("id1", "id2", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def with_simhash64(posts: DataFrame, id_col: str = "id") -> DataFrame:
    """(id, s) postings -> (id, h: long) 64-bit SimHash.

    Bit b of the result is 1 iff the majority of shingle hashes have bit b
    set: one groupBy with 64 plain sums (partial agg applies), then the
    64-bit word is assembled from the votes.
    """
    # exchange barrier after the hash projection: without it CollapseProject
    # inlines xxhash64(s) into all 64 partial-sum update expressions
    # (64 string hashes per row; see minhash_signatures for the measurement)
    n_parts = posts.sparkSession.sparkContext.defaultParallelism
    ex = posts.select(F.col(id_col).alias("id"), F.xxhash64(F.col("s")).alias("__h")).repartition(
        n_parts, "id"
    )
    sums = [
        F.sum(F.shiftrightunsigned("__h", b).bitwiseAND(F.lit(1))).alias(f"__b{b}")
        for b in range(64)
    ] + [F.count(F.lit(1)).alias("__n")]
    g = ex.groupBy("id").agg(*sums)
    word = F.lit(0).cast("long")
    for b in range(64):
        bit_set = (F.col(f"__b{b}") * 2) > F.col("__n")  # majority vote
        word = word + F.when(bit_set, F.lit(-(2**63) if b == 63 else 2**b)).otherwise(
            F.lit(0)
        )
    return g.select("id", word.alias("h"))


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    w: int = 3,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    Pigeonhole banding: split the 64-bit hash into 4 x 16-bit chunks; any
    pair within Hamming distance 3 must agree on at least one chunk, so
    candidates come from equality joins on chunks (never a cross join),
    then are verified with bit_count(xor). Recall is *guaranteed* (exact)
    for max_hamming <= 3; for looser bounds increase the chunk count.

    Output columns: (id1, id2, hamming).
    """
    base = with_simhash64(shingle_postings(df, text_col, id_col, w))
    chunks = F.array(
        *[
            F.shiftrightunsigned(F.col("h"), 16 * j).bitwiseAND(F.lit(0xFFFF))
            for j in range(4)
        ]
    )
    buckets = base.select("id", "h", F.posexplode(chunks).alias("chunk", "ckey"))
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ckey") == F.col("b.ckey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.col("a.h").alias("h1"),
            F.col("b.h").alias("h2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return cand.select("id1", "id2", ham.cast("int").alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
