"""Corpus-preparation operators a training-data pipeline runs between raw
ingest and shard export: vocabulary coverage gates, deterministic per-source
sampling, hashed sparse features, and end-to-end semantic (embedding-space)
dedup — each a registry entry with a DuckDB oracle, composing the engine's
existing primitives (SURVEY.md §2.3).

Scale notes:
- `vocab_coverage` is two partial-aggregated token groupBys plus a
  broadcast of the top-V vocabulary (V rows, key-sized) — hot tokens are
  absorbed by map-side combine, the fact table shuffles once;
- `sample_per_key_hash` is the distributed answer to per-key reservoir
  sampling: rank by a uniform deterministic hash. Spark 4's
  WindowGroupLimit pushes the rank<=k cut below the exchange, so only
  ~k rows per partition per key shuffle (same plan family as
  `dedup_latest_by_key`);
- `text_hash_features` is the hashing trick at corpus scale: bounded
  feature space (no vocabulary build, no second pass), one explode + one
  partial-aggregated groupBy; output is the sparse exploded form so
  downstream can pivot per model;
- `pipeline_semantic_dedup` chains the IVF-bucketed cosine pair search
  (candidates ~ sum of squared cell sizes, never all-pairs) into the
  checkpointed connected-components loop (node-sized shuffles) — the
  full SemDeDup-style pass over an embedded corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_hbase_connector_spark.catalogs import load
from spark_hbase_connector_spark.functions.urls import (
    duckdb_normalize_url,
    normalize_url,
    url_domain,
)
from spark_hbase_connector_spark.operators.dedup import (
    shingle_jaccard_pairs,
    shingle_jaccard_pairs_prefix,
)
from spark_hbase_connector_spark.operators.graph import connected_components
from spark_hbase_connector_spark.operators.similarity import cosine_pairs_lsh
from spark_hbase_connector_spark.queries.northstar import (
    _DUCK_IVF_AV,
    _DUCK_SHINGLES,
    _DUCK_VECS,
    duck_cc_min_label,
)
from spark_hbase_connector_spark.queries.registry import query

_VOCAB_SIZE = 500


@query(
    "vocab_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    t AS (SELECT source, tok FROM toks WHERE tok <> ''),
    counts AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS r FROM counts
      ) WHERE r <= {_VOCAB_SIZE}
    )
    SELECT t.source,
           count(*) AS total_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS oov_tokens,
           round(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS oov_rate
    FROM t LEFT JOIN vocab v ON t.tok = v.tok
    GROUP BY t.source ORDER BY t.source
    """,
    tags=("text", "pipeline", "vocab"),
    bench=True,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage gate: build the top-V corpus
    vocabulary by frequency (deterministic count-then-token tiebreak),
    then measure each source's out-of-vocabulary token rate — the QA
    check run before committing to a tokenizer or mixing a new source in.

    r10 plan: everything derives from ONE corpus tokenize pass — the
    per-(source, token) count relation is persisted (distinct-pair
    sized: |vocabulary| x |sources|, far below token-occurrence volume)
    and feeds BOTH the global vocabulary counts (sum of longs — exact,
    order-free) and the weighted coverage aggregation; the previous
    shape planned the scan+explode subtree twice (occurrence-sized,
    twice). Top-V via sort+limit -> TakeOrderedAndProject: per-partition
    partial top-V then a V-row merge on the driver side — NOT a global
    window (row_number over an unpartitioned ordering would drag the
    whole vocabulary relation into one partition)."""
    d = load(spark, sf_dir, "documents")
    st = (
        d.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count("*").alias("n"))
        .persist()
    )
    counts = st.groupBy("tok").agg(F.sum("n").alias("c"))
    vocab = (
        counts.orderBy(F.col("c").desc(), "tok")
        .limit(_VOCAB_SIZE)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    oov_n = F.sum(F.when(F.col("in_vocab").isNull(), F.col("n")).otherwise(0))
    return (
        st.join(F.broadcast(vocab), "tok", "left")
        .groupBy("source")
        .agg(
            F.sum("n").alias("total_tokens"),
            oov_n.cast("bigint").alias("oov_tokens"),
            F.round(oov_n / F.sum("n"), 4).alias("oov_rate"),
        )
        .orderBy("source")
    )


@query(
    "sample_per_key_hash",
    oracle="""
    SELECT source, doc_id, CAST(rnk AS INTEGER) AS rnk FROM (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rnk
      FROM documents
    ) WHERE rnk <= 5 ORDER BY source, rnk
    """,
    tags=("sampling", "pipeline"),
)
def sample_per_key_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-key sample — the distributed replacement for
    per-key reservoir sampling: rank every row by a uniform hash of its id
    and keep the first k. Same sample on every run and every engine (md5
    is the cross-engine order), no rand() (which would break retry/replay
    determinism at scale). WindowGroupLimit prunes to ~k rows per
    partition before the per-key exchange."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rnk"))
        .where(F.col("rnk") <= 5)
        .orderBy("source", "rnk")
    )


@query(
    "text_hash_features",
    oracle="""
    WITH t AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id <= 100
    ),
    b AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(tok), 1, 8))::UBIGINT % 64 AS INTEGER)
               AS bucket
      FROM t WHERE tok <> ''
    )
    SELECT doc_id, bucket, count(*) AS cnt
    FROM b GROUP BY doc_id, bucket ORDER BY doc_id, bucket
    """,
    tags=("text", "features", "pipeline"),
    bench=True,
)
def text_hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick sparse features: token -> md5-derived bucket in a
    fixed 64-dim space, emitted as (doc_id, bucket, count) sparse rows.
    No vocabulary pass, no global state — the feature space is bounded by
    construction, so this is one explode + one partial-aggregated groupBy
    regardless of corpus size. md5's first 8 hex digits are the
    cross-engine uniform hash (same buckets in Spark and DuckDB)."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 100)
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint") % 64
    ).cast("int")
    return (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
        .orderBy("doc_id", "bucket")
    )


@query(
    "pipeline_semantic_dedup",
    oracle=f"""
    WITH RECURSIVE {_DUCK_VECS},
    {_DUCK_IVF_AV},
    prs AS MATERIALIZED (
      SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
      FROM av a JOIN av b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
      WHERE list_inner_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.4
    ),
    edges AS MATERIALIZED (SELECT id1 AS a, id2 AS b FROM prs
              UNION ALL SELECT id2, id1 FROM prs),
    enodes AS MATERIALIZED (SELECT DISTINCT a AS id FROM edges),
    {duck_cc_min_label('enodes')},
    assigned AS (
      SELECT v.vec_id, coalesce(c.component, v.vec_id) AS component
      FROM v LEFT JOIN comp c ON v.vec_id = c.id
    )
    SELECT component AS rep_id, count(*) AS n_members
    FROM assigned GROUP BY component ORDER BY component
    """,
    tags=("similarity", "dedup", "pipeline"),
)
def pipeline_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup end-to-end: IVF-bucketed cosine pair
    search (cosine >= 0.4) -> connected components -> keep the lowest id
    per cluster as the representative; singletons survive as their own
    representative. Output is the survivor manifest (rep_id, cluster size).

    Composition of two audited scale paths: candidate volume is bounded by
    the cell assignment (never all-pairs), and the component loop shuffles
    node-sized labels. The oracle replays the identical candidate
    generation via the shared `_DUCK_IVF_AV` vector-attached self-join
    (see its comment for why the shape — not just the ops — matters at
    sf10) plus the unrolled min-label/pointer-jump closure; it completes
    sf10 in ~114 s where the r8 formulation spilled 42-54 GB, so the
    entry no longer needs an oracle-superlinear exclusion."""
    e = load(spark, sf_dir, "embeddings")
    # corpus-proportional cell count (shared formula with the lsh pair
    # entry and its oracle): constant expected cell size at any sf
    ncells = max(16, e.count() // 500)
    centroids = e.where(F.col("vec_id") < ncells).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    pairs = cosine_pairs_lsh(e, threshold=0.4, centroids=centroids, nprobe=2)
    comp = connected_components(pairs.select("id1", "id2"))
    assigned = (
        e.select("vec_id")
        .join(comp, e.vec_id == comp.id, "left")
        .select(
            "vec_id", F.coalesce(F.col("comp"), F.col("vec_id")).alias("component")
        )
    )
    return (
        assigned.groupBy("component")
        .agg(F.count("*").alias("n_members"))
        .select(F.col("component").alias("rep_id"), "n_members")
        .orderBy("rep_id")
    )


@query(
    "sample_bernoulli_hash",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
               / 4294967296.0 AS u,
             CASE WHEN CAST(substring(source, 4) AS INTEGER) % 2 = 0
                  THEN 0.25 ELSE 0.5 END AS rate
      FROM documents
    )
    SELECT doc_id, source FROM keyed WHERE u < rate ORDER BY doc_id
    """,
    tags=("sampling", "pipeline"),
)
def sample_bernoulli_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-based deterministic sampling (the mixture-weight downsampler):
    keep a row iff hash(id)/2^32 < rate(source). Unlike ``rand()``-based
    sampling this is reproducible across runs, retries, and engines — a
    task that fails and replays keeps the SAME sample, which exactly-once
    pipelines require. Map-only (no shuffle); the per-source rate here is
    an expression (even sources 0.25, odd 0.5) — in production it is a
    broadcast-joined rate table, e.g. the output of
    `domain_mixture_weights`. Complements `sample_per_key_hash` (exact-k)
    with proportional sampling."""
    d = load(spark, sf_dir, "documents")
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(4294967296.0)
    rate = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(0.25)
    ).otherwise(F.lit(0.5))
    return (
        d.select("doc_id", "source", u.alias("u"), rate.alias("rate"))
        .where(F.col("u") < F.col("rate"))
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@query(
    "sample_weighted_reservoir",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             ln(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                / 4294967296.0 + 5.421e-20)
               / CAST(n_chars AS DOUBLE) AS es_key
      FROM documents
    )
    SELECT doc_id, source, n_chars, CAST(rnk AS INTEGER) AS rnk FROM (
      SELECT doc_id, source, n_chars,
             row_number() OVER (ORDER BY es_key DESC, doc_id) AS rnk
      FROM keyed
    ) WHERE rnk <= 100
    """,
    tags=("sampling", "weighted", "pipeline"),
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, Efraimidis-Spirakis A-ES:
    per item draw u = hash-uniform(0,1), key = ln(u)/w (monotone in
    u^(1/w)), keep the k largest keys — inclusion probability is exactly
    proportional-to-size without replacement, and because u comes from
    the md5 convention (not rand()) the sample is deterministic across
    runs, retries, and engines. Weight = n_chars (byte-budget sampling:
    long docs proportionally likelier — the shape used to draw eval/
    inspection sets from a 100 TB corpus under a size budget). Plan:
    map-side key computation + global top-k = TakeOrderedAndProject
    (each task keeps its own top-100; only k rows per task reach the
    driver-side merge — no global sort, no full shuffle). The +5.421e-20
    epsilon guards ln(0) for the u=0 hash bucket, identically on both
    engines."""
    d = load(spark, sf_dir, "documents")
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(4294967296.0)
    es_key = F.log(u + F.lit(5.421e-20)) / F.col("n_chars").cast("double")
    keyed = d.select("doc_id", "source", "n_chars", es_key.alias("es_key"))
    # top-k FIRST (TakeOrderedAndProject — per-task top-100, no global
    # sort/exchange of the corpus), THEN rank the 100 survivors (the
    # global window moves 100 rows, not the table)
    top = keyed.orderBy(F.col("es_key").desc(), F.col("doc_id")).limit(100)
    w = Window.orderBy(F.col("es_key").desc(), F.col("doc_id"))
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select("doc_id", "source", "n_chars", "rnk")
    )


@query(
    "sample_mixture_temperature",
    oracle="""
    WITH sizes AS (
      SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(n_docs) AS DOUBLE) AS n_corpus,
             sum(pow(CAST(n_docs AS DOUBLE), 0.5)) AS s_alpha
      FROM sizes
    ),
    rates AS (
      SELECT source, n_docs,
             round(least(1.0, 0.3 * n_corpus / s_alpha
                              * pow(CAST(n_docs AS DOUBLE), -0.5)), 6) AS rate
      FROM sizes, tot
    ),
    keyed AS (
      SELECT d.source,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
               / 4294967296.0 AS u
      FROM documents d
    ),
    kept AS (
      SELECT k.source, count(*)::BIGINT AS n_kept
      FROM keyed k JOIN rates r ON k.source = r.source
      WHERE k.u < r.rate GROUP BY k.source
    )
    SELECT r.source, r.n_docs, r.rate,
           coalesce(n_kept, 0)::BIGINT AS n_kept,
           round(coalesce(n_kept, 0) * 1.0 / r.n_docs, 4) AS frac_kept
    FROM rates r LEFT JOIN kept USING (source)
    """,
    tags=("sampling", "mixture", "pipeline"),
)
def sample_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture sampling (the multilingual/multi-domain
    rebalancer from the mBERT/XLM-R line of work, alpha = 0.5, budget =
    30% of the corpus): per-source keep-rate proportional to
    n_docs^(alpha-1), so small sources are upsampled relative to their
    share and dominant sources capped — then DETERMINISTIC hash-Bernoulli
    membership per doc at that rate (same md5-u convention as
    `sample_bernoulli_hash`: replayable across runs, retries, engines).
    Rates are rounded to 6dp BEFORE the membership comparison on both
    engines, so the kept-set is bit-identical by construction. Plan: one
    tiny partial-agg shuffle for source sizes, a single-row broadcast for
    the normalizer, a broadcast rate join, then a map-only filter — no
    data-sized shuffle anywhere; at 100 TB this is the shape that turns
    `domain_mixture_weights` output into an actual training mix."""
    d = load(spark, sf_dir, "documents")
    sizes = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = sizes.agg(
        F.sum("n_docs").cast("double").alias("n_corpus"),
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(0.5))).alias("s_alpha"),
    )
    rates = sizes.join(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(0.3)
                * F.col("n_corpus")
                / F.col("s_alpha")
                * F.pow(F.col("n_docs").cast("double"), F.lit(-0.5)),
            ),
            6,
        ).alias("rate"),
    )
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(4294967296.0)
    kept = (
        d.select("source", u.alias("u"))
        .join(F.broadcast(rates.select("source", "rate")), "source")
        .where(F.col("u") < F.col("rate"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    n_kept = F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint")
    return rates.join(F.broadcast(kept), "source", "left").select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "rate",
        n_kept.alias("n_kept"),
        F.round(n_kept * 1.0 / F.col("n_docs"), 4).alias("frac_kept"),
    )


@query(
    "embedding_label_centroids",
    oracle="""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    ex AS (
      SELECT vec_id, label, i AS pos, e[i] AS val
      FROM v, unnest(range(1, len(e) + 1)) AS t(i)
    ),
    cent AS (
      SELECT label, pos, avg(val) AS c FROM ex GROUP BY label, pos
    ),
    dots AS (
      SELECT ex.vec_id, ex.label,
             sum(ex.val * cent.c) AS dot,
             sqrt(sum(ex.val * ex.val)) AS vn,
             sqrt(sum(cent.c * cent.c)) AS cn
      FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
      GROUP BY ex.vec_id, ex.label
    )
    SELECT label, count(*) AS n_members,
           round(avg(dot / (vn * cn)), 4) AS avg_cos_to_centroid
    FROM dots GROUP BY label ORDER BY label
    """,
    tags=("similarity", "centroid", "quality"),
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid cohesion — the embedding-space class-quality
    report (avg cosine of members to their label centroid; low cohesion
    flags mislabeled or noisy classes before training).

    This is the VERTICAL array-aggregation pattern: posexplode to
    (label, pos, val), one partial-aggregated avg per (label, pos) — a
    labels x dims relation, broadcast back onto the exploded vectors for
    the dot products, then per-vector and per-label rollups. Vectors
    cross no Python boundary and the only data-sized shuffle is the
    per-vector dot-product aggregation; everything else is key-sized.
    (`train_centroids` is the k-means sibling that learns UNSUPERVISED
    cells from the same layout.)"""
    e = load(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "val"),
    ).select("vec_id", "label", (F.col("pos0") + 1).alias("pos"), "val")
    cent = ex.groupBy("label", "pos").agg(F.avg("val").alias("c"))
    dots = (
        ex.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("val") * F.col("c")).alias("dot"),
            F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("vn"),
            F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("cn"),
        )
    )
    return (
        dots.groupBy("label")
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.avg(F.col("dot") / (F.col("vn") * F.col("cn"))), 4).alias(
                "avg_cos_to_centroid"
            ),
        )
        .orderBy("label")
    )


@query(
    "bpe_pair_counts",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    vocab AS (
      SELECT tok, count(*) AS c FROM toks WHERE tok <> '' GROUP BY tok
    ),
    pairs AS (
      SELECT substring(tok, i, 2) AS pair, c
      FROM vocab, unnest(range(1, length(tok))) t(i)
      WHERE length(tok) >= 2
    )
    SELECT pair, CAST(sum(c) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 20
    """,
    tags=("text", "tokenizer", "bpe"),
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE merge decision: corpus-weighted adjacent character
    pair frequencies (the pair with the max count is merge #1 when
    training a byte-pair tokenizer on this corpus).

    The trick that makes this cheap: pair statistics are computed over
    the DISTINCT token vocabulary weighted by token counts — the char
    explode runs over vocabulary-sized data ((|vocab| x avg_len) rows),
    never corpus-sized; the corpus is touched once by the token count.
    Full BPE iterates merge -> re-segment; each iteration is this same
    plan over a re-segmented vocabulary (iterative like `graph_pagerank`,
    driver-side loop, vocabulary-sized state)."""
    d = load(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .where(F.length("tok") >= 2)
    )
    pairs = vocab.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("tok") - 1),
                lambda i: F.col("tok").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "c",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(20)
    )


@query(
    "dedup_normalized_exact",
    oracle="""
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                  ' +', ' ', 'g')) AS nt
      FROM documents
    ),
    grp AS (
      SELECT nt, min(doc_id) AS keep_id, count(*) AS copies
      FROM norm GROUP BY nt
    )
    SELECT keep_id, copies FROM grp WHERE copies >= 1 ORDER BY keep_id
    """,
    tags=("dedup", "normalization"),
)
def dedup_normalized_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-then-exact-dedup — the first dedup pass of every web
    pipeline: casefold, strip non-alphanumerics, collapse whitespace,
    THEN hash-group. Catches trivially-reformatted copies (punctuation /
    case / spacing variants) that byte-exact dedup misses, at exactly
    the same single-shuffle cost; near-dup (MinHash) handles what
    normalization can't. The normalization recipe is shared verbatim
    with the oracle, because dedup recall is only as reproducible as the
    normalizer."""
    d = load(spark, sf_dir, "documents")
    nt = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return (
        d.select("doc_id", nt.alias("nt"))
        .groupBy("nt")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("copies"))
        .select("keep_id", "copies")
        .orderBy("keep_id")
    )


@query(
    "embedding_pca_qa",
    oracle="""
    SELECT count(*) AS n_vectors, 8 AS k,
           TRUE AS ratios_sorted, TRUE AS captures_above_uniform
    FROM embeddings
    """,
    tags=("similarity", "pca", "qa"),
)
def embedding_pca_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA reduction QA gate (`operators/similarity.py:pca_project`):
    project the corpus to k=8 components and certify the contract — one
    projected row per input vector, explained-variance ratios sorted
    non-increasing, and the top-8 capturing at least their uniform share
    (8/64) of total variance (eigen-components are ordered by captured
    variance, so this holds for ANY data; a violation means the
    decomposition or the partial-covariance reduce broke). The
    eigendecomposition itself is driver-side d x d — not
    SQL-replayable — so, like `approx_quantiles_qa`, the ORACLE checks
    the contract, not the numbers."""
    from spark_hbase_connector_spark.operators.similarity import pca_project

    e = load(spark, sf_dir, "embeddings")
    proj, ratios = pca_project(
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")),
        k=8,
    )
    n = proj.agg(F.count("*").cast("bigint").alias("n"))
    sorted_ok = bool(all(ratios[i] >= ratios[i + 1] for i in range(len(ratios) - 1)))
    uniform_ok = bool(ratios.sum() >= 8.0 / 64.0)
    return n.select(
        F.col("n").alias("n_vectors"),
        F.lit(8).alias("k"),
        F.lit(sorted_ok).alias("ratios_sorted"),
        F.lit(uniform_ok).alias("captures_above_uniform"),
    )


@query(
    "text_zipf_fit",
    oracle="""
    WITH counts AS (
      SELECT tok, count(*) AS c FROM (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
      ) WHERE tok <> '' GROUP BY tok
    ),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r
      FROM counts
    ),
    top AS (SELECT ln(r) AS lr, ln(c) AS lc FROM ranked WHERE r <= 1000)
    SELECT round(regr_slope(lc, lr), 4) AS zipf_slope,
           round(regr_r2(lc, lr), 4) AS r2,
           count(*) AS n_points
    FROM top
    """,
    tags=("text", "stats", "zipf"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the token frequency distribution: log-log
    regression of frequency on rank for the top-1000 tokens. Natural
    corpora fit slope ~ -1; a large deviation (or a poor r2) flags
    template/boilerplate-dominated or synthetic text — a corpus-level
    QA signal complementing the per-document gates. The ranked relation
    is vocabulary-sized; the regression is one partial-aggregated pass
    (regr_* are algebraic aggregates)."""
    d = load(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    # top-1000 FIRST via TakeOrderedAndProject (distributed partial
    # top-k), THEN rank within the 1000-row result — the global
    # row_number window only ever sees a bounded relation, never the
    # whole vocabulary (the vocab_coverage lesson)
    top1k = counts.orderBy(F.col("c").desc(), "tok").limit(1000)
    w = Window.orderBy(F.col("c").desc(), "tok")
    top = top1k.withColumn("r", F.row_number().over(w)).select(
        F.log(F.col("r")).alias("lr"), F.log(F.col("c")).alias("lc")
    )
    return top.agg(
        F.round(F.expr("regr_slope(lc, lr)"), 4).alias("zipf_slope"),
        F.round(F.expr("regr_r2(lc, lr)"), 4).alias("r2"),
        F.count("*").alias("n_points"),
    )


@query(
    "pipeline_lineage_report",
    oracle="""
    WITH norm AS (
      SELECT min(doc_id) AS doc_id
      FROM (SELECT doc_id,
                   trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                        ' +', ' ', 'g')) AS nt
            FROM documents)
      GROUP BY nt
    ),
    gated AS (
      SELECT d.doc_id, d.source, d.text FROM documents d
      JOIN norm USING (doc_id)
      WHERE d.n_chars BETWEEN 100 AND 500
    ),
    sh AS (
      SELECT doc_id, source,
             list_distinct(list_transform(range(1, len(l) - 3),
               i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' ||
                    l[i+3] || ' ' || l[i+4])) AS shs
      FROM (SELECT doc_id, source, string_split(text, ' ') AS l FROM gated)
      WHERE len(l) >= 5
    ),
    post AS (SELECT doc_id, source, unnest(shs) AS s FROM sh),
    contaminated AS (
      SELECT DISTINCT tr.doc_id
      FROM (SELECT doc_id, s FROM post WHERE source != 'src0') tr
      JOIN (SELECT doc_id, s FROM post WHERE source = 'src0') ev USING (s)
      GROUP BY tr.doc_id, ev.doc_id HAVING count(*) >= 3
    ),
    clean AS (
      SELECT g.doc_id FROM gated g
      WHERE g.source != 'src0'
        AND g.doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    train AS (
      SELECT doc_id FROM clean
      WHERE (('0x' || substr(md5('split:' || doc_id), 1, 8))::BIGINT % 100) < 80
    )
    SELECT stage, rows FROM (
      SELECT '1_ingest' AS stage, (SELECT count(*) FROM documents) AS rows
      UNION ALL SELECT '2_normalize_dedup', (SELECT count(*) FROM norm)
      UNION ALL SELECT '3_length_gate', (SELECT count(*) FROM gated)
      UNION ALL SELECT '4_decontaminated', (SELECT count(*) FROM clean)
      UNION ALL SELECT '5_train_split', (SELECT count(*) FROM train)
    ) ORDER BY stage
    """,
    tags=("pipeline", "lineage", "curation"),
)
def pipeline_lineage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline as ONE plan, reported as per-stage
    lineage counts — ingest -> normalize+exact-dedup -> length gate ->
    benchmark decontamination (drop eval source + any doc sharing >=3
    distinct 5-grams with it) -> deterministic 80% train split. The
    count-per-stage report is what a pipeline run publishes for audit
    ("where did my rows go"), and the composition proves the stages —
    each an audited standalone operator — actually chain. Each stage
    reuses the standalone entry's exact semantics
    (`dedup_normalized_exact`, `contamination_ngram`,
    `split_train_val_test`), so the lineage is cross-checked against
    their oracles transitively."""
    from spark_hbase_connector_spark.operators.dedup import shingle_postings
    from spark_hbase_connector_spark.queries.northstar import _SPARK_H100

    d = load(spark, sf_dir, "documents")
    nt = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    norm = (
        d.select("doc_id", nt.alias("nt"))
        .groupBy("nt")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    gated = d.join(norm, "doc_id").where(F.col("n_chars").between(100, 500))
    gated = gated.persist()
    ev = shingle_postings(
        gated.where(F.col("source") == "src0"), "text", "doc_id", w=5
    ).withColumnRenamed("id", "eval_id")
    tr = shingle_postings(
        gated.where(F.col("source") != "src0"), "text", "doc_id", w=5
    ).withColumnRenamed("id", "train_id")
    contaminated = (
        tr.join(F.broadcast(ev), "s")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= 3)
        .select(F.col("train_id").alias("doc_id"))
        .distinct()
    )
    clean = (
        gated.where(F.col("source") != "src0")
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id")
    )
    clean = clean.persist()
    train = clean.where(F.expr(_SPARK_H100.format(salt="split:")) < 80)

    def stage(name, df):
        return df.agg(F.count(F.lit(1)).alias("rows")).select(
            F.lit(name).alias("stage"), F.col("rows").cast("bigint")
        )

    out = (
        stage("1_ingest", d)
        .unionByName(stage("2_normalize_dedup", norm))
        .unionByName(stage("3_length_gate", gated))
        .unionByName(stage("4_decontaminated", clean))
        .unionByName(stage("5_train_split", train))
        .orderBy("stage")
    )
    # materialize the 5-row report eagerly so the stage caches can be
    # released now — without this every invocation leaks two persisted
    # relations into the long-running registry session
    try:
        return out.localCheckpoint()
    finally:
        gated.unpersist()
        clean.unpersist()


@query(
    "dedup_threshold_histogram",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(l) - 1),
               i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS shs
      FROM t WHERE len(l) >= 3
    ),
    post AS (SELECT doc_id, unnest(shs) AS s FROM sh),
    sizes AS (SELECT doc_id, len(shs) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
      FROM post a JOIN post b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jac AS (
      SELECT round(floor((i * 1.0 / (sa.n + sb.n - i)) * 10) / 10.0, 1) AS bucket
      FROM inter
      JOIN sizes sa ON id1 = sa.doc_id
      JOIN sizes sb ON id2 = sb.doc_id
      WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.1
    )
    SELECT bucket, count(*) AS n_pairs
    FROM jac GROUP BY bucket ORDER BY bucket
    """,
    tags=("dedup", "tuning", "histogram"),
)
def dedup_threshold_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-threshold tuning curve: the histogram of candidate-pair
    Jaccard scores (0.1-wide buckets, floor at 0.1) — ONE pass over the
    pair relation answers "how many near-dups would each threshold
    remove", instead of re-running the dedup per candidate threshold.
    This is the knob-setting tool for `dedup_ngram_jaccard`'s threshold
    and the LSH banding parameters; same inverted-index candidate
    generation, so cost is the pair join it would run anyway."""
    from spark_hbase_connector_spark.operators.dedup import shingle_jaccard_pairs

    d = load(spark, sf_dir, "documents")
    pairs = shingle_jaccard_pairs(d, "text", "doc_id", threshold=0.1)
    bucket = F.round(F.floor(F.col("jaccard") * 10) / 10.0, 1)
    return (
        pairs.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("bucket")
    )


@query(
    "knn_label_qa",
    oracle=f"""
    WITH {_DUCK_VECS},
    ev AS (SELECT vec_id, e, nrm FROM n WHERE vec_id % 10 = 0
           AND vec_id < 200),
    tr AS (SELECT vec_id, e, nrm FROM n WHERE vec_id % 10 != 0),
    lbl AS (SELECT vec_id, label FROM embeddings),
    scored AS (
      SELECT ev.vec_id AS eval_id, tr.vec_id AS train_id,
             list_sum(list_transform(range(1, len(ev.e) + 1),
                      i -> ev.e[i] * tr.e[i])) / (ev.nrm * tr.nrm) AS score
      FROM ev CROSS JOIN tr
    ),
    top3 AS (
      SELECT eval_id, train_id FROM (
        SELECT eval_id, train_id,
               row_number() OVER (PARTITION BY eval_id
                                  ORDER BY score DESC, train_id) AS rn
        FROM scored) WHERE rn <= 3
    ),
    votes AS (
      SELECT t.eval_id, l.label, count(*) AS v
      FROM top3 t JOIN lbl l ON l.vec_id = t.train_id
      GROUP BY 1, 2
    ),
    pred AS (
      SELECT eval_id, label AS predicted FROM (
        SELECT eval_id, label,
               row_number() OVER (PARTITION BY eval_id
                                  ORDER BY v DESC, label) AS rn
        FROM votes) WHERE rn = 1
    )
    SELECT count(*) AS n_eval,
           CAST(sum(CASE WHEN p.predicted = l.label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct
    FROM pred p JOIN lbl l ON l.vec_id = p.eval_id
    """,
    tags=("similarity", "knn", "qa"),
)
def knn_label_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label-transfer evaluation: every 10th vector is held out,
    classified by majority vote of its 3 nearest labeled neighbors
    (cosine), and scored against its true label — the standard quality
    probe for an embedding space ("do nearest neighbors share labels?"),
    run entirely through the engine's ANN surface. Deterministic ties
    (neighbor id, then label) make the accuracy EXACTLY replayable, so
    unlike the recall gates this oracle checks the numbers, not just a
    contract. The eval panel is FIXED at the 20 held-out vectors with
    vec_id < 200 (same predicate both engines, stable at every SF): a
    %10-only holdout made the ORACLE quadratic in corpus size (0.1n x
    0.9n cross join — the r7 sf10 exclusion); the fixed panel keeps it
    linear (20 x n) so the entry sweeps at sf10+, while the Spark side
    still classifies against the FULL training corpus. Scale path: swap
    the exact scoring for `ann_topk_ivf` (identical downstream
    vote/score plan)."""
    from spark_hbase_connector_spark.operators.similarity import brute_force_topk

    e = load(spark, sf_dir, "embeddings")
    ev = e.where((F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 200))
    tr = e.where(F.col("vec_id") % 10 != 0)
    top3 = brute_force_topk(
        ev.select("vec_id", "embedding"),
        tr.select("vec_id", "embedding"),
        k=3,
    )
    lbl = e.select("vec_id", "label")
    votes = (
        top3.join(lbl.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count("*").alias("v"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("v").desc(), "label")
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("query_id").alias("vec_id"), F.col("label").alias("predicted"))
    )
    return pred.join(lbl, "vec_id").agg(
        F.count("*").alias("n_eval"),
        F.sum(F.when(F.col("predicted") == F.col("label"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
    )


@query(
    "bpe_train_merges",
    oracle=r"""
    WITH words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    vocab AS (
      SELECT w, count(*)::BIGINT AS cnt FROM words WHERE w <> ''
      GROUP BY w ORDER BY cnt DESC, w LIMIT 100
    ),
    v0 AS (SELECT cnt, regexp_replace(w, '(.)', '·\1', 'g') AS seq FROM vocab),
    p1 AS (
      SELECT pair, sum(cnt)::BIGINT AS n FROM (
        SELECT cnt, unnest(list_transform(range(2, len(string_split(seq, '·'))),
          i -> string_split(seq, '·')[i] || '·' || string_split(seq, '·')[i+1])) AS pair
        FROM v0) GROUP BY pair
    ),
    b1 AS (SELECT pair, n FROM p1 ORDER BY n DESC, pair LIMIT 1),
    v1 AS (SELECT cnt, replace(seq, '·' || b1.pair,
                 '·' || replace(b1.pair, '·', '')) AS seq FROM v0, b1),
    p2 AS (
      SELECT pair, sum(cnt)::BIGINT AS n FROM (
        SELECT cnt, unnest(list_transform(range(2, len(string_split(seq, '·'))),
          i -> string_split(seq, '·')[i] || '·' || string_split(seq, '·')[i+1])) AS pair
        FROM v1) GROUP BY pair
    ),
    b2 AS (SELECT pair, n FROM p2 ORDER BY n DESC, pair LIMIT 1),
    v2 AS (SELECT cnt, replace(seq, '·' || b2.pair,
                 '·' || replace(b2.pair, '·', '')) AS seq FROM v1, b2),
    p3 AS (
      SELECT pair, sum(cnt)::BIGINT AS n FROM (
        SELECT cnt, unnest(list_transform(range(2, len(string_split(seq, '·'))),
          i -> string_split(seq, '·')[i] || '·' || string_split(seq, '·')[i+1])) AS pair
        FROM v2) GROUP BY pair
    ),
    b3 AS (SELECT pair, n FROM p3 ORDER BY n DESC, pair LIMIT 1)
    SELECT 1 AS round, pair, replace(pair, '·', '') AS merged, n FROM b1
    UNION ALL SELECT 2, pair, replace(pair, '·', ''), n FROM b2
    UNION ALL SELECT 3, pair, replace(pair, '·', ''), n FROM b3
    """,
    tags=("text", "tokenizer", "bpe", "iterative"),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, three merge rounds unrolled — the
    iterative-algorithm-oracle recipe (`kmeans_train_cells` /
    `graph_pagerank`) applied to the real tokenizer-training loop that
    `bpe_pair_counts` only measures one step of. Per round: count
    adjacent symbol pairs over the top-100 word vocabulary (weighted by
    word frequency), pick the argmax pair (count desc, pair asc — a
    total order so both engines choose identically), and merge it
    everywhere. Symbol sequences are '·'-prefix-delimited strings, so
    the merge is a LITERAL leftmost-non-overlapping replace('·a·b' ->
    '·ab') with identical semantics in Spark and DuckDB (probe-verified,
    including the '·a·a·a' overlap case); the delimiter guarantees
    matches only at symbol boundaries. Scale: each round is one
    vocab-sized pair explode + partial-agg groupBy + a SINGLE-ROW
    broadcast of the chosen merge — the corpus is touched once (the
    word count); rounds cost vocabulary work, exactly how production
    BPE trainers separate corpus pass from merge loop."""
    d = load(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("w")).where(
        F.col("w") != ""
    )
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w"))
        .limit(100)
    )
    cur = vocab.select(
        "cnt", F.regexp_replace("w", "(.)", "·$1").alias("seq")
    )
    out = []
    for r in (1, 2, 3):
        syms = cur.select(
            "cnt",
            "seq",
            F.expr("slice(split(seq, '·'), 2, size(split(seq, '·')) - 1)").alias(
                "syms"
            ),
        )
        pairs = (
            syms.where(F.expr("size(syms) >= 2"))
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> concat(element_at(syms, i), '·', "
                        "element_at(syms, i + 1)))"
                    )
                ).alias("pair"),
            )
        )
        best = (
            pairs.groupBy("pair")
            .agg(F.sum("cnt").cast("bigint").alias("n"))
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
        )
        out.append(
            best.select(
                F.lit(r).alias("round"),
                "pair",
                F.expr("replace(pair, '·', '')").alias("merged"),
                "n",
            )
        )
        cur = cur.join(F.broadcast(best)).select(
            "cnt",
            F.expr(
                "replace(seq, concat('·', pair), "
                "concat('·', replace(pair, '·', '')))"
            ).alias("seq"),
        )
    return out[0].unionByName(out[1]).unionByName(out[2])


@query(
    "split_leakage_safe",
    oracle=f"""
    WITH RECURSIVE {_DUCK_SHINGLES},
    post AS (SELECT doc_id, unnest(shs) AS s FROM sh),
    sizes AS (SELECT doc_id, len(shs) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
      FROM post a JOIN post b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    prs AS (
      SELECT id1, id2 FROM inter
      JOIN sizes sa ON id1 = sa.doc_id
      JOIN sizes sb ON id2 = sb.doc_id
      WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.85
    ),
    edges AS MATERIALIZED (SELECT id1 AS a, id2 AS b FROM prs
              UNION ALL SELECT id2, id1 FROM prs),
    nodes AS MATERIALIZED (SELECT DISTINCT a AS id FROM edges),
    {duck_cc_min_label('nodes')},
    asg AS (
      SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    )
    SELECT doc_id, component,
           CASE WHEN bkt < 80 THEN 'train' WHEN bkt < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, component,
                 CAST(('0x' || substring(md5(CAST(component AS VARCHAR)),
                       1, 8))::UBIGINT % 100 AS INTEGER) AS bkt
          FROM asg)
    ORDER BY doc_id
    """,
    tags=("pipeline", "sampling", "dedup"),
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: every document is assigned to a
    split by hashing its NEAR-DUP CLUSTER representative, never its own
    id — so two near-duplicate documents (shingle Jaccard >= 0.85, the
    `dedup_components` graph) can never land in different splits and leak
    eval data into training. Singleton documents are their own cluster.
    (`split_train_val_test` is the doc-level sibling for corpora where
    near-dup structure is already resolved or irrelevant.)

    The 80/10/10 assignment hashes the cluster id (md5 first-8-hex as
    uint32 mod 100 — the repo's cross-engine deterministic-membership
    trick, no rand()): membership is stable under reruns, corpus growth
    only adds clusters, and re-splitting never migrates an existing
    cluster. Cost on top of the CC pass the pipeline already runs for
    dedup: one node-sized left join + a hash projection — no new shuffle
    family at 100 TB. The pair source is the prefix-filter scale path
    (``shingle_jaccard_pairs_prefix`` — output-identical to the naive
    inverted-index join, candidate volume Σpf(s)² not Σdf(s)²; VERDICT r6
    item 4), so the operator's 100 TB claim holds end-to-end. The oracle
    replays the exact pair graph + bounded min-label CC, then the
    identical bucket rule."""
    d = load(spark, sf_dir, "documents")
    pairs = shingle_jaccard_pairs_prefix(d, "text", "doc_id", threshold=0.85)
    comp = connected_components(pairs)
    asg = (
        d.select("doc_id")
        .join(
            comp.select(
                F.col("id").alias("doc_id"), F.col("comp").alias("component")
            ),
            "doc_id",
            "left",
        )
        .withColumn("component", F.coalesce("component", F.col("doc_id")))
    )
    bkt = (
        F.conv(
            F.substring(F.md5(F.col("component").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        % 100
    ).cast("int")
    return asg.select(
        "doc_id",
        "component",
        F.when(bkt < 80, "train")
        .when(bkt < 90, "val")
        .otherwise("test")
        .alias("split"),
    ).orderBy("doc_id")


# --- URL / metadata dedup (VERDICT r6 ask 8) -------------------------------
#
# The harness documents table carries no URL column, so the entries derive a
# deterministic NOISY url per document (4 scheme/www/port/tracking-param/
# fragment variants over a colliding (source, doc_id % 13) page key — ~2 docs
# per canonical page at sf0.01) identically in Spark and the oracle, then
# prove the normalizer collapses the noise. The normalization chain itself is
# one definition used by both sides (functions/urls.py).

_DUCK_NOISY_URL = """CASE CAST(doc_id % 4 AS INTEGER)
      WHEN 0 THEN 'https://' || source || '.example.com/p/' || (doc_id % 13)
      WHEN 1 THEN 'HTTPS://WWW.' || source || '.example.com/p/'
                  || (doc_id % 13) || '/'
      WHEN 2 THEN 'https://' || source || '.example.com:443/p/'
                  || (doc_id % 13) || '?utm_source=feed&utm_campaign=x'
      ELSE 'http://' || source || '.example.com/p/' || (doc_id % 13)
           || '/?gclid=abc123#frag'
    END"""


def _noisy_url() -> F.Column:
    """The Spark twin of ``_DUCK_NOISY_URL`` (same 4 variants, same key)."""
    dom = F.concat(F.col("source"), F.lit(".example.com"))
    pid = (F.col("doc_id") % 13).cast("string")
    path = F.concat(dom, F.lit("/p/"), pid)
    v = (F.col("doc_id") % 4).cast("int")
    return (
        F.when(v == 0, F.concat(F.lit("https://"), path))
        .when(v == 1, F.concat(F.lit("HTTPS://WWW."), path, F.lit("/")))
        .when(
            v == 2,
            F.concat(
                F.lit("https://"), dom, F.lit(":443/p/"), pid,
                F.lit("?utm_source=feed&utm_campaign=x"),
            ),
        )
        .otherwise(F.concat(F.lit("http://"), path, F.lit("/?gclid=abc123#frag")))
    )


@query(
    "dedup_url_normalized",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, n_chars, {_DUCK_NOISY_URL} AS url FROM documents
    ),
    c AS (
      SELECT doc_id, n_chars, url,
             {duckdb_normalize_url('url')} AS canonical_url
      FROM u
    ),
    r AS (
      SELECT canonical_url, doc_id, n_chars, url,
             row_number() OVER (PARTITION BY canonical_url
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM c
    )
    SELECT canonical_url,
           regexp_extract(canonical_url, '^[^/?]+') AS domain,
           CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS best_doc,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT url) AS BIGINT) AS n_exact_urls
    FROM r GROUP BY canonical_url ORDER BY canonical_url
    """,
    tags=("pipeline", "dedup", "url"),
)
def dedup_url_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact + normalized URL dedup with keep-best — the FIRST stage of a
    crawl curation pipeline, before any content-based dedup ever runs:
    collapse scheme/www/default-port/tracking-param/fragment variants onto
    one canonical page key and keep the best capture (longest text, ties to
    the oldest doc_id). ``n_exact_urls`` vs ``n_docs`` separates exact-URL
    refetches from normalization-only merges, the ratio crawl QA watches.

    Scale: canonicalization is map-only JVM regex (RE2-compatible chain,
    whole-stage codegen, functions/urls.py); the dedup itself is ONE
    map-side-combinable groupBy on the canonical key — max_by and count
    partials collapse per task before the exchange, so a page refetched a
    million times moves one partial per task, never a million rows. The
    distinct-URL count rides the same exchange (Expand on the group key).
    No window, no join, nothing corpus-squared — this is exact hash dedup
    (`dedup_exact`) specialized to the URL key plus keep-best."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", _noisy_url().alias("url")
    )
    c = d.select(
        "doc_id", "n_chars", "url", normalize_url("url").alias("canonical_url")
    )
    return (
        c.groupBy("canonical_url")
        .agg(
            F.expr("max_by(doc_id, struct(n_chars, -doc_id))")
            .cast("bigint")
            .alias("best_doc"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("url").cast("bigint").alias("n_exact_urls"),
        )
        .select(
            "canonical_url",
            url_domain("canonical_url").alias("domain"),
            "best_doc",
            "n_docs",
            "n_exact_urls",
        )
        .orderBy("canonical_url")
    )


@query(
    "dedup_domain_cap",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, n_chars, {_DUCK_NOISY_URL} AS url FROM documents
    ),
    c AS (
      SELECT doc_id, n_chars,
             regexp_extract({duckdb_normalize_url('url')}, '^[^/?]+') AS domain
      FROM u
    ),
    r AS (
      SELECT domain, doc_id, n_chars,
             row_number() OVER (PARTITION BY domain
                                ORDER BY n_chars DESC, doc_id) AS rnk
      FROM c
    )
    SELECT domain, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(rnk AS INTEGER) AS rnk
    FROM r WHERE rnk <= 3 ORDER BY domain, rnk
    """,
    tags=("pipeline", "dedup", "url"),
)
def dedup_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain keep-best cap (k=3 by content length, ties to oldest):
    the domain rate-limit every crawl corpus applies after URL dedup so a
    single boilerplate-heavy host can't dominate the training mix.

    Scale: row_number over the domain partition is the same
    WindowGroupLimit shape as `sample_per_key_hash` (driver-green r2–r5) —
    each task pre-prunes to its local top-k per domain BEFORE the
    exchange, so a million-page domain contributes k rows per task to the
    shuffle, not a million; the final per-domain sort sees only the
    surviving k x tasks rows. Skew therefore bounds at k x tasks even for
    the hottest domain."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", _noisy_url().alias("url")
    )
    c = d.select(
        "doc_id",
        "n_chars",
        url_domain(normalize_url("url")).alias("domain"),
    )
    w = Window.partitionBy("domain").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("domain", "doc_id", F.col("n_chars").cast("bigint").alias("n_chars"), "rnk")
        .orderBy("domain", "rnk")
    )


@query(
    "dedup_repeated_paragraphs",
    oracle="""
    WITH segs AS (
      SELECT doc_id, source,
             unnest(ch) AS seg,
             unnest(range(1, len(ch) + 1)) AS ord
      FROM (
        SELECT doc_id, source,
               list_transform(range(0, CAST(ceil(len(l) / 8.0) AS BIGINT)),
                              j -> array_to_string(l[j*8+1 : j*8+8], ' ')) AS ch
        FROM (SELECT doc_id, source, string_split(text, ' ') AS l
              FROM documents)
      )
    ),
    flagged AS (
      SELECT doc_id, ord, seg,
             row_number() OVER (PARTITION BY source, md5(seg)
                                ORDER BY doc_id, ord) = 1 AS keep
      FROM segs
    )
    SELECT doc_id,
           CAST(count(*) AS INTEGER) AS n_segments,
           CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS INTEGER) AS n_dropped,
           md5(coalesce(
             string_agg(CASE WHEN keep THEN seg END, ' ' ORDER BY ord),
             '')) AS cleaned_md5
    FROM flagged GROUP BY doc_id
    """,
    tags=("pipeline", "dedup", "text"),
    bench=True,
)
def dedup_repeated_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style sub-document paragraph dedup WITH document
    reconstruction: within each source, every repeated paragraph keeps
    only its first occurrence (ordered by doc_id, then position) and all
    later occurrences are stripped; each document comes back as
    (n_segments, n_dropped, md5 of the cleaned text). This is the stage
    CCNet/RefinedWeb run before document-level dedup — boilerplate
    (headers, navbars, license blurbs) repeats across a domain's pages
    while the prose does not. Paragraph unit: non-overlapping 8-token
    chunks (`operators/dedup.paragraph_chunks`; the corpus carries no
    newline structure — same stand-in `dedup_sentence_exact` uses).

    Scale shape: ONE Arrow chunking pass (persisted — multiple
    consumers, per the repo invariant), then first-occurrence =
    min(struct(doc_id, ord)) per (source, md5(paragraph)) — a
    partial-aggregated groupBy, so a paragraph duplicated a million
    times collapses to one row per map task BEFORE the exchange (a
    window row_number would haul every occurrence of a viral paragraph
    onto one task). The flag pipeline runs on KEY-ONLY projections
    (source, hash, id, ord) and re-joins per document as a
    dropped-positions array, so the chunk TEXT crosses the wire exactly
    once — on the doc_id exchange the reconstruction groupBy reuses (the
    first formulation joined flags on (source, hash) and shuffled text
    twice; at sf100 / 5M docs that was the decade's dominant mover).
    Keep/drop is an exact string-equality decision — no float
    boundary."""
    from spark_hbase_connector_spark.operators.dedup import paragraph_chunks

    d = load(spark, sf_dir, "documents")
    # h is a pure GROUPING identity for first-occurrence detection — any
    # injective-w.h.p. hash partitions segments identically, so r10 swaps
    # the md5 key for xxhash64 (long vs 32-char string: ~4x narrower
    # shuffle key, no hex encode). The OUTPUT cleaned_md5 stays md5 —
    # that value is the oracle-pinned reconstruction digest.
    segs = paragraph_chunks(
        d, "text", "doc_id", passthrough=("source",), w=8
    ).withColumn("h", F.xxhash64("seg"))
    segs = segs.persist()
    keys = segs.select("source", "h", "id", "ord")
    firsts = keys.groupBy("source", "h").agg(
        F.min(F.struct("id", "ord")).alias("first")
    )
    dropped = (
        keys.join(firsts, ["source", "h"])
        .where(
            (F.col("id") != F.col("first.id")) | (F.col("ord") != F.col("first.ord"))
        )
        .groupBy("id")
        .agg(F.collect_set("ord").alias("dropped_ords"))
    )
    flagged = segs.join(dropped, "id", "left").withColumn(
        "keep",
        F.col("dropped_ords").isNull()
        | ~F.array_contains(F.col("dropped_ords"), F.col("ord")),
    )
    kept_seg = F.when(F.col("keep"), F.struct("ord", "seg"))
    return (
        flagged.groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_segments"),
            F.sum(F.when(F.col("keep"), 0).otherwise(1)).cast("int").alias("n_dropped"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept_seg)), lambda x: x["seg"]
                    ),
                    " ",
                ).cast("binary")
            ).alias("cleaned_md5"),
        )
    )


def _train_bpe_merges_local(
    vocab: list[tuple[str, int]], rounds: int = 3
) -> list[str]:
    """Driver-side BPE merge training over the BOUNDED top-V vocabulary —
    the exact formulation of `bpe_train_merges` (and its DuckDB CTE chain
    v0/p1/b1/.../b3) in plain Python: symbol sequences are '·'-prefix-
    delimited strings, each round counts adjacent symbol pairs weighted by
    word frequency, picks the argmax under the (count DESC, pair ASC)
    total order, and merges it everywhere as a literal leftmost-
    non-overlapping replace('·a·b' -> '·ab') — `str.replace` has the same
    leftmost-non-overlapping all-occurrence semantics as SQL `replace` on
    both engines (probe-verified for the '·a·a·a' case in
    `bpe_train_merges`). Pair tie-break: Python str comparison is
    codepoint order == UTF-8 byte order (UTF-8 preserves codepoint
    ordering) == DuckDB/Spark binary collation.

    Driver-side is the scale-honest choice, not a shortcut: the input is
    the top-V vocabulary (V rows by LIMIT, independent of corpus size) —
    production BPE trainers separate the distributed corpus word-count
    pass from the in-memory merge loop the same way. Unit-tested equal to
    the distributed `bpe_train_merges` entry (tests/test_corpus_ops.py).
    """
    seqs = {w: "".join("·" + ch for ch in w) for w, _ in vocab}
    merges: list[str] = []
    for _ in range(rounds):
        counts: dict[str, int] = {}
        for w, cnt in vocab:
            syms = seqs[w].split("·")[1:]
            for a, b in zip(syms, syms[1:]):
                p = a + "·" + b
                counts[p] = counts.get(p, 0) + cnt
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = "·" + best.replace("·", "")
        for w in seqs:
            seqs[w] = seqs[w].replace("·" + best, merged)
    return merges


@query(
    "bpe_encode_corpus",
    oracle=r"""
    WITH wc AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS cnt FROM (
        SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY source, w
    ),
    vocab AS (
      SELECT w, sum(cnt)::BIGINT AS cnt FROM wc
      GROUP BY w ORDER BY cnt DESC, w LIMIT 100
    ),
    v0 AS (SELECT cnt, regexp_replace(w, '(.)', '·\1', 'g') AS seq FROM vocab),
    p1 AS (
      SELECT pair, sum(cnt)::BIGINT AS n FROM (
        SELECT cnt, unnest(list_transform(range(2, len(string_split(seq, '·'))),
          i -> string_split(seq, '·')[i] || '·' || string_split(seq, '·')[i+1])) AS pair
        FROM v0) GROUP BY pair
    ),
    b1 AS (SELECT pair, n FROM p1 ORDER BY n DESC, pair LIMIT 1),
    v1 AS (SELECT cnt, replace(seq, '·' || b1.pair,
                 '·' || replace(b1.pair, '·', '')) AS seq FROM v0, b1),
    p2 AS (
      SELECT pair, sum(cnt)::BIGINT AS n FROM (
        SELECT cnt, unnest(list_transform(range(2, len(string_split(seq, '·'))),
          i -> string_split(seq, '·')[i] || '·' || string_split(seq, '·')[i+1])) AS pair
        FROM v1) GROUP BY pair
    ),
    b2 AS (SELECT pair, n FROM p2 ORDER BY n DESC, pair LIMIT 1),
    v2 AS (SELECT cnt, replace(seq, '·' || b2.pair,
                 '·' || replace(b2.pair, '·', '')) AS seq FROM v1, b2),
    p3 AS (
      SELECT pair, sum(cnt)::BIGINT AS n FROM (
        SELECT cnt, unnest(list_transform(range(2, len(string_split(seq, '·'))),
          i -> string_split(seq, '·')[i] || '·' || string_split(seq, '·')[i+1])) AS pair
        FROM v2) GROUP BY pair
    ),
    b3 AS (SELECT pair, n FROM p3 ORDER BY n DESC, pair LIMIT 1),
    enc AS (
      SELECT wc.source, wc.cnt,
             replace(replace(replace(regexp_replace(wc.w, '(.)', '·\1', 'g'),
               '·' || b1.pair, '·' || replace(b1.pair, '·', '')),
               '·' || b2.pair, '·' || replace(b2.pair, '·', '')),
               '·' || b3.pair, '·' || replace(b3.pair, '·', '')) AS seq
      FROM wc, b1, b2, b3
    )
    SELECT source,
           CAST(sum(cnt) AS BIGINT) AS n_words,
           CAST(sum(cnt * (len(string_split(seq, '·')) - 1)) AS BIGINT)
             AS n_tokens,
           round(CAST(sum(cnt * (len(string_split(seq, '·')) - 1)) AS DOUBLE)
                 / CAST(sum(cnt) AS DOUBLE), 4) AS fertility
    FROM enc GROUP BY source ORDER BY source
    """,
    tags=("text", "tokenizer", "bpe", "pipeline"),
)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION — the pass `bpe_train_merges` trains for:
    encode the whole corpus under the 3 trained merges and report
    per-source token counts and fertility (tokens/word), the number every
    tokenizer change is judged by before a training run.

    Scale shape: ONE corpus-sized explode + partial-aggregated groupBy
    builds per-(source, word) counts — the only corpus-sized shuffle.
    Everything downstream is vocabulary-sized: the global top-100 vocab is
    a word-sized re-aggregation of those counts (no second corpus scan),
    merge training runs on the driver over the BOUNDED top-100 rows
    (`_train_bpe_merges_local` — the corpus-pass/merge-loop split
    production BPE trainers use), and encoding applies the merges as three
    literal JVM `replace` expressions over DISTINCT (source, word) rows,
    weighted by count — encode cost tracks vocabulary, not corpus bytes.
    The `wc` subtree feeds two consumers (vocab collect + final agg), so
    it is persisted per the multi-consumer invariant.

    Words are '·'-prefix-delimited symbol strings as in training; corpus
    words contain no '·' (ASCII tokens by fixture contract). Merge-pair
    semantics and tie-breaks are bit-identical to `bpe_train_merges`
    (unit-tested equal); the oracle replays the identical CTE chain."""
    d = load(spark, sf_dir, "documents")
    wc = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    vocab_rows = (
        wc.groupBy("w")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w"))
        .limit(100)
        .collect()
    )
    merges = _train_bpe_merges_local(
        [(r["w"], int(r["cnt"])) for r in vocab_rows], rounds=3
    )
    seq = F.regexp_replace("w", "(.)", "·$1")
    for pair in merges:
        seq = F.replace(
            seq, F.lit("·" + pair), F.lit("·" + pair.replace("·", ""))
        )
    tpw = F.size(F.split(seq, "·")) - F.lit(1)
    return (
        wc.groupBy("source")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_words"),
            F.sum(F.col("cnt") * tpw).cast("bigint").alias("n_tokens"),
        )
        .select(
            "source",
            "n_words",
            "n_tokens",
            F.round(
                F.col("n_tokens").cast("double") / F.col("n_words").cast("double"),
                4,
            ).alias("fertility"),
        )
        .orderBy("source")
    )
