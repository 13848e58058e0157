"""Statistical curation operators for the LLM-pipeline surface: importance
resampling (DSIR), an in-corpus quality classifier (the fasttext-classifier
analogue), CCNet-style perplexity bucketing, and triangle statistics over
the co-occurrence graph.

The reference connector has no analogue — these extend the north-star
"training-data pipeline" family (BASELINE.json) with the model-based
curation steps a 100 TB run applies after dedup:

- ``sample_importance_dsir`` — Data Selection via Importance Resampling
  (Xie et al., NeurIPS 2023): hashed n-gram bucket counts make the
  feature space BOUNDED (256 buckets regardless of corpus size), so the
  weight table broadcasts and scoring is one map-side join + one
  aggregation, independent of vocabulary growth.
- ``text_quality_classifier_nb`` — multinomial Naive Bayes trained
  in-corpus on a labeled slice (GPT-3/LLaMA-style "curated vs crawl"
  classifier): the weight relation is the classic wordcount shape;
  scoring is a token join + per-doc sum.
- ``corpus_ccnet_buckets`` — CCNet (Wenzek et al., 2020) head/middle/tail
  perplexity terciles per language, from a corpus-fit unigram LM.
- ``graph_triangle_count`` — degree-oriented triangle counting over the
  basket co-occurrence graph (the O(m^(3/2)) distributed orientation
  trick; id-ordered enumeration would hot-spot on hub nodes).

Every float that reaches the output is rounded to 4dp on both sides;
selection/ranking decisions order by the ROUNDED value with a doc_id
tie-break so top-k membership and tercile assignment are engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_hbase_connector_spark.catalogs import load
from spark_hbase_connector_spark.queries.registry import query

def _all() -> Window:
    """Whole-relation window — only ever applied to BOUNDED relations (the
    256-bucket DSIR weight table); anything vocabulary- or corpus-sized
    computes its totals as a single-row aggregate broadcast back in
    instead, because an unpartitioned window funnels the whole relation
    through one reducer."""
    return Window.partitionBy()

# portable cross-engine token bucket: md5's first 8 hex digits as uint32
# (same trick as text_hash_features / sample_bernoulli_hash)
_B = 256


def _bucket(col: str) -> F.Column:
    return ((F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint") % _B)).cast(
        "int"
    )


# ------------------------------------------------- DSIR resampling ----


@query(
    "sample_importance_dsir",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, lang,
             CAST(('0x' || substring(md5(tok), 1, 8))::UBIGINT % {_B} AS INTEGER) AS b
      FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      WHERE tok <> ''
    ),
    db AS (SELECT doc_id, b, count(*) AS c FROM tk GROUP BY doc_id, b),
    qb AS (SELECT b, count(*) AS q,
                  count(*) FILTER (WHERE lang = 'en') AS t
           FROM tk GROUP BY b),
    w AS (SELECT b,
                 ln((t + 1.0) / (sum(t) OVER () + {_B}.0))
               - ln((q + 1.0) / (sum(q) OVER () + {_B}.0)) AS wb
          FROM qb)
    SELECT doc_id, round(sum(c * wb), 4) AS dsir_logw
    FROM db JOIN w USING (b)
    GROUP BY doc_id
    ORDER BY dsir_logw DESC, doc_id LIMIT 50
    """,
    tags=("sampling", "pipeline", "ml"),
)
def sample_importance_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie et al., NeurIPS 2023): score every
    document by how much more likely its hashed-unigram profile is under
    the TARGET domain (here: lang='en') than under the raw corpus, then
    keep the top 50 by log importance weight.

    log w(x) = sum_b c_b(x) * (ln p_target(b) - ln q_raw(b)) with add-1
    smoothing over the 256 md5-derived buckets. The hashing trick is what
    makes this 100 TB-shaped: the bucket-weight relation is 256 rows at
    ANY corpus size (broadcast join), the per-doc profile is one
    partial-aggregated groupBy, and no vocabulary is ever materialized.
    Top-k membership is engine-exact because ranking orders by the
    4dp-ROUNDED weight with a doc_id tie-break."""
    d = load(spark, sf_dir, "documents")
    tk = (
        d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .select("doc_id", "lang", _bucket("tok").alias("b"))
    )
    db = tk.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    qb = tk.groupBy("b").agg(
        F.count(F.lit(1)).alias("q"),
        F.count_if(F.col("lang") == "en").alias("t"),
    )
    w = qb.select(
        "b",
        (
            F.log((F.col("t") + 1.0) / (F.sum("t").over(_all()) + float(_B)))
            - F.log((F.col("q") + 1.0) / (F.sum("q").over(_all()) + float(_B)))
        ).alias("wb"),
    )
    return (
        db.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("c") * F.col("wb")), 4).alias("dsir_logw"))
        .orderBy(F.desc("dsir_logw"), "doc_id")
        .limit(50)
    )


# ------------------------------------------- Naive Bayes classifier ----


@query(
    "text_quality_classifier_nb",
    oracle="""
    WITH tk AS (
      SELECT doc_id, (source IN ('src0', 'src1', 'src2')) AS is_pos, tok
      FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      WHERE tok <> ''
    ),
    vocab AS (
      SELECT tok,
             count(*) FILTER (WHERE is_pos) AS cp,
             count(*) - count(*) FILTER (WHERE is_pos) AS cn
      FROM tk GROUP BY tok
    ),
    w AS (
      SELECT tok,
             ln((cp + 1.0) / (sum(cp) OVER () + count(*) OVER ()))
           - ln((cn + 1.0) / (sum(cn) OVER () + count(*) OVER ())) AS wt
      FROM vocab
    ),
    prior AS (
      SELECT ln(count(*) FILTER (WHERE source IN ('src0', 'src1', 'src2')) * 1.0
              / count(*) FILTER (WHERE source NOT IN ('src0', 'src1', 'src2'))) AS p
      FROM documents
    ),
    s AS (SELECT doc_id, sum(wt) AS llr FROM tk JOIN w USING (tok)
          GROUP BY doc_id)
    SELECT doc_id, round(llr + p, 4) AS log_odds,
           (round(llr + p, 4) > 0) AS pred_curated
    FROM s CROSS JOIN prior
    ORDER BY doc_id
    """,
    tags=("text", "quality", "ml"),
)
def text_quality_classifier_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-corpus quality classifier, GPT-3/LLaMA-style: train a multinomial
    Naive Bayes on a labeled slice (sources src0-src2 = "curated", rest =
    "crawl") and score EVERY document with its log-odds of being curated,
    plus the boolean prediction — the filtering signal a curation pipeline
    thresholds on.

    Train = one wordcount over the token stream (count per (token, class)
    with add-1 smoothing; class totals and vocabulary size are ONE
    single-row aggregate over the persisted wordcount, broadcast back in
    — an unpartitioned window here would funnel the whole vocabulary
    through one reducer). Score = token-stream join against
    the weight table (broadcast while the vocab fits, AQE shuffle join
    beyond) + one per-doc sum; the single-row class-prior relation is
    broadcast into the result (allow-listed single-row BNLJ). Token join
    keys are xxhash64 so vocabulary strings never shuffle.

    pred_curated is decided on the 4dp-ROUNDED log_odds — the exact value
    both engines compare/hash — so the boolean is a pure function of a
    compared column and can never diverge on float summation order
    (CLAUDE.md decision-boundary rule; tightened from the unrounded sign
    per ADVICE r6).

    Token keys are xxhash64, so vocabulary strings never shuffle while
    the oracle keys on raw tokens. Collision bound (the dedup.py
    rationale applied to a vocabulary): one 64-bit collision merges two
    vocab rows, expected colliding PAIRS ~ V^2/2^65 — at a
    100M-type vocabulary that is ~5e-4 expected collisions, and the
    harness vocabularies (<100k types) are ~1e-10; any actual collision
    would mismatch the raw-keyed oracle and FAIL loudly, never
    false-pass."""
    d = load(spark, sf_dir, "documents")
    is_pos = F.col("source").isin("src0", "src1", "src2")
    tk = (
        d.select("doc_id", is_pos.alias("is_pos"), F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .select("doc_id", "is_pos", F.xxhash64("tok").alias("tok"))
    )
    vocab = tk.groupBy("tok").agg(
        F.count_if("is_pos").alias("cp"),
        (F.count(F.lit(1)) - F.count_if("is_pos")).alias("cn"),
    ).persist()  # two consumers: the totals aggregate and the weight join
    tot = vocab.agg(
        F.sum("cp").alias("tcp"),
        F.sum("cn").alias("tcn"),
        F.count(F.lit(1)).alias("vsz"),
    )
    w = vocab.crossJoin(F.broadcast(tot)).select(
        "tok",
        (
            F.log((F.col("cp") + 1.0) / (F.col("tcp") + F.col("vsz")))
            - F.log((F.col("cn") + 1.0) / (F.col("tcn") + F.col("vsz")))
        ).alias("wt"),
    )
    prior = d.agg(
        F.log(
            F.count_if(is_pos).cast("double") / F.count_if(~is_pos)
        ).alias("p")
    )
    s = tk.join(w, "tok").groupBy("doc_id").agg(F.sum("wt").alias("llr"))
    return (
        s.crossJoin(F.broadcast(prior))
        .select(
            "doc_id",
            F.round(F.col("llr") + F.col("p"), 4).alias("log_odds"),
            # decide on the ROUNDED value: the boolean must be a pure
            # function of the compared/hashed log_odds column
            (F.round(F.col("llr") + F.col("p"), 4) > 0).alias("pred_curated"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------- CCNet buckets ----


@query(
    "corpus_ccnet_buckets",
    oracle="""
    WITH tk AS (
      SELECT doc_id, lang, tok
      FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      WHERE tok <> ''
    ),
    cnt AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
    tot AS (SELECT sum(c) AS n FROM cnt),
    pd AS (
      SELECT doc_id, lang,
             round(exp(avg(ln(n * 1.0 / c))), 4) AS ppl
      FROM tk JOIN cnt USING (tok) CROSS JOIN tot
      GROUP BY doc_id, lang
    ),
    t AS (
      SELECT doc_id, lang, ppl,
             CAST(ntile(3) OVER (PARTITION BY lang ORDER BY ppl, doc_id)
                  AS BIGINT) AS tercile
      FROM pd
    )
    SELECT doc_id, lang, ppl, tercile,
           CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM t ORDER BY doc_id
    """,
    tags=("text", "quality", "pipeline"),
)
def corpus_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., LREC 2020): score
    each document with a corpus-fit unigram LM perplexity, then split each
    language into head/middle/tail terciles — the standard crawl-quality
    stratification (train on head+middle, drop or downweight tail).

    ppl(d) = exp(mean ln(N / c(tok))) over the document's token
    occurrences: the geometric-mean inverse unigram probability. LM fit is
    one wordcount; scoring is a token join (xxhash64 keys) + per-doc avg.
    Terciles rank on the 4dp-ROUNDED ppl with doc_id tie-break, so the
    assignment is engine-exact. ntile partitions one reducer per language
    — exact and fine to the ~100-language scale of real corpora because
    only (doc_id, ppl) pairs sort, not documents; past that, swap the
    exact tercile for approx_percentile thresholds on a sample (the
    sketch path `approx_quantiles_qa` certifies).

    Token keys are xxhash64 vs the oracle's raw tokens — same collision
    rationale as `text_quality_classifier_nb`: expected colliding pairs
    ~ V^2/2^65 (~1e-10 at harness scale, ~5e-4 at a 100M-type
    vocabulary), and a collision mismatches the raw-keyed oracle and
    fails loudly rather than false-passing."""
    d = load(spark, sf_dir, "documents")
    tk = (
        d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .select("doc_id", "lang", F.xxhash64("tok").alias("tok"))
    )
    cnt = tk.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    # corpus token total = |tk|: a single-row aggregate broadcast in, NOT
    # a whole-relation window over the vocabulary-sized count relation
    tot = tk.agg(F.count(F.lit(1)).alias("n"))
    pd = (
        tk.join(cnt, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "lang")
        .agg(
            F.round(
                F.exp(F.avg(F.log(F.col("n").cast("double") / F.col("c")))), 4
            ).alias("ppl")
        )
    )
    tercile = (
        F.ntile(3)
        .over(Window.partitionBy("lang").orderBy("ppl", "doc_id"))
        .cast("bigint")
    )
    return (
        pd.select("doc_id", "lang", "ppl", tercile.alias("tercile"))
        .withColumn(
            "bucket",
            F.when(F.col("tercile") == 1, "head")
            .when(F.col("tercile") == 2, "middle")
            .otherwise("tail"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------- triangle statistics ----


@query(
    "graph_triangle_count",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    e AS MATERIALIZED (
      SELECT u, v FROM p GROUP BY u, v HAVING count(*) >= 2
    ),
    deg AS (
      SELECT n, count(*) AS d
      FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
      GROUP BY n
    ),
    nd AS (SELECT count(*) AS n_nodes,
                  CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS n_wedges
           FROM deg),
    m AS (SELECT count(*) AS n_edges FROM e),
    tri AS (
      SELECT count(*) AS n_triangles
      FROM e e1 JOIN e e2 ON e2.u = e1.v
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
           round(3.0 * n_triangles / n_wedges, 4) AS global_cc
    FROM nd, m, tri
    """,
    tags=("graph",),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the basket co-occurrence graph (parts co-ordered
    in >= 2 orders, the `basket_pair_affinity` support-2 edge set): node /
    edge / wedge / triangle counts and the global clustering coefficient
    3T / wedges — the structure metrics behind community detection and
    recommendation QA.

    Enumeration is DEGREE-ORIENTED (each undirected edge directed from
    its lower-(degree, id) endpoint): every triangle is counted exactly
    once, and — the 100 TB point — out-degrees are bounded by ~sqrt(m),
    so the wedge join is O(m^(3/2)) total with NO hub hot-spot. The naive
    id-ordered orientation the oracle uses (fine for a sequential engine)
    would give low-id hub nodes quadratic wedge fan-out in a distributed
    shuffle. All counts are exact integers; the only float is the rounded
    coefficient. Per-order pair fan-out is bounded by the order-size cap
    (TPC-H: <= 7 items/order)."""
    li = load(spark, sf_dir, "lineitem")
    # pair generation WITHOUT a self-join: one groupBy(order) collects the
    # (deduped, sorted) part set, then a JVM array expression expands the
    # within-order pairs — fan-out bounded by the order-size cap (TPC-H:
    # <= 7 items/order), so this is 2 shuffles total vs the self-join's 3.
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ps",
                    lambda x, i: F.transform(
                        F.slice(F.col("ps"), i + 2, F.size("ps")),
                        lambda y: F.struct(x.alias("u"), y.alias("v")),
                    ),
                )
            )
        ).alias("e")
    ).select("e.u", "e.v")
    edges = (
        pairs.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("s"))
        .where(F.col("s") >= 2)
        .select("u", "v")
        .persist()
    )
    edges.count()  # materialize: every census branch below reads this cache
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    deg.count()
    # degree-orient: src = lower (degree, id) endpoint
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    ed = edges.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
    ).persist()
    o1 = o.select(F.col("s").alias("x"), F.col("t").alias("y"))
    o2 = o.select(F.col("s").alias("y"), F.col("t").alias("z"))
    # a path x->y->z implies x precedes z in the (degree, id) total order,
    # so the closing edge {x,z} can only be oriented x->z
    o3 = o.select(F.col("s").alias("x"), F.col("t").alias("z"))
    triangles = o1.join(o2, "y").join(o3, ["x", "z"])
    # single-row census: tagged union + one aggregate (one job, no
    # broadcast subtrees racing the caches, no nested-loop join)
    zero = F.lit(0).cast("bigint")
    tagged = (
        deg.select(
            F.lit(1).cast("bigint").alias("w_node"),
            F.expr("d * (d - 1) div 2").alias("w_wedge"),
            zero.alias("w_edge"),
            zero.alias("w_tri"),
        )
        .unionAll(edges.select(zero, zero, F.lit(1).cast("bigint"), zero))
        .unionAll(triangles.select(zero, zero, zero, F.lit(1).cast("bigint")))
    )
    return tagged.groupBy().agg(
        F.sum("w_node").alias("n_nodes"),
        F.sum("w_edge").alias("n_edges"),
        F.sum("w_wedge").alias("n_wedges"),
        F.sum("w_tri").alias("n_triangles"),
    ).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 4).alias(
            "global_cc"
        ),
    )
