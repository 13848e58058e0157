"""Corpus-quality / curation queries for the LLM-pipeline surface.

The reference connector has no analogue — these are the north-star
"training-data pipeline" operators (BASELINE.json): repetition-based
quality signals (Gopher-style), PII redaction, per-domain caps,
benchmark-contamination detection, and domain mixture reweighting.

Everything is a single JVM-expression pass or one shuffle; the only
Python stage is the shared Arrow shingler (`shingle_postings`), reused
for contamination postings exactly as the dedup family uses it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_hbase_connector_spark.catalogs import load
from spark_hbase_connector_spark.functions.text import tokens
from spark_hbase_connector_spark.operators.dedup import shingle_postings
from spark_hbase_connector_spark.queries.registry import query

# ------------------------------------------------------- repetition ----


@query(
    "text_repetition_signals",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
    SELECT doc_id,
           round(list_max(list_transform(list_distinct(l),
                     t -> len(list_filter(l, x -> x = t)))) * 1.0 / len(l),
                 4) AS top_unigram_frac,
           round(CASE WHEN len(l) >= 2
                 THEN 1.0 - len(list_distinct(list_transform(range(1, len(l)),
                          i -> l[i] || ' ' || l[i+1]))) * 1.0 / (len(l) - 1)
                 ELSE 0.0 END, 4) AS dup_bigram_frac,
           (list_max(list_transform(list_distinct(l),
                     t -> len(list_filter(l, x -> x = t)))) * 1.0 / len(l) > 0.12
            OR CASE WHEN len(l) >= 2
               THEN 1.0 - len(list_distinct(list_transform(range(1, len(l)),
                        i -> l[i] || ' ' || l[i+1]))) * 1.0 / (len(l) - 1)
               ELSE 0.0 END > 0.5) AS repetitive
    FROM t
    """,
    tags=("text", "quality"),
    bench=True,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: most-frequent-unigram fraction and
    duplicate-bigram fraction, plus the boolean gate a curation pipeline
    would filter on.

    One vectorized Arrow ``mapInPandas`` pass — a ``collections.Counter``
    per document — the same strategy as the dedup shingler
    (``operators/dedup.py:57``) and for the same reason: the "pure
    expression" formulation (array_max over transform(array_distinct ...))
    runs as *interpreted* nested higher-order lambdas that re-split the
    text per distinct token, O(tokens²) per document (measured 54 s at
    sf0.01 vs <2 s for this pass). Map-only, no shuffle, linear in corpus
    bytes — the shape that survives 100 TB."""
    import pandas as pd

    d = load(spark, sf_dir, "documents")

    def _round4(x: float) -> float:
        # HALF_UP like Spark F.round / DuckDB round (Python round() is
        # banker's: round(1/32, 4) -> 0.0312, the others -> 0.0313)
        import math

        return math.floor(x * 10000.0 + 0.5) / 10000.0

    def gen(batches):
        from collections import Counter

        for pdf in batches:
            ids, top_fracs, dup_fracs, gates = [], [], [], []
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                ids.append(i)
                if t is None:  # oracle keeps the row, signals NULL
                    top_fracs.append(None)
                    dup_fracs.append(None)
                    gates.append(None)
                    continue
                # split(' ') — keeps empty tokens on runs of spaces, exactly
                # like Spark split(text,' ') / DuckDB string_split
                toks = t.split(" ")
                n = len(toks)
                top_frac = max(Counter(toks).values()) / n
                if n >= 2:
                    n_bi = len({(toks[p], toks[p + 1]) for p in range(n - 1)})
                    dup_bi = 1.0 - n_bi / (n - 1)
                else:
                    dup_bi = 0.0
                # gate uses the UNROUNDED fractions, same as the oracle
                gates.append(top_frac > 0.12 or dup_bi > 0.5)
                top_fracs.append(_round4(top_frac))
                dup_fracs.append(_round4(dup_bi))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "top_unigram_frac": pd.array(top_fracs, dtype="Float64"),
                    "dup_bigram_frac": pd.array(dup_fracs, dtype="Float64"),
                    "repetitive": pd.array(gates, dtype="boolean"),
                }
            )

    return d.select("doc_id", "text").mapInPandas(
        gen,
        schema="doc_id long, top_unigram_frac double, dup_bigram_frac double, repetitive boolean",
    )


# -------------------------------------------------------- PII scrub ----

# character classes only — Java regex (Spark) and RE2 (DuckDB) agree
_EMAIL_RE = "[A-Za-z0-9#.]+@[A-Za-z.]+"
_NUM_RE = "[0-9]+"


@query(
    "pii_scrub_customers",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey, c_name,
             lower(c_name) || '.' || c_custkey || '@mail.example' AS contact
      FROM customer
    )
    SELECT c_custkey,
           regexp_replace(c_name, '{_NUM_RE}', '<NUM>', 'g') AS redacted_name,
           regexp_replace(contact, '{_EMAIL_RE}', '<EMAIL>', 'g') AS redacted_contact,
           CAST(length(c_name) -
                length(regexp_replace(c_name, '[0-9]', '', 'g')) AS INTEGER)
             AS n_masked_chars
    FROM c
    """,
    tags=("text", "quality", "pii"),
)
def pii_scrub_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction as a pure JVM regexp pass: mask digit runs in names
    and synthesized contact emails, count masked characters. No shuffle;
    at 100 TB this is a map-only transform that fuses into whatever scan
    precedes it (Spark's regexp_replace replaces all matches, so the
    oracle uses the 'g' flag)."""
    c = load(spark, sf_dir, "customer")
    contact = F.concat(
        F.lower(F.col("c_name")), F.lit("."), F.col("c_custkey"), F.lit("@mail.example")
    )
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", _NUM_RE, "<NUM>").alias("redacted_name"),
        F.regexp_replace(contact, F.lit(_EMAIL_RE), F.lit("<EMAIL>")).alias(
            "redacted_contact"
        ),
        (
            F.length("c_name") - F.length(F.regexp_replace("c_name", "[0-9]", ""))
        )
        .cast("int")
        .alias("n_masked_chars"),
    )


# --------------------------------------------------- per-domain caps ----


@query(
    "docs_cap_per_source",
    oracle="""
    WITH r AS (
      SELECT source, doc_id,
             CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
                  AS INTEGER) AS rn,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_source_total
      FROM documents
    )
    SELECT source, doc_id, rn, n_source_total FROM r WHERE rn <= 10
    """,
    tags=("quality", "window", "pipeline"),
)
def docs_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (keep the first 10 docs per source by stable id
    order) — the dedup-adjacent curation step that stops one crawl domain
    from dominating the mixture. Both window functions share one
    partitioning, so this is a single shuffle on `source`; at scale a
    skewed source is handled by AQE skew-split since rank and count both
    stream within the partition."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        d.select(
            "source",
            "doc_id",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1))
            .over(Window.partitionBy("source"))
            .alias("n_source_total"),
        )
        .where(F.col("rn") <= 10)
    )


# ----------------------------------------------- contamination check ----


@query(
    "contamination_ngram",
    oracle="""
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS l FROM documents),
    sh AS (
      SELECT doc_id, source,
             list_distinct(list_transform(range(1, len(l) - 3),
               i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' ||
                    l[i+3] || ' ' || l[i+4])) AS shs
      FROM t WHERE len(l) >= 5
    ),
    post AS (SELECT doc_id, source, unnest(shs) AS s FROM sh),
    ev AS (SELECT doc_id AS eval_id, s FROM post WHERE source = 'src0'),
    tr AS (SELECT doc_id AS train_id, s FROM post WHERE source != 'src0')
    SELECT train_id, eval_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM tr JOIN ev USING (s)
    GROUP BY train_id, eval_id
    HAVING count(*) >= 3
    """,
    tags=("quality", "dedup", "pipeline"),
)
def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: training docs sharing >= 3
    distinct word 5-grams with any eval-set doc (here: source `src0`
    stands in for the benchmark). The eval side's postings are tiny by
    construction, so they BROADCAST — the 100 TB train corpus is scanned
    once, shingled once (one Arrow pass), and never shuffled; each side's
    shingler feeds exactly one consumer, so no persist is needed. r10:
    both sides use the HASHED shingle pass (the join/count only ever
    touch shingle identity) — 8-byte int64 keys from the vectorized
    Arrow pass instead of 5-word strings crossing the Python->JVM
    boundary and sitting in the broadcast hash relation."""
    from spark_hbase_connector_spark.operators.dedup import (
        shingle_posting_hashes,
    )

    d = load(spark, sf_dir, "documents")
    ev = shingle_posting_hashes(
        d.where(F.col("source") == "src0"), "text", "doc_id", w=5
    ).withColumnRenamed("id", "eval_id")
    tr = shingle_posting_hashes(
        d.where(F.col("source") != "src0"), "text", "doc_id", w=5
    ).withColumnRenamed("id", "train_id")
    return (
        tr.join(F.broadcast(ev), "s")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= 3)
    )


# ------------------------------------------------- mixture weighting ----


@query(
    "domain_mixture_weights",
    oracle="""
    WITH per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, total_tokens,
           round(total_tokens * 1.0 / sum(total_tokens) OVER (), 4) AS token_share,
           round((1.0 / count(*) OVER ()) /
                 (total_tokens * 1.0 / sum(total_tokens) OVER ()), 4) AS sample_weight
    FROM per
    """,
    tags=("quality", "agg", "pipeline"),
)
def domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixture reweighting: per-source token share and the sampling
    weight that flattens the mixture to uniform. The corpus collapses to
    one row per source in a partial-aggregated groupBy; the grand total is
    then a single-partition window over that tiny per-source relation
    (one row per domain — thousands at most, never corpus-sized), so
    nothing heavier than the per-source agg ever shuffles."""
    d = load(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text")).cast("long")).alias("total_tokens"),
    )
    w_all = Window.partitionBy()
    j = per.withColumn("_grand", F.sum("total_tokens").over(w_all)).withColumn(
        "_n_sources", F.count(F.lit(1)).over(w_all)
    )
    share = F.col("total_tokens") / F.col("_grand")
    return j.select(
        "source",
        "n_docs",
        "total_tokens",
        F.round(share, 4).alias("token_share"),
        F.round((1.0 / F.col("_n_sources")) / share, 4).alias("sample_weight"),
    )


# ---------------------------------------------------- char entropy ----


@query(
    "text_char_entropy",
    oracle="""
    WITH ch AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c
      FROM documents WHERE length(text) > 0
    ),
    cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
    tot AS (SELECT doc_id, CAST(sum(n) AS DOUBLE) AS t FROM cnt GROUP BY 1)
    SELECT cnt.doc_id AS doc_id,
           round(-sum((n / t) * ln(n / t)), 4) AS char_entropy,
           CAST(count(*) AS INTEGER) AS n_unique_chars
    FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
    GROUP BY cnt.doc_id
    """,
    tags=("text", "quality"),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the character distribution per document — the
    cheap perplexity proxy curation pipelines gate on (mojibake, binary
    junk, and pathological repetition all depress it; natural language
    sits in a narrow band).

    Same execution strategy as ``text_repetition_signals`` and for the
    same reason: a per-document histogram is one Arrow ``mapInPandas``
    Counter pass (map-only, no shuffle, linear in bytes) — exploding
    per-character rows through a JVM groupBy would shuffle the entire
    corpus character-by-character."""
    import math

    import pandas as pd

    d = load(spark, sf_dir, "documents")

    def gen(batches):
        from collections import Counter

        for pdf in batches:
            ids, ents, uniqs = [], [], []
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                if not t:  # oracle filters empty/NULL text identically
                    continue
                c = Counter(t)
                n = len(t)
                h = -sum((v / n) * math.log(v / n) for v in c.values())
                ids.append(i)
                # HALF_UP like DuckDB round (entropy >= 0)
                ents.append(math.floor(h * 10000.0 + 0.5) / 10000.0)
                uniqs.append(len(c))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "char_entropy": pd.array(ents, dtype="Float64"),
                    "n_unique_chars": pd.array(uniqs, dtype="Int32"),
                }
            )

    return d.select("doc_id", "text").mapInPandas(
        gen, schema="doc_id long, char_entropy double, n_unique_chars int"
    )


# ------------------------------------------------- bigram surprisal ----


@query(
    "text_bigram_surprisal",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(l)), i -> l[i])) AS w1,
             unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS big
      FROM toks WHERE len(l) >= 2
    ),
    cb AS (SELECT big, count(*) AS nb FROM bg GROUP BY 1),
    cf AS (SELECT w1, count(*) AS nf FROM bg GROUP BY 1)
    SELECT doc_id,
           round(avg(log2(nf * 1.0 / nb)), 4) AS avg_surprisal,
           CAST(count(*) AS BIGINT) AS n_bigrams
    FROM bg JOIN cb USING (big) JOIN cf USING (w1)
    GROUP BY doc_id
    """,
    tags=("text", "quality"),
    bench=True,
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-conditioned bigram surprisal per document — the n-gram
    language-model quality score: mean -log2 p(w2 | w1) over a document's
    bigram occurrences, with p estimated from corpus-wide bigram /
    first-token counts. Boilerplate and template-heavy docs score low
    (their bigrams are corpus-frequent); lexically novel docs score high.

    Plan: one Arrow pass emits bigram occurrences as 64-bit token/bigram
    HASHES computed inside the vectorized pass (r10 — keyed per-token
    hash + splitmix64 fold, the `_batch_shingle_hashes` recipe: the
    strings never cross the Python->JVM boundary at all, the per-token
    Python loop is gone, and the former JVM xxhash64 projection
    disappears; counts/joins only ever need the key identity), persisted
    (three consumers — bigram counts, first-token counts, and the scoring
    join). Count relations are Zipf-skewed at corpus scale: the hot
    first-token join keys (stopwords) are exactly the AQE skew-join
    case, and both count tables broadcast when the vocabulary fits."""
    from itertools import chain

    import numpy as np
    import pandas as pd

    from spark_hbase_connector_spark.operators.dedup import _MX1, _mix64

    d = load(spark, sf_dir, "documents")

    def gen(batches):
        for pdf in batches:
            texts = pdf["text"]
            mask = texts.notna().to_numpy()
            ids = pdf["doc_id"].to_numpy()[mask]
            splits = [t.split(" ") for t in texts[mask]]
            lens = np.fromiter(
                (len(s) for s in splits), dtype=np.int64, count=len(splits)
            )
            n = int(lens.sum())
            if n < 2:
                yield pd.DataFrame(
                    {
                        "id": ids[:0],
                        "w1": np.empty(0, np.int64),
                        "big": np.empty(0, np.int64),
                    }
                )
                continue
            flat = np.array(list(chain.from_iterable(splits)), dtype=object)
            th = pd.util.hash_array(flat, categorize=True)
            doc_idx = np.repeat(np.arange(len(splits)), lens)
            # a bigram is valid iff both tokens fall inside one document
            valid = doc_idx[:-1] == doc_idx[1:]
            big = _mix64(th[:-1] * np.uint64(_MX1) + th[1:])[valid]
            yield pd.DataFrame(
                {
                    "id": ids[doc_idx[:-1][valid]],
                    "w1": th[:-1][valid].view(np.int64),
                    "big": big.view(np.int64),
                }
            )

    bg = (
        d.select("doc_id", "text")
        .mapInPandas(gen, schema="id long, w1 long, big long")
        .persist()
    )
    cb = bg.groupBy("big").agg(F.count(F.lit(1)).alias("nb"))
    cf = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("nf"))
    return (
        bg.join(cb, "big")
        .join(cf, "w1")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.round(F.avg(F.log2(F.col("nf") / F.col("nb"))), 4).alias("avg_surprisal"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


@query(
    "corpus_source_report",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT text) AS BIGINT) AS n_unique_texts,
           round(1.0 - count(DISTINCT text) * 1.0 / count(*), 4) AS exact_dup_rate,
           round(avg(n_chars), 4) AS avg_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents GROUP BY source
    """,
    tags=("quality", "report"),
)
def corpus_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health report: document count, exact-duplicate
    rate (1 - distinct/total), mean length, language spread — the
    dashboard a curation pipeline watches per ingest source. Two
    count-distincts in one aggregation (Spark expands to one grouping
    pass per distinct column, both partial-aggregated); one shuffle on
    the source key."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("text").alias("n_unique_texts"),
        F.round(
            1.0 - F.count_distinct("text") / F.count(F.lit(1)), 4
        ).alias("exact_dup_rate"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.count_distinct("lang").alias("n_langs"),
    )


@query(
    "diag_key_skew",
    oracle="""
    WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
    SELECT user_id, n, round(n * 1.0 / tot, 4) AS share
    FROM c, t
    ORDER BY n DESC, user_id LIMIT 10
    """,
    tags=("diagnostic", "skew"),
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis: the 10 heaviest keys and their share of
    all rows — the check run before choosing between a plain shuffle
    join, AQE skew split, and manual salting (`join_salted_skew`). The
    heavy-hitter scan is one partial-aggregated shuffle + TakeOrdered
    (never a global sort); the grand total rides a single-row broadcast."""
    e = load(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(F.sum("n").alias("tot"))
    return (
        c.crossJoin(F.broadcast(tot))
        .select("user_id", "n", F.round(F.col("n") / F.col("tot"), 4).alias("share"))
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(10)
    )


@query(
    "dedup_unicode_nfc",
    oracle="""
    WITH docs(doc_id, text) AS (VALUES
      (1, 'caf' || chr(233)),
      (2, 'cafe' || chr(769)),
      (3, chr(8486)),
      (4, chr(937)),
      (5, chr(54620)),
      (6, chr(4370) || chr(4449) || chr(4523)),
      (7, 'plain ascii'),
      (8, 'plain ascii'),
      (9, chr(8491)),
      (10, 'A' || chr(778))
    )
    SELECT nfc_normalize(text) AS canon_text,
           count(*)::BIGINT AS n_variants,
           min(doc_id)::BIGINT AS first_doc
    FROM docs GROUP BY 1
    """,
    tags=("dedup", "unicode", "quality"),
)
def dedup_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-normalization-aware dedup: NFC-canonicalize before
    digesting, so composed vs decomposed encodings of the SAME text
    (e + U+0301 vs U+00E9, Hangul jamo vs precomposed syllables,
    compatibility singletons like OHM/ANGSTROM signs) collapse into one
    group — byte-level `dedup_exact` treats every one of these pairs as
    distinct documents, which on a multilingual 100 TB crawl silently
    halves dedup recall for the affected scripts. Normalization runs in
    one Arrow pass (Python `unicodedata` — Spark has no NFC built-in);
    at scale the md5 of the NORMALIZED text is what shuffles, never the
    text (same discipline as `dedup_exact`). The harness corpus is
    ASCII-only, so the entry carries its own 10-row multilingual
    fixture, constructed from identical codepoints on both engines
    (chr() in DuckDB, \\u escapes here); the oracle replays with
    DuckDB's native nfc_normalize."""
    import pandas as pd

    # explicit \u escapes, not literal glyphs: an editor or linter that
    # NFC-normalizes source text must not be able to destroy the fixture
    rows = [
        (1, "caf\u00e9"),  # precomposed e-acute
        (2, "cafe\u0301"),  # e + combining acute (decomposed)
        (3, "\u2126"),  # OHM SIGN (NFC singleton -> U+03A9)
        (4, "\u03a9"),  # GREEK CAPITAL OMEGA
        (5, "\ud55c"),  # precomposed Hangul syllable HAN
        (6, "\u1112\u1161\u11ab"),  # the same syllable as conjoining jamo
        (7, "plain ascii"),
        (8, "plain ascii"),  # byte-exact dup (the case dedup_exact catches)
        (9, "\u212b"),  # ANGSTROM SIGN (NFC singleton -> U+00C5)
        (10, "A\u030a"),  # A + combining ring (decomposed)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def norm(batches):
        import unicodedata

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "canon_text": [
                        unicodedata.normalize("NFC", t) for t in pdf["text"]
                    ],
                }
            )

    canon = docs.mapInPandas(norm, schema="doc_id long, canon_text string")
    return canon.groupBy("canon_text").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_variants"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
    )


@query(
    "text_encoding_quality",
    oracle="""
    WITH docs(doc_id, text) AS (VALUES
      (1, 'clean text, nothing wrong here'),
      (2, 'bad ' || chr(65533) || 'byte soup' || chr(65533)),
      (3, 'ctrl' || chr(1) || 'chars' || chr(7) || chr(27)),
      (4, 'tabs and newlines are fine' || chr(9) || chr(10)),
      (5, 'mixed ' || chr(65533) || chr(2)),
      (6, '')
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           len(regexp_extract_all(text, chr(65533)))::BIGINT AS n_repl,
           len(regexp_extract_all(text,
               '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]'))::BIGINT AS n_ctrl,
           CASE WHEN len(text) = 0 THEN 0.0
                ELSE round((len(regexp_extract_all(text, chr(65533)))
                            + len(regexp_extract_all(text,
                                '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')))
                           * 1.0 / len(text), 4) END AS bad_ratio,
           (len(regexp_extract_all(text, chr(65533))) = 0 AND
            len(regexp_extract_all(text,
                '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')) = 0) AS clean
    FROM docs
    """,
    tags=("text", "quality", "encoding"),
)
def text_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-sanity gate: count U+FFFD replacement characters (the
    scar a lossy decode leaves in every mis-transcoded crawl page) and
    C0 control characters (binary bleed-through; tab/newline/CR exempt),
    emit per-doc ratios and a clean flag — the filter that runs BEFORE
    language ID and quality scoring, because mojibake poisons both.
    Pure JVM regexp_count, map-only, whole-stage codegen. The harness
    corpus is clean ASCII, so the entry carries its own 6-row fixture
    (escape-encoded; identical codepoints via chr() in the oracle) —
    covering clean, replacement-only, control-only, exempt-whitespace,
    mixed, and empty (ratio guarded, no division by zero)."""
    rows = [
        (1, "clean text, nothing wrong here"),
        (2, "bad �byte soup�"),
        (3, "ctrl\x01chars\x07\x1b"),
        (4, "tabs and newlines are fine\t\n"),
        (5, "mixed �\x02"),
        (6, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    n_repl = F.regexp_count("text", F.lit("�"))
    n_ctrl = F.regexp_count("text", F.lit("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"))
    bad_ratio = F.when(F.length("text") == 0, F.lit(0.0)).otherwise(
        F.round((n_repl + n_ctrl) * 1.0 / F.length("text"), 4)
    )
    return docs.select(
        "doc_id",
        n_repl.cast("bigint").alias("n_repl"),
        n_ctrl.cast("bigint").alias("n_ctrl"),
        bad_ratio.alias("bad_ratio"),
        ((n_repl == 0) & (n_ctrl == 0)).alias("clean"),
    )


@query(
    "corpus_overlap_matrix",
    oracle="""
    WITH toks AS (SELECT source, string_split(text, ' ') AS l FROM documents),
    sh AS (
      SELECT source,
             unnest(list_distinct(list_transform(range(1, len(l) - 1),
                    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS s
      FROM toks WHERE len(l) >= 3
    ),
    ss AS (SELECT DISTINCT source, s FROM sh),
    sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM ss
              GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS n_inter
      FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, n_inter,
           round(CAST(n_inter AS DOUBLE)
                 / CAST(sa.n + sb.n - n_inter AS DOUBLE), 4) AS jaccard,
           round(CAST(n_inter AS DOUBLE)
                 / CAST(least(sa.n, sb.n) AS DOUBLE), 4) AS containment
    FROM inter
    JOIN sizes sa ON src_a = sa.source
    JOIN sizes sb ON src_b = sb.source
    ORDER BY src_a, src_b
    """,
    tags=("text", "dedup", "quality", "pipeline"),
)
def corpus_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source overlap matrix — the dataset-paper staple: for every
    pair of ingest sources, the distinct-shingle intersection, Jaccard,
    and containment (intersection over the SMALLER side — "how much of
    corpus A is already inside corpus B"), the numbers that decide
    whether a new crawl adds anything.

    Scale shape: ONE Arrow shingling pass keyed directly by source
    (persisted — the distinct relation feeds both sizes and
    intersections, and mapInPandas subtrees re-execute per consumer),
    one distinct to (source, shingle). Intersections deliberately avoid
    the posting self-join: group by shingle, collect the sorted source
    SET (bounded by the source count, ~20 — NOT df: a shingle in a
    million docs of one source still contributes one element), and
    explode its pairs — per-shingle work is O(k²) with k <= n_sources,
    so candidate volume is linear in distinct shingles with a
    constant factor, never Σdf². Zero-overlap pairs are naturally
    absent on both engines (pairs only arise from co-occurrence). All
    ratios are exact-integer divisions — bit-identical doubles before
    the display rounding."""
    from spark_hbase_connector_spark.operators.dedup import (
        shingle_posting_hashes,
    )

    d = load(spark, sf_dir, "documents")
    # hashed shingle identity (r10): the matrix only needs intersection
    # COUNTS and sizes, never the shingle string — 8-byte keys all the way.
    # The global distinct stays: the hashed pass dedups per DOCUMENT only,
    # while sizes need distinct (source, shingle) across all docs of a
    # source — it just shuffles 8-byte keys now instead of w-word strings.
    ss = shingle_posting_hashes(d, "text", "source").distinct().persist()
    sizes = ss.groupBy(F.col("id").alias("source")).agg(
        F.count(F.lit(1)).alias("n")
    )
    pairs = (
        ss.groupBy("s")
        .agg(F.array_sort(F.collect_set("id")).alias("srcs"))
        .where(F.size("srcs") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(srcs, (x, i) -> "
                    "transform(slice(srcs, i + 2, size(srcs) - i - 1), "
                    "y -> struct(x AS src_a, y AS src_b))))"
                )
            ).alias("p")
        )
        .select("p.src_a", "p.src_b")
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_inter",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double"),
                4,
            ).alias("jaccard"),
            F.round(
                F.col("n_inter").cast("double")
                / F.least("na", "nb").cast("double"),
                4,
            ).alias("containment"),
        )
        .orderBy("src_a", "src_b")
    )


@query(
    "corpus_drift_psi",
    oracle="""
    WITH b AS (
      SELECT source, least(n_chars // 40, 9) AS bucket FROM documents
    ),
    counts AS (
      SELECT source, bucket, CAST(count(*) AS BIGINT) AS c
      FROM b GROUP BY source, bucket
    ),
    totals AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS t FROM counts GROUP BY source
    ),
    shares AS (
      SELECT c.source, c.bucket,
             CAST(c.c AS DOUBLE) / CAST(t.t AS DOUBLE) AS share
      FROM counts c JOIN totals t ON c.source = t.source
    ),
    ref AS (SELECT bucket, share AS p FROM shares WHERE source = 'src0')
    SELECT s.source,
           round(sum((s.share - ref.p) * ln(s.share / ref.p)), 4) AS psi,
           CAST(count(*) AS BIGINT) AS n_buckets
    FROM shares s JOIN ref ON s.bucket = ref.bucket
    WHERE s.source <> 'src0'
    GROUP BY s.source ORDER BY s.source
    """,
    tags=("quality", "drift", "pipeline"),
)
def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift report — population stability index of the
    document-length distribution of every source against the reference
    corpus (`src0`), the standard go/no-go gate before mixing a new
    crawl into a training corpus (PSI < 0.1 stable, > 0.25 shifted).

    Buckets are FIXED width (n_chars // 40, capped at 9) so both engines
    bin identically with integer arithmetic; shares are exact-integer
    ratios (bit-identical doubles); the epsilon-free PSI variant sums
    (q-p)*ln(q/p) over buckets present in BOTH distributions (inner join
    on the reference buckets — the repo-wide `ln`-at-4dp pattern proven
    by the TF-IDF/surprisal/DSIR entries).

    Scale shape: one corpus scan + ONE partial-aggregated groupBy to
    (source, bucket) — at most n_sources x 10 rows leave the map side
    regardless of corpus size; everything downstream (totals, shares,
    the broadcast reference) is report-sized."""
    d = load(spark, sf_dir, "documents")
    b = d.select(
        "source",
        F.least(F.floor(F.col("n_chars") / 40), F.lit(9)).alias("bucket"),
    )
    counts = b.groupBy("source", "bucket").agg(F.count(F.lit(1)).alias("c"))
    counts = counts.persist()
    totals = counts.groupBy("source").agg(F.sum("c").alias("t"))
    shares = counts.join(F.broadcast(totals), "source").select(
        "source",
        "bucket",
        (F.col("c").cast("double") / F.col("t").cast("double")).alias("share"),
    )
    ref = (
        shares.where(F.col("source") == "src0")
        .select("bucket", F.col("share").alias("p"))
    )
    return (
        shares.where(F.col("source") != "src0")
        .join(F.broadcast(ref), "bucket")
        .groupBy("source")
        .agg(
            F.round(
                F.sum(
                    (F.col("share") - F.col("p"))
                    * F.log(F.col("share") / F.col("p"))
                ),
                4,
            ).alias("psi"),
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        )
        .orderBy("source")
    )
