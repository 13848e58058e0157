"""Stage-by-stage wall profile of shingle_jaccard_pairs_prefix (guide §1:
measure first — find where dedup_ngram_jaccard_prefix's sf100 wall
actually goes before changing anything).

One warm session; each listed stage is materialized through the noop sink
in dependency order, so earlier stages' persisted relations are already
hot when a later stage runs and the deltas approximate per-stage cost
(exactly how the real query pays them once). Job descriptions are set so
the run is also readable in the UI event log if one is kept.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/profile_prefix_jaccard.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from spark_hbase_connector_spark import get_spark  # noqa: E402
from spark_hbase_connector_spark.catalogs import load  # noqa: E402
from spark_hbase_connector_spark.operators.dedup import (  # noqa: E402
    _hashed_postings_and_sizes,
)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    threshold = 0.85
    spark = get_spark("profile-prefix")
    sc = spark.sparkContext
    d = load(spark, sf_dir, "documents")

    posts, _ = _hashed_postings_and_sizes(d, "text", "doc_id", 3, None)
    dfreq = posts.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    docs = (
        posts.join(dfreq, "s")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "s"))).alias("arr"))
        .select(
            "id",
            F.transform("arr", lambda x: x["s"]).alias("ss"),
            F.size("arr").alias("n"),
        )
        .withColumn(
            "k",
            (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 2).cast("int"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    prefix = docs.select(
        "id", "n", F.explode(F.slice("ss", F.lit(1), F.col("k"))).alias("s")
    )
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .agg(F.first(F.col("a.n")).alias("n1"), F.first(F.col("b.n")).alias("n2"))
        .where(
            F.least("n1", "n2") >= threshold * F.greatest("n1", "n2") - F.lit(1e-9)
        )
    )
    g1 = docs.select(F.col("id").alias("id1"), F.col("ss").alias("ss1"))
    g2 = docs.select(F.col("id").alias("id2"), F.col("ss").alias("ss2"))
    i = F.size(F.array_intersect("ss1", "ss2"))
    jac = i / (F.col("n1") + F.col("n2") - i)
    full = (
        cand.join(g1, "id1")
        .join(g2, "id2")
        .select("id1", "id2", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )

    stages = [
        ("1_posts_arrow_pass", posts),
        ("2_dfreq_groupby", dfreq),
        ("3_docs_build(join+collect_sort)", docs),
        ("4_candidates(prefix self-join)", cand),
        ("5_full(verify array_intersect)", full),
    ]
    total = 0.0
    for label, df in stages:
        sc.setJobDescription(f"profile: {label}")
        t0 = time.time()
        noop(df)
        dt = time.time() - t0
        total += dt
        print(f"{label}: {dt:.2f}s", flush=True)
    sc.setJobDescription(None)
    print(f"sum_of_stages: {total:.2f}s", flush=True)
    # row counts give the volume story (cheap on cached relations)
    print(f"n_posts={posts.count()} n_docs={docs.count()}", flush=True)
    print(f"n_prefix={prefix.count()} n_cand={cand.count()}", flush=True)
    print(f"n_pairs={full.count()}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
