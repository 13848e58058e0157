"""Graph helpers for dedup clustering — connected components on a pair list.

Near-dup pair operators (``dedup_ngram_jaccard``, ``dedup_minhash_lsh``,
``simhash_pairs``) emit edges; turning "pairs" into "groups" (one canonical
representative per duplicate cluster) is a connected-components problem.
Spark has no native CC; this is min-label propagation expressed as plain
DataFrame joins — the Pregel formulation:

- state: (id, comp), initialized comp = id;
- step: every node takes min(comp, min over neighbors' comp) — ONE shuffle
  join (edges x labels) + one partial-aggregated groupBy per iteration;
- fixpoint: stop when no label changed (checked with a count per
  iteration); iterations needed = graph diameter, which for dedup clusters
  is tiny (near-dup groups are dense cliques, diameter 1-2).

Scale notes: labels are node-sized (small); edges dominate and are
persisted once. Each iteration localCheckpoints the label relation —
without it the plan doubles per iteration and Catalyst re-optimizes the
whole history. For adversarial long-chain graphs at 100 TB swap in
alternating small-star/large-star contraction (same join primitives,
O(log n) rounds); for dedup workloads plain propagation converges faster
because cluster diameters are constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    pairs: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    max_iter: int = 50,
) -> DataFrame:
    """(id1, id2) undirected edges -> (id, comp) with comp = min id
    reachable from ``id``. Only nodes that appear in an edge are returned
    (singletons are trivially their own component).
    """
    e = pairs.select(F.col(id1).alias("src"), F.col(id2).alias("dst"))
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("id").alias("dst"), F.col("comp").alias("dcomp")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dcomp").alias("nbr_comp"))
            .select(F.col("src").alias("id"), "nbr_comp")
        )
        updated = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias(
                    "comp"
                ),
                (F.coalesce("nbr_comp", F.col("comp")) < F.col("comp")).alias("__chg"),
            )
            .localCheckpoint()
        )
        n_changed = updated.where(F.col("__chg")).count()
        labels = updated.select("id", "comp")
        if n_changed == 0:
            break
    edges.unpersist()
    return labels
