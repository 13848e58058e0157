"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query on sf0.001; ``queries`` exposes every
implemented operator from SURVEY.md §2 (scan/pushdown parity, the
relational suite, and the north-star dedup/similarity/text/multimodal/
streaming extensions); ``oracle_sql`` gives the DuckDB-equivalent SQL for
each (omitted only for genuinely non-SQL-expressible ops, e.g. SimHash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_hbase_connector_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's own flagship shape (ScalaDatasourceTest.scala:88-91):
    rowkey IN (...) OR attribute equality, through the catalog layer.
    """
    return REGISTRY["scan_flagship"].fn(spark, "/root/testdata/sf0.001")


# The driver's correctness gate samples the FIRST 50 entries, so the head
# of the dict is a curated cross-section: every operator family (scans,
# TPC-H, relational, window/time-series, dedup, similarity, text, quality,
# sampling/packing, curation, multimodal, streaming, indexing) has
# driver-verified representatives. The remaining entries follow in
# registry order — all are equally oracle-checked by the in-repo
# differential (scripts/run_differential.py).
DRIVER_WINDOW = [
    # Round-6 rotation (VERDICT r5 ask #7): 40 of these 50 have NEVER
    # carried the external driver signal (80% of the window). The ten
    # exceptions are entries whose implementation or oracle CHANGED this
    # round and must (re-)earn the signal: the two r5 driver-hash-red
    # entries made exact-arithmetic deterministic (kv_counter_increments,
    # orders_abc_classification), the two prefix-filter dedup operators
    # whose plans were flattened (dedup_ngram_jaccard_prefix,
    # dedup_containment_prefix), the hardened timer entry
    # (streaming_session_timeout_close), the flagship identity check,
    # and the four sf100-decade fixes (q5 join-tree rewrite, simhash
    # combination banding, the vectorized IVF assignment behind
    # embedding_cosine_pairs_lsh and ann_topk_ivf). Everything rotated out was driver-green in r02-r05 and is
    # unchanged since; all 263 entries remain oracle-checked by the
    # committed full differential (CORRECTNESS_r06_*_local.json).
    # --- changed this round / flagship identity (6)
    "scan_flagship",
    "kv_counter_increments",
    "orders_abc_classification",
    "dedup_ngram_jaccard_prefix",
    "dedup_containment_prefix",
    "streaming_session_timeout_close",
    # --- scan / source formats, never driver-checked (4)
    "scan_csv_typed",
    "scan_keyset_pagination",
    "schema_evolution_merge",
    "atm_key_range_desc",
    # --- kv reference-parity fixtures (1; the overlay twin rotated out
    # for the round-6b statistical-curation additions below)
    "people_flagship",
    # --- TPC-H stragglers (2)
    "q11_important_stock",
    "q16_supplier_part_counts",
    # --- relational / agg (5)
    "agg_bitmap_distinct",
    "agg_stats_moments",
    "setop_except_all",
    "q5_local_supplier_volume",
    # --- scalar functions (3)
    "scalar_array_hof",
    "dedup_simhash",
    "embedding_cosine_pairs_lsh",
    # --- window / time-series (7)
    "gapfill_interpolate",
    "asof_join_forward",
    "sessionize_dynamic_gap",
    "funnel_steps",
    "cohort_retention",
    "window_ewma",
    # --- dedup (4)
    "dedup_containment",
    "dedup_edit_distance",
    "dedup_incremental_fingerprint",
    "dedup_normalized_exact",
    # --- similarity / embeddings / sketch QA (5)
    "ann_recall_quantized",
    "knn_label_qa",
    "embedding_pca_qa",
    "embedding_quantize_qa",
    "approx_quantiles_qa",
    # --- text / corpus curation (5)
    "text_langid",
    "ann_topk_ivf",
    "bpe_pair_counts",
    "split_leakage_safe",
    "domain_mixture_weights",
    # --- multimodal (2)
    "multimodal_meta_images",
    "multimodal_framesample",
    # --- statistical curation, NEW round-6b (4): DSIR resampling, the
    # NB quality classifier, CCNet perplexity buckets, triangle census
    "sample_importance_dsir",
    "text_quality_classifier_nb",
    "corpus_ccnet_buckets",
    "graph_triangle_count",
    # --- streaming (4): the NEW event-time-timer entry + never-checked reps
    "streaming_first_horizon_watermark",
    "streaming_chained_agg",
    "streaming_hbasekv_changefeed",
    "streaming_foreachbatch_sink",
]


def _ordered_names() -> list[str]:
    head = [n for n in DRIVER_WINDOW if n in REGISTRY]
    return head + [n for n in REGISTRY if n not in set(head)]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (same column
    names/types; float aggregates rounded identically on both sides)."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
