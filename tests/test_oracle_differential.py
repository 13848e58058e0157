"""DuckDB differential gate over a representative query subset at sf0.001.

The full 52-query differential at sf0.01 is what the driver runs; this keeps
the local pytest loop fast while covering every operator family. Run the
full thing manually with: python scripts/run_differential.py
"""

import pytest

from spark_hbase_connector_spark.oracle import compare_frames, duckdb_connection
from spark_hbase_connector_spark.queries import REGISTRY

SUBSET = [
    "scan_flagship",
    "scan_and_or",
    "scan_rowkey_range_sort",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_anti",
    "rollup_orders",
    "pivot_lineitem",
    "setop_union",
    "scalar_datetime",
    "scalar_json",
    "window_topk_per_group",
    "sessionize_events",
    "asof_join_events",
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_ngram_jaccard",
    "dedup_duplicated_spans",
    "dedup_incremental_fingerprint",
    "text_bigram_surprisal",
    "agg_stats_moments",
    "unpivot_measures",
    "ann_topk_cosine",
    "ann_topk_filtered",
    "dedup_repeated_paragraphs",
    "text_token_stats",
    "text_langid",
    "multimodal_meta",
    "streaming_tumbling_counts",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", SUBSET)
def test_differential(spark, sf_dir, duck, name):
    spec = REGISTRY[name]
    assert spec.oracle is not None
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    oracle_pdf = duck.execute(spec.oracle).df()
    r = compare_frames(name, spark_pdf, oracle_pdf)
    assert r.ok, r.detail


def test_every_query_has_entry_and_runs_registered():
    """Registry hygiene: unique names, callables, oracle coverage ratio."""
    assert len(REGISTRY) >= 50
    no_oracle = [n for n, s in REGISTRY.items() if s.oracle is None]
    # every entry is oracle-checked — even the iterative ones
    # (kmeans_train_cells/graph_pagerank unroll their fixed-seed loops
    # as CTE iterations)
    assert no_oracle == []


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 1
    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) == len(REGISTRY)
