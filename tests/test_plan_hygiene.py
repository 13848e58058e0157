"""Registry-wide physical-plan hygiene gate.

Every batch query in the registry is explain-audited for the anti-patterns
that kill 100 TB runs:

- ``CartesianProduct`` — an unconstrained n x m join (never acceptable);
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan (Arrow
  paths show up as ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
  instead and are fine);
- ``BroadcastNestedLoopJoin`` — allowed ONLY where a bounded broadcast
  side makes it intentional (the exact all-pairs baselines, where the
  whole point is comparing against the quadratic reference semantics).

Streaming and fixture entries are exercised elsewhere (their query
functions execute work on invocation); everything else is planned, not
run, so this stays fast.
"""

from __future__ import annotations

import pytest

from spark_hbase_connector_spark.plans.audit import explain_string
from spark_hbase_connector_spark.queries import REGISTRY

# exact all-pairs baselines: the broadcast-bounded nested loop IS the
# declared semantics (their scale paths are the _lsh / ivf variants)
# Queries where a BroadcastNestedLoopJoin is intentional and bounded:
# embedding_cosine_pairs is the exact all-pairs baseline; q11's nested loop
# is the single-row scalar threshold cross-joined into the grouped output;
# funnel_steps cross-joins three SINGLE-ROW stage-count aggregates.
# Legitimate broadcast-nested-loop cases: a single-row scalar relation
# (grand total / threshold) broadcast against a tiny aggregate.
_BNLJ_ALLOWED = {
    "embedding_cosine_pairs",
    "q11_important_stock",
    "funnel_steps",
    "approx_heavy_hitters_qa",
    "diag_key_skew",
    # region_split_plan_qa broadcasts the single-row split-boundary sketch
    # against the fact table to bucket rows
    "region_split_plan_qa",
    # scalar_haversine_nearest: 5-row anchor table broadcast-crossed for
    # nearest-neighbor classification
    "scalar_haversine_nearest",
    # sample_mixture_temperature broadcasts the single-row (n_corpus,
    # s_alpha) normalizer into the per-source size relation
    "sample_mixture_temperature",
    # scan_keyset_pagination broadcasts the single-row page boundary
    # (max rowkey of the previous page) into the range filter
    "scan_keyset_pagination",
    # bpe_train_merges broadcasts each round's single-row chosen merge
    # into the vocab-sized sequence relation (3 unrolled rounds)
    "bpe_train_merges",
    # table_stats_collect broadcasts the single-row stats/sketch relation
    # into the gate pass and the final per-column projection
    "table_stats_collect",
    # text_quality_classifier_nb broadcasts the single-row class-prior and
    # vocab-totals aggregates into the score/weight relations
    "text_quality_classifier_nb",
    # corpus_ccnet_buckets broadcasts the single-row corpus-token-total
    # aggregate into the per-token scoring relation
    "corpus_ccnet_buckets",
    # search_bm25_topk broadcasts the single-row corpus-stats aggregate
    # (N, avgdl, per-term df) into the scoring scan
    "search_bm25_topk",
}

_SKIP_TAGS = {"streaming", "fixture"}


def _batch_specs():
    return [
        (name, spec)
        for name, spec in REGISTRY.items()
        if not (_SKIP_TAGS & set(spec.tags))
    ]


@pytest.mark.parametrize("name", [n for n, _ in _batch_specs()])
def test_no_plan_antipatterns(spark, sf_dir, name):
    spec = REGISTRY[name]
    plan = explain_string(spec.fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF\n{plan}"
    if name not in _BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unexpected broadcast nested loop\n{plan}"
        )
