"""Plan-shape pins for the round-4 session-2 operators: none of the
28 new queries may compile to a CartesianProduct — bounded probe/
scalar cross joins must broadcast (BroadcastNestedLoopJoin), data-
sized joins must stay on the hash/sort-merge path."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

NEW_R4B = [
    "q_customer_survival_km",
    "q_orders_dupe_invoices",
    "graph_kcore",
    "graph_bfs_levels",
    "text_burstiness",
    "hybrid_search_rrf",
    "q_events_ab_test",
    "q_events_markov_stationary",
    "q_orders_psi_drift",
    "embedding_jl_projection",
    "mm_payload_entropy",
    "graph_clustering_coeff",
    "embedding_sign_quantization",
    "q_customer_acquisition_curve",
    "q_orders_trend_mannkendall",
    "q_orders_bootstrap_ci",
    "q_orders_anova_priority",
    "embedding_silhouette",
    "text_lexical_diversity",
    "q_events_spectral_peaks",
    "q_lineitem_returns_pchart",
    "embedding_ood_candidates",
    "sim_search_pq_recall",
    "q_part_price_index",
    "graph_random_walks",
    "dedup_lsh_bucket_stats",
    "q_join_cardinality_forecast",
    "q_customer_acquisition_curve",
]


@pytest.mark.parametrize("name", sorted(set(NEW_R4B)))
def test_no_cartesian_product(spark, name):
    import __spark_entry__ as e

    plan = (
        e.queries()[name](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, name
