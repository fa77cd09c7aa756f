"""Plan-shape pins for the round-6 continuation operators: the
pair-generating and top-k plans must keep their scale-safe physical
strategies — equi-joins (never cartesian), distributed top-k
(TakeOrderedAndProject, never a global sort), and broadcast only on
provably bounded sides.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _opt(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_pair_generators_never_cartesian(spark):
    """Every candidate-pair join added this session is an equi-join:
    a CartesianProduct in any of these plans would be the quadratic
    blow-up the designs exist to avoid."""
    from postgres_s3_etl_spark.operators.dedup import dedup_fuzzy_cluster
    from postgres_s3_etl_spark.operators.graph import (
        graph_adamic_adar,
        graph_local_bridges,
    )
    from postgres_s3_etl_spark.operators.text_analysis import (
        text_fuzzy_dups,
    )

    for fn in (
        text_fuzzy_dups,
        graph_adamic_adar,
        graph_local_bridges,
        dedup_fuzzy_cluster,
    ):
        plan = _phys(fn(spark, SF))
        assert "CartesianProduct" not in plan, fn.__name__


def test_topk_plans_use_take_ordered(spark):
    """Distributed top-k (TakeOrderedAndProject) — not a global sort
    that would move every row to one task."""
    from postgres_s3_etl_spark.operators.analytics import (
        q_customer_clv_shrunken,
    )
    from postgres_s3_etl_spark.operators.graph import graph_adamic_adar

    for fn in (q_customer_clv_shrunken, graph_adamic_adar):
        plan = _phys(fn(spark, SF))
        assert "TakeOrderedAndProject" in plan, fn.__name__


def test_hits_iterates_without_cartesian_or_global_window(spark):
    """The HITS per-iteration joins stay equi-joins and the final
    rank window runs on the bounded 10-row frame only (no window
    over the full node grain — the optimized plan's windows sit
    above a Limit)."""
    from postgres_s3_etl_spark.operators.graph import graph_hits

    plan = _opt(graph_hits(spark, SF))
    assert "CartesianProduct" not in plan
    # the only Window in the plan is the rank over the 10-row heads
    assert plan.count("Window") <= 2


def test_fuzzy_dups_candidates_are_rank_bounded(spark):
    """The sorted-neighborhood join must key on the neighbor rank
    (equi-join on nbr_rnk = rnk), and the explode fan-out carries
    the FUZZY_WINDOW factor — visible as a Generate node."""
    from postgres_s3_etl_spark.operators.text_analysis import (
        text_fuzzy_dups,
    )

    plan = _opt(text_fuzzy_dups(spark, SF))
    assert "Generate explode" in plan
    assert "CartesianProduct" not in plan
