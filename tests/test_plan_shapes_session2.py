"""Plan-shape regressions for the session-2 operators: the plans the
scale story depends on must not silently degrade."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_basket_affinity_broadcasts_marginals_no_cartesian(spark):
    from postgres_s3_etl_spark.operators.analytics import (
        q_brand_basket_affinity,
    )

    plan = _plan(q_brand_basket_affinity(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # part dim, both marginal sides, and the scalar total broadcast;
    # only the order-key pair join may shuffle.
    assert plan.count("BroadcastExchange") >= 3, plan[:2000]


def test_active_users_expands_rollup_not_raw_events(spark):
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.events import q_events_active_users

    df = q_events_active_users(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # The 7× Generate (explode) must sit ABOVE the user-day
    # deduplication, never on the raw scan: in the plan tree the
    # explode's child chain has to contain an aggregate.
    lines = plan.splitlines()
    gen_idx = next(i for i, l in enumerate(lines) if "Generate explode" in l)
    below = "\n".join(lines[gen_idx:])
    assert "HashAggregate" in below, plan[:3000]
    # And the expansion is bounded: ≤ 7 × |user-day rollup| rows.
    ev = load_table(spark, SF_DIR, "events")
    n_ud = ev.selectExpr("user_id", "to_date(ts) AS day").distinct().count()
    from pyspark.sql import functions as F

    n_expanded = (
        ev.select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .select(
            F.explode(
                F.expr("transform(sequence(0, 6), i -> date_add(day, i))")
            )
        )
        .count()
    )
    assert n_expanded == 7 * n_ud


def test_hard_negatives_probe_side_broadcasts(spark):
    from postgres_s3_etl_spark.operators.similarity import (
        embedding_hard_negatives,
    )

    plan = _plan(embedding_hard_negatives(spark, SF_DIR))
    # Bounded probe set broadcast against the corpus — the corpus side
    # must not shuffle for the join itself.
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]


def test_minhash_verify_candidates_broadcast_into_shingle_joins(spark):
    from postgres_s3_etl_spark.operators.dedup import dedup_minhash_verify

    plan = _plan(dedup_minhash_verify(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # Two broadcast hash joins: tiny candidate frame × shingle table.
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
