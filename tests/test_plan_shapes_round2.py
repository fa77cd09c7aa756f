"""Plan-shape regressions for the late round-2 operators: the
candidate-generation joins must stay equi-joins (no cartesian), the
row-local operators must not shuffle before their final sort."""

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_span_and_decon_plans_have_no_cartesian(spark):
    from postgres_s3_etl_spark.operators.text_analysis import (
        text_decontaminate,
        text_span_dedup,
    )

    for fn in (text_span_dedup, text_decontaminate):
        plan = _plan(fn(spark, SF))
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__


def test_fuzzy_match_is_blocked_equi_join(spark):
    """The ER self-join must key on the blocking column — an equi-
    join (hash or sort-merge), never a nested-loop over all pairs."""
    from postgres_s3_etl_spark.operators.entity import q_customer_fuzzy_match

    plan = _plan(q_customer_fuzzy_match(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan)


def test_chunk_and_repetition_are_shuffle_free(spark):
    """Row-local corpus ops: the only exchange allowed is the final
    presentation ORDER BY (a range partitioning)."""
    from postgres_s3_etl_spark.operators.text_analysis import (
        text_chunk,
        text_repetition_score,
    )

    for fn in (text_chunk, text_repetition_score):
        plan = _plan(fn(spark, SF))
        n_exchange = plan.count("Exchange")
        n_range = plan.count("Exchange rangepartitioning")
        assert n_exchange == n_range, (fn.__name__, plan[:1500])


def test_quantize_broadcasts_constant_stats(spark):
    """The per-dimension stats join must broadcast (DIM rows), never
    shuffle the exploded corpus to a sort-merge join."""
    from postgres_s3_etl_spark.operators.similarity import embedding_quantize

    plan = _plan(embedding_quantize(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
