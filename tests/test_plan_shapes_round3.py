"""Round-3 plan-shape pins: no forced broadcast of linear-growth
tables (VERDICT r2 "What's wrong" #2).

`customer`/`supplier` grow with scale (~15B customers at 100 TB); a
`F.broadcast()` hint overrides AQE's size check and OOMs the build
side at 100x. Only genuinely bounded dims (region: 5 rows, nation:
25, filtered part projections) may carry hints. AQE still broadcasts
small runtime sides on its own — that's the point: the *hint* is the
scale bug, not the broadcast.
"""

SF = "/root/testdata/sf0.001"


def _opt_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_dehinted_queries_have_no_broadcast_hints(spark):
    """The three queries that joined raw customer through a hint now
    carry no hint at all — strategy choice belongs to AQE."""
    from postgres_s3_etl_spark.operators.analytics import (
        q_percentiles,
        q_percentiles_disc,
        q_top_revenue_orders,
    )

    for fn in (q_top_revenue_orders, q_percentiles, q_percentiles_disc):
        plan = _opt_plan(fn(spark, SF))
        assert "strategy=broadcast" not in plan, fn.__name__


def test_regional_volume_hints_only_bounded_dims(spark):
    """TPC-H Q5 shape keeps hints on region/nation only; its
    customer/supplier joins are AQE-chosen."""
    from postgres_s3_etl_spark.operators.analytics import q_regional_volume
    from scripts.audit_broadcast_hints import hinted_raw_big_scans

    plan = _opt_plan(q_regional_volume(spark, SF))
    assert plan.count("strategy=broadcast") == 2, plan[:2000]
    assert hinted_raw_big_scans(plan) == []


def test_global_rankings_have_no_single_task_window(spark):
    """VERDICT r2 #3: the six global-ranking queries must not funnel
    entity-grain data through an unpartitioned window. Rule: any
    windowspec that references an entity key (custkey/orderkey) or an
    entity-grain measure must also carry the _pid partitioning of the
    two-pass distributed rank. Windows over bounded rollups (decile,
    class, partition-id) pass."""
    import re

    import __spark_entry__ as e

    entity = re.compile(
        r"windowspecdefinition\([^)]*(o_custkey|o_orderkey|recency_days"
        r"|frequency|monetary|rev#|price#)[^)]*\)"
    )
    qs = e.queries()
    for name in (
        "q_decile_stats",
        "q_customer_rfm",
        "q_customer_revenue_gini",
        "q_customer_abc_classes",
        "q_customer_gains_curve",
        "q_customer_value_migration",
    ):
        plan = _opt_plan(qs[name](spark, SF))
        for m in re.finditer(r"windowspecdefinition\([^)]*\)", plan):
            spec = m.group(0)
            if entity.search(spec):
                assert "_pid" in spec, (name, spec)


def test_shard_pack_running_total_is_salted(spark):
    """VERDICT r2 item 10: the shard-pack running total must window
    by (source, _salt), not source alone — a dominant source would
    otherwise run as one task."""
    import re

    from postgres_s3_etl_spark.operators.sharding import text_shard_pack

    plan = _opt_plan(text_shard_pack(spark, SF))
    ord_specs = [
        s
        for s in re.findall(r"windowspecdefinition\([^)]*\)", plan)
        if "ord_key" in s
    ]
    assert ord_specs, "expected running-total windows in plan"
    for s in ord_specs:
        assert "_salt" in s, s


def test_no_raw_big_table_under_any_hint(spark):
    """Global invariant over a representative mix of join-heavy
    queries: no broadcast-hinted side may contain a raw (unreduced)
    scan of a linear-growth table. The full 134-query sweep lives in
    scripts/audit_broadcast_hints.py (round-close checklist)."""
    import __spark_entry__ as e
    from scripts.audit_broadcast_hints import hinted_raw_big_scans

    names = [
        "q_top_revenue_orders",
        "q_regional_volume",
        "q_customer_nation_semijoin",
        "q_percentiles",
        "q_percentiles_disc",
        "etl_best_performing_product",
        "q_supplier_brand_coverage",
        "q_brand_basket_affinity",
        "text_lm_perplexity",
        "text_bigram_pmi",
        "dedup_cc_keepset",
        "sim_search_bruteforce",
    ]
    qs = e.queries()
    for name in names:
        plan = _opt_plan(qs[name](spark, SF))
        assert hinted_raw_big_scans(plan) == [], name
