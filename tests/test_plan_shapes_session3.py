"""Session-3 plan-shape pins: the percentile-style queries that
ranked a data-proportional column through an unpartitioned window
(``Window.orderBy(value)`` + row_number — a single-task global sort
at scale) now route through the two-pass range-partitioned rank
(operators/ranking.py). Same ADVICE-r2 hazard class as the six
global-ranking queries fixed earlier this round; this file pins the
fix for the four stragglers.
"""

import re

SF = "/root/testdata/sf0.001"


def _opt_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_percentile_queries_have_no_single_task_window(spark):
    """Every window in these plans must carry the _pid partitioning
    of the distributed rank (local pass) or run over the ≤#partitions
    offsets rollup (which orders by _pid). Either way the spec names
    _pid — a windowspec WITHOUT it is a data-grain global sort."""
    import __spark_entry__ as e

    qs = e.queries()
    for name in (
        "q_orders_mad_outliers",
        "q_orders_winsorized_stats",
        "q_events_funnel_latency",
        "embedding_norm_outliers",
    ):
        plan = _opt_plan(qs[name](spark, SF))
        for m in re.finditer(r"windowspecdefinition\([^)]*\)", plan):
            assert "_pid" in m.group(0), (name, m.group(0))


def test_new_tpch_queries_no_hinted_big_broadcasts(spark):
    """The 7 suite-completing TPC-H shapes follow the same hint rule
    as the rest of the suite: hints only on region/nation and 1-row
    aggregates, never on linear-growth tables."""
    import __spark_entry__ as e
    from scripts.audit_broadcast_hints import hinted_raw_big_scans

    qs = e.queries()
    for name in (
        "q_tpch02_min_cost_supplier",
        "q_tpch09_product_type_profit",
        "q_tpch11_important_value",
        "q_tpch12_ship_latency_modes",
        "q_tpch16_supplier_count",
        "q_tpch20_dominant_suppliers",
        "q_tpch21_waiting_orders",
    ):
        plan = _opt_plan(qs[name](spark, SF))
        assert hinted_raw_big_scans(plan) == [], name
