"""TPC-H-derived suite (operators/tpch.py): oracle parity at
sf0.001 plus the scale contracts the module docstring promises —
no broadcast hints on linear-growth tables, top-k planned as
TakeOrderedAndProject (never a global sort).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_matches_oracle

ALL = [
    "q_tpch02_min_cost_supplier",
    "q_tpch03_shipping_priority",
    "q_tpch04_priority_late",
    "q_tpch05_local_supplier_volume",
    "q_tpch06_revenue_change",
    "q_tpch07_volume_shipping",
    "q_tpch08_market_share",
    "q_tpch09_product_type_profit",
    "q_tpch10_returned_items",
    "q_tpch11_important_value",
    "q_tpch12_ship_latency_modes",
    "q_tpch13_customer_distribution",
    "q_tpch14_promo_effect",
    "q_tpch15_top_supplier",
    "q_tpch16_supplier_count",
    "q_tpch17_small_qty_revenue",
    "q_tpch18_large_volume_customer",
    "q_tpch19_discounted_revenue",
    "q_tpch20_dominant_suppliers",
    "q_tpch21_waiting_orders",
    "q_tpch22_idle_customers",
]


@pytest.mark.parametrize("name", ALL)
def test_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, name)


def _opt_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _spark_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_broadcast_hint_on_linear_growth_tables(spark):
    """Hints are reserved for region/nation (and the 1-row Q15/Q22
    aggregates); customer/supplier/part/orders strategy is AQE's."""
    import __spark_entry__ as e
    from scripts.audit_broadcast_hints import hinted_raw_big_scans

    qs = e.queries()
    for name in ALL:
        plan = _opt_plan(qs[name](spark, SF_DIR))
        assert hinted_raw_big_scans(plan) == [], name


@pytest.mark.parametrize(
    "name",
    [
        "q_tpch03_shipping_priority",
        "q_tpch10_returned_items",
        "q_tpch18_large_volume_customer",
        "q_tpch21_waiting_orders",
    ],
)
def test_topk_is_take_ordered_not_global_sort(spark, name):
    """orderBy().limit(k) must plan as TakeOrderedAndProject —
    per-partition heaps + a k-row merge, no full shuffle sort."""
    import __spark_entry__ as e

    plan = _spark_plan(e.queries()[name](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_q6_filters_pushed_to_scan(spark):
    """Q6's predicates must reach the parquet reader and the scan
    must read only the referenced columns."""
    import __spark_entry__ as e

    plan = _spark_plan(e.queries()["q_tpch06_revenue_change"](spark, SF_DIR))
    assert "PushedFilters: [" in plan
    # column pruning: the 11-column lineitem scan reads 4 columns
    assert "l_shipdate" in plan.split("ReadSchema")[1][:250]
    assert "l_returnflag" not in plan.split("ReadSchema")[1][:400]
