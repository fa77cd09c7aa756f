"""q_customer_order_streaks (gaps-and-islands) +
q_events_transition_matrix (first-order Markov statistics)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize(
    "name", ["q_customer_order_streaks", "q_events_transition_matrix"]
)
def test_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, name)


def test_streaks_are_contiguous_runs(spark):
    from postgres_s3_etl_spark.operators.analytics import (
        q_customer_order_streaks,
    )

    rows = q_customer_order_streaks(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        span = (r.streak_end - r.streak_start).days + 1
        assert span == r.streak_days >= 2  # dense run, no gaps inside


def test_transition_rows_are_conditional_distributions(spark):
    from postgres_s3_etl_spark.operators.events import (
        q_events_transition_matrix,
    )

    rows = q_events_transition_matrix(spark, SF_DIR).collect()
    assert rows
    by_src: dict[str, float] = {}
    for r in rows:
        assert 0.0 <= r.p <= 1.0
        by_src[r.event_type] = by_src.get(r.event_type, 0.0) + r.p
    # Each row of the matrix is a probability distribution (floored
    # at 1e-6 per cell, so allow that much slack per outgoing edge).
    for src, total in by_src.items():
        assert 1.0 - 1e-4 <= total <= 1.0 + 1e-9, (src, total)


def test_histogram_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_orders_price_histogram")


def test_histogram_partitions_the_corpus(spark):
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.analytics import (
        N_HIST_BINS,
        q_orders_price_histogram,
    )

    rows = q_orders_price_histogram(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= N_HIST_BINS
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert sum(r.n for r in rows) == n_orders  # every row lands in a bin
    assert abs(rows[-1].cum_pct - 100.0) < 1e-3
    for prev, cur in zip(rows, rows[1:]):
        assert cur.cum_pct >= prev.cum_pct
        assert cur.bin_lo >= prev.bin_lo


def test_basket_affinity_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_brand_basket_affinity")


def test_active_users_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_events_active_users")


def test_wau_bounds_dau(spark):
    from postgres_s3_etl_spark.operators.events import q_events_active_users

    rows = q_events_active_users(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.wau >= r.dau >= 1  # a day's actives are weekly-active


def test_keyword_search_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_keyword_search")


def test_keyword_search_is_conjunctive(spark):
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.text_analysis import (
        SEARCH_TERMS,
        text_keyword_search,
    )
    from pyspark.sql import functions as F

    hits = text_keyword_search(spark, SF_DIR).collect()
    assert hits
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    for h in hits:
        toks = docs[h.doc_id].lower().split()
        assert all(t in toks for t in SEARCH_TERMS)


def test_abc_classes_match_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_customer_abc_classes")


def test_abc_pareto_shape(spark):
    from postgres_s3_etl_spark.operators.analytics import (
        q_customer_abc_classes,
    )

    rows = {r.abc_class: r for r in q_customer_abc_classes(spark, SF_DIR).collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    assert abs(sum(r.rev_share for r in rows.values()) - 1.0) < 1e-3
    if "C" in rows:  # the Pareto asymmetry: A's revenue per customer dominates
        a, c = rows["A"], rows["C"]
        assert a.revenue / a.n_customers > c.revenue / c.n_customers


def test_funnel_latency_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_events_funnel_latency")


def test_funnel_latency_ordering(spark):
    from postgres_s3_etl_spark.operators.events import q_events_funnel_latency

    r = q_events_funnel_latency(spark, SF_DIR).collect()[0]
    assert r.n_converted > 0
    assert r.min_s <= r.median_s <= r.p90_s <= r.max_s


def test_yoy_growth_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_orders_yoy_growth")


def test_bot_detection_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_events_bot_detection")


def test_bot_flags_consistent_with_stats(spark):
    from postgres_s3_etl_spark.operators.events import q_events_bot_detection

    rows = q_events_bot_detection(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_gaps >= 5
        assert r.mean_gap_s > 0 and r.gap_cv >= 0
        # flags derive from the un-truncated stats; the truncated
        # columns must agree except within the 1e-4 truncation band
        if r.mean_gap_s < 1800 - 1:
            assert r.is_rate_bot
        if r.mean_gap_s > 1800:
            assert not r.is_rate_bot


def test_skyline_matches_quadratic_oracle(spark, duck):
    # The oracle is the O(n²) NOT-EXISTS dominance definition — a
    # structurally different derivation than the window scan.
    assert_matches_oracle(spark, duck, "q_part_skyline")


def test_skyline_is_mutually_nondominating(spark):
    from postgres_s3_etl_spark.operators.analytics import q_part_skyline

    rows = q_part_skyline(spark, SF_DIR).collect()
    assert rows
    for p in rows:
        for q in rows:
            if p.p_partkey == q.p_partkey:
                continue
            dominates = (
                q.price <= p.price
                and q.size >= p.size
                and (q.price < p.price or q.size > p.size)
            )
            assert not dominates, (p, q)
    # the frontier is monotone: sorted by price, sizes strictly rise
    # (modulo exact ties on both dimensions, which co-survive)
    by_price = sorted(rows, key=lambda r: (r.price, -r.size))
    for a, b in zip(by_price, by_price[1:]):
        if a.price != b.price:
            assert b.size > a.size


def test_backlog_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_orders_open_backlog")


def test_backlog_equals_direct_containment_count(spark):
    """Independent derivation: on sampled days, the sweep-line count
    must equal a direct 'interval contains day' count."""
    from pyspark.sql import functions as F

    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.analytics import (
        q_orders_open_backlog,
    )

    rows = q_orders_open_backlog(spark, SF_DIR).collect()
    assert rows
    orders = load_table(spark, SF_DIR, "orders")
    closes = (
        load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("close_day"))
    )
    iv = orders.join(
        closes, orders.o_orderkey == closes.l_orderkey
    ).select(
        F.to_date("o_orderdate").alias("open_day"),
        F.greatest("close_day", F.to_date("o_orderdate")).alias("close_day"),
    )
    for r in rows[:: max(len(rows) // 7, 1)]:  # ~8 sampled days
        direct = iv.where(
            (F.col("open_day") <= F.lit(r.day))
            & (F.col("close_day") >= F.lit(r.day))
        ).count()
        assert direct == r.open_orders, (r.day, direct, r.open_orders)


def test_top_paths_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_events_top_paths")


def test_brand_coverage_matches_double_negation_oracle(spark, duck):
    # Oracle is the classic double-NOT-EXISTS division; Spark is the
    # count-match rollup — the gate cross-checks the rewrite.
    assert_matches_oracle(spark, duck, "q_supplier_brand_coverage")


def test_brand_coverage_is_genuinely_total(spark):
    from pyspark.sql import functions as F

    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.analytics import (
        q_supplier_brand_coverage,
    )

    rows = q_supplier_brand_coverage(spark, SF_DIR).collect()
    n_brands = (
        load_table(spark, SF_DIR, "part").select("p_brand").distinct().count()
    )
    for r in rows:
        assert r.n_brands == n_brands


def test_winsorized_stats_match_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_orders_winsorized_stats")


def test_winsorizing_pulls_the_mean_inward(spark):
    from postgres_s3_etl_spark.operators.analytics import (
        q_orders_winsorized_stats,
    )

    r = q_orders_winsorized_stats(spark, SF_DIR).collect()[0]
    assert r.p05 < r.p95
    assert r.n_clamped > 0  # a long-tailed price column clamps some rows
    assert r.n_clamped < r.n_orders * 0.15
    # clamping a right-skewed distribution moves the mean, and the
    # winsorized mean stays inside the clamping band
    assert r.mean_raw != r.mean_winsorized
    assert r.p05 <= r.mean_winsorized <= r.p95


def test_attr_entropy_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_part_attr_entropy")


def test_attr_entropy_bounds(spark):
    import math

    from postgres_s3_etl_spark.operators.analytics import q_part_attr_entropy

    rows = {r.col: r for r in q_part_attr_entropy(spark, SF_DIR).collect()}
    assert set(rows) == {"p_brand", "p_type", "p_size"}
    for r in rows.values():
        assert 0.0 <= r.entropy_nats <= math.log(r.n_values) + 1e-9


def test_velocity_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_events_velocity")


def test_velocity_counts_include_self_and_only_lookback(spark):
    from pyspark.sql import functions as F

    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.events import q_events_velocity

    rows = q_events_velocity(spark, SF_DIR).collect()
    assert rows
    assert all(r.n_events_1h >= 1 for r in rows)  # the purchase itself
    # Spot-check one purchase against a direct count.
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "secs", F.col("ts").cast("timestamp").cast("long")
    )
    sample = rows[len(rows) // 2]
    p = ev.where(F.col("event_id") == sample.event_id).collect()[0]
    # mirror the frame's second granularity (the RANGE runs over
    # truncated epoch seconds, not full-precision timestamps)
    direct = ev.where(
        (F.col("user_id") == sample.user_id)
        & (F.col("secs") <= p.secs)
        & (F.col("secs") >= p.secs - 3600)
    ).count()
    assert direct == sample.n_events_1h


def test_autocorr_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_events_autocorr")


def test_autocorr_values_in_range(spark):
    from postgres_s3_etl_spark.operators.events import q_events_autocorr

    rows = {r.lag: r for r in q_events_autocorr(spark, SF_DIR).collect()}
    assert set(rows) == {1, 7}
    for r in rows.values():
        assert -1.0 <= r.autocorr <= 1.0
        assert r.n_pairs > 10


def test_hhi_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_nation_supplier_hhi")


def test_hhi_bounds(spark):
    from postgres_s3_etl_spark.operators.events import q_events_autocorr  # noqa: F401
    from postgres_s3_etl_spark.operators.analytics import (
        q_nation_supplier_hhi,
    )

    rows = q_nation_supplier_hhi(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r.hhi is not None:
            # 1/n (even) <= HHI <= 1 (monopoly), modulo 1e-6 truncation
            assert 1.0 / r.n_suppliers - 1e-6 <= r.hhi <= 1.0 + 1e-9


def test_gini_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_customer_revenue_gini")


def test_gini_in_unit_interval_and_nontrivial(spark):
    from postgres_s3_etl_spark.operators.analytics import (
        q_customer_revenue_gini,
    )

    r = q_customer_revenue_gini(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.gini < 1.0
    assert r.gini > 0.01  # real revenue is never perfectly equal


def test_heatmap_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_events_dow_hour_heatmap")


def test_heatmap_covers_the_full_grid(spark):
    from postgres_s3_etl_spark.operators.events import (
        q_events_dow_hour_heatmap,
    )

    rows = q_events_dow_hour_heatmap(spark, SF_DIR).collect()
    assert {(r.iso_dow, r.hour) for r in rows} <= {
        (d, h) for d in range(1, 8) for h in range(24)
    }
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3


def test_gains_curve_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_customer_gains_curve")


def test_gains_curve_shape(spark):
    from postgres_s3_etl_spark.operators.analytics import (
        q_customer_gains_curve,
    )

    rows = q_customer_gains_curve(spark, SF_DIR).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    assert abs(rows[-1].cum_share - 1.0) < 1e-3
    assert abs(rows[-1].lift - 1.0) < 1e-3  # full population = no lift
    for a, b in zip(rows, rows[1:]):
        assert b.cum_share >= a.cum_share
        assert b.rev_share <= a.rev_share + 1e-6  # deciles ranked by revenue
    assert rows[0].lift > 1.0  # the top decile beats random targeting


def test_first_touch_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_events_first_touch")


def test_first_touch_conserves_purchases(spark):
    from pyspark.sql import functions as F

    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.events import q_events_first_touch

    rows = q_events_first_touch(spark, SF_DIR).collect()
    n_purchases = (
        load_table(spark, SF_DIR, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r.n_purchases for r in rows) == n_purchases


def test_value_migration_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_customer_value_migration")


def test_value_migration_conserves_customers(spark):
    from pyspark.sql import functions as F

    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.analytics import (
        q_customer_value_migration,
    )

    rows = q_customer_value_migration(spark, SF_DIR).collect()
    total = sum(r.n_customers for r in rows)
    n_cust = (
        load_table(spark, SF_DIR, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert total == n_cust  # full outer loses nobody
    assert not any(r.seg_before == 0 and r.seg_after == 0 for r in rows)


def test_mad_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_orders_mad_outliers")


def test_mad_robust_band_sane(spark):
    from postgres_s3_etl_spark.operators.analytics import (
        q_orders_mad_outliers,
    )

    r = q_orders_mad_outliers(spark, SF_DIR).collect()[0]
    assert r.mad > 0
    assert 0 <= r.n_outliers < r.n_orders * 0.1  # a band, not a sieve


def test_new_vs_returning_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_orders_new_vs_returning")


def test_new_vs_returning_accounting(spark):
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.analytics import (
        q_orders_new_vs_returning,
    )

    rows = q_orders_new_vs_returning(spark, SF_DIR).collect()
    assert rows
    orders = load_table(spark, SF_DIR, "orders")
    assert sum(r.n_orders for r in rows) == orders.count()
    # every customer is new exactly once... in their first month: the
    # sum of new-order counts ≥ distinct customers (a customer may
    # place several orders in their first month), and the first
    # observed month is all-new.
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r.n_new for r in rows) >= n_cust
    assert rows[0].n_new == rows[0].n_orders
    for r in rows:
        assert r.n_new + r.n_returning == r.n_orders


def test_ship_sla_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_priority_ship_sla")


def test_ship_sla_percentiles_ordered(spark):
    from postgres_s3_etl_spark.operators.analytics import q_priority_ship_sla

    rows = q_priority_ship_sla(spark, SF_DIR).collect()
    assert len(rows) == 5  # the five priorities
    for r in rows:
        assert r.p50_days <= r.p95_days
        assert 0.0 <= r.breach_rate_30d <= 1.0


def test_weekday_effect_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_orders_weekday_effect")


def test_weekday_effect_partition_of_unity(spark):
    from postgres_s3_etl_spark.operators.analytics import (
        q_orders_weekday_effect,
    )

    rows = q_orders_weekday_effect(spark, SF_DIR).collect()
    assert {r.iso_dow for r in rows} <= set(range(1, 8))
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r.uniform_index - r.share * 7) < 1e-4
