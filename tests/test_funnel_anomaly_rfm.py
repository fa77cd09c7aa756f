"""Ordered funnel, daily anomaly z-scores, RFM segmentation."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_matches_oracle


def test_funnel_ordered_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_events_funnel_ordered")


def test_anomaly_days_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_events_anomaly_days")


def test_rfm_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_customer_rfm")


def test_ordered_funnel_is_monotone_and_stricter(spark):
    """Stage counts shrink down the funnel, and the strict-order
    counts can never exceed the any-order funnel's counts."""
    from postgres_s3_etl_spark.operators.events import (
        q_events_funnel,
        q_events_funnel_ordered,
    )

    o = q_events_funnel_ordered(spark, SF_DIR).collect()[0]
    assert o.n_signup >= o.n_ordered_click >= o.n_ordered_purchase
    u = q_events_funnel(spark, SF_DIR).collect()[0]
    assert o.n_ordered_click <= u.n_signup_click
    assert o.n_ordered_purchase <= u.n_signup_click_purchase


def test_anomaly_zscores_center_on_zero(spark):
    """Per event type, z-scores must sum to ~0 (definition of z) and
    every (type, day) appears exactly once."""
    from postgres_s3_etl_spark.operators.events import q_events_anomaly_days

    rows = q_events_anomaly_days(spark, SF_DIR).collect()
    per_type: dict[str, list[float]] = {}
    for r in rows:
        per_type.setdefault(r.event_type, []).append(r.z)
    for t, zs in per_type.items():
        assert abs(sum(zs)) / len(zs) < 1e-3, t
    assert len({(r.event_type, r.day) for r in rows}) == len(rows)


def test_rfm_scores_and_segment_encoding(spark):
    from postgres_s3_etl_spark.operators.analytics import q_customer_rfm

    rows = q_customer_rfm(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
        assert r.segment == r.r_score * 100 + r.f_score * 10 + r.m_score
        assert r.frequency >= 1 and r.monetary > 0


def test_percentiles_disc_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_percentiles_disc")


def test_lineitem_corr_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_lineitem_corr")


def test_unpivot_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_lineitem_unpivot")


def test_corr_within_bounds_and_disc_values_are_table_values(spark):
    from postgres_s3_etl_spark.operators.analytics import (
        q_lineitem_corr,
        q_percentiles_disc,
    )
    from postgres_s3_etl_spark.catalog import load_table

    for r in q_lineitem_corr(spark, SF_DIR).collect():
        assert -1.0 <= r.corr_qty_price <= 1.0
    prices = {
        round(p, 2)
        for (p,) in load_table(spark, SF_DIR, "orders")
        .select(F.round(F.col("o_totalprice").cast("decimal(18,2)").cast("double"), 2))
        .collect()
    }
    for r in q_percentiles_disc(spark, SF_DIR).collect():
        # discrete percentiles are actual data values, never interpolated
        assert {r.p25, r.p50, r.p75, r.p90} <= prices


def test_ushape_attribution_credits_sum_to_10000_per_converter(spark):
    """Every user with >=1 pre-conversion touch contributes exactly
    10000 bp of credit; users without touches contribute 0."""
    from pyspark.sql import functions as F

    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.events import (
        q_events_attribution_ushape,
    )

    rows = q_events_attribution_ushape(spark, SF_DIR).collect()
    total = sum(r.credit_bp for r in rows)
    ev = load_table(spark, SF_DIR, "events")
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    n_credited = (
        ev.where(F.col("event_type") != "purchase")
        .join(conv, "user_id")
        .where(F.col("ts") < F.col("conv_ts"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert total == 10000 * n_credited


def test_spectral_peaks_match_numpy(spark):
    """Independent NumPy recomputation of the single-frequency DFT
    powers from the same hourly counts."""
    import math

    import duckdb
    import numpy as np

    from postgres_s3_etl_spark.operators.events import (
        SPECTRAL_PERIODS,
        q_events_spectral_peaks,
    )
    from tests.conftest import SF_DIR

    got = {
        r.period_hours: r.power
        for r in q_events_spectral_peaks(spark, SF_DIR).collect()
    }
    assert set(got) == set(SPECTRAL_PERIODS)
    rows = duckdb.sql(
        f"""SELECT date_diff('hour', (SELECT MIN(date_trunc('hour', ts))
                                      FROM '{SF_DIR}/events.parquet'),
                             date_trunc('hour', ts)) AS t, COUNT(*) AS x
            FROM '{SF_DIR}/events.parquet'
            GROUP BY date_trunc('hour', ts)"""
    ).fetchall()
    t = np.array([r[0] for r in rows], dtype=np.float64)
    x = np.array([r[1] for r in rows], dtype=np.float64)
    for p in SPECTRAL_PERIODS:
        ph = 2.0 * math.pi * np.mod(t, p) / p
        a, b = (x * np.cos(ph)).sum(), (x * np.sin(ph)).sum()
        power = (a * a + b * b) / len(t) ** 2
        assert got[p] >= 0
        assert abs(got[p] - power) < 1e-4 * max(1.0, power), (p, got[p], power)


def test_wilson_intervals_bracket_shares(spark):
    """Wilson bounds must bracket each share inside [0,1], shares sum
    to 1, and the interval matches an independent recomputation."""
    import math

    from postgres_s3_etl_spark.operators.events import (
        WILSON_Z,
        q_events_share_wilson,
    )
    from tests.conftest import SF_DIR

    rows = q_events_share_wilson(spark, SF_DIR).collect()
    assert rows
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    z = WILSON_Z
    for r in rows:
        assert 0.0 <= r.wilson_lo <= r.share <= r.wilson_hi <= 1.0
        p, n = r.k / r.n, r.n
        denom = 1 + z * z / n
        center = (p + z * z / (2 * n)) / denom
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
        assert abs(r.wilson_lo - max(0.0, center - half)) < 1e-5
        assert abs(r.wilson_hi - min(1.0, center + half)) < 1e-5
