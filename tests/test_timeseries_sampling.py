"""Round-3 additions: EWMA / CUSUM (operators/timeseries.py) and
weighted sampling / Bloom decontamination (operators/sampling.py).

Beyond oracle parity, pin the semantic identities the docstrings
claim: the windowed CUSUM equals the max(0, S+y) recurrence, the
Bloom flags are a superset of exact matches, and the weighted
sample is top-k by the Efraimidis–Spirakis priority.
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_DIR, assert_matches_oracle

NEW = [
    "q_events_ewma",
    "q_events_cusum",
    "q_events_holt",
    "text_sample_weighted",
    "text_bloom_decontaminate",
    "q_orders_trend_mannkendall",
    "q_orders_seasonal_index",
]


@pytest.mark.parametrize("name", NEW)
def test_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, name)


def test_cusum_equals_recurrence(spark):
    """S_t = R_t - min(0, min R_i) must equal the sequential
    definition S_t = max(0, S_{t-1} + (x_t - mean)) scaled by n."""
    from postgres_s3_etl_spark.operators.timeseries import q_events_cusum

    rows = q_events_cusum(spark, SF_DIR).collect()
    n_days = len(rows)
    total = sum(r.n for r in rows)
    s = 0
    for r in rows:
        s = max(0, s + n_days * r.n - total)
        assert r.cusum_scaled == s, r
        assert r.is_change == (s > 2 * total)


def test_ewma_matches_direct_formula(spark):
    """Spot-check the 30-term chain against a direct python EWM
    (adjust=True, alpha=.5, truncated lookback)."""
    from postgres_s3_etl_spark.operators.timeseries import (
        EWMA_SPAN,
        q_events_ewma,
    )

    rows = q_events_ewma(spark, SF_DIR).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        for t, r in enumerate(series):
            lo = max(0, t - (EWMA_SPAN - 1))
            xs = [series[t - j].n for j in range(0, t - lo + 1)]
            num = sum(x * 2.0 ** -j for j, x in enumerate(xs))
            den = sum(2.0 ** -j for j in range(len(xs)))
            expect = math.floor(num / den * 1e6) / 1e6
            assert abs(r.ewma - expect) <= 1e-6, (r, expect)


def test_weighted_sample_is_topk_and_biased(spark):
    """Exactly K rows, keys strictly ordered, and the sample's mean
    doc length exceeds the corpus mean (weight = n_chars)."""
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.sampling import (
        SAMPLE_K,
        text_sample_weighted,
    )

    rows = text_sample_weighted(spark, SF_DIR).collect()
    assert len(rows) == min(
        SAMPLE_K, load_table(spark, SF_DIR, "documents").count()
    )
    pris = [r.priority for r in rows]
    assert pris == sorted(pris, reverse=True)
    assert all(p <= 0 for p in pris)  # ln(u)/w, u in (0,1]
    corpus_mean = (
        load_table(spark, SF_DIR, "documents")
        .agg({"n_chars": "avg"})
        .collect()[0][0]
    )
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    assert sample_mean > corpus_mean


def test_bloom_flags_superset_of_exact(spark):
    """No false negatives: per source, n_bloom_flagged >= n_exact;
    and at this geometry the filter flags *something* exact."""
    from postgres_s3_etl_spark.operators.sampling import (
        text_bloom_decontaminate,
    )

    rows = text_bloom_decontaminate(spark, SF_DIR).collect()
    assert rows, "no sources"
    assert all(r.n_bloom_flagged >= r.n_exact for r in rows)
    assert all(r.n_train_docs > 0 for r in rows)


def test_bloom_bitmap_is_broadcast(spark):
    """The corpus probe must join against a broadcast bitmap — the
    corpus side never shuffles."""
    from postgres_s3_etl_spark.operators.sampling import (
        text_bloom_decontaminate,
    )

    plan = (
        text_bloom_decontaminate(spark, SF_DIR)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("strategy=broadcast") >= 2


def test_weighted_sample_plans_take_ordered(spark):
    from postgres_s3_etl_spark.operators.sampling import text_sample_weighted

    plan = (
        text_sample_weighted(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_stl_weekday_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_events_stl_weekday")


def test_stl_reconstruction_identity(spark):
    """Where the trend is defined, n == trend + seasonal + resid
    exactly (the decomposition is residual-defined); edge rows carry
    NULL trend/resid; 3 leading + 3 trailing edges."""
    from postgres_s3_etl_spark.operators.timeseries import (
        q_events_stl_weekday,
    )

    rows = q_events_stl_weekday(spark, SF_DIR).collect()
    assert len(rows) >= 7
    edges = [r for r in rows if r.trend is None]
    assert len(edges) == 6
    for r in rows:
        if r.trend is not None:
            assert r.n == pytest.approx(r.trend + r.seasonal + r.resid)


def test_pq_stats_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "embedding_pq_stats")


def test_pq_assigns_every_vector_in_every_subspace(spark):
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.similarity import (
        PQ_M,
        embedding_pq_stats,
    )

    rows = embedding_pq_stats(spark, SF_DIR).collect()
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    per_sub: dict[int, int] = {}
    for r in rows:
        per_sub[r.subspace] = per_sub.get(r.subspace, 0) + r.n_vectors
        assert r.avg_qdist >= 0
    assert per_sub == {m: n_vecs for m in range(PQ_M)}


def test_dsir_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_dsir_weights")


def test_dsir_prefers_english_like_docs(spark):
    """Sanity on the direction of the weight: every source mixes
    langs, so targets are excluded, but non-target English-script
    sources should not be uniformly negative AND the weight must be
    finite everywhere (add-1 smoothing covers unseen buckets)."""
    from postgres_s3_etl_spark.operators.sampling import text_dsir_weights

    rows = text_dsir_weights(spark, SF_DIR).collect()
    assert rows
    assert all(math.isfinite(r.mean_weight) for r in rows)
    assert all(0 <= r.n_target_like <= r.n_docs for r in rows)


@pytest.mark.parametrize(
    "name", ["q_events_forecast_snaive", "q_orders_interpurchase"]
)
def test_late_timeseries_match_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, name)


def test_snaive_scores_exactly_n_minus_7_days(spark):
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.timeseries import (
        q_events_forecast_snaive,
    )
    from pyspark.sql import functions as F

    n_days = (
        load_table(spark, SF_DIR, "events")
        .select(F.to_date("ts"))
        .distinct()
        .count()
    )
    r = q_events_forecast_snaive(spark, SF_DIR).collect()[0]
    assert r.n_days_scored == max(n_days - 7, 0)
    assert r.mae >= 0 and r.mape >= 0


def test_interpurchase_percentiles_ordered(spark):
    from postgres_s3_etl_spark.operators.timeseries import (
        q_orders_interpurchase,
    )

    for r in q_orders_interpurchase(spark, SF_DIR).collect():
        assert 1 <= r.p50_gap_days <= r.p90_gap_days
        assert r.n_gaps > 0 and r.mean_gap_days > 0


def test_holt_matches_python_recursion(spark):
    """The Spark fold equals an independently-coded Holt recursion
    over the same daily series (guards the fold against engine
    lambda-semantics quirks like DuckDB's sequential field
    rebinding, which produced a silently different recursion)."""
    from pyspark.sql import functions as F

    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.timeseries import (
        HOLT_ALPHA,
        HOLT_BETA,
        q_events_holt,
    )

    daily = sorted(
        (r.day, r.n)
        for r in load_table(spark, SF_DIR, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    ys = [float(n) for _, n in daily]
    s, b, e, k = ys[0], 0.0, 0.0, 0
    for y in ys[1:]:
        e += abs(s + b - y)
        k += 1
        snew = HOLT_ALPHA * y + (1.0 - HOLT_ALPHA) * (s + b)
        b = HOLT_BETA * (snew - s) + (1.0 - HOLT_BETA) * b
        s = snew
    import math

    row = q_events_holt(spark, SF_DIR).collect()[0]
    assert row.n_days == len(ys)
    assert row.level == math.floor(s * 1e6) / 1e6
    assert row.trend == math.floor(b * 1e6) / 1e6
    assert row.mae_1step == math.floor(e / k * 1e6) / 1e6
    assert row.forecast_7d == math.floor((s + 7.0 * b) * 1e6) / 1e6


def test_mannkendall_against_scipy_free_reference(spark):
    """Recompute S, Var(S), z in plain Python from the same monthly
    revenues and compare (the textbook formulas, independently)."""
    import duckdb

    from postgres_s3_etl_spark.operators.timeseries import (
        q_orders_trend_mannkendall,
    )

    got = q_orders_trend_mannkendall(spark, SF_DIR).collect()[0]
    revs = [
        r[0]
        for r in duckdb.sql(
            f"""SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
                FROM '{SF_DIR}/orders.parquet'
                GROUP BY date_trunc('month', o_orderdate)
                ORDER BY date_trunc('month', o_orderdate)"""
        ).fetchall()
    ]
    n = len(revs)
    s_stat = sum(
        (0 < (revs[j] - revs[i])) - ((revs[j] - revs[i]) < 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    assert got.n_months == n
    assert got.s_stat == s_stat
    from collections import Counter

    ties = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(revs).values() if t > 1
    )
    var_s = (n * (n - 1) * (2 * n + 5) - ties) / 18.0
    z = (
        (s_stat - 1) / math.sqrt(var_s)
        if s_stat > 0
        else (s_stat + 1) / math.sqrt(var_s)
        if s_stat < 0
        else 0.0
    )
    assert abs(got.z_score - z) < 1e-5
    assert got.trending == (abs(z) > 1.96)


def test_seasonal_indexes_average_to_one(spark):
    """Weighted by month counts, the indexes must average to exactly
    1 (the multiplicative-decomposition identity)."""
    from postgres_s3_etl_spark.operators.timeseries import (
        q_orders_seasonal_index,
    )

    rows = q_orders_seasonal_index(spark, SF_DIR).collect()
    assert len(rows) == 12
    total_months = sum(r.n_months for r in rows)
    weighted = sum(r.seasonal_index * r.n_months for r in rows)
    assert abs(weighted / total_months - 1.0) < 1e-4
    assert all(r.seasonal_index > 0 for r in rows)
