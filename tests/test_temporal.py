"""As-of and range joins match their SQL oracles and basic invariants
(SURVEY.md §2.3 extension)."""

from tests.conftest import assert_matches_oracle


def test_asof_join_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_events_asof_join")


def test_asof_join_invariants(spark):
    from postgres_s3_etl_spark.operators.temporal import events_asof_join
    from tests.conftest import SF_DIR

    rows = events_asof_join(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r.last_click_ts is not None:
            assert r.last_click_ts <= r.purchase_ts
            assert r.secs_since_click >= 0
        else:
            assert r.secs_since_click is None


def test_range_join_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_events_range_join")


def test_range_join_nonempty(spark):
    from postgres_s3_etl_spark.operators.temporal import events_range_join
    from tests.conftest import SF_DIR

    rows = events_range_join(spark, SF_DIR).collect()
    # Some signup windows must contain purchases (30-day event span vs
    # 7-day window) — a 0-row or all-zero result means the join is wrong.
    assert any(r.n_purchases > 0 for r in rows)
