"""sim_search_recall: ANN recall@k evaluation as a first-class
operator (LSH hit set vs exact top-k)."""

from __future__ import annotations

from tests.conftest import SF_DIR, assert_matches_oracle


def test_sim_recall_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "sim_search_recall")


def test_recall_values_are_sane(spark):
    from postgres_s3_etl_spark.operators.similarity import (
        N_PROBES,
        TOP_K,
        sim_search_recall,
    )

    rows = sim_search_recall(spark, SF_DIR).collect()
    assert len(rows) == N_PROBES
    for r in rows:
        assert r.k == TOP_K
        assert 0 <= r.found <= r.k
        assert 0.0 <= r.recall <= 1.0
    mean = sum(r.recall for r in rows) / len(rows)
    # Same floor test_lsh_recall_vs_bruteforce holds the bucketing to
    # at this tiny SF (100 random vectors → sparse buckets).
    assert mean >= 0.3, f"mean recall {mean}"
