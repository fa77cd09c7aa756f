"""dedup_minhash_verify: the candidate→verify two-stage fuzzy-dedup
pipeline as one operator."""

from __future__ import annotations

from tests.conftest import SF_DIR, assert_matches_oracle


def test_minhash_verify_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "dedup_minhash_verify")


def test_verify_stage_scores_exactly_the_candidate_set(spark):
    from postgres_s3_etl_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_minhash_verify,
    )

    from postgres_s3_etl_spark.operators.dedup import TOP_PAIRS

    cands = {
        (r.doc_a, r.doc_b): r.n_shared_bands
        for r in dedup_minhash_lsh(spark, SF_DIR).collect()
    }
    verified = dedup_minhash_verify(spark, SF_DIR).collect()
    # verify scores the top-TOP_PAIRS slice of the same ranked
    # candidate list the LSH query emits (lsh itself returns top-50).
    assert len(verified) == TOP_PAIRS
    assert {(r.doc_a, r.doc_b) for r in verified} <= set(cands)
    for r in verified:
        assert r.n_shared_bands == cands[(r.doc_a, r.doc_b)]
        assert 0.0 <= r.jaccard <= 1.0
        assert r.is_dup == (r.jaccard >= 0.8)
