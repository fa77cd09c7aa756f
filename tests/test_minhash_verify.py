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


def test_source_overlap_matches_oracle_zero_path(spark, duck):
    # The synthetic corpus has no cross-source exact dups — both
    # engines must agree on the empty matrix.
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "dedup_source_overlap")


def test_source_overlap_detects_injected_leakage(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="shared leak one", source="web"),
            Row(doc_id=2, text="Shared  Leak one", source="web"),  # not equal (inner ws)
            Row(doc_id=3, text="shared leak one", source="books"),
            Row(doc_id=4, text="  shared leak one ", source="wiki"),  # trims equal
            Row(doc_id=5, text="unique text", source="books"),
        ]
    )
    ds = docs.select(
        F.md5(F.lower(F.trim("text"))).alias("digest"), "source"
    ).distinct()
    a, b = ds.alias("a"), ds.alias("b")
    got = {
        (r.source_a, r.source_b): r.n
        for r in a.join(
            b,
            (F.col("a.digest") == F.col("b.digest"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == {("books", "web"): 1, ("books", "wiki"): 1, ("web", "wiki"): 1}
