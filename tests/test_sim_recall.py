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


def test_matryoshka_eval_matches_oracle(spark, duck):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "embedding_matryoshka_eval")


def test_matryoshka_full_dim_is_identity_and_prefixes_degrade(spark):
    """D=64 must reproduce the exact baseline (recall 1.0); every
    recall is a valid ratio; the shortest prefix can't beat the
    full ranking."""
    from postgres_s3_etl_spark.operators.similarity import (
        embedding_matryoshka_eval,
    )

    rows = {r.dim: r for r in embedding_matryoshka_eval(spark, SF_DIR).collect()}
    assert set(rows) == {8, 16, 32, 64}
    assert rows[64].recall_micro == 1.0
    for r in rows.values():
        assert 0.0 <= r.recall_micro <= 1.0
        assert r.total_found <= r.total_k
    assert rows[8].recall_micro <= rows[64].recall_micro


def test_label_noise_matches_oracle(spark, duck):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "embedding_label_noise")


def test_label_noise_covers_corpus_with_honest_ratios(spark):
    """Every vector with at least one LSH co-bucket neighbor is
    scored; flags never exceed the label's vector count; ratios are
    valid micro-averages."""
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.similarity import (
        embedding_label_noise,
    )

    rows = embedding_label_noise(spark, SF_DIR).collect()
    assert rows
    n_total = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r.n_vecs for r in rows) <= n_total
    assert sum(r.n_vecs for r in rows) >= n_total * 0.9  # buckets dense here
    for r in rows:
        assert 0 <= r.n_flagged <= r.n_vecs
        assert 0 <= r.total_diff <= r.total_k
        assert 0.0 <= r.noise_micro <= 1.0


def test_lsh_tuning_matches_oracle(spark, duck):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "sim_search_lsh_tuning")


def test_lsh_tuning_cost_recall_monotone(spark):
    """More tables (fewer bits each) = coarser buckets = more
    candidates and no-worse recall — the tradeoff the table exists
    to expose."""
    from postgres_s3_etl_spark.operators.similarity import (
        sim_search_lsh_tuning,
    )

    rows = sorted(
        sim_search_lsh_tuning(spark, SF_DIR).collect(),
        key=lambda r: r.n_tables,
    )
    assert [r.n_tables for r in rows] == [2, 4, 8]
    for a, b in zip(rows, rows[1:]):
        assert b.n_candidates >= a.n_candidates
        assert b.recall_micro >= a.recall_micro
    for r in rows:
        assert 0.0 <= r.recall_micro <= 1.0


def test_unit_norm_matches_oracle(spark, duck):
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, duck, "embedding_unit_norm")


def test_unit_norm_arrow_path_equals_sql_fold(spark):
    """The mapInArrow norms must be bit-identical to the engine-side
    sequential aggregate fold (the dim-sequential accumulation is
    what makes that true)."""
    from pyspark.sql import functions as F

    from postgres_s3_etl_spark.operators.similarity import (
        _vecs,
        embedding_unit_norm,
    )

    arrow = {
        r.vec_id: r.norm for r in embedding_unit_norm(spark, SF_DIR).collect()
    }
    import math

    sql = {
        r.vec_id: math.floor(r.norm * 1e6) / 1e6
        for r in _vecs(spark, SF_DIR).select("vec_id", "norm").collect()
    }
    assert arrow == sql and arrow
