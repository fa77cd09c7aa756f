"""text_mixture_weights: temperature-scaled training-mix composition
per source."""

from __future__ import annotations

from tests.conftest import assert_matches_oracle


def test_mixture_weights_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_mixture_weights")


def test_mixture_temperature_flattens_the_distribution(spark):
    from postgres_s3_etl_spark.operators.text_analysis import (
        text_mixture_weights,
    )
    from tests.conftest import SF_DIR

    rows = text_mixture_weights(spark, SF_DIR).collect()
    assert rows
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-3
    # α < 1 up-weights small sources and down-weights big ones:
    # epochs > 1 exactly where the source is under-represented.
    smallest = min(rows, key=lambda r: r.n_tokens)
    biggest = max(rows, key=lambda r: r.n_tokens)
    if smallest.n_tokens < biggest.n_tokens:
        assert smallest.epochs > biggest.epochs
        assert smallest.mix_weight > smallest.token_share
        assert biggest.mix_weight < biggest.token_share


def test_lm_perplexity_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_lm_perplexity")


def test_lm_perplexity_scores_every_doc_and_is_positive(spark):
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.text_analysis import (
        text_lm_perplexity,
    )
    from tests.conftest import SF_DIR

    rows = text_lm_perplexity(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert r.n_bigrams >= 1
        assert r.avg_neg_logp > 0.0  # smoothed probs are < 1


def test_langid_f1_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_langid_f1")


def test_langid_f1_metric_identities(spark):
    from postgres_s3_etl_spark.operators.text_analysis import text_langid_f1
    from tests.conftest import SF_DIR

    rows = text_langid_f1(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.tp <= min(r.n_true, r.n_pred) or r.n_pred == 0
        if r.precision is not None and r.recall is not None and r.f1 is not None:
            assert 0.0 <= r.f1 <= 1.0
            # F1 lies between min and max of precision/recall
            assert min(r.precision, r.recall) - 1e-6 <= r.f1 <= max(
                r.precision, r.recall
            ) + 1e-6


def test_ks_drift_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_length_ks_drift")


def test_ks_drift_bounds_and_sanity(spark):
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.text_analysis import (
        text_length_ks_drift,
    )
    from tests.conftest import SF_DIR

    rows = text_length_ks_drift(spark, SF_DIR).collect()
    n_sources = (
        load_table(spark, SF_DIR, "documents")
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_sources
    for r in rows:
        assert 0.0 <= r.ks_stat <= 1.0


def test_chisq_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_orders_chisq_independence")


def test_chisq_nonnegative_and_cells_complete(spark):
    from postgres_s3_etl_spark.operators.analytics import (
        q_orders_chisq_independence,
    )
    from tests.conftest import SF_DIR

    r = q_orders_chisq_independence(spark, SF_DIR).collect()[0]
    assert r.chi_sq >= 0.0
    assert r.n_cells >= 4  # a real contingency table, not a degenerate one


def test_vocab_coverage_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_vocab_coverage")


def test_vocab_coverage_is_monotone_and_bounded(spark):
    from postgres_s3_etl_spark.operators.text_analysis import (
        text_vocab_coverage,
    )
    from tests.conftest import SF_DIR

    rows = text_vocab_coverage(spark, SF_DIR).collect()
    assert rows and rows[-1].coverage <= 1.0
    for a, b in zip(rows, rows[1:]):
        assert b.k > a.k and b.coverage >= a.coverage
    # the corpus vocabulary is tiny (~31 types), so top-30 ≈ everything
    assert rows[-1].coverage > 0.9


def test_hapax_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_hapax_ratio")


def test_hapax_ratios_bounded(spark):
    from postgres_s3_etl_spark.operators.text_analysis import (
        text_hapax_ratio,
    )
    from tests.conftest import SF_DIR

    rows = text_hapax_ratio(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hapax <= r.vocab_size <= r.n_tokens
        assert 0.0 <= r.hapax_ratio <= 1.0
        assert 0.0 < r.type_token_ratio <= 1.0


def test_jsd_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_js_divergence")


def test_jsd_bounds(spark):
    import math

    from postgres_s3_etl_spark.operators.text_analysis import (
        text_js_divergence,
    )
    from tests.conftest import SF_DIR

    rows = text_js_divergence(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r.jsd <= math.log(2) + 1e-9


def test_zipf_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_zipf_fit")


def test_zipf_slope_negative_but_flat_for_word_soup(spark):
    from postgres_s3_etl_spark.operators.text_analysis import text_zipf_fit
    from tests.conftest import SF_DIR

    r = text_zipf_fit(spark, SF_DIR).collect()[0]
    assert r.vocab_size > 10
    # frequency decreases with rank, but this synthetic near-uniform
    # corpus is far flatter than natural text's ~-1
    assert -1.0 < r.zipf_slope < 0.0


def test_charclass_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_charclass_profile")


def test_charclass_shares_partition_unity(spark):
    from postgres_s3_etl_spark.operators.text_analysis import (
        text_charclass_profile,
    )
    from tests.conftest import SF_DIR

    rows = text_charclass_profile(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        total = r.alpha_share + r.digit_share + r.space_share + r.other_share
        assert 1.0 - 5e-6 <= total <= 1.0 + 1e-9  # four floors of slack
