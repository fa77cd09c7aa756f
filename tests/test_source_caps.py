"""text_source_caps: per-source doc/token cap keep-set by quality
rank (C4/RefinedWeb-style anti-domination funnel)."""

from __future__ import annotations

from tests.conftest import SF_DIR_ORACLE, assert_matches_oracle


def test_source_caps_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_source_caps")


def test_caps_are_respected_on_real_data(spark):
    from postgres_s3_etl_spark.operators.text_analysis import (
        CAP_DOCS_PER_SOURCE,
        CAP_TOKENS_PER_SOURCE,
        text_source_caps,
    )

    rows = text_source_caps(spark, SF_DIR_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.n_kept <= CAP_DOCS_PER_SOURCE
        assert r.tokens_kept <= CAP_TOKENS_PER_SOURCE
        assert (
            r.n_kept + r.n_dropped_doc_cap + r.n_dropped_token_cap
            == r.n_docs
        )
        assert r.tokens_kept <= r.tokens_total
    # the caps must actually bite somewhere at sf0.01, or the test
    # proves nothing
    assert any(r.n_dropped_doc_cap > 0 for r in rows)
    assert any(r.n_dropped_token_cap > 0 for r in rows)


def test_funnel_on_designed_corpus(spark, monkeypatch):
    """20 docs of exactly 100 tokens each, quality strictly increasing
    with doc_id (more stopwords): the keep-set must be the top-6 by
    rank (6 x 100 = 600 = token budget), ranks 7-15 die on the token
    budget, ranks 16-20 on the doc cap."""
    import postgres_s3_etl_spark.operators.text_analysis as ta

    docs = []
    for i in range(20):
        # i+1 stopwords ("the"), rest filler -> logit increases with i
        words = ["the"] * (i + 1) + [f"w{j}" for j in range(100 - i - 1)]
        docs.append((i, "s", " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    monkeypatch.setattr(ta, "load_table", lambda spark, sf_dir, name: df)
    [r] = ta.text_source_caps(spark, "ignored").collect()
    assert r.n_docs == 20
    assert r.n_kept == 6
    assert r.n_dropped_token_cap == 9
    assert r.n_dropped_doc_cap == 5
    assert r.tokens_kept == 600
    assert r.tokens_total == 2000
