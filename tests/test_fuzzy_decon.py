"""text_decontaminate_fuzzy: doc-level MinHash near-dup vs the eval
split, verified with exact shingle Jaccard — catches the paraphrase
contamination the exact 8-gram test provably misses."""

from __future__ import annotations

from tests.conftest import assert_matches_oracle


def _eval_words() -> list[str]:
    return [f"tok{i}" for i in range(40)]


def _paraphrase(words: list[str]) -> list[str]:
    """Substitute every 8th word: the longest unchanged run is 7
    tokens, so NO 8-gram survives — exact decon is blind by
    construction — while ~half the 3-gram shingles survive."""
    out = list(words)
    for i in range(7, len(out), 8):
        out[i] = f"sub{i}"
    return out


def test_planted_paraphrase_defeats_exact_but_not_fuzzy():
    """Pin the premise in pure Python before trusting the operator:
    zero shared 8-grams, shingle Jaccard in [0.4, 0.5)."""
    ev, para = _eval_words(), _paraphrase(_eval_words())
    g = lambda w: {" ".join(w[i : i + 8]) for i in range(len(w) - 7)}  # noqa: E731
    assert not (g(ev) & g(para))
    sh = lambda w: {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}  # noqa: E731
    j = len(sh(ev) & sh(para)) / len(sh(ev) | sh(para))
    assert 0.4 <= j < 0.5, j


def test_fuzzy_decon_frame_verdicts(spark):
    from postgres_s3_etl_spark.operators.text_analysis import (
        fuzzy_decon_frame,
    )

    ev = " ".join(_eval_words())
    para = " ".join(_paraphrase(_eval_words()))
    unrelated = " ".join(f"other{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (0, "srcE", ev),          # doc_id % 50 == 0 -> eval
            (1, "srcA", para),        # paraphrase: fuzzy-only
            (2, "srcA", ev),          # verbatim copy: exact + fuzzy
            (3, "srcB", unrelated),   # clean
        ],
        "doc_id long, source string, text string",
    )
    rows = {r.doc_id: r for r in fuzzy_decon_frame(docs).collect()}
    assert set(rows) == {1, 2, 3}
    assert not rows[1].exact_hit and rows[1].fuzzy_hit, rows[1]
    assert rows[2].exact_hit and rows[2].fuzzy_hit, rows[2]
    assert not rows[3].exact_hit and not rows[3].fuzzy_hit, rows[3]
    assert rows[1].n_tokens == 40


def test_fuzzy_decon_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_decontaminate_fuzzy")


def test_rollup_counts_fuzzy_only_and_tokens(spark, monkeypatch, tmp_path):
    """The per-source funnel separates fuzzy-only mass (what an
    exact-only pipeline would miss) and accounts its tokens."""
    import postgres_s3_etl_spark.operators.text_analysis as ta

    ev = " ".join(_eval_words())
    para = " ".join(_paraphrase(_eval_words()))
    docs = spark.createDataFrame(
        [(0, "srcE", ev), (1, "srcA", para), (3, "srcB", "x y z a b c")],
        "doc_id long, source string, text string",
    )
    monkeypatch.setattr(
        ta, "load_table", lambda spark, sf_dir, name: docs
    )
    out = {r.source: r for r in ta.text_decontaminate_fuzzy(spark, "ignored").collect()}
    a = out["srcA"]
    assert (a.n_exact, a.n_fuzzy, a.n_fuzzy_only) == (0, 1, 1)
    assert a.n_tokens_contaminated == 40
    b = out["srcB"]
    assert (b.n_fuzzy, b.n_tokens_contaminated) == (0, 0)
