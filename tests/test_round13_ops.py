"""Round-13 operators: per-(tokenizer, lang) fertility. Oracle-parity
gate plus semantics pins (char fertility = chars/word, bpe <= char,
piece_share sums to 1 within each tokenizer)."""

from __future__ import annotations

import math

import __spark_entry__ as e
from tests.conftest import SF_DIR, assert_matches_oracle


def test_fertility_by_lang_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_fertility_by_lang")


def test_fertility_by_lang_semantics(spark):
    rows = e.queries()["text_fertility_by_lang"](spark, SF_DIR).collect()
    by_tok: dict[str, list] = {}
    for r in rows:
        by_tok.setdefault(r.tokenizer, []).append(r)
    assert set(by_tok) == {"bpe", "char"}
    langs = sorted(r.lang for r in by_tok["bpe"])
    assert langs == sorted(r.lang for r in by_tok["char"])
    char_by_lang = {r.lang: r for r in by_tok["char"]}
    for r in by_tok["bpe"]:
        c = char_by_lang[r.lang]
        # BPE with char fallback can never emit MORE pieces than the
        # char baseline, and both pay at least one piece per word.
        assert 1.0 <= r.fertility <= c.fertility + 1e-9
        assert r.n_words == c.n_words
        # char baseline: pieces ARE chars, so chars_per_piece = 1.
        assert abs(c.chars_per_piece - 1.0) < 1e-6
    for tok, grp in by_tok.items():
        total = sum(r.piece_share for r in grp)
        # floor-truncation at 1e-6 per row: allow len(grp) ulps low.
        assert 1.0 - len(grp) * 1e-6 <= total <= 1.0 + 1e-9, tok
        assert all(
            math.isfinite(r.piece_share) and r.piece_share > 0
            for r in grp
        )
