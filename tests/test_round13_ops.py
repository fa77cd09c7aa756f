"""Round-13 operators: per-(tokenizer, lang) fertility, join-skew
report, Z-order layout experiment, block-matching motion estimation.
Oracle-parity gates plus semantics pins."""

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


def test_join_skew_report_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_join_skew_report")


def test_join_skew_report_semantics(spark):
    rows = e.queries()["q_join_skew_report"](spark, SF_DIR).collect()
    assert [r.key_name for r in rows] == [
        "events.user_id", "lineitem.l_partkey", "orders.o_custkey"
    ]
    for r in rows:
        assert r.n_keys <= r.n_rows
        # top-10 can't be less concentrated than top-1, nor exceed 1.
        assert 0 < r.top1_share <= r.top10_share <= 1.0 + 1e-9
        assert r.salt_factor >= 1
        # ceiling identity: salt = ceil(max_cnt / (n_rows / 32)).
        assert r.salt_factor == -((-r.max_cnt * 32) // r.n_rows)


def test_zorder_pruning_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "layout_zorder_pruning")


def test_zorder_beats_linear_on_2d_workload(spark):
    """The whole point of the experiment: on a 2-dimensional range
    workload over independently-distributed columns, Z-order must
    scan fewer files than the date-sorted layout."""
    rows = {
        r.layout: r
        for r in e.queries()["layout_zorder_pruning"](
            spark, SF_DIR
        ).collect()
    }
    assert set(rows) == {"linear", "zorder"}
    for r in rows.values():
        assert r.n_files == 64 and r.n_predicates == 80
        assert 0 < r.scan_fraction <= 1.0
    assert (
        rows["zorder"].avg_files_scanned
        < rows["linear"].avg_files_scanned
    )


def test_motion_estimate_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "mm_video_motion_estimate")


def test_motion_estimate_recovers_true_vector(spark):
    """The feed translates by (2, 1)/frame with wraparound, so every
    block's vector is exactly (-2, -1) at SAD 0, and the cross-term
    texture guarantees a strictly positive runner-up."""
    rows = e.queries()["mm_video_motion_estimate"](
        spark, SF_DIR
    ).collect()
    from postgres_s3_etl_spark.operators.multimodal import (
        MOTION_FRAMES,
        N_MOTION_ASSETS,
    )

    assert len(rows) == N_MOTION_ASSETS * (MOTION_FRAMES - 1) * 4
    for r in rows:
        assert (r.mv_dx, r.mv_dy) == (-2, -1)
        assert r.best_sad == 0 < r.second_sad


def test_motion_encoder_decodes_via_real_container(spark):
    """encode_y4m_motion emits genuine YUV4MPEG2 the existing real
    decoder parses; luma matches the closed form."""
    import numpy as np

    from postgres_s3_etl_spark.operators.multimodal import (
        MOTION_H,
        MOTION_MVX,
        MOTION_MVY,
        MOTION_W,
        _motion_pattern,
        decode_y4m,
        encode_y4m_motion,
    )

    w, h, frames = decode_y4m(encode_y4m_motion(3))
    assert (w, h) == (MOTION_W, MOTION_H)
    x = np.arange(w).reshape(1, w)
    y = np.arange(h).reshape(h, 1)
    for t, f in enumerate(frames):
        exp = _motion_pattern(
            3, (x - MOTION_MVX * t) % w, (y - MOTION_MVY * t) % h
        )
        assert (f[0] == exp).all()
        assert (f[1] == 128).all() and (f[2] == 128).all()


def test_participation_ratio_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "embedding_participation_ratio")


def test_participation_ratio_matches_numpy_eigenvalues(spark):
    """Independent verification: PR computed from the actual
    covariance eigenvalues (numpy eigh) must equal the trace/
    Frobenius identity the operator uses."""
    import numpy as np

    r = (
        e.queries()["embedding_participation_ratio"](spark, SF_DIR)
        .collect()[0]
    )
    emb = np.array(
        [
            row.embedding
            for row in spark.read.parquet(
                f"{SF_DIR}/embeddings.parquet"
            ).collect()
        ],
        dtype=np.float64,
    )
    lam = np.linalg.eigvalsh(np.cov(emb, rowvar=False, ddof=1))
    pr = lam.sum() ** 2 / (lam**2).sum()
    assert r.d == emb.shape[1]
    assert abs(r.participation_ratio - pr) < 1e-4
    assert 1.0 <= r.participation_ratio <= r.d
    assert abs(r.pr_over_d - r.participation_ratio / r.d) < 1e-5
