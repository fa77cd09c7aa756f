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


def test_watermark_detect_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_watermark_detect")


def test_watermark_clean_corpus_sits_at_chance(spark):
    """Natural (non-watermarked) text must read green_frac ~ 0.5 and
    essentially no flags — the audit's pass state."""
    rows = e.queries()["text_watermark_detect"](spark, SF_DIR).collect()
    total_tokens = sum(r.n_tokens for r in rows)
    total_docs = sum(r.n_docs for r in rows)
    green = sum(r.green_frac * r.n_tokens for r in rows) / total_tokens
    assert 0.4 < green < 0.6
    # z > 4 is a ~3e-5 event per doc under H0.
    assert sum(r.n_flagged for r in rows) <= max(1, total_docs // 1000)


def test_watermark_green_rule_matches_python_hashlib(spark):
    """Third-engine pin: the Spark green rule (first md5 hex nibble
    <= '7' under the audit key) must agree with Python's hashlib on
    real corpus tokens, and a deliberately all-green token stream
    must score z > 4 under the same formula."""
    import hashlib

    from pyspark.sql import functions as F

    from postgres_s3_etl_spark.operators.text_analysis import (
        WATERMARK_KEY,
    )

    toks = [f"tok{i}" for i in range(300)]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {
        r.tok: r.g
        for r in df.select(
            "tok",
            (
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(WATERMARK_KEY), F.col("tok")
                        ).cast("binary")
                    ),
                    1,
                    1,
                )
                <= "7"
            ).alias("g"),
        ).collect()
    }
    greens = []
    for t in toks:
        h = hashlib.md5((WATERMARK_KEY + t).encode()).hexdigest()
        assert got[t] == (h[0] <= "7"), t
        if h[0] <= "7":
            greens.append(t)
    # A watermarked generator emitting only green tokens: z = sqrt(n).
    n = len(greens)
    assert n >= 100  # ~half of 300
    z = (2 * n - n) / n**0.5
    assert z > 4.0


def test_markov_attribution_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_events_markov_attribution")


def test_markov_attribution_semantics(spark):
    rows = e.queries()["q_events_markov_attribution"](
        spark, SF_DIR
    ).collect()
    assert [r.channel for r in rows] == ["click", "error", "signup", "view"]
    p_full = rows[0].p_full
    assert all(r.p_full == p_full for r in rows)
    assert 0 < p_full <= 1
    for r in rows:
        # Removal redirects paths into NULL: absorption probability
        # can only drop, so effects live in [0, 1].
        assert 0 <= r.p_removed <= r.p_full + 1e-9
        assert 0 <= r.removal_effect <= 1
        assert r.n_touch > 0
    share = sum(r.attribution_share for r in rows)
    assert abs(share - 1.0) < 1e-4


def test_markov_attribution_planted_chain(spark):
    """Hand-built journeys where only 'click' ever leads to CONV:
    removing click must zero the conversion probability (removal
    effect 1), while the never-converting channel gets effect ~0."""
    import datetime as dt

    from postgres_s3_etl_spark.operators import events as evmod

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def ev(uid, typ, k):
        nonlocal eid
        eid += 1
        return (eid, base + dt.timedelta(minutes=k), uid, typ, 1.0, "{}")

    # 10 users: view -> click -> purchase ; 10 users: view -> (end)
    for u in range(10):
        rows += [ev(u, "view", 0), ev(u, "click", 1), ev(u, "purchase", 2)]
    for u in range(10, 20):
        rows += [ev(u, "view", 0)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(f"{d}/events.parquet")
        out = {
            r.channel: r
            for r in evmod.q_events_markov_attribution(spark, d).collect()
        }
    # Full chain: START->view (p=1), view->click .5 / view->NULL .5,
    # click->CONV 1  =>  p_full = 0.5.
    assert abs(out["click"].p_full - 0.5) < 1e-6
    # Removing click severs every converting path.
    assert out["click"].p_removed == 0.0
    assert abs(out["click"].removal_effect - 1.0) < 1e-6
    # view is on every path too: removing it also zeroes conversion.
    assert abs(out["view"].removal_effect - 1.0) < 1e-6
    # channels absent from the data get no credit.
    assert out["error"].removal_effect == 0.0
    assert out["signup"].removal_effect == 0.0


def test_ivf_imbalance_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "sim_search_ivf_imbalance")


def test_ivf_imbalance_semantics(spark):
    rows = e.queries()["sim_search_ivf_imbalance"](
        spark, SF_DIR
    ).collect()
    from postgres_s3_etl_spark.operators.similarity import IVF_CELLS

    assert len(rows) <= IVF_CELLS
    shares = [r.share for r in rows]
    assert abs(sum(shares) - 1.0) < len(rows) * 1e-6 + 1e-9
    imb = rows[0].imbalance_factor
    assert all(r.imbalance_factor == imb for r in rows)
    # Cauchy-Schwarz: cells * sum(share^2) >= 1, = 1 iff balanced.
    assert imb >= 1.0 - 1e-6
    # And it equals the definition recomputed from the shares.
    approx = IVF_CELLS * sum(s * s for s in shares)
    assert abs(imb - approx) < 1e-3
