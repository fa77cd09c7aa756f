"""Round-6 continuation operators: Theil inequality index, log-log
price elasticity, max drawdown, CUPED variance reduction, Adamic-Adar
link prediction — oracle parity plus the semantic invariants the
value hash can't express (bounds, decompositions, graph canon).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_matches_oracle

ALL = [
    "q_customer_theil_index",
    "q_part_price_elasticity",
    "q_orders_max_drawdown",
    "q_events_cuped",
    "graph_adamic_adar",
    "q_events_pacf",
    "graph_hits",
    "text_fuzzy_dups",
    "mm_audio_mulaw",
    "sim_search_ndcg",
    "mm_image_decode_pgm",
    "text_rake_keywords",
    "q_events_poisson_rate",
    "q_customer_clv_shrunken",
    "mm_image_hist_equalize",
    "graph_harmonic_sample",
    "stream_windowed_distinct",
    "mm_image_conv_edge",
    "text_ngram_entropy_rate",
    "graph_local_bridges",
    "mm_audio_dft_peak",
    "q_events_changepoint_binseg",
    "q_orders_wasserstein_drift",
    "dedup_fuzzy_cluster",
    "q_orders_demand_classes",
    "graph_rich_club",
    "q_orders_hurst_exponent",
    "embedding_knn_eval",
    "mm_image_decode_tiff",
    "embedding_cluster_purity",
    "q_customer_fe_elasticity",
    "embedding_mmd_drift",
    "q_customer_nb_dispersion",
    "q_events_behavior_entropy",
    "graph_powerlaw_fit",
    "q_orders_log_return_vol",
    "q_orders_expected_shortfall",
    "text_heaps_law",
    "graph_attr_assortativity",
    "embedding_intrinsic_dim",
    "q_events_srm_check",
    "mm_audio_zero_crossings",
    "graph_knn_degree_curve",
    "q_nation_supplier_cr4",
    "q_orders_ljung_box",
]


@pytest.mark.parametrize("name", ALL)
def test_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, name)


def test_theil_bounds(spark):
    """Theil T lies in [0, ln(n)] for positive incomes."""
    from postgres_s3_etl_spark.operators.analytics import (
        q_customer_theil_index,
    )

    rows = q_customer_theil_index(spark, SF_DIR).collect()
    assert len(rows) == 5  # one per region
    for r in rows:
        assert -1e-9 <= r.theil_t <= math.log(r.n_customers) + 1e-9


def test_elasticity_covers_every_brand_line(spark):
    """The brand rollup must partition lineitem exactly (inner join
    on part is lossless: every l_partkey exists in part)."""
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.analytics import (
        q_part_price_elasticity,
    )

    out = q_part_price_elasticity(spark, SF_DIR)
    total = out.agg(F.sum("n_lines")).collect()[0][0]
    n_li = load_table(spark, SF_DIR, "lineitem").count()
    assert total == n_li
    for r in out.collect():
        assert r.is_elastic == (r.elasticity < -1.0)


def test_max_drawdown_fraction_bounds(spark):
    from postgres_s3_etl_spark.operators.timeseries import (
        q_orders_max_drawdown,
    )

    r = q_orders_max_drawdown(spark, SF_DIR).collect()[0]
    assert r.max_drawdown >= 0.0
    # demeaned-curve drawdown can exceed the peak, but must be a
    # finite positive fraction of it
    assert r.max_drawdown_frac is None or r.max_drawdown_frac >= 0.0
    assert r.n_days > 0 and r.trough_day is not None


def test_cuped_preserves_weighted_mean(spark):
    """CUPED is mean-preserving in aggregate: the user-weighted
    average of adjusted arm means equals the raw weighted average
    (Σ n_a·θ·(mean_x_a − mean_x) telescopes to zero)."""
    from postgres_s3_etl_spark.operators.events import q_events_cuped

    rows = q_events_cuped(spark, SF_DIR).collect()
    assert {r.arm for r in rows} == {0, 1}
    n = sum(r.n_users for r in rows)
    raw = sum(r.n_users * r.mean_post for r in rows) / n
    adj = sum(r.n_users * r.mean_post_cuped for r in rows) / n
    assert abs(raw - adj) < 1e-3
    for r in rows:
        assert 0.0 <= r.var_reduction <= 1.0


def test_pacf_bounds(spark):
    """PACF values are correlations — all in [-1, 1]."""
    from postgres_s3_etl_spark.operators.timeseries import q_events_pacf

    r = q_events_pacf(spark, SF_DIR).collect()[0]
    for k in (1, 2, 3):
        assert abs(getattr(r, f"pacf_{k}")) <= 1.0 + 1e-9


def test_hits_leaderboard_shape(spark):
    """Each side carries ranks 1..10 and a max-normalized score with
    the leader at exactly 1.0."""
    from postgres_s3_etl_spark.operators.graph import graph_hits

    rows = graph_hits(spark, SF_DIR).collect()
    by_side = {}
    for r in rows:
        by_side.setdefault(r.side, []).append(r)
    assert set(by_side) == {"hub", "authority"}
    for side, rs in by_side.items():
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert rs[0].norm_score == 1.0
        assert all(0.0 < r.norm_score <= 1.0 for r in rs)
        # ranks ordered by score desc
        scores = [r.norm_score for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_fuzzy_dups_blocked_and_thresholded(spark):
    from postgres_s3_etl_spark.operators.text_analysis import (
        FUZZY_REL_MAX,
        text_fuzzy_dups,
    )

    rows = text_fuzzy_dups(spark, SF_DIR).collect()
    for r in rows:
        assert r.doc_i < r.doc_j
        assert 0.0 <= r.rel_dist <= FUZZY_REL_MAX


def test_mulaw_expansion_properties():
    """ITU G.711 invariants: sign-bit flip negates, magnitudes are
    bounded by 32124, and the all-ones byte decodes to exactly 0."""
    from postgres_s3_etl_spark.operators.multimodal import mulaw_expand

    for u in range(256):
        assert mulaw_expand(u ^ 0x80) == -mulaw_expand(u)
        assert abs(mulaw_expand(u)) <= 32124
    assert mulaw_expand(0xFF) == 0
    # 0x00 complements to 0xFF: sign bit set, e=7, m=15 -> -32124
    assert mulaw_expand(0x00) == -32124


def test_mulaw_decoder_rejects_malformed():
    """Truncated chunks and wrong format tags skip the asset
    (return None) instead of raising inside the Spark task."""
    from postgres_s3_etl_spark.operators.multimodal import (
        decode_wav_mulaw_exact,
        encode_wav_mulaw,
    )

    good = encode_wav_mulaw(3, 100)
    n, s, q, peak = decode_wav_mulaw_exact(good)
    assert n == 100 and q >= 0 and peak <= 32124
    assert decode_wav_mulaw_exact(good[:30]) is None  # truncated chunk
    assert decode_wav_mulaw_exact(b"RIFF\x00\x00\x00\x00JUNK") is None
    assert decode_wav_mulaw_exact(b"") is None
    # PCM (tag 1) container must be rejected by the mu-law path
    from postgres_s3_etl_spark.operators.multimodal import encode_wav

    assert decode_wav_mulaw_exact(encode_wav(1, 50)) is None


def test_ndcg_bounds_and_recall_consistency(spark):
    """NDCG ∈ [0,1]; a probe with perfect recall AND perfect order
    has ndcg == 1; ndcg can never exceed recall's ceiling (rel mass
    found)."""
    from postgres_s3_etl_spark.operators.similarity import sim_search_ndcg

    rows = sim_search_ndcg(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert -1e-9 <= r.ndcg <= 1.0 + 1e-9
        assert r.dcg >= 0.0


def test_pgm_decoder_spec_edges():
    """Comment-bearing headers parse; 16-bit maxval, truncation,
    and bad magic are rejected with None."""
    import numpy as np

    from postgres_s3_etl_spark.operators.multimodal import (
        decode_pgm,
        encode_pgm,
    )

    img = decode_pgm(encode_pgm(7, 5, 3))
    assert img.shape == (3, 5)
    assert img[0, 0] == (5 * 7) % 256
    assert img[2, 4] == (5 * 7 + 11 * 4 + 13 * 2) % 256
    assert decode_pgm(b"P6\n2 2\n255\n" + b"\x00" * 12) is None
    assert decode_pgm(b"P5\n2 2\n65535\n" + b"\x00" * 8) is None
    assert decode_pgm(encode_pgm(1, 4, 4)[:-1]) is None  # truncated
    # multi-comment header still parses
    multi = b"P5\n# one\n# two\n2 2\n255\n" + bytes(range(4))
    assert np.array_equal(decode_pgm(multi), np.arange(4).reshape(2, 2))


def test_rake_phrases_are_stopword_free(spark):
    from postgres_s3_etl_spark.operators.text_analysis import (
        RAKE_MAX_WORDS,
        RAKE_STOPWORDS,
        text_rake_keywords,
    )

    rows = text_rake_keywords(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    scores = [r.rake_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        words = r.phrase.split(" ")
        assert 1 <= len(words) == r.n_words <= RAKE_MAX_WORDS
        assert not set(words) & set(RAKE_STOPWORDS)
        assert r.n_occurrences >= 1


def test_poisson_rate_counts_partition_events(spark):
    """n1+n2 must equal the per-type event count exactly."""
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.events import q_events_poisson_rate

    rows = q_events_poisson_rate(spark, SF_DIR).collect()
    totals = {
        r.event_type: r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r.n1 + r.n2 == totals[r.event_type]
        z = (r.n2 - r.n1) / (r.n1 + r.n2) ** 0.5
        assert r.significant_05 == (abs(z) > 1.96)


def test_clv_shrinkage_pulls_toward_global_mean(spark):
    """Every shrunken value lies strictly between the raw average
    and the global mean (or equals both when they coincide)."""
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.analytics import (
        q_customer_clv_shrunken,
    )

    rows = q_customer_clv_shrunken(spark, SF_DIR).collect()
    assert len(rows) == 20
    orders = load_table(spark, SF_DIR, "orders")
    agg = orders.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu")
    ).collect()[0]
    for r in rows:
        lo, hi = sorted((r.raw_avg, agg.mu))
        assert lo - 1e-4 <= r.shrunk_avg <= hi + 1e-4
        assert r.n_orders >= 1


def test_hist_equalize_dynamic_range(spark):
    """Equalized plane must span up to 255 (max bin maps to 255 by
    construction) and keep pixel count."""
    from postgres_s3_etl_spark.operators.multimodal import (
        mm_image_hist_equalize,
        synth_pgm_media,
    )

    rows = mm_image_hist_equalize(spark, SF_DIR).collect()
    metas = {
        r.asset_id: (r.width, r.height)
        for r in synth_pgm_media(spark).select(
            "asset_id", "width", "height"
        ).collect()
    }
    for r in rows:
        w, h = metas[r.asset_id]
        assert r.n_px == w * h
        assert r.max_eq == 255
        assert 0 <= r.min_eq <= r.max_eq


def test_harmonic_seed_count_and_bounds(spark):
    """H(s) ≤ n_reached (every term ≤ 1) and > 0 on a connected
    co-purchase graph; exactly HARMONIC_SEEDS rows."""
    from postgres_s3_etl_spark.operators.graph import (
        HARMONIC_SEEDS,
        graph_harmonic_sample,
    )

    rows = graph_harmonic_sample(spark, SF_DIR).collect()
    assert len(rows) == HARMONIC_SEEDS
    for r in rows:
        assert 0.0 < r.harmonic <= r.n_reached + 1e-9


def test_sobel_matches_manual_stencil(spark):
    """Spot-check the Sobel L1 magnitude against a hand-rolled
    per-pixel loop on one decoded asset."""
    import numpy as np

    from postgres_s3_etl_spark.operators.multimodal import (
        decode_pgm,
        encode_pgm,
        mm_image_conv_edge,
    )

    # asset 3's synthesized dims: w = 14 + 3 % 7 = 17, h = 10 + 3 % 6 = 13
    img = decode_pgm(encode_pgm(3, 17, 13)).astype(np.int64)
    h, w = img.shape
    energy = peak = strong = 0
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            gx = (
                img[y - 1, x + 1] + 2 * img[y, x + 1] + img[y + 1, x + 1]
                - img[y - 1, x - 1] - 2 * img[y, x - 1] - img[y + 1, x - 1]
            )
            gy = (
                img[y + 1, x - 1] + 2 * img[y + 1, x] + img[y + 1, x + 1]
                - img[y - 1, x - 1] - 2 * img[y - 1, x] - img[y - 1, x + 1]
            )
            m = abs(gx) + abs(gy)
            energy += m
            peak = max(peak, m)
            strong += m >= 255
    rows = {r.asset_id: r for r in mm_image_conv_edge(spark, SF_DIR).collect()}
    r = rows[3]
    assert (r.edge_energy, r.peak_grad, r.n_strong) == (
        energy, peak, strong
    )
    assert r.n_interior == (h - 2) * (w - 2)


def test_entropy_rate_information_inequalities(spark):
    """Conditioning can't increase entropy: H(W2|W1) <= H(W) (both
    in bits); predictability ratio in (0, 1]."""
    from postgres_s3_etl_spark.operators.text_analysis import (
        text_ngram_entropy_rate,
    )

    r = text_ngram_entropy_rate(spark, SF_DIR).collect()[0]
    assert 0.0 < r.h_cond_bigram <= r.h_unigram + 1e-6
    assert 0.0 < r.predictability_ratio <= 1.0 + 1e-9
    assert r.n_bigrams > r.n_distinct_bigrams > 0


def test_local_bridges_complement_triangles(spark):
    """Bridge count + triangle-covered edge count == total edges;
    with any triangles present, bridge_frac < 1."""
    from postgres_s3_etl_spark.operators.graph import (
        graph_local_bridges,
        graph_triangle_count,
    )

    r = graph_local_bridges(spark, SF_DIR).collect()[0]
    assert 0 <= r.n_bridges <= r.n_edges
    n_tri = graph_triangle_count(spark, SF_DIR).collect()[0].n_triangles
    if n_tri > 0:
        assert r.n_bridges < r.n_edges
    assert abs(r.bridge_frac - r.n_bridges / r.n_edges) < 2e-6


def test_dft_peak_matches_numpy_fft_ranking(spark):
    """The residue-folded engine-side DFT power must equal a direct
    numpy computation of the same single-frequency power for one
    asset, at every candidate period."""
    import numpy as np

    from postgres_s3_etl_spark.operators.multimodal import (
        AUDIO_DFT_PERIODS,
        mm_audio_dft_peak,
    )

    aid, ns = 5, 1000 + 10 * 5
    s = np.array(
        [((7 * aid + 13 * k) % 201) - 100 for k in range(ns)], dtype=float
    )
    powers = {}
    for p in AUDIO_DFT_PERIODS:
        ph = 2.0 * np.pi * (np.arange(ns) % p) / p
        a, b = (s * np.cos(ph)).sum(), (s * np.sin(ph)).sum()
        powers[p] = (a * a + b * b) / (ns * ns)
    best = min(
        sorted(powers, key=lambda p: (-powers[p], p))[:1]
    )
    r = {x.asset_id: x for x in mm_audio_dft_peak(spark, SF_DIR).collect()}[
        aid
    ]
    assert r.peak_period == best
    assert abs(r.power - powers[best]) < 1e-3
    assert r.n_samples == ns


def test_binseg_gain_nonnegative_and_split_interior(spark):
    from postgres_s3_etl_spark.operators.timeseries import (
        q_events_changepoint_binseg,
    )

    r = q_events_changepoint_binseg(spark, SF_DIR).collect()[0]
    assert r.gain >= 0.0
    assert r.nl >= 1 and r.nr >= 1
    assert r.mean_left > 0 and r.mean_right > 0


def test_wasserstein_bounds(spark):
    """Normalized W1 is a mean |ECDF gap| — within [0, 1]; raw W1 is
    the normalized value times the value range."""
    from postgres_s3_etl_spark.operators.quality import (
        q_orders_wasserstein_drift,
    )

    r = q_orders_wasserstein_drift(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.w1_normalized <= 1.0
    assert r.w1 >= 0.0
    assert r.n_ref > 0 and r.n_cur > 0


def test_fuzzy_clusters_partition_paired_docs(spark):
    """Cluster members = every doc appearing in a fuzzy pair; the
    representative is the minimum id so it can never be dropped."""
    from postgres_s3_etl_spark.operators.dedup import dedup_fuzzy_cluster
    from postgres_s3_etl_spark.operators.text_analysis import (
        text_fuzzy_dups,
    )

    clusters = dedup_fuzzy_cluster(spark, SF_DIR).collect()
    paired = set()
    for p in text_fuzzy_dups(spark, SF_DIR).collect():
        paired.update((p.doc_i, p.doc_j))
    assert sum(c.n_members for c in clusters) == len(paired)
    for c in clusters:
        assert c.n_members >= 2  # every paired doc has a partner
        assert c.n_dropped == c.n_members - 1
        assert c.keep_doc in paired


def test_demand_classes_consistent_with_cuts(spark):
    from postgres_s3_etl_spark.operators.timeseries import (
        SBC_ADI_CUT,
        SBC_CV2_CUT,
        q_orders_demand_classes,
    )

    rows = q_orders_demand_classes(spark, SF_DIR).collect()
    assert len(rows) == 5  # one per market segment
    for r in rows:
        expect = (
            "smooth"
            if r.adi_periods < SBC_ADI_CUT and r.cv2 < SBC_CV2_CUT
            else "erratic"
            if r.adi_periods < SBC_ADI_CUT
            else "intermittent"
            if r.cv2 < SBC_CV2_CUT
            else "lumpy"
        )
        assert r.demand_class == expect
        assert r.adi_periods > 0 and r.cv2 >= 0


def test_rich_club_monotone_membership(spark):
    """Club membership shrinks as k rises; phi within [0, 1]."""
    from postgres_s3_etl_spark.operators.graph import graph_rich_club

    rows = graph_rich_club(spark, SF_DIR).collect()
    sizes = [r.n_nodes for r in rows]
    assert sizes == sorted(sizes, reverse=True)
    for r in rows:
        assert r.n_club_edges >= 0
        if r.phi is not None:
            assert 0.0 <= r.phi <= 1.0 + 1e-9


def test_hurst_in_unit_interval(spark):
    """R/S Hurst estimates land in (0, 1) for any real series."""
    from postgres_s3_etl_spark.operators.timeseries import (
        q_orders_hurst_exponent,
    )

    r = q_orders_hurst_exponent(spark, SF_DIR).collect()[0]
    assert r.n_sizes == 3
    assert 0.0 < r.hurst < 1.0


def test_knn_eval_votes_bounded_by_k(spark):
    from postgres_s3_etl_spark.operators.similarity import (
        TOP_K,
        embedding_knn_eval,
    )

    rows = embedding_knn_eval(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert 1 <= r.n_votes <= TOP_K
        assert r.correct == (r.true_label == r.pred_label)


def test_compressed_sinks_round_trip(spark, tmp_path):
    """gzip JSON-lines and zstd parquet write real compressed files
    (extension check) and read back value-identical."""
    import os

    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.sinks.files import (
        write_json_compressed,
        write_parquet_codec,
    )

    df = load_table(spark, SF_DIR, "region").select("r_regionkey", "r_name")
    jd = str(tmp_path / "j")
    pd_ = str(tmp_path / "p")
    write_json_compressed(df, jd, codec="gzip")
    write_parquet_codec(df, pd_, codec="zstd")
    assert any(f.endswith(".json.gz") for f in os.listdir(jd))
    assert any(".zstd" in f and f.endswith(".parquet") for f in os.listdir(pd_))
    orig = {tuple(r) for r in df.collect()}
    assert {tuple(r) for r in spark.read.json(jd)
            .select("r_regionkey", "r_name").collect()} == orig
    assert {tuple(r) for r in spark.read.parquet(pd_)
            .select("r_regionkey", "r_name").collect()} == orig


def test_ljung_box_nonnegative_and_flag_consistent(spark):
    from postgres_s3_etl_spark.operators.timeseries import (
        LB_CRIT_05,
        q_orders_ljung_box,
    )

    r = q_orders_ljung_box(spark, SF_DIR).collect()[0]
    assert r.lb_q >= 0.0
    assert r.n > 5
    # flag computed pre-truncation; only check off-boundary
    if abs(r.lb_q - LB_CRIT_05) > 1e-4:
        assert r.autocorrelated_05 == (r.lb_q > LB_CRIT_05)


def test_cr4_bounds_and_hhi_companion(spark):
    """CR4 ∈ (0, 1]; with ≤4 suppliers CR4 = 1; one row per nation."""
    from postgres_s3_etl_spark.operators.analytics import (
        q_nation_supplier_cr4,
    )

    rows = q_nation_supplier_cr4(spark, SF_DIR).collect()
    # one row per nation that HAS suppliers (tiny SFs leave gaps)
    assert 0 < len(rows) <= 25
    for r in rows:
        if r.cr4 is not None:
            assert 0.0 < r.cr4 <= 1.0 + 1e-9
            if r.n_suppliers <= 4:
                assert r.cr4 > 0.999999 - 1e-6
            # flag computed pre-truncation; only check off-boundary
            if abs(r.cr4 - 0.6) > 1e-5:
                assert r.concentrated == (r.cr4 > 0.6)


def test_zcr_matches_manual_count(spark):
    """Spot-check sign-flip counting against the closed-form sample
    series for one asset; ZCR bounded to [0, 1]."""
    from postgres_s3_etl_spark.operators.multimodal import (
        mm_audio_zero_crossings,
    )

    rows = {r.asset_id: r for r in mm_audio_zero_crossings(spark, SF_DIR).collect()}
    aid, ns = 7, 1000 + 10 * 7
    s = [((7 * aid + 13 * k) % 201) - 100 for k in range(ns)]
    flips = sum((s[i] < 0) != (s[i + 1] < 0) for i in range(ns - 1))
    r = rows[aid]
    assert (r.n_samples, r.n_crossings) == (ns, flips)
    assert 0.0 <= r.zcr <= 1.0


def test_knn_curve_weighted_mean_consistency(spark):
    """Node counts over the curve must sum to the node count of the
    graph; every mean neighbor degree is within global degree
    bounds."""
    from postgres_s3_etl_spark.operators.graph import (
        _degrees,
        copurchase_edges,
        graph_knn_degree_curve,
    )

    rows = graph_knn_degree_curve(spark, SF_DIR).collect()
    deg = _degrees(copurchase_edges(spark, SF_DIR)).collect()
    assert sum(r.n_nodes for r in rows) == len(deg)
    dmin, dmax = min(d.deg for d in deg), max(d.deg for d in deg)
    for r in rows:
        assert dmin <= r.mean_neighbor_degree <= dmax + 1e-6


def test_srm_counts_partition_users(spark):
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.events import q_events_srm_check

    r = q_events_srm_check(spark, SF_DIR).collect()[0]
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert r.n_a + r.n_b == n_users
    chi2 = (r.n_a - r.n_b) ** 2 / (r.n_a + r.n_b)
    assert abs(r.chi2 - chi2) < 2e-6
    assert r.srm_detected == (chi2 > 3.841)


def test_intrinsic_dim_positive_and_probe_bounded(spark):
    """Two-NN ID is positive and uses exactly the probe set (probes
    with distinct nearest neighbors)."""
    from postgres_s3_etl_spark.operators.similarity import (
        N_PROBES,
        embedding_intrinsic_dim,
    )

    r = embedding_intrinsic_dim(spark, SF_DIR).collect()[0]
    assert 0 < r.n_probes <= N_PROBES
    assert r.intrinsic_dim > 0.0


def test_attr_assortativity_bounds(spark):
    """Discrete assortativity r ∈ [-1, 1]; same-brand fraction is a
    probability; edge count matches the co-purchase graph."""
    from postgres_s3_etl_spark.operators.graph import (
        copurchase_edges,
        graph_attr_assortativity,
    )

    r = graph_attr_assortativity(spark, SF_DIR).collect()[0]
    assert -1.0 - 1e-9 <= r.assortativity <= 1.0 + 1e-9
    assert 0.0 <= r.same_brand_frac <= 1.0
    assert r.n_edges == copurchase_edges(spark, SF_DIR).count()


def test_expected_shortfall_dominates_var(spark):
    """ES ≤ VaR boundary (mean of the tail can't exceed its max),
    and the tail holds exactly ⌈n/10⌉ returns."""
    import math

    from postgres_s3_etl_spark.operators.timeseries import (
        q_orders_expected_shortfall,
    )

    r = q_orders_expected_shortfall(spark, SF_DIR).collect()[0]
    assert r.expected_shortfall <= r.var_10 + 1e-9
    assert r.n_tail == math.ceil(r.n * 0.1)


def test_heaps_beta_sublinear(spark):
    """Vocabulary growth is sublinear: 0 ≤ β < 1 (the synthetic
    corpus draws from a FIXED 40-word vocabulary, so it saturates at
    the first checkpoint and β ≈ 0 — itself the signal this operator
    exists to raise on templated text); K positive."""
    from postgres_s3_etl_spark.operators.text_analysis import text_heaps_law

    r = text_heaps_law(spark, SF_DIR).collect()[0]
    assert r.n_points == 10
    assert 0.0 <= r.heaps_beta < 1.0
    assert r.heaps_k > 0.0


def test_log_return_vol_annualization(spark):
    """annualized = daily · √252 (to f6 tolerance); n = days − 1."""
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.timeseries import (
        q_orders_log_return_vol,
    )

    r = q_orders_log_return_vol(spark, SF_DIR).collect()[0]
    assert abs(r.annualized_vol - r.daily_vol * 252**0.5) < 1e-3
    n_days = (
        load_table(spark, SF_DIR, "orders")
        .select("o_orderdate")
        .distinct()
        .count()
    )
    assert r.n == n_days - 1
    assert r.daily_vol > 0


def test_nb_dispersion_consistency(spark):
    """vmr = var/mean; overdispersed flag matches the alpha cut; the
    flag and moments agree with a driver-side recomputation."""
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.analytics import (
        q_customer_nb_dispersion,
    )

    r = q_customer_nb_dispersion(spark, SF_DIR).collect()[0]
    ks = [
        x.k
        for x in load_table(spark, SF_DIR, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("k"))
        .collect()
    ]
    n = len(ks)
    mean = sum(ks) / n
    var = sum(k * k for k in ks) / n - mean * mean
    assert r.n == n
    assert abs(r.mean_orders - mean) < 2e-6
    assert abs(r.var_orders - var) < 2e-6
    assert r.overdispersed == ((var - mean) / mean**2 > 0.05)


def test_behavior_entropy_bins_bounded(spark):
    """Per-user event-type entropy is in [0, log2(5)] so bins span
    0..9 at quarter-bit width; bin populations sum to the user count."""
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.events import (
        q_events_behavior_entropy,
    )

    rows = q_events_behavior_entropy(spark, SF_DIR).collect()
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows) == n_users
    import math

    for r in rows:
        assert 0 <= r.entropy_bin <= math.log2(5) * 4
        assert 0.0 <= r.mean_entropy <= math.log2(5) + 1e-9
        # bin mean must lie inside the bin
        assert r.entropy_bin * 0.25 - 1e-6 <= r.mean_entropy
        assert r.mean_entropy < (r.entropy_bin + 1) * 0.25 + 1e-6


def test_powerlaw_alpha_sane(spark):
    """MLE exponent must exceed 1 by construction and the tail must
    be a subset of the node set."""
    from postgres_s3_etl_spark.operators.graph import graph_powerlaw_fit

    r = graph_powerlaw_fit(spark, SF_DIR).collect()[0]
    assert r.alpha_mle > 1.0
    assert 0 < r.n_tail <= r.n_nodes
    assert abs(r.tail_frac - r.n_tail / r.n_nodes) < 2e-6


def test_mmd_matches_numpy_mean_gap(spark):
    """Linear-kernel MMD² must equal the numpy ‖μ_ref − μ_cur‖²
    recomputation, and the max per-dim gap must bound the average."""
    import numpy as np

    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.similarity import (
        embedding_mmd_drift,
    )

    r = embedding_mmd_drift(spark, SF_DIR).collect()[0]
    rows = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    cut = max(x.vec_id for x in rows) * 0.5
    ref = np.array([x.embedding for x in rows if x.vec_id <= cut])
    cur = np.array([x.embedding for x in rows if x.vec_id > cut])
    gap = ref.mean(axis=0) - cur.mean(axis=0)
    assert r.n_ref == len(ref) and r.n_cur == len(cur)
    assert abs(r.mmd2_x1e3 - float(gap @ gap) * 1e3) < 1e-3
    assert r.max_dim_gap_x1e3 >= r.mmd2_x1e3 / 64 - 1e-6


def test_fe_elasticity_bias_identity(spark):
    """heterogeneity_bias must equal pooled − within (up to the f6
    truncation), and line counts must cover all of lineitem."""
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.analytics import (
        q_customer_fe_elasticity,
    )

    r = q_customer_fe_elasticity(spark, SF_DIR).collect()[0]
    assert abs(r.heterogeneity_bias - (r.beta_pooled - r.beta_within)) < 3e-6
    assert r.n_lines == load_table(spark, SF_DIR, "lineitem").count()
    assert r.n_customers > 0


def test_cluster_purity_partitions_corpus(spark):
    """Cluster sizes sum to the corpus; purity in (0, 1]; majority
    count never exceeds membership; clusters match kmeans sizes."""
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.clustering import (
        embedding_cluster_purity,
        kmeans_embeddings,
    )

    rows = embedding_cluster_purity(spark, SF_DIR).collect()
    n_corpus = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r.n_members for r in rows) == n_corpus
    km = {
        r.cluster_id: r.n_members
        for r in kmeans_embeddings(spark, SF_DIR).collect()
    }
    for r in rows:
        assert 0.0 < r.purity <= 1.0
        assert 1 <= r.n_majority <= r.n_members
        assert km[r.cluster_id] == r.n_members


def test_snapshot_diff_cdf(spark, tmp_path):
    """insert/delete/update classification between two committed
    versions matches the constructed change set exactly."""
    from postgres_s3_etl_spark.sinks.versioned import (
        snapshot_diff,
        write_snapshot,
    )

    t = str(tmp_path / "tbl")
    v0 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id bigint, name string, val double",
    )
    write_snapshot(v0, t, mode="overwrite")
    v1 = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 99.0), (4, "d", 40.0)],
        "id bigint, name string, val double",
    )
    write_snapshot(v1, t, mode="overwrite")
    changes = {
        r.id: r._change
        for r in snapshot_diff(spark, t, ["id"], 1, 2).collect()
    }
    assert changes == {1: "delete", 3: "update", 4: "insert"}


def test_robust_parquet_read_skips_corrupt_files(spark, tmp_path):
    """A truncated parquet file alongside good ones must be skipped
    by the robust reader (and fail the strict reader)."""
    import os

    import pytest

    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.sources.files import read_parquet_robust

    d = str(tmp_path / "land")
    df = load_table(spark, SF_DIR, "region").select("r_regionkey", "r_name")
    df.coalesce(1).write.parquet(d)
    good = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
    raw = open(os.path.join(d, good), "rb").read()
    with open(os.path.join(d, "part-corrupt.parquet"), "wb") as f:
        f.write(raw[: len(raw) // 3])  # truncated footer
    got = {tuple(r) for r in read_parquet_robust(spark, d).collect()}
    assert got == {tuple(r) for r in df.collect()}
    with pytest.raises(Exception):
        spark.read.option("ignoreCorruptFiles", "false").parquet(d).collect()


def test_tiff_codec_spec_edges():
    """Both byte orders, two-strip reassembly, left-justified inline
    SHORTs, and malformed rejects (bad magic, truncation, 16-bit)."""
    import numpy as np
    import struct

    from postgres_s3_etl_spark.operators.multimodal import (
        decode_tiff_gray,
        encode_tiff_gray,
    )

    le = encode_tiff_gray(0, 12, 9)   # little-endian, 2 strips (0%3==0)
    be = encode_tiff_gray(1, 13, 10)  # big-endian, single strip
    assert le[:2] == b"II" and be[:2] == b"MM"
    for aid, payload, w, h in ((0, le, 12, 9), (1, be, 13, 10)):
        img = decode_tiff_gray(payload)
        assert img.shape == (h, w)
        assert img[h - 1, w - 1] == (7 * aid + 3 * (w - 1) + 11 * (h - 1)) % 256
    assert decode_tiff_gray(b"XX*\x00\x00\x00\x00\x00") is None
    # chop into the IFD entry table itself (the trailing 4-byte
    # next-IFD pointer is never read, so -3 would still be valid)
    assert decode_tiff_gray(le[:-20]) is None
    # wrong magic number
    bad = b"II" + struct.pack("<HI", 43, 8) + le[8:]
    assert decode_tiff_gray(bad) is None


def test_stream_windowed_distinct_equals_batch(spark):
    """The chained-stateful streaming distinct equals the batch
    distinct-per-window restricted to watermark-closed windows."""
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.streaming.events_stream import (
        q_stream_windowed_distinct,
    )

    streamed = {
        (r.hour_start, r.n_distinct_users, r.n_events)
        for r in q_stream_windowed_distinct(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    batch = {
        (r.hour_start, r.n_distinct_users, r.n_events)
        for r in (
            ev.groupBy(
                F.date_trunc("hour", "ts").alias("hour_start"), "user_id"
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy("hour_start")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_distinct_users"),
                F.sum("n").cast("bigint").alias("n_events"),
            )
            .collect()
        )
        if (max_ts - r.hour_start).total_seconds() >= 2 * 3600 + 3600
    }
    assert streamed == batch and len(streamed) > 0


def test_adamic_adar_pairs_are_nonedges(spark):
    """Every predicted pair must be canonical (a < b), scored
    positive, and absent from the repeat-co-purchase edge set."""
    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.graph import (
        AA_MIN_COOCCUR,
        graph_adamic_adar,
    )

    rows = graph_adamic_adar(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.a < r.b
        assert r.aa_score > 0.0
        assert r.n_common >= 1

    op = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    edges = {
        (e.src, e.dst)
        for e in (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .groupBy(
                F.col("a.l_partkey").alias("src"),
                F.col("b.l_partkey").alias("dst"),
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= AA_MIN_COOCCUR)
            .collect()
        )
    }
    for r in rows:
        assert (r.a, r.b) not in edges
