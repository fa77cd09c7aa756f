"""Round-7 second-batch operators: GIF LZW codec, winnowing,
shingle containment, Fano dispersion, square census, readability —
oracle parity plus the semantic invariants the hash can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_matches_oracle

ALL = [
    "mm_image_decode_gif",
    "text_winnowing",
    "dedup_shingle_containment",
    "q_events_type_fano",
    "graph_squares",
    "text_readability",
    "sim_search_pq_rerank",
    "q_events_countmin_topk",
    "q_events_haar_energy",
    "mm_image_decode_jpeg_progressive",
    "graph_modularity",
    "dedup_lsh_pr_curve",
    "embedding_pq_distortion_curve",
    "dedup_banding_tradeoff",
    "sim_search_recall_curve",
    "mm_audio_decode_aiff",
    "mm_image_decode_tga",
    "mm_audio_alaw",
    "q_orders_theil_sen",
    "sim_search_ivf_nprobe_curve",
    "q_events_seasonal_strength",
    "q_customer_survival_km_ci",
    "q_events_stickiness",
    "q_customer_cohort_survival",
    "q_orders_benford_mad",
    "sim_search_filtered",
    "q_events_funnel_ci",
]


@pytest.mark.parametrize("name", ALL)
def test_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, name)


class TestGifLzw:
    def test_round_trip_exact_with_table_growth(self):
        import numpy as np

        from postgres_s3_etl_spark.operators.multimodal import (
            decode_gif_gray,
            encode_gif_gray,
        )

        # 200x200 forces dictionary growth through several width
        # bumps and at least one 12-bit table reset.
        img = decode_gif_gray(encode_gif_gray(1, 200, 200))
        assert img is not None and img.shape == (200, 200)
        exp = np.array(
            [[(11 + 5 * x + 7 * y) % 256 for x in range(200)]
             for y in range(200)],
            dtype=np.uint8,
        )
        assert (img == exp).all()

    def test_kwkwk_case(self):
        """A run of identical pixels forces the code == len(table)
        self-reference (the KwKwK case) early in the stream."""
        import numpy as np

        from postgres_s3_etl_spark.operators.multimodal import (
            decode_gif_gray,
        )
        from postgres_s3_etl_spark.operators import multimodal as mm
        import struct

        # hand-build: 4x1 image of [7, 7, 7, 7]; LZW emits CLEAR, 7,
        # then code for "77" before the decoder has finished defining
        # it -> KwKwK.
        clear = 256
        eoi = 257
        codes = [(clear, 9), (7, 9), (258, 9), (7, 9), (eoi, 9)]
        acc = n = 0
        stream = bytearray()
        for code, cw in codes:
            acc |= code << n
            n += cw
            while n >= 8:
                stream.append(acc & 0xFF)
                acc >>= 8
                n -= 8
        if n:
            stream.append(acc & 0xFF)
        palette = bytes(v for i in range(256) for v in (i, i, i))
        payload = (
            b"GIF87a"
            + struct.pack("<HHBBB", 4, 1, 0xF7, 0, 0)
            + palette
            + b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 1, 0)
            + bytes([8])
            + bytes([len(stream)]) + bytes(stream) + b"\x00"
            + b"\x3b"
        )
        img = decode_gif_gray(payload)
        assert img is not None
        assert img.tolist() == [[7, 7, 7, 7]]

    def test_rejects_out_of_scope(self):
        from postgres_s3_etl_spark.operators.multimodal import (
            decode_gif_gray,
            encode_gif_gray,
        )

        raw = bytearray(encode_gif_gray(0, 20, 14))
        assert decode_gif_gray(b"NOTGIF" + bytes(raw[6:])) is None
        # interlace flag set -> out of scope, loud None
        i = raw.find(b"\x2c")
        raw2 = bytearray(raw)
        raw2[i + 9] |= 0x40
        assert decode_gif_gray(bytes(raw2)) is None
        # truncated LZW stream
        assert decode_gif_gray(bytes(raw[:-20])) is None


class TestProgressiveJpeg:
    def test_round_trip_exact(self):
        import numpy as np

        from postgres_s3_etl_spark.operators.multimodal import (
            decode_jpeg_progressive_gray,
            encode_jpeg_gray_progressive,
        )

        for aid in (0, 5, 47):
            w, h = 16 + 8 * (aid % 3), 16 + 8 * (aid % 2)
            img = decode_jpeg_progressive_gray(
                encode_jpeg_gray_progressive(aid, w, h)
            )
            assert img is not None and img.shape == (h, w)
            for by in range(h // 8):
                for bx in range(w // 8):
                    blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    assert (
                        blk == (31 * aid + 11 * bx + 3 * by) % 256
                    ).all()

    def test_nonzero_ac_first_scan(self):
        """Hand-built AC-first scan with a NONZERO coefficient and a
        ZRL: decode must place the coefficient at the right zigzag
        index and reproduce the independent IDCT."""
        import struct

        import numpy as np

        from postgres_s3_etl_spark.operators.multimodal import (
            _BitWriter,
            _JPEG_DC_BITS,
            _JPEG_DC_VALS,
            _JPEG_PROG_AC_BITS,
            _JPEG_PROG_AC_VALS,
            _JPEG_QTABLE,
            _JPEG_ZIGZAG,
            _huff_canonical,
            _idct_matrix,
            decode_jpeg_progressive_gray,
        )

        dc_huf = _huff_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS)
        ac_huf = _huff_canonical(_JPEG_PROG_AC_BITS, _JPEG_PROG_AC_VALS)
        # one 8x8 block: DC first (value 0 at Al=1), DC refine bit 0,
        # AC scan: ZRL (16 zeros) then (run 1, size 1) coeff +1 at
        # band index 1+16+1 = zigzag position 18, then EOB (r=0).
        s1 = _BitWriter()
        code, ln = dc_huf[0]
        s1.write(code, ln)
        s2 = _BitWriter()
        s2.write(0, 1)
        s3 = _BitWriter()
        code, ln = ac_huf[0xF0]
        s3.write(code, ln)
        code, ln = ac_huf[0x11]
        s3.write(code, ln)
        s3.write(1, 1)  # +1
        code, ln = ac_huf[0x00]
        s3.write(code, ln)

        def seg(marker, body):
            return struct.pack(">HH", marker, len(body) + 2) + body

        payload = (
            b"\xff\xd8"
            + seg(0xFFDB, bytes([0x00]) + bytes(_JPEG_QTABLE))
            + seg(0xFFC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
            + seg(
                0xFFC4,
                bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
                + bytes([0x10]) + bytes(_JPEG_PROG_AC_BITS)
                + bytes(_JPEG_PROG_AC_VALS),
            )
            + seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0x01])) + s1.flush()
            + seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0x10])) + s2.flush()
            + seg(0xFFDA, bytes([1, 1, 0x10, 1, 63, 0x00])) + s3.flush()
            + b"\xff\xd9"
        )
        img = decode_jpeg_progressive_gray(payload)
        assert img is not None and img.shape == (8, 8)
        # independent reference: coefficient grid with q=8 at zigzag
        # index 18 (natural position _JPEG_ZIGZAG[18]).
        f = np.zeros(64)
        f[_JPEG_ZIGZAG[18]] = 1 * 8
        A = _idct_matrix()
        ref = np.clip(
            np.round(A @ f.reshape(8, 8) @ A.T + 128.0), 0, 255
        ).astype(np.uint8)
        assert (img == ref).all()

    def test_out_of_scope_rejected(self):
        from postgres_s3_etl_spark.operators.multimodal import (
            decode_jpeg_baseline,
            decode_jpeg_progressive_gray,
            encode_jpeg_gray,
            encode_jpeg_gray_progressive,
        )

        prog = encode_jpeg_gray_progressive(0, 16, 16)
        # the baseline decoder still rejects SOF2...
        assert decode_jpeg_baseline(prog) is None
        # ...and the progressive decoder rejects baseline SOF0
        assert decode_jpeg_progressive_gray(
            encode_jpeg_gray(0, 16, 16)
        ) is None
        # truncation mid-header fails safely...
        assert decode_jpeg_progressive_gray(prog[:40]) is None
        # ...while truncation after complete scans renders what
        # arrived — the defining progressive behavior (browsers show
        # the partial image): with the AC scan cut off, the DC-only
        # render still equals the full render here (AC are zero).
        full = decode_jpeg_progressive_gray(prog)
        partial = decode_jpeg_progressive_gray(prog[:-12])
        assert partial is not None and (partial == full).all()


class TestAiffTga:
    def test_aiff_f80_rates(self):
        from postgres_s3_etl_spark.operators.multimodal import (
            _f80_decode,
            _f80_encode,
        )

        for r in (8000.0, 22050.0, 44100.0, 48000.0, 96000.0, 1000.0):
            assert _f80_decode(_f80_encode(r)) == r
        assert _f80_decode(b"\x00" * 10) == 0.0

    def test_aiff_round_trip_and_chunk_skip(self):
        import struct

        import numpy as np

        from postgres_s3_etl_spark.operators.multimodal import (
            _wav_sample,
            decode_aiff,
            encode_aiff,
        )

        raw = encode_aiff(3, 100)
        rate, s = decode_aiff(raw)
        assert rate == 1000
        assert (s == np.array(
            [_wav_sample(3, k) for k in range(100)], dtype=np.int64
        )).all()
        # odd-length unknown chunk (with pad byte) must be skipped
        inj = b"JUNK" + struct.pack(">I", 3) + b"abc\x00"
        patched = raw[:12] + inj + raw[12:]
        patched = (
            patched[:4]
            + struct.pack(">I", len(patched) - 8)
            + patched[8:]
        )
        rate2, s2 = decode_aiff(patched)
        assert rate2 == 1000 and (s2 == s).all()
        assert decode_aiff(b"FORM\x00\x00\x00\x04WAVE") is None

    def test_alaw_expansion_values(self):
        """Spot-check the ITU A-law expansion against hand-computed
        values and the μ-law/A-law structural relationship (A-law
        max magnitude 32256 > μ-law 32124; min step 8 vs 4)."""
        from postgres_s3_etl_spark.operators.multimodal import (
            alaw_expand,
            mulaw_expand,
        )

        # 0x55 inverts to 0x00 -> e=0, m=0, positive -> +8
        assert alaw_expand(0x55) == 8
        # 0xD5 inverts to 0x80 -> sign bit -> -8
        assert alaw_expand(0xD5) == -8
        # inverted 0x7F: e=7, m=15 -> (240+264)<<6 = 32256
        assert alaw_expand(0x7F ^ 0x55) == 32256
        assert max(abs(alaw_expand(b)) for b in range(256)) == 32256
        assert max(abs(mulaw_expand(b)) for b in range(256)) == 32124

    def test_tga_round_trip_and_origin_flip(self):
        import numpy as np

        from postgres_s3_etl_spark.operators.multimodal import (
            decode_tga,
            encode_tga_rle,
        )

        aid, w, h = 7, 28, 19
        img = decode_tga(encode_tga_rle(aid, w, h))
        assert img is not None and img.shape == (h, w, 3)
        exp = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                q = x // 4
                exp[y, x] = (
                    (5 * aid + 7 * q + 11 * y) % 256,
                    (13 * aid + 17 * q + 19 * y) % 256,
                    (23 * aid + 29 * q + 31 * y) % 256,
                )
        assert (img == exp).all()
        # truncated RLE stream fails safely
        assert decode_tga(encode_tga_rle(0, 24, 16)[:-10]) is None
        # 16-bit depth out of scope
        raw = bytearray(encode_tga_rle(0, 24, 16))
        raw[16] = 16
        assert decode_tga(bytes(raw)) is None


def test_winnowing_coverage_guarantee(spark):
    """Two docs sharing a >= W+K-1 token run must share at least one
    fingerprint (the winnowing guarantee)."""
    from postgres_s3_etl_spark.operators.text_analysis import (
        WINNOW_K,
        WINNOW_W,
    )

    shared = " ".join(f"tok{i}" for i in range(WINNOW_W + WINNOW_K - 1))
    df = spark.createDataFrame(
        [
            (0, "alpha beta " + shared + " gamma delta"),
            (1, shared + " epsilon zeta eta theta iota"),
        ],
        "doc_id bigint, text string",
    )
    # reuse the operator's gram-hash expression via a temp view
    df.createOrReplaceTempView("tmp_winnow_docs")
    rows = spark.sql(
        f"""
        WITH words AS (
            SELECT doc_id, split(trim(text), '\\\\s+') AS w
            FROM tmp_winnow_docs
        ),
        hashes AS (
            SELECT doc_id,
                   transform(
                       sequence(1, greatest(size(w) - {WINNOW_K - 1}, 1)),
                       i -> cast(conv(substr(
                               md5(concat_ws(' ', slice(w, i, {WINNOW_K}))),
                               1, 15), 16, 10) as bigint)) AS h
            FROM words
        )
        SELECT doc_id,
               array_distinct(transform(
                   sequence(0, greatest(size(h) - {WINNOW_W}, 0)),
                   i -> array_min(slice(h, i + 1, {WINNOW_W})))) AS fps
        FROM hashes
        """
    ).collect()
    sets = {r.doc_id: set(r.fps) for r in rows}
    assert sets[0] & sets[1], "shared passage must share a fingerprint"


def test_containment_detects_subset_doc(spark, duck):
    """containment >= jaccard always, and a subset pair scores
    higher containment than jaccard."""
    from postgres_s3_etl_spark.operators.dedup import (
        dedup_ngram_jaccard,
        dedup_shingle_containment,
    )

    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in dedup_shingle_containment(spark, SF_DIR).collect()
    }
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_ngram_jaccard(spark, SF_DIR).collect()
    }
    assert cont
    for pair, c in cont.items():
        assert 0.0 < c <= 1.0
        if pair in jac:
            assert c >= jac[pair] - 1e-9


def test_fano_matches_direct_computation(spark):
    from postgres_s3_etl_spark.operators.events import q_events_type_fano

    rows = q_events_type_fano(spark, SF_DIR).collect()
    assert rows
    daily = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .count()
        .collect()
    )
    from collections import defaultdict

    per = defaultdict(list)
    for r in daily:
        per[r.event_type].append(r["count"])
    import math

    for r in rows:
        cs = per[r.event_type]
        n, s, ssq = len(cs), sum(cs), sum(c * c for c in cs)
        assert r.n_days == n and r.n_events == s
        exp = (n * ssq - s * s) / (n * s)
        assert r.fano == math.floor(exp * 1e6) / 1e6

    # sanity: a constant series has Fano 0, a Poisson-ish one ~1 —
    # all real values must be finite and non-negative
    for r in rows:
        assert r.fano is not None and r.fano >= 0.0


def test_squares_on_known_graph(spark):
    """C4 (a 4-cycle) has exactly 1 square = sum C(w,2) over both
    diagonals with w=2 each -> 2 diagonal pairs... verify the exact
    census semantics on K4 and C4 via direct SQL."""
    # Build edges as a temp view and run the operator's core rollup
    # logic inline (the operator itself is pinned to the co-purchase
    # graph; here we pin the math).
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "src bigint, dst bigint"
    )
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    adj = sym.select(F.col("src").alias("center"), F.col("dst").alias("leaf"))
    l1, l2 = adj.alias("l1"), adj.alias("l2")
    pairs = (
        l1.join(
            l2,
            (F.col("l1.center") == F.col("l2.center"))
            & (F.col("l1.leaf") < F.col("l2.leaf")),
        )
        .groupBy(F.col("l1.leaf").alias("a"), F.col("l2.leaf").alias("c"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    agg = pairs.agg(
        F.sum(F.expr("(w * (w - 1)) div 2")).alias("n_squares")
    ).first()
    # C4: diagonals (1,3) via centers {2,4} and (2,4) via centers
    # {1,3} -> w=2 twice -> sum C(2,2) = 2 (each square counted once
    # per diagonal).
    assert agg.n_squares == 2


def test_pq_rerank_recall_dominates_adc(spark):
    """The exact-L2 refine step can only help: mean rerank recall
    must be >= mean plain-ADC recall, and strictly positive."""
    from postgres_s3_etl_spark.operators.similarity import (
        sim_search_pq_recall,
        sim_search_pq_rerank,
    )

    plain = {r.probe_id: r.recall
             for r in sim_search_pq_recall(spark, SF_DIR).collect()}
    rer = {r.probe_id: r.recall
           for r in sim_search_pq_rerank(spark, SF_DIR).collect()}
    assert set(plain) == set(rer)
    mp = sum(plain.values()) / len(plain)
    mr = sum(rer.values()) / len(rer)
    assert mr >= mp - 1e-9, (mr, mp)
    assert mr > 0.0


def test_cms_overestimate_only(spark):
    """Count-Min point queries are provably >= the true count."""
    from postgres_s3_etl_spark.operators.events import (
        q_events_countmin_topk,
    )

    rows = q_events_countmin_topk(spark, SF_DIR).collect()
    # sf0.001 has only 15 distinct users — top-20 returns all of them
    assert len(rows) == 15
    for r in rows:
        assert r.cms_estimate >= r.exact_count
        assert r.overestimate == r.cms_estimate - r.exact_count


def test_haar_energy_parseval(spark):
    """Unnormalized-Haar identity: at each level, Σ(prev²) =
    (Σ approx² + Σ detail²) / 2 — check total detail energy against
    a direct numpy Haar of the same padded daily series."""
    import numpy as np

    from postgres_s3_etl_spark.operators.timeseries import (
        HAAR_LEN,
        q_events_haar_energy,
    )

    daily = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(F.to_date("ts").alias("d"))
        .count()
        .orderBy("d")
        .collect()
    )
    s = np.zeros(HAAR_LEN, dtype=np.int64)
    s[: len(daily)] = [r["count"] for r in daily]
    expected = {}
    cur = s
    for lvl in range(1, 6):
        d = cur[0::2] - cur[1::2]
        cur = cur[0::2] + cur[1::2]
        expected[lvl] = int((d.astype(object) ** 2).sum())
    rows = {r.level: r for r in q_events_haar_energy(spark, SF_DIR).collect()}
    assert set(rows) == set(expected)
    for lvl, e in expected.items():
        assert rows[lvl].detail_energy == e
        assert rows[lvl].n_coeffs == HAAR_LEN >> lvl


def test_lsh_pr_curve_shape(spark):
    """Recall must be non-decreasing in τ (banding is built to catch
    HIGH-similarity pairs) and precision/recall bounded."""
    from postgres_s3_etl_spark.operators.dedup import dedup_lsh_pr_curve

    rows = sorted(
        dedup_lsh_pr_curve(spark, SF_DIR).collect(), key=lambda r: r.tau
    )
    assert [r.tau for r in rows] == [0.2, 0.4, 0.6, 0.8]
    prev = -1.0
    for r in rows:
        assert r.tp <= r.n_candidates and r.tp <= r.n_true_pairs
        if r.precision is not None:
            assert 0.0 <= r.precision <= 1.0
        if r.recall is not None:
            assert 0.0 <= r.recall <= 1.0
            assert r.recall >= prev - 1e-9
            prev = r.recall


def test_pq_distortion_monotone_in_m(spark):
    """More subquantizers -> finer product grid -> total distortion
    cannot increase."""
    from postgres_s3_etl_spark.operators.similarity import (
        embedding_pq_distortion_curve,
    )

    rows = sorted(
        embedding_pq_distortion_curve(spark, SF_DIR).collect(),
        key=lambda r: r.m_subquantizers,
    )
    assert [r.m_subquantizers for r in rows] == [2, 4, 8]
    assert all(r.n_vectors == rows[0].n_vectors for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert b.total_distortion <= a.total_distortion + 1e-6


def test_banding_tradeoff_monotone(spark):
    """More bands -> shorter band rows -> looser buckets: candidate
    count must be non-decreasing in n_bands, and the implied
    thresholds strictly decreasing."""
    from postgres_s3_etl_spark.operators.dedup import (
        dedup_banding_tradeoff,
    )

    rows = sorted(
        dedup_banding_tradeoff(spark, SF_DIR).collect(),
        key=lambda r: r.n_bands,
    )
    assert [r.n_bands for r in rows] == [2, 4, 8]
    for a, b in zip(rows, rows[1:]):
        assert b.n_candidate_pairs >= a.n_candidate_pairs
        assert b.est_threshold < a.est_threshold
    for r in rows:
        assert r.n_bands * r.rows_per_band == 16


def test_nprobe_curve_monotone(spark):
    """Searching more cells can only find more true neighbors:
    recall must be non-decreasing in nprobe."""
    from postgres_s3_etl_spark.operators.similarity import (
        sim_search_ivf_nprobe_curve,
    )

    rows = sorted(
        sim_search_ivf_nprobe_curve(spark, SF_DIR).collect(),
        key=lambda r: r.nprobe,
    )
    assert [r.nprobe for r in rows] == [1, 2, 4]
    for a, b in zip(rows, rows[1:]):
        assert b.found >= a.found
        assert b.mean_recall >= a.mean_recall - 1e-9
    for r in rows:
        assert r.n_pairs == r.n_probes * 5


def test_recall_curve_pairs_consistent(spark):
    """n_pairs = n_probes * k at every cut, and recall bounded."""
    from postgres_s3_etl_spark.operators.similarity import (
        sim_search_recall_curve,
    )

    rows = sim_search_recall_curve(spark, SF_DIR).collect()
    assert [r.k for r in sorted(rows, key=lambda r: r.k)] == [1, 3, 5]
    for r in rows:
        assert r.n_pairs == r.n_probes * r.k
        assert 0 <= r.found <= r.n_pairs
        assert 0.0 <= r.mean_recall <= 1.0


def test_km_ci_brackets_survival(spark):
    """Greenwood bands must bracket the point estimate, stay in
    [0,1], and the survival column must match the base KM curve."""
    from postgres_s3_etl_spark.operators.analytics import (
        q_customer_survival_km,
        q_customer_survival_km_ci,
    )

    base = {
        r.duration_days: r.survival
        for r in q_customer_survival_km(spark, SF_DIR).collect()
    }
    rows = q_customer_survival_km_ci(spark, SF_DIR).collect()
    assert rows and set(base) == {r.duration_days for r in rows}
    for r in rows:
        assert 0.0 <= r.ci_lo <= r.survival <= r.ci_hi <= 1.0
        assert abs(r.survival - base[r.duration_days]) < 1e-9


def test_modularity_identities(spark):
    """Partition identities: Σ n_members = |V|, Σ internal_edges ≤
    m, Σ degree_sum = 2m, and Q = Σ contributions ∈ [−1, 1]."""
    from postgres_s3_etl_spark.operators.graph import (
        copurchase_edges,
        graph_modularity,
    )

    rows = graph_modularity(spark, SF_DIR).collect()
    assert rows
    edges = copurchase_edges(spark, SF_DIR)
    m = edges.count()
    n_nodes = (
        edges.select(F.col("src").alias("n"))
        .unionAll(edges.select(F.col("dst").alias("n")))
        .distinct()
        .count()
    )
    assert sum(r.n_members for r in rows) == n_nodes
    assert sum(r.internal_edges for r in rows) <= m
    assert sum(r.degree_sum for r in rows) == 2 * m
    q = sum(r.q_contrib for r in rows)
    assert -1.0 <= q <= 1.0


def test_readability_bounds(spark):
    from postgres_s3_etl_spark.operators.text_analysis import (
        text_readability,
    )

    rows = text_readability(spark, SF_DIR).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.n_syllables >= r.n_words >= 1
        assert r.syll_per_word >= 1.0
        assert r.flesch <= 206.835 - 1.015 - 84.6
