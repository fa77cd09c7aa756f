"""Round-10 operators: mel-filterbank energies (numpy cross-check of
the residue-folded DFT + literal-triangle filterbank contract)."""

from __future__ import annotations

import math

import numpy as np

from tests.conftest import SF_DIR, assert_matches_oracle


def test_mel_energy_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "mm_audio_mel_energy")


def test_mel_filterbank_is_well_formed():
    from postgres_s3_etl_spark.operators.multimodal import (
        MEL_PERIODS,
        N_MEL_FILTERS,
        mel_filter_weights,
    )

    wts = mel_filter_weights()
    assert all(0.0 < w <= 1.0 for _, _, w in wts)
    assert all(p in MEL_PERIODS for _, p, _ in wts)
    filters = {m for m, _, _ in wts}
    assert filters == set(range(N_MEL_FILTERS))
    # triangles overlap: every interior bin serves >= 1 filter, and
    # adjacent filters share bins somewhere (mel-spaced coverage)
    assert len({p for _, p, _ in wts}) >= len(MEL_PERIODS) - 2


def test_mel_energy_cross_checks_numpy(spark):
    """Recompute each asset's bin powers with a straight O(n·P) numpy
    DFT (no residue folding, no DECIMAL pinning) and apply the same
    literal filterbank: the engine's truncated pipeline must agree to
    ~1e-4 (6-decimal truncation per bin power + final sum)."""
    from postgres_s3_etl_spark.operators.multimodal import (
        MEL_PERIODS,
        _wav_sample,
        mel_filter_weights,
        mm_audio_mel_energy,
    )

    got = {
        (r.asset_id, r.filter_id): r.mel_energy
        for r in mm_audio_mel_energy(spark, SF_DIR).collect()
    }
    wts = mel_filter_weights()
    for aid in (0, 7, 23, 47):
        n = 1000 + 10 * aid
        s = np.array([_wav_sample(aid, k) for k in range(n)], dtype=np.float64)
        k = np.arange(n)
        powers = {}
        for p in MEL_PERIODS:
            ph = 2.0 * math.pi * (k % p) / p
            a = float((s * np.cos(ph)).sum())
            b = float((s * np.sin(ph)).sum())
            powers[p] = (a * a + b * b) / (n * n)
        for m in sorted({m for m, _, _ in wts}):
            want = sum(w * powers[p] for mm, p, w in wts if mm == m)
            assert abs(got[(aid, m)] - want) < 1e-4, (aid, m)


def _prog_jpeg(w, h, scans):
    """Assemble a progressive JFIF from (sos_body, bitwriter) scans
    using the module's standing tables."""
    import struct

    from postgres_s3_etl_spark.operators.multimodal import (
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _JPEG_PROG_AC_BITS,
        _JPEG_PROG_AC_VALS,
        _JPEG_QTABLE,
    )

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = (
        b"\xff\xd8"
        + seg(0xFFDB, bytes([0x00]) + bytes(_JPEG_QTABLE))
        + seg(0xFFC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        + seg(
            0xFFC4,
            bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
            + bytes([0x10]) + bytes(_JPEG_PROG_AC_BITS)
            + bytes(_JPEG_PROG_AC_VALS),
        )
    )
    for body, bw in scans:
        out += seg(0xFFDA, bytes(body)) + bw.flush()
    return out + b"\xff\xd9"


class TestAcRefinementScans:
    """Round-10: the AC successive-approximation refinement arm of
    the progressive decoder (T.81 G.1.2.3), driven by hand-built
    4-scan streams — correction bits on nonzero-history
    coefficients, s=1 new significances (positive and negative),
    ZRL over zero history, and EOB-run refinement across blocks."""

    def _huffs(self):
        from postgres_s3_etl_spark.operators.multimodal import (
            _JPEG_DC_BITS,
            _JPEG_DC_VALS,
            _JPEG_PROG_AC_BITS,
            _JPEG_PROG_AC_VALS,
            _huff_canonical,
        )

        return (
            _huff_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS),
            _huff_canonical(_JPEG_PROG_AC_BITS, _JPEG_PROG_AC_VALS),
        )

    def _expected(self, coefs_zigzag):
        from postgres_s3_etl_spark.operators.multimodal import (
            _JPEG_QTABLE,
            _JPEG_ZIGZAG,
            _idct_matrix,
        )

        f = np.zeros(64)
        for k, v in coefs_zigzag.items():
            f[_JPEG_ZIGZAG[k]] = v * _JPEG_QTABLE[k]
        A = _idct_matrix()
        return np.clip(
            np.round(A @ f.reshape(8, 8) @ A.T + 128.0), 0, 255
        ).astype(np.uint8)

    def test_refinement_corrections_new_significances_and_zrl(self):
        """One block; true AC values z1=+3, z2=+1, z3=-2, z5=-1,
        z22=+1. First pass at Al=1 codes only z1, z3 (the others
        truncate to zero); the refinement scan must (a) set z1's low
        bit via a correction bit, (b) leave z3 unchanged via a 0
        correction bit, (c) place the new ±1 significances with
        r=0/r=1 runs, (d) cross 16 positions of zero history with
        ZRL, and (e) EOB out with no trailing bits."""
        from postgres_s3_etl_spark.operators.multimodal import (
            _BitWriter,
            decode_jpeg_progressive_gray,
        )

        dc_huf, ac_huf = self._huffs()
        w = lambda bw, sym: bw.write(*ac_huf[sym])  # noqa: E731
        # scan 1: DC first at Al=1, dc = 0
        s1 = _BitWriter()
        s1.write(*dc_huf[0])
        # scan 2: DC refinement, bit 0
        s2 = _BitWriter()
        s2.write(0, 1)
        # scan 3: AC first, Al=1 -> z1 = +1, (run 1) z3 = -1, EOB
        s3 = _BitWriter()
        w(s3, 0x01)
        s3.write(1, 1)
        w(s3, 0x11)
        s3.write(0, 1)  # extend(0, 1) = -1
        w(s3, 0x00)
        # scan 4: AC refinement Ah=1 Al=0 (decoder read order):
        #   0x01, sign(+), corr z1=1        -> z2 := +1, z1 2->3
        #   0x11, sign(-), corr z3=0        -> z5 := -1, z3 stays -2
        #   ZRL (16 zero-history: z6..z21)
        #   0x01, sign(+)                   -> z22 := +1
        #   EOB (no remaining nonzero)
        s4 = _BitWriter()
        w(s4, 0x01)
        s4.write(1, 1)
        s4.write(1, 1)
        w(s4, 0x11)
        s4.write(0, 1)
        s4.write(0, 1)
        w(s4, 0xF0)
        w(s4, 0x01)
        s4.write(1, 1)
        w(s4, 0x00)
        payload = _prog_jpeg(
            8,
            8,
            [
                ([1, 1, 0x00, 0, 0, 0x01], s1),
                ([1, 1, 0x00, 0, 0, 0x10], s2),
                ([1, 1, 0x10, 1, 63, 0x01], s3),
                ([1, 1, 0x10, 1, 63, 0x10], s4),
            ],
        )
        img = decode_jpeg_progressive_gray(payload)
        assert img is not None and img.shape == (8, 8)
        ref = self._expected({1: 3, 2: 1, 3: -2, 5: -1, 22: 1})
        assert (img == ref).all()

    def test_eobrun_refines_covered_blocks(self):
        """Two blocks, refinement as ONE EOB2 run: the run must still
        deliver each covered block's correction bits in order (block0
        z1 +2->+3 via bit 1, block1 z1 stays +2 via bit 0)."""
        from postgres_s3_etl_spark.operators.multimodal import (
            _BitWriter,
            decode_jpeg_progressive_gray,
        )

        dc_huf, ac_huf = self._huffs()
        w = lambda bw, sym: bw.write(*ac_huf[sym])  # noqa: E731
        s1 = _BitWriter()
        s1.write(*dc_huf[0])
        s1.write(*dc_huf[0])
        s2 = _BitWriter()
        s2.write(0, 1)
        s2.write(0, 1)
        s3 = _BitWriter()
        for _ in range(2):  # each block: z1 = +1 at Al=1, then EOB
            w(s3, 0x01)
            s3.write(1, 1)
            w(s3, 0x00)
        s4 = _BitWriter()
        w(s4, 0x10)      # EOBn r=1: eobrun = 2^1 + extra
        s4.write(0, 1)   # extra = 0 -> covers both blocks
        s4.write(1, 1)   # correction: block0 z1 -> +3
        s4.write(0, 1)   # correction: block1 z1 stays +2
        payload = _prog_jpeg(
            16,
            8,
            [
                ([1, 1, 0x00, 0, 0, 0x01], s1),
                ([1, 1, 0x00, 0, 0, 0x10], s2),
                ([1, 1, 0x10, 1, 63, 0x01], s3),
                ([1, 1, 0x10, 1, 63, 0x10], s4),
            ],
        )
        img = decode_jpeg_progressive_gray(payload)
        assert img is not None and img.shape == (8, 16)
        assert (img[:, :8] == self._expected({1: 3})).all()
        assert (img[:, 8:] == self._expected({1: 2})).all()

    def test_truncated_refinement_scan_rejected(self):
        """An empty refinement bitstream exhausts the bit reader —
        the decoder must return None, not a partial guess."""
        from postgres_s3_etl_spark.operators.multimodal import (
            _BitWriter,
            decode_jpeg_progressive_gray,
        )

        dc_huf, _ = self._huffs()
        s1 = _BitWriter()
        s1.write(*dc_huf[0])
        payload = _prog_jpeg(
            8,
            8,
            [
                ([1, 1, 0x00, 0, 0, 0x01], s1),
                ([1, 1, 0x10, 1, 63, 0x10], _BitWriter()),
            ],
        )
        assert decode_jpeg_progressive_gray(payload) is None


def _doc_hash_split(x) -> str:
    import hashlib

    v = int(hashlib.md5(str(x).encode()).hexdigest()[:7], 16)
    return "train" if v % 10 < 8 else "eval"


def test_leakage_safe_split_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_split_leakage_safe")


def test_no_cluster_straddles_the_split(spark):
    from pyspark.sql import functions as F

    from postgres_s3_etl_spark.catalog import load_table
    from postgres_s3_etl_spark.operators.dedup import (
        leakage_safe_split_frame,
    )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "source", "text"
    )
    frame = leakage_safe_split_frame(docs)
    bad = (
        frame.groupBy("cluster")
        .agg(F.countDistinct("split").alias("ns"))
        .where(F.col("ns") > 1)
        .count()
    )
    assert bad == 0
    # both splits exist and the cluster hash realizes ~80/20
    counts = {r.split: r.c for r in frame.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == {"train", "eval"}


def test_doc_hash_split_would_leak_but_cluster_split_does_not(spark):
    """Plant two verbatim copies whose DOC-level hashes land on
    opposite sides: the naive split leaks the pair into eval, the
    cluster split keeps them together."""
    from postgres_s3_etl_spark.operators.dedup import (
        leakage_safe_split_frame,
    )

    # find a (train, eval) doc-hash pair deterministically
    i = next(x for x in range(1000) if _doc_hash_split(x) == "train")
    j = next(x for x in range(1000) if _doc_hash_split(x) == "eval")
    dup = " ".join(f"tok{t}" for t in range(30))
    other = " ".join(f"zzz{t}" for t in range(30))
    docs = spark.createDataFrame(
        [(i, "s", dup), (j, "s", dup), (901, "s", other)],
        "doc_id long, source string, text string",
    )
    rows = {r.doc_id: r for r in leakage_safe_split_frame(docs).collect()}
    assert _doc_hash_split(i) != _doc_hash_split(j)  # naive would leak
    assert rows[i].cluster == rows[j].cluster == min(i, j)
    assert rows[i].split == rows[j].split  # cluster split does not


def test_rolling_ladder_composition_equals_direct_polynomial():
    """Algebraic invariant of the span-ladder rewrite, for ANY token
    digest sequence: the dyadic composition h₂ʟ[i] =
    (hʟ[i]·Bᴸ + hʟ[i+L]) mod P must equal the DIRECT degree-(2L−1)
    polynomial hash Σ d_j·B^(2L−1−j) mod P at every position —
    hypothesis-driven (random digests, both prime fields)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from postgres_s3_etl_spark.operators.text_analysis import (
        ROLL_B1,
        ROLL_B2,
        ROLL_P1,
        ROLL_P2,
        SPAN_LADDER,
    )

    @given(
        digests=st.lists(
            st.integers(min_value=0, max_value=ROLL_P2 - 1),
            min_size=1,
            max_size=80,
        )
    )
    @settings(max_examples=100, deadline=None)
    def check(digests):
        for b, p in ((ROLL_B1, ROLL_P1), (ROLL_B2, ROLL_P2)):
            d = [x % p for x in digests]
            levels = {1: d}
            L = 1
            while L < SPAN_LADDER[-1]:
                prev = levels[L]
                levels[2 * L] = [
                    (prev[i] * pow(b, L, p) + prev[i + L]) % p
                    for i in range(len(prev) - L)
                ]
                L *= 2
            for L in SPAN_LADDER:
                for i, got in enumerate(levels.get(L, [])):
                    direct = 0
                    for j in range(L):
                        direct = (direct * b + d[i + j]) % p
                    assert got == direct, (L, i)

    check()


def test_spearman_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "q_lineitem_spearman")


def test_spearman_against_pure_python(spark, monkeypatch):
    """Mid-rank Spearman on a small frame with ties, cross-checked
    against a from-scratch average-rank computation."""
    import postgres_s3_etl_spark.operators.analytics as an

    xs = [1.0, 2.0, 2.0, 3.0, 4.0, 4.0, 4.0, 5.0]
    ys = [2.0, 1.0, 3.0, 3.0, 5.0, 4.0, 6.0, 7.0]
    df = spark.createDataFrame(
        [(x, y) for x, y in zip(xs, ys)],
        "l_quantity double, l_extendedprice double",
    )
    monkeypatch.setattr(an, "load_table", lambda s, d, n: df)
    [row] = an.q_lineitem_spearman(spark, "x").collect()

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            r = (i + 1 + j) / 2.0
            for k in range(i, j):
                ranks[order[k]] = r
            i = j
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx = sum(rx) / n
    num = sum(a * b for a, b in zip(rx, ry)) - n * mx * mx
    den = (
        (sum(a * a for a in rx) - n * mx * mx)
        * (sum(b * b for b in ry) - n * mx * mx)
    ) ** 0.5
    assert row.n_rows == n
    assert abs(row.spearman_rho - num / den) < 1e-5


def test_spearman_bounds_on_lineitem(spark):
    """The synthetic testdata draws quantity and price independently,
    so ρ should be a valid correlation near zero (the designed-ties
    test above carries the exact-value semantics)."""
    from postgres_s3_etl_spark.operators.analytics import (
        q_lineitem_spearman,
    )

    [row] = q_lineitem_spearman(spark, SF_DIR).collect()
    assert -1.0 <= row.spearman_rho <= 1.0
    assert abs(row.spearman_rho) < 0.1


def test_curation_funnel_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "text_curation_funnel")


def test_curation_funnel_is_monotone(spark):
    from collections import defaultdict

    from postgres_s3_etl_spark.operators.curation import (
        text_curation_funnel,
    )

    rows = text_curation_funnel(spark, "/root/testdata/sf0.01").collect()
    by_src = defaultdict(dict)
    for r in rows:
        by_src[r.source][r.stage] = (r.n_docs, r.n_tokens)
    for src, stages in by_src.items():
        assert set(stages) == set(range(6)), src
        for s in range(1, 6):
            assert stages[s][0] <= stages[s - 1][0], (src, s)
            assert stages[s][1] <= stages[s - 1][1], (src, s)


def test_curation_funnel_every_stage_bites(spark, monkeypatch):
    """Planted corpus where each stage drops exactly one doc: a
    punctuation-heavy doc (quality), an exact copy (dedup), a
    one-word paraphrase (near-dedup), and an eval-8-gram carrier
    (decon)."""
    import postgres_s3_etl_spark.operators.curation as cu

    words = lambda p: " ".join(f"{p}{i}" for i in range(40))  # noqa: E731
    ev = words("e")
    t2 = words("b")
    t4 = words("c")
    t4v = t4.replace("c39", "zzz")      # one word changed -> near-dup
    contaminated = (
        " ".join(f"d{i}" for i in range(16))
        + " " + " ".join(f"e{i}" for i in range(8))  # eval 8-gram
        + " " + " ".join(f"d{i}" for i in range(16, 32))
    )
    lowq = words("a") + " " + " ".join(["."] * 8)
    docs = spark.createDataFrame(
        [
            (0, "s", ev),            # eval split (doc_id % 50 == 0)
            (1, "s", lowq),          # dies at quality_gate
            (2, "s", t2),
            (3, "s", t2),            # exact copy -> dies at exact_dedup
            (4, "s", t4),
            (5, "s", t4v),           # paraphrase -> dies at near_dedup
            (6, "s", contaminated),  # dies at decontamination
            (7, "s", words("f")),    # survives everything
        ],
        "doc_id long, source string, text string",
    )
    monkeypatch.setattr(cu, "load_table", lambda spark, sf_dir, name: docs)
    rows = {r.stage: r for r in cu.text_curation_funnel(spark, "x").collect()}
    assert [rows[s].n_docs for s in range(6)] == [7, 6, 5, 4, 3, 3]
    assert rows[0].stage_name == "raw"
    assert rows[5].stage_name == "source_caps"


def test_ssim_pairs_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "mm_image_ssim_pairs")


def _ssim_np(a, b):
    from postgres_s3_etl_spark.operators.multimodal import (
        SSIM_C1,
        SSIM_C2,
    )

    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mx, my = a.mean(), b.mean()
    vx, vy = a.var(), b.var()
    cov = (a * b).mean() - mx * my
    return ((2 * mx * my + SSIM_C1) * (2 * cov + SSIM_C2)) / (
        (mx * mx + my * my + SSIM_C1) * (vx + vy + SSIM_C2)
    )


def test_ssim_cross_checks_numpy_and_separates(spark):
    from postgres_s3_etl_spark.operators.multimodal import (
        decode_pgm,
        encode_phash_pgm,
        mm_image_ssim_pairs,
    )

    got = {
        (r.asset_a, r.asset_b): r.ssim
        for r in mm_image_ssim_pairs(spark, "ignored").collect()
    }
    assert got, "no pairs scored"
    # numpy cross-check on two planted pairs (exact integer moments
    # -> only the final floor-6 separates them)
    for base in (0, 8):
        va = decode_pgm(encode_phash_pgm(base, base, False))
        vb = decode_pgm(encode_phash_pgm(99, base, True))
        want = _ssim_np(va, vb)
        key = (base, 40 + base // 4)
        assert abs(got[key] - want) < 2e-6, (key, got[key], want)
    # re-encodes score near 1; unrelated bases score far lower —
    # the metric genuinely separates (negative control in numpy,
    # since phash correctly never pairs unrelated bases)
    assert all(v > 0.98 for v in got.values())
    ua = decode_pgm(encode_phash_pgm(0, 0, False))
    ub = decode_pgm(encode_phash_pgm(4, 4, False))
    assert _ssim_np(ua, ub) < 0.85


def test_video_phash_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "mm_video_phash_dedup")


def test_video_phash_finds_exactly_the_planted_reencodes(spark):
    from postgres_s3_etl_spark.operators.multimodal import (
        N_VPHASH_BASE,
        VPHASH_FRAMES,
        mm_video_phash_dedup,
    )

    rows = mm_video_phash_dedup(spark, "ignored").collect()
    planted = {
        (b, N_VPHASH_BASE + b // 3) for b in range(0, N_VPHASH_BASE, 3)
    }
    got = {(r.asset_a, r.asset_b) for r in rows}
    assert got == planted  # no cross-base false positives survive
    for r in rows:
        assert r.is_dup
        assert r.n_frames_a_matched == VPHASH_FRAMES
        assert r.min_hamming <= 1


def test_video_phash_separation_premise():
    """The build-time claim: variant frames hash within 1 bit of
    their base frame; distinct bases stay >= 12 bits apart."""
    import itertools

    from postgres_s3_etl_spark.operators.multimodal import (
        N_VPHASH_BASE,
        PHASH_GRID_X,
        PHASH_GRID_Y,
        VPHASH_FRAMES,
        VPHASH_H,
        VPHASH_W,
        _vphash_pixel,
        decode_y4m,
        encode_vphash_y4m,
    )

    def dhash_frames(payload):
        w, h, frames = decode_y4m(payload)
        gxi = (np.arange(w) * PHASH_GRID_X) // w
        gyi = (np.arange(h) * PHASH_GRID_Y) // h
        cell = gyi[:, None] * PHASH_GRID_X + gxi[None, :]
        n_cells = PHASH_GRID_X * PHASH_GRID_Y
        cnts = np.bincount(cell.ravel(), minlength=n_cells)
        out = []
        for fr in frames:
            sums = np.bincount(
                cell.ravel(), weights=fr[0].astype(np.int64).ravel(),
                minlength=n_cells,
            ).astype(np.int64)
            means = (sums // cnts).reshape(PHASH_GRID_Y, PHASH_GRID_X)
            rows = []
            for gy in range(PHASH_GRID_Y):
                byte = 0
                for cx in range(PHASH_GRID_X - 1):
                    if means[gy, cx + 1] > means[gy, cx]:
                        byte |= 1 << cx
                rows.append(byte)
            out.append(rows)
        return out

    ham = lambda r1, r2: sum(  # noqa: E731
        bin(a ^ b).count("1") for a, b in zip(r1, r2)
    )
    bases = {
        a: dhash_frames(encode_vphash_y4m(a, a, False))
        for a in range(0, N_VPHASH_BASE, 2)
    }
    var = dhash_frames(encode_vphash_y4m(99, 0, True))
    assert all(
        ham(var[t], bases[0][t]) <= 1 for t in range(VPHASH_FRAMES)
    )
    cross = min(
        ham(fa, fb)
        for (a, fra), (b, frb) in itertools.combinations(bases.items(), 2)
        for fa in fra
        for fb in frb
    )
    assert cross >= 12
    # the closed form is what the encoder actually wrote
    w, h, frames = decode_y4m(encode_vphash_y4m(3, 3, False))
    assert frames[2][0][5, 7] == _vphash_pixel(3, 2, 7, 5)


def test_mfcc_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "mm_audio_mfcc")


def test_mfcc_dct_basis_is_well_formed():
    from postgres_s3_etl_spark.operators.multimodal import (
        N_MEL_FILTERS,
        N_MFCC,
        mfcc_dct_weights,
    )

    wts = mfcc_dct_weights()
    # k=0 row is all ones (the log-energy sum)
    k0 = [(m, w) for k, m, w in wts if k == 0]
    assert len(k0) == N_MEL_FILTERS and all(w == 1.0 for _, w in k0)
    assert {k for k, _, _ in wts} == set(range(N_MFCC))
    assert all(-1.0 <= w <= 1.0 for _, _, w in wts)


def test_mfcc_cross_checks_numpy(spark):
    """Full-precision numpy pipeline (true DFT powers -> mel -> log
    -> exact DCT-II) must agree with the truncation-pinned engine
    output to ~1e-4."""
    from postgres_s3_etl_spark.operators.multimodal import (
        MEL_PERIODS,
        _wav_sample,
        mel_filter_weights,
        mfcc_dct_weights,
        mm_audio_mfcc,
    )

    got = {
        (r.asset_id, r.k): r.mfcc
        for r in mm_audio_mfcc(spark, SF_DIR).collect()
    }
    melw, dctw = mel_filter_weights(), mfcc_dct_weights()
    for aid in (0, 11, 47):
        n = 1000 + 10 * aid
        s = np.array([_wav_sample(aid, j) for j in range(n)], dtype=np.float64)
        j = np.arange(n)
        powers = {}
        for p in MEL_PERIODS:
            ph = 2.0 * math.pi * (j % p) / p
            a = float((s * np.cos(ph)).sum())
            b = float((s * np.sin(ph)).sum())
            powers[p] = (a * a + b * b) / (n * n)
        logmel = {}
        for m in {m for m, _, _ in melw}:
            e = sum(w * powers[p] for mm, p, w in melw if mm == m)
            logmel[m] = math.log(1.0 + e)
        for k in {k for k, _, _ in dctw}:
            want = sum(w * logmel[m] for kk, m, w in dctw if kk == k)
            assert abs(got[(aid, k)] - want) < 1e-3, (aid, k)


class TestColorProgressive:
    def test_round_trip_exact(self):
        from postgres_s3_etl_spark.operators.multimodal import (
            _JPEG_COLOR_PLANES,
            decode_jpeg_progressive,
            encode_jpeg_color_progressive,
        )

        for aid in (0, 3, 7, 47):
            w, h = 16 + 8 * (aid % 4), 16 + 8 * ((aid // 2) % 2)
            planes = decode_jpeg_progressive(
                encode_jpeg_color_progressive(aid, w, h)
            )
            assert planes is not None and planes.shape == (3, h, w)
            for ci, (_, ka, kx, ky) in enumerate(_JPEG_COLOR_PLANES):
                for by in range(h // 8):
                    for bx in range(w // 8):
                        blk = planes[
                            ci, by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                        ]
                        assert (
                            blk == (ka * aid + kx * bx + ky * by) % 256
                        ).all()

    def test_gray_wrapper_rejects_color_and_vice_versa(self):
        from postgres_s3_etl_spark.operators.multimodal import (
            decode_jpeg_progressive,
            decode_jpeg_progressive_gray,
            encode_jpeg_color_progressive,
            encode_jpeg_gray_progressive,
        )

        color = encode_jpeg_color_progressive(1, 16, 16)
        assert decode_jpeg_progressive_gray(color) is None
        gray = encode_jpeg_gray_progressive(1, 16, 16)
        planes = decode_jpeg_progressive(gray)
        assert planes is not None and planes.shape[0] == 1

    def test_subsampled_progressive_rejected(self):
        """Flip a component's sampling byte to 2x2: out of the 1x1
        scope — must return None, not mis-tile."""
        from postgres_s3_etl_spark.operators.multimodal import (
            decode_jpeg_progressive,
            encode_jpeg_color_progressive,
        )

        raw = bytearray(encode_jpeg_color_progressive(0, 16, 16))
        i = raw.find(b"\xff\xc2")
        # SOF2 body: len(2) prec(1) h(2) w(2) ncomp(1), comp0 at +10
        raw[i + 11] = 0x22
        assert decode_jpeg_progressive(bytes(raw)) is None

    def test_color_query_shape(self, spark, duck):
        from tests.conftest import assert_matches_oracle

        assert_matches_oracle(
            spark, duck, "mm_image_decode_jpeg_progressive_color"
        )


def test_spectral_flatness_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "mm_audio_spectral_flatness")


def test_spectral_flatness_cross_checks_numpy(spark):
    """Full-precision numpy recompute (true DFT powers -> log
    flatness) within the floor-6 truncation tolerance, and the
    Jensen bound: mean(ln(1+p)) <= ln(1 + mean(p)) so log_flatness
    <= 0 for every asset."""
    from postgres_s3_etl_spark.operators.multimodal import (
        MEL_PERIODS,
        _wav_sample,
        mm_audio_spectral_flatness,
    )

    rows = {
        r.asset_id: r
        for r in mm_audio_spectral_flatness(spark, SF_DIR).collect()
    }
    assert all(r.log_flatness <= 0.0 for r in rows.values())
    for aid in (0, 21, 47):
        n = 1000 + 10 * aid
        s = np.array([_wav_sample(aid, j) for j in range(n)], dtype=np.float64)
        j = np.arange(n)
        ps = []
        for p in MEL_PERIODS:
            ph = 2.0 * math.pi * (j % p) / p
            a = float((s * np.cos(ph)).sum())
            b = float((s * np.sin(ph)).sum())
            ps.append((a * a + b * b) / (n * n))
        want = sum(math.log(1 + x) for x in ps) / len(ps) - math.log(
            1 + sum(ps) / len(ps)
        )
        assert abs(rows[aid].log_flatness - want) < 1e-4, aid


def test_minhash_estimator_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "dedup_minhash_estimator")


def test_minhash_estimator_sanity(spark):
    """Estimates are valid 16ths in [0,1]; exact duplicates estimate
    1.0 exactly (every component of identical texts matches); the
    mean absolute error over the candidate set stays inside ~3
    estimator standard deviations (sigma <= 0.125 at 16 hashes)."""
    from postgres_s3_etl_spark.operators.dedup import (
        dedup_minhash_estimator,
    )

    rows = dedup_minhash_estimator(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_match_sig <= 16
        assert abs(r.est_jaccard - r.n_match_sig / 16) < 1e-6
        if r.jaccard == 1.0:
            assert r.n_match_sig == 16
    mae = sum(r.abs_err for r in rows) / len(rows)
    assert mae < 0.375, mae


def test_mel_energy_shape(spark):
    from postgres_s3_etl_spark.operators.multimodal import (
        N_MEL_FILTERS,
        N_WAV_ASSETS,
        mm_audio_mel_energy,
    )

    rows = mm_audio_mel_energy(spark, SF_DIR).collect()
    assert len(rows) == N_WAV_ASSETS * N_MEL_FILTERS
    assert all(r.mel_energy >= 0 for r in rows)
    assert all(r.n_bins >= 1 for r in rows)
