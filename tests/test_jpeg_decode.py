"""Round-trip and adversarial tests for the stdlib+numpy baseline
JPEG codec (round-6: the last decodable-format stub retired).

The driver-facing query only exercises the DC path (constant blocks
are the lossless construction the SQL oracle can mirror); these
tests additionally drive the AC run/size decode, ZRL, negative
coefficients, and the malformed-input gates with hand-built entropy
streams, comparing against an INDEPENDENT double-loop IDCT.
"""

from __future__ import annotations

import struct

import numpy as np

from postgres_s3_etl_spark.operators.multimodal import (
    N_JPEG_ASSETS,
    _BitWriter,
    _JPEG_AC_BITS,
    _JPEG_AC_VALS,
    _JPEG_DC_BITS,
    _JPEG_DC_VALS,
    _JPEG_QTABLE,
    _JPEG_ZIGZAG,
    _huff_canonical,
    decode_jpeg_gray,
    encode_jpeg_gray,
    mm_image_decode_jpeg,
)


def _expected_constant(a: int, w: int, h: int) -> np.ndarray:
    exp = np.zeros((h, w), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            exp[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = (
                29 * a + 7 * bx + 13 * by
            ) % 256
    return exp


def _split_at_scan(raw: bytes) -> tuple[bytes, int]:
    """(header bytes through SOS, scan-start offset)."""
    pos = 2
    while True:
        marker = raw[pos + 1]
        (ln,) = struct.unpack_from(">H", raw, pos + 2)
        if marker == 0xDA:
            return raw[: pos + 2 + ln], pos + 2 + ln
        pos += 2 + ln


def _idct_reference(coefs_natural: np.ndarray) -> np.ndarray:
    """Independent textbook IDCT: explicit O(64^2) double loop over
    the T.81 formula — shares no code with the decoder's matrix
    product."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    cu = (1 / np.sqrt(2)) if u == 0 else 1.0
                    cv = (1 / np.sqrt(2)) if v == 0 else 1.0
                    s += (
                        cu * cv * coefs_natural[v, u]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[y, x] = s / 4.0
    return out


class TestRoundTrip:
    def test_constant_blocks_exact(self):
        for a in (0, 1, 7, 13, 29, N_JPEG_ASSETS - 1):
            w, h = 16 + 8 * (a % 3), 16 + 8 * (a % 2)
            img = decode_jpeg_gray(encode_jpeg_gray(a, w, h))
            assert img is not None and img.shape == (h, w)
            np.testing.assert_array_equal(img, _expected_constant(a, w, h))

    def test_negative_dc_diffs_covered(self):
        # v varies block-to-block in both directions, so differential
        # DC takes the negative-extend path; exactness already pinned
        # above — here just assert the encoder actually emits a
        # negative diff for this geometry.
        a, w, h = 1, 32, 24
        vals = [
            (29 * a + 7 * bx + 13 * by) % 256
            for by in range(h // 8)
            for bx in range(w // 8)
        ]
        diffs = np.diff([v - 128 for v in vals])
        assert (diffs < 0).any() and (diffs > 0).any()


class TestAcPaths:
    def _build(self, writer_fn) -> bytes:
        """A single-block 8x8 JPEG with a custom entropy stream."""
        header, _ = _split_at_scan(encode_jpeg_gray(0, 8, 8))
        bw = _BitWriter()
        writer_fn(
            bw,
            _huff_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS),
            _huff_canonical(_JPEG_AC_BITS, _JPEG_AC_VALS),
        )
        return header + bw.flush() + b"\xff\xd9"

    def _check(self, writer_fn, coefs_zigzag: dict[int, int]):
        img = decode_jpeg_gray(self._build(writer_fn))
        assert img is not None and img.shape == (8, 8)
        nat = np.zeros((8, 8))
        for zz_idx, coef in coefs_zigzag.items():
            nat.flat[_JPEG_ZIGZAG[zz_idx]] = coef * _JPEG_QTABLE[zz_idx]
        exp = np.clip(np.round(_idct_reference(nat) + 128.0), 0, 255)
        np.testing.assert_array_equal(img.astype(np.float64), exp)

    def test_ac_sizes_and_runs(self):
        # DC=5 (cat 3), AC1=+1 (0x01), AC2=-3 (0x02), skip 1 then
        # AC4=+7 (0x11 run-1 would place at 4... spelled explicitly
        # below), skip 2 then -1 (0x21).
        def w(bw, dc, ac):
            c, ln = dc[3]; bw.write(c, ln); bw.write(0b101, 3)   # DC=+5
            c, ln = ac[0x01]; bw.write(c, ln); bw.write(1, 1)    # k1=+1
            c, ln = ac[0x02]; bw.write(c, ln); bw.write(0b00, 2) # k2=-3
            c, ln = ac[0x11]; bw.write(c, ln); bw.write(1, 1)    # skip1,k4=+1
            c, ln = ac[0x21]; bw.write(c, ln); bw.write(0, 1)    # skip2,k7=-1
            c, ln = ac[0x04]; bw.write(c, ln); bw.write(0b1001, 4)  # k8=+9
            c, ln = ac[0x00]; bw.write(c, ln)                    # EOB

        self._check(w, {0: 5, 1: 1, 2: -3, 4: 1, 7: -1, 8: 9})

    def test_zrl_long_zero_run(self):
        # ZRL jumps 16 zero coefficients, then a size-3 value lands
        # at zigzag index 17.
        def w(bw, dc, ac):
            c, ln = dc[0]; bw.write(c, ln)                        # DC=0
            c, ln = ac[0xF0]; bw.write(c, ln)                     # ZRL
            c, ln = ac[0x03]; bw.write(c, ln); bw.write(0b010, 3) # k17=-5
            c, ln = ac[0x00]; bw.write(c, ln)                     # EOB

        self._check(w, {17: -5})

    def test_full_block_no_eob(self):
        # k == 63 boundary: fill through the LAST zigzag index, where
        # the decoder must stop WITHOUT reading an EOB. Walk: DC →
        # k=1; 3 ZRLs → k=49; six 0x11 (skip 1, write, advance) →
        # writes at 50, 52, 54, 56, 58, 60, k=61; three 0x01 → writes
        # at 61, 62, 63, k=64 → loop exits, no EOB in the stream.
        def w(bw, dc, ac):
            c, ln = dc[0]; bw.write(c, ln)
            for _ in range(3):
                c, ln = ac[0xF0]; bw.write(c, ln)
            for _ in range(6):
                c, ln = ac[0x11]; bw.write(c, ln); bw.write(1, 1)
            for _ in range(3):
                c, ln = ac[0x01]; bw.write(c, ln); bw.write(1, 1)

        self._check(
            w,
            {k: 1 for k in (50, 52, 54, 56, 58, 60, 61, 62, 63)},
        )


class TestMalformed:
    def test_bad_magic(self):
        raw = encode_jpeg_gray(0, 16, 16)
        assert decode_jpeg_gray(b"\x00\x00" + raw[2:]) is None

    def test_truncated_header_and_scan(self):
        raw = encode_jpeg_gray(0, 16, 16)
        assert decode_jpeg_gray(raw[:40]) is None
        assert decode_jpeg_gray(raw[:-12]) is None  # scan cut short

    def test_progressive_rejected(self):
        raw = bytearray(encode_jpeg_gray(0, 16, 16))
        # flip SOF0 (FFC0) to SOF2 (FFC2 progressive)
        i = raw.find(b"\xff\xc0")
        raw[i + 1] = 0xC2
        assert decode_jpeg_gray(bytes(raw)) is None

    def test_16bit_quant_table_rejected(self):
        raw = bytearray(encode_jpeg_gray(0, 16, 16))
        i = raw.find(b"\xff\xdb")
        raw[i + 4] = 0x10  # Pq=1: 16-bit precision
        assert decode_jpeg_gray(bytes(raw)) is None

    def test_stuffed_ff_bytes_survive_and_clamp(self):
        # Hand-build a 16x8 two-block stream whose bit layout puts 8
        # consecutive 1-bits on a byte boundary → the writer emits
        # FF 00 and the decoder must unstuff it. Block 2's DC (270)
        # also overflows 255, exercising the output clamp.
        header, _ = _split_at_scan(encode_jpeg_gray(0, 16, 8))
        dc = _huff_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS)
        ac = _huff_canonical(_JPEG_AC_BITS, _JPEG_AC_VALS)
        bw = _BitWriter()
        c, ln = dc[4]; bw.write(c, ln); bw.write(0b1111, 4)   # DC1=+15
        c, ln = ac[0x04]; bw.write(c, ln); bw.write(0b1111, 4)  # k1=+15
        c, ln = ac[0x00]; bw.write(c, ln)                     # EOB
        c, ln = dc[8]; bw.write(c, ln); bw.write(0xFF, 8)     # DC2=+255
        c, ln = ac[0x00]; bw.write(c, ln)                     # EOB
        scan = bw.flush()
        assert b"\xff\x00" in scan, "layout failed to produce FF"
        img = decode_jpeg_gray(header + scan + b"\xff\xd9")
        assert img is not None and img.shape == (8, 16)
        # block 1: DC 15, AC[zz1] 15; block 2: DC 15+255=270 (clamps)
        nat1 = np.zeros((8, 8))
        nat1.flat[0] = 15 * _JPEG_QTABLE[0]
        nat1.flat[_JPEG_ZIGZAG[1]] = 15 * _JPEG_QTABLE[1]
        exp1 = np.clip(np.round(_idct_reference(nat1) + 128.0), 0, 255)
        np.testing.assert_array_equal(img[:, :8].astype(np.float64), exp1)
        assert (img[:, 8:] == 255).all()  # 270 + 128 clamps to 255


def test_jpeg_query_shape(spark):
    rows = mm_image_decode_jpeg(spark, "").collect()
    assert len(rows) == N_JPEG_ASSETS
    r0 = {r["asset_id"]: r for r in rows}[3]
    w, h = 16 + 8 * (3 % 3), 16 + 8 * (3 % 2)
    exp = _expected_constant(3, w, h).astype(np.int64)
    assert (r0["width"], r0["height"]) == (w, h)
    assert r0["n_blocks"] == (w // 8) * (h // 8)
    assert r0["sum_px"] == int(exp.sum())
    assert r0["ssq_px"] == int((exp * exp).sum())
    assert r0["row0_sum"] == int(exp[0, :].sum())


class TestColor:
    def test_color_round_trip_exact(self):
        from postgres_s3_etl_spark.operators.multimodal import (
            _JPEG_COLOR_PLANES,
            decode_jpeg_color,
            encode_jpeg_color,
        )

        for a in (0, 1, 7, 29, 47):
            w, h = 16 + 8 * (a % 3), 16 + 8 * (a % 2)
            planes = decode_jpeg_color(encode_jpeg_color(a, w, h))
            assert planes is not None and planes.shape == (3, h, w)
            for ci, (_, ka, kx, ky) in enumerate(_JPEG_COLOR_PLANES):
                exp = np.zeros((h, w), dtype=np.uint8)
                for by in range(h // 8):
                    for bx in range(w // 8):
                        exp[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = (
                            ka * a + kx * bx + ky * by
                        ) % 256
                np.testing.assert_array_equal(planes[ci], exp, err_msg=str(ci))

    def test_rgb_conversion_matches_reference(self):
        from postgres_s3_etl_spark.operators.multimodal import (
            decode_jpeg_color,
            encode_jpeg_color,
            ycbcr_to_rgb,
        )

        planes = decode_jpeg_color(encode_jpeg_color(5, 16, 16))
        rgb = ycbcr_to_rgb(planes)
        # Independent scalar conversion of a handful of pixels.
        for (yy, xx) in ((0, 0), (3, 9), (15, 15), (8, 1)):
            y = float(planes[0][yy, xx])
            cb = float(planes[1][yy, xx]) - 128.0
            cr = float(planes[2][yy, xx]) - 128.0
            exp = [y + 1.402 * cr,
                   y - 0.344136 * cb - 0.714136 * cr,
                   y + 1.772 * cb]
            for c in range(3):
                v = min(255, max(0, round(exp[c])))
                assert abs(int(rgb[c][yy, xx]) - v) <= 1  # round ties
            # exact check when nowhere near a .5 tie
            for c in range(3):
                frac = abs(exp[c] - np.floor(exp[c]) - 0.5)
                if frac > 1e-6 and 0 <= exp[c] <= 255:
                    assert int(rgb[c][yy, xx]) == int(np.round(exp[c]))

    def test_gray_decoder_rejects_color_and_vice_versa(self):
        from postgres_s3_etl_spark.operators.multimodal import (
            decode_jpeg_color,
            decode_jpeg_gray,
            encode_jpeg_color,
        )

        raw_color = encode_jpeg_color(0, 16, 16)
        assert decode_jpeg_gray(raw_color) is None
        raw_gray = encode_jpeg_gray(0, 16, 16)
        assert decode_jpeg_color(raw_gray) is None

    def test_sampling_factor_above_two_rejected(self):
        from postgres_s3_etl_spark.operators.multimodal import (
            decode_jpeg_color,
            encode_jpeg_color,
        )

        raw = bytearray(encode_jpeg_color(0, 16, 16))
        i = raw.find(b"\xff\xc0")
        # 3x3 sampling is valid JPEG but outside this decoder's
        # {1,2} factor set — must reject loudly, not misdecode
        raw[i + 4 + 7] = 0x33
        assert decode_jpeg_color(bytes(raw)) is None

    def test_420_round_trip_exact(self):
        """Full closed-form check of the 4:2:0 path: Y per 8x8 luma
        block, chroma constant over each upsampled 16x16 MCU area."""
        import numpy as np

        from postgres_s3_etl_spark.operators.multimodal import (
            _JPEG_COLOR_PLANES,
            decode_jpeg_color,
            encode_jpeg_color_420,
        )

        for aid, w, h in ((0, 32, 32), (5, 48, 32), (47, 64, 48)):
            planes = decode_jpeg_color(encode_jpeg_color_420(aid, w, h))
            assert planes is not None and planes.shape == (3, h, w)
            (_, ka_y, kx_y, ky_y) = _JPEG_COLOR_PLANES[0]
            for by in range(h // 8):
                for bx in range(w // 8):
                    blk = planes[0][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    assert (
                        blk == (ka_y * aid + kx_y * bx + ky_y * by) % 256
                    ).all()
            for ci, (_, ka, kx, ky) in enumerate(_JPEG_COLOR_PLANES[1:], 1):
                for my in range(h // 16):
                    for mx in range(w // 16):
                        area = planes[ci][
                            my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16
                        ]
                        assert (
                            area == (ka * aid + kx * mx + ky * my) % 256
                        ).all()

    def test_422_and_440_decode(self):
        """The generic factor walk also covers 4:2:2 (Y at 2x1) and
        4:4:0 (Y at 1x2): hand-encode one 16x16 image per layout and
        check the replication upsampler's axis handling."""
        import struct

        import numpy as np

        from postgres_s3_etl_spark.operators.multimodal import (
            _BitWriter,
            _JPEG_AC_BITS,
            _JPEG_AC_VALS,
            _JPEG_DC_BITS,
            _JPEG_DC_VALS,
            _JPEG_QTABLE,
            _huff_canonical,
            _jpeg_category,
            decode_jpeg_color,
        )

        def encode(hy, vy):
            dc_huf = _huff_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS)
            ac_huf = _huff_canonical(_JPEG_AC_BITS, _JPEG_AC_VALS)
            bw = _BitWriter()
            prev = {0: 0, 1: 0, 2: 0}

            def put(ci, v):
                dc = v - 128
                diff = dc - prev[ci]
                prev[ci] = dc
                s = _jpeg_category(diff)
                c, ln = dc_huf[s]
                bw.write(c, ln)
                if s:
                    bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                c, ln = ac_huf[0x00]
                bw.write(c, ln)

            w = h = 16
            mcux, mcuy = w // (8 * hy), h // (8 * vy)
            for my in range(mcuy):
                for mx in range(mcux):
                    for dy in range(vy):
                        for dx in range(hy):
                            bx, by = hy * mx + dx, vy * my + dy
                            put(0, (10 + 30 * bx + 50 * by) % 256)
                    put(1, (60 + 7 * mx + 9 * my) % 256)
                    put(2, (90 + 5 * mx + 3 * my) % 256)
            scan = bw.flush()

            def seg(marker, body):
                return struct.pack(">HH", marker, len(body) + 2) + body

            dqt = seg(0xFFDB, bytes([0x00]) + bytes(_JPEG_QTABLE))
            sof = seg(
                0xFFC0,
                struct.pack(">BHHB", 8, h, w, 3)
                + bytes([1, (hy << 4) | vy, 0])
                + bytes([2, 0x11, 0])
                + bytes([3, 0x11, 0]),
            )
            dht = seg(
                0xFFC4,
                bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
                + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
            )
            sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
            return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"

        for hy, vy in ((2, 1), (1, 2)):
            planes = decode_jpeg_color(encode(hy, vy))
            assert planes is not None and planes.shape == (3, 16, 16)
            # Y is full resolution: one constant 8x8 per luma block.
            for by in range(2):
                for bx in range(2):
                    blk = planes[0][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    assert (blk == (10 + 30 * bx + 50 * by) % 256).all()
            # Chroma replicates along the subsampled axis only: each
            # MCU covers 16 px along hy's axis, 8 px along the other.
            mw, mh = 8 * hy, 8 * vy
            for my in range(16 // mh):
                for mx in range(16 // mw):
                    cb = planes[1][my * mh : (my + 1) * mh, mx * mw : (mx + 1) * mw]
                    assert (cb == (60 + 7 * mx + 9 * my) % 256).all()

    def test_color_query_shape(self, spark):
        from postgres_s3_etl_spark.operators.multimodal import (
            N_JPEG_COLOR_ASSETS,
            mm_image_decode_jpeg_color,
        )

        rows = mm_image_decode_jpeg_color(spark, "").collect()
        assert len(rows) == N_JPEG_COLOR_ASSETS
        r = {x["asset_id"]: x for x in rows}[2]
        w, h = 16 + 8 * (2 % 3), 16 + 8 * (2 % 2)
        assert (r["width"], r["height"]) == (w, h)
        nb = (w // 8) * (h // 8)
        assert r["n_blocks"] == nb
        ys = sum((23 * 2 + 5 * bx + 7 * by) % 256
                 for by in range(h // 8) for bx in range(w // 8))
        assert r["sum_y"] == 64 * ys
