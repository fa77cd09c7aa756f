"""Round-trip tests for the stdlib-only PNG and YUV4MPEG2 decoders.

These are the two round-5 real-codec additions: with BMP (round-4)
and PCM WAV (round-3) they complete real end-to-end decodes for all
three modalities. The tests check the decoders against the
closed-form pixel/plane formulas directly (independent of the SQL
oracle, which check_correctness.py exercises separately) and probe
the malformed-input gates a real parser needs.
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from postgres_s3_etl_spark.operators.multimodal import (
    N_PNG_ASSETS,
    N_Y4M_ASSETS,
    Y4M_SAMPLE_EVERY,
    _png_pixels,
    _y4m_planes,
    decode_png,
    decode_y4m,
    encode_png,
    encode_y4m,
    mm_image_decode_png,
    mm_video_decode_y4m,
)


class TestPngCodec:
    def test_round_trip_matches_closed_form(self):
        for i in (0, 1, 7, 13):
            w, h = 12 + i % 8, 8 + i % 7
            decoded = decode_png(encode_png(i, w, h))
            assert decoded is not None
            img, filters = decoded
            assert img.shape == (h, w, 3)
            np.testing.assert_array_equal(img, _png_pixels(i, w, h))

    def test_all_five_filters_exercised(self):
        # h >= 8 for every asset, so y % 5 hits every filter type —
        # a decoder that fumbles Average or Paeth cannot round-trip.
        _, filters = decode_png(encode_png(3, 15, 9))
        assert filters == [0, 1, 2, 3, 4]

    def test_bad_magic_rejected(self):
        assert decode_png(b"\x89PNJ" + b"\x00" * 100) is None

    def test_corrupt_crc_rejected(self):
        payload = bytearray(encode_png(0, 12, 8))
        # flip a byte inside the IHDR body; the chunk CRC must catch it
        payload[18] ^= 0xFF
        assert decode_png(bytes(payload)) is None

    def test_overlong_chunk_length_rejected_not_raised(self):
        # a chunk length field pointing past the payload is
        # truncation/corruption: must return None (skip the asset),
        # never raise struct.error inside the mapInPandas task
        payload = bytearray(encode_png(0, 12, 8))
        payload[8:12] = (2**24).to_bytes(4, "big")  # IHDR length → huge
        assert decode_png(bytes(payload)) is None

    def test_crc_valid_garbage_idat_rejected_not_raised(self):
        # CRC-valid chunks wrapping an undecompressable IDAT stream
        # must return None, never raise zlib.error
        import struct

        from postgres_s3_etl_spark.operators.multimodal import _png_chunk

        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", b"not-a-zlib-stream")
            + _png_chunk(b"IEND", b"")
        )
        assert decode_png(payload) is None

    def test_truncated_idat_rejected(self):
        # a syntactically valid PNG whose inflated stream is one byte
        # short of h * (stride + 1) must be rejected, not mis-read
        import struct

        from postgres_s3_etl_spark.operators.multimodal import _png_chunk

        w, h = 4, 3
        raw = b"".join(b"\x00" + bytes(range(i, i + w * 3)) for i in range(h))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        bad = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw[:-1]))
            + _png_chunk(b"IEND", b"")
        )
        assert decode_png(bad) is None

    def test_non_truecolor_rejected(self):
        import struct

        from postgres_s3_etl_spark.operators.multimodal import _png_chunk

        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)  # grayscale
        bad = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 20))
            + _png_chunk(b"IEND", b"")
        )
        assert decode_png(bad) is None


class TestY4mCodec:
    def test_round_trip_matches_closed_form(self):
        for i in (0, 5, 11):
            w, h, nf = 12 + i % 6, 8 + i % 4, 4 + i % 5
            decoded = decode_y4m(encode_y4m(i, w, h, nf))
            assert decoded is not None
            dw, dh, frames = decoded
            assert (dw, dh, len(frames)) == (w, h, nf)
            for t, f in enumerate(frames):
                yp, up, vp = _y4m_planes(i, w, h, t)
                np.testing.assert_array_equal(f[0], yp)
                np.testing.assert_array_equal(f[1], up)
                np.testing.assert_array_equal(f[2], vp)

    def test_frame_params_tolerated(self):
        # FRAME lines may carry parameters up to the newline (spec);
        # the decoder must skip them, not mis-offset the planes.
        raw = encode_y4m(2, 12, 8, 2)
        patched = raw.replace(b"FRAME\n", b"FRAME Ip\n", 1)
        decoded = decode_y4m(patched)
        assert decoded is not None and len(decoded[2]) == 2

    def test_default_c420_rejected(self):
        raw = encode_y4m(0, 12, 8, 1)
        assert decode_y4m(raw.replace(b" C444", b"")) is None
        assert decode_y4m(raw.replace(b"C444", b"C420jpeg")) is None

    def test_bad_magic_and_truncation_rejected(self):
        raw = encode_y4m(0, 12, 8, 2)
        assert decode_y4m(b"XUV4MPEG2 " + raw[10:]) is None
        assert decode_y4m(raw[:-5]) is None  # last frame short

    def test_malformed_dim_tokens_rejected_not_raised(self):
        # non-numeric or bare W/H header tokens must return None,
        # never raise ValueError inside the mapInPandas task
        body = b"\nFRAME\n" + b"\x00" * (3 * 12 * 8)
        assert decode_y4m(b"YUV4MPEG2 W12x H8 C444" + body) is None
        assert decode_y4m(b"YUV4MPEG2 W H8 C444" + body) is None
        assert decode_y4m(b"YUV4MPEG2 W12 Hx8 C444" + body) is None


class TestSparkQueries:
    def test_png_query_shape(self, spark):
        rows = mm_image_decode_png(spark, "").collect()
        assert len(rows) == N_PNG_ASSETS
        r0 = {r["asset_id"]: r for r in rows}[0]
        img = _png_pixels(0, 12, 8)
        assert r0["n_px"] == 96 and r0["n_filter_types"] == 5
        assert r0["sum_r"] == int(img[:, :, 0].sum())
        assert r0["row0_r_sum"] == int(img[0, :, 0].sum())

    def test_y4m_query_shape(self, spark):
        rows = mm_video_decode_y4m(spark, "").collect()
        assert len(rows) == N_Y4M_ASSETS
        r1 = {r["asset_id"]: r for r in rows}[1]
        w, h, nf = 13, 9, 5
        assert (r1["width"], r1["height"], r1["n_frames"]) == (w, h, nf)
        assert r1["n_sampled"] == (nf + Y4M_SAMPLE_EVERY - 1) // Y4M_SAMPLE_EVERY
        expect_sum_y = sum(
            int(_y4m_planes(1, w, h, t)[0].sum())
            for t in range(0, nf, Y4M_SAMPLE_EVERY)
        )
        assert r1["sum_y"] == expect_sum_y
        assert r1["f0_row0_y_sum"] == int(_y4m_planes(1, w, h, 0)[0][0, :].sum())
