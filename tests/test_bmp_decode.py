"""Real BMP decode path (operators/multimodal.py round-5): codec
round-trip, malformed-payload rejection, and oracle parity."""

from __future__ import annotations

import numpy as np

from tests.conftest import assert_matches_oracle


def test_bmp_roundtrip_matches_formula():
    from postgres_s3_etl_spark.operators.multimodal import (
        decode_bmp24,
        encode_bmp24,
    )

    a, w, h = 9, 19, 13
    img = decode_bmp24(encode_bmp24(a, w, h))
    assert img.shape == (h, w, 3)
    for (x, y) in ((0, 0), (w - 1, 0), (0, h - 1), (w - 1, h - 1), (7, 5)):
        assert img[y, x, 0] == (7 * a + 3 * x + 5 * y) % 256  # B
        assert img[y, x, 1] == (11 * a + 13 * x + 17 * y) % 256  # G
        assert img[y, x, 2] == (19 * a + 23 * x + 29 * y) % 256  # R


def test_bmp_decode_handles_stride_padding():
    """Widths where w*3 is not a multiple of 4 exercise row padding."""
    from postgres_s3_etl_spark.operators.multimodal import (
        decode_bmp24,
        encode_bmp24,
    )

    for w in (1, 2, 3, 4, 5):
        img = decode_bmp24(encode_bmp24(0, w, 2))
        assert img.shape == (2, w, 3)
        # y asymmetry proves the bottom-up flip happened
        assert img[0, 0, 0] == 0 and img[1, 0, 0] == 5


def test_bmp_decode_rejects_non_bmp():
    from postgres_s3_etl_spark.operators.multimodal import decode_bmp24

    assert decode_bmp24(b"") is None
    assert decode_bmp24(b"RIFF" + b"\x00" * 60) is None
    assert decode_bmp24(b"BM" + b"\x00" * 20) is None  # truncated
    # valid magic but 32bpp flag
    from postgres_s3_etl_spark.operators.multimodal import encode_bmp24

    raw = bytearray(encode_bmp24(0, 4, 4))
    raw[28] = 32  # biBitCount
    assert decode_bmp24(bytes(raw)) is None


def test_bmp_stats_sum_identity():
    """Channel sums from the decoded array equal the direct formula
    sums (independent numpy recomputation, no SQL involved)."""
    from postgres_s3_etl_spark.operators.multimodal import (
        decode_bmp24,
        encode_bmp24,
    )

    a, w, h = 42, 23, 16
    img = decode_bmp24(encode_bmp24(a, w, h)).astype(np.int64)
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    assert int(img[:, :, 2].sum()) == int(((19 * a + 23 * xs + 29 * ys) % 256).sum())
    assert int(img[0, :, 2].sum()) == int(((19 * a + 23 * np.arange(w)) % 256).sum())


def test_mm_image_decode_bmp_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "mm_image_decode_bmp")
