"""FLAC subset codec (round-12): bit-exact roundtrips on the real
encoder, hand-built streams for the subset edges (constant frames,
Rice escape, partition orders), loud None for out-of-subset streams
(LPC, stereo, wasted bits) and for every integrity failure."""

from __future__ import annotations

import hashlib
import struct

import pytest

from postgres_s3_etl_spark.operators.flac_codec import (
    FLAC_BLOCK,
    BitWriter,
    _flac_sample,
    decode_flac,
    encode_flac,
    encode_flac_frame,
)
from tests.conftest import assert_matches_oracle


def _expected(asset_id: int, n_frames: int) -> list[int]:
    return [
        _flac_sample(asset_id, t) for t in range(n_frames * FLAC_BLOCK)
    ]


def _stream(frames: list[bytes], samples: list[int], bps: int = 16) -> bytes:
    """Wrap pre-encoded frames in fLaC magic + STREAMINFO."""
    width = {8: "b", 16: "h"}[bps]
    md5 = hashlib.md5(
        struct.pack(f"<{len(samples)}{width}", *samples)
    ).digest()
    si = BitWriter()
    si.write(FLAC_BLOCK, 16)
    si.write(FLAC_BLOCK, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(1000, 20)
    si.write(0, 3)
    si.write(bps - 1, 5)
    si.write(len(samples), 36)
    body = si.bytes() + md5
    return (
        b"fLaC"
        + bytes((0x80,))
        + len(body).to_bytes(3, "big")
        + body
        + b"".join(frames)
    )


@pytest.mark.parametrize("asset_id", [0, 3, 7, 11])
def test_roundtrip_closed_form(asset_id):
    nf = 2 + asset_id % 3
    assert decode_flac(encode_flac(asset_id, nf)) == _expected(asset_id, nf)


@pytest.mark.parametrize("po", [1, 2, 3])
def test_partition_orders(po):
    raw = encode_flac(4, 4, partition_order=po)
    assert decode_flac(raw) == _expected(4, 4)


def test_8bit_stream():
    assert decode_flac(encode_flac(6, 2, bps=8)) == _expected(6, 2)


def test_constant_subframe_hand_built():
    samples = [42] * FLAC_BLOCK
    frame = encode_flac_frame(samples, 0, subframe="constant")
    assert decode_flac(_stream([frame], samples)) == samples


def test_rice_escape_hand_built():
    samples = _expected(9, 1)
    frame = encode_flac_frame(
        samples, 0, subframe="fixed", order=3, force_escape=True
    )
    assert decode_flac(_stream([frame], samples)) == samples


def test_mixed_subframe_types_one_stream():
    s0 = [7] * FLAC_BLOCK
    s1 = _expected(2, 1)
    frames = [
        encode_flac_frame(s0, 0, subframe="constant"),
        encode_flac_frame(s1, 1, subframe="verbatim"),
        encode_flac_frame(s1, 2, subframe="fixed", order=4),
    ]
    assert decode_flac(_stream(frames, s0 + s1 + s1)) == s0 + s1 + s1


def test_lpc_subframe_returns_none():
    samples = _expected(1, 1)
    frame = bytearray(encode_flac_frame(samples, 0, subframe="verbatim"))
    # Frame header = 4 fixed bytes + 1 frame-number byte + 1
    # blocksize-1 byte + 1 CRC-8 byte; the subframe header is byte 7.
    # Rewrite its type bits to LPC order 1 (0b100000): the decoder
    # must reject on TYPE (before it would notice the stale CRC-16).
    frame[7] = 0b0100_0000
    raw = _stream([bytes(frame)], samples)
    assert decode_flac(raw) is None


def test_stereo_streaminfo_returns_none():
    samples = _expected(1, 1)
    frame = encode_flac_frame(samples, 0, subframe="verbatim")
    raw = bytearray(_stream([frame], samples))
    # STREAMINFO channels-1 lives in the top 3 bits after the 20-bit
    # rate: byte offset 4(magic)+4(hdr)+12 -> set channels-1 = 1.
    raw[4 + 4 + 12] |= 0b0000_0010
    assert decode_flac(bytes(raw)) is None


def test_wasted_bits_returns_none():
    samples = _expected(1, 1)
    frame = bytearray(encode_flac_frame(samples, 0, subframe="verbatim"))
    frame[7] |= 1  # wasted-bits flag in the subframe header (byte 7)
    assert decode_flac(_stream([bytes(frame)], samples)) is None


def test_crc8_corruption_returns_none():
    raw = bytearray(encode_flac(2, 2))
    # Frame header starts right after 4 + 4 + 34 bytes of metadata;
    # its CRC-8 is the 6th header byte (sync..blocksize-1 = 5 bytes,
    # frame number 1 byte -> CRC at offset +7... flip the blocksize
    # byte instead: CRC-8 must then fail.
    raw[4 + 4 + 34 + 4] ^= 0x01
    assert decode_flac(bytes(raw)) is None


def test_crc16_corruption_returns_none():
    raw = bytearray(encode_flac(2, 2))
    raw[-1] ^= 0x01  # last byte is the final frame's CRC-16 low byte
    assert decode_flac(bytes(raw)) is None


def test_md5_mismatch_returns_none():
    samples = _expected(3, 1)
    frame = encode_flac_frame(samples, 0, subframe="verbatim")
    wrong = list(samples)
    wrong[0] += 1  # MD5 computed over different PCM than the frames
    assert decode_flac(_stream([frame], wrong)) is None


def test_truncated_returns_none():
    raw = encode_flac(5, 3)
    assert decode_flac(raw[: len(raw) - 10]) is None
    assert decode_flac(raw[:20]) is None
    assert decode_flac(b"") is None
    assert decode_flac(b"fLaC") is None


def test_operator_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "mm_audio_decode_flac")


def test_router_matches_oracle_with_flac_arm(spark, duck):
    assert_matches_oracle(spark, duck, "mm_decode_router")


# --- property tests: the codec must roundtrip ANY int16 PCM, not ---
# --- just the closed-form feed (pure Python, no Spark jobs)      ---

from hypothesis import given, settings, strategies as st  # noqa: E402

SAMPLES = st.lists(
    st.integers(min_value=-32768, max_value=32767), min_size=8, max_size=96
)


@given(samples=SAMPLES, order=st.integers(min_value=0, max_value=4))
@settings(max_examples=60, deadline=None)
def test_fixed_roundtrip_any_pcm(samples, order):
    frame = encode_flac_frame(samples, 0, subframe="fixed", order=order)
    assert decode_flac(_stream([frame], samples)) == samples


@given(samples=SAMPLES)
@settings(max_examples=30, deadline=None)
def test_verbatim_and_escape_roundtrip_any_pcm(samples):
    fr_v = encode_flac_frame(samples, 0, subframe="verbatim")
    assert decode_flac(_stream([fr_v], samples)) == samples
    fr_e = encode_flac_frame(
        samples, 0, subframe="fixed", order=2, force_escape=True
    )
    assert decode_flac(_stream([fr_e], samples)) == samples


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=64, max_size=64,
    ),
    po=st.integers(min_value=0, max_value=3),
)
@settings(max_examples=30, deadline=None)
def test_partitioned_roundtrip_any_pcm(samples, po):
    frame = encode_flac_frame(
        samples, 0, subframe="fixed", order=1, partition_order=po
    )
    assert decode_flac(_stream([frame], samples)) == samples


def test_utf8_bare_continuation_leading_byte_rejected():
    """Round-13 ADVICE: a leading byte in 0x80-0xBF is a bare
    continuation byte, not a valid UTF-8-coded-number start; it must
    raise instead of silently decoding as a one-byte value."""
    import pytest

    from postgres_s3_etl_spark.operators.flac_codec import (
        BitReader,
        _read_utf8_number,
    )

    for b0 in (0x80, 0x9F, 0xBF):
        with pytest.raises(ValueError):
            _read_utf8_number(BitReader(bytes([b0, 0x00])))
    # Valid shapes still decode.
    assert _read_utf8_number(BitReader(b"\x7f")) == 0x7F
    assert _read_utf8_number(BitReader(bytes((0xC2, 0x80)))) == 0x80
