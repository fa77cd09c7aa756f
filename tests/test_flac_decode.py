"""FLAC codec (round-12 subset, completed to the full fixed-blocksize
profile in round-13): bit-exact roundtrips on the real encoder —
CONSTANT/VERBATIM/FIXED/LPC subframes, all four channel assignments,
wasted bits, 8-32 bit depths, Rice escape, partition orders — and
loud None for out-of-spec streams and every integrity failure."""

from __future__ import annotations

import hashlib

import pytest

from postgres_s3_etl_spark.operators.flac_codec import (
    FLAC_BLOCK,
    BitWriter,
    _flac_left,
    _flac_right,
    _flac_sample,
    _pack_pcm,
    decode_flac,
    encode_flac,
    encode_flac_frame,
    encode_flac_stereo,
)
from tests.conftest import assert_matches_oracle


def _expected(asset_id: int, n_frames: int) -> list[int]:
    return [
        _flac_sample(asset_id, t) for t in range(n_frames * FLAC_BLOCK)
    ]


def _stream(
    frames: list[bytes], samples: list[int], bps: int = 16, nch: int = 1
) -> bytes:
    """Wrap pre-encoded frames in fLaC magic + STREAMINFO.
    ``samples`` is the channel-interleaved PCM for the MD5."""
    md5 = hashlib.md5(_pack_pcm(samples, bps)).digest()
    si = BitWriter()
    si.write(FLAC_BLOCK, 16)
    si.write(FLAC_BLOCK, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(1000, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(len(samples) // nch, 36)
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


@pytest.mark.parametrize("order", [1, 2, 4, 8, 16, 32])
def test_lpc_roundtrip_hand_built(order):
    """Round-13: LPC subframes with Levinson-Durbin-quantized
    coefficients decode bit-exactly at every legal order band."""
    samples = _expected(1, 1)
    frame = encode_flac_frame(samples, 0, subframe="lpc", order=order)
    assert decode_flac(_stream([frame], samples)) == samples


def test_lpc_partitioned_roundtrip():
    samples = _expected(5, 1)
    frame = encode_flac_frame(
        samples, 0, subframe="lpc", order=6, partition_order=2
    )
    assert decode_flac(_stream([frame], samples)) == samples


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_modes_roundtrip_hand_built(mode):
    """Round-13: each channel assignment reconstructs left/right
    bit-exactly (the side channel carries bps + 1 bits)."""
    n = FLAC_BLOCK
    left = [_flac_left(2, t) for t in range(n)]
    right = [_flac_right(2, t) for t in range(n)]
    frame = encode_flac_frame(
        [left, right], 0, channel_assignment=mode,
        specs=[{"type": "verbatim"}, {"type": "fixed", "order": 2}],
    )
    interleaved = [v for p in zip(left, right) for v in p]
    assert decode_flac(_stream([frame], interleaved, nch=2)) == interleaved


def test_stereo_full_profile_roundtrip():
    """encode_flac_stereo walks LPC orders, all four assignments,
    wasted bits, and mixed partition orders in one stream."""
    for a in (0, 1, 3):
        nf = 2 + a % 3
        n = nf * FLAC_BLOCK
        exp = [
            v
            for t in range(n)
            for v in (_flac_left(a, t), _flac_right(a, t))
        ]
        assert decode_flac(encode_flac_stereo(a, nf)) == exp


def test_wasted_bits_roundtrip():
    """Round-13: a subframe coded at bps - k with k wasted bits
    decodes to the original (samples all divisible by 2^k)."""
    samples = [v * 4 for v in _expected(1, 1)]
    for typ in ("verbatim", "fixed", "lpc"):
        frame = encode_flac_frame(
            [samples], 0, channel_assignment="independent",
            specs=[{"type": typ, "order": 2, "wasted": 2}],
        )
        assert decode_flac(_stream([frame], samples)) == samples


@pytest.mark.parametrize("bps", [12, 20, 24, 32])
def test_wide_bit_depths_roundtrip(bps):
    lim = 1 << (bps - 1)
    samples = [
        ((_flac_sample(4, t) * 97) % (2 * lim)) - lim
        for t in range(FLAC_BLOCK)
    ]
    frame = encode_flac_frame(samples, 0, bps=bps, subframe="fixed", order=1)
    assert decode_flac(_stream([frame], samples, bps=bps)) == samples


def test_channel_count_mismatch_returns_none():
    """STREAMINFO says stereo but the frame header says mono: the
    decoder must reject the stream, not guess."""
    samples = _expected(1, 1)
    frame = encode_flac_frame(samples, 0, subframe="verbatim")
    assert decode_flac(_stream([frame], samples, nch=2)) is None


def test_reserved_channel_assignment_returns_none():
    n = FLAC_BLOCK
    left = [_flac_left(2, t) for t in range(n)]
    right = [_flac_right(2, t) for t in range(n)]
    frame = bytearray(
        encode_flac_frame(
            [left, right], 0, channel_assignment="independent",
            specs=[{"type": "verbatim"}, {"type": "verbatim"}],
        )
    )
    # Channel-assignment nibble is the high 4 bits of header byte 3;
    # rewrite 0b0001 (stereo independent) to reserved 0b1011.
    frame[3] = (0b1011 << 4) | (frame[3] & 0x0F)
    interleaved = [v for p in zip(left, right) for v in p]
    assert (
        decode_flac(_stream([bytes(frame)], interleaved, nch=2)) is None
    )


def test_invalid_lpc_precision_returns_none():
    """A 4-bit precision field of 0b1111 is forbidden by the spec."""
    samples = _expected(1, 1)
    frame = bytearray(
        encode_flac_frame(samples, 0, subframe="lpc", order=1)
    )
    # Subframe starts at byte 7: 8-bit header, then order-1=0 means
    # 16 warm-up bits, then the 4-bit precision-1 field at byte 10's
    # top nibble. Force it to 0b1111.
    frame[10] |= 0b1111_0000
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


def test_stereo_operator_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, "mm_audio_decode_flac_stereo")


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


@given(
    samples=SAMPLES,
    order=st.integers(min_value=1, max_value=32),
    precision=st.integers(min_value=5, max_value=15),
)
@settings(max_examples=60, deadline=None)
def test_lpc_roundtrip_any_pcm(samples, order, precision):
    """Round-13: the LPC arm is lossless for ANY int16 PCM at any
    order/precision — residual math mirrors the decoder exactly, so
    coefficient quality never affects correctness."""
    frame = encode_flac_frame(
        [samples], 0, channel_assignment="independent",
        specs=[{"type": "lpc", "order": order, "precision": precision}],
    )
    assert decode_flac(_stream([frame], samples)) == samples


@given(
    left=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=16, max_size=64,
    ),
    right_seed=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=16, max_size=64,
    ),
    mode=st.sampled_from(
        ["independent", "left_side", "right_side", "mid_side"]
    ),
    typ=st.sampled_from(["verbatim", "fixed", "lpc"]),
)
@settings(max_examples=60, deadline=None)
def test_stereo_roundtrip_any_pcm(left, right_seed, mode, typ):
    """Every channel assignment roundtrips ANY stereo int16 PCM,
    with every subframe type on both channels (the side channel's
    extra bit of range included — left=32767/right=-32768 gives a
    17-bit side value)."""
    n = min(len(left), len(right_seed))
    left, right = left[:n], right_seed[:n]
    spec = {"type": typ, "order": 2}
    frame = encode_flac_frame(
        [left, right], 0, channel_assignment=mode,
        specs=[dict(spec), dict(spec)],
    )
    interleaved = [v for p in zip(left, right) for v in p]
    assert decode_flac(_stream([frame], interleaved, nch=2)) == interleaved


@given(
    base=st.lists(
        st.integers(min_value=-4096, max_value=4095),
        min_size=8, max_size=64,
    ),
    wasted=st.integers(min_value=1, max_value=3),
    typ=st.sampled_from(["verbatim", "fixed", "lpc"]),
)
@settings(max_examples=40, deadline=None)
def test_wasted_bits_roundtrip_any_pcm(base, wasted, typ):
    samples = [v << wasted for v in base]
    frame = encode_flac_frame(
        [samples], 0, channel_assignment="independent",
        specs=[{"type": typ, "order": 1, "wasted": wasted}],
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
