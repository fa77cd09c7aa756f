"""IMA-ADPCM decode arm (round-11, VERDICT r10 task 4): hand-built
streams, an independently-written reference decoder, clamping edges,
container gates, and the router dispatch."""

from __future__ import annotations

import struct


def _wav_adpcm(blocks: list[tuple[int, int, list[int]]]) -> bytes:
    """Hand-assemble a fmt-0x11 RIFF from (pred0, sidx0, nibbles)
    blocks — independent of the engine's encoder."""
    from postgres_s3_etl_spark.operators.multimodal import (
        ADPCM_SAMPLES_PER_BLOCK,
    )

    body = bytearray()
    nib_count = None
    for pred0, sidx0, nibs in blocks:
        assert len(nibs) % 2 == 0
        nib_count = len(nibs)
        body += struct.pack("<hBB", pred0, sidx0, 0)
        for i in range(0, len(nibs), 2):
            body.append(nibs[i] | (nibs[i + 1] << 4))
    block_align = 4 + nib_count // 2
    n_samples = len(blocks) * (nib_count + 1)
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, 1000, 1000, block_align, 4, 2, nib_count + 1
    )
    fact = struct.pack("<I", n_samples)
    out = bytearray()
    for tag, chunk in ((b"fmt ", fmt), (b"fact", fact), (b"data", bytes(body))):
        out += tag + struct.pack("<I", len(chunk)) + chunk
        if len(chunk) % 2:
            out += b"\x00"
    del ADPCM_SAMPLES_PER_BLOCK  # imported only to assert availability
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + bytes(out)


def _reference_decode(pred: int, sidx: int, nibs: list[int]) -> list[int]:
    """Independent reference: the arithmetic (rather than shift)
    formulation of the IMA delta — delta = ((2*m+1) * step) / 8 with
    the same truncation the shift form produces, computed here via
    explicit bit loops to avoid sharing code shape with the engine."""
    from postgres_s3_etl_spark.operators.multimodal import (
        IMA_INDEX_TABLE,
        IMA_STEP_TABLE,
    )

    out = [pred]
    for n in nibs:
        step = IMA_STEP_TABLE[sidx]
        magnitude = n & 7
        delta = step >> 3
        for bit, shift in ((4, 0), (2, 1), (1, 2)):
            if magnitude & bit:
                delta += step >> shift
        pred = pred + (-delta if n & 8 else delta)
        pred = min(32767, max(-32768, pred))
        sidx = min(88, max(0, sidx + IMA_INDEX_TABLE[n]))
        out.append(pred)
    return out


def test_hand_computed_block():
    """pred=100 sidx=0 nibbles [7,8,3,0]: worked by hand —
    7: step 7,  diff 0+7+3+1=11, + -> 111, sidx 0+8=8
    8: step 16, diff 2,          - -> 109, sidx 8-1=7
    3: step 14, diff 1+7+3=11,   + -> 120, sidx 7-1=6
    0: step 13, diff 1,          + -> 121, sidx 6-1=5."""
    from postgres_s3_etl_spark.operators.multimodal import (
        decode_wav_ima_adpcm,
    )

    payload = _wav_adpcm([(100, 0, [7, 8, 3, 0])])
    assert decode_wav_ima_adpcm(payload) == [100, 111, 109, 120, 121]


def test_engine_matches_independent_reference():
    from postgres_s3_etl_spark.operators.multimodal import (
        _adpcm_nibble,
        _adpcm_pred0,
        _adpcm_sidx0,
        ADPCM_BLOCK_ALIGN,
        decode_wav_ima_adpcm,
        encode_wav_ima_adpcm,
    )

    npb = 2 * (ADPCM_BLOCK_ALIGN - 4)
    for a in (0, 3, 11):
        nb = 2 + a % 3
        got = decode_wav_ima_adpcm(encode_wav_ima_adpcm(a, nb))
        want = []
        for b in range(nb):
            want.extend(
                _reference_decode(
                    _adpcm_pred0(a, b),
                    _adpcm_sidx0(a, b),
                    [_adpcm_nibble(a, b * npb + j) for j in range(npb)],
                )
            )
        assert got == want


def test_predictor_clamps_at_int16():
    """Max-positive nibbles from the top step clamp at 32767 and stay
    clamped; max-negative from there walk down to -32768."""
    from postgres_s3_etl_spark.operators.multimodal import (
        decode_wav_ima_adpcm,
    )

    up = decode_wav_ima_adpcm(_wav_adpcm([(32000, 88, [7, 7, 7, 7])]))
    assert up is not None and up[1] == 32767 == max(up)
    down = decode_wav_ima_adpcm(
        _wav_adpcm([(-32000, 88, [15, 15, 15, 15])])
    )
    assert down is not None and min(down) == -32768


def test_container_gates():
    from postgres_s3_etl_spark.operators.multimodal import (
        decode_wav_ima_adpcm,
        decode_wav_windows_exact,
        encode_wav,
        encode_wav_ima_adpcm,
    )

    adpcm = encode_wav_ima_adpcm(5, 2)
    pcm = encode_wav(5, 100)
    # stdlib-wave PCM path refuses ADPCM (instead of raising) ...
    assert decode_wav_windows_exact(adpcm, 50) is None
    # ... and the ADPCM decoder refuses PCM and non-RIFF payloads.
    assert decode_wav_ima_adpcm(pcm) is None
    assert decode_wav_ima_adpcm(b"junkjunkjunk") is None


def test_router_dispatches_adpcm(spark):
    """Asset 5 of the mixed feed is ADPCM -> the router must decode
    it (not skip): audio n_decoded covers ALL audio assets."""
    import __spark_entry__ as e

    rows = {
        r["media_type"]: r
        for r in e.queries()["mm_decode_router"](spark, "").collect()
    }
    audio = rows["audio"]
    assert audio["n_decoded"] == audio["n_assets"]
