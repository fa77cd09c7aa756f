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
