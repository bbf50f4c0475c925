"""Golden tests for the DSP layer against independent torch/scipy oracles.

The oracle re-derives the reference math (torch.stft + librosa-style mel) from
first principles with torch CPU; our jnp pipeline must match it closely.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from usdm_tpu.audio.mel import mel_filterbank, mel_spectrogram, hz_to_mel, mel_to_hz
from usdm_tpu.audio.units import expand_and_pool, parse_units, rowwise_mode, units_to_string


def torch_mel_oracle(y, n_fft=1024, num_mels=80, sr=22050, hop=256, win=1024, fmin=0.0, fmax=8000.0):
    """Independent torch implementation of meldataset.mel_spectrogram math."""
    basis = torch.from_numpy(mel_filterbank(sr, n_fft, num_mels, fmin, fmax))
    y = torch.from_numpy(np.asarray(y, dtype=np.float32))[None]
    pad = int((n_fft - hop) / 2)
    y = torch.nn.functional.pad(y[None], (pad, pad), mode="reflect")[0]
    window = torch.hann_window(win)
    spec = torch.stft(y, n_fft, hop_length=hop, win_length=win, window=window,
                      center=False, onesided=True, return_complex=True)
    mag = torch.sqrt(torch.real(spec * spec.conj() + 1e-9))
    mel = torch.matmul(basis, mag)
    return torch.log(torch.clamp(mel, min=1e-5))[0].numpy()


def test_mel_scale_roundtrip():
    f = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 8000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-6, atol=1e-6)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # each filter is nonzero somewhere and bounded
    assert (fb.max(axis=1) > 0).all()


def test_mel_spectrogram_matches_torch_oracle(rng):
    t = 256 * 40  # hop multiple
    y = (rng.standard_normal(t) * 0.1).astype(np.float32)
    ours = np.asarray(mel_spectrogram(jnp.asarray(y)))
    oracle = torch_mel_oracle(y)
    assert ours.shape == oracle.shape == (80, 40)
    np.testing.assert_allclose(ours, oracle, rtol=2e-4, atol=2e-4)


def test_mel_frame_count_is_t_over_hop(rng):
    for t in [256 * 10, 256 * 33]:
        y = rng.standard_normal(t).astype(np.float32) * 0.05
        m = mel_spectrogram(jnp.asarray(y))
        assert m.shape[-1] == t // 256


def test_rowwise_mode_matches_torch(rng):
    for _ in range(5):
        rows = rng.integers(0, 5, size=(17, 29)).astype(np.int32)
        ours = np.asarray(rowwise_mode(jnp.asarray(rows)))
        ref = torch.mode(torch.from_numpy(rows), dim=1).values.numpy()
        np.testing.assert_array_equal(ours, ref)


def test_rowwise_mode_tie_breaks_small():
    rows = np.array([[2, 2, 7, 7], [9, 1, 9, 1]], dtype=np.int32)
    ours = np.asarray(rowwise_mode(jnp.asarray(rows)))
    ref = torch.mode(torch.from_numpy(rows), dim=1).values.numpy()
    np.testing.assert_array_equal(ours, ref)


def test_expand_and_pool_matches_torch_reference_math(rng):
    units = rng.integers(0, 10000, size=120).astype(np.int64)
    ours, new_len = expand_and_pool(units, sample_rate=22050, token_sr=50, hop=256)
    # torch oracle replicating model_util.process_unit math
    u = torch.from_numpy(units)
    expanded = torch.repeat_interleave(u, 22050 // 50)
    ref_len = len(expanded) // 256 * 256
    ref = expanded[:ref_len].reshape(-1, 256).mode(1).values.numpy()
    assert new_len == ref_len
    np.testing.assert_array_equal(ours, ref)


def test_unit_string_roundtrip():
    units = [0, 17, 9999, 3]
    s = units_to_string(units)
    assert parse_units(s) == units
    assert parse_units("junk<|unit5|>mid<|unit6|>") == [5, 6]


def test_dedup_units_roundtrip():
    from usdm_tpu.audio.units import dedup_units

    units = [3, 3, 3, 7, 7, 1, 3, 3]
    u, d = dedup_units(units)
    assert u == [3, 7, 1, 3]
    assert d == [3, 2, 1, 2]
    # roundtrip via repetition
    rebuilt = [x for uu, dd in zip(u, d) for x in [uu] * dd]
    assert rebuilt == units
    assert dedup_units([]) == ([], [])


def test_mel_bucketed_matches_exact(rng):
    """mel_for_config_bucketed must be bit-identical to the exact-length mel
    on the valid frames for several off-bucket lengths."""
    from usdm_tpu.audio.mel import mel_for_config, mel_for_config_bucketed
    from usdm_tpu.core.config import MelConfig

    cfg = MelConfig()
    for n in (9984, 22016, 30208):  # hop multiples, off the 0.5 s bucket
        wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
        exact = np.asarray(mel_for_config(jnp.asarray(wav[None]), cfg))
        bucketed = mel_for_config_bucketed(wav, cfg)
        assert bucketed.shape == exact.shape, (bucketed.shape, exact.shape)
        np.testing.assert_allclose(bucketed, exact, rtol=1e-6, atol=1e-6)


def test_bucket_helpers():
    from usdm_tpu.audio.wav import ceil_to, pad_to_bucket

    assert ceil_to(0, 8) == 8 and ceil_to(1, 8) == 8 and ceil_to(8, 8) == 8
    assert ceil_to(9, 8) == 16
    padded, n = pad_to_bucket(np.ones(3, np.float32), 16, bucket_s=0.5)
    assert n == 3 and len(padded) == 8 and padded[:3].sum() == 3 and padded[3:].sum() == 0


def test_mel_bucketed_off_hop_lengths(rng):
    """Off-hop-multiple lengths too: frame-count formula and valid-frame
    equality must hold for arbitrary wav lengths."""
    from usdm_tpu.audio.mel import mel_for_config, mel_for_config_bucketed
    from usdm_tpu.core.config import MelConfig

    cfg = MelConfig()
    for n in (1234, 9999, 30001):
        wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
        exact = np.asarray(mel_for_config(jnp.asarray(wav[None]), cfg))
        bucketed = mel_for_config_bucketed(wav, cfg)
        assert bucketed.shape == exact.shape, (n, bucketed.shape, exact.shape)
        np.testing.assert_allclose(bucketed, exact, rtol=1e-6, atol=1e-6)
