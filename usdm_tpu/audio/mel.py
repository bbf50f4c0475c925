"""Mel-spectrogram pipeline, numerically matching the reference.

Reference: /root/reference/src/decoder/voicebox/vocoder/meldataset.py:55-78 —
reflect-pad by (n_fft-hop)/2, torch.stft(center=False, hann periodic window),
magnitude = sqrt(|z|^2 + 1e-9), librosa slaney mel basis, log(clamp(x, 1e-5)).

Everything here is jnp and jit-friendly: framing is a reshape/gather, the DFT
is jnp.fft.rfft, and the mel projection is a single matmul that XLA maps onto
the MXU.  The mel basis is computed in numpy at trace time (static shapes).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from usdm_tpu.core.config import MelConfig


# ---------------------------------------------------------------------------
# Slaney mel filterbank (librosa.filters.mel equivalent, htk=False,
# norm='slaney' — the librosa defaults used by the reference meldataset.py:62)
# ---------------------------------------------------------------------------

_MIN_LOG_HZ = 1000.0
_F_SP = 200.0 / 3
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel(f):
    f = np.asarray(f, dtype=np.float64)
    mel = f / _F_SP
    log_region = f >= _MIN_LOG_HZ
    mel = np.where(log_region, _MIN_LOG_MEL + np.log(np.maximum(f, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP, mel)
    return mel


def mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f = m * _F_SP
    log_region = m >= _MIN_LOG_MEL
    f = np.where(log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL)), f)
    return f


@lru_cache(maxsize=8)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """[n_mels, n_fft//2+1] slaney-normalized triangular filterbank."""
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # slaney normalization: each filter integrates to ~2/bandwidth
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT (torch.stft semantics with center=False, onesided, hann periodic)
# ---------------------------------------------------------------------------


def _hann_periodic(win: int) -> np.ndarray:
    n = np.arange(win)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win)).astype(np.float32)


def frame_signal(y: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """[..., T] -> [..., n_frames, frame_len]; frames start at k*hop."""
    t = y.shape[-1]
    n_frames = 1 + (t - frame_len) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_len)[None, :]
    return y[..., idx]


def stft_magnitude(y: jnp.ndarray, n_fft: int, hop: int, win: int) -> jnp.ndarray:
    """|STFT|-ish magnitude used by the reference: sqrt(|z|^2 + 1e-9).

    y: [..., T] already padded as the caller requires.  Returns
    [..., n_freq, n_frames] to match the torch layout.
    """
    window = jnp.asarray(_hann_periodic(win))
    frames = frame_signal(y, win, hop) * window  # [..., F, win]
    if win < n_fft:
        pad = [(0, 0)] * (frames.ndim - 1) + [(0, n_fft - win)]
        frames = jnp.pad(frames, pad)
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # [..., F, n_fft//2+1]
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)
    return jnp.swapaxes(mag, -1, -2)


def _reflect_pad_last(y: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")


@partial(jax.jit, static_argnames=("n_fft", "num_mels", "sampling_rate",
                                   "hop_size", "win_size", "fmin", "fmax",
                                   "center_pad"))
def mel_spectrogram(
    y: jnp.ndarray,
    n_fft: int = 1024,
    num_mels: int = 80,
    sampling_rate: int = 22050,
    hop_size: int = 256,
    win_size: int = 1024,
    fmin: float = 0.0,
    fmax: float = 8000.0,
    center_pad: bool = True,
) -> jnp.ndarray:
    """[..., T] waveform in [-1, 1] -> [..., num_mels, T//hop] log-mel.

    Matches reference meldataset.py:55-78 (center=False path): reflect-pad by
    (n_fft - hop)/2 on both sides so output frame count is floor(T/hop) for T
    a hop multiple.  `center_pad=False` skips that pad for callers that
    already applied it host-side (mel_for_config_bucketed).
    """
    basis = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax))
    if center_pad:
        y = _reflect_pad_last(y, int((n_fft - hop_size) // 2))
    mag = stft_magnitude(y, n_fft, hop_size, win_size)  # [..., n_freq, F]
    # Explicit highest precision: XLA's DEFAULT matmul precision can compute
    # f32 dots at bf16 accuracy, which is audible in log-mel space.
    mel = jnp.einsum("mf,...ft->...mt", basis, mag, precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.clip(mel, min=1e-5))


def mel_for_config(y: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    return mel_spectrogram(
        y, cfg.n_fft, cfg.num_mels, cfg.sampling_rate, cfg.hop_size, cfg.win_size, cfg.fmin, cfg.fmax
    )


def mel_for_config_bucketed(wav: np.ndarray, cfg: MelConfig,
                            bucket_s: float = 0.5) -> np.ndarray:
    """mel_for_config for a 1-D host wav with the XLA program compiled at a
    BUCKETED length (each distinct input length otherwise compiles fresh —
    serving sees arbitrary reference-audio lengths).

    Bit-identical to the exact-length mel on the valid frames: the reflect
    center-pad happens HERE at the true length (numpy), zeros extend the
    signal to the bucket, and every valid frame's window lies inside the
    true reflect-padded span, so the zeros are never read by them."""
    from usdm_tpu.audio.wav import ceil_to

    pad = int((cfg.n_fft - cfg.hop_size) // 2)
    n = len(wav)
    y = np.pad(np.asarray(wav, np.float32), (pad, pad), mode="reflect")
    full = np.zeros(ceil_to(n, max(int(cfg.sampling_rate * bucket_s), 1))
                    + 2 * pad, np.float32)
    full[: len(y)] = y
    n_frames = 1 + (n + 2 * pad - cfg.win_size) // cfg.hop_size
    mel = mel_spectrogram(jnp.asarray(full[None]), cfg.n_fft, cfg.num_mels,
                          cfg.sampling_rate, cfg.hop_size, cfg.win_size,
                          cfg.fmin, cfg.fmax, center_pad=False)
    return np.asarray(mel)[:, :, :n_frames]


def normalize_mel(mel: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    return (mel - cfg.mel_mean) / cfg.mel_std


def denormalize_mel(mel: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    return mel * cfg.mel_std + cfg.mel_mean
