"""Waveform/mel dataset for BigVGAN vocoder training.

Equivalent of the reference MelDataset
(/root/reference/src/decoder/voicebox/vocoder/meldataset.py:92-174):
filelists of `name|...` lines joined onto a wav dir, peak-normalize *0.95
(scratch training only), random segment_size crop (pad if short), and a
fine-tuning mode that pairs the audio with a precomputed ground-truth-aligned
mel (.npy) and crops the two consistently on hop boundaries.

TPU-first split of responsibilities: the host side (this module) only crops
and stacks waveforms; the conditioning mel (fmax=8000) is extracted for the
whole batch in one jitted device call (`collate_mel_batch`), and the loss mel
(fmax=sr/2, reference fmax_loss=None) is recomputed inside the jitted GAN
step from the same waveform — no per-item CPU STFT in loader workers.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from usdm_tpu.audio.mel import mel_for_config, mel_spectrogram
from usdm_tpu.audio.wav import load_wav
from usdm_tpu.core.config import MelConfig


def read_vocoder_filelist(list_path: str, wavs_dir: str) -> List[str]:
    """Reference get_dataset_filelist (meldataset.py:83-90): each line's first
    `|`-field is a basename resolved against `wavs_dir` with a .wav suffix;
    lines that already end in .wav / are absolute are kept as-is."""
    files: List[str] = []
    with open(list_path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            name = line.split("|")[0]
            if not name.endswith(".wav"):
                name += ".wav"
            files.append(name if os.path.isabs(name) else os.path.join(wavs_dir, name))
    return files


def peak_normalize(wav: np.ndarray, headroom: float = 0.95) -> np.ndarray:
    """librosa.util.normalize(wav) * 0.95 equivalent (meldataset.py:128)."""
    peak = float(np.max(np.abs(wav))) if wav.size else 0.0
    if peak < 1e-10:
        return wav
    return (wav / peak * headroom).astype(np.float32)


class MelAudioDataset:
    """Random-crop waveform dataset; one item = a float32 [segment_size] wav
    (plus, in fine-tuning mode, the aligned precomputed mel crop).

    fine_tuning=True mirrors meldataset.py:150-167: the conditioning mel comes
    from `base_mels_path/<stem>.npy` (Voicebox-synthesized, already
    normalized-domain-free log-mels) and audio/mel are cropped consistently at
    a random hop-aligned offset.
    """

    def __init__(
        self,
        files: Sequence[str],
        segment_size: int = 8192,
        mel_cfg: MelConfig = MelConfig(),
        split: bool = True,
        fine_tuning: bool = False,
        base_mels_path: Optional[str] = None,
    ):
        self.files = list(files)
        self.segment_size = int(segment_size)
        self.mel_cfg = mel_cfg
        self.split = split
        self.fine_tuning = fine_tuning
        self.base_mels_path = base_mels_path
        if fine_tuning and not base_mels_path:
            raise ValueError("fine_tuning=True requires base_mels_path")
        if segment_size % mel_cfg.hop_size:
            raise ValueError(f"segment_size {segment_size} must be a multiple of hop {mel_cfg.hop_size}")
        self.frames_per_seg = self.segment_size // mel_cfg.hop_size

    def __len__(self) -> int:
        return len(self.files)

    def _load(self, path: str) -> np.ndarray:
        wav, _ = load_wav(path, sr=self.mel_cfg.sampling_rate)
        if not self.fine_tuning:
            wav = peak_normalize(wav)
        return np.clip(wav.astype(np.float32), -1.0, 1.0)

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None
                    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        rng = rng or np.random.default_rng()
        path = self.files[int(idx)]
        wav = self._load(path)
        seg, hop = self.segment_size, self.mel_cfg.hop_size

        if not self.fine_tuning:
            if self.split:
                if len(wav) >= seg:
                    off = int(rng.integers(0, len(wav) - seg + 1))
                    wav = wav[off : off + seg]
                else:
                    wav = np.pad(wav, (0, seg - len(wav)))
            return wav, None

        stem = os.path.splitext(os.path.basename(path))[0]
        mel = np.load(os.path.join(self.base_mels_path, stem + ".npy")).astype(np.float32)
        if mel.ndim == 3:
            mel = mel[0]
        if self.split:
            if len(wav) >= seg and mel.shape[-1] > self.frames_per_seg:
                m_off = int(rng.integers(0, mel.shape[-1] - self.frames_per_seg))
                mel = mel[:, m_off : m_off + self.frames_per_seg]
                wav = wav[m_off * hop : (m_off + self.frames_per_seg) * hop]
                if len(wav) < seg:  # mel can outrun a short tail
                    wav = np.pad(wav, (0, seg - len(wav)))
            else:
                mel = np.pad(mel, ((0, 0), (0, max(0, self.frames_per_seg - mel.shape[-1]))))[
                    :, : self.frames_per_seg
                ]
                wav = np.pad(wav, (0, max(0, seg - len(wav))))[:seg]
        return wav, mel


def collate_mel_batch(
    items: Sequence[Tuple[np.ndarray, Optional[np.ndarray]]],
    mel_cfg: MelConfig = MelConfig(),
) -> Dict[str, jnp.ndarray]:
    """Stack crops and produce the training batch: conditioning mel at
    cfg.fmax (meldataset.py:144-147) + waveform.  One batched jitted mel call
    replaces the reference's per-item dataloader STFT."""
    wavs = np.stack([w for w, _ in items]).astype(np.float32)  # [b, T]
    wav_b = jnp.asarray(wavs)[:, None, :]  # [b, 1, T]
    if items[0][1] is not None:
        mel = jnp.asarray(np.stack([m for _, m in items]))
    else:
        mel = mel_for_config(jnp.asarray(wavs), mel_cfg)  # [b, n_mels, F]
    return {"mel": mel, "wav": wav_b}


def loss_mel_config(mel_cfg: MelConfig = MelConfig()) -> MelConfig:
    """fmax_loss=None in the reference (train.py uses full-band mel for the
    L1 loss, meldataset.py:169-171) == fmax = sr/2."""
    return mel_cfg.replace(fmax=float(mel_cfg.sampling_rate) / 2.0)


def dump_base_mels(
    filelist: Sequence[str],
    out_dir: str,
    mel_cfg: MelConfig = MelConfig(),
) -> int:
    """Write <stem>.npy ground-truth mels for fine-tuning (the reference takes
    these from a Voicebox inference dump; this helper produces the
    ground-truth-aligned variant from audio)."""
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for path in filelist:
        wav, _ = load_wav(path, sr=mel_cfg.sampling_rate)
        wav = np.clip(wav, -1.0, 1.0)
        usable = (len(wav) // mel_cfg.hop_size) * mel_cfg.hop_size
        if usable == 0:
            continue
        mel = np.asarray(
            mel_spectrogram(
                jnp.asarray(wav[None, :usable]), mel_cfg.n_fft, mel_cfg.num_mels,
                mel_cfg.sampling_rate, mel_cfg.hop_size, mel_cfg.win_size,
                mel_cfg.fmin, mel_cfg.fmax,
            )
        )[0]
        stem = os.path.splitext(os.path.basename(path))[0]
        np.save(os.path.join(out_dir, stem + ".npy"), mel)
        n += 1
    return n
