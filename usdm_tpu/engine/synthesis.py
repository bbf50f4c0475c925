"""Speech synthesis back-end: units (+ optional reference speaker prompt) -> waveform.

Equivalent of the reference's decoder utilities
(/root/reference/src/decoder/voicebox/util/model_util.py:50-105):
`process_unit` mode-pooling to the mel frame rate, reference-prompt mel
extraction and normalization, Voicebox Heun sampling with CFG 1.0 and prompt
renoising, de-normalization with the dataset constants, and BigVGAN vocoding.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from usdm_tpu.audio.mel import mel_for_config_bucketed, normalize_mel, denormalize_mel
from usdm_tpu.audio.units import expand_and_pool
from usdm_tpu.audio.wav import load_wav
from usdm_tpu.core.config import BigVGANConfig, MelConfig, VoiceboxConfig, XlsrConfig
from usdm_tpu.models import bigvgan as BV
from usdm_tpu.models import voicebox as VB
from usdm_tpu.models import xlsr as XL


@dataclasses.dataclass
class SpeechDecoder:
    """Bundles the Voicebox + BigVGAN stage (reference initialize_decoder,
    model_util.py:57-69)."""

    voicebox_params: VB.Params
    voicebox_cfg: VoiceboxConfig
    vocoder_params: BV.Params
    vocoder_cfg: BigVGANConfig
    mel_cfg: MelConfig = MelConfig()
    # frame-count bucket for the jitted Voicebox ODE / BigVGAN programs: each
    # DISTINCT length otherwise compiles a fresh XLA program (~20-40 s on
    # TPU), and serving sees arbitrary response lengths.  Inputs are padded
    # up to a bucket multiple (estimator frames are length-masked; the
    # vocoder pad is edge-replicated mel, sliced off the waveform), bounding
    # the compile set at ~max_frames/frame_bucket programs.  0 = exact
    # shapes (bit-matching the unpadded reference math; used by tests).
    frame_bucket: int = 64

    def synthesize(
        self,
        units: Sequence[int],
        key: jax.Array,
        reference: Optional[Tuple[np.ndarray, np.ndarray]] = None,  # (ref_units_pooled, ref_mel_norm)
        n_timesteps: int = 50,
        solver: str = "heun",
        gradient_scale: float = 1.0,
    ) -> np.ndarray:
        """units (50 Hz ids) -> float waveform at mel_cfg.sampling_rate.

        Mirrors reconstruct_speech (model_util.py:73-105): pool units to the
        mel rate; with a reference, prepend its pooled units and normalized
        mel as a speech prompt, renoise it during sampling, then slice it off.
        """
        mc = self.mel_cfg
        agent_units, _ = expand_and_pool(np.asarray(units), mc.sampling_rate, mc.token_sr, mc.hop_size)
        n_agent = len(agent_units)
        if n_agent == 0:
            return np.zeros(0, np.float32)

        from usdm_tpu.audio.wav import ceil_to

        def bucket(n: int) -> int:
            b = self.frame_bucket
            return ceil_to(n, b) if b else n

        if reference is not None:
            ref_units, ref_mel = reference
            n_ref = len(ref_units)
            t = n_ref + n_agent
            x = np.zeros((1, bucket(t)), np.int64)
            x[0, :t] = np.concatenate([ref_units, agent_units])
            cond = np.zeros((1, mc.num_mels, bucket(t)), np.float32)
            cond[:, :, :n_ref] = ref_mel
            lengths = jnp.asarray([t])
            mel = VB.generate(
                self.voicebox_params, self.voicebox_cfg, jnp.asarray(x.astype(np.int32)),
                jnp.asarray(cond), lengths, key, n_timesteps=n_timesteps, solver=solver,
                gradient_scale=gradient_scale, speech_prompt=True, prompt_len=n_ref,
            )
            mel = mel[:, :, n_ref:t]
        else:
            x = np.zeros((1, bucket(n_agent)), np.int64)
            x[0, :n_agent] = agent_units
            cond = jnp.zeros((1, mc.num_mels, bucket(n_agent)), jnp.float32)
            lengths = jnp.asarray([n_agent])
            mel = VB.generate(
                self.voicebox_params, self.voicebox_cfg, jnp.asarray(x.astype(np.int32)),
                cond, lengths, key, n_timesteps=n_timesteps, solver=solver,
                gradient_scale=gradient_scale, speech_prompt=False,
            )
            mel = mel[:, :, :n_agent]

        mel = denormalize_mel(mel, mc)
        # vocoder bucket: edge-replicate the last valid frame (a plausible
        # continuation for the conv receptive fields at the seam) and slice
        # the waveform back to the exact sample count
        pad = bucket(n_agent) - n_agent
        if pad:
            mel = jnp.pad(mel, ((0, 0), (0, 0), (0, pad)), mode="edge")
        wav = BV.generator(self.vocoder_params, self.vocoder_cfg, mel)
        n_samples = n_agent * self.vocoder_cfg.total_upsample  # hop at full size
        return np.clip(np.asarray(wav)[0, 0, :n_samples], -1.0, 1.0)


def prepare_reference(
    reference_path: str,
    xlsr_params: XL.Params,
    xlsr_cfg: XlsrConfig,
    mel_cfg: MelConfig = MelConfig(),
) -> Tuple[np.ndarray, np.ndarray]:
    """Reference wav -> (pooled ref units, normalized ref mel), exactly the
    reference-prompt construction of model_util.py:77-90: units at 16 kHz,
    mel at 22.05 kHz truncated to the pooled-unit sample length."""
    wav16, _ = load_wav(reference_path, sr=xlsr_cfg.sample_rate)
    # bucketed: serving sees arbitrary reference-audio lengths, and each
    # distinct length would compile a fresh 48-layer XLS-R program
    units = np.asarray(XL.extract_units_bucketed(xlsr_params, xlsr_cfg, wav16))
    pooled, new_length = expand_and_pool(units, mel_cfg.sampling_rate, mel_cfg.token_sr, mel_cfg.hop_size)

    wav22, _ = load_wav(reference_path, sr=mel_cfg.sampling_rate)
    if len(wav22) < new_length:
        wav22 = np.pad(wav22, (0, new_length - len(wav22)))
    wav22 = wav22[:new_length]
    # bucketed mel (like the unit extraction above): one XLA program per
    # length bucket instead of per distinct reference length, bit-identical
    # on the valid frames
    mel = mel_for_config_bucketed(np.clip(wav22, -1.0, 1.0), mel_cfg)
    mel = normalize_mel(mel, mel_cfg)
    n = min(len(pooled), mel.shape[-1])
    return pooled[:n], np.asarray(mel)[:, :, :n]
