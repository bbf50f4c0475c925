"""Benchmark: full-size speech-decoder real-time factor on one TPU chip.

Measures the dominant audio-synthesis path of the USDM stack — token-Voicebox
(346M, 25 Heun steps with CFG batch-doubling) + BigVGAN (112M-class) — for a
10-second utterance, end-to-end on device, and prints ONE JSON line:

  {"metric": "speech_decoder_rtf", "value": <seconds-of-compute per
   second-of-audio>, "unit": "rtf", "vs_baseline": <speedup vs real-time>}

The reference publishes no RTF numbers (BASELINE.md); the north-star target is
end-to-end RTF < 1.0 on v5e, so vs_baseline is real-time / measured (higher is
better, >1 means faster than real time).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    from usdm_tpu.core.config import BigVGANConfig, VoiceboxConfig
    from usdm_tpu.models import bigvgan as BV
    from usdm_tpu.models import voicebox as VB

    seconds = 10.0
    frames = int(seconds * 22050) // 256  # mel frames (~86.13 Hz)

    vb_cfg = VoiceboxConfig()
    vb_params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        VB.init_params(vb_cfg, jax.random.PRNGKey(0)),
    )
    bv_cfg = BigVGANConfig()
    bv_params = BV.init_generator(bv_cfg, jax.random.PRNGKey(1))

    rng = np.random.default_rng(0)
    units = jnp.asarray(rng.integers(0, vb_cfg.n_tokens, (1, frames)))
    cond = jnp.zeros((1, vb_cfg.n_feats, frames), jnp.float32)
    lengths = jnp.asarray([frames])

    def synth(key):
        mel = VB.generate(
            vb_params, vb_cfg, units, cond, lengths, key,
            n_timesteps=50, solver="heun", gradient_scale=1.0,
        )
        wav = BV.generator(bv_params, bv_cfg, mel * 2.1575 + -5.5419)
        return wav

    # warm-up (compile)
    np.asarray(synth(jax.random.PRNGKey(2)))

    times = []
    for i in range(3):
        t0 = time.time()
        np.asarray(synth(jax.random.PRNGKey(3 + i)))
        times.append(time.time() - t0)
    dt = min(times)
    rtf = dt / seconds
    print(json.dumps({
        "metric": "speech_decoder_rtf",
        "value": round(rtf, 4),
        "unit": "rtf",
        "vs_baseline": round(1.0 / rtf, 2),
    }))


if __name__ == "__main__":
    main()
