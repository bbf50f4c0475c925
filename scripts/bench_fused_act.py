"""On-chip parity + RTF for the fused Activation1d kernel (ops/fused_act.py).

Runs BigVGAN at full 22khz_80band geometry (bf16, random weights) on a 10 s
clip with cfg.fused_act off and on: asserts numerical parity, prints both
RTFs.  This is the gate for flipping BigVGANConfig.fused_act's default
(VERDICT r4 item 2: earn the enable with a measurement).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from usdm_tpu.core.config import BigVGANConfig  # noqa: E402
from usdm_tpu.models import bigvgan as BGV  # noqa: E402


def main():
    seconds = 10.0
    frames = int(seconds * 22050) // 256
    cfg = BigVGANConfig()
    params = jax.tree.map(
        lambda s: jnp.asarray(
            np.random.default_rng(0).standard_normal(s.shape) * 0.02, jnp.bfloat16),
        jax.eval_shape(lambda: BGV.init_generator(cfg, jax.random.PRNGKey(0))),
    )
    mel = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, cfg.num_mels, frames)),
        jnp.bfloat16)

    results = {}
    wavs = {}
    for fused in (False, True):
        c = cfg.replace(fused_act=fused)
        fn = jax.jit(lambda p, m, c=c: BGV.generator(p, c, m))
        t0 = time.time()
        w = np.asarray(fn(params, mel).astype(jnp.float32))
        compile_s = time.time() - t0
        times = []
        for _ in range(5):
            t0 = time.time()
            w = np.asarray(fn(params, mel).astype(jnp.float32))
            times.append(time.time() - t0)
        rtf = min(times) / seconds
        results[fused] = rtf
        wavs[fused] = w
        print(f"fused_act={fused}: rtf={rtf:.4f} (compile {compile_s:.1f}s, "
              f"runs {[round(t, 4) for t in times]})")

    d = np.abs(wavs[True] - wavs[False])
    denom = np.abs(wavs[False]).mean() + 1e-9
    rel = d.mean() / denom
    print(f"parity: max|d|={d.max():.3e} mean|d|={d.mean():.3e} rel={rel:.3e}")
    print(f"speedup: {results[False] / results[True]:.3f}x "
          f"({results[False]:.4f} -> {results[True]:.4f})")
    # the gate that keeps fused_act=True as the product default: measured
    # rel 3e-2 in bf16 (2026-08-19); a halo/tiling regression that only
    # reproduces under real Mosaic tiling lands here, not in the CPU
    # interpret-mode goldens
    assert rel < 6e-2, f"fused/unfused parity broke: rel={rel:.3e}"
    print("parity gate: OK (rel < 6e-2)")


if __name__ == "__main__":
    main()
