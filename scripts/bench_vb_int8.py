"""On-chip RTF + drift for the int8 W8A8 Voicebox estimator.

Runs the full 50-step Heun CFG ODE (VB.generate) at product geometry —
B=1 CFG-doubled to 2, 430 frames (5 s at 86.13 Hz), bf16 master weights —
with and without quantize_voicebox_params: asserts bounded drift, prints
both wall times.  This is the gate for wiring vb_int8 into the product
path (VERDICT r4 item 8: measured estimator step reduction or a measured
rejection).
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

from usdm_tpu.core.config import VoiceboxConfig  # noqa: E402
from usdm_tpu.models import voicebox as VB  # noqa: E402
from usdm_tpu.models.quant import quantize_voicebox_params  # noqa: E402


def main():
    frames = 430  # 5 s at 86.13 Hz (bench.py decoder geometry)
    seconds = frames * 256 / 22050.0
    cfg = VoiceboxConfig()
    rng = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(rng.standard_normal(s.shape) * 0.02, jnp.bfloat16),
        jax.eval_shape(lambda: VB.init_params(cfg, jax.random.PRNGKey(0))),
    )
    x = jnp.asarray(rng.integers(0, cfg.n_tokens, (1, frames)), jnp.int32)
    cond = jnp.zeros((1, cfg.n_feats, frames), jnp.float32)
    lengths = jnp.asarray([frames])
    z = jnp.asarray(rng.standard_normal(cond.shape), jnp.float32)
    kw = dict(n_timesteps=50, solver="heun", gradient_scale=1.0, z=z)

    results, mels = {}, {}
    for name, p in (("bf16", params),
                    ("int8", jax.jit(quantize_voicebox_params)(params))):
        t0 = time.time()
        m = np.asarray(VB.generate(p, cfg, x, cond, lengths,
                                   jax.random.PRNGKey(1), **kw))
        compile_s = time.time() - t0
        times = []
        for _ in range(5):
            t0 = time.time()
            m = np.asarray(VB.generate(p, cfg, x, cond, lengths,
                                       jax.random.PRNGKey(1), **kw))
            times.append(time.time() - t0)
        results[name] = min(times)
        mels[name] = m
        print(f"{name}: ode {min(times):.4f}s rtf={min(times) / seconds:.4f} "
              f"(compile {compile_s:.1f}s, runs {[round(t, 4) for t in times]})",
              flush=True)

    d = mels["int8"] - mels["bf16"]
    nrms = np.sqrt((d * d).mean()) / (np.sqrt((mels["bf16"] ** 2).mean()) + 1e-9)
    print(f"drift: normalized RMS {nrms:.4f}")
    print(f"speedup: {results['bf16'] / results['int8']:.3f}x "
          f"({results['bf16']:.4f}s -> {results['int8']:.4f}s)")
    # the gate that justifies vb_int8 on the product path: measured nRMS
    # 1e-4 (2026-08-19); a wrong quantization axis or qmm regression lands
    # here as drift orders of magnitude above that
    assert nrms < 1e-2, f"int8 estimator drift broke: nRMS={nrms:.4f}"
    print("drift gate: OK (nRMS < 1e-2)")


if __name__ == "__main__":
    main()
