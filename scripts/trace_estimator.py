"""Device-timeline trace of the Voicebox estimator (jax.profiler over axon).

jax.profiler works over the tunneled TPU (writes xplane.pb +
trace.json.gz under the given dir) — unlike isolated-op microbenches,
which are dispatch-bound over the tunnel and mis-measure sub-ms ops by 10x.

Measured 2026-08-18 (v5e, estimator [B=2, T=449], 5 calls, leaf device ops):

    per call ~8.8 ms total
      ~2.5 ms  convert_reduce fusions  (post-LN layer norms, f32 reductions)
      ~3.0 ms  matmul fusions          (qkvo + FFN)
      ~1.6 ms  closed_call             (flash attention, 24 layers)
      ~1.2 ms  convpos                 (2 grouped 31-wide convs)
      ~0.5 ms  misc elementwise

-> the estimator is LN/elementwise-bound, not matmul-bound: the f32 LN
reductions cost as much as all the matmuls.  They are parity-required
(reference torch LayerNorm reduces in f32), so this is a documented wall,
not a TODO.  Usage: python scripts/trace_estimator.py [outdir]
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")


def main(outdir: str = "/tmp/jaxtrace"):
    from usdm_tpu.core.config import VoiceboxConfig
    from usdm_tpu.models import voicebox as VB

    cfg = VoiceboxConfig()
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16),
        jax.eval_shape(lambda: VB.init_params(cfg, jax.random.PRNGKey(0))))
    b, t = 2, 449
    args = (jnp.zeros((b, t), jnp.int32),
            jnp.zeros((b, cfg.n_feats, t), jnp.bfloat16),
            jnp.zeros((b, cfg.n_feats, t), jnp.bfloat16),
            jnp.zeros((b,), jnp.float32),
            jnp.full((b,), t, jnp.int32))
    est = jax.jit(lambda p, *a: VB.estimator(p, cfg, *a))

    def sync(o):
        np.asarray(jnp.ravel(o)[:1].astype(jnp.float32))

    sync(est(params, *args))  # compile outside the trace
    os.makedirs(outdir, exist_ok=True)
    with jax.profiler.trace(outdir):
        for _ in range(5):
            out = est(params, *args)
        sync(out)
    print(f"trace written under {outdir} (xplane.pb + trace.json.gz; "
          "view with tensorboard or parse the json)")


if __name__ == "__main__":
    main(*sys.argv[1:2])
