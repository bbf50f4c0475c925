"""Batched decode-step throughput, bf16 vs int8 KV pages, on the real chip.

At large batch the KV page reads rival the (batch-amortized) weight reads:
b=32 x 1219-token contexts read ~5.1 GB of bf16 KV per step vs 7.0 GB of
int8 weights.  int8 pages halve the KV term — this script measures the
actual step time and total tok/s for b in {8, 16, 32} at serving geometry
(page_size 256), both pool dtypes (VERDICT r2 item 5).

Run: python scripts/bench_batch_decode.py
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


def main():
    from usdm_tpu.core.config import MistralConfig
    from usdm_tpu.engine.paged_ops import PagedKV, paged_decode_step
    from usdm_tpu.models import mistral as M
    from usdm_tpu.models.quant import quantize_llm_params

    cfg = MistralConfig()
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: quantize_llm_params(M.init_params(cfg, jax.random.PRNGKey(0)))))

    ps = 256
    ctx = 1219  # dialog stage-C context
    maxp = (ctx + 1 + ps - 1) // ps + 1  # pages per sequence
    for b in (8, 16, 32):
        n_pages = b * maxp + 1
        for kv_dtype in (None, jnp.int8):
            name = "bf16" if kv_dtype is None else "int8"
            try:
                kv = PagedKV.create(cfg, n_pages, ps, dtype=kv_dtype)
                table = jnp.asarray(
                    np.arange(b * maxp, dtype=np.int32).reshape(b, maxp))
                tok = jnp.zeros(b, jnp.int32)
                lens = jnp.full((b,), ctx, jnp.int32)
                act = jnp.ones(b, bool)
                am = jnp.ones((b, cfg.vocab_size), bool)
                keys = jnp.zeros((b, 2), jnp.uint32)
                i1, f1 = jnp.ones(b, jnp.int32), jnp.ones(b, jnp.float32)

                def step(kv):
                    nxt, _, kv2 = paged_decode_step(
                        params, kv, cfg, tok, lens, table, act, am, ps,
                        keys, i1, f1, f1)
                    return nxt, kv2

                nxt, kv = step(kv)
                np.asarray(nxt)  # tunnel-safe sync
                n = 20
                t0 = time.perf_counter()
                for _ in range(n):
                    nxt, kv = step(kv)
                np.asarray(nxt)
                dt = (time.perf_counter() - t0) / n
                print(f"b={b:2d} kv={name}: {dt*1e3:6.2f} ms/step  "
                      f"total {b/dt:7.1f} tok/s  ({1/dt:5.1f} tok/s/seq)",
                      flush=True)
                del kv
            except Exception as e:
                print(f"b={b:2d} kv={name}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
