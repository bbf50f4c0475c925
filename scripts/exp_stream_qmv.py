"""Correctness + bandwidth check of ops.stream_matvec.stream_qmv on chip.

Compares against quant.qmm numerics (same W8A8 recipe, io vs oi layout) and
times the same up/down MLP chain as exp_matvec.py for an apples-to-apples
GB/s figure.
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from usdm_tpu.models.quant import qmm
from usdm_tpu.ops.stream_matvec import stream_qmv

D, F, L = 4096, 14336, 16
BYTES = 2 * D * F * L


def timeit(fn, *args, n=16):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    key = jax.random.PRNGKey(0)
    # correctness vs qmm on one matmul
    w = jax.random.normal(key, (D, F), jnp.float32) * 0.02
    from usdm_tpu.models.quant import quantize_weight
    qw_io = quantize_weight(w)                       # {"q":[D,F], "s":[F]}
    qw_oi = {"q": jnp.transpose(qw_io["q"]).copy(), "s": qw_io["s"]}
    x = jax.random.normal(key, (1, D), jnp.bfloat16)
    ref = qmm(x, qw_io)
    got = stream_qmv(x, qw_oi)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    rel = err / (float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9)
    print(f"max abs err vs qmm: {err:.5f} (rel {rel:.2e})", flush=True)

    b4 = jax.random.normal(key, (4, D), jnp.bfloat16)
    ref4 = qmm(b4, qw_io)
    got4 = stream_qmv(b4, qw_oi)
    err4 = float(jnp.max(jnp.abs(ref4.astype(jnp.float32) - got4.astype(jnp.float32))))
    print(f"b=4 max abs err: {err4:.5f}", flush=True)

    # bandwidth: up/down chain
    up = {"q": jax.random.randint(key, (L, F, D), -127, 127, jnp.int8),
          "s": jnp.ones((L, F), jnp.bfloat16) * (1 / 127)}
    dn = {"q": jax.random.randint(key, (L, D, F), -127, 127, jnp.int8),
          "s": jnp.ones((L, D), jnp.bfloat16) * (1 / 127)}

    @jax.jit
    def chain(x, up, dn):
        def body(y, ws):
            uq, us, dq, ds = ws
            h = jax.nn.silu(stream_qmv(y, {"q": uq, "s": us}).astype(jnp.float32)
                            ).astype(jnp.bfloat16)
            return stream_qmv(h, {"q": dq, "s": ds}), None
        y, _ = jax.lax.scan(body, x, (up["q"], up["s"], dn["q"], dn["s"]))
        return y

    ms = timeit(chain, x, up, dn)
    print(f"stream_qmv chain: {ms:.3f} ms  {BYTES/(ms/1e3)/1e9:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
